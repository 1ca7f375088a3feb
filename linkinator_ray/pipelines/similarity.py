"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k (broadcast query matrix, per-batch numpy
matmul, mergeable partial top-k) as the exact baseline, plus a
random-hyperplane-LSH bucketed variant as the approximate scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read_embeddings(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _load_queries(sf_dir: str, num_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.dataset as pads
    ds = pads.dataset(f"{sf_dir}/embeddings.parquet")
    table = ds.to_table(columns=["vec_id", "embedding"],
                        filter=pads.field("vec_id") < num_queries)
    ids = np.asarray(table["vec_id"].to_pylist())
    mat = np.asarray(table["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    order = np.argsort(ids)
    return ids[order], mat[order]


class _PartialTopK:
    """Per-batch exact top-k against the broadcast query matrix.

    The query matrix rides the object store once (``ray.put`` on the
    driver → ``__init__`` here), NOT per batch."""

    def __init__(self, queries_ref, k: int):
        import ray
        self.qids, self.qmat = ray.get(queries_ref) if not isinstance(
            queries_ref, tuple) else queries_ref
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_numpy())
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = self.qmat @ mat.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            sel = top[qi]
            rows_q.extend([self.qids[qi]] * len(sel))
            rows_n.extend(ids[sel])
            rows_s.extend(sims[qi, sel])
        return pd.DataFrame({"query_id": rows_q, "neighbor_id": rows_n,
                             "cosine": rows_s})


def knn_bruteforce(sf_dir: str, k: int = 5, num_queries: int = 4):
    """Exact cosine top-k for the first ``num_queries`` vectors against
    the whole table. Partial top-k per batch → per-query merge
    (map_groups) → final k. Output sorted (query_id, rank)."""
    queries = _load_queries(sf_dir, num_queries)
    try:
        import ray
        queries_ref = ray.put(queries) if ray.is_initialized() else queries
    except Exception:
        queries_ref = queries

    partials = read_embeddings(sf_dir).map_batches(
        _PartialTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 4),
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.nlargest(k, "cosine").sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True])
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = g["cosine"].round(6)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pandas")  # rank column carries the order


# ---------------------------------------------------------------------------
# LSH-bucketed approximate variant (the scale path)
# ---------------------------------------------------------------------------

class _LshBucketer:
    """Random-hyperplane signature: bucket = sign-bit string of
    ``n_planes`` projections. Planes seeded → identical on every actor."""

    def __init__(self, dim: int = 64, n_planes: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        return ((mat @ self.planes.T) > 0).astype(np.int64) @ self.weights

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy())
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        return pd.DataFrame({
            "vec_id": batch["vec_id"],
            "bucket": self.bucket_of(mat),
            "embedding": list(mat),
        })


def knn_lsh(sf_dir: str, k: int = 5, num_queries: int = 4, n_planes: int = 6):
    """Approximate top-k: only candidates sharing the query's hyperplane
    bucket are scored. Recall < 1 by construction; the bench compares it
    against knn_bruteforce for a measured recall figure."""
    qids, qmat = _load_queries(sf_dir, num_queries)
    bucketer = _LshBucketer(qmat.shape[1], n_planes)
    qbuckets = bucketer.bucket_of(qmat)

    bucketed = read_embeddings(sf_dir).map_batches(
        _LshBucketer, batch_format="pandas", batch_size=4096, concurrency=(1, 4),
        fn_constructor_kwargs={"dim": qmat.shape[1], "n_planes": n_planes})
    wanted = set(qbuckets.tolist())

    def keep_wanted(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized bucket filter (ds.filter(row_fn) is per-row Python)
        return batch[batch["bucket"].isin(wanted)]

    cand_df = bucketed.map_batches(
        keep_wanted, batch_format="pandas", batch_size=8192).to_pandas()

    rows = []
    for qid, qvec, qb in zip(qids, qmat, qbuckets):
        sub = cand_df[cand_df["bucket"] == qb]
        if len(sub) == 0:
            continue
        mat = np.stack(sub["embedding"].to_numpy())
        sims = mat @ qvec
        top = np.argsort(-sims)[:k]
        for rank, pos in enumerate(top, 1):
            rows.append((qid, rank, sub["vec_id"].iloc[pos], round(float(sims[pos]), 6)))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int64()),
        "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
        "cosine": pa.array([r[3] for r in rows], pa.float64()),
    })
