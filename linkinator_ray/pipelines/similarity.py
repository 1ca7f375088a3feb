"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k (broadcast query matrix, per-batch numpy
matmul, mergeable partial top-k) as the exact baseline, plus a
random-hyperplane-LSH bucketed variant as the approximate scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_BUCKETER_CACHE: dict = {}


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

    @classmethod
    def cached(cls, dim: int, n_planes: int, seed: int = 42) -> "_LshBucketer":
        """Process-cached instance: lets cheap TASK-based stages reuse
        the plane matrix (state built once per worker process) without
        paying actor-pool startup — same planes everywhere (seeded)."""
        key = (dim, n_planes, seed)
        hit = _BUCKETER_CACHE.get(key)
        if hit is None:
            hit = _BUCKETER_CACHE[key] = cls(dim, n_planes, seed)
        return hit

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


class _LshPartialTopK:
    """Per-batch scoring of bucket-matching candidates against the
    broadcast query matrix — the partial of a mergeable top-k. The
    candidate set never routes through the driver."""

    def __init__(self, queries_ref, qbuckets, k: int):
        import ray
        self.qids, self.qmat = ray.get(queries_ref) if not isinstance(
            queries_ref, tuple) else queries_ref
        self.qbuckets = np.asarray(qbuckets)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_q, rows_n, rows_s = [], [], []
        buckets = batch["bucket"].to_numpy()
        for qid, qvec, qb in zip(self.qids, self.qmat, self.qbuckets):
            mask = buckets == qb
            if not mask.any():
                continue
            sub = batch.loc[mask]
            mat = np.stack(sub["embedding"].to_numpy())
            sims = mat @ qvec
            kk = min(self.k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.extend([qid] * kk)
            rows_n.extend(sub["vec_id"].to_numpy()[top])
            rows_s.extend(sims[top])
        return pd.DataFrame({"query_id": rows_q, "neighbor_id": rows_n,
                             "cosine": rows_s})


class _IvfAssign:
    """Assign vectors to their nearest coarse centroid — centroids ride
    the object store once (ray.put → per-process cache)."""

    def __init__(self, centroids_ref):
        import ray
        self.centroids = ray.get(centroids_ref) \
            if not isinstance(centroids_ref, np.ndarray) else centroids_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy())
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                            1e-12, None)
        lists = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int64)
        return pd.DataFrame({"vec_id": batch["vec_id"], "list_id": lists,
                             "embedding": list(mat)})


class _IvfPartialTopK:
    """Per-batch scoring of list-matching candidates per query — the
    partial of the mergeable top-k (no driver candidate pull)."""

    def __init__(self, queries_ref, probes, k: int):
        import ray
        self.qids, self.qmat = ray.get(queries_ref) if not isinstance(
            queries_ref, tuple) else queries_ref
        self.probes = probes  # list of per-query centroid-id sets
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_q, rows_n, rows_s = [], [], []
        lists = batch["list_id"].to_numpy()
        for qid, qvec, probe in zip(self.qids, self.qmat, self.probes):
            mask = np.isin(lists, list(probe))
            if not mask.any():
                continue
            sub = batch.loc[mask]
            mat = np.stack(sub["embedding"].to_numpy())
            sims = mat @ qvec
            kk = min(self.k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.extend([qid] * kk)
            rows_n.extend(sub["vec_id"].to_numpy()[top])
            rows_s.extend(sims[top])
        return pd.DataFrame({"query_id": rows_q, "neighbor_id": rows_n,
                             "cosine": rows_s})


def train_ivf_centroids(sf_dir: str, n_centroids: int = 16,
                        train_rows: int = 2048, iters: int = 8,
                        seed: int = 42) -> np.ndarray:
    """Deterministic coarse quantizer: seeded k-means on a bounded
    training sample (spherical — centroids re-normalized per iter).
    Driver-side: the sample is small by construction; assignment and
    search are the distributed stages."""
    import pyarrow.dataset as pads
    ds = pads.dataset(f"{sf_dir}/embeddings.parquet")
    table = ds.to_table(columns=["vec_id", "embedding"],
                        filter=pads.field("vec_id") < train_rows)
    mat = np.asarray(table["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(mat))
    centroids = mat[rng.choice(len(mat), n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.clip(np.linalg.norm(centroids, axis=1, keepdims=True),
                             1e-12, None)
    return centroids


def knn_ivf(sf_dir: str, k: int = 5, num_queries: int = 4,
            n_centroids: int = 16, n_probe: int = 4):
    """IVF approximate top-k (the inverted-file scale path next to the
    LSH variant): seeded k-means coarse quantizer → distributed list
    assignment (map_batches, centroids broadcast once) → queries probe
    their ``n_probe`` nearest lists → exact scoring only within probed
    lists via per-batch partial top-k → per-query merge. Recall < 1 by
    construction; tests measure it against knn_bruteforce."""
    centroids = train_ivf_centroids(sf_dir, n_centroids)
    qids, qmat = _load_queries(sf_dir, num_queries)
    sims = qmat @ centroids.T
    order = np.argsort(-sims, axis=1)[:, :n_probe]
    probes = [set(row.tolist()) for row in order]
    try:
        import ray
        put = ray.put if ray.is_initialized() else (lambda x: x)
    except Exception:
        put = lambda x: x  # noqa: E731
    cen_ref = put(centroids)
    queries_ref = put((qids, qmat))

    assigned = read_embeddings(sf_dir).map_batches(
        _IvfAssign, batch_format="pandas", batch_size=4096,
        concurrency=(1, 4), fn_constructor_kwargs={"centroids_ref": cen_ref})
    wanted = set().union(*probes)

    def keep_wanted(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["list_id"].isin(wanted)]

    partials = assigned.map_batches(
        keep_wanted, batch_format="pandas", batch_size=8192).map_batches(
        _IvfPartialTopK, batch_format="pandas", batch_size=8192,
        concurrency=(1, 4),
        fn_constructor_kwargs={"queries_ref": queries_ref,
                               "probes": probes, "k": k})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.nlargest(k, "cosine").sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True])
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = g["cosine"].round(6)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    out = partials.groupby("query_id").map_groups(
        merge, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def knn_lsh(sf_dir: str, k: int = 5, num_queries: int = 4, n_planes: int = 6):
    """Approximate top-k: only candidates sharing the query's hyperplane
    bucket are scored — per-batch partial top-k in ``map_batches`` (the
    ``_PartialTopK`` merge pattern), per-query merge via ``map_groups``.
    No driver-side candidate materialization. Recall < 1 by construction;
    the bench compares it against knn_bruteforce for a measured recall
    figure."""
    qids, qmat = _load_queries(sf_dir, num_queries)
    bucketer = _LshBucketer(qmat.shape[1], n_planes)
    qbuckets = bucketer.bucket_of(qmat)
    try:
        import ray
        queries_ref = ray.put((qids, qmat)) if ray.is_initialized() \
            else (qids, qmat)
    except Exception:
        queries_ref = (qids, qmat)

    dim = qmat.shape[1]
    bucketed = read_embeddings(sf_dir).map_batches(
        lambda b: _LshBucketer.cached(dim, n_planes)(b),
        batch_format="pandas", batch_size=4096)
    wanted = set(qbuckets.tolist())

    def keep_wanted(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized bucket filter (ds.filter(row_fn) is per-row Python)
        return batch[batch["bucket"].isin(wanted)]

    partials = bucketed.map_batches(
        keep_wanted, batch_format="pandas", batch_size=8192).map_batches(
        _LshPartialTopK, batch_format="pandas", batch_size=8192,
        concurrency=(1, 4),
        fn_constructor_kwargs={"queries_ref": queries_ref,
                               "qbuckets": qbuckets, "k": k})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.nlargest(k, "cosine").sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True])
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = g["cosine"].round(6)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    out = partials.groupby("query_id").map_groups(
        merge, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
