"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k (broadcast query matrix, per-batch numpy
matmul, mergeable partial top-k) as the exact baseline, plus a
random-hyperplane-LSH bucketed variant as the approximate scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from linkinator_ray.pipelines.hashagg import \
    auto_concurrency as _autoconc


_BUCKETER_CACHE: dict = {}


def _embedding_matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 matrix via
    flatten + reshape — no per-row object array, no np.stack copy
    of Python lists (the hot path of every similarity kernel)."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat, dtype=np.float64).reshape(len(col), -1)


def _normalized(mat: np.ndarray) -> np.ndarray:
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                         1e-12, None)


def _topk_frame(qids: np.ndarray, nids: np.ndarray, sims: np.ndarray,
                k: int) -> pa.Table:
    """Vectorized partial-top-k emission: per-row (query) top-k of a
    (nq, nb) similarity block, no Python loop over queries."""
    kk = min(k, sims.shape[1])
    top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk] \
        if kk < sims.shape[1] else \
        np.broadcast_to(np.arange(sims.shape[1]), sims.shape).copy()
    sel = np.take_along_axis(sims, top, axis=1)
    return pa.table({
        "query_id": pa.array(np.repeat(np.asarray(qids, np.int64), kk)),
        "neighbor_id": pa.array(np.asarray(nids, np.int64)[top.ravel()]),
        "cosine": pa.array(sel.ravel()),
    })


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_numpy(
            zero_copy_only=False), np.int64)
        mat = _normalized(_embedding_matrix(batch.column("embedding")))
        sims = self.qmat @ mat.T  # (nq, nb)
        return _topk_frame(self.qids, ids, sims, self.k)


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
        _PartialTopK, batch_format="pyarrow", batch_size=4096, concurrency=_autoconc(),
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalized(_embedding_matrix(batch.column("embedding")))
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel()), mat.shape[1])
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(self.bucket_of(mat)),
                         "embedding": emb})


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets = np.asarray(batch.column("bucket").to_numpy(
            zero_copy_only=False), np.int64)
        ids = np.asarray(batch.column("vec_id").to_numpy(
            zero_copy_only=False), np.int64)
        mat = _embedding_matrix(batch.column("embedding"))
        # one block matmul per DISTINCT query bucket, vectorized across
        # all queries in that bucket (was: a Python loop per query)
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order]
        parts = []
        for qb in np.unique(self.qbuckets):
            lo, hi = np.searchsorted(sb, [qb, qb + 1])
            if lo == hi:
                continue
            rows = order[lo:hi]
            qsel = self.qbuckets == qb
            sims = self.qmat[qsel] @ mat[rows].T
            parts.append(_topk_frame(self.qids[qsel], ids[rows], sims,
                                     self.k))
        if not parts:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.concat_tables(parts)


class _IvfAssign:
    """Assign vectors to their nearest coarse centroid — centroids ride
    the object store once (ray.put → per-process cache)."""

    def __init__(self, centroids_ref):
        import ray
        self.centroids = ray.get(centroids_ref) \
            if not isinstance(centroids_ref, np.ndarray) else centroids_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalized(_embedding_matrix(batch.column("embedding")))
        lists = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int64)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel()), mat.shape[1])
        return pa.table({"vec_id": batch.column("vec_id"),
                         "list_id": pa.array(lists), "embedding": emb})


class _IvfPartialTopK:
    """Per-batch scoring of list-matching candidates per query — the
    partial of the mergeable top-k (no driver candidate pull)."""

    def __init__(self, queries_ref, probes, k: int):
        import ray
        self.qids, self.qmat = ray.get(queries_ref) if not isinstance(
            queries_ref, tuple) else queries_ref
        self.k = k
        # invert probes: list_id → indices of the queries probing it,
        # so each distinct list in a batch is scored with ONE matmul
        # across all its probing queries (was: a Python loop per query)
        inv: dict[int, list[int]] = {}
        for qi, probe in enumerate(probes):
            for li in probe:
                inv.setdefault(int(li), []).append(qi)
        self.probed_by = {li: np.array(qs, np.int64)
                          for li, qs in inv.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = np.asarray(batch.column("list_id").to_numpy(
            zero_copy_only=False), np.int64)
        ids = np.asarray(batch.column("vec_id").to_numpy(
            zero_copy_only=False), np.int64)
        mat = _embedding_matrix(batch.column("embedding"))
        order = np.argsort(lists, kind="stable")
        sl = lists[order]
        parts = []
        for li in np.unique(sl):
            qsel = self.probed_by.get(int(li))
            if qsel is None:
                continue
            lo, hi = np.searchsorted(sl, [li, li + 1])
            rows = order[lo:hi]
            sims = self.qmat[qsel] @ mat[rows].T
            # a query probing several lists emits one partial per list;
            # the per-query merge (nlargest k) absorbs the union
            parts.append(_topk_frame(self.qids[qsel], ids[rows], sims,
                                     self.k))
        if not parts:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.concat_tables(parts)


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
        _IvfAssign, batch_format="pyarrow", batch_size=4096,
        concurrency=_autoconc(), fn_constructor_kwargs={"centroids_ref": cen_ref})
    wanted = pa.array(sorted(set().union(*probes)), pa.int64())

    def keep_wanted(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch.column("list_id"),
                                     value_set=wanted))

    partials = assigned.map_batches(
        keep_wanted, batch_format="pyarrow", batch_size=8192).map_batches(
        _IvfPartialTopK, batch_format="pyarrow", batch_size=8192,
        concurrency=_autoconc(),
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
        batch_format="pyarrow", batch_size=4096)
    wanted = pa.array(sorted(set(qbuckets.tolist())), pa.int64())

    def keep_wanted(batch: pa.Table) -> pa.Table:
        # vectorized bucket filter (ds.filter(row_fn) is per-row Python)
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch.column("bucket"),
                                     value_set=wanted))

    partials = bucketed.map_batches(
        keep_wanted, batch_format="pyarrow", batch_size=8192).map_batches(
        _LshPartialTopK, batch_format="pyarrow", batch_size=8192,
        concurrency=_autoconc(),
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


# ---------------------------------------------------------------------------
# k-means over the embedding column — iterative broadcast/partial-reduce
# ---------------------------------------------------------------------------

def _kmeans_init(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init: the normalized embeddings of the k lowest
    vec_ids (reproducible across runs and cluster sizes — no RNG)."""
    import pyarrow.dataset as pads
    ds = pads.dataset(f"{sf_dir}/embeddings.parquet")
    table = ds.to_table(columns=["vec_id", "embedding"],
                        filter=pads.field("vec_id") < k)
    ids = np.asarray(table["vec_id"].to_pylist())
    mat = np.asarray(table["embedding"].to_pylist(), dtype=np.float64)
    return _normalized(mat[np.argsort(ids)])


def _train_centroids(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """Shared broadcast-centroid k-means sketch loop (kmeans_embeddings
    and semantic_dedup both train with it): per iteration, ONE streamed
    pass emits k partial (sum, count) rows per batch against the
    ray.put centroids; the driver merge touches k x (d+2) numbers per
    batch, never vectors. Empty clusters keep their previous centroid
    (deterministic)."""
    import ray

    cents = _kmeans_init(sf_dir, k)

    def _put(obj):
        return ray.put(obj) if ray.is_initialized() else obj

    def _cents_of(ref) -> np.ndarray:
        # ray.get of a broadcast ref inside a task is a local-plasma
        # zero-copy read (microseconds) — plain tasks beat an actor
        # pool here because each iteration is one short pass and pool
        # startup would dominate
        return ref if isinstance(ref, np.ndarray) else ray.get(ref)

    def _partial(batch: pa.Table, *, cents_ref) -> pa.Table:
        cents_m = _cents_of(cents_ref)
        mat = _normalized(_embedding_matrix(batch.column("embedding")))
        assign = (mat @ cents_m.T).argmax(1)
        kk = cents_m.shape[0]
        sums = np.zeros((kk, mat.shape[1]))
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.arange(kk, dtype=np.int64)),
            "n": pa.array(counts),
            "psum": pa.array(list(sums)),
        })

    for _ in range(iters):
        ref = _put(cents)
        parts = read_embeddings(sf_dir).map_batches(
            _partial, batch_format="pyarrow", batch_size=4096,
            fn_kwargs={"cents_ref": ref}).to_pandas()
        new = cents.copy()
        for c, grp in parts.groupby("cluster"):
            n = int(grp["n"].sum())
            if n > 0:
                ssum = np.sum(np.stack(grp["psum"].to_numpy()), axis=0)
                norm = np.linalg.norm(ssum)
                if norm > 1e-12:
                    new[int(c)] = ssum / norm
        cents = new
    return cents


def kmeans_embeddings(sf_dir: str, k: int = 10, iters: int = 5):
    """Spherical k-means (Lloyd) over the embedding column — the
    iterative-ML pattern on Ray Data: each iteration is ONE streaming
    ``map_batches`` pass where workers read the broadcast centroid
    matrix (``ray.put`` once per iteration, k x d floats) and emit a
    per-batch mergeable sketch (per-cluster vector sum + count, k rows
    per batch); the driver reduces the tiny sketch table and updates
    centroids. No shuffle, no full materialization — the only data
    that ever leaves the workers is k x (d+2) numbers per batch.

    Returns a Dataset (vec_id, cluster) from a final assignment pass.
    Empty clusters keep their previous centroid (deterministic).
    """
    import ray

    cents = _train_centroids(sf_dir, k, iters)

    def _put(obj):
        return ray.put(obj) if ray.is_initialized() else obj

    def _cents_of(ref) -> np.ndarray:
        return ref if isinstance(ref, np.ndarray) else ray.get(ref)

    def _assign(batch: pa.Table, *, cents_ref) -> pa.Table:
        cents_m = _cents_of(cents_ref)
        mat = _normalized(_embedding_matrix(batch.column("embedding")))
        assign = (mat @ cents_m.T).argmax(1).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(assign),
        })

    final_ref = _put(cents)
    return read_embeddings(sf_dir).map_batches(
        _assign, batch_format="pyarrow", batch_size=4096,
        fn_kwargs={"cents_ref": final_ref})


def semantic_dedup(sf_dir: str, k: int = 10, iters: int = 3,
                   threshold: float = 0.95, cluster_cap: int = 100_000):
    """SemDeDup-style semantic near-dup removal (Abbas et al. 2023,
    arXiv:2303.09540): k-means partition the embedding space, then
    compare pairs WITHIN each cluster only — pairwise cost falls from
    O(n²) to Σ O(|cluster|²) and every cluster is processed
    independently on its own hash partition.

    A pure composition of primitives already proven here: the
    broadcast-centroid k-means sketch loop (kmeans_embeddings) trains
    centroids; one streaming assignment pass emits (vec_id, cluster,
    embedding); ``hash_partition_apply`` on cluster co-locates each
    cluster; the per-partition kernel normalizes once, takes the
    blockwise gram matrix per cluster, and applies the deterministic
    keep-lowest-id rule — vector j is dropped iff ANY lower-id vector
    in its cluster has cosine ≥ threshold, and ``dup_of`` records the
    lowest such anchor. Returns the drops Dataset
    (vec_id, dup_of, cluster).

    Partitioning assumption (documented per the custom-operator rule):
    one CLUSTER must fit a worker's memory for its gram block —
    ``cluster_cap`` fails loudly instead of silently O(n²)-ing when a
    degenerate clustering collapses everything into one cluster; raise
    k (more, smaller clusters) or split hot clusters to proceed.
    Float path → rows-only oracle; semantics pinned by a planted-dup
    pytest (tests/test_similarity.py)."""
    import ray

    from linkinator_ray.pipelines.hashagg import hash_partition_apply

    import pandas as pd

    # train centroids with the same broadcast-sketch loop as
    # kmeans_embeddings (kmeans returns only (vec_id, cluster); the
    # dedup kernel needs the embedding co-located with the assignment,
    # so the assignment pass below carries the vector through instead
    # of paying a join against a second read)
    cents = _train_centroids(sf_dir, k, iters)

    def _put(obj):
        return ray.put(obj) if ray.is_initialized() else obj

    def _cents_of(ref) -> np.ndarray:
        return ref if isinstance(ref, np.ndarray) else ray.get(ref)

    final_ref = _put(cents)

    def assign_with_vec(batch: pa.Table, *, cents_ref) -> pa.Table:
        cents_m = _cents_of(cents_ref)
        mat = _normalized(_embedding_matrix(batch.column("embedding")))
        assign = (mat @ cents_m.T).argmax(1).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(assign),
            "embedding": batch.column("embedding"),
        })

    assigned = read_embeddings(sf_dir).map_batches(
        assign_with_vec, batch_format="pyarrow", batch_size=4096,
        fn_kwargs={"cents_ref": final_ref})

    def drops_of_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        out_id, out_anchor, out_cluster = [], [], []
        for c, grp in df.groupby("cluster"):
            m = len(grp)
            if m < 2:
                continue
            if m > cluster_cap:
                raise ValueError(
                    f"semantic_dedup cluster {c} has {m} vectors "
                    f"(> cluster_cap={cluster_cap}); raise k")
            grp = grp.sort_values("vec_id")
            ids = grp["vec_id"].to_numpy()
            mat = _normalized(np.ascontiguousarray(
                np.stack(grp["embedding"].to_numpy()), dtype=np.float64))
            # column blocks keep peak memory at m × block instead of m²
            block = 4096
            for j0 in range(1, m, block):
                j1 = min(j0 + block, m)
                g = mat @ mat[j0:j1].T          # (m, j1-j0)
                jj = np.arange(j0, j1)
                # only anchors with i < j count
                g[np.arange(m)[:, None] >= jj[None, :]] = -np.inf
                hit = g >= threshold
                has = hit.any(axis=0)
                if not has.any():
                    continue
                first = hit.argmax(axis=0)       # lowest-row anchor
                out_id.extend(ids[jj[has]])
                out_anchor.extend(ids[first[has]])
                out_cluster.extend([int(c)] * int(has.sum()))
        return pd.DataFrame({
            "vec_id": pd.Series(out_id, dtype="int64"),
            "dup_of": pd.Series(out_anchor, dtype="int64"),
            "cluster": pd.Series(out_cluster, dtype="int64"),
        })

    return hash_partition_apply(assigned, "cluster", drops_of_partition)
