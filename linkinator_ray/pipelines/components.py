"""Connected components over the duplicate graph.

Per-bucket winner-picking (dedup_exact / dedup_minhash / dedup_chunk)
is not enough when duplication is TRANSITIVE: doc A shares a chunk with
B, B shares a different chunk with C — a real pipeline must treat
{A,B,C} as ONE cluster and keep one representative, or near-identical
text survives through chains. That clustering is a connected-components
problem on a graph with one node per document, and at 10^9+ nodes it
must run as a bounded number of all-to-all rounds, not a driver-side
union-find.

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC'14). Each round is ONE hash exchange of the edge
list grouped by node:

  large-star(u):  m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
  small-star(u):  edges pre-oriented (hi, lo); m = min(N(u) ∪ {u});
                  emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m

Both operations preserve connectivity and strictly shrink a potential
function; the alternation converges in O(log² n) rounds to a forest of
stars whose centers are the component minima — no path-length
dependence (plain min-label propagation needs O(diameter) rounds,
which an adversarial chain makes O(n)).

Scale shape: only the EDGE LIST is ever exchanged or materialized —
two int64s per edge, bounded by the number of duplicated chunks, never
the corpus text. The driver sees one (count, checksum) pair per round
for the convergence test; per-round edge materialization is inherent
to iterative fixpoints (each round's input is the previous round's
output) and is how published MapReduce/Pregel implementations run it.

Edge derivation here: docs sharing an identical ``chunk_tokens``-token
window are connected (the dedup_chunk graph, reusing its vectorized
explode). The star trick applies at the chunk exchange too: a chunk
shared by k docs emits k-1 edges to the chunk-min doc, not k² pairs.
The same component engine accepts any (u, v) edge dataset — minhash
verified pairs, embedding near-dup pairs — via ``connected_components``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from linkinator_ray.pipelines.dedup import read_docs, _fanout, _explode_chunks
from linkinator_ray.pipelines.hashagg import (
    hash_partition_apply, hash_aggregate, hash_join, default_parts,
    _splitmix64 as _splitmix_np)

_EMPTY_EDGES = pd.DataFrame({"u": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64")})


def _edge_stats(edges) -> tuple[int, int]:
    """(count, order-independent checksum) of an edge Dataset — the
    convergence probe. One tiny row per block reaches the driver."""
    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        v = batch.column("v").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        chk = _splitmix_np(u * np.uint64(0x9E3779B97F4A7C15) + v)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "chk": pa.array([int(chk.sum(dtype=np.uint64))], pa.uint64()),
        })
    parts = edges.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    chk = 0
    for p in parts:
        chk = (chk + int(p["chk"])) & 0xFFFFFFFFFFFFFFFF
    return n, chk


def _large_star(part: pd.DataFrame) -> pd.DataFrame:
    # input is SYMMETRIZED edges grouped by u: per u, connect the
    # strictly-larger neighbors to min(N(u) ∪ {u})
    g = part.groupby("u", sort=False)["v"]
    m = np.minimum(g.transform("min").to_numpy(),
                   part["u"].to_numpy())
    big = part["v"].to_numpy() > part["u"].to_numpy()
    out = pd.DataFrame({"u": part["v"].to_numpy()[big], "v": m[big]})
    return out.drop_duplicates() if len(out) else _EMPTY_EDGES.copy()


def _small_star(part: pd.DataFrame) -> pd.DataFrame:
    # input is (hi, lo)-oriented edges grouped by u=hi: star all of
    # N(u) ∪ {u} except the min onto the min
    g = part.groupby("u", sort=False)["v"]
    m = g.transform("min").to_numpy()  # all v < u, so min(N ∪ {u}) = min(N)
    v = part["v"].to_numpy()
    keep = v != m
    # (v, m) for the non-min small neighbors, plus (u, m) itself —
    # the latter lands once per incident edge, deduped locally below
    out = pd.DataFrame({
        "u": np.concatenate([v[keep], part["u"].to_numpy()]),
        "v": np.concatenate([m[keep], m]),
    })
    out = out[out["u"] != out["v"]]
    return out.drop_duplicates() if len(out) else _EMPTY_EDGES.copy()


def _symmetrize(batch: pa.Table) -> pa.Table:
    swapped = pa.table({"u": batch.column("v"), "v": batch.column("u")})
    return pa.concat_tables([batch.select(["u", "v"]), swapped])


def _orient_hi_lo(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    return pa.table({"u": pa.array(np.maximum(u, v)),
                     "v": pa.array(np.minimum(u, v))})


def _driver_stars(edges_df: pd.DataFrame) -> pa.Table:
    """Union-find star forest for a BOUNDED edge list — identical
    output contract to the star rounds: (u, component-min) for every
    non-root node."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(edges_df["u"], edges_df["v"]):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    us, vs = [], []
    for node in list(parent):
        root = find(node)
        if root != node:
            us.append(node)
            vs.append(root)
    return pa.table({"u": pa.array(us, pa.int64()),
                     "v": pa.array(vs, pa.int64())})


def connected_components(edges, max_rounds: int = 64,
                         driver_threshold: int = 2_000_000,
                         num_parts: int | None = None):
    """Star-contract an (u, v) int64 edge Dataset (self-loops ignored)
    down to a star forest; returns a Dataset of (u, v) rows where v is
    u's component minimum (component roots do not appear as u).

    Alternates large-star / small-star until the small-star output is
    stable (count + order-independent checksum fixpoint — the same
    termination the SoCC'14 paper proves reaches star form).

    Hybrid execution: an edge list at or under ``driver_threshold``
    rows collapses through a single driver union-find instead — the
    star rounds pay 2 exchanges + a stats pass of Ray overhead per
    round, which only amortizes once the edge list outgrows one
    machine (2M edges = 32 MB; the threshold bounds driver memory
    hard). Identical output either way (differential-tested); pass
    ``driver_threshold=0`` to force the distributed rounds."""
    import ray.data as rd
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return edges
    if n_edges <= driver_threshold:
        return rd.from_arrow(_driver_stars(
            edges.to_pandas()))
    if num_parts is None:
        # tiny partitions drown in per-partition scheduling; size the
        # exchange so each partition carries ≥ ~100k edges
        num_parts = max(4, min(default_parts(), n_edges // 100_000 + 4))
    prev = None
    for _ in range(max_rounds):
        sym = edges.map_batches(_symmetrize, batch_format="pyarrow")
        ls = hash_partition_apply(sym, "u", _large_star,
                                  num_parts=num_parts)
        oriented = ls.map_batches(_orient_hi_lo, batch_format="pyarrow")
        edges = hash_partition_apply(oriented, "u", _small_star,
                                     num_parts=num_parts).materialize()
        cur = _edge_stats(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"components did not converge in "
                           f"{max_rounds} rounds")
    return edges


def chunk_edges(sf_dir: str, chunk_tokens: int = 16):
    """Duplicate-graph edges: (u, v) with v = the smallest doc_id
    sharing an identical ``chunk_tokens``-token window with u. The
    chunk exchange ships (doc_id, md5) only — the star trick at the
    chunk level keeps a k-doc chunk at k-1 edges, not k²."""
    exploded = _fanout(read_docs(sf_dir, ["doc_id", "text"])).map_batches(
        lambda b: _explode_chunks(b, int(chunk_tokens), "hash"),
        batch_format="pyarrow", batch_size=8192)

    def star_per_chunk(part: pd.DataFrame) -> pd.DataFrame:
        part = part[["doc_id", "h"]].drop_duplicates()
        m = part.groupby("h", sort=False)["doc_id"].transform("min")
        keep = part["doc_id"].to_numpy() != m.to_numpy()
        out = pd.DataFrame({"u": part["doc_id"].to_numpy()[keep],
                            "v": m.to_numpy()[keep]})
        return out.drop_duplicates() if len(out) else _EMPTY_EDGES.copy()

    return hash_partition_apply(exploded, "h", star_per_chunk)


def dedup_components(sf_dir: str, chunk_tokens: int = 16):
    """Transitive duplicate clusters over the chunk-sharing graph.

    Output: (doc_id, component_id, csize) for EVERY document —
    component_id is the smallest doc_id reachable through shared
    ``chunk_tokens``-token windows (singletons map to themselves),
    csize the cluster's document count. Downstream keep-one-per-cluster
    is then ``doc_id == component_id``.

    Reference analogy: linkinator reports each broken target once per
    PARENT by joining results back to edges (crawl.py:1412 cites
    src/queue.ts); this is the corpus-side generalization where the
    relation itself is transitive. No reference counterpart — this is
    the training-data-pipeline extension (SURVEY §9).
    """
    stars = connected_components(chunk_edges(sf_dir, chunk_tokens))
    if stars.count() == 0:          # fully-unique corpus: all singletons
        def singleton(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            return pa.table({"doc_id": ids, "component_id": ids,
                             "csize": pa.array(
                                 np.ones(batch.num_rows, dtype=np.int64))})
        return read_docs(sf_dir, ["doc_id"]).map_batches(
            singleton, batch_format="pyarrow")

    # label every doc: star target if present, else itself — one
    # doc_id-co-located exchange (docs side carries doc_id only)
    def label(part: pd.DataFrame) -> pd.DataFrame:
        docs = part.loc[part["__side"] == 1, ["doc_id"]]
        st = part.loc[part["__side"] == 0]
        lab = docs.merge(st[["doc_id", "v"]], on="doc_id", how="left")
        comp = lab["v"].fillna(lab["doc_id"]).astype("int64")
        return pd.DataFrame({"doc_id": lab["doc_id"].to_numpy(np.int64),
                             "component_id": comp.to_numpy(np.int64)})

    def tag_stars(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"doc_id": batch.column("u"),
                         "u": batch.column("u"), "v": batch.column("v"),
                         "__side": pa.array(np.zeros(n, dtype=np.int8))})

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"doc_id": batch.column("doc_id"),
                         "u": pa.nulls(n, pa.int64()),
                         "v": pa.nulls(n, pa.int64()),
                         "__side": pa.array(np.ones(n, dtype=np.int8))})

    both = stars.map_batches(tag_stars, batch_format="pyarrow").union(
        read_docs(sf_dir, ["doc_id"]).map_batches(
            tag_docs, batch_format="pyarrow"))
    # materialized because it feeds BOTH the size aggregate and the
    # join below — 2 int64s per doc, tiny next to the corpus text
    labels = hash_partition_apply(both, "doc_id", label).materialize()

    # csize: count per component (two-level combiner exchange), joined
    # back component-co-located
    sizes = hash_aggregate(labels, "component_id",
                           {"csize": ("doc_id", "count")})
    return hash_join(labels, sizes, on="component_id")
