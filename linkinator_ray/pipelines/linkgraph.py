"""Link-graph analytics over the crawl's extracted edge list.

What a crawl engine's output feeds next: per-page degree statistics and
PageRank over the (src_doc, dst_doc) edge list that the span-extraction
pipeline produces (graph.extract_edges — the Ray analogue of walking
linkinator's per-page ParsedUrl[] output, reference src/links.ts:94-140).

Both operators are EXACT-integer so the driver's DuckDB oracle hashes
identically:

- ``degree_stats``: each edge emits (src,+out) and (dst,+in) increment
  rows; ONE combiner exchange (hashagg) sums them — no join, no driver
  state, rows moved = 2·|E| pre-combined to ≤ 2·|V|.
- ``pagerank``: fixed-point arithmetic (scale 10^12, damping 85/100,
  floor division everywhere) makes the iteration a pure integer
  recurrence — order-independent sums, so a 4-iteration unrolled SQL
  oracle reproduces the distributed result bit-for-bit. Per iteration:
  one hash-partitioned join (edges ⋈ ranks on src — shares pr//deg) and
  one combiner exchange (sum of shares per dst, zero-rows carry each
  node's out-degree forward so the node table is never re-joined).
  Dangling nodes (404 targets: in-links only) contribute nothing, per
  the standard mass-dropping simplification — identical in the oracle.

Scale notes: the edge list is materialized once (the PageRank working
set, O(|E|) in the object store — at 100 TB this is the parquet edge
table a real run would checkpoint); each iteration moves O(|E|) shares
and O(|V|) rank rows through two exchanges and materializes O(|V|) —
the canonical distributed PageRank shape. Nothing ever lands on the
driver except per-iteration scheduling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from linkinator_ray.pipelines import graph
from linkinator_ray.pipelines.hashagg import hash_aggregate, hash_join

PR_SCALE = 10 ** 12
PR_DAMPING_PCT = 85
PR_ITERS = 4


def degree_stats(sf_dir: str):
    """(doc_id, out_deg, in_deg) over the distinct extracted edge set.

    Nodes = src ∪ dst (a 404 target has in_deg > 0, out_deg = 0)."""
    edges = graph.extract_edges(sf_dir)

    def to_increments(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ones = pa.array(np.ones(n, dtype=np.int64))
        zeros = pa.array(np.zeros(n, dtype=np.int64))
        doc = pa.chunked_array([batch["src_doc"], batch["dst_doc"]])
        return pa.table({
            "doc_id": doc.combine_chunks(),
            "out_inc": pa.chunked_array([ones, zeros]).combine_chunks(),
            "in_inc": pa.chunked_array([zeros, ones]).combine_chunks(),
        })

    inc = edges.map_batches(to_increments, batch_format="pyarrow")
    return hash_aggregate(inc, "doc_id", {"out_deg": ("out_inc", "sum"),
                                          "in_deg": ("in_inc", "sum")})


def _node_degrees(edges):
    """(d, deg) for every node in src ∪ dst; dangling nodes get deg=0.

    One combiner exchange: src rows carry +1, dst rows carry +0 (their
    only job is making in-link-only nodes exist in the node table)."""
    def to_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "d": pa.chunked_array(
                [batch["src_doc"], batch["dst_doc"]]).combine_chunks(),
            "inc": pa.chunked_array(
                [pa.array(np.ones(n, dtype=np.int64)),
                 pa.array(np.zeros(n, dtype=np.int64))]).combine_chunks(),
        })

    rows = edges.map_batches(to_rows, batch_format="pyarrow")
    return hash_aggregate(rows, "d", {"deg": ("inc", "sum")})


def pagerank(sf_dir: str, iters: int = PR_ITERS,
             damping_pct: int = PR_DAMPING_PCT, scale: int = PR_SCALE):
    """Exact-integer PageRank over the extracted link graph.

    pr0[v] = scale; pr[v] = base + (Σ_{u→v} pr[u]//deg[u]) · d // 100
    with base = (100−d)·scale//100 — all floor division on int64, so
    the result is independent of summation order and engine."""
    base = (100 - damping_pct) * scale // 100
    edges = graph.extract_edges(sf_dir).materialize()
    node_deg = _node_degrees(edges)

    def init(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pr", pa.array(np.full(batch.num_rows, scale, dtype=np.int64)))

    ranks = node_deg.map_batches(init, batch_format="pyarrow").materialize()

    def to_shares(batch: pa.Table) -> pa.Table:
        # join output row = one edge with its src's (deg, pr) attached
        pr = batch["pr"].to_numpy(zero_copy_only=False)
        deg = batch["deg"].to_numpy(zero_copy_only=False)
        return pa.table({
            "d": batch["dst_doc"],
            "c": pa.array(pr // deg),
            "degc": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
        })

    def to_zero_rows(batch: pa.Table) -> pa.Table:
        # one zero-contribution row per node: keeps contribution-less
        # nodes alive AND carries deg through the exchange (degc sums
        # back to deg because shares contribute 0 there)
        return pa.table({
            "d": batch["d"],
            "c": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            "degc": batch["deg"],
        })

    for _ in range(iters):
        joined = hash_join(edges, ranks, on="src_doc", right_on="d")
        shares = joined.map_batches(to_shares, batch_format="pyarrow")
        zeros = ranks.map_batches(to_zero_rows, batch_format="pyarrow")
        summed = hash_aggregate(shares.union(zeros), "d",
                                {"contrib": ("c", "sum"),
                                 "deg": ("degc", "sum")})

        def update(batch: pa.Table) -> pa.Table:
            contrib = batch["contrib"].to_numpy(zero_copy_only=False)
            # contrib approaches |in-links|·scale for a hub; past
            # (2^63-1)//damping_pct the int64 multiply would WRAP
            # silently and diverge from the bigint oracle — fail loudly
            # instead (recoverable by lowering PR_SCALE)
            if len(contrib) and int(contrib.max()) > \
                    (2**63 - 1) // damping_pct:
                raise OverflowError(
                    "pagerank contrib would overflow int64 in the "
                    f"damping multiply (max contrib {int(contrib.max())}, "
                    f"damping {damping_pct}); lower scale")
            return pa.table({
                "d": batch["d"],
                "deg": batch["deg"],
                "pr": pa.array(base + contrib * damping_pct // 100),
            })

        ranks = summed.map_batches(update,
                                   batch_format="pyarrow").materialize()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["d"], "pr": batch["pr"]})

    return ranks.map_batches(project, batch_format="pyarrow")


def pagerank_reference(edges: list[tuple[int, int]], iters: int = PR_ITERS,
                       damping_pct: int = PR_DAMPING_PCT,
                       scale: int = PR_SCALE) -> dict[int, int]:
    """Single-machine integer PageRank (differential-test oracle)."""
    base = (100 - damping_pct) * scale // 100
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: scale for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += pr[u] // deg[u]
        pr = {v: base + contrib[v] * damping_pct // 100 for v in nodes}
    return pr
