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


# ---------------------------------------------------------------------------
# Actor-partitioned PageRank — iterative algorithms without per-iteration
# edge shuffles
# ---------------------------------------------------------------------------

def _owner_of(ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Node → shard assignment (splitmix64 mod P — balanced under
    sequential doc_ids)."""
    from linkinator_ray.pipelines.hashagg import _splitmix64
    with np.errstate(over="ignore"):
        return (_splitmix64(ids.astype(np.int64).view(np.uint64))
                % np.uint64(num_shards)).astype(np.int64)


def _make_graph_shard():
    """Defined lazily so importing this module never requires Ray."""
    import ray

    @ray.remote
    class GraphShard:
        """One partition of the link graph, held resident across
        PageRank iterations: local edges (every edge whose src this
        shard OWNS), local out-degrees, and the rank vector of owned
        nodes. Per iteration the only data on the wire is the
        PRE-AGGREGATED (dst, contribution) rows — the edge list never
        moves again after the one-time build scatter.

        This is the documented raw-actor escape hatch (SURVEY §2.3 /
        ray_guide): Ray Data has no persistent co-partitioning, so the
        Dataset version of pagerank() re-partitions the full edge list
        every iteration; at 10^10 edges that shuffle dwarfs the
        rank-row traffic this design pays instead."""

        def __init__(self, shard_id: int, num_shards: int):
            self.shard_id = shard_id
            self.P = num_shards
            self._edge_parts: list = []    # (src, dst) arrays
            self._node_parts: list = []    # announced owned node ids
            self.n_edges_recv = 0
            self.n_nodes_recv = 0
            self._inbox: dict = {}         # iter -> list of (dst, c)
            self._inbox_n: dict = {}       # iter -> senders heard

        # ---- build ----
        def add_edges(self, src: np.ndarray, dst: np.ndarray) -> None:
            self._edge_parts.append((src, dst))
            self.n_edges_recv += len(src)

        def add_nodes(self, ids: np.ndarray) -> None:
            self._node_parts.append(ids)
            self.n_nodes_recv += len(ids)

        def received(self) -> tuple:
            return self.n_edges_recv, self.n_nodes_recv

        def seal(self, scale: int) -> int:
            """Freeze the partition: dedupe owned nodes, compute local
            out-degrees, init ranks. Returns owned node count."""
            if self._edge_parts:
                self.src = np.concatenate([p[0] for p in self._edge_parts])
                self.dst = np.concatenate([p[1] for p in self._edge_parts])
            else:
                self.src = np.empty(0, np.int64)
                self.dst = np.empty(0, np.int64)
            self._edge_parts = None
            owned = [self.src] + self._node_parts
            self._node_parts = None
            self.nodes = np.unique(np.concatenate(owned)) if owned \
                else np.empty(0, np.int64)
            # local degree == global degree: ALL edges of an owned src
            # live here (edges scattered by src owner)
            if len(self.src):
                su, sc = np.unique(self.src, return_counts=True)
                deg = np.zeros(len(self.nodes), np.int64)
                deg[np.searchsorted(self.nodes, su)] = sc
            else:
                deg = np.zeros(len(self.nodes), np.int64)
            self.deg = deg
            self.pr = np.full(len(self.nodes), scale, dtype=np.int64)
            # pre-resolve per-edge src slot + per-edge dst owner
            self.src_slot = np.searchsorted(self.nodes, self.src)
            self.dst_owner = _owner_of(self.dst, self.P)
            return len(self.nodes)

        # ---- iterate ----
        def send_contribs(self, it: int, peers: list) -> None:
            """Compute local shares pr[src]//deg[src], pre-aggregate by
            dst, and push one message per peer shard (empty messages
            keep the barrier deterministic)."""
            import ray
            if len(self.src):
                shares = self.pr[self.src_slot] // self.deg[self.src_slot]
                order = np.argsort(self.dst, kind="stable")
                d_s, c_s = self.dst[order], shares[order]
                cut = np.empty(len(d_s), bool)
                cut[0] = True
                cut[1:] = d_s[1:] != d_s[:-1]
                starts = np.flatnonzero(cut)
                d_u = d_s[starts]
                c_u = np.add.reduceat(c_s, starts)
                own = _owner_of(d_u, self.P)
            else:
                d_u = np.empty(0, np.int64)
                c_u = np.empty(0, np.int64)
                own = np.empty(0, np.int64)
            for p in range(self.P):
                m = own == p
                peers[p].receive_contribs.remote(it, self.shard_id,
                                                 d_u[m], c_u[m])

        def receive_contribs(self, it: int, sender: int,
                             dst: np.ndarray, c: np.ndarray) -> None:
            self._inbox.setdefault(it, []).append((dst, c))
            self._inbox_n[it] = self._inbox_n.get(it, 0) + 1

        def ready(self, it: int) -> bool:
            return self._inbox_n.get(it, 0) >= self.P

        def apply_update(self, it: int, base: int,
                         damping_pct: int) -> None:
            contrib = np.zeros(len(self.nodes), np.int64)
            for dst, c in self._inbox.pop(it, []):
                if len(dst):
                    np.add.at(contrib, np.searchsorted(self.nodes, dst), c)
            self._inbox_n.pop(it, None)
            if len(contrib) and int(contrib.max()) > \
                    (2**63 - 1) // damping_pct:
                raise OverflowError("pagerank contrib would overflow "
                                    "int64; lower scale")
            self.pr = base + contrib * damping_pct // 100

        def ranks(self) -> "pa.Table":
            return pa.table({"doc_id": pa.array(self.nodes, pa.int64()),
                             "pr": pa.array(self.pr, pa.int64())})

    return GraphShard


def pagerank_actors(sf_dir: str, iters: int = PR_ITERS,
                    damping_pct: int = PR_DAMPING_PCT,
                    scale: int = PR_SCALE, num_shards: int | None = None):
    """PageRank over resident graph-shard actors: the edge list is
    scattered by src-owner ONCE; each iteration exchanges only the
    pre-aggregated (dst, contribution) rows between shards. Same exact
    integer recurrence as ``pagerank()`` — bit-identical output
    (pinned by test + the same DuckDB oracle).

    Build-scatter barrier: routing tasks return per-shard row counts;
    the driver polls each shard until its received counters match —
    actor mailbox ordering is only per-sender, so a bare 'seal' RPC
    could overtake in-flight scatter messages (same counter pattern as
    state/mesh.py quiescence)."""
    import time as _time

    import ray
    import ray.data as rd

    from linkinator_ray.pipelines.hashagg import default_parts
    P = num_shards or max(2, min(16, default_parts() // 2))
    base = (100 - damping_pct) * scale // 100
    GraphShard = _make_graph_shard()
    shards = [GraphShard.remote(i, P) for i in range(P)]

    edges = graph.extract_edges(sf_dir)

    def scatter(batch: pa.Table) -> pa.Table:
        src = batch["src_doc"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dst = batch["dst_doc"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        e_cnt = np.zeros(P, np.int64)
        n_cnt = np.zeros(P, np.int64)
        so = _owner_of(src, P)
        do = _owner_of(dst, P)
        for p in range(P):
            m = so == p
            if m.any():
                shards[p].add_edges.remote(src[m], dst[m])
                e_cnt[p] = int(m.sum())
            dm = do == p
            if dm.any():
                ids = np.unique(dst[dm])
                shards[p].add_nodes.remote(ids)
                n_cnt[p] = len(ids)
        return pa.table({"shard": pa.array(np.arange(P)),
                         "e": pa.array(e_cnt), "n": pa.array(n_cnt)})

    sent = edges.map_batches(scatter, batch_format="pyarrow",
                             batch_size=65536).to_pandas() \
        .groupby("shard")[["e", "n"]].sum()
    expected = {int(i): (int(r["e"]), int(r["n"]))
                for i, r in sent.iterrows()}
    deadline = _time.time() + 120
    while True:
        got = ray.get([s.received.remote() for s in shards])
        if all(tuple(got[p]) == expected.get(p, (0, 0)) for p in range(P)):
            break
        if _time.time() > deadline:
            raise TimeoutError(f"scatter barrier: {got} != {expected}")
        _time.sleep(0.02)
    ray.get([s.seal.remote(scale) for s in shards])

    for it in range(iters):
        ray.get([s.send_contribs.remote(it, shards) for s in shards])
        deadline = _time.time() + 120
        while not all(ray.get([s.ready.remote(it) for s in shards])):
            if _time.time() > deadline:
                raise TimeoutError(f"iteration {it} barrier")
            _time.sleep(0.02)
        ray.get([s.apply_update.remote(it, base, damping_pct)
                 for s in shards])

    tables = ray.get([s.ranks.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    return rd.from_arrow([t for t in tables if t.num_rows])
