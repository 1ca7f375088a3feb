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


def _guard_contrib(contrib: np.ndarray, damping_pct: int) -> None:
    """Fail loudly instead of diverging from the bigint oracle.

    contrib approaches |in-links|·pr for a hub. Two wrap points: the
    int64 SUM itself (pairwise wrap lands negative — checked via
    min()<0; a double-wrap back to positive needs ≈2^64·pr of mass,
    i.e. ≥2^24 MORE in-links past the first detection point), and the
    damping multiply (checked against (2^63−1)//damping_pct). Both
    recoverable by lowering PR_SCALE."""
    if not len(contrib):
        return
    lo, hi = int(contrib.min()), int(contrib.max())
    if lo < 0:
        raise OverflowError(
            "pagerank contribution SUM wrapped int64 (negative "
            f"partial {lo}); lower scale")
    if hi > (2**63 - 1) // damping_pct:
        raise OverflowError(
            "pagerank contrib would overflow int64 in the damping "
            f"multiply (max contrib {hi}, damping {damping_pct}); "
            "lower scale")


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
            _guard_contrib(contrib, damping_pct)
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


HITS_SCALE = 10 ** 6
HITS_ITERS = 3


def _hits_half(edges, scores, nodes, join_on: str, group_to: str,
               out_col: str, scale: int):
    """One HITS half-step: raw[group_to] = Σ_{edges} scores[join_on],
    then max-normalize to [0, scale] with floor division.

    Max-normalization (instead of the textbook L2 norm) keeps the whole
    recurrence in exact int64 — sums and max are order-independent, so
    the unrolled DuckDB oracle reproduces the distributed result
    bit-for-bit. One hash-partitioned join + one combiner exchange per
    half-step, same cost shape as a pagerank iteration; the global max
    is a tiny O(|V|)→scalar aggregate."""
    score_col = scores.schema().names[1]
    joined = hash_join(edges, scores, on=join_on, right_on="d")

    def to_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"d": batch[group_to], "c": batch[score_col]})

    def to_zero_rows(batch: pa.Table) -> pa.Table:
        # keeps contribution-less nodes alive through the exchange
        return pa.table({
            "d": batch["d"],
            "c": pa.array(np.zeros(batch.num_rows, dtype=np.int64))})

    rows = joined.map_batches(to_rows, batch_format="pyarrow")
    zeros = nodes.map_batches(to_zero_rows, batch_format="pyarrow")
    raw = hash_aggregate(rows.union(zeros), "d",
                         {"raw": ("c", "sum")}).materialize()
    m = raw.max("raw")
    if m is None or m <= 0:
        raise ValueError("HITS max-normalizer is 0 — empty edge set?")
    if m > (2 ** 63 - 1) // scale:
        raise OverflowError(
            f"HITS normalize multiply would overflow int64 (max raw {m}, "
            f"scale {scale}); lower scale")

    def norm(batch: pa.Table) -> pa.Table:
        r = batch["raw"].to_numpy(zero_copy_only=False)
        if len(r) and int(r.min()) < 0:
            raise OverflowError("HITS contribution SUM wrapped int64")
        return pa.table({"d": batch["d"], out_col: pa.array(r * scale // m)})

    # raw is already materialized (the max() pass consumed it); norm is
    # a cheap projection — leave it lazy so each half-step costs one
    # exchange + one scalar aggregate, not a third materialization
    return raw.map_batches(norm, batch_format="pyarrow")


def hits(sf_dir: str, iters: int = HITS_ITERS, scale: int = HITS_SCALE):
    """Exact-integer HITS (hubs & authorities) over the extracted link
    graph (Kleinberg 1999), the second classic crawl-output ranking
    next to ``pagerank`` (reference walks the same per-page link lists,
    src/links.ts:94-140).

    a0[v] = scale; per iteration: h[u] = norm(Σ_{u→v} a[v]),
    a[v] = norm(Σ_{u→v} h[u]) with norm(x) = x·scale // max(x) — all
    int64 floor arithmetic, so a 3-iteration unrolled SQL oracle hashes
    identically. Per iteration: two hash-partitioned joins (edges ⋈
    scores) + two combiner exchanges + two scalar max aggregates;
    working set O(|E|) edges (materialized once) + O(|V|) scores —
    the same at-scale shape as distributed pagerank."""
    edges = graph.extract_edges(sf_dir).materialize()

    def node_only(batch: pa.Table) -> pa.Table:
        return pa.table({"d": batch["d"]})

    nodes = _node_degrees(edges).map_batches(
        node_only, batch_format="pyarrow").materialize()

    def init(batch: pa.Table) -> pa.Table:
        return pa.table({
            "d": batch["d"],
            "a": pa.array(np.full(batch.num_rows, scale, dtype=np.int64))})

    auth = nodes.map_batches(init, batch_format="pyarrow").materialize()
    hub = None
    for _ in range(iters):
        # h[u] = norm(Σ over out-edges (u,v) of a[v]): join on dst, sum per src
        hub = _hits_half(edges, auth, nodes, join_on="dst_doc",
                         group_to="src_doc", out_col="h", scale=scale)
        # a[v] = norm(Σ over in-edges (u,v) of h[u]): join on src, sum per dst
        auth = _hits_half(edges, hub, nodes, join_on="src_doc",
                          group_to="dst_doc", out_col="a", scale=scale)

    both = hash_join(hub, auth.map_batches(
        lambda b: pa.table({"d2": b["d"], "a": b["a"]}),
        batch_format="pyarrow"), on="d", right_on="d2")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["d"], "hub": batch["h"],
                         "auth": batch["a"]})

    return both.map_batches(project, batch_format="pyarrow")


def hits_reference(edges: list[tuple[int, int]], iters: int = HITS_ITERS,
                   scale: int = HITS_SCALE) -> dict[int, tuple[int, int]]:
    """Single-machine integer HITS (differential-test oracle)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    a = {v: scale for v in nodes}
    h = {v: 0 for v in nodes}
    for _ in range(iters):
        raw_h = {v: 0 for v in nodes}
        for u, v in edges:
            raw_h[u] += a[v]
        m = max(raw_h.values())
        h = {v: raw_h[v] * scale // m for v in nodes}
        raw_a = {v: 0 for v in nodes}
        for u, v in edges:
            raw_a[v] += h[u]
        m = max(raw_a.values())
        a = {v: raw_a[v] * scale // m for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


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


def _batch_checksum(src: np.ndarray, dst: np.ndarray) -> int:
    """Content checksum of one scatter batch. Batches partition the
    globally-DISTINCT edge set, so batch contents never repeat and the
    checksum is a valid idempotency key (collision odds ~2^-64 — the
    same trust level as the documented cuckoo budget)."""
    from linkinator_ray.pipelines.hashagg import _splitmix64
    with np.errstate(over="ignore"):
        h = _splitmix64(src.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                        + dst.view(np.uint64))
        return int(h.sum(dtype=np.uint64))


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
        rank-row traffic this design pays instead.

        Every build message carries an idempotency key (content
        checksum of its source batch): Ray Data map tasks RETRY, and a
        retried scatter task re-sends its messages — duplicates are
        dropped here so the exact-count barrier stays satisfiable."""

        def __init__(self, shard_id: int, num_shards: int):
            self.shard_id = shard_id
            self.P = num_shards
            self._edge_parts: list = []    # (src, dst) arrays
            self._node_parts: list = []    # announced owned node ids
            self._seen_keys: set = set()
            self._sealed = False
            self.n_edges_recv = 0
            self.n_nodes_recv = 0
            self._inbox: dict = {}         # iter -> list of (dst, c)
            self._inbox_from: dict = {}    # iter -> set of sender ids
            # fire-and-forget senders drop their ObjectRefs, so a
            # worker-side exception would otherwise vanish and the run
            # would die 120 s later as an opaque barrier timeout —
            # record it here; the driver polls via errors()
            self._errors: list = []

        def errors(self) -> list:
            return self._errors

        # ---- build ----
        def add_edges(self, key, src: np.ndarray, dst: np.ndarray) -> None:
            # post-seal arrivals can only be retry duplicates: the
            # exact-count barrier already accounted for every unique
            # batch before seal ran
            try:
                if self._sealed or key in self._seen_keys:
                    return
                self._seen_keys.add(key)
                self._edge_parts.append((src, dst))
                self.n_edges_recv += len(src)
            except Exception:  # surfaced via errors(), not lost
                import traceback
                self._errors.append(traceback.format_exc())
                raise

        def add_nodes(self, key, ids: np.ndarray) -> None:
            try:
                if self._sealed or key in self._seen_keys:
                    return
                self._seen_keys.add(key)
                self._node_parts.append(ids)
                self.n_nodes_recv += len(ids)
            except Exception:
                import traceback
                self._errors.append(traceback.format_exc())
                raise

        def received(self) -> tuple:
            return self.n_edges_recv, self.n_nodes_recv

        def seal(self, scale: int) -> int:
            """Freeze the partition: dedupe owned nodes, compute local
            out-degrees, init ranks, and precompute every
            ITERATION-INVARIANT piece of the contribution exchange
            (dst sort order, group starts, per-peer destination
            slices) — send_contribs then does no sorting at all.
            Returns the owned node count."""
            if self._edge_parts:
                self.src = np.concatenate([p[0] for p in self._edge_parts])
                self.dst = np.concatenate([p[1] for p in self._edge_parts])
            else:
                self.src = np.empty(0, np.int64)
                self.dst = np.empty(0, np.int64)
            self._edge_parts = None
            owned = [self.src] + self._node_parts
            self._node_parts = None
            self._seen_keys = None
            self._sealed = True
            # owned always holds >= 1 array (self.src, possibly empty);
            # concatenate-of-empties yields an empty int64 array
            self.nodes = np.unique(np.concatenate(owned))
            # local degree == global degree: ALL edges of an owned src
            # live here (edges scattered by src owner)
            deg = np.zeros(len(self.nodes), np.int64)
            if len(self.src):
                su, sc = np.unique(self.src, return_counts=True)
                deg[np.searchsorted(self.nodes, su)] = sc
            self.deg = deg
            self.pr = np.full(len(self.nodes), scale, dtype=np.int64)
            # iteration-invariant exchange plan: edges sorted by dst,
            # one (dst, start) group table, per-peer group index ranges
            order = np.argsort(self.dst, kind="stable")
            self.src_slot = np.searchsorted(self.nodes, self.src)[order]
            d_s = self.dst[order]
            if len(d_s):
                cut = np.empty(len(d_s), bool)
                cut[0] = True
                cut[1:] = d_s[1:] != d_s[:-1]
                self.grp_starts = np.flatnonzero(cut)
                self.d_u = d_s[self.grp_starts]
                own = _owner_of(self.d_u, self.P)
                self.peer_groups = [np.flatnonzero(own == p)
                                    for p in range(self.P)]
            else:
                self.grp_starts = np.empty(0, np.int64)
                self.d_u = np.empty(0, np.int64)
                self.peer_groups = [np.empty(0, np.int64)
                                    for _ in range(self.P)]
            self.src = None
            self.dst = None
            return len(self.nodes)

        # ---- iterate ----
        def send_contribs(self, it: int, peers: list) -> None:
            """Shares pr[src]//deg[src] in precomputed dst order, one
            reduceat over the precomputed group starts, one message per
            peer shard (empty messages keep the barrier deterministic)."""
            if len(self.grp_starts):
                shares = self.pr[self.src_slot] // self.deg[self.src_slot]
                c_u = np.add.reduceat(shares, self.grp_starts)
            else:
                c_u = np.empty(0, np.int64)
            for p in range(self.P):
                g = self.peer_groups[p]
                peers[p].receive_contribs.remote(it, self.shard_id,
                                                 self.d_u[g], c_u[g])

        def receive_contribs(self, it: int, sender: int,
                             dst: np.ndarray, c: np.ndarray) -> None:
            # dedupe by SENDER, not message count: a retried/duplicated
            # delivery must not let the barrier pass with 2 messages
            # from shard A and 0 from B (contribs double-counted and
            # dropped, silently wrong ranks). A sender's (it, payload)
            # is a pure function of sealed state + pr, so dropping the
            # duplicate is exact.
            try:
                heard = self._inbox_from.setdefault(it, set())
                if sender in heard:
                    return
                heard.add(sender)
                self._inbox.setdefault(it, []).append((dst, c))
            except Exception:
                import traceback
                self._errors.append(traceback.format_exc())
                raise

        def ready(self, it: int) -> bool:
            return len(self._inbox_from.get(it, ())) >= self.P

        def apply_update(self, it: int, base: int,
                         damping_pct: int) -> None:
            contrib = np.zeros(len(self.nodes), np.int64)
            for dst, c in self._inbox.pop(it, []):
                if len(dst):
                    np.add.at(contrib, np.searchsorted(self.nodes, dst), c)
            self._inbox_from.pop(it, None)
            _guard_contrib(contrib, damping_pct)
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
    state/mesh.py quiescence). Scatter messages carry content-checksum
    idempotency keys so a RETRIED map task cannot double-count.
    Shards are killed in a finally block — a failed run leaves no
    resident graph copies behind."""
    import time as _time

    import ray
    import ray.data as rd

    from linkinator_ray.pipelines.hashagg import default_parts
    P = num_shards or max(2, min(16, default_parts() // 2))
    base = (100 - damping_pct) * scale // 100
    GraphShard = _make_graph_shard()
    shards = [GraphShard.remote(i, P) for i in range(P)]
    try:
        edges = graph.extract_edges(sf_dir)

        def scatter(batch: pa.Table) -> pa.Table:
            src = batch["src_doc"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = batch["dst_doc"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            key = _batch_checksum(src, dst)
            e_cnt = np.zeros(P, np.int64)
            n_cnt = np.zeros(P, np.int64)
            so = _owner_of(src, P)
            do = _owner_of(dst, P)
            for p in range(P):
                m = so == p
                if m.any():
                    shards[p].add_edges.remote((key, "e", p), src[m],
                                               dst[m])
                    e_cnt[p] = int(m.sum())
                dm = do == p
                if dm.any():
                    ids = np.unique(dst[dm])
                    shards[p].add_nodes.remote((key, "n", p), ids)
                    n_cnt[p] = len(ids)
            return pa.table({"shard": pa.array(np.arange(P)),
                             "e": pa.array(e_cnt), "n": pa.array(n_cnt)})

        sent = edges.map_batches(scatter, batch_format="pyarrow",
                                 batch_size=65536).to_pandas() \
            .groupby("shard")[["e", "n"]].sum()
        expected = {int(i): (int(r["e"]), int(r["n"]))
                    for i, r in sent.iterrows()}

        def raise_shard_errors() -> None:
            # fire-and-forget senders drop their ObjectRefs; a recorded
            # worker-side traceback beats an opaque barrier timeout
            for p, errs in enumerate(ray.get(
                    [s.errors.remote() for s in shards])):
                if errs:
                    raise RuntimeError(
                        f"graph shard {p} failed:\n{errs[0]}")

        # progress-based deadline: a healthy large scatter that is
        # still draining mailboxes must not be killed by a fixed clock —
        # only STALLED counters (no advance for the window) time out.
        # Errors are polled every ~1 s, not only at stall timeout, so a
        # deterministic worker failure surfaces immediately instead of
        # costing the full 120 s window first.
        stall_s, err_poll_s = 120, 1.0
        last, last_change = None, _time.time()
        last_err_poll = _time.time()
        while True:
            got = ray.get([s.received.remote() for s in shards])
            if all(tuple(got[p]) == expected.get(p, (0, 0))
                   for p in range(P)):
                break
            if _time.time() - last_err_poll > err_poll_s:
                raise_shard_errors()
                last_err_poll = _time.time()
            if got != last:
                last, last_change = got, _time.time()
            elif _time.time() - last_change > stall_s:
                raise_shard_errors()
                raise TimeoutError(f"scatter barrier stalled {stall_s}s: "
                                   f"{got} != {expected}")
            _time.sleep(0.02)
        ray.get([s.seal.remote(scale) for s in shards])

        for it in range(iters):
            ray.get([s.send_contribs.remote(it, shards) for s in shards])
            last_n, last_change = -1, _time.time()
            last_err_poll = _time.time()
            while True:
                ready = ray.get([s.ready.remote(it) for s in shards])
                if all(ready):
                    break
                if _time.time() - last_err_poll > err_poll_s:
                    raise_shard_errors()
                    last_err_poll = _time.time()
                n = sum(ready)
                if n != last_n:
                    last_n, last_change = n, _time.time()
                elif _time.time() - last_change > stall_s:
                    raise_shard_errors()
                    raise TimeoutError(
                        f"iteration {it} barrier stalled {stall_s}s")
                _time.sleep(0.02)
            ray.get([s.apply_update.remote(it, base, damping_pct)
                     for s in shards])

        tables = ray.get([s.ranks.remote() for s in shards])
    finally:
        for s in shards:
            ray.kill(s)
    return rd.from_arrow([t for t in tables if t.num_rows])


def triangle_count(sf_dir: str, num_parts: int | None = None):
    """Per-node triangle participation over the undirected link graph —
    (doc_id, deg, wedges, triangles), all exact int64 so the DuckDB
    3-way-self-join oracle hashes identically.  ``wedges`` is the
    clustering-coefficient denominator C(deg, 2); the consumer divides.

    The distributed shape is the degree-ordered node-iterator (Schank &
    Wagner 2005; the MapReduce formulation is Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer"):

    1. canonicalize directed links to undirected distinct edges
       (min, max) — one combiner exchange (hashagg distinct);
    2. degrees via one combiner exchange over (endpoint, +1) rows;
    3. orient every edge from the (deg, id)-smaller endpoint to the
       larger (two hash joins pin deg onto both endpoints).  The
       orientation is acyclic and caps every node's OUT-degree at
       O(sqrt |E|) — the step that kills the curse-of-the-last-reducer
       hub blowup: a 10^6-degree hub generates wedges only from its
       few higher-ordered neighbors, never C(10^6, 2) pairs;
    4. wedge generation per center — ONE hash exchange on the center
       id, then a fully vectorized per-partition kernel (sort + run
       boundaries + np.repeat pair indexing, no Python loop).  Total
       wedges are bounded by sum(out_deg^2) = O(|E|^1.5) spread across
       partitions; a residual hot center can be salted by splitting
       its out-list (same lever as fetch.py's host salting);
    5. triangle closure = hash semi-join of wedges against the
       oriented edge set on (v, w).  Each triangle has EXACTLY one
       (u→v, u→w, v→w) orientation under the total order, so no
       dedup or division by 3 exists anywhere;
    6. per-node counts: triangle rows fan out 3 increments, degree
       rows carry the deg column, one final combiner exchange.

    Only O(|E|)-bounded datasets materialize (edge list + degrees +
    oriented edges — the same working-set contract as ``pagerank``);
    the driver never sees a row.
    """
    return triangle_count_edges(graph.extract_edges(sf_dir),
                                num_parts=num_parts)


def triangle_count_edges(edges, num_parts: int | None = None):
    """Core of ``triangle_count`` over any (src_doc, dst_doc) edge
    Dataset (directed, possibly with duplicates/self-loops — both are
    canonicalized away)."""
    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    import pandas as pd

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        a, b = np.minimum(s, d), np.maximum(s, d)
        keep = a != b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    ue = hash_aggregate(edges.map_batches(canon, batch_format="pyarrow"),
                        ["a", "b"], {"n": ("a", "count")},
                        num_parts=num_parts) \
        .select_columns(["a", "b"]).materialize()

    def to_inc(batch: pa.Table) -> pa.Table:
        node = pa.chunked_array([batch["a"], batch["b"]]).combine_chunks()
        return pa.table({"doc_id": node,
                         "inc": pa.array(np.ones(len(node), np.int64))})

    deg = hash_aggregate(ue.map_batches(to_inc, batch_format="pyarrow"),
                         "doc_id", {"deg": ("inc", "sum")},
                         num_parts=num_parts).materialize()

    def _ren(ds, old: str, new: str):
        # Dataset.rename_columns exists on Ray 2.49 — use it
        return ds.rename_columns({old: new})

    e1 = _ren(hash_join(ue, deg, on="a", right_on="doc_id",
                        num_parts=num_parts), "deg", "deg_a")
    e2 = hash_join(e1, deg, on="b", right_on="doc_id", num_parts=num_parts)

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = batch["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "u": pa.array(np.where(a_first, a, b)),
            "v": pa.array(np.where(a_first, b, a)),
            "deg_v": pa.array(np.where(a_first, db, da)),
        })

    oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    def wedge_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        # neighbors sorted by the SAME (deg, id) total order as the
        # orientation, so every emitted (cv, cw) pair is already in
        # oriented-edge direction and the closure probe is one semi-join
        df = df.sort_values(["u", "deg_v", "v"], kind="stable")
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        local = np.arange(len(u)) - np.repeat(starts, sizes)
        reps = np.repeat(sizes, sizes) - 1 - local  # pairs with i as left
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"cu": np.array([], np.int64),
                                 "cv": np.array([], np.int64),
                                 "cw": np.array([], np.int64)})
        lefts = np.repeat(np.arange(len(u)), reps)
        run_off = np.cumsum(reps) - reps
        within = np.arange(total) - np.repeat(run_off, reps)
        rights = np.repeat(np.arange(len(u)) + 1, reps) + within
        return pd.DataFrame({"cu": u[lefts], "cv": v[lefts],
                             "cw": v[rights]})

    wedges = hash_partition_apply(oriented, "u", wedge_fn,
                                  num_parts=num_parts)
    tri = hash_join(wedges, oriented.select_columns(["u", "v"]),
                    on=["cv", "cw"], right_on=["u", "v"], how="semi",
                    num_parts=num_parts)

    def tri_inc(batch: pa.Table) -> pa.Table:
        node = pa.chunked_array(
            [batch["cu"], batch["cv"], batch["cw"]]).combine_chunks()
        n = len(node)
        return pa.table({"doc_id": node,
                         "tri_inc": pa.array(np.ones(n, np.int64)),
                         "deg_inc": pa.array(np.zeros(n, np.int64))})

    def deg_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"doc_id": batch["doc_id"],
                         "tri_inc": pa.array(np.zeros(n, np.int64)),
                         "deg_inc": batch["deg"]})

    both = tri.map_batches(tri_inc, batch_format="pyarrow") \
        .union(deg.map_batches(deg_rows, batch_format="pyarrow"))
    counts = hash_aggregate(both, "doc_id",
                            {"triangles": ("tri_inc", "sum"),
                             "deg": ("deg_inc", "sum")},
                            num_parts=num_parts)

    def face(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "deg": batch["deg"],
            "wedges": pa.array(d * (d - 1) // 2),
            "triangles": batch["triangles"],
        })

    return counts.map_batches(face, batch_format="pyarrow")


def triangle_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Single-machine per-node triangle counts (set intersections) —
    the differential oracle for ``triangle_count`` tests."""
    from collections import defaultdict
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    tri: dict[int, int] = {n: 0 for n in adj}
    seen = set()
    for a in adj:
        for b in adj[a]:
            if (min(a, b), max(a, b)) in seen:
                continue
            seen.add((min(a, b), max(a, b)))
            for c in adj[a] & adj[b]:
                # each triangle visited once per edge = 3 times total;
                # credit the OPPOSITE vertex each time
                tri[c] += 1
    return tri


def cocitation_topk(sf_dir: str, k: int = 20, max_out_degree: int = 64,
                    num_parts: int | None = None):
    """Top-k CO-CITED page pairs: (a, b) ranked by how many pages link
    to both — the classic co-citation similarity signal over the
    crawl's link graph (companion to ``hits``/``pagerank``; the wedge
    kernel is triangle_count's, re-aimed at pair counting).

    Plan: ONE hash partition of the distinct edge set on src co-locates
    each citing page's out-list; the per-partition kernel drops sources
    above ``max_out_degree`` (a hub page citing m targets emits C(m,2)
    pairs — the cap bounds the blowup at scale and is mirrored in the
    SQL oracle, not silently applied), generates ordered (a<b) pairs
    fully vectorized (run boundaries + np.repeat indexing), and
    pre-counts per pair as the combiner; a two-level hash aggregate
    merges pair counts and a mergeable per-partition top-k leaves P×k
    rows for the driver. Deterministic (n desc, a, b) order."""
    return cocitation_topk_edges(graph.extract_edges(sf_dir), k=k,
                                 max_out_degree=max_out_degree,
                                 num_parts=num_parts)


def cocitation_topk_edges(edges, k: int = 20, max_out_degree: int = 64,
                          num_parts: int | None = None):
    """Core of ``cocitation_topk`` over any DISTINCT (src_doc, dst_doc)
    edge dataset (callers must pre-dedup — duplicate edges would
    double-count pairs and inflate the degree cap)."""
    import pandas as pd

    from linkinator_ray.pipelines.hashagg import (hash_aggregate,
                                                  hash_partition_apply)

    def pair_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["src_doc", "dst_doc"], kind="stable")
        s = df["src_doc"].to_numpy()
        d = df["dst_doc"].to_numpy()
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        sizes = np.diff(np.r_[starts, len(s)])
        # degree cap BEFORE pair generation: the oracle filters the
        # same sources, so results stay bit-identical
        keep_run = sizes <= max_out_degree
        keep = np.repeat(keep_run, sizes)
        s, d = s[keep], d[keep]
        if len(s) == 0:
            return pd.DataFrame({"a": np.array([], np.int64),
                                 "b": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        sizes = np.diff(np.r_[starts, len(s)])
        local = np.arange(len(s)) - np.repeat(starts, sizes)
        reps = np.repeat(sizes, sizes) - 1 - local
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"a": np.array([], np.int64),
                                 "b": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        lefts = np.repeat(np.arange(len(s)), reps)
        run_off = np.cumsum(reps) - reps
        within = np.arange(total) - np.repeat(run_off, reps)
        rights = np.repeat(np.arange(len(s)) + 1, reps) + within
        out = pd.DataFrame({"a": d[lefts], "b": d[rights]})
        # out-lists are dst-sorted within each src run, so a < b always
        return out.groupby(["a", "b"], sort=False).size() \
            .rename("n").reset_index()

    pairs = hash_partition_apply(edges, "src_doc", pair_fn,
                                 num_parts=num_parts)
    merged = hash_aggregate(pairs, ["a", "b"], {"n": ("n", "sum")},
                            num_parts=num_parts)

    def local_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.sort_values(["n", "a", "b"],
                              ascending=[False, True, True]).head(k)

    top = merged.map_batches(local_topk, batch_format="pandas").to_pandas() \
        .sort_values(["n", "a", "b"], ascending=[False, True, True]).head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True),
                                preserve_index=False)


def crawl_depth_edges(edges, roots: list[int], max_rounds: int = 64,
                      num_parts: int | None = None):
    """Declarative dataset face of BFS discovery depth (the engine path
    is graph.crawl_depth — the crawl itself, whose round counter IS the
    depth; this formulation exists as its oracle-checkable equivalence
    witness over any DISTINCT (src_doc, dst_doc) edge dataset).

    Level-synchronous frontier expansion, TWO hash exchanges per level:

    1. ``hash_join(frontier, edges, on=src)`` expands the frontier;
    2. one fused partition on the discovered id: unique(candidates)
       LEFT ANTI visited — the dataset analogue of the engine's sharded
       URL-seen set (state/seen.py), with the distinct folded into the
       same exchange instead of a separate combiner pass.

    Rounds = graph depth (log |V| on link graphs with tree-like cores).
    Re-shipping the edge set through exchange 1 every level is the
    declarative formulation's cost — the engine avoids it by holding
    edges/seen sharded in actors, which is the 100 TB path. Visited
    fronts accumulate as materialized O(|V|) blocks; the driver sees
    only per-round counts until the final bounded result."""
    import pandas as pd
    import ray.data as rd

    from linkinator_ray.pipelines.hashagg import hash_partition_apply

    edges = edges.materialize()
    root_t = pa.table({"doc_id": pa.array(sorted(set(roots)), pa.int64()),
                       "depth": pa.array([0] * len(set(roots)), pa.int64())})
    fronts = [rd.from_arrow(root_t)]
    frontier = fronts[0]

    # explicit arrow projection instead of select_columns: the per-round
    # frontier comes out of map_groups as pandas blocks, where
    # select_columns does not reliably project (observed on Ray 2.49 —
    # the downstream join then saw the depth column), and this also
    # normalizes every union input back to arrow blocks
    def proj(src_col: str, tag_val: int | None = None):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            cols = {"doc_id": pc.cast(batch[src_col], pa.int64())}
            if tag_val is not None:
                cols["__new"] = pa.array([tag_val] * batch.num_rows,
                                         pa.int8())
            return pa.table(cols)
        return fn

    for depth in range(1, max_rounds + 1):
        cand = hash_join(
            frontier.map_batches(proj("doc_id"), batch_format="pyarrow"),
            edges, on="doc_id", right_on="src_doc", num_parts=num_parts) \
            .map_batches(proj("dst_doc"), batch_format="pyarrow")

        visited = fronts[0].map_batches(proj("doc_id", 0),
                                        batch_format="pyarrow")
        for f in fronts[1:]:
            visited = visited.union(
                f.map_batches(proj("doc_id", 0), batch_format="pyarrow"))
        tagged = cand.map_batches(proj("doc_id", 1),
                                  batch_format="pyarrow").union(visited)

        def antidiff(df: "pd.DataFrame", d: int = depth) -> "pd.DataFrame":
            new = df.loc[df["__new"] == 1, "doc_id"].unique()
            seen = df.loc[df["__new"] == 0, "doc_id"].to_numpy()
            fresh = new[~np.isin(new, seen)]
            return pd.DataFrame({
                "doc_id": fresh.astype(np.int64),
                "depth": np.full(len(fresh), d, np.int64)})

        new = hash_partition_apply(tagged, "doc_id", antidiff,
                                   num_parts=num_parts).materialize()
        if new.count() == 0:
            break
        fronts.append(new)
        frontier = new
    else:
        raise RuntimeError(f"BFS did not drain in {max_rounds} rounds")

    out = fronts[0]
    for f in fronts[1:]:
        out = out.union(f)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
