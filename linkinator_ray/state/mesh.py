"""Actor-mesh frontier: the driverless crawl dataflow.

The round/pipelined modes route every fetched batch through the driver
for the global dedup joins — ~25 µs/URL of serial work that Amdahl-caps
compute-bound scaling at ≈0.4 (BASELINE.md round 1). The mesh moves the
whole frontier cycle into K symmetric ``MeshNode`` actors; each node is
BOTH a fetch worker and the seen/edge shard for its ``url_hash % K``
key range:

    node.pump ──candidates (url_hash % K)──▶ owner.submit_candidates
        ▲                                          │ dedup (edge+URL)
        └────────────fresh frontier rows───────────┘

In the balanced routing mode (no per-host actor state needed) a fresh
URL's dedup owner IS its fetch owner — candidate→frontier routing is a
single actor message and the owner enqueues locally, zero extra hops.
With host-sticky routing (scripted mock sequences, Retry-After delay
maps, politeness) the owner forwards fresh rows to the host's home node
— one extra hop, only when the semantics require it.

Node responsibilities: rewrites, skip classification, politeness +
retry deferrals (wall clock, owner-local), the fetch/extract/classify
state machine (stages/fetch.py), URL-seen + edge-seen filters for its
key range, duplicate-edge buffering (the J1 join input), results
buffering. The driver only seeds, polls for quiescence (monotonic
send/receive counters — an in-flight message shows up as a sum
mismatch), drains result buffers, and runs the final duplicate-broken
join.

Batching: ``enqueue``/``submit_candidates`` only append; a
self-scheduled ``pump`` message processes everything accumulated since
the last pump, so under load the mailbox coalesces many small routed
pieces into full fetch batches. Self-addressed pieces are delivered
in-process (no message, no counter — symmetric).

Reference semantics preserved: edge + URL dedup order
(src/index.ts:800-817 — edge-fresh rows only consult/insert the URL
set), duplicate-broken re-reporting input (:840-875), retry handling
(:1019-1109), fragment wants registered at link-processing time and
validated at target fetch (:754-784, :616-673). robots.txt rules are
compiled per node from the corpus. Checkpoints are driver-coordinated
epoch snapshots (pause → settle → snapshot every node → one atomic
write → resume); resume requires the same node count (filters are
hash-sharded). Every LinkChecker feature runs in this mode.

Scale notes: the frontier queue spills to node-local parquet past
``mesh_frontier_spill_rows`` (FIFO tail out, parts reloaded as the head
drains; snapshots include spilled parts), bounding per-node frontier
heap at 10^10 URLs. Candidate/result buffers are pump-bounded. Sends
are not individually acked; the monotonic counters make loss visible
(sent != received never converges, and the driver's stall detector
raises with a full state dump).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from linkinator_ray import schema, urlkit
from linkinator_ray.state.seen import SeenShard


def _host_assignment(hosts: list[str], num_nodes: int,
                     memo: dict) -> np.ndarray:
    out = np.empty(len(hosts), dtype=np.int64)
    for i, h in enumerate(hosts):
        a = memo.get(h)
        if a is None:
            a = memo[h] = int(urlkit.hash64(h) % num_nodes)
        out[i] = a
    return out


class MeshNode:
    """One symmetric node: fetch worker + seen/edge shard for its
    ``url_hash % K`` range."""

    def __init__(self, actor_id: int, num_nodes: int, transport_blob: dict,
                 worker_kwargs: dict, opts_blob: dict,
                 seen_mode: str = "exact", sticky_hosts: bool = True,
                 seen_capacity: int = 1 << 20):
        import threading
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        # the node runs with max_concurrency=2 so enqueue/submit/poll
        # land WHILE a pump computes (latency hiding — pumps otherwise
        # convoy the whole mesh into lock-step waves). All shared state
        # is guarded by this lock; the pump's long fetch/extract section
        # runs outside it.
        self.lock = threading.Lock()
        from linkinator_ray.stages.fetch import FetchWorker, build_transport
        self.actor_id = actor_id
        self.num_nodes = num_nodes
        self.worker = FetchWorker(build_transport(transport_blob),
                                  **worker_kwargs)
        self.opts = worker_kwargs["classify_opts"]
        self.batch_cap = opts_blob.get("batch_cap", 16384)
        self.rewrites = self.opts.url_rewrites or []
        self.rng = np.random.default_rng(opts_blob.get("jitter_seed", 42)
                                         + actor_id)
        self.sticky_hosts = sticky_hosts
        # robots rules are a pure function of the corpus — each node
        # compiles them locally (no shared cache actor needed)
        from linkinator_ray.state.robots import RobotsCache
        corpus = getattr(self.worker.transport, "corpus", None)
        if self.opts.respect_robots and corpus is not None:
            self.robots = RobotsCache.from_corpus(
                corpus, transport_blob.get("multi_host", False))
        else:
            self.robots = RobotsCache()
        self.url_seen = SeenShard(actor_id, seen_mode, seen_capacity)
        # edges outnumber URLs ~linkage-factor×; give the filter headroom
        self.edge_seen = SeenShard(actor_id ^ 0xFFFF, seen_mode,
                                   seen_capacity * 4)
        # key journal (checkpointed runs): raw u64 hashes inserted since
        # the last snapshot, plus each edge key's ROUTING hash (edges
        # live on their child URL's hash owner — the edge key alone
        # cannot be re-routed). The journal is what makes a checkpoint
        # RE-SHARDABLE: cuckoo blobs store fingerprints, not keys, and
        # even exact edge dumps lose the owner derivation. Drained into
        # every epoch dir (8 B/key/epoch lineage, never a full dump);
        # RAM holds one epoch's new keys only.
        self.journal_keys = bool(opts_blob.get("journal_keys", False))
        self._jr_url: list[np.ndarray] = []
        self._jr_edge_key: list[np.ndarray] = []
        self._jr_edge_route: list[np.ndarray] = []
        self.dup_edges: list[pa.Table] = []
        self.queue: list[pa.Table] = []
        self.queued_rows = 0
        self.deferred: list[pa.Table] = []
        self.delay_map: dict[str, float] = {}
        self.results_buf: list[pa.Table] = []
        self.counters = {"retries": 0, "warn_redirect": 0, "warn_insecure": 0,
                         "warn_status": 0, "pages_crawled": 0,
                         "urls_checked": 0, "rounds": 0}
        self.received_frontier = 0
        self.sent_frontier = 0
        self.received_cand = 0
        self.sent_cand = 0
        self.pump_scheduled = False
        self.pumping = False
        self.paused = False
        self.self_handle = None
        self.peers = None
        self.host_memo: dict = {}
        self.errors: list[str] = []
        self.busy_sec = 0.0
        # cross-pump send coalescing: per-peer candidate buffers. An
        # actor message costs ~1-2 ms of raylet/task overhead regardless
        # of payload, so sends flush only when a peer's buffer reaches
        # flush_rows — or all at once when this node is about to go idle
        # (progress guarantee: the last productive pump always flushes).
        self.flush_rows = opts_blob.get("flush_rows", 4096)
        self.peer_buf: list[list[pa.Table]] = []
        self.peer_buf_rows: list[int] = []
        # fragment wants: registered unconditionally on arrival
        # (reference registers at link-processing time,
        # src/index.ts:754-784); validated only when the target page is
        # fetched AFTERWARDS — a want for an already-fetched page simply
        # never validates, same as the reference's cached-page path
        self.pending_fragments: dict[str, set] = {}
        self.peer_wants: list[list[pa.Table]] = []
        self.sent_wants = 0
        self.received_wants = 0
        # node-local streaming results sink (options.results_dir): OK /
        # SKIPPED rows spill straight from the node to partitioned
        # parquet — at 10^10 URLs result rows never route through the
        # driver. Frontier-level BROKEN rows are retained in the buffer
        # (the driver's duplicate-broken join needs them).
        self.spill_part = 0
        # frontier queue spill (options.mesh_frontier_spill_rows): when
        # the in-memory queue exceeds the cap, the FIFO tail spills to a
        # node-local parquet part; pumps reload parts as the head drains.
        # At 10^10 URLs a node's frontier share can't live in heap —
        # this bounds it to ~cap rows + one part in flight. 0 = off.
        self.frontier_spill_rows = opts_blob.get("frontier_spill_rows", 0)
        self._frontier_spill_dir: str | None = None
        self._frontier_parts: list[str] = []
        self._spilled_frontier_rows = 0
        self._frontier_part_seq = 0

    def set_peers(self, self_handle, peers) -> None:
        self.self_handle = self_handle
        self.peers = peers
        self.peer_buf = [[] for _ in peers]
        self.peer_buf_rows = [0] * len(peers)
        self.peer_wants = [[] for _ in peers]

    # -- intake ------------------------------------------------------------

    def seed(self, hashes: np.ndarray) -> None:
        """Pre-insert seed URLs into this node's key range
        (src/index.ts:267-288)."""
        with self.lock:
            seen = self.url_seen.contains_or_insert(hashes)
            if self.journal_keys and (~seen).any():
                self._jr_url.append(
                    np.asarray(hashes, dtype=np.uint64)[~seen])

    def enqueue(self, table: pa.Table) -> None:
        """Frontier rows whose fetch this node owns. Rows restored from
        a checkpoint can carry a future ``not_before`` (retry backoff /
        politeness deferrals snapshotted mid-wait) — they park in
        ``deferred`` so the resume honors the original deadline instead
        of re-fetching a still-failing host immediately."""
        if table.num_rows == 0:
            return
        with self.lock:
            self.received_frontier += table.num_rows
            nb = table["not_before"].to_numpy(zero_copy_only=False)
            future = nb > time.time()
            if future.any():
                self.deferred.append(table.filter(pa.array(future)))
                table = table.filter(pa.array(~future))
            if table.num_rows:
                self._append_local(table)
            # when EVERY row parked in deferred the node cannot
            # self-wake (_schedule_pump no-ops on an empty queue): the
            # driver's quiescence loop calls wake_deferred at deadline

    def _append_local(self, table: pa.Table) -> None:
        self.queue.append(table)
        self.queued_rows += table.num_rows
        if self.frontier_spill_rows \
                and self.queued_rows > self.frontier_spill_rows:
            self._spill_frontier()
        self._schedule_pump()

    def _spill_frontier(self) -> None:
        """Keep the FIFO head (half the cap) in memory, write the tail
        to a node-local parquet part — mirrors _maybe_spill_results."""
        import os
        import tempfile

        import pyarrow.parquet as pq
        merged = pa.concat_tables(self.queue).combine_chunks()
        keep = max(1, self.frontier_spill_rows // 2)
        head = merged.slice(0, keep)
        tail = merged.slice(keep)
        if tail.num_rows == 0:
            return
        if self._frontier_spill_dir is None:
            self._frontier_spill_dir = tempfile.mkdtemp(
                prefix=f"mesh-frontier-{self.actor_id:02d}-")
        path = os.path.join(self._frontier_spill_dir,
                            f"part{self._frontier_part_seq:06d}.parquet")
        self._frontier_part_seq += 1
        pq.write_table(tail, path + ".tmp")
        os.replace(path + ".tmp", path)
        self._frontier_parts.append(path)
        self._spilled_frontier_rows += tail.num_rows
        self.queue = [head]
        self.queued_rows = head.num_rows
        self.counters["frontier_spilled_rows"] = \
            self.counters.get("frontier_spilled_rows", 0) + tail.num_rows

    def _unspill_frontier(self) -> None:
        """Reload the oldest spilled part into the queue (FIFO)."""
        import os

        import pyarrow.parquet as pq
        path = self._frontier_parts.pop(0)
        part = pq.read_table(path)
        os.unlink(path)
        self._spilled_frontier_rows -= part.num_rows
        self.queue.append(part)
        self.queued_rows += part.num_rows

    def submit_candidates(self, cand: pa.Table) -> None:
        """Candidate links whose url_hash this node owns."""
        with self.lock:
            self.received_cand += cand.num_rows
            self._accept_candidates(cand)

    def submit_wants(self, wants: pa.Table) -> None:
        """Fragment wants whose target page this node will fetch."""
        with self.lock:
            self.received_wants += wants.num_rows
            self._register_wants(wants)

    def _register_wants(self, wants: pa.Table) -> None:
        for url, frag in zip(wants["target_url"].to_pylist(),
                             wants["fragment"].to_pylist()):
            self.pending_fragments.setdefault(url, set()).add(frag)

    def _schedule_pump(self) -> None:
        if not self.pump_scheduled and not self.paused \
                and self.self_handle is not None \
                and (self.queue or self._frontier_parts):
            self.pump_scheduled = True
            self.self_handle.pump.remote()

    # -- checkpoint coordination (driver-driven epoch snapshots) ----------

    def pause(self) -> None:
        """Stop scheduling new pumps; intake keeps queueing. The driver
        waits for in-flight messages to settle (counters) then
        snapshots."""
        with self.lock:
            self.paused = True
            self._flush_peers(everything=True)

    def resume_run(self) -> None:
        with self.lock:
            self.paused = False
            self._schedule_pump()

    def snapshot(self) -> dict:
        """Consistent node state for a checkpoint — call only when
        paused and settled (the driver's counter check guarantees no
        in-flight messages)."""
        with self.lock:
            spilled = []
            if self._frontier_parts:
                import pyarrow.parquet as pq
                # parts stay on disk (the live run keeps draining them);
                # the checkpoint reads them into the frontier snapshot
                spilled = [pq.read_table(p) for p in self._frontier_parts]
            frontier = pa.concat_tables(self.queue + spilled + self.deferred) \
                if (self.queue or spilled or self.deferred) \
                else schema.empty(schema.FRONTIER)
            dups = pa.concat_tables(self.dup_edges) \
                if self.dup_edges else schema.empty(schema.EDGES)
            pending = pa.table({
                "target_url": pa.array(
                    [u for u, fs in self.pending_fragments.items()
                     for _ in fs], pa.string()),
                "fragment": pa.array(
                    [f for fs in self.pending_fragments.values()
                     for f in fs], pa.string()),
            })
            jr_url = np.concatenate(self._jr_url) if self._jr_url \
                else np.empty(0, dtype=np.uint64)
            jr_ek = np.concatenate(self._jr_edge_key) if self._jr_edge_key \
                else np.empty(0, dtype=np.uint64)
            jr_er = np.concatenate(self._jr_edge_route) \
                if self._jr_edge_route else np.empty(0, dtype=np.uint64)
            # the journal drains into THIS epoch's checkpoint dir: keys
            # live in exactly one epoch's journal, and the chain of
            # epochs 0..k reconstructs the seen sets at epoch k under
            # ANY shard count (see crawl._mesh_restore elastic path)
            self._jr_url, self._jr_edge_key, self._jr_edge_route = [], [], []
            return {
                "frontier": frontier,
                "url_seen": self.url_seen.dump(),
                "edge_seen": self.edge_seen.dump(),
                "url_keys": jr_url,
                "edge_keys": jr_ek,
                "edge_routes": jr_er,
                "pending_fragments": pending,
                "delay_map": dict(self.delay_map),
                "dup_edges": dups.group_by(["url", "parent"]).aggregate([])
                if dups.num_rows else dups,
                "counters": dict(self.counters),
                "spill_part": self.spill_part,
            }

    def restore_state(self, url_blob: dict, edge_blob: dict,
                      delay_map: dict, wants: pa.Table | None = None,
                      spill_part: int = 0) -> None:
        with self.lock:
            self.url_seen.restore(url_blob)
            self.edge_seen.restore(edge_blob)
            self.delay_map.update(delay_map)
            if wants is not None and wants.num_rows:
                self._register_wants(wants)
            self.spill_part = spill_part

    def restore_keys(self, url_keys: np.ndarray, edge_keys: np.ndarray,
                     delay_map: dict, wants: pa.Table | None = None,
                     spill_part: int = 0) -> None:
        """Elastic restore: rebuild this node's seen/edge filters from
        raw journal keys (already routed to this node's new hash range
        by the driver). Deliberately NOT journaled again — the journal
        chain in earlier epoch dirs already covers these keys under any
        future shard count."""
        with self.lock:
            if len(url_keys):
                self.url_seen.contains_or_insert(
                    np.asarray(url_keys, dtype=np.uint64))
            if len(edge_keys):
                self.edge_seen.contains_or_insert(
                    np.asarray(edge_keys, dtype=np.uint64))
            self.delay_map.update(delay_map)
            if wants is not None and wants.num_rows:
                self._register_wants(wants)
            self.spill_part = spill_part

    # -- dedup + frontier routing (the shard role) -------------------------

    def _accept_candidates(self, cand: pa.Table) -> None:
        """Edge dedup → URL dedup → fresh rows to their fetch owners.
        Mirrors the driver joins (crawl._enqueue_candidates): edge-fresh
        rows only consult/insert the URL set; (url, parent) duplicates
        whose URL is already seen are retained for the J1 join."""
        edge_hash = np.asarray(
            cand["edge_hash"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        edge_fresh = ~self.edge_seen.contains_or_insert(edge_hash)
        url_hash = np.asarray(
            cand["url_hash"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        url_dup = np.zeros(len(url_hash), dtype=bool)
        fresh_idx = np.flatnonzero(edge_fresh)
        if len(fresh_idx):
            url_dup[fresh_idx] = self.url_seen.contains_or_insert(
                url_hash[fresh_idx])
        if self.journal_keys:
            if edge_fresh.any():
                self._jr_edge_key.append(edge_hash[edge_fresh])
                self._jr_edge_route.append(url_hash[edge_fresh])
            ins = edge_fresh & ~url_dup
            if ins.any():
                self._jr_url.append(url_hash[ins])
        dup_mask = edge_fresh & url_dup
        if dup_mask.any():
            self.dup_edges.append(
                cand.filter(pa.array(dup_mask)).select(["url", "parent"]))
        keep = edge_fresh & ~url_dup
        if not keep.any():
            return
        rows = cand.filter(pa.array(keep))
        n = rows.num_rows
        frontier = pa.Table.from_arrays([
            rows["url"].combine_chunks(),
            rows["url_hash"].combine_chunks(),
            rows["host"].combine_chunks(),
            rows["parent"].combine_chunks(),
            rows["depth"].combine_chunks(),
            rows["do_crawl"].combine_chunks(),
            rows["root_path"].combine_chunks(),
            pa.array(np.zeros(n, dtype=np.int32)),
            pa.array(np.zeros(n, dtype=np.float64)),
        ], schema=schema.FRONTIER)
        if not self.sticky_hosts:
            # balanced mode: the url_hash owner IS the fetch owner
            self._append_local(frontier)
            return
        assign = _host_assignment(rows["host"].to_pylist(),
                                  self.num_nodes, self.host_memo)
        for a in range(self.num_nodes):
            idx = np.flatnonzero(assign == a)
            if not len(idx):
                continue
            piece = frontier.take(pa.array(idx))
            if a == self.actor_id:
                self._append_local(piece)
            else:
                self.sent_frontier += piece.num_rows
                self.peers[a].enqueue.remote(piece)

    # -- the work loop -----------------------------------------------------

    def _wake_deferred(self, now: float) -> None:
        if not self.deferred:
            return
        still = []
        for t in self.deferred:
            nb = t["not_before"].to_numpy(zero_copy_only=False)
            ready = nb <= now
            if ready.any():
                piece = t.filter(pa.array(ready))
                self.queue.append(piece)
                self.queued_rows += piece.num_rows
                t = t.filter(pa.array(~ready))
            if t.num_rows:
                still.append(t)
        self.deferred = still

    def pump(self) -> None:
        now = time.time()
        with self.lock:
            self.pump_scheduled = False
            if self.pumping:
                return  # the active pump reschedules on exit
            self.pumping = True
            self._wake_deferred(now)
            if not self.queue and self._frontier_parts:
                self._unspill_frontier()
            if not self.queue:
                self.pumping = False
                self._flush_peers(everything=True)
                return
            batch = pa.concat_tables(self.queue)
            self.queue = []
            self.queued_rows = 0
            if batch.num_rows > self.batch_cap:
                tail = batch.slice(self.batch_cap)
                self.queue = [tail]
                self.queued_rows = tail.num_rows
                batch = batch.slice(0, self.batch_cap)
        t0 = time.perf_counter()
        try:
            self._process(batch, now)
        except Exception:  # surfaced via poll(); fire-and-forget would lose it
            import traceback
            with self.lock:
                self.errors.append(traceback.format_exc())
        with self.lock:
            # flush coalesced sends: everything when about to go idle
            # or when a checkpoint pause is pending (the snapshot must
            # not miss buffered candidates), else only peers whose
            # buffer crossed the threshold
            self._flush_peers(everything=not self.queue or self.paused)
            self.busy_sec += time.perf_counter() - t0
            self.counters["rounds"] += 1
            self.pumping = False
            self._schedule_pump()

    def _process(self, batch: pa.Table, now: float) -> None:
        from linkinator_ray.pipelines.crawl import (assemble_result_tables,
                                                    compute_requeues,
                                                    validate_fragment_wants)
        batch = self._apply_rewrites(batch)
        with self.lock:
            batch = self._skip_stage(batch)
            batch = self._politeness_gate(batch, now)
            pending_list = list(self.pending_fragments)                 if self.opts.check_fragments else []
        if batch.num_rows == 0:
            return
        # the long fetch/extract section runs WITHOUT the lock so peer
        # messages (enqueue/submit/poll) land concurrently
        output = self.worker.fetch_batch(batch, pending_list, now)
        fetched = output["fetched"]
        with self.lock:
            self.counters["urls_checked"] += fetched.num_rows
            fetched, requeues, n_retries = compute_requeues(
                fetched, now, self.delay_map, self.opts, self.rng)
            self.counters["retries"] += n_retries
            self.deferred.extend(t for t in requeues if t.num_rows)
            results, remaining = assemble_result_tables(
                fetched, output["link_results"], self.counters["rounds"],
                self.counters, check_css=self.opts.check_css)
            self.results_buf.extend(results)
            if self.opts.check_fragments:
                # own-range wants register BEFORE validating this
                # batch's pages, so same-page/same-batch fragments
                # validate now — identical ordering to the driver loop
                self._route_wants(output["pending_frags"])
                if remaining.num_rows:
                    states = np.asarray(remaining["state"].to_pylist(),
                                        dtype=object)
                    is_html = remaining["recurse_html"].to_numpy(
                        zero_copy_only=False)
                    bad = validate_fragment_wants(
                        remaining, output["frag_targets"], states, is_html,
                        self.pending_fragments)
                    if bad:
                        k = len(bad)
                        self.results_buf.append(pa.Table.from_arrays([
                            pa.array([r[0] for r in bad], pa.string()),
                            pa.array([r[1] for r in bad], pa.int32()),
                            pa.array(["BROKEN"] * k, pa.string()),
                            pa.array([r[2] for r in bad], pa.string()),
                            pa.array([r[3] for r in bad], pa.string()),
                            pa.array(np.full(k, self.counters["rounds"],
                                             dtype=np.int32)),
                            pa.array(np.zeros(k, dtype=bool)),
                        ], names=["url", "status", "state", "parent",
                                  "failure_details", "round",
                                  "frontier_level"]))
            self._route_candidates(output["candidates"])
            self._maybe_spill_results()

    def _maybe_spill_results(self) -> None:
        opts = self.opts
        if not opts.results_dir:
            return
        held = sum(t.num_rows for t in self.results_buf)
        threshold = max(1, opts.results_flush_rows // max(1, self.num_nodes))
        if held < threshold:
            return
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        merged = pa.concat_tables(self.results_buf).combine_chunks()
        keep_mask = pc.and_(merged["frontier_level"],
                            pc.equal(merged["state"], "BROKEN"))
        keep = merged.filter(keep_mask)
        spill = merged.filter(pc.invert(keep_mask))
        if spill.num_rows:
            os.makedirs(opts.results_dir, exist_ok=True)
            part = os.path.join(
                opts.results_dir,
                f"node{self.actor_id:02d}_part_{self.spill_part:05d}.parquet")
            pq.write_table(spill.drop_columns(["frontier_level"]),
                           part + ".tmp")
            os.replace(part + ".tmp", part)
            self.spill_part += 1
            self.counters["spilled_rows"] =                 self.counters.get("spilled_rows", 0) + spill.num_rows
        self.results_buf = [keep] if keep.num_rows else []

    def _apply_rewrites(self, batch: pa.Table) -> pa.Table:
        from linkinator_ray.pipelines.crawl import apply_rewrites_table
        return apply_rewrites_table(batch, self.rewrites)

    def _skip_stage(self, batch: pa.Table) -> pa.Table:
        """Frontier-level skip classification (src/index.ts:320-323):
        non-http(s) → SKIPPED status 0; skip rules → SKIPPED status null."""
        import pyarrow.compute as pc
        n = batch.num_rows
        url_col = batch["url"].combine_chunks()
        is_http = pc.or_(pc.starts_with(url_col, "http://"),
                         pc.starts_with(url_col, "https://")) \
            .to_numpy(zero_copy_only=False)
        if self.worker.has_skip_rules():
            rule_skip = self.worker._match_skip_vec(url_col)
        else:
            rule_skip = np.zeros(n, dtype=bool)
        if self.robots.has_rules():
            allowed = self.robots.allowed
            urls = url_col.to_pylist()
            rule_skip |= np.fromiter((not allowed(u) for u in urls), bool, n)
        skip_mask = ~is_http | (is_http & rule_skip)
        if not skip_mask.any():
            return batch
        rows = batch.filter(pa.array(skip_mask))
        k = rows.num_rows
        statuses = [0 if not h else None for h in is_http[skip_mask]]
        self.results_buf.append(pa.Table.from_arrays([
            rows["url"].combine_chunks(),
            pa.array(statuses, pa.int32()),
            pa.array(["SKIPPED"] * k, pa.string()),
            rows["parent"].combine_chunks(),
            pa.array([""] * k, pa.string()),
            pa.array(np.full(k, self.counters["rounds"], dtype=np.int32)),
            pa.array(np.ones(k, dtype=bool)),
        ], names=["url", "status", "state", "parent", "failure_details",
                  "round", "frontier_level"]))
        return batch.filter(pa.array(~skip_mask))

    def _politeness_gate(self, batch: pa.Table, now: float) -> pa.Table:
        """Host Retry-After deadlines + optional per-host stagger —
        owner-local (this node IS the host's home in sticky mode).
        Shared kernel with the driver modes (exact-equality contract)."""
        from linkinator_ray.pipelines.crawl import politeness_gate_table
        live, deferred = politeness_gate_table(
            batch, now, self.delay_map, self.opts.politeness_delay)
        self.deferred.extend(t for t in deferred if t.num_rows)
        return live

    def _route_wants(self, wants: pa.Table) -> None:
        """Route fragment wants to the node that will FETCH the target
        (host owner in sticky mode, url_hash owner in balanced mode —
        the same assignment frontier rows use). Own-range wants register
        immediately so same-batch pages validate in this pump (driver-
        mode ordering)."""
        if wants.num_rows == 0:
            return
        if self.sticky_hosts:
            hosts = [urlkit.host_of_normalized(u)
                     for u in wants["target_url"].to_pylist()]
            assign = _host_assignment(hosts, self.num_nodes, self.host_memo)
        else:
            hashes = urlkit.hash64_arrow(
                wants["target_url"].combine_chunks())
            assign = (hashes % np.uint64(self.num_nodes)).astype(np.int64)
        for a in range(self.num_nodes):
            idx = np.flatnonzero(assign == a)
            if not len(idx):
                continue
            piece = wants.take(pa.array(idx))
            if a == self.actor_id:
                self._register_wants(piece)
            else:
                self.peer_wants[a].append(piece)

    def _route_candidates(self, cand: pa.Table) -> None:
        if cand.num_rows == 0:
            return
        url_hash = np.asarray(
            cand["url_hash"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        owner = (url_hash % np.uint64(self.num_nodes)).astype(np.int64)
        for a in range(self.num_nodes):
            idx = np.flatnonzero(owner == a)
            if not len(idx):
                continue
            piece = cand.take(pa.array(idx))
            if a == self.actor_id:
                self._accept_candidates(piece)
            else:
                self.peer_buf[a].append(piece)
                self.peer_buf_rows[a] += piece.num_rows

    def _flush_peers(self, everything: bool) -> None:
        for a, bufs in enumerate(self.peer_buf):
            if bufs and (everything
                         or self.peer_buf_rows[a] >= self.flush_rows):
                piece = bufs[0] if len(bufs) == 1 else pa.concat_tables(bufs)
                self.peer_buf[a] = []
                self.peer_buf_rows[a] = 0
                self.sent_cand += piece.num_rows
                self.peers[a].submit_candidates.remote(piece)
            wbufs = self.peer_wants[a] if self.peer_wants else []
            if wbufs and (everything
                          or not self.peer_buf[a]):  # ride along with flushes
                piece = wbufs[0] if len(wbufs) == 1 else pa.concat_tables(wbufs)
                self.peer_wants[a] = []
                self.sent_wants += piece.num_rows
                self.peers[a].submit_wants.remote(piece)

    # -- driver interface --------------------------------------------------

    def poll(self) -> dict:
        """Stable-state snapshot + results drain (consistent under the
        node lock; a mid-pump node reports pumping=True so the driver
        never mistakes it for idle)."""
        with self.lock:
            return self._poll_locked()

    def _poll_locked(self) -> dict:
        results = self.results_buf
        self.results_buf = []
        deferred_rows = sum(t.num_rows for t in self.deferred)
        earliest = min((float(t["not_before"].to_numpy(
            zero_copy_only=False).min()) for t in self.deferred),
            default=0.0)
        return {
            "received_frontier": self.received_frontier,
            "sent_frontier": self.sent_frontier,
            "received_cand": self.received_cand,
            "sent_cand": self.sent_cand,
            "sent_wants": self.sent_wants,
            "received_wants": self.received_wants,
            "queued_rows": self.queued_rows + self._spilled_frontier_rows,
            "held_cand": sum(self.peer_buf_rows)
            + sum(t.num_rows for bufs in self.peer_wants for t in bufs),
            "deferred_rows": deferred_rows,
            "earliest_deadline": earliest,
            "pump_scheduled": self.pump_scheduled or self.pumping,
            "counters": dict(self.counters),
            "results": results,
            "errors": self.errors,
            "busy_sec": self.busy_sec,
            "seen_size": self.url_seen.size(),
        }

    def kick(self) -> None:
        """Driver nudge: wake deferred rows whose deadline passed and
        flush any coalesced sends."""
        with self.lock:
            self._wake_deferred(time.time())
            self._flush_peers(everything=True)
            self._schedule_pump()

    def drain_dups(self) -> pa.Table:
        """One compact distinct (url, parent) table per node — concat +
        dedup happen node-side so the driver deserializes one block."""
        with self.lock:
            dups = self.dup_edges
            self.dup_edges = []
        if not dups:
            return schema.empty(schema.EDGES)
        merged = pa.concat_tables(dups).combine_chunks()
        return merged.group_by(["url", "parent"]).aggregate([])

    def call_log(self):
        return self.worker.call_log()
