"""The BFS crawl driver — the Ray-native replacement for the reference's
event-loop queue (/root/reference/src/index.ts:216-927, src/queue.ts).

Design (SURVEY.md §3 "Ray-native lifecycle"): the frontier is a table of
``(url, url_hash, host, parent, depth, do_crawl, root_path, attempt,
not_before)`` rows; each round:

1. split runnable vs deferred on ``not_before`` (the round loop is the
   clock — no timers);
2. rewrite + skip-classify (vectorized kernel; SKIPPED rows → results);
3. per-host politeness gate (429 deadlines + optional token-bucket
   stagger) → more deferrals;
4. fetch via the host-sticky actor pool (stages/fetch.py);
5. handle Retry-After re-enqueues (max-of-deadlines per host,
   src/index.ts:1035-1043) and error-retry backoff (:1069-1109);
6. classify (stages/classify.py) → results rows;
7. extract links from crawled bodies (stages/extract.py, distributed via
   ``ray.data`` ``map_batches`` when the round is large), dedup edges,
   consult the sharded seen-set (batched anti-join) → next frontier;
8. validate fragments whose target page was fetched this round;
9. checkpoint frontier + seen shards + lineage (state/checkpoint.py).

After the loop: the duplicate-broken hash join (SURVEY.md §2.4 J1)
re-reports every BROKEN URL once per distinct referring parent.

Equality contract vs the reference (SURVEY.md §2.6): final URL-seen set,
per-URL state/status, per-(url,parent) BROKEN edges, and retry counts —
not emit order, which is nondeterministic in the reference.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from linkinator_ray import schema, urlkit
from linkinator_ray.options import CheckOptions, LinkState
from linkinator_ray.sources.documents import CorpusIndex
from linkinator_ray.stages import classify as classify_mod
from linkinator_ray.stages.extract import ExtractLinks, extract_css_doc_links
from linkinator_ray.stages.fetch import FetchPool
from linkinator_ray.state import checkpoint as ckpt
from linkinator_ray.state.clock import Clock, FakeClock
from linkinator_ray.state.seen import SeenSet


@dataclasses.dataclass
class CrawlResult:
    passed: bool
    results: pa.Table       # schema.RESULTS
    stats: dict
    call_log: list


def _frontier_rows(**cols) -> pa.Table:
    return schema.table(schema.FRONTIER, **cols)


def host_fair_order(table: pa.Table) -> pa.Table:
    """Priority order for a dispatch slice: host round-robin first
    (every queued host gets its 1st URL before any host gets its 2nd),
    BFS depth as tiebreak, arrival order last. Within one host the
    arrival order is preserved EXACTLY (the within-host rank is the
    within-host arrival index), which is what scripted response
    sequences rely on."""
    n = table.num_rows
    if n <= 1:
        return table
    hosts = table["host"]
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    code = np.asarray(hosts.dictionary_encode().indices
                      .to_numpy(zero_copy_only=False), dtype=np.int64)
    by_host = np.argsort(code, kind="stable")
    sorted_code = code[by_host]
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = sorted_code[1:] != sorted_code[:-1]
    starts = np.flatnonzero(boundary)
    within = np.arange(n, dtype=np.int64) - \
        np.repeat(starts, np.diff(np.append(starts, n)))
    rank = np.empty(n, dtype=np.int64)
    rank[by_host] = within
    depth = np.asarray(table["depth"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    arrival = np.arange(n, dtype=np.int64)
    order = np.lexsort((arrival, depth, rank))
    return table.take(pa.array(order))


def compute_requeues(fetched: pa.Table, now: float, delay_map: dict,
                     opts: CheckOptions, rng) -> tuple[pa.Table, list, int]:
    """Retry-After re-enqueues with host-wide max-of-deadlines
    (src/index.ts:1019-1060) and error-retry backoff (:1069-1109).
    Mutates ``delay_map``; shared by the driver loop (LinkChecker) and
    the mesh fetch actors (state/mesh.py)."""
    requeues: list[pa.Table] = []
    n_retries = 0
    if fetched.num_rows == 0:
        return fetched, requeues, 0
    ra_epoch = fetched["retry_after_epoch"].to_numpy(zero_copy_only=False)
    ra_mask = ra_epoch > 0
    if ra_mask.any():
        rows = fetched.filter(pa.array(ra_mask))
        hosts = rows["host"].to_pylist()
        epochs = ra_epoch[ra_mask]
        for host, epoch in zip(hosts, epochs):
            cur = delay_map.get(host)
            delay_map[host] = max(cur, epoch) if cur is not None else epoch
        deadlines = np.fromiter((delay_map[h] for h in hosts),
                                np.float64, len(hosts))
        requeues.append(_frontier_rows(
            url=rows["url"].to_pylist(), url_hash=rows["url_hash"].to_pylist(),
            host=hosts, parent=rows["parent"].to_pylist(),
            depth=rows["depth"].to_pylist(), do_crawl=rows["do_crawl"].to_pylist(),
            root_path=rows["root_path"].to_pylist(),
            attempt=rows["attempt"].to_pylist(),
            not_before=deadlines,
        ))
        n_retries += len(hosts)
        fetched = fetched.filter(pa.array(~ra_mask))
    attempt = fetched["attempt"].to_numpy(zero_copy_only=False).astype(np.int64)
    if "retry_error" in fetched.column_names:  # actor-side gate
        err_mask = fetched["retry_error"].to_numpy(zero_copy_only=False)
    else:
        status = fetched["status"].to_numpy(zero_copy_only=False).astype(np.int64)
        ra_left = fetched["retry_after_epoch"].to_numpy(zero_copy_only=False)
        err_mask = classify_mod.should_retry_error_mask(
            status, attempt, ra_left, opts)
    if err_mask.any():
        rows = fetched.filter(pa.array(err_mask))
        attempts = attempt[err_mask]
        delays = classify_mod.backoff_delays(attempts, opts, rng)
        requeues.append(_frontier_rows(
            url=rows["url"].to_pylist(), url_hash=rows["url_hash"].to_pylist(),
            host=rows["host"].to_pylist(), parent=rows["parent"].to_pylist(),
            depth=rows["depth"].to_pylist(), do_crawl=rows["do_crawl"].to_pylist(),
            root_path=rows["root_path"].to_pylist(),
            attempt=(attempts + 1).tolist(),
            not_before=(now + delays).tolist(),
        ))
        n_retries += int(err_mask.sum())
        fetched = fetched.filter(pa.array(~err_mask))
    return fetched, requeues, n_retries


def validate_fragment_wants(fetched: pa.Table, frags: pa.Table,
                            states: np.ndarray, is_html: np.ndarray,
                            pending: dict) -> list[tuple]:
    """Fragment validation at target-fetch time (src/index.ts:616-673,
    :878-920): requested fragments anti-joined against the page's
    fragment-target ids (extracted in the fetch actor). Satisfied pages
    pop from ``pending``; misses → (url#frag, status, parent,
    failure_json) tuples, reported BROKEN with the page's status and the
    page's own parent. Shared by the driver loop and the mesh nodes."""
    has_body = fetched["has_body"].to_numpy(zero_copy_only=False)
    ok_pages = np.flatnonzero((states == "OK") & is_html & has_body)
    out: list[tuple] = []
    if len(ok_pages) == 0:
        return out
    present_by_page: dict[str, set[str]] = {}
    for page, frag in zip(frags["page_url"].to_pylist(),
                          frags["fragment_id"].to_pylist()):
        present_by_page.setdefault(page, set()).add(frag)
    urls = fetched["url"].to_pylist()
    parents = fetched["parent"].to_pylist()
    statuses = fetched["status"].to_numpy(zero_copy_only=False)
    soft404s = fetched["soft404"].to_numpy(zero_copy_only=False)
    for i in ok_pages:
        url = urls[i]
        wanted = pending.pop(url, None)
        if not wanted:
            continue
        if soft404s[i]:  # soft-404 heuristic (src/index.ts:630-637)
            continue
        present = present_by_page.get(url, set())
        for frag in sorted(wanted - present):
            out.append((
                f"{url}#{frag}", int(statuses[i]), parents[i],
                f'[{{"error": "Fragment identifier \'#{frag}\' not found on page"}}]'))
    return out


def assemble_result_tables(fetched: pa.Table, link_results: pa.Table,
                           round_no: int, counters: dict,
                           check_css: bool = False) -> tuple[list, pa.Table]:
    """Classified fetch output → RESULTS(+frontier_level) tables.

    The per-round results-assembly shared by the driver loop and the
    mesh fetch actors: redirect-skipped rows → SKIPPED, actor-classified
    rows pass through as Arrow columns, link-level results append.
    Returns (result tables, remaining fetched rows) and bumps the warn /
    pages counters. ``fetched`` must carry actor-side classification
    columns (state/failure/warn_*/recurse_*)."""
    out: list[pa.Table] = []
    if fetched.num_rows:
        rskip = np.fromiter(
            (s != "" for s in fetched["redirect_skipped"].to_pylist()),
            bool, fetched.num_rows)
        if rskip.any():
            rows = fetched.filter(pa.array(rskip))
            n = rows.num_rows
            out.append(pa.Table.from_arrays([
                rows["url"].combine_chunks(),
                pa.array([None] * n, pa.int32()),
                pa.array(["SKIPPED"] * n, pa.string()),
                rows["parent"].combine_chunks(),
                pa.array([""] * n, pa.string()),
                pa.array(np.full(n, round_no, dtype=np.int32)),
                pa.array(np.ones(n, dtype=bool)),
            ], names=["url", "status", "state", "parent", "failure_details",
                      "round", "frontier_level"]))
            fetched = fetched.filter(pa.array(~rskip))
    if fetched.num_rows:
        n = fetched.num_rows
        out.append(pa.Table.from_arrays([
            fetched["url"].combine_chunks(),
            fetched["status"].combine_chunks(),
            fetched["state"].combine_chunks(),
            fetched["parent"].combine_chunks(),
            fetched["failure"].combine_chunks(),
            pa.array(np.full(n, round_no, dtype=np.int32)),
            pa.array(np.ones(n, dtype=bool)),
        ], names=["url", "status", "state", "parent", "failure_details",
                  "round", "frontier_level"]))
        counters["warn_status"] += int(pc.sum(fetched["warn_status"]).as_py() or 0)
        counters["warn_redirect"] += int(pc.sum(fetched["warn_redirect"]).as_py() or 0)
        counters["warn_insecure"] += int(pc.sum(fetched["warn_insecure"]).as_py() or 0)
        recurse_html = fetched["recurse_html"].to_numpy(zero_copy_only=False)
        recurse_css = fetched["recurse_css"].to_numpy(zero_copy_only=False)
        do_crawl = fetched["do_crawl"].to_numpy(zero_copy_only=False)
        has_body = fetched["has_body"].to_numpy(zero_copy_only=False)
        counters["pages_crawled"] += int(
            (do_crawl & has_body &
             (recurse_html | (recurse_css & check_css))).sum())
    if link_results.num_rows:
        n = link_results.num_rows
        out.append(pa.Table.from_arrays([
            link_results["url"].combine_chunks(),
            link_results["status"].combine_chunks(),
            link_results["state"].combine_chunks(),
            link_results["parent"].combine_chunks(),
            pa.array([""] * n, pa.string()),
            pa.array(np.full(n, round_no, dtype=np.int32)),
            pa.array(np.zeros(n, dtype=bool)),
        ], names=["url", "status", "state", "parent", "failure_details",
                  "round", "frontier_level"]))
    return out, fetched


def apply_rewrites_table(table: pa.Table, rewrites) -> pa.Table:
    """urlRewriteExpressions over frontier URLs (src/index.ts:311-318).

    Shared kernel: the driver modes and the mesh nodes must apply the
    SAME rewrite → rehash → rehost transform or their seen/routing keys
    diverge (exact-equality contract, SURVEY.md §2.6)."""
    if not rewrites:
        return table
    urls = table["url"].to_pylist()
    out, changed = [], False
    for url in urls:
        new = url
        for rw in rewrites:
            new = rw.pattern.sub(rw.replacement, new)
        changed |= new != url
        out.append(new)
    if not changed:
        return table
    hashes = urlkit.hash64_array(out)
    hosts = [urlkit.host_of(u) for u in out]
    table = table.set_column(0, "url", pa.array(out, pa.string()))
    table = table.set_column(1, "url_hash", pa.array(hashes, pa.uint64()))
    return table.set_column(2, "host", pa.array(hosts, pa.string()))


def politeness_gate_table(table: pa.Table, now: float, delay_map: dict,
                          politeness_delay: float):
    """Host deadline gate (delayCache, src/index.ts:326-342) plus the
    optional per-host token-bucket stagger (north_rule politeness):
    with ``politeness_delay`` > 0 each host runs at most one fetch per
    delay window; excess rows carry to ``not_before`` slots.

    Shared kernel (driver modes + mesh nodes). Returns
    ``(runnable, deferred_tables)`` — deferred rows carry their wake
    deadline in ``not_before``."""
    deferred = []
    if delay_map and table.num_rows:
        hosts = table["host"].to_pylist()
        deadlines = np.fromiter(
            (delay_map.get(h, 0.0) for h in hosts), np.float64, len(hosts))
        gate = deadlines > now
        if gate.any():
            parked = table.filter(pa.array(gate))
            parked = parked.set_column(
                parked.schema.get_field_index("not_before"), "not_before",
                pa.array(deadlines[gate], pa.float64()))
            deferred.append(parked)
            table = table.filter(pa.array(~gate))
    if politeness_delay > 0 and table.num_rows:
        hosts = table["host"].to_pylist()
        first_seen: dict[str, int] = {}
        slot = np.zeros(len(hosts), dtype=np.int64)
        for i, h in enumerate(hosts):
            slot[i] = first_seen.get(h, 0)
            first_seen[h] = slot[i] + 1
        later = slot > 0
        if later.any():
            parked = table.filter(pa.array(later))
            parked = parked.set_column(
                parked.schema.get_field_index("not_before"), "not_before",
                pa.array(now + slot[later] * politeness_delay, pa.float64()))
            deferred.append(parked)
            table = table.filter(pa.array(~later))
    return table, deferred


def prune_stale_spill_parts(results_dir: str | None, spill_part: int,
                            node_spill_parts: list[int]) -> None:
    """Resume hygiene: delete results_dir parquet parts written AFTER
    the checkpoint being resumed (the dead run kept spilling past its
    last snapshot; the replay re-produces those rows, so stale parts
    would double-count them in the results_dir scan). Driver parts are
    ``part_{k:05d}.parquet`` (stale when k >= the restored spill_part);
    mesh node parts are ``node{i:02d}_part_{k:05d}.parquet`` (stale when
    k >= that node's checkpointed spill_part — indices beyond the saved
    node list had no pre-checkpoint parts, so everything is stale).
    Orphan ``.tmp`` files from an interrupted atomic write also go."""
    import re
    if not results_dir or not os.path.isdir(results_dir):
        return
    pat = re.compile(r"^(?:node(\d+)_)?part_(\d+)\.parquet(\.tmp)?$")
    for name in os.listdir(results_dir):
        m = pat.match(name)
        if not m:
            continue
        node, k, tmp = m.group(1), int(m.group(2)), m.group(3)
        if tmp:
            stale = True
        elif node is None:
            stale = k >= spill_part
        else:
            i = int(node)
            floor = node_spill_parts[i] if i < len(node_spill_parts) else 0
            stale = k >= floor
        if stale:
            try:
                os.remove(os.path.join(results_dir, name))
            except FileNotFoundError:
                pass


class LinkChecker:
    """One crawl job. Construct with options + the corpus table (+ mock
    http_map); ``check()`` runs the BFS loop to frontier exhaustion."""

    def __init__(self, options: CheckOptions, documents: pa.Table | None = None,
                 http_map: list[dict] | None = None, clock: Clock | None = None,
                 corpus_host: str = "corpus.test", use_ray: bool | None = None,
                 transport_latency_s: float = 0.0, jitter_seed: int = 42,
                 multi_host: bool = False, on_results=None):
        # shallow copy: _expand_paths' markdown auto-detect assigns into
        # opts; the caller's options object must stay untouched so a
        # second check() with the same object behaves identically
        import copy
        self.opts = copy.copy(options)
        self.clock = clock or FakeClock()
        self.corpus_host = corpus_host
        self.corpus_base = f"http://{corpus_host}/"
        self.documents = documents if documents is not None \
            else schema.empty(schema.DOCUMENTS)
        self.http_map = http_map or []
        self.rng = np.random.default_rng(jitter_seed)
        if use_ray is None:
            use_ray = options.execution == "ray"
        self.use_ray = use_ray
        self.transport_latency_s = transport_latency_s
        self.multi_host = multi_host

        self.corpus = CorpusIndex(self.documents, host=corpus_host,
                                  clean_urls=options.clean_urls,
                                  markdown=options.markdown,
                                  multi_host=multi_host,
                                  directory_listing=options.directory_listing)
        self.extractor = ExtractLinks(check_css=options.check_css,
                                      corpus_base=self.corpus_base)
        self._skip_patterns = options.compiled_skips()
        self._frag_skip_patterns = options.compiled_fragment_skips()
        from linkinator_ray.state.robots import RobotsCache
        self.robots = RobotsCache.from_corpus(self.corpus, multi_host) \
            if options.respect_robots else RobotsCache()

        # mutable crawl state (the Arrow/actor re-architecture of the
        # reference's six shared caches, src/index.ts:260-265)
        self.seen = None          # SeenSet — built in check()
        self.edge_seen = None     # SeenSet over hash64(url + '|' + parent)
        self.results_tables: list[pa.Table] = []
        # frontier-level BROKEN rows retained across spills (J1 join input)
        self.broken_first_tables: list[pa.Table] = []
        self._spill_part = 0
        # per-node spill-part floors inherited from a resumed checkpoint
        # (mesh node{i}_part numbering). Carried forward into every
        # checkpoint THIS run writes — even when this run has fewer
        # nodes (or is a driver run): a later resume would otherwise see
        # no floor for those node indices, treat their FINALIZED parts
        # as stale and delete crawl results the replay never re-produces
        self._inherited_node_floors: list[int] = []
        self.dup_edge_tables: list[pa.Table] = []   # (url, parent) dup references
        self.pending_fragments: dict[str, set[str]] = {}
        self.delay_map: dict[str, float] = {}       # host → retry-after deadline
        self.counters = {
            "retries": 0, "warn_redirect": 0, "warn_insecure": 0,
            "warn_status": 0, "pages_crawled": 0, "urls_checked": 0,
            "rounds": 0,
        }
        self.static_host = self.corpus_base  # requireHttps exemption + mapUrl
        self.run_id = uuid.uuid4().hex[:12]
        self.timings = {"skip": 0.0, "fetch": 0.0, "process": 0.0}
        # §2.8 event-listener parity: the reference's 'link' events become
        # a per-batch callback over each appended results table
        self.on_results = on_results
        # per-event listeners (reference emits at src/index.ts:496, :546,
        # :601, :614, :677, :1058, :1107): 'link' | 'pagestart' | 'retry'
        # | 'redirect' | 'statusCodeWarning' | 'httpInsecure'. Zero
        # overhead when nothing is registered; driver execution modes
        # only (the mesh is the batch/cluster mode — per-URL callbacks
        # would serialize it through the driver again).
        self._listeners: dict[str, list] = {}

    def on(self, event: str, callback) -> "LinkChecker":
        """Register an event listener (reference EventEmitter surface,
        src/index.ts:193-208)."""
        self._listeners.setdefault(event, []).append(callback)
        return self

    def _emit_event(self, event: str, payload) -> None:
        for callback in self._listeners.get(event, ()):
            callback(payload)

    def _emit_warn_events(self, fetched: pa.Table, warn_status, warn_redirect,
                          warn_insecure) -> None:
        """Row-level warning events off the classified masks
        (statusCodeWarning :496, redirect :546, httpInsecure :601)."""
        if not (self._listeners.get("statusCodeWarning")
                or self._listeners.get("redirect")
                or self._listeners.get("httpInsecure")):
            return
        urls = fetched["url"].to_pylist()
        statuses = fetched["status"].to_pylist()
        finals = fetched["final_url"].to_pylist()
        for i in np.flatnonzero(warn_status):
            self._emit_event("statusCodeWarning",
                             {"url": urls[i], "status": statuses[i]})
        for i in np.flatnonzero(warn_redirect):
            self._emit_event("redirect", {
                "url": urls[i], "status": statuses[i],
                "targetUrl": finals[i] if finals[i] != urls[i] else "",
                "isNonStandard": statuses[i] not in
                (301, 302, 303, 307, 308)})
        for i in np.flatnonzero(warn_insecure):
            self._emit_event("httpInsecure", {"url": urls[i]})

    def _emit_retry_events(self, requeues: list, now: float) -> None:
        if not self._listeners.get("retry"):
            return
        for table in requeues:
            urls = table["url"].to_pylist()
            nb = table["not_before"].to_numpy(zero_copy_only=False)
            for url, deadline in zip(urls, nb):
                self._emit_event("retry", {
                    "url": url,
                    "secondsUntilRetry": int(round(max(0.0, deadline - now)))})

    def _emit_link_rows(self, table: pa.Table) -> None:
        if not self._listeners.get("link"):
            return
        for row in table.to_pylist():
            self._emit_event("link", {
                "url": row["url"], "status": row["status"],
                "state": row["state"], "parent": row["parent"] or None,
                "failureDetails": row["failure_details"] or ""})

    # ------------------------------------------------------------------
    # seed handling (processOptions, src/options.ts:54-191)
    # ------------------------------------------------------------------

    def _expand_paths(self) -> list[str]:
        paths = []
        for path in self.opts.paths:
            if urlkit.is_absolute_url(path):
                paths.append(path)
                continue
            if any(ch in path for ch in "*?["):
                matches = sorted(fnmatch.filter(self.corpus.doc_ids(), path))
                if not matches:
                    raise ValueError(f"glob provided, but no matches found: {path}")
                paths.extend(matches)
            else:
                paths.append(path)
        if not paths:
            raise ValueError("at least one path is required")
        # no mixing of local corpus paths and absolute URLs, and
        # server_root only applies to local scans (src/options.ts:77-114)
        has_http = any(urlkit.is_absolute_url(p) for p in paths)
        has_local = any(not urlkit.is_absolute_url(p) for p in paths)
        if has_http and has_local:
            raise ValueError(
                "cannot mix absolute URLs and local corpus paths in one scan")
        if has_http and self.opts.server_root:
            raise ValueError("server_root cannot be used with absolute URLs")
        # markdown auto-detect (src/options.ts:156-164)
        if any(p.endswith((".md", ".mdx")) for p in paths) and not self.opts.markdown:
            self.opts.markdown = True
            self.corpus.markdown = True
        return paths

    def _seed_frontier(self) -> pa.Table:
        paths = getattr(self, "_expanded_paths", None) or self._expand_paths()
        urls, roots = [], []
        for path in paths:
            if urlkit.is_absolute_url(path):
                url = urlkit.normalize_url(path, keep_fragment=False)
            else:
                url = urlkit.normalize_url(self.corpus_base + path.lstrip("/"),
                                           keep_fragment=False)
            urls.append(url)
            roots.append(url)
        hashes = urlkit.hash64_array(urls)
        # seeds pre-inserted into the seen set (src/index.ts:267-288)
        self.seen.contains_or_insert(hashes)
        return _frontier_rows(
            url=urls, url_hash=hashes,
            host=[urlkit.host_of(u) for u in urls],
            parent=[""] * len(urls), depth=[0] * len(urls),
            do_crawl=[True] * len(urls), root_path=roots,
            attempt=[0] * len(urls), not_before=[0.0] * len(urls),
        )

    # ------------------------------------------------------------------
    # skip rules (src/index.ts:929-971)
    # ------------------------------------------------------------------

    def _should_skip(self, href: str) -> bool:
        if not href.startswith(("http://", "https://")):
            return True
        if callable(self.opts.links_to_skip):
            return bool(self.opts.links_to_skip(href))
        return any(p.search(href) for p in self._skip_patterns)

    def _has_skip_rules(self) -> bool:
        return callable(self.opts.links_to_skip) or bool(self._skip_patterns)

    def _should_skip_fragment(self, fragment: str, url: str) -> bool:
        if callable(self.opts.fragments_to_skip):
            return bool(self.opts.fragments_to_skip(fragment, url))
        return any(p.search(fragment) for p in self._frag_skip_patterns)

    # ------------------------------------------------------------------
    # results plumbing
    # ------------------------------------------------------------------

    def _emit(self, table: pa.Table) -> None:
        self.results_tables.append(table)
        if self.on_results is not None:
            self.on_results(table.drop_columns(["frontier_level"]))
        self._emit_link_rows(table)

    def _push_results(self, round_no: int, urls, statuses, states, parents,
                      failures=None, frontier_level=None):
        n = len(urls)
        if n == 0:
            return
        table = pa.table({
            "url": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.int32()),
            "state": pa.array(states, pa.string()),
            "parent": pa.array(parents, pa.string()),
            "failure_details": pa.array(failures or [""] * n, pa.string()),
            "round": pa.array([round_no] * n, pa.int32()),
        })
        table = table.append_column(
            "frontier_level",
            pa.array(frontier_level if frontier_level is not None else [False] * n,
                     pa.bool_()))
        self._emit(table)

    # ------------------------------------------------------------------
    # the round loop
    # ------------------------------------------------------------------

    def check(self, resume_from: str | None = None) -> CrawlResult:
        opts = self.opts
        # expand seeds FIRST: glob expansion and the .md/.mdx markdown
        # auto-detect (src/options.ts:156-164) mutate opts/corpus state
        # that the broadcast transport blob snapshots below
        self._expanded_paths = self._expand_paths()
        transport_blob = {
            "http_map": self.http_map,
            "documents": self.documents,
            # index structures built ONCE (driver __init__); actors get
            # them zero-copy instead of rebuilding a dict per actor
            "corpus_index": self.corpus.export_blob(),
            "corpus_host": self.corpus_host,
            "clean_urls": opts.clean_urls,
            "markdown": opts.markdown,
            "multi_host": self.multi_host,
            "directory_listing": opts.directory_listing,
            "latency_s": self.transport_latency_s,
            "strict": False,
            "transport": opts.transport,
            "timeout": opts.timeout,
            "user_agent": opts.user_agent,
            "allow_insecure_certs": opts.allow_insecure_certs,
            "proxy": opts.proxy,
            # the per-request call log exists for the conformance tests;
            # at bench/cluster scale it is an O(requests) memory and
            # end-of-run serialization cost
            "record_calls": bool(self.http_map) or self.documents.num_rows <= 50_000,
        }
        worker_kwargs = {
            "redirects": opts.redirects.value,
            "check_css": opts.check_css,
            "check_fragments": opts.check_fragments,
            "retry": opts.retry,
            "recurse": opts.recurse,
            "skip_patterns": opts.links_to_skip if not callable(opts.links_to_skip) else None,
            "skip_fn": opts.links_to_skip if callable(opts.links_to_skip) else None,
            "frag_skip_patterns": opts.fragments_to_skip
            if not callable(opts.fragments_to_skip) else None,
            "frag_skip_fn": opts.fragments_to_skip
            if callable(opts.fragments_to_skip) else None,
            "headers": opts.headers,
            "classify_opts": opts,
            "static_host": self.static_host,
        }
        # the reference's `concurrency` caps simultaneous connections
        # (src/index.ts:256-258): actors × per-actor connection threads
        # never exceed it (FetchPool forces 1 thread when host-sticky
        # ordering matters)
        num_actors = max(1, min(opts.fetch_concurrency, opts.concurrency))
        # connection threads only pay off when requests actually wait on
        # the wire (simulated latency OR the real HTTP transport); with
        # a zero-latency mock they are pure GIL churn
        waits_on_wire = self.transport_latency_s > 0 \
            or opts.transport == "http"
        worker_kwargs["connections"] = max(
            1, min(25, opts.concurrency // num_actors)) \
            if waits_on_wire else 1

        if self.use_ray and opts.mesh and self._mesh_supported(resume_from):
            return self._run_mesh(transport_blob, worker_kwargs, num_actors,
                                  resume_from=resume_from)

        self.seen = SeenSet(opts.seen_shards, opts.seen_filter, use_ray=self.use_ray)
        # edge dedup is driver-local; one vectorized shard beats sharding
        self.edge_seen = SeenSet(1, "exact", use_ray=False)
        pool = FetchPool(worker_kwargs, transport_blob, use_ray=self.use_ray,
                         num_actors=num_actors,
                         salt_threshold=opts.host_salt_threshold)

        round_no = 0
        if resume_from is not None:
            frontier, round_no = self._restore(resume_from)
        else:
            frontier = self._seed_frontier()

        if self.use_ray and opts.pipelined:
            return self._run_pipelined(pool, frontier, round_no)
        return self._run_rounds(pool, frontier, round_no)

    def _mesh_supported(self, resume_from) -> bool:
        """Everything the driver modes support runs in the mesh too:
        robots compile per node, fragment wants route to the target's
        fetch owner, checkpoints are driver-coordinated epoch snapshots.
        A resume only goes through the mesh when the checkpoint was
        written BY the mesh (same shard count — filters are not
        re-shardable across K)."""
        if resume_from is not None:
            import json
            import os
            last = ckpt.latest_round(resume_from)
            if last is None:
                return False
            with open(os.path.join(resume_from, f"round_{last:06d}",
                                   "manifest.json")) as f:
                manifest = json.load(f)
            return bool(manifest.get("extra", {}).get("mesh"))
        return True

    def _run_rounds(self, pool, frontier: pa.Table, round_no: int) -> CrawlResult:
        """Strict BFS rounds: deterministic depth ordering; each round is
        a barrier. The conformance-test execution mode."""
        opts = self.opts
        while frontier.num_rows and round_no < opts.max_rounds:
            now = self.clock.now()
            not_before = frontier["not_before"].to_numpy(zero_copy_only=False)
            runnable_mask = not_before <= now
            if not runnable_mask.any():
                self.clock.advance_to(float(not_before.min()))
                continue
            runnable = frontier.filter(pa.array(runnable_mask))
            deferred = [frontier.filter(pa.array(~runnable_mask))]

            import time as _time
            t0 = _time.perf_counter()
            runnable = self._apply_rewrites(runnable)
            live, skipped = self._skip_stage(runnable, round_no)
            live, gated = self._politeness_gate(live, now)
            deferred.extend(gated)
            t1 = _time.perf_counter()
            if self._listeners.get("pagestart") and live.num_rows:
                do_crawl = live["do_crawl"].to_numpy(zero_copy_only=False)
                for url in np.asarray(live["url"].to_pylist(),
                                      dtype=object)[do_crawl]:
                    self._emit_event("pagestart", url)

            output = pool.fetch(live, set(self.pending_fragments), now)
            fetched = output["fetched"]
            self.counters["urls_checked"] += fetched.num_rows
            t2 = _time.perf_counter()

            fetched, requeues = self._handle_retries(fetched, now)
            deferred.extend(requeues)

            new_frontier = self._process_fetched(fetched, output, round_no)
            deferred.append(new_frontier)
            t3 = _time.perf_counter()
            self.timings["skip"] += t1 - t0
            self.timings["fetch"] += t2 - t1
            self.timings["process"] += t3 - t2

            frontier = pa.concat_tables(
                [t for t in deferred if t.num_rows]).combine_chunks() \
                if any(t.num_rows for t in deferred) else schema.empty(schema.FRONTIER)
            round_no += 1
            self.counters["rounds"] = round_no
            self._maybe_spill_results()

            if opts.checkpoint_dir:
                self._checkpoint(round_no, frontier)

        return self._finish(pool)

    def _maybe_spill_results(self, force: bool = False) -> None:
        """Streaming results sink (options.results_dir): when the driver
        holds more than ``results_flush_rows`` result rows, write them to
        an atomic parquet part and keep only the frontier-level BROKEN
        rows (the duplicate-broken join's input). At 10^10 URLs the
        results never accumulate in driver memory; output is partitioned
        so a rerun diffs/resumes per part. ``force`` flushes the tail at
        finish time regardless of the threshold (never mutate the
        caller's shared opts to do this)."""
        opts = self.opts
        if not opts.results_dir:
            return
        held = sum(t.num_rows for t in self.results_tables)
        if held == 0 or (not force and held < opts.results_flush_rows):
            return
        import pyarrow.parquet as pq
        merged = pa.concat_tables(self.results_tables).combine_chunks()
        self.broken_first_tables.append(merged.filter(
            pc.and_(merged["frontier_level"],
                    pc.equal(merged["state"], "BROKEN"))))
        os.makedirs(opts.results_dir, exist_ok=True)
        part = os.path.join(opts.results_dir,
                            f"part_{self._spill_part:05d}.parquet")
        pq.write_table(merged.drop_columns(["frontier_level"]), part + ".tmp")
        os.replace(part + ".tmp", part)
        self._spill_part += 1
        self.counters["spilled_rows"] = \
            self.counters.get("spilled_rows", 0) + merged.num_rows
        self.counters["spilled_broken"] = \
            self.counters.get("spilled_broken", 0) + merged.filter(
                pc.equal(merged["state"], "BROKEN")).num_rows
        self.results_tables = []

    def _finish(self, pool) -> CrawlResult:
        self._duplicate_broken_join()
        if self.opts.results_dir and self.results_tables:
            # flush the tail (including the J1 re-reports) so the parquet
            # parts are the complete result record
            self._maybe_spill_results(force=True)
        results = self._final_results()
        # spilled rows were counted at spill time; in-memory rows (tail +
        # J1 re-reports) are disjoint from the spilled parts
        total_broken = results.filter(
            pc.equal(results["state"], "BROKEN")).num_rows \
            + self.counters.get("spilled_broken", 0)
        return CrawlResult(
            passed=total_broken == 0,
            results=results,
            stats=dict(self.counters, broken=total_broken,
                       seen_urls=self.seen.size(),
                       results_dir=self.opts.results_dir,
                       timings={k: round(v, 3) for k, v in self.timings.items()}),
            call_log=pool.call_log(),
        )

    # ------------------------------------------------------------------
    # pipelined execution — the reference's continuous queue, Ray-shaped
    # ------------------------------------------------------------------

    def _run_pipelined(self, pool, frontier: pa.Table, start_round: int) -> CrawlResult:
        """Continuous-queue execution (the reference's actual model,
        src/queue.ts): per-actor work queues, at most one in-flight batch
        per actor, completions processed as they arrive via ``ray.wait``.
        No round barriers — a straggling actor never idles the fleet.

        Semantics: identical final result/seen sets as the round mode
        (order-insensitive contract, SURVEY.md §2.6); 'round' in the
        output counts processed batches instead of BFS depths.
        """
        import ray
        import time as _time
        opts = self.opts
        num_actors = pool.num_actors
        queues: list[list[pa.Table]] = [[] for _ in range(num_actors)]
        queued_rows = 0
        deferred: list[pa.Table] = []  # rows with future not_before
        inflight: dict = {}            # future -> actor index
        batch_no = start_round

        # cumulative per-host row counts: the pipelined stream admits
        # tables incrementally, so hot-host salting needs running totals
        salt_counts: dict[str, int] = {}

        def route(table: pa.Table) -> None:
            nonlocal queued_rows
            if table.num_rows == 0:
                return
            if num_actors == 1:
                queues[0].append(table)
            else:
                if pool.sticky_hosts:
                    from linkinator_ray.stages.fetch import sticky_assignment
                    assign = sticky_assignment(
                        table["host"].to_pylist(),
                        table["url_hash"].to_numpy(zero_copy_only=False),
                        num_actors, scripted=pool.scripted,
                        salt_threshold=pool.salt_threshold,
                        counts=salt_counts)
                else:
                    key = np.asarray(
                        table["url_hash"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
                    assign = (key % np.uint64(num_actors)).astype(np.int64)
                for a in range(num_actors):
                    idx = np.flatnonzero(assign == a)
                    if len(idx):
                        queues[a].append(table.take(pa.array(idx)))
            queued_rows += table.num_rows

        def admit(table: pa.Table, now: float) -> None:
            """Rewrite + skip + politeness classify, then route. Rows
            with a future ``not_before`` (checkpoint-restored retry /
            politeness deferrals) park until their deadline — the rounds
            loop gets this via runnable_mask; this is the pipelined
            equivalent."""
            nb = table["not_before"].to_numpy(zero_copy_only=False)
            future = nb > now
            if future.any():
                deferred.append(table.filter(pa.array(future)))
                table = table.filter(pa.array(~future))
                if table.num_rows == 0:
                    return
            table = self._apply_rewrites(table)
            live, _ = self._skip_stage(table, batch_no)
            live, gated = self._politeness_gate(live, now)
            deferred.extend(t for t in gated if t.num_rows)
            route(live)

        def dispatch(now: float) -> None:
            nonlocal queued_rows
            busy = {a for a, _ in inflight.values()}
            for a in range(num_actors):
                if a in busy or not queues[a]:
                    continue
                batch = pa.concat_tables(queues[a])
                queues[a] = []
                queued_rows -= batch.num_rows
                if batch.num_rows > opts.batch_size * 4:
                    # the dispatched slice is a PRIORITY pick, not FIFO:
                    # host round-robin with depth tiebreak (north_rule's
                    # depth/host-fairness queue) — a hot host whose rows
                    # arrived first can't monopolize the slice and
                    # starve cold hosts queued behind it
                    batch = host_fair_order(batch)
                    head = batch.slice(0, opts.batch_size * 4)
                    tail = batch.slice(opts.batch_size * 4)
                    queues[a] = [tail]
                    queued_rows += tail.num_rows
                    batch = head
                pend = list(self.pending_fragments)
                fut = pool.submit(a, batch, pend, now)
                inflight[fut] = (a, batch)

        admit(frontier, self.clock.now())
        while True:
            now = self.clock.now()
            # wake deferred rows whose deadline passed
            if deferred:
                still = []
                for t in deferred:
                    nb = t["not_before"].to_numpy(zero_copy_only=False)
                    ready = nb <= now
                    if ready.any():
                        route(t.filter(pa.array(ready)))
                        t = t.filter(pa.array(~ready))
                    if t.num_rows:
                        still.append(t)
                deferred = still
            dispatch(now)
            if not inflight:
                if queued_rows:
                    continue
                if deferred:
                    self.clock.advance_to(min(
                        float(t["not_before"].to_numpy(zero_copy_only=False).min())
                        for t in deferred))
                    continue
                break
            t1 = _time.perf_counter()
            done, rest = ray.wait(list(inflight.keys()), num_returns=1)
            if rest:
                # opportunistic drain: group everything already finished
                # into ONE processing pass so tiny completions don't each
                # pay the global-join overhead
                more, _ = ray.wait(rest, num_returns=len(rest), timeout=0)
                done += more
            self.timings["fetch"] += _time.perf_counter() - t1
            outputs = []
            for fut in done:
                inflight.pop(fut)
                outputs.append(ray.get(fut))
            output = outputs[0] if len(outputs) == 1 else {
                key: pa.concat_tables([o[key] for o in outputs])
                for key in outputs[0]
            }
            fetched = output["fetched"]
            self.counters["urls_checked"] += fetched.num_rows
            t2 = _time.perf_counter()
            now = self.clock.now()
            fetched, requeues = self._handle_retries(fetched, now)
            deferred.extend(t for t in requeues if t.num_rows)
            new_rows = self._process_fetched(fetched, output, batch_no)
            t3 = _time.perf_counter()
            self.timings["process"] += t3 - t2
            if new_rows.num_rows:
                admit(new_rows, now)
            batch_no += 1
            self.counters["rounds"] = batch_no
            self._maybe_spill_results()
            if opts.checkpoint_dir and batch_no % 8 == 0:
                # checkpoint epoch: queued + deferred + in-flight batch
                # inputs (their results after this snapshot replay on
                # resume — re-fetching is idempotent)
                snapshot = [t for q in queues for t in q] + deferred \
                    + [b for _, b in inflight.values()]
                snapshot = pa.concat_tables(snapshot) if snapshot \
                    else schema.empty(schema.FRONTIER)
                self._checkpoint(batch_no, snapshot)
        return self._finish(pool)

    # ------------------------------------------------------------------
    # mesh execution — the driverless frontier (state/mesh.py)
    # ------------------------------------------------------------------

    def _run_mesh(self, transport_blob: dict, worker_kwargs: dict,
                  num_actors: int, resume_from: str | None = None) -> CrawlResult:
        """Actor-mesh frontier: fetch actors push candidates straight to
        seen-shard actors; shards route fresh rows back to the owning
        fetch actors; the driver only seeds, detects quiescence (two
        consecutive stable snapshots of the monotonic send/receive
        counters), drains result buffers, and runs the final
        duplicate-broken join. No per-URL driver work — the round/
        pipelined modes' ~25 µs/URL serial ceiling (BASELINE.md r1) goes
        away."""
        import time as _time

        import ray

        from linkinator_ray.state import mesh as mesh_mod
        opts = self.opts
        # cap nodes at the cluster's CPUs — requesting more would block
        # actor creation forever on a small session
        try:
            cluster_cpus = int(ray.cluster_resources().get("CPU", num_actors))
        except Exception:
            cluster_cpus = num_actors
        num_actors = max(1, min(num_actors, cluster_cpus))
        # max_concurrency=2: peer messages and driver polls land while a
        # pump computes (MeshNode guards shared state with its own lock)
        node_cls = ray.remote(num_cpus=1, max_concurrency=2)(mesh_mod.MeshNode)
        blob_ref = ray.put(transport_blob)
        opts_blob = {"batch_cap": opts.batch_size * 4, "jitter_seed": 42,
                     "frontier_spill_rows": opts.mesh_frontier_spill_rows,
                     # checkpointed runs journal inserted keys so the
                     # checkpoint is re-shardable (elastic resume at a
                     # different node count)
                     "journal_keys": bool(opts.checkpoint_dir)}
        # host affinity only when per-host actor state matters (scripted
        # sequences, Retry-After delay maps, politeness); else balance by
        # url_hash — same policy as FetchPool.sticky_hosts
        sticky = (any(e.get("seq", -1) >= 0 for e in self.http_map)
                  or opts.retry or opts.politeness_delay > 0)
        nodes = [node_cls.remote(i, num_actors, blob_ref, worker_kwargs,
                                 opts_blob, seen_mode=opts.seen_filter,
                                 sticky_hosts=sticky)
                 for i in range(num_actors)]
        try:
            return self._run_mesh_body(nodes, num_actors, sticky,
                                       transport_blob, resume_from)
        finally:
            # nodes hold handles to each other — a reference cycle Ray's
            # distributed refcounting never collects. Kill on EVERY exit
            # (including interrupts/errors) or the actors and their CPU
            # reservations leak and the next mesh run blocks forever.
            for actor in nodes:
                ray.kill(actor, no_restart=True)

    def _run_mesh_body(self, nodes, num_actors: int, sticky: bool,
                       transport_blob: dict,
                       resume_from: str | None) -> CrawlResult:
        import time as _time

        import ray

        from linkinator_ray.state import mesh as mesh_mod
        opts = self.opts
        ray.get([n.set_peers.remote(nodes[i], nodes)
                 for i, n in enumerate(nodes)])

        def enqueue_frontier(frontier: pa.Table) -> list:
            """Route frontier rows to their fetch owners."""
            if frontier.num_rows == 0:
                return []
            if sticky:
                assign = mesh_mod._host_assignment(
                    frontier["host"].to_pylist(), num_actors, {})
            else:
                hh = np.asarray(frontier["url_hash"].to_numpy(
                    zero_copy_only=False), dtype=np.uint64)
                assign = (hh % np.uint64(num_actors)).astype(np.int64)
            futs = []
            for a in range(num_actors):
                idx = np.flatnonzero(assign == a)
                if len(idx):
                    futs.append(
                        nodes[a].enqueue.remote(frontier.take(pa.array(idx))))
            return futs

        epoch = 0
        if resume_from is not None:
            frontier, epoch = self._mesh_restore(resume_from, nodes,
                                                 num_actors, sticky)
            seed_rows = frontier.num_rows
            ray.get(enqueue_frontier(frontier))
        else:
            # seeds: pre-insert into the owning nodes' seen shards
            # (src/index.ts:267-288), then enqueue each row with its
            # fetch owner
            paths = getattr(self, "_expanded_paths", None) \
                or self._expand_paths()
            urls, roots = [], []
            for path in paths:
                if urlkit.is_absolute_url(path):
                    url = urlkit.normalize_url(path, keep_fragment=False)
                else:
                    url = urlkit.normalize_url(
                        self.corpus_base + path.lstrip("/"),
                        keep_fragment=False)
                urls.append(url)
                roots.append(url)
            hashes = urlkit.hash64_array(urls)
            owner_of = (hashes % np.uint64(num_actors)).astype(np.int64)
            ray.get([nodes[a].seed.remote(hashes[owner_of == a])
                     for a in range(num_actors) if (owner_of == a).any()])
            frontier = _frontier_rows(
                url=urls, url_hash=hashes,
                host=[urlkit.host_of(u) for u in urls],
                parent=[""] * len(urls), depth=[0] * len(urls),
                do_crawl=[True] * len(urls), root_path=roots,
                attempt=[0] * len(urls), not_before=[0.0] * len(urls))
            seed_rows = frontier.num_rows
            ray.get(enqueue_frontier(frontier))

        # quiescence: monotonic counters make in-flight messages visible
        # as a sum mismatch; a consistent all-idle snapshot is terminal
        # (two in a row kept as safety margin)
        stable = 0
        last_counters: list[dict] = []
        polls: list[dict] = []
        t_start = _time.perf_counter()
        last_progress = (None, _time.monotonic())
        last_ckpt = _time.monotonic()
        # a pause starves the mesh if it re-fires before any work ran —
        # floor the epoch cadence
        ckpt_interval = max(0.25, opts.checkpoint_interval_s)
        while True:
            if opts.checkpoint_dir and _time.monotonic() - last_ckpt \
                    > ckpt_interval:
                epoch += 1
                self._mesh_checkpoint(nodes, epoch, num_actors, seed_rows)
                last_ckpt = _time.monotonic()
                last_progress = (None, _time.monotonic())
            polls = ray.get([n.poll.remote() for n in nodes])
            for p in polls:
                if p["errors"]:
                    raise RuntimeError(
                        f"mesh node failed:\n{p['errors'][0]}")
                for table in p["results"]:
                    self._emit(table)
            self._maybe_spill_results()
            last_counters = [p["counters"] for p in polls]
            busy = any(p["pump_scheduled"] or p["queued_rows"] for p in polls)
            sent_c = sum(p["sent_cand"] for p in polls)
            recv_c = sum(p["received_cand"] for p in polls)
            sent_w = sum(p["sent_wants"] for p in polls)
            recv_w = sum(p["received_wants"] for p in polls)
            sent_f = sum(p["sent_frontier"] for p in polls)
            recv_f = sum(p["received_frontier"] for p in polls)
            deferred = sum(p["deferred_rows"] for p in polls)
            # self-heal: queued work with no pump scheduled (a lost pump
            # self-message) or held coalesced sends on an idle node get
            # re-kicked instead of hanging
            for n, p in zip(nodes, polls):
                if (p["queued_rows"] and not p["pump_scheduled"]) or \
                        (p["held_cand"] and not p["pump_scheduled"]):
                    n.kick.remote()
            progress = (sent_c, recv_c, sent_f, recv_f, sent_w, recv_w)
            if progress != last_progress[0]:
                last_progress = (progress, _time.monotonic())
            elif _time.monotonic() - last_progress[1] > 60:
                raise RuntimeError(
                    f"mesh stalled 60s: nodes={polls}")
            if not busy and sent_c == recv_c and sent_w == recv_w \
                    and sent_f + seed_rows == recv_f:
                if deferred:
                    earliest = min(p["earliest_deadline"] for p in polls
                                   if p["deferred_rows"])
                    _time.sleep(max(0.0, earliest - _time.time()) + 0.002)
                    ray.get([n.kick.remote() for n in nodes])
                    stable = 0
                    last_progress = (None, _time.monotonic())
                    continue
                stable += 1
                if stable >= 2:
                    break
            else:
                stable = 0
                _time.sleep(float(__import__("os").environ.get("MESH_POLL_S", "0.002")))
        self.timings["fetch"] += _time.perf_counter() - t_start

        for counters in last_counters:
            for key, val in counters.items():
                self.counters[key] = self.counters.get(key, 0) + val
        dup_lists = ray.get([n.drain_dups.remote() for n in nodes])
        self.dup_edge_tables.extend(t for t in dup_lists if t.num_rows)
        seen_size = sum(p["seen_size"] for p in polls)
        if transport_blob.get("record_calls", True):
            logs = ray.get([n.call_log.remote() for n in nodes])
            call_log = [c for log in logs for c in log]
        else:
            call_log = []
        class _MeshFacade:
            def call_log(self):
                return call_log

        class _SeenShim:
            def size(self):
                return seen_size

        self.seen = _SeenShim()
        return self._finish(_MeshFacade())

    # ------------------------------------------------------------------
    # mesh checkpoint / resume (driver-coordinated epoch snapshots)
    # ------------------------------------------------------------------

    def _mesh_checkpoint(self, nodes, epoch: int, num_actors: int,
                         seed_rows: int) -> None:
        """Pause the mesh, wait for in-flight messages to settle (two
        identical consecutive counter snapshots under pause AND matching
        send/receive totals across nodes — a message still on the wire
        between two polls would otherwise be in neither a sender buffer
        nor a receiver queue, silently missing from the snapshot), drain
        the result buffers, snapshot every node's state, write one atomic
        checkpoint, resume. The pause costs one settle round-trip — the
        cadence knob is opts.checkpoint_interval_s."""
        import time as _time

        import ray

        from linkinator_ray.state.seen import seen_blob_to_table
        ray.get([n.pause.remote() for n in nodes])
        prev = None
        last_change = _time.monotonic()
        while True:
            polls = ray.get([n.poll.remote() for n in nodes])
            for p in polls:
                for table in p["results"]:
                    self._emit(table)
            # buffered coalesced sends must flush before the snapshot
            # (kick flushes; pumps stay suppressed while paused)
            for n, p in zip(nodes, polls):
                if p["held_cand"]:
                    n.kick.remote()
            state = [(p["sent_cand"], p["received_cand"], p["sent_wants"],
                      p["received_wants"], p["sent_frontier"],
                      p["received_frontier"], p["pump_scheduled"],
                      p["held_cand"]) for p in polls]
            # totals must balance too (mirrors the quiescence check in
            # _run_mesh_body): stable counters alone can't see a message
            # in flight across two ~5 ms polls
            totals_ok = (
                sum(p["sent_cand"] for p in polls)
                == sum(p["received_cand"] for p in polls)
                and sum(p["sent_wants"] for p in polls)
                == sum(p["received_wants"] for p in polls)
                and sum(p["sent_frontier"] for p in polls) + seed_rows
                == sum(p["received_frontier"] for p in polls))
            if prev == state and totals_ok \
                    and not any(p["pump_scheduled"] for p in polls) \
                    and not any(p["held_cand"] for p in polls):
                break
            if state != prev:
                last_change = _time.monotonic()
            elif _time.monotonic() - last_change > 60:
                # a lost message leaves sent != received forever; raise
                # with the state dump (mirrors _run_mesh_body's stall
                # detector) instead of hanging the paused mesh silently
                raise RuntimeError(
                    f"mesh checkpoint settle stalled 60s: nodes={polls}")
            prev = state
            _time.sleep(0.005)
        self._maybe_spill_results()
        snaps = ray.get([n.snapshot.remote() for n in nodes])

        _empty_res = schema.empty(schema.RESULTS).append_column(
            "frontier_level", pa.array([], pa.bool_()))
        results = pa.concat_tables(self.results_tables) \
            if self.results_tables else _empty_res
        broken_first = pa.concat_tables(self.broken_first_tables) \
            if self.broken_first_tables else _empty_res
        delay_union: dict[str, float] = {}
        for s in snaps:
            for host, deadline in s["delay_map"].items():
                cur = delay_union.get(host)
                delay_union[host] = max(cur, deadline) \
                    if cur is not None else deadline
        counters = dict(self.counters)
        for s in snaps:
            for key, val in s["counters"].items():
                counters[key] = counters.get(key, 0) + val
        tables = {
            "frontier": pa.concat_tables([s["frontier"] for s in snaps]),
            "results": results,
            "broken_first": broken_first,
            # node buffers + any dups restored from an earlier epoch
            # (held driver-side after a resume)
            "dup_edges": pa.concat_tables(
                [s["dup_edges"] for s in snaps]
                + [t.select(["url", "parent"])
                   for t in self.dup_edge_tables if t.num_rows]),
            "delay_map": pa.table({
                "host": pa.array(list(delay_union), pa.string()),
                "deadline": pa.array(list(delay_union.values()), pa.float64()),
            }),
        }
        tables["pending_fragments"] = pa.concat_tables(
            [s["pending_fragments"] for s in snaps])
        for i, s in enumerate(snaps):
            tables[f"edge_shard_{i:04d}"] = seen_blob_to_table(s["edge_seen"])
            # key journal (one binary-blob row per array — the 1M-row
            # lesson from the cuckoo format applies here too): raw u64
            # keys inserted since the previous epoch, edges paired with
            # their routing hash. This is what lets _mesh_restore
            # re-shard the checkpoint to a different node count.
            tables[f"url_keys_{i:04d}"] = pa.table({
                "data": pa.array([s["url_keys"].tobytes()], pa.binary())})
            tables[f"edge_keys_{i:04d}"] = pa.table({
                "data": pa.array([s["edge_keys"].tobytes()], pa.binary()),
                "routes": pa.array([s["edge_routes"].tobytes()],
                                   pa.binary())})
        seen_tables = [seen_blob_to_table(s["url_seen"]) for s in snaps]
        # merge this mesh's floors with inherited ones: node indices
        # this run doesn't have (resume shrank the mesh) keep their
        # checkpointed floor so their finalized parts survive a later
        # resume's prune; shared indices take max (own counters only
        # ever grow from the restored value)
        floors = [s["spill_part"] for s in snaps]
        for i, f in enumerate(self._inherited_node_floors):
            if i < len(floors):
                floors[i] = max(floors[i], f)
            else:
                floors.append(f)
        ckpt.save_round(
            self.opts.checkpoint_dir, self.run_id, epoch, tables,
            seen_tables, counters,
            extra={"mesh": True, "mesh_nodes": num_actors,
                   "journal": True,
                   "spill_part": self._spill_part,
                   "node_spill_parts": floors,
                   "clock": self.clock.now()},
        )
        ray.get([n.resume_run.remote() for n in nodes])

    def _mesh_restore(self, checkpoint_dir: str, nodes,
                      num_actors: int, sticky: bool = False) -> tuple[pa.Table, int]:
        """Load the newest mesh epoch into a fresh mesh. Same shard
        count: fast path — each node restores its own seen/edge blob.
        DIFFERENT shard count (elastic resume, e.g. checkpoint at N and
        resume at 4N nodes): the filters are rebuilt from the key
        JOURNAL — every epoch dir carries the raw u64 hashes inserted
        that epoch plus each edge key's routing hash, so the chain of
        epochs 1..last reconstructs each new node's hash range exactly.
        Frontier rows, pending wants and the delay map carry URLs/hosts
        and re-route under any count; only the filters need the journal
        (cuckoo blobs hold fingerprints, and even exact edge dumps lose
        the child-URL owner derivation)."""
        import ray

        from linkinator_ray.state.seen import seen_table_to_blob
        last = ckpt.latest_round(checkpoint_dir)
        if last is None:
            raise ValueError(f"no checkpoint found under {checkpoint_dir}")
        # defer the seen-shard reads: the elastic (journal) branch
        # rebuilds the filters from the key journal and never touches
        # the positional shard dumps — at scale the checkpoint's bulk
        manifest, tables, _ = ckpt.load_round(checkpoint_dir, last,
                                              load_seen=False)
        saved_nodes = manifest["extra"].get("mesh_nodes")
        elastic = saved_nodes != num_actors
        if elastic and not manifest["extra"].get("journal"):
            raise ValueError(
                f"mesh checkpoint was written with {saved_nodes} nodes and "
                f"carries no key journal; resume requires the same node "
                f"count (got {num_actors})")
        self.counters.update(manifest["counters"])
        self.results_tables = [tables["results"]]
        self._spill_part = int(manifest["extra"].get("spill_part", 0))
        broken_first = tables.get("broken_first")
        if broken_first is not None and broken_first.num_rows:
            self.broken_first_tables = [broken_first]
        dup = tables.get("dup_edges")
        if dup is not None and dup.num_rows:
            self.dup_edge_tables = [dup]
        delay = tables["delay_map"]
        delay_map = dict(zip(delay["host"].to_pylist(),
                             delay["deadline"].to_pylist()))
        wants = tables.get("pending_fragments")
        want_pieces: list = [None] * num_actors
        if wants is not None and wants.num_rows:
            # route each want to its target's fetch owner — same
            # assignment frontier rows use
            from linkinator_ray.state import mesh as mesh_mod
            if sticky:
                hosts = [urlkit.host_of_normalized(u)
                         for u in wants["target_url"].to_pylist()]
                assign = mesh_mod._host_assignment(hosts, num_actors, {})
            else:
                hashes = urlkit.hash64_arrow(
                    wants["target_url"].combine_chunks())
                assign = (hashes % np.uint64(num_actors)).astype(np.int64)
            for a in range(num_actors):
                idx = np.flatnonzero(assign == a)
                if len(idx):
                    want_pieces[a] = wants.take(pa.array(idx))
        saved_parts = manifest["extra"].get("node_spill_parts",
                                            [0] * (saved_nodes or num_actors))
        self._inherited_node_floors = list(saved_parts)
        # results spill files are namespaced node{i}_part{k}: a new node
        # sharing an old index continues that numbering; indices beyond
        # the old count start fresh; on shrink, orphaned old parts stay
        # on disk and the results_dir scan still collects them
        node_parts = [saved_parts[i] if i < len(saved_parts) else 0
                      for i in range(num_actors)]
        # drop parts the dead run spilled after this epoch (driver tail
        # parts >= spill_part, node parts >= that node's saved counter)
        prune_stale_spill_parts(self.opts.results_dir, self._spill_part,
                                saved_parts)
        if not elastic:
            seen_tables = ckpt.load_seen_shards(checkpoint_dir, last,
                                                manifest)
            ray.get([
                nodes[i].restore_state.remote(
                    seen_table_to_blob(seen_tables[i]),
                    seen_table_to_blob(tables[f"edge_shard_{i:04d}"]),
                    delay_map, want_pieces[i], node_parts[i])
                for i in range(num_actors)
            ])
            return tables["frontier"], manifest["round"]

        url_keys, edge_keys, edge_routes = self._load_key_journal(
            checkpoint_dir, last)
        url_owner = (url_keys % np.uint64(num_actors)).astype(np.int64)
        edge_owner = (edge_routes % np.uint64(num_actors)).astype(np.int64)
        ray.get([
            nodes[i].restore_keys.remote(
                url_keys[url_owner == i], edge_keys[edge_owner == i],
                delay_map, want_pieces[i], node_parts[i])
            for i in range(num_actors)
        ])
        return tables["frontier"], manifest["round"]

    @staticmethod
    def _load_key_journal(checkpoint_dir: str, last: int):
        """Union of the per-epoch key journals for epochs 1..last —
        (url_keys, edge_keys, edge_routes) u64 arrays. Each epoch dir
        holds only that epoch's new keys (lineage), so this read is one
        sequential pass over 8 B/key total."""
        import json as _json
        import os

        import pyarrow.parquet as pq
        urls, ekeys, eroutes = [], [], []
        for r in range(1, last + 1):
            round_dir = os.path.join(checkpoint_dir, f"round_{r:06d}")
            mpath = os.path.join(round_dir, "manifest.json")
            if not os.path.exists(mpath):
                raise ValueError(
                    f"elastic resume needs the full epoch chain; "
                    f"round {r} is missing under {checkpoint_dir}")
            with open(mpath) as f:
                names = _json.load(f)["row_counts"]
            jr = sorted(n for n in names if n.startswith("url_keys_"))
            if not jr:
                raise ValueError(
                    f"round {r} carries no key journal — elastic resume "
                    "needs every epoch written with journaling on")
            for name in jr:
                t = pq.read_table(os.path.join(round_dir, f"{name}.parquet"))
                urls.append(np.frombuffer(t["data"][0].as_py() or b"",
                                          dtype=np.uint64))
            for name in sorted(n for n in names
                               if n.startswith("edge_keys_")):
                t = pq.read_table(os.path.join(round_dir, f"{name}.parquet"))
                ekeys.append(np.frombuffer(t["data"][0].as_py() or b"",
                                           dtype=np.uint64))
                eroutes.append(np.frombuffer(t["routes"][0].as_py() or b"",
                                             dtype=np.uint64))

        def cat(parts):
            return np.concatenate(parts) if parts \
                else np.empty(0, dtype=np.uint64)
        return cat(urls), cat(ekeys), cat(eroutes)

    # ------------------------------------------------------------------

    def _apply_rewrites(self, frontier: pa.Table) -> pa.Table:
        return apply_rewrites_table(frontier, self.opts.url_rewrites)

    def _skip_stage(self, frontier: pa.Table, round_no: int):
        """Frontier-level skip classification (src/index.ts:320-323,
        :973-985): non-http(s) → SKIPPED status 0; skip rules → SKIPPED
        status null."""
        n = frontier.num_rows
        url_col = frontier["url"]
        is_http = pc.or_(pc.starts_with(url_col, "http://"),
                         pc.starts_with(url_col, "https://")) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        if callable(self.opts.links_to_skip):
            fn = self.opts.links_to_skip
            urls = frontier["url"].to_pylist()
            rule_skip = np.fromiter((bool(fn(u)) for u in urls), bool, n)
        elif self._skip_patterns:
            pats = self._skip_patterns
            urls = frontier["url"].to_pylist()
            rule_skip = np.fromiter(
                (any(p.search(u) for p in pats) for u in urls), bool, n)
        else:
            rule_skip = np.zeros(n, dtype=bool)
        if self.robots.has_rules():
            allowed = self.robots.allowed
            urls = frontier["url"].to_pylist()
            rule_skip |= np.fromiter(
                (not allowed(u) for u in urls), bool, n)
        skip_mask = ~is_http | (is_http & rule_skip)
        if skip_mask.any():
            urls = frontier["url"].to_pylist()
            parents = frontier["parent"].to_pylist()
            idx = np.flatnonzero(skip_mask)
            self._push_results(
                round_no,
                [urls[i] for i in idx],
                [0 if not is_http[i] else None for i in idx],
                ["SKIPPED"] * len(idx),
                [parents[i] for i in idx],
                frontier_level=[True] * len(idx),
            )
            live = frontier.filter(pa.array(~skip_mask))
        else:
            live = frontier
        return live, skip_mask.sum()

    def _politeness_gate(self, frontier: pa.Table, now: float):
        return politeness_gate_table(frontier, now, self.delay_map,
                                     self.opts.politeness_delay)

    def _handle_retries(self, fetched: pa.Table, now: float):
        fetched, requeues, n_retries = compute_requeues(
            fetched, now, self.delay_map, self.opts, self.rng)
        self.counters["retries"] += n_retries
        self._emit_retry_events(requeues, now)
        return fetched, requeues

    # ------------------------------------------------------------------

    def _process_fetched(self, fetched: pa.Table, output: dict,
                         round_no: int) -> pa.Table:
        """Classify, merge actor-side link results, run the dedup joins,
        build the next frontier."""
        if fetched.num_rows == 0:
            return schema.empty(schema.FRONTIER)

        # redirect-skipped rows → SKIPPED results (src/index.ts:370-373)
        rskip = np.fromiter(
            (s != "" for s in fetched["redirect_skipped"].to_pylist()),
            bool, fetched.num_rows)
        if rskip.any():
            rows = fetched.filter(pa.array(rskip))
            self._push_results(
                round_no, rows["url"].to_pylist(),
                [None] * rows.num_rows, ["SKIPPED"] * rows.num_rows,
                rows["parent"].to_pylist(),
                frontier_level=[True] * rows.num_rows)
            fetched = fetched.filter(pa.array(~rskip))
        if fetched.num_rows == 0:
            return schema.empty(schema.FRONTIER)

        if "state" in fetched.column_names:  # classified inside the actor
            # results assemble straight from the actor-computed Arrow
            # columns — no Python list round-trip on the hot path
            n = fetched.num_rows
            self._emit(pa.Table.from_arrays([
                fetched["url"].combine_chunks(),
                fetched["status"].combine_chunks(),
                fetched["state"].combine_chunks(),
                fetched["parent"].combine_chunks(),
                fetched["failure"].combine_chunks(),
                pa.array(np.full(n, round_no, dtype=np.int32)),
                pa.array(np.ones(n, dtype=bool)),
            ], names=["url", "status", "state", "parent", "failure_details",
                      "round", "frontier_level"]))
            self.counters["warn_status"] += int(pc.sum(fetched["warn_status"]).as_py() or 0)
            self.counters["warn_redirect"] += int(pc.sum(fetched["warn_redirect"]).as_py() or 0)
            self.counters["warn_insecure"] += int(pc.sum(fetched["warn_insecure"]).as_py() or 0)
            self._emit_warn_events(
                fetched,
                fetched["warn_status"].to_numpy(zero_copy_only=False),
                fetched["warn_redirect"].to_numpy(zero_copy_only=False),
                fetched["warn_insecure"].to_numpy(zero_copy_only=False))
            recurse_html = fetched["recurse_html"].to_numpy(zero_copy_only=False)
            recurse_css = fetched["recurse_css"].to_numpy(zero_copy_only=False)
        else:
            verdict = classify_mod.classify_batch(fetched, self.opts, self.static_host)
            self.counters["warn_status"] += int(verdict["warn_status"].sum())
            self.counters["warn_redirect"] += int(verdict["warn_redirect"].sum())
            self.counters["warn_insecure"] += int(verdict["warn_insecure"].sum())
            self._emit_warn_events(fetched, verdict["warn_status"],
                                   verdict["warn_redirect"],
                                   verdict["warn_insecure"])
            urls = fetched["url"].to_pylist()
            parents = fetched["parent"].to_pylist()
            statuses = fetched["status"].to_numpy(zero_copy_only=False)
            self._push_results(
                round_no, urls, statuses.tolist(), verdict["state"].tolist(),
                parents, failures=verdict["failure"].tolist(),
                frontier_level=[True] * len(urls))
            recurse_html = verdict["should_recurse_html"]
            recurse_css = verdict["should_recurse_css"]

        do_crawl = fetched["do_crawl"].to_numpy(zero_copy_only=False)
        has_body = fetched["has_body"].to_numpy(zero_copy_only=False)
        recurse = do_crawl & has_body & (
            recurse_html | (recurse_css & self.opts.check_css))
        self.counters["pages_crawled"] += int(recurse.sum())

        # actor-side per-link results (parse errors, link-level skips)
        link_results = output["link_results"]
        if link_results.num_rows:
            n = link_results.num_rows
            self._emit(pa.Table.from_arrays([
                link_results["url"].combine_chunks(),
                link_results["status"].combine_chunks(),
                link_results["state"].combine_chunks(),
                link_results["parent"].combine_chunks(),
                pa.array([""] * n, pa.string()),
                pa.array(np.full(n, round_no, dtype=np.int32)),
                pa.array(np.zeros(n, dtype=bool)),
            ], names=["url", "status", "state", "parent", "failure_details",
                      "round", "frontier_level"]))

        # fragment accumulation (A7): merge actor-noted fragments
        pend = output["pending_frags"]
        if pend.num_rows:
            for url, frag in zip(pend["target_url"].to_pylist(),
                                 pend["fragment"].to_pylist()):
                self.pending_fragments.setdefault(url, set()).add(frag)

        new_rows = self._enqueue_candidates(output["candidates"])

        if self.opts.check_fragments:
            states = np.asarray(fetched["state"].to_pylist(), dtype=object) \
                if "state" in fetched.column_names else verdict["state"]
            self._validate_fragments(fetched, output["frag_targets"],
                                     states, recurse_html, round_no)
        return new_rows

    def _enqueue_candidates(self, cand: pa.Table) -> pa.Table:
        """The two global joins of link discovery: edge dedup
        (relationshipCache, src/index.ts:800-810) and the seen-set
        anti-join (cache, :812-875). Everything per-link was already
        prepared inside the fetch actors; this stage is pure batched
        set-membership + an Arrow filter."""
        if cand.num_rows == 0:
            return schema.empty(schema.FRONTIER)
        edge_hash = np.asarray(
            cand["edge_hash"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        edge_fresh = ~self.edge_seen.contains_or_insert(edge_hash)
        url_hash = np.asarray(
            cand["url_hash"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        # consult the seen shards only for edge-fresh rows; rows already
        # edge-deduped must not re-insert their URL
        url_dup = np.zeros(len(url_hash), dtype=bool)
        fresh_idx = np.flatnonzero(edge_fresh)
        if len(fresh_idx):
            url_dup[fresh_idx] = self.seen.contains_or_insert(url_hash[fresh_idx])
        dup_mask = edge_fresh & url_dup
        if dup_mask.any():
            self.dup_edge_tables.append(
                cand.filter(pa.array(dup_mask)).select(["url", "parent"]))
        keep = edge_fresh & ~url_dup
        if not keep.any():
            return schema.empty(schema.FRONTIER)
        cand = cand.filter(pa.array(keep))
        n = cand.num_rows
        return pa.Table.from_arrays([
            cand["url"].combine_chunks(),
            cand["url_hash"].combine_chunks(),
            cand["host"].combine_chunks(),
            cand["parent"].combine_chunks(),
            cand["depth"].combine_chunks(),
            cand["do_crawl"].combine_chunks(),
            cand["root_path"].combine_chunks(),
            pa.array(np.zeros(n, dtype=np.int32)),
            pa.array(np.zeros(n, dtype=np.float64)),
        ], schema=schema.FRONTIER)

    # ------------------------------------------------------------------

    def _validate_fragments(self, fetched: pa.Table, frags: pa.Table,
                            states: np.ndarray, is_html: np.ndarray,
                            round_no: int) -> None:
        rows = validate_fragment_wants(fetched, frags, states, is_html,
                                       self.pending_fragments)
        if rows:
            self._push_results(
                round_no,
                [r[0] for r in rows], [r[1] for r in rows],
                ["BROKEN"] * len(rows), [r[2] for r in rows],
                failures=[r[3] for r in rows],
            )

    # ------------------------------------------------------------------

    def _duplicate_broken_join(self) -> None:
        """Post-hoc join replacing the in-flight wait at
        src/index.ts:840-875: every distinct (url, parent) duplicate edge
        whose URL's frontier-level result is BROKEN re-reports with that
        parent."""
        if not self.dup_edge_tables:
            return
        dup_edges = pa.concat_tables(self.dup_edge_tables).combine_chunks()
        # frontier-level BROKEN rows (one per URL by construction) —
        # an Arrow hash join stands in for the reference's in-flight
        # await + re-emit; earlier spills retained their broken rows in
        # broken_first_tables
        merged = pa.concat_tables(
            self.results_tables + self.broken_first_tables).combine_chunks()
        broken_first = merged.filter(
            pc.and_(merged["frontier_level"],
                    pc.equal(merged["state"], "BROKEN"))) \
            .select(["url", "status", "failure_details"])
        if broken_first.num_rows == 0 or dup_edges.num_rows == 0:
            return
        joined = dup_edges.join(broken_first, keys=["url"], join_type="inner")
        if joined.num_rows == 0:
            return
        n = joined.num_rows
        self._emit(pa.Table.from_arrays([
            joined["url"].combine_chunks(),
            joined["status"].combine_chunks(),
            pa.array(["BROKEN"] * n, pa.string()),
            joined["parent"].combine_chunks(),
            joined["failure_details"].combine_chunks(),
            pa.array(np.full(n, -1, dtype=np.int32)),
            pa.array(np.zeros(n, dtype=bool)),
        ], names=["url", "status", "state", "parent", "failure_details",
                  "round", "frontier_level"]))

    def _final_results(self) -> pa.Table:
        if not self.results_tables:
            empty = schema.empty(schema.RESULTS)
            return empty
        merged = pa.concat_tables(self.results_tables)
        return merged.drop_columns(["frontier_level"])

    # ------------------------------------------------------------------
    # checkpoint / resume
    # ------------------------------------------------------------------

    def _checkpoint(self, round_no: int, frontier: pa.Table) -> None:
        pending = pa.table({
            "target_url": pa.array(
                [u for u, fs in self.pending_fragments.items() for _ in fs], pa.string()),
            "fragment": pa.array(
                [f for fs in self.pending_fragments.values() for f in fs], pa.string()),
        })
        dup = pa.table({
            "url": pa.concat_arrays([t["url"].combine_chunks() for t in self.dup_edge_tables])
            if self.dup_edge_tables else pa.array([], pa.string()),
            "parent": pa.concat_arrays([t["parent"].combine_chunks() for t in self.dup_edge_tables])
            if self.dup_edge_tables else pa.array([], pa.string()),
        })
        _empty_res = schema.empty(schema.RESULTS).append_column(
            "frontier_level", pa.array([], pa.bool_()))
        results = pa.concat_tables(self.results_tables) if self.results_tables \
            else _empty_res
        # spill state: retained frontier-level BROKEN rows from earlier
        # spills (the J1 join input) must survive a crash, and a resumed
        # run must continue numbering parquet parts where it left off
        broken_first = pa.concat_tables(self.broken_first_tables) \
            if self.broken_first_tables else _empty_res
        delay = pa.table({
            "host": pa.array(list(self.delay_map), pa.string()),
            "deadline": pa.array(list(self.delay_map.values()), pa.float64()),
        })
        ckpt.save_round(
            self.opts.checkpoint_dir, self.run_id, round_no,
            {"frontier": frontier, "pending_fragments": pending,
             "dup_edges": dup, "results": results, "delay_map": delay,
             "broken_first": broken_first},
            self.seen.dump_tables(), dict(self.counters),
            extra={"clock": self.clock.now(), "spill_part": self._spill_part,
                   # carry node floors from a resumed mesh checkpoint so
                   # a later resume keeps those nodes' finalized parts
                   "node_spill_parts": self._inherited_node_floors},
        )

    def _restore(self, checkpoint_dir: str):
        last = ckpt.latest_round(checkpoint_dir)
        if last is None:
            raise ValueError(f"no checkpoint found under {checkpoint_dir}")
        # defer the seen-shard reads: the journal branch below never
        # uses them, and at scale they're the bulk of a checkpoint
        manifest, tables, _ = ckpt.load_round(checkpoint_dir, last,
                                              load_seen=False)
        self.counters.update(manifest["counters"])
        if manifest["extra"].get("mesh"):
            # mesh-written checkpoint resumed in a driver mode: the
            # per-node seen dumps are positional (node i's hash range),
            # NOT this SeenSet's layout — rebuild membership from the
            # key journal instead (raw u64 keys re-shard anywhere)
            if not manifest["extra"].get("journal"):
                raise ValueError(
                    "mesh checkpoint carries no key journal; resume it "
                    "in mesh mode with the same node count")
            url_keys, edge_keys, _ = self._load_key_journal(
                checkpoint_dir, last)
            if len(url_keys):
                self.seen.contains_or_insert(url_keys)
            if len(edge_keys):
                self.edge_seen.contains_or_insert(edge_keys)
        else:
            self.seen.restore_tables(
                ckpt.load_seen_shards(checkpoint_dir, last, manifest))
        frontier = tables["frontier"]
        pend = tables["pending_fragments"]
        for url, frag in zip(pend["target_url"].to_pylist(), pend["fragment"].to_pylist()):
            self.pending_fragments.setdefault(url, set()).add(frag)
        dup = tables["dup_edges"]
        if dup.num_rows:
            self.dup_edge_tables = [dup]
        # rebuild the edge-seen set from results parents + dup edges
        results = tables["results"]
        self.results_tables = [results]
        # restore spill state (results_dir streaming sink): resume part
        # numbering past already-written files and re-seed the retained
        # BROKEN rows so the duplicate-broken join still sees them
        self._spill_part = int(manifest["extra"].get("spill_part", 0))
        # parts the dead run spilled AFTER this checkpoint duplicate
        # rows the replay will re-produce — drop them before resuming
        self._inherited_node_floors = list(
            manifest["extra"].get("node_spill_parts", []))
        prune_stale_spill_parts(self.opts.results_dir, self._spill_part,
                                self._inherited_node_floors)
        broken_first = tables.get("broken_first")
        if broken_first is not None and broken_first.num_rows:
            self.broken_first_tables = [broken_first]
        delay = tables["delay_map"]
        self.delay_map = dict(zip(delay["host"].to_pylist(),
                                  delay["deadline"].to_pylist()))
        edge_keys = [f"{u}|{p}" for u, p in zip(dup["url"].to_pylist(),
                                                dup["parent"].to_pylist())]
        for table in (results, *self.broken_first_tables):
            edge_keys.extend(
                f"{u}|{p}" for u, p in zip(table["url"].to_pylist(),
                                           table["parent"].to_pylist()) if p)
        if edge_keys:
            self.edge_seen.contains_or_insert(urlkit.hash64_array(edge_keys))
        if isinstance(self.clock, FakeClock):
            self.clock.advance_to(manifest["extra"].get("clock", 0.0))
        return frontier, manifest["round"]


def check(options: CheckOptions, documents: pa.Table | None = None,
          http_map: list[dict] | None = None, **kwargs) -> CrawlResult:
    """Convenience one-shot scan (reference: src/index.ts:1116-1120)."""
    return LinkChecker(options, documents, http_map, **kwargs).check()
