"""Span → link extraction: the engine's core ``map_batches`` stage.

Re-expresses the reference's streaming HTML link extractor
(/root/reference/src/links.ts:67-181 and its tag→attribute table at
:8-41) over the structured span representation of the corpus: each
document row carries ``spans: list<struct<kind,text,media_ref,offset>>``;
this stage explodes them (zero-copy via Arrow list offsets) and emits one
``links`` row per extracted URL, preserving in-document span order.

Dispatch per span kind (schema.SPAN_KINDS):
  base            → rebase, first wins            (links.ts:83-86)
  direct kinds    → media_ref is the link         (links.ts:131-140)
  srcset_raw      → split candidates              (links.ts:204-218)
  meta_refresh    → parse '0;url=X'               (links.ts:107-115)
  meta_content    → only absolute-URL-looking     (links.ts:116-121)
  style_url       → css url()/@import, iff check_css (links.ts:123-129, :152-161)
  jsonld_url      → schema.org URL fields         (links.ts:94-97, :162-174)
  fragment_target → fragment-id table, not a link (links.ts:363-399)
  text            → nothing
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from linkinator_ray import schema, urlkit
from linkinator_ray.urlkit import LinkResolver


def default_url_for_doc(doc_id: str, corpus_base: str = "http://corpus.test/") -> str:
    """Map a doc_id to its canonical URL (the analogue of the reference's
    local static server address rewrite, src/index.ts:222-250)."""
    return corpus_base + doc_id


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents → flat spans table, order preserved within each doc.

    This is the round-trip operator behind the per-row span-sequence
    invariant: output ordered by (doc_id row, offset) with a dense
    ``order`` rank per doc. Pure Arrow (list_flatten / list_parent_indices);
    no Python row loop.
    """
    spans_col = batch["spans"].combine_chunks()
    if isinstance(spans_col, pa.ChunkedArray):
        spans = spans_col.chunk(0) if spans_col.num_chunks else \
            pa.array([], type=spans_col.type)
    else:
        spans = spans_col
    flat = pc.list_flatten(spans)
    parent_idx = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch["doc_id"], parent_idx)
    # dense order rank within each doc = position - list_offset(parent)
    offsets_per_parent = pc.list_value_length(spans)
    import numpy as np
    lengths = offsets_per_parent.to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1])) if len(lengths) else np.array([], dtype=np.int64)
    positions = np.arange(len(flat), dtype=np.int64)
    order = positions - np.repeat(starts, lengths) if len(lengths) else positions
    return pa.Table.from_arrays(
        [
            doc_ids,
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("offset"),
            pa.array(order, type=pa.int32()),
        ],
        names=["doc_id", "kind", "text", "media_ref", "offset", "order"],
    )


class ExtractLinks:
    """Callable for ``map_batches``: documents batch → links rows.

    Stateless in data terms but holds compiled regexes and the resolve
    memo — pass the class to ``map_batches(ExtractLinks, ...)`` so setup
    runs once per actor, or an instance for task-based stages.

    Parameters
    ----------
    check_css : extract style_url spans (reference checkCss option)
    url_for_doc : doc_id → page URL (base for relative resolution)
    emit_fragment_targets : include fragment_target rows in a second
        output table via :meth:`extract_with_fragments`.
    """

    def __init__(self, check_css: bool = False, corpus_base: str = "http://corpus.test/",
                 page_urls: dict[str, str] | None = None):
        self.check_css = check_css
        self.corpus_base = corpus_base
        self.page_urls = page_urls or {}
        self.resolver = LinkResolver()

    def page_url(self, doc_id: str) -> str:
        return self.page_urls.get(doc_id) or default_url_for_doc(doc_id, self.corpus_base)

    # -- per-document extraction (the inner kernel) ------------------------

    def extract_doc(self, doc_id: str, page_url: str, spans: list[dict],
                    parent_url: str | None = None):
        """Extract (links, fragment_ids) from one document's span list.

        ``page_url`` is the resolution base (the final response URL,
        src/index.ts:690); ``parent_url`` the URL recorded as the links'
        parent (the originally-checked URL) — defaults to page_url.
        Returns (list of link dicts, list of fragment ids). Span order is
        the emit order; ``order`` numbers emitted links densely.
        """
        parent = parent_url or page_url
        spans = sorted(spans, key=lambda s: s["offset"])
        base = page_url
        base_set = False
        out: list[dict] = []
        frags: list[str] = []
        resolve = self.resolver.resolve

        def emit(raw_link: str, kind: str):
            parsed = resolve(raw_link, base)
            out.append({
                "doc_id": doc_id,
                "parent_url": parent,
                "raw_link": raw_link,
                "url": parsed.url or "",
                "url_with_fragment": parsed.url_with_fragment or "",
                "fragment": parsed.fragment or "",
                "parse_error": parsed.error or "",
                "kind": kind,
                "order": len(out),
            })

        for span in spans:
            kind = span["kind"]
            ref = span["media_ref"] or ""
            if kind == "text":
                continue
            if kind == "base":
                if not base_set and ref:
                    base = urlkit.get_base_url(ref, page_url)
                    base_set = True
                continue
            if kind == "fragment_target":
                if span["text"]:
                    frags.append(span["text"])
                continue
            if kind in schema.DIRECT_LINK_KINDS:
                if ref:
                    emit(ref, kind)
            elif kind == "srcset_raw":
                for url in urlkit.parse_srcset(ref):
                    emit(url, "srcset_candidate")
            elif kind == "meta_refresh":
                url = urlkit.parse_meta_refresh(ref)
                if url:
                    emit(url, kind)
            elif kind == "meta_content":
                # only validate meta content that already looks like a URL
                if ref and urlkit.is_absolute_url(ref):
                    emit(ref, kind)
            elif kind == "style_url":
                if self.check_css:
                    for url in urlkit.extract_urls_from_css(span["text"] or ref):
                        emit(url, kind)
            elif kind == "jsonld_url":
                for url in urlkit.extract_links_from_jsonld_text(span["text"] or ref):
                    emit(url, kind)
            # unknown kinds are ignored (forward compatibility)
        return out, frags

    # -- batch kernels -----------------------------------------------------

    def extract_with_fragments(self, batch: pa.Table) -> tuple[pa.Table, pa.Table]:
        """documents batch → (links table, fragment_targets table)."""
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        links_rows: list[dict] = []
        frag_pages: list[str] = []
        frag_ids: list[str] = []
        for doc_id, spans in zip(doc_ids, spans_col):
            page = self.page_url(doc_id)
            links, frags = self.extract_doc(doc_id, page, spans or [])
            links_rows.extend(links)
            frag_pages.extend([page] * len(frags))
            frag_ids.extend(frags)
        links_table = (
            pa.Table.from_pylist(links_rows, schema=schema.LINKS)
            if links_rows else schema.empty(schema.LINKS)
        )
        frags_table = pa.Table.from_arrays(
            [pa.array(frag_pages, pa.string()), pa.array(frag_ids, pa.string())],
            schema=schema.FRAGMENT_TARGETS,
        )
        return links_table, frags_table

    def __call__(self, batch: pa.Table) -> pa.Table:
        links, _ = self.extract_with_fragments(batch)
        return links


def extract_css_doc_links(doc_id: str, page_url: str, spans: list[dict],
                          resolver: LinkResolver | None = None) -> list[dict]:
    """CSS-document branch (getCssLinks, links.ts:243-264): a text/css doc's
    spans are style_url/text runs; extract url()/@import from the whole
    body unconditionally (check_css gates *entering* css docs, not parsing
    them)."""
    resolver = resolver or LinkResolver()
    body = "".join(
        (s["text"] or s["media_ref"] or "")
        for s in sorted(spans, key=lambda x: x["offset"])
        if s["kind"] in ("text", "style_url")
    )
    out = []
    for url in urlkit.extract_urls_from_css(body):
        parsed = resolver.resolve(url, page_url)
        out.append({
            "doc_id": doc_id, "parent_url": page_url, "raw_link": url,
            "url": parsed.url or "", "url_with_fragment": parsed.url_with_fragment or "",
            "fragment": parsed.fragment or "", "parse_error": parsed.error or "",
            "kind": "style_url", "order": len(out),
        })
    return out
