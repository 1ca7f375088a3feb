"""Raw HTML / Markdown → span-sequence adapters.

The engine's corpus format is the structured span table; real-world
input is HTML/Markdown text. These adapters produce the span vocabulary
(schema.SPAN_KINDS) from raw text with the reference's extraction
semantics:

- HTML: the tag→attribute URL table (/root/reference/src/links.ts:8-33),
  <base> (:83-86), <style>/inline style (:88-92, :123-129), JSON-LD
  scripts (:94-97), meta refresh/content (:107-121),
  rel=dns-prefetch/preconnect ignore (:99-103), fragment targets incl.
  a[name] and GitHub permalinks (:363-399).
- Markdown: links/images/autolinks + GFM heading ids, matching the
  reference's serve-time compile (src/server.ts:147-165) closely enough
  for fragment validation.

Exposed both as scalar functions and as a ``map_batches`` kernel
(``spans_from_text_batch``) so a raw-text corpus converts to the
documents schema as a Ray Data pipeline.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

import pyarrow as pa

from linkinator_ray import schema

# tag → attributes holding URLs (links.ts:8-33), inverted
TAG_URL_ATTRS: dict[str, list[tuple[str, str]]] = {}
_ATTR_TABLE = {
    "background": (["body"], "background"),
    "cite": (["blockquote", "del", "ins", "q"], "cite"),
    "data": (["object"], "object_data"),
    "href": (["a", "area", "embed", "link"], "anchor"),
    "icon": (["command"], "icon"),
    "longdesc": (["frame", "iframe"], "longdesc"),
    "manifest": (["html"], "manifest"),
    "poster": (["video"], "poster"),
    "pluginspage": (["embed"], "pluginspage"),
    "pluginurl": (["embed"], "pluginurl"),
    "src": (["audio", "embed", "frame", "iframe", "img", "input", "script",
             "source", "track", "video"], "media_src"),
    "srcset": (["img", "source"], "srcset_raw"),
}
for attr, (tags, kind) in _ATTR_TABLE.items():
    for tag in tags:
        TAG_URL_ATTRS.setdefault(tag, []).append((attr, kind))
# img@src is its own kind for the interleaved-media invariant
_IMG_SRC_KIND = "img_src"


class _SpanParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.spans: list[dict] = []
        self._offset = 0
        self._in_style = False
        self._style_buf: list[str] = []
        self._in_jsonld = False
        self._jsonld_buf: list[str] = []

    def emit(self, kind: str, media_ref: str = "", text: str = ""):
        self.spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                           "offset": self._offset})
        self._offset += 10

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "base" and a.get("href"):
            self.emit("base", a["href"])
        if tag == "style":
            self._in_style = True
            self._style_buf = []
        if tag == "script" and a.get("type") == "application/ld+json":
            self._in_jsonld = True
            self._jsonld_buf = []
        # fragment targets (links.ts:363-399)
        if a.get("id"):
            self.emit("fragment_target", "", a["id"])
        if tag == "a" and a.get("name"):
            self.emit("fragment_target", "", a["name"])
        if tag == "a" and a.get("id") and a.get("href", "").startswith("#") \
                and len(a.get("href", "")) > 1:
            self.emit("fragment_target", "", a["href"][1:])
        # rel ignore list (links.ts:99-103)
        if tag == "link" and a.get("rel") in ("dns-prefetch", "preconnect"):
            return
        # meta content (links.ts:107-121)
        if tag == "meta" and a.get("content"):
            if (a.get("http-equiv") or "").lower() == "refresh":
                self.emit("meta_refresh", a["content"])
            else:
                self.emit("meta_content", a["content"])
            return
        # inline style url() (links.ts:123-129)
        if a.get("style"):
            self.emit("style_url", "", a["style"])
        for attr, kind in TAG_URL_ATTRS.get(tag, []):
            value = a.get(attr)
            if value:
                if tag == "img" and attr == "src":
                    kind = _IMG_SRC_KIND
                self.emit(kind, value)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "style" and self._in_style:
            self._in_style = False
            self.emit("style_url", "", "".join(self._style_buf))
        if tag == "script" and self._in_jsonld:
            self._in_jsonld = False
            self.emit("jsonld_url", "", "".join(self._jsonld_buf))

    def handle_data(self, data):
        if self._in_style:
            self._style_buf.append(data)
        elif self._in_jsonld:
            self._jsonld_buf.append(data)
        elif data.strip():
            self.emit("text", "", data.strip())


def html_to_spans(html: str) -> list[dict]:
    parser = _SpanParser()
    parser.feed(html)
    parser.close()
    return parser.spans


# --- Markdown ---------------------------------------------------------------

_MD_HEADING = re.compile(r"^(#{1,6})\s+(.+?)\s*$")
_MD_IMAGE = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)[^)]*\)")
_MD_LINK = re.compile(r"(?<!\!)\[([^\]]*)\]\(([^)\s]+)[^)]*\)")
_MD_AUTOLINK = re.compile(r"<(https?://[^>\s]+)>")


def gfm_heading_id(text: str) -> str:
    """GitHub-flavored heading id: lowercase, punctuation stripped,
    spaces → hyphens (the scheme `marked-gfm-heading-id` implements)."""
    out = text.strip().lower()
    out = re.sub(r"[^\w\- ]", "", out, flags=re.UNICODE)
    return out.replace(" ", "-")


def markdown_to_spans(md: str) -> list[dict]:
    spans: list[dict] = []
    offset = 0

    def emit(kind, media_ref="", text=""):
        nonlocal offset
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": offset})
        offset += 10

    for line in md.splitlines():
        heading = _MD_HEADING.match(line)
        if heading:
            emit("fragment_target", "", gfm_heading_id(heading.group(2)))
            emit("text", "", heading.group(2))
            continue
        pos = 0
        events = []
        for m in _MD_IMAGE.finditer(line):
            events.append((m.start(), "img_src", m.group(2), m.group(1)))
        for m in _MD_LINK.finditer(line):
            events.append((m.start(), "anchor", m.group(2), m.group(1)))
        for m in _MD_AUTOLINK.finditer(line):
            events.append((m.start(), "anchor", m.group(1), m.group(1)))
        for _, kind, ref, text in sorted(events):
            emit(kind, ref, text)
        if not events and line.strip():
            emit("text", "", line.strip())
    return spans


# --- Ray Data kernel --------------------------------------------------------

def spans_from_text_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) raw docs → documents-schema batch; dispatch on the
    doc_id extension (.md/.mdx → markdown, else HTML)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    spans_col = []
    for doc_id, text in zip(doc_ids, texts):
        text = text or ""
        if str(doc_id).endswith((".md", ".mdx")):
            spans_col.append(markdown_to_spans(text))
        else:
            spans_col.append(html_to_spans(text))
    return pa.Table.from_pydict(
        {"doc_id": [str(d) for d in doc_ids], "spans": spans_col},
        schema=schema.DOCUMENTS)


def build_corpus_from_text(raw: pa.Table) -> pa.Table:
    """Driver-side convenience over a small raw table; at scale use
    ``ds.map_batches(spans_from_text_batch, batch_format='pyarrow')``."""
    return spans_from_text_batch(raw)
