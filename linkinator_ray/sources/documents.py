"""Corpus source: the interleaved text+media documents table.

The corpus plays the role of the reference's local static web server
(/root/reference/src/server.ts:34-189): a URL on the corpus host
resolves to a document row instead of a file on disk — mime typing by
extension, ``index.html`` for directory paths, 301 redirect for
extension-less directories, optional clean-URLs (``/about`` →
``about.html``, server.ts:119-143) and directory listings
(server.ts:172-184; listings are materialized as synthetic docs by the
fixture generator).

Storage is the Lance schema from BASELINE.json
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``;
this sandbox has no ``lance`` package, so tables are written/read as
Parquet with the identical Arrow schema — ``read_documents`` prefers
Lance when importable.
"""

from __future__ import annotations

import posixpath
from urllib.parse import unquote, urlsplit

import pyarrow as pa
import pyarrow.parquet as pq

from linkinator_ray import schema

MIME_BY_EXT = {
    ".html": "text/html", ".htm": "text/html", ".xhtml": "application/xhtml+xml",
    ".md": "text/markdown", ".mdx": "text/markdown",
    ".css": "text/css", ".js": "application/javascript",
    ".json": "application/json", ".txt": "text/plain",
    ".png": "image/png", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
    ".gif": "image/gif", ".svg": "image/svg+xml", ".ico": "image/x-icon",
    ".mp3": "audio/mpeg", ".mp4": "video/mp4", ".webm": "video/webm",
    ".pdf": "application/pdf", ".xml": "application/xml",
}
DEFAULT_MIME = "application/octet-stream"


def content_type_for(doc_id: str, markdown_as_html: bool = False) -> str:
    ext = posixpath.splitext(doc_id)[1].lower()
    mime = MIME_BY_EXT.get(ext, DEFAULT_MIME)
    if markdown_as_html and mime == "text/markdown":
        # the reference compiles .md/.mdx to HTML before serving
        # (src/server.ts:147-165) when markdown mode is on
        return "text/html"
    return mime


def read_documents(path: str, *, columns: list[str] | None = None):
    """Read a documents table as a ray.data.Dataset (Lance preferred,
    Parquet otherwise)."""
    import ray.data as rd
    try:
        import lance  # noqa: F401
        return rd.read_lance(path, columns=columns)
    except ImportError:
        return rd.read_parquet(path, columns=columns)


def write_documents(table: pa.Table, path: str) -> None:
    pq.write_table(table, path)


class Resolution:
    """Outcome of resolving a corpus URL path (one 'request')."""

    __slots__ = ("status", "doc_id", "content_type", "location")

    def __init__(self, status: int, doc_id: str = "", content_type: str = "",
                 location: str = ""):
        self.status = status
        self.doc_id = doc_id
        self.content_type = content_type
        self.location = location


class CorpusIndex:
    """doc_id → row lookup + the static-server path rules.

    Small corpora (fixtures, per-host shards) are held as a dict; the
    at-scale path for a 100 TB corpus is a hash-join of the frontier
    against the documents Dataset on doc_id (SURVEY.md §2.4 J4) — the
    interface is the same, so the crawl driver can swap resolvers.
    """

    LISTING_PREFIX = "\x00listing:"

    def __init__(self, documents: pa.Table, *, host: str = "corpus.test",
                 clean_urls: bool = False, markdown: bool = False,
                 multi_host: bool = False, directory_listing: bool = False):
        self.host = host
        self.clean_urls = clean_urls
        self.markdown = markdown
        self.directory_listing = directory_listing
        self.multi_host = multi_host  # doc_id carries "host/path"
        # Spans stay in the Arrow table (zero-copy through the object
        # store when broadcast to fetch actors) and materialize per doc
        # on demand — each doc's body is read at most once per crawl.
        if documents is None:
            documents = schema.empty(schema.DOCUMENTS)
        self._table = documents.combine_chunks()
        self._spans_col = self._table["spans"].combine_chunks() \
            if documents.num_rows else None
        ids = documents["doc_id"].to_pylist() if documents.num_rows else []
        self._index: dict[str, int] = {d: i for i, d in enumerate(ids)}
        # directory prefixes, for the 301 dir redirect (server.ts:85-117)
        self._dirs = set()
        for doc_id in ids:
            parts = doc_id.split("/")
            for i in range(1, len(parts)):
                self._dirs.add("/".join(parts[:i]))
        self._hosts = {d.split("/", 1)[0] for d in ids} if multi_host else set()

    def has(self, doc_id: str) -> bool:
        return doc_id in self._index

    def spans_of(self, doc_id: str) -> list:
        if doc_id.startswith(self.LISTING_PREFIX):
            return self._listing_spans(doc_id[len(self.LISTING_PREFIX):])
        i = self._index.get(doc_id)
        if i is None or self._spans_col is None:
            return []
        return self._spans_col[i].as_py() or []

    def _listing_spans(self, dir_prefix: str) -> list:
        """Synthetic auto-index page: one anchor per direct child
        (server.ts:172-184 renders <ul><li><a …> of dir contents)."""
        prefix = dir_prefix + "/" if dir_prefix else ""
        children = set()
        for doc_id in self._index:
            if not doc_id.startswith(prefix):
                continue
            rest = doc_id[len(prefix):]
            children.add(rest.split("/", 1)[0] + ("/" if "/" in rest else ""))
        for d in self._dirs:
            if d.startswith(prefix) and d != dir_prefix:
                rest = d[len(prefix):]
                children.add(rest.split("/", 1)[0] + "/")
        return [
            {"kind": "anchor", "text": child, "media_ref": child,
             "offset": i * 10}
            for i, child in enumerate(sorted(children))
        ]

    def doc_ids(self) -> list[str]:
        return list(self._index)

    @property
    def table(self) -> pa.Table:
        return self._table

    def resolve_url(self, url: str) -> Resolution | None:
        """None if the URL is not on the corpus host; else a Resolution.

        In multi-host mode (scaled bench corpora) doc_ids are
        "host/path" and any host whose docs are present resolves."""
        parts = urlsplit(url)
        hostname = (parts.hostname or "").lower()
        path = unquote(parts.path or "/")
        if self.multi_host:
            if hostname not in self._hosts:
                return None
            return self.resolve_path(hostname + "/" + path.lstrip("/"))
        if hostname != self.host:
            return None
        return self.resolve_path(path)

    def resolve_path(self, path: str) -> Resolution:
        raw = path.lstrip("/")
        if path.endswith("/") or raw == "":
            raw = raw + "index.html"
        if raw in self._index:
            return Resolution(200, raw, content_type_for(raw, self.markdown))
        if self.clean_urls:
            # /about → about.html (server.ts:119-143)
            for suffix in (".html", ".htm"):
                cand = raw + suffix
                if cand in self._index:
                    return Resolution(200, cand, content_type_for(cand, self.markdown))
        if self.directory_listing and raw.endswith("index.html"):
            # auto-index for directories without index.html
            # (server.ts:94-95, :172-184)
            dir_prefix = raw[:-len("index.html")].rstrip("/")
            if dir_prefix in self._dirs or dir_prefix == "":
                return Resolution(200, self.LISTING_PREFIX + dir_prefix,
                                  "text/html")
        if raw in self._dirs:
            # directory without trailing slash → 301 to path + '/'
            # (server.ts:85-117)
            return Resolution(301, location="/" + raw + "/")
        return Resolution(404)
