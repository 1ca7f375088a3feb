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
_MISSING = object()


def _blake8(text: str) -> int:
    """C-speed 64-bit hash for the corpus index structures (internal to
    CorpusIndex — scalar lookups must stay sub-microsecond)."""
    import hashlib
    return int.from_bytes(
        hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest(),
        "little")


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
                 multi_host: bool = False, directory_listing: bool = False,
                 prebuilt: dict | None = None):
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
        self._ids_col = self._table["doc_id"].combine_chunks() \
            if documents.num_rows else None
        if prebuilt is not None:
            # zero-copy index structures shipped through the object
            # store: actor __init__ pays ~0 instead of rebuilding a
            # 10^6-entry dict per actor per crawl
            self._id_hash_sorted = prebuilt["id_hash_sorted"]
            self._id_perm = prebuilt["id_perm"]
            self._dir_hash_sorted = prebuilt["dir_hash_sorted"]
            self._hosts = set(prebuilt["hosts"])
        else:
            blob = build_corpus_index_blob(self._table, multi_host)
            self._id_hash_sorted = blob["id_hash_sorted"]
            self._id_perm = blob["id_perm"]
            self._dir_hash_sorted = blob["dir_hash_sorted"]
            self._hosts = set(blob["hosts"])
        if not multi_host:
            self._hosts = set()
        self._row_cache: dict = {}

    def row_of(self, doc_id: str) -> int | None:
        """Table row for a doc_id. Batch-minded: ``resolve_many``
        prefills the row cache for whole frontier batches (vectorized
        hash + searchsorted), so this is usually a dict hit; cold
        lookups binary-search the sorted hash index, string-verified
        against the Arrow column (hash-collision safe)."""
        hit = self._row_cache.get(doc_id, _MISSING)
        if hit is not _MISSING:
            return hit
        row = self._row_lookup(doc_id)
        if len(self._row_cache) > 4_000_000:
            self._row_cache.clear()
        self._row_cache[doc_id] = row
        return row

    def _row_lookup(self, doc_id: str) -> int | None:
        import numpy as np


        sorted_h = self._id_hash_sorted
        if sorted_h is None or len(sorted_h) == 0:
            return None
        h = np.uint64(_blake8(doc_id))
        pos = int(np.searchsorted(sorted_h, h))
        while pos < len(sorted_h) and sorted_h[pos] == h:
            row = int(self._id_perm[pos])
            if self._ids_col[row].as_py() == doc_id:
                return row
            pos += 1
        return None

    def has(self, doc_id: str) -> bool:
        return self.row_of(doc_id) is not None

    def _dir_has(self, prefix: str) -> bool:
        import numpy as np


        sorted_h = self._dir_hash_sorted
        if sorted_h is None or len(sorted_h) == 0:
            return False
        h = np.uint64(_blake8(prefix))
        pos = int(np.searchsorted(sorted_h, h))
        return pos < len(sorted_h) and sorted_h[pos] == h

    def spans_of(self, doc_id: str) -> list:
        if doc_id.startswith(self.LISTING_PREFIX):
            return self._listing_spans(doc_id[len(self.LISTING_PREFIX):])
        i = self.row_of(doc_id)
        if i is None or self._spans_col is None:
            return []
        return self._spans_col[i].as_py() or []

    def _listing_spans(self, dir_prefix: str) -> list:
        """Synthetic auto-index page: one anchor per direct child
        (server.ts:172-184 renders <ul><li><a …> of dir contents)."""
        prefix = dir_prefix + "/" if dir_prefix else ""
        children = set()
        for doc_id in self.doc_ids():
            if not doc_id.startswith(prefix):
                continue
            rest = doc_id[len(prefix):]
            children.add(rest.split("/", 1)[0] + ("/" if "/" in rest else ""))
        for d in _dirs_of(self.doc_ids()):
            if d.startswith(prefix) and d != dir_prefix:
                rest = d[len(prefix):]
                children.add(rest.split("/", 1)[0] + "/")
        return [
            {"kind": "anchor", "text": child, "media_ref": child,
             "offset": i * 10}
            for i, child in enumerate(sorted(children))
        ]

    def export_blob(self) -> dict:
        """The zero-copy index structures, for broadcasting to actors."""
        return {"id_hash_sorted": self._id_hash_sorted,
                "id_perm": self._id_perm,
                "dir_hash_sorted": self._dir_hash_sorted,
                "hosts": sorted(self._hosts)}

    def doc_ids(self) -> list[str]:
        if not hasattr(self, "_ids_list"):
            self._ids_list = self._ids_col.to_pylist() \
                if self._ids_col is not None else []
        return self._ids_list

    @property
    def table(self) -> pa.Table:
        return self._table

    def resolve_url(self, url: str) -> Resolution | None:
        """None if the URL is not on the corpus host; else a Resolution.

        In multi-host mode (scaled bench corpora) doc_ids are
        "host/path" and any host whose docs are present resolves."""
        # fast path for the normalized plain shape the crawl always
        # produces (no %-escapes / query / fragment / userinfo / port):
        # slice host+path without urlsplit+unquote (~6x cheaper)
        sep = url.find("://")
        if sep > 0:
            rest = url[sep + 3:]
            plain = True
            for ch in "%?#@:":
                if ch in rest:
                    plain = False
                    break
            if plain:
                slash = rest.find("/")
                hostname = rest if slash < 0 else rest[:slash]
                path = "/" if slash < 0 else rest[slash:]
                if hostname and hostname == hostname.lower():
                    if self.multi_host:
                        if hostname not in self._hosts:
                            return None
                        return self.resolve_path(hostname + "/" + path.lstrip("/"))
                    if hostname != self.host:
                        return None
                    return self.resolve_path(path)
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
        if self.has(raw):
            return Resolution(200, raw, content_type_for(raw, self.markdown))
        if self.clean_urls:
            # /about → about.html (server.ts:119-143)
            for suffix in (".html", ".htm"):
                cand = raw + suffix
                if self.has(cand):
                    return Resolution(200, cand, content_type_for(cand, self.markdown))
        if self.directory_listing and raw.endswith("index.html"):
            # auto-index for directories without index.html
            # (server.ts:94-95, :172-184)
            dir_prefix = raw[:-len("index.html")].rstrip("/")
            if self._dir_has(dir_prefix) or dir_prefix == "":
                return Resolution(200, self.LISTING_PREFIX + dir_prefix,
                                  "text/html")
        if self._dir_has(raw):
            # directory without trailing slash → 301 to path + '/'
            # (server.ts:85-117)
            return Resolution(301, location="/" + raw + "/")
        return Resolution(404)


def _dirs_of(ids: list[str]) -> set[str]:
    """All directory prefixes of a doc-id list (ancestor early-break:
    shared directories are visited once)."""
    dirs: set[str] = set()
    for doc_id in ids:
        pos = doc_id.rfind("/")
        while pos > 0:
            prefix = doc_id[:pos]
            if prefix in dirs:
                break
            dirs.add(prefix)
            pos = doc_id.rfind("/", 0, pos)
    return dirs


def build_corpus_index_blob(documents: pa.Table, multi_host: bool) -> dict:
    """Driver-side (once per crawl) construction of the CorpusIndex
    lookup structures — plain numpy arrays + a small host list, so the
    broadcast to fetch actors is zero-copy and actor __init__ pays ~0."""
    import numpy as np


    if documents.num_rows == 0:
        empty = np.empty(0, dtype=np.uint64)
        return {"id_hash_sorted": empty, "id_perm": np.empty(0, np.int64),
                "dir_hash_sorted": empty, "hosts": []}
    ids_col = documents["doc_id"].combine_chunks()
    ids = ids_col.to_pylist()
    id_hash = np.fromiter((_blake8(d) for d in ids), dtype=np.uint64,
                          count=len(ids))
    perm = np.argsort(id_hash, kind="stable").astype(np.int64)
    dirs = _dirs_of(ids)
    dir_hash = np.sort(np.fromiter((_blake8(d) for d in dirs),
                                   dtype=np.uint64, count=len(dirs))) \
        if dirs else np.empty(0, dtype=np.uint64)
    hosts = sorted({p for p in dirs if "/" not in p}) if multi_host else []
    return {"id_hash_sorted": id_hash[perm], "id_perm": perm,
            "dir_hash_sorted": dir_hash, "hosts": hosts}
