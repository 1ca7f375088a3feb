"""linkinator_ray — a Ray-Data-native link-checker crawl engine.

A from-scratch re-expression of the capabilities of
`JustinBeckwith/linkinator` (reference: /root/reference, v8.0.2) on top of
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow
batches for extraction/classification, actor pools for stateful stages
(fetch workers, sharded URL-seen set, per-host politeness), and a
round-based BFS frontier loop instead of the reference's single-process
event-loop queue.

The corpus is a table of interleaved text+media documents
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
(Lance schema; materialized as Parquet in this sandbox because the
``lance`` package is unavailable — the reader at
``linkinator_ray.sources.documents`` transparently prefers Lance when
importable).

Alongside the crawl engine, ``linkinator_ray.pipelines`` ships the
large-scale training-data operators (dedup family, similarity search,
text analysis, multimodal plumbing) that a 100 TB corpus pipeline needs.
"""

from linkinator_ray.options import CheckOptions, LinkState, RedirectsMode, RequireHttpsMode
from linkinator_ray.pipelines.crawl import CrawlResult, LinkChecker, check
from linkinator_ray.sources.documents import CorpusIndex, read_documents
from linkinator_ray.stages.htmlparse import build_corpus_from_text

__all__ = [
    "CheckOptions", "LinkState", "RedirectsMode", "RequireHttpsMode",
    "CrawlResult", "LinkChecker", "check",
    "CorpusIndex", "read_documents", "build_corpus_from_text",
]

__version__ = "0.1.0"
