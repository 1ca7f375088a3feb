"""Scale-up synthetic corpus generator (FIXTURES.md §'Scale-up generator').

Deterministic (seeded) multi-host crawl corpora for the bench: each host
carries a branching-tree site (guaranteed full reachability from its
root) plus seeded extra links (dedup pressure), broken links, and
cross-host links (checked but not recursed — the same-origin gate).
Host sizes follow a Zipf-ish skew so fetch routing sees realistic
imbalance.

Expected final URL-seen set size is computable in closed form (sum of
per-host doc counts + distinct broken + distinct cross-host roots), so
frontier-drain assertions need no oracle crawl.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from linkinator_ray import schema


def host_sizes(num_hosts: int, docs_per_host: int, zipf: float) -> list[int]:
    weights = np.arange(1, num_hosts + 1, dtype=np.float64) ** (-zipf)
    weights = weights / weights.mean()
    return [max(8, int(round(docs_per_host * w))) for w in weights]


def synth_crawl_corpus(num_hosts: int = 8, docs_per_host: int = 2000,
                       branching: int = 4, extra_links: int = 2,
                       broken_rate: float = 0.02, cross_rate: float = 0.01,
                       zipf: float = 0.8, seed: int = 42):
    """Returns (documents table, seed urls, expected_seen_count)."""
    rng = np.random.default_rng(seed)
    sizes = host_sizes(num_hosts, docs_per_host, zipf)
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    n_broken = 0
    cross_targets: set[str] = set()
    for h, size in enumerate(sizes):
        host = f"h{h}.test"
        for j in range(size):
            spans = []
            off = 0

            def add(ref):
                nonlocal off
                spans.append({"kind": "anchor", "text": "", "media_ref": ref,
                              "offset": off})
                off += 10

            for c in range(branching):
                child = j * branching + 1 + c
                if child < size:
                    add(f"/d{child}.html")
            for _ in range(extra_links):
                # 1..size-1: the root page lives at /index.html, not /d0.html
                add(f"/d{int(rng.integers(1, size))}.html")
            if rng.random() < broken_rate:
                add(f"/missing{j}.html")
                n_broken += 1
            if rng.random() < cross_rate:
                other = int(rng.integers(0, num_hosts))
                if other != h:
                    target = f"http://h{other}.test/"
                    add(target)
                    cross_targets.add(target)
            doc_ids.append(f"{host}/d{j}.html" if j else f"{host}/index.html")
            spans_col.append(spans)
    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=schema.DOCUMENTS)
    seeds = [f"http://h{h}.test/" for h in range(num_hosts)]
    # seen set: every root URL (seed form), every /dN.html for N>=1,
    # every distinct broken URL, every distinct cross-host root target
    # (the root pages are seeded as http://hN.test/ and cross links hit
    # the same canonical URL)
    expected_seen = sum(sizes) - num_hosts  # /d1.. pages (the root is d0)
    expected_seen += num_hosts              # the root URLs themselves
    expected_seen += n_broken               # distinct /missingJ.html per doc
    return documents, seeds, expected_seen, n_broken
