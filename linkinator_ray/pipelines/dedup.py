"""Deduplication family over the ``documents`` / ``embeddings`` tables.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — the dedup operators a 100 TB training-data pipeline needs.
Shapes follow the mergeable-partial pattern: per-batch vectorized
signatures in ``map_batches``, one shuffle on the signature/band key,
candidate verification, then driver-side union-find only on the
(provably small) candidate set.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from linkinator_ray.pipelines.hashagg import \
    auto_concurrency as _autoconc

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def read_docs(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup — hash + groupby first (ray_guide 'Exact dedup')
# ---------------------------------------------------------------------------


def _md5_text_hash_kernel(batch: pa.Table) -> pa.Table:
    """(doc_id, text_hash=md5-hex) — the shared exact-dedup hash kernel
    of dedup_exact and corpus_dedup_drops (one definition so the drop
    set and the keeper set can never disagree on the hash)."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_hash": pa.array([hashlib.md5(t.encode()).hexdigest()
                               for t in text.to_pylist()], pa.string()),
    })



def _fanout(ds):
    """Repartition to ~CPU count before an all-to-all or an expensive
    map stage: Ray Data sizes its shuffle off the input block count,
    and a single-file read gives one block -> a serial shuffle / a
    one-actor map stage (23x slower measured on a 50k-doc single-file
    corpus). Skipped when the read is already parallel (input file
    count >= the target — the real-cluster case, where parquet arrives
    as many files and the extra exchange would only cost)."""
    from linkinator_ray.pipelines.hashagg import default_parts
    target = default_parts(cap=32)
    try:
        files = ds.input_files()
        if files and len(files) >= target:
            return ds
    except Exception:
        pass
    return ds.repartition(target)

def dedup_exact(sf_dir: str):
    """Group identical texts; keep the lowest doc_id per group.

    Output: (keeper_doc_id, dup_count) one row per distinct text.
    """
    hashed = read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _md5_text_hash_kernel, batch_format="pyarrow", batch_size=8192)
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    out = hash_aggregate(hashed, "text_hash",
                         {"keeper_doc_id": ("doc_id", "min"),
                          "dup_count": ("doc_id", "count")})
    return out.select_columns(["keeper_doc_id", "dup_count"])  # unordered; comparators sort


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

# per-process token-hash memo: vocabularies are tiny relative to corpora,
# so almost every token hash is a dict hit instead of an md5 call
_TOKEN_MEMO: dict[str, int] = {}
# Every hash below lives in the 2^61-1 field (token hash = md5 first 8
# bytes big-endian mod p; shingle = polynomial in SHINGLE_B; permutation
# = a·s+b mod p; band = polynomial in BAND_B). Chosen over wrap-around
# uint64 mixing because DuckDB reproduces the field arithmetic exactly
# (md5 + HUGEINT mulmod), giving dedup_minhash / corpus_dedup_keep
# hash-checked SQL oracles — same trade rolling_fingerprint made.
SHINGLE_B = 1000003
BAND_B = 998244353
_SHINGLE_POW = np.array([pow(SHINGLE_B, j, _MERSENNE) for j in range(16)],
                        dtype=np.uint64)


def _token_hashes(toks: list[str]) -> np.ndarray:
    memo = _TOKEN_MEMO
    out = np.empty(len(toks), dtype=np.uint64)
    for i, tok in enumerate(toks):
        h = memo.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                               "big") % _MERSENNE
            if len(memo) > 4_000_000:
                memo.clear()
            memo[tok] = h
        out[i] = h
    return out


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hashes: memoized per-token md5 combined with
    a vectorized polynomial in SHINGLE_B over the 2^61-1 field (n numpy
    field ops per doc instead of one digest per gram)."""
    from linkinator_ray.pipelines.text import _addmod_p, _mulmod_p
    toks = _WS.split(text.strip()) if text.strip() else []
    m = len(toks)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    if m < n:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(m):
            acc = _addmod_p(acc, _mulmod_p(th[j:j + 1], _SHINGLE_POW[j]))
        return acc
    acc = np.zeros(m - n + 1, dtype=np.uint64)
    for j in range(n):
        acc = _addmod_p(acc, _mulmod_p(th[j:m - n + 1 + j], _SHINGLE_POW[j]))
    return np.unique(acc)


def _shingle_flat(texts, n: int = 3):
    """Batched ``_shingle_hashes``: per-doc UNIQUE shingle hashes laid
    FLAT — returns (vals, offsets) with
    ``vals[offsets[i]:offsets[i+1]] == _shingle_hashes(texts[i], n)``.

    One rolling polynomial over the whole batch's concatenated token
    hashes (windows crossing document boundaries masked out by
    position), one lexsort for the per-doc unique — no per-document
    numpy dispatch (the per-doc path pays ~0.25 ms/doc of small-array
    overhead; this pays it once per batch)."""
    from linkinator_ray.pipelines.text import _addmod_p, _mulmod_p
    toks_per_doc = [_WS.split(t.strip()) if t and t.strip() else []
                    for t in texts]
    D = len(texts)
    lens = np.fromiter((len(x) for x in toks_per_doc), np.int64, D)
    th = _token_hashes([tok for toks in toks_per_doc for tok in toks])
    tok_start = np.zeros(D + 1, np.int64)
    np.cumsum(lens, out=tok_start[1:])
    total = int(tok_start[-1])
    vals_parts, doc_parts = [], []
    if total >= n:
        acc = np.zeros(total - n + 1, dtype=np.uint64)
        for j in range(n):
            acc = _addmod_p(acc, _mulmod_p(th[j:total - n + 1 + j],
                                           _SHINGLE_POW[j]))
        long_docs = np.flatnonzero(lens >= n)
        if len(long_docs):
            reps = lens[long_docs] - n + 1
            cum = np.concatenate(([0], np.cumsum(reps)))
            offs = np.arange(cum[-1]) - np.repeat(cum[:-1], reps)
            pos = np.repeat(tok_start[long_docs], reps) + offs
            vals_parts.append(acc[pos])
            doc_parts.append(np.repeat(long_docs, reps))
    for i in np.flatnonzero((lens > 0) & (lens < n)):  # rare short docs
        s, m = int(tok_start[i]), int(lens[i])
        a = np.zeros(1, dtype=np.uint64)
        for j in range(m):
            a = _addmod_p(a, _mulmod_p(th[s + j:s + j + 1],
                                       _SHINGLE_POW[j]))
        vals_parts.append(a)
        doc_parts.append(np.array([i], dtype=np.int64))
    offsets = np.zeros(D + 1, np.int64)
    if not vals_parts:
        return np.empty(0, np.uint64), offsets
    vals = np.concatenate(vals_parts)
    docs = np.concatenate(doc_parts)
    order = np.lexsort((vals, docs))
    vals, docs = vals[order], docs[order]
    keep = np.empty(len(vals), bool)
    keep[0] = True
    keep[1:] = (docs[1:] != docs[:-1]) | (vals[1:] != vals[:-1])
    vals, docs = vals[keep], docs[keep]
    np.cumsum(np.bincount(docs, minlength=D), out=offsets[1:])
    return vals, offsets


class MinHasher:
    """num_perms universal-hash minhash signatures; permutation params
    built once per actor (seeded → deterministic across the cluster)."""

    def __init__(self, num_perms: int = 64, ngram: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perms, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perms, dtype=np.uint64)
        self.num_perms = num_perms
        self.ngram = ngram

    def signature_from_shingles(self, hs: np.ndarray) -> np.ndarray:
        if len(hs) == 0:
            return np.zeros(self.num_perms, dtype=np.uint64)
        from linkinator_ray.pipelines.text import _addmod_p, _mulmod_p
        # (num_perms, n_shingles) TRUE universal hash over the 2^61-1
        # field (broadcast limb mulmod), min over shingles
        prod = _addmod_p(_mulmod_p(hs[None, :], self.a[:, None]),
                         self.b[:, None])
        return prod.min(axis=1).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        return self.signature_from_shingles(_shingle_hashes(text, self.ngram))

    def signatures_batch(self, texts) -> np.ndarray:
        return self.signatures_from_flat(*_shingle_flat(texts, self.ngram))

    def signatures_from_flat(self, vals: np.ndarray,
                             offsets: np.ndarray) -> np.ndarray:
        """Signatures straight off the flat (vals, offsets) layout of
        ``_shingle_flat`` — same unique+gather+reduceat pass as
        ``signatures_from_shingle_lists`` without rebuilding per-doc
        lists. Empty docs (zero shingles) keep the all-zeros signature."""
        from linkinator_ray.pipelines.text import _addmod_p, _mulmod_p
        D = len(offsets) - 1
        out = np.zeros((D, self.num_perms), dtype=np.uint64)
        counts = np.diff(offsets)
        nonempty = np.flatnonzero(counts)
        if not len(nonempty):
            return out
        budget = 65_536
        # chunk nonempty docs by shingle budget; their vals regions are
        # contiguous (empty docs occupy no space)
        group: list[int] = []
        acc = 0
        chunks: list[list[int]] = []
        for i in nonempty:
            group.append(int(i))
            acc += counts[i]
            if acc >= budget:
                chunks.append(group)
                group, acc = [], 0
        if group:
            chunks.append(group)
        for group in chunks:
            lo = offsets[group[0]]
            hi = offsets[group[-1] + 1]
            hs = vals[lo:hi]
            uniq, inv = np.unique(hs, return_inverse=True)
            prod_u = _addmod_p(_mulmod_p(uniq[None, :], self.a[:, None]),
                               self.b[:, None])
            prod = prod_u[:, inv]
            starts = (offsets[group] - lo).astype(np.int64)
            mins = np.minimum.reduceat(prod, starts, axis=1)
            out[group] = mins.T.astype(np.uint64)
        return out

    def signatures_from_shingle_lists(self, shingle_lists) -> np.ndarray:
        """Whole-batch signatures: concatenate every doc's shingles,
        DEDUPLICATE them across the batch (shingles repeat heavily
        across documents — shared vocabulary alone gives 5-10x, dup
        corpora more), compute the (num_perms, n_unique) universal hash
        once, gather it back per position, then a segmented min per doc
        (minimum.reduceat) — one numpy pass for the batch, field mulmod
        paid per DISTINCT shingle only (12x measured at sf0.1)."""
        lengths = np.fromiter((len(s) for s in shingle_lists), np.int64,
                              len(shingle_lists))
        out = np.zeros((len(shingle_lists), self.num_perms),
                       dtype=np.uint64)
        nonempty = np.flatnonzero(lengths)
        if not len(nonempty):
            return out
        # sub-chunk by total shingle budget: the (perms, shingles)
        # universal-hash temp must stay cache/bandwidth friendly
        budget = 65_536
        group: list[int] = []
        acc = 0
        chunks: list[list[int]] = []
        for i in nonempty:
            group.append(int(i))
            acc += lengths[i]
            if acc >= budget:
                chunks.append(group)
                group, acc = [], 0
        if group:
            chunks.append(group)
        from linkinator_ray.pipelines.text import _addmod_p, _mulmod_p
        for group in chunks:
            hs = np.concatenate([shingle_lists[i] for i in group])
            uniq, inv = np.unique(hs, return_inverse=True)
            prod_u = _addmod_p(_mulmod_p(uniq[None, :], self.a[:, None]),
                               self.b[:, None])
            prod = prod_u[:, inv]
            starts = np.concatenate(
                ([0], np.cumsum(lengths[group])[:-1])).astype(np.int64)
            mins = np.minimum.reduceat(prod, starts, axis=1)
            out[group] = mins.T.astype(np.uint64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        # zero-copy in, FixedSizeList out: the (D × num_perms) signature
        # matrix becomes one flat uint64 buffer — no per-row object
        # arrays, and the banding stage reshapes it back zero-copy.
        # fill_null/to_pylist run on the ChunkedArray directly — a
        # combine_chunks here would overflow int32 string offsets once
        # a multi-block batch carries >2 GiB of text
        texts = batch["text"].fill_null("").to_pylist()
        sigs = self.signatures_batch(texts)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.num_perms)
        return pa.table({"doc_id": batch["doc_id"], "sig": sig_col})


def _band_hash_matrix(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(docs × num_perms) signatures → (docs × bands) band hashes:
    bh[b] = Σ_j sig[b·rows+j] · BAND_B^(j+1) mod 2^61-1 — a field
    polynomial (not a byte digest) so the SQL oracle reproduces it.
    Values < 2^61 fit int64 exactly (uint64 groupby keys silently
    coerce to float64 in pandas aggregates, so int64 out)."""
    from linkinator_ray.pipelines.text import _addmod_p, _mulmod_p
    sigs = np.asarray(sigs, dtype=np.uint64).reshape(-1, bands, rows)
    acc = np.zeros(sigs.shape[:2], dtype=np.uint64)
    for j in range(rows):
        coef = np.uint64(pow(BAND_B, j + 1, _MERSENNE))
        acc = _addmod_p(acc, _mulmod_p(sigs[:, :, j], coef))
    return acc.astype(np.int64)


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """signature → (band_id, band_hash, doc_id) rows — the LSH explode.
    The FixedSizeList sig column flattens back to the (D × num_perms)
    matrix zero-copy (one buffer view, no per-row stacking)."""
    D = batch.num_rows
    if D:
        sigs = batch["sig"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(D, bands * rows)
    else:
        sigs = np.empty((0, bands * rows), dtype=np.uint64)
    doc_ids = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False), bands)
    band_ids = np.tile(np.arange(bands, dtype=np.int64), D)
    return pa.table({"band_id": band_ids,
                     "band_hash": _band_hash_matrix(
                         sigs, bands, rows).reshape(-1),
                     "doc_id": doc_ids})


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _band_hashes_of_sig(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    return _band_hash_matrix(sig[None, :], bands, rows)[0]


def _bcast_get(ref):
    if isinstance(ref, (dict, pd.DataFrame, pa.Table)):
        return ref
    import ray
    return ray.get(ref)


class _VerifyMembers:
    """Verify candidate (anchor, member) pairs: a map-only pass over the
    MEMBER texts only (the parquet read is doc_id-filtered down to the
    candidate set) — each member re-shingles once and set-intersects
    against the broadcast anchor shingles. No minhash recompute: band
    membership was already decided from the materialized band table.
    Both broadcast maps ride the object store once (ray.put →
    __init__)."""

    def __init__(self, anchors_of_ref, anchor_sh_ref, ngram, threshold):
        self.anchors_of = _bcast_get(anchors_of_ref)  # member -> [anchors]
        self.anchor_sh = _bcast_get(anchor_sh_ref)    # anchor -> shingles
        self.ngram = ngram
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_out, b_out = [], []
        anchors_of = self.anchors_of
        anchor_sh = self.anchor_sh
        texts = batch["text"].fill_null("").to_pylist()
        for doc_id, text in zip(batch["doc_id"].to_pylist(), texts):
            sh = _shingle_hashes(text, self.ngram)
            for a in anchors_of.get(int(doc_id), ()):
                if _jaccard(anchor_sh[a], sh) >= self.threshold:
                    a_out.append(a)
                    b_out.append(int(doc_id))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})


class _CandAgainstHot:
    """Band rows × broadcast hot-bucket table → distinct candidate
    (a=anchor, b=member) pairs, merged per batch in the workers — the
    broadcast-mode replacement for the partitioned path's hash join."""

    def __init__(self, hot_ref):
        hot = _bcast_get(hot_ref)  # (band_id, band_hash, anchor)
        self.hot = pa.Table.from_pandas(hot, preserve_index=False) \
            if isinstance(hot, pd.DataFrame) else hot

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = batch.join(self.hot, keys=["band_id", "band_hash"],
                       join_type="inner", use_threads=False)
        m = m.filter(pc.not_equal(m["doc_id"], m["anchor"]))
        pairs = pa.table({"a": pc.cast(m["anchor"], pa.int64()),
                          "b": pc.cast(m["doc_id"], pa.int64())})
        return pairs.group_by(["a", "b"], use_threads=False).aggregate([])


def _cluster_pairs(pairs, cluster: str):
    """Shared clustering tail of ``dedup_minhash``: verified near-dup
    pairs → (doc_id, cluster_id).

    ``cluster="driver"``: union-find on the driver over the verified
    pairs (true near-dups only — orders smaller than candidates);
    returns a pyarrow Table. ``cluster="distributed"``: the pairs stay
    a Dataset and cluster via the component engine (components.py) —
    a bounded driver union-find below its edge threshold, the
    large-star/small-star rounds above it, so nothing UNBOUNDED ever
    reaches the driver; returns a Dataset. Use distributed when the
    verified-pair count itself may be driver-hostile (high-dup corpora
    at 100 TB)."""
    if cluster not in ("driver", "distributed"):
        raise ValueError(f"cluster must be driver|distributed: {cluster}")
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
    if cluster == "driver":
        if pairs is None:
            return empty
        kept = pairs.to_pandas()
        return _clusters_from_pairs(zip(kept["a"], kept["b"]))

    import ray.data as rd

    from linkinator_ray.pipelines.components import connected_components
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    if pairs is None:
        return rd.from_arrow(empty)
    edges = pairs.map_batches(
        lambda t: pa.table({"u": t["a"], "v": t["b"]}),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(empty)
    stars = connected_components(edges)
    members = stars.map_batches(
        lambda t: pa.table({"doc_id": t["u"], "cluster_id": t["v"]}),
        batch_format="pyarrow")
    centers = hash_aggregate(stars, "v", {"n": ("u", "count")}) \
        .map_batches(lambda t: pa.table({"doc_id": t["v"],
                                         "cluster_id": t["v"]}),
                     batch_format="pyarrow")
    return members.union(centers)


def dedup_minhash(sf_dir: str, threshold: float = 0.7, num_perms: int = 64,
                  bands: int = 16, ngram: int = 3,
                  verify: str = "auto", cluster: str = "auto",
                  hot_bucket_threshold: int = 200_000):
    """MinHash+LSH near-dup: shingle → minhash → band → bucket groupby →
    anchor pairing → exact-Jaccard verify → min-label clusters.

    The signature stage runs exactly ONCE: the band table (bands int64
    triples per doc) is materialized and feeds both the bucket
    aggregate and the candidate derivation — lineage would otherwise
    re-execute the shingle+minhash pass per consumer.

    ``verify="broadcast"``: one shuffle total (the bucket count/min
    aggregate). Candidate (anchor, member) pairs come from a worker-side
    merge of the band table against the BROADCAST hot-bucket table;
    verification then reads ONLY the candidate texts (doc_id filter
    pushed to the parquet read) — members re-shingle once and
    set-intersect against the broadcast anchor shingles. Candidate
    texts never route through the driver; the driver holds the distinct
    (anchor, member) id pairs and the anchor shingles only.

    Partitioning assumption of the broadcast mode (SURVEY.md §4): the
    hot buckets, the distinct candidate-pair ids and the anchor
    shingles fit on the driver / in one broadcast object. A
    high-dup-rate corpus that breaks that should pass
    ``verify="partitioned"``: hot buckets stay a Dataset, candidate
    pairs come from a hash join of the band rows against them, and the
    exact-Jaccard verify joins the pair list against the document texts
    (hash-partitioned joins) — 3 extra shuffles, nothing pair-shaped on
    the driver.

    Returns (doc_id, cluster_id) for every doc in a near-dup cluster of
    size ≥ 2. ``cluster="driver"`` (default): union-find on the driver
    over the VERIFIED pairs only (true near-dups, orders smaller than
    candidates) — a pyarrow Table. ``cluster="distributed"``: the
    verified pairs stay a Dataset and cluster through the
    large-star/small-star component engine (components.py) — no
    pair-shaped driver state at all; returns a Dataset.

    ``verify="auto"`` / ``cluster="auto"`` (the defaults) pick by the
    measured HOT-BUCKET COUNT — the quantity that actually bounds the
    broadcast mode's driver state: at or under ``hot_bucket_threshold``
    hot buckets (200k buckets ≈ a few MB of anchor map + anchor
    shingles) the cheap broadcast+driver combination runs; above it the
    scale-safe partitioned+distributed combination runs. Same hybrid
    pattern as ``components.connected_components(driver_threshold=...)``
    — identical output either way (differential-tested both ways in
    tests/test_pipelines.py)."""
    if verify not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"verify must be auto|broadcast|partitioned: "
                         f"{verify}")
    if cluster not in ("auto", "driver", "distributed"):
        raise ValueError(f"cluster must be auto|driver|distributed: "
                         f"{cluster}")
    if bands <= 0 or num_perms % bands != 0:
        # validate BEFORE the expensive signature pass — an invalid
        # combination otherwise dies in a reshape deep inside a map task
        raise ValueError(f"bands must divide num_perms: "
                         f"num_perms={num_perms}, bands={bands}")
    rows = num_perms // bands
    # _fanout: a single-file read is ONE block, and one block feeds ONE
    # actor — the signature stage (the expensive pass) would serialize
    docs = _fanout(read_docs(sf_dir, ["doc_id", "text"]))
    # batch 1024: with the CPU-tracking pool cap, smaller batches keep
    # every actor fed (measured: (cap=cpus, 1024) ≈ 35% faster than the
    # old (cap=8, 2048) at sf0.1/32 cpus)
    sigs = docs.map_batches(MinHasher, batch_format="pyarrow",
                            batch_size=1024, concurrency=_autoconc(),
                            fn_constructor_kwargs={"num_perms": num_perms,
                                                   "ngram": ngram})
    # The band table feeds BOTH the bucket aggregate and the candidate
    # derivation; materialized so the signature pass (the expensive
    # shingle+minhash stage over the corpus text) runs exactly ONCE —
    # unmaterialized, Ray Data lineage re-executes it per consumer.
    # Cost: bands int64 triples per doc (~`bands`×24 B/doc), spillable.
    banded = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows), batch_format="pyarrow",
        batch_size=4096).materialize()

    # hot buckets: count+min per bucket — the single aggregate shuffle,
    # expressed as the two-level combiner (hashagg) because the bucket
    # key space is huge (Ray's groupby pays ~0.2 ms per distinct group)
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    counts = hash_aggregate(
        banded, ["band_id", "band_hash"],
        {"n": ("doc_id", "count"), "anchor": ("doc_id", "min")})
    hot_ds = counts.filter(expr="n > 1").select_columns(
        ["band_id", "band_hash", "anchor", "n"]).materialize()
    n_hot = hot_ds.count()
    # the auto-switch guards BOTH driver-state quantities: the
    # hot-bucket count (the broadcast table) AND the candidate-pair
    # bound Σ(n−1) over hot buckets (the pair set broadcast verify
    # drains to the driver — one boilerplate text duplicated 5M times
    # is only 16 hot buckets but 5M pairs)
    n_cand = 0
    hot_df = None  # pulled once; the broadcast path below reuses it
    if 0 < n_hot <= hot_bucket_threshold:
        hot_df = hot_ds.to_pandas()
        n_cand = int(hot_df["n"].sum()) - n_hot
    driver_ok = n_hot <= hot_bucket_threshold \
        and n_cand <= hot_bucket_threshold
    if verify == "auto":
        verify = "broadcast" if driver_ok else "partitioned"
    if cluster == "auto":
        cluster = "driver" if driver_ok else "distributed"
    if verify == "partitioned":
        return _cluster_pairs(_minhash_verify_partitioned(
            sf_dir, banded,
            hot_ds.select_columns(
                ["band_id", "band_hash", "anchor"]).materialize(),
            ngram, threshold), cluster)
    if n_hot == 0:
        return _cluster_pairs(None, cluster)
    # forced verify="broadcast" above the threshold never pulled hot_df
    if hot_df is None:
        hot_df = hot_ds.to_pandas()
    hot = hot_df[["band_id", "band_hash", "anchor"]]
    try:
        import ray
        _put = ray.put if ray.is_initialized() else (lambda x: x)
    except Exception:
        _put = lambda x: x  # noqa: E731

    # candidate pairs: band rows merged against the broadcast hot
    # table in the workers, distinct pairs collected on the driver
    # (bounded by the candidate count — the quantity the auto-switch
    # already guards; partitioned mode keeps them a Dataset instead)
    from linkinator_ray.pipelines.hashagg import hash_aggregate as _hagg
    pairs = _hagg(
        banded.map_batches(_CandAgainstHot, batch_format="pyarrow",
                           batch_size=65536, concurrency=_autoconc(),
                           fn_constructor_kwargs={"hot_ref": _put(
                               pa.Table.from_pandas(
                                   hot, preserve_index=False))}),
        ["a", "b"], {"n_bands": ("b", "count")}).select_columns(
        ["a", "b"]).to_pandas()
    if not len(pairs):
        return _cluster_pairs(None, cluster)
    anchors_of: dict[int, list[int]] = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        anchors_of.setdefault(int(b), []).append(int(a))
    anchor_ids = sorted(set(pairs["a"].tolist()))
    member_ids = sorted(anchors_of)
    import ray.data as rd

    def shingle_anchors(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "sh": [_shingle_hashes(t or "", ngram) for t in batch["text"]],
        })

    anchor_rows = _fanout(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=_ISIN(anchor_ids))).map_batches(
        shingle_anchors, batch_format="pandas", batch_size=4096).to_pandas()
    anchor_sh = dict(zip(anchor_rows["doc_id"], anchor_rows["sh"]))

    # verify pass reads ONLY the member texts (doc_id filter pushed to
    # the parquet read) — not a second full-corpus shingle pass.
    # _fanout: the filtered single-file read is still ONE block, and
    # one block would feed ONE verify actor
    verified = _fanout(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=_ISIN(member_ids))).map_batches(
        _VerifyMembers, batch_format="pyarrow", batch_size=2048,
        concurrency=_autoconc(),
        fn_constructor_kwargs={
            "anchors_of_ref": _put(anchors_of),
            "anchor_sh_ref": _put(anchor_sh),
            "ngram": ngram, "threshold": threshold})
    return _cluster_pairs(verified, cluster)


def _minhash_verify_partitioned(sf_dir: str, banded, hot, ngram: int,
                                threshold: float):
    """The no-driver-state verify path of ``dedup_minhash`` — returns
    the VERIFIED (a, b) pair Dataset (or None when no bucket is hot).
    ``hot`` is the materialized (band_id, band_hash, anchor) Dataset of
    hot buckets computed by the caller.

    Hot buckets stay a Dataset; candidate (anchor, member) pairs come
    from a hash-partitioned join of the band rows against the hot
    buckets; the exact-Jaccard verify joins the distinct pair list
    against document texts (two more hash joins) and re-shingles both
    sides in workers. Joins use hashagg.hash_join (tag+union+
    partition+merge), not Ray's JoinOperator — several JoinOperators in
    one DAG can deadlock its shuffle scheduling under tight CPU budgets.
    """
    import pyarrow.compute as pc

    from linkinator_ray.pipelines.hashagg import (default_parts,
                                                  hash_aggregate, hash_join)
    parts = default_parts()
    if hot.count() == 0:
        return None
    cands = hash_join(banded, hot, on=["band_id", "band_hash"],
                      num_parts=parts)

    def to_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["doc_id"], t["anchor"]))
        return pa.table({"a": t["anchor"], "b": t["doc_id"]})

    pairs = hash_aggregate(
        cands.map_batches(to_pairs, batch_format="pyarrow"),
        ["a", "b"], {"n_bands": ("b", "count")}).select_columns(["a", "b"])

    texts = read_docs(sf_dir, ["doc_id", "text"])
    with_a = hash_join(pairs, texts, on="a", right_on="doc_id",
                       num_parts=parts) \
        .map_batches(lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "text_a": t["text"]}),
            batch_format="pyarrow")
    with_ab = hash_join(with_a, texts, on="b", right_on="doc_id",
                        num_parts=parts)

    def verify_kernel(t: pa.Table) -> pa.Table:
        # per-batch shingle memo: a hot anchor appears in MANY pairs of
        # one batch — shingle each distinct doc once, not once per pair
        memo: dict[int, np.ndarray] = {}

        def sh(doc_id: int, text) -> np.ndarray:
            s = memo.get(doc_id)
            if s is None:
                s = memo[doc_id] = _shingle_hashes(text or "", ngram)
            return s

        a_out, b_out = [], []
        for a, b, ta, tb in zip(t["a"].to_pylist(), t["b"].to_pylist(),
                                t["text_a"].to_pylist(),
                                t["text"].to_pylist()):
            if _jaccard(sh(a, ta), sh(b, tb)) >= threshold:
                a_out.append(a)
                b_out.append(b)
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    return with_ab.map_batches(verify_kernel, batch_format="pyarrow",
                               batch_size=512)


def _ISIN(ids):
    """Parquet row filter: doc_id ∈ ids (pushed to the read)."""
    import pyarrow.dataset as pads
    return pads.field("doc_id").isin(list(ids))




def _clusters_from_pairs(pairs) -> pa.Table:
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    doc_ids, cluster_ids = [], []
    for root, nodes in members.items():
        if len(nodes) >= 2:
            for node in sorted(nodes):
                doc_ids.append(node)
                cluster_ids.append(root)
    order = np.argsort(doc_ids, kind="stable")
    return pa.table({
        "doc_id": pa.array(np.asarray(doc_ids)[order] if doc_ids else [], pa.int64()),
        "cluster_id": pa.array(np.asarray(cluster_ids)[order] if doc_ids else [], pa.int64()),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_MEMO: dict[str, int] = {}


def _md5_token_hash(tok: str) -> int:
    """First 8 bytes of md5, big-endian — chosen (over blake2b) because
    DuckDB can reproduce it: ('0x'||substr(md5(tok),1,16))::UBIGINT.
    That makes the ENTIRE simhash pipeline SQL-expressible, so
    dedup_simhash carries an exact hash-checked oracle."""
    memo = _SIMHASH_MEMO
    h = memo.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        if len(memo) > 4_000_000:
            memo.clear()
        memo[tok] = h
    return h


class SimHasher:
    """64-bit SimHash over md5 token hashes; near-dup = small Hamming
    distance. Band tables (4×16-bit) give LSH candidate buckets."""

    def __init__(self):
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = _WS.split(text.strip()) if text.strip() else []
        if not toks:
            return 0
        hs = np.fromiter((_md5_token_hash(t) for t in toks),
                         dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] & self.bit_masks[None, :]) != 0)
        votes = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 vote per token
        return int(self.bit_masks[votes > 0].sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-doc stays: the token-memo + small cache-hot bit matrices
        # beat a whole-batch bit tensor (measured 10x — the (tokens, 64)
        # uint64 broadcast temp is ~1 GB per 2.5M tokens)
        texts = batch["text"].fill_null("").to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(
                np.fromiter((self.simhash(t) for t in texts),
                            dtype=np.uint64, count=len(texts))),
        })


def simhash_signatures(sf_dir: str):
    # _fanout: single-file read = one block = one actor otherwise
    return _fanout(read_docs(sf_dir, ["doc_id", "text"])).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=_autoconc())


def dedup_simhash(sf_dir: str, max_hamming: int = 3,
                  cluster: str = "driver", bucket_cap: int = 512):
    """SimHash near-dup via 4-band LSH (any identical 16-bit band ⇒
    candidate; pigeonhole: two docs with Hamming ≤ 3 share at least one
    clean band).

    Within each bucket ALL PAIRS are Hamming-verified (vectorized
    triu XOR+popcount), which preserves the pigeonhole recall
    guarantee exactly — anchor-star pairing would silently drop a
    near-dup pair whenever the bucket's min-doc anchor is an unrelated
    16-bit collision (common at ≥1M docs: each band has only 65536
    values). Buckets larger than ``bucket_cap`` fall back to
    anchor-star (k² work bounded; recall above the cap is best-effort
    and DOCUMENTED — a 512-member 16-bit bucket at realistic scale is
    dominated by true duplicates, which the star still catches
    transitively through the cluster step).

    Verified pairs are filtered IN the bucket partitions (never a
    driver pair list) and cluster through the same ``_cluster_pairs``
    tail as ``dedup_minhash``: ``cluster="driver"`` union-finds the
    true near-dup pairs on the driver (a pyarrow Table);
    ``cluster="distributed"`` routes them through the
    large-star/small-star component engine (components.py) — no
    pair-shaped driver state; returns a Dataset. High-dup corpora at
    100 TB should use distributed."""
    sigs = simhash_signatures(sf_dir)

    def bands(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        D = len(sh)
        return pa.table({
            "band_id": np.repeat(np.arange(4, dtype=np.int64), D),
            "band_hash": np.concatenate(
                [(sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
                 for b in range(4)]) if D else np.empty(0, np.uint64),
            "doc_id": np.tile(doc, 4),
            "simhash": np.tile(sh, 4),
        })

    banded = sigs.map_batches(bands, batch_format="pyarrow", batch_size=8192)

    from functools import partial

    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    pairs = hash_partition_apply(
        banded, ["band_id", "band_hash"],
        partial(_simhash_bucket_pairs, max_hamming=max_hamming,
                bucket_cap=bucket_cap))
    return _cluster_pairs(pairs, cluster)


def _ham64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)


def _simhash_bucket_pairs(part: pd.DataFrame, max_hamming: int,
                          bucket_cap: int) -> pd.DataFrame:
    """Within-bucket ALL-PAIRS Hamming verify (recall-exact up to
    bucket_cap; anchor-star fallback above it); only multi-member
    buckets — the rare dup candidates — reach the per-bucket loop.
    Verification happens HERE, inside the bucket partition — only true
    near-dup (a, b) pairs ever leave the workers."""
    g = part.sort_values(["band_id", "band_hash", "doc_id"])
    bid = g["band_id"].to_numpy()
    bh = g["band_hash"].to_numpy()
    ids = g["doc_id"].to_numpy()
    shs = g["simhash"].to_numpy().astype(np.uint64)
    n = len(g)
    out_a, out_b = [], []
    if n:
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            b_ids, b_sh = ids[s:e], shs[s:e]
            if k > bucket_cap:
                # anchor-star fallback (sorted ⇒ row 0 is the min)
                keep = _ham64(b_sh[1:] ^ b_sh[0]) <= max_hamming
                out_a.append(np.full(int(keep.sum()), b_ids[0],
                                     dtype=np.int64))
                out_b.append(b_ids[1:][keep])
            else:
                iu, ju = np.triu_indices(k, 1)
                keep = _ham64(b_sh[iu] ^ b_sh[ju]) <= max_hamming
                out_a.append(b_ids[iu[keep]])
                out_b.append(b_ids[ju[keep]])
    if not out_a:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return pd.DataFrame({
        "a": np.concatenate(out_a).astype(np.int64),
        "b": np.concatenate(out_b).astype(np.int64),
    }).drop_duplicates()


# ---------------------------------------------------------------------------
# n-gram Jaccard (brute over a bounded prefix — the SQL-checkable variant)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(sf_dir: str, limit: int = 100, ngram: int = 1,
                        threshold: float = 0.5):
    """Exact word-set Jaccard over all pairs of the first ``limit`` docs.

    Small-side brute force (the verification kernel of the LSH pipeline,
    exposed standalone so DuckDB can check it exactly). Output:
    (doc_a, doc_b, jaccard) for pairs ≥ threshold, doc_a < doc_b.
    """
    import pyarrow.dataset as pads
    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    table = ds.to_table(columns=["doc_id", "text"],
                        filter=pads.field("doc_id") < limit)
    ids = table["doc_id"].to_pylist()
    sets = [set(_WS.split(t.strip())) if t.strip() else set()
            for t in table["text"].to_pylist()]
    order = np.argsort(ids)
    a_out, b_out, j_out = [], [], []
    thresh_ppm = int(threshold * 1_000_000)
    for i_pos in range(len(order)):
        for j_pos in range(i_pos + 1, len(order)):
            i, j = order[i_pos], order[j_pos]
            si, sj = sets[i], sets[j]
            union = len(si | sj)
            inter = len(si & sj)
            # exact integer ppm — portable to the SQL oracle
            jac_ppm = (1_000_000 * inter) // union if union else 1_000_000
            if jac_ppm >= thresh_ppm:
                a_out.append(ids[i])
                b_out.append(ids[j])
                j_out.append(jac_ppm)
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64()),
                     "jaccard_ppm": pa.array(j_out, pa.int64())})


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def dedup_embedding(sf_dir: str, threshold: float = 0.95, limit: int | None = 200):
    """Near-dup by embedding cosine ≥ threshold.

    With ``limit``: exact pairwise over the first N vectors (driver
    numpy matmul; DuckDB-checkable). Without: the brute-force SCALE
    path — the normalized matrix rides the object store once (ray.put)
    and each batch matmuls against it inside ``map_batches``; compute is
    distributed O(n²/batches), driver memory stays O(result). Brute
    force is inherently O(n·d) broadcast memory — past that, use
    dedup_embedding_lsh. Output: (vec_a, vec_b, cosine), vec_a < vec_b.
    """
    import pyarrow.dataset as pads
    if limit is not None:
        ds = pads.dataset(f"{sf_dir}/embeddings.parquet")
        table = ds.to_table(columns=["vec_id", "embedding"],
                            filter=pads.field("vec_id") < limit)
        ids = np.asarray(table["vec_id"].to_pylist())
        mat = np.asarray(table["embedding"].to_pylist(), dtype=np.float64)
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                            1e-12, None)
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        order = np.lexsort((hi, lo))
        return pa.table({
            "vec_a": pa.array(lo[order], pa.int64()),
            "vec_b": pa.array(hi[order], pa.int64()),
            "cosine": pa.array(np.round(sims[iu][mask][order], 6), pa.float64()),
        })

    # no-limit path: broadcast the normalized matrix, distribute the
    # row-block × full-matrix matmuls
    from linkinator_ray.pipelines.similarity import read_embeddings
    full = pads.dataset(f"{sf_dir}/embeddings.parquet") \
        .to_table(columns=["vec_id", "embedding"])
    all_ids = np.asarray(full["vec_id"].to_pylist())
    all_mat = np.asarray(full["embedding"].to_pylist(), dtype=np.float64)
    all_mat /= np.clip(np.linalg.norm(all_mat, axis=1, keepdims=True),
                       1e-12, None)
    try:
        import ray
        blob = ray.put((all_ids, all_mat)) if ray.is_initialized() \
            else (all_ids, all_mat)
    except Exception:
        blob = (all_ids, all_mat)

    class _BlockVsAll:
        def __init__(self, ref):
            import ray as _ray
            self.ids, self.mat = _ray.get(ref) \
                if not isinstance(ref, tuple) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            from linkinator_ray.pipelines.similarity import (
                _embedding_matrix, _normalized)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            mat = _normalized(_embedding_matrix(batch["embedding"]))
            sims = mat @ self.mat.T  # (batch, n)
            bi, aj = np.nonzero(sims >= threshold)
            a_ids, b_ids = ids[bi], self.ids[aj]
            keep = a_ids < b_ids  # upper triangle only, no self-pairs
            return pa.table({
                "vec_a": a_ids[keep], "vec_b": b_ids[keep],
                "cosine": np.round(sims[bi, aj][keep], 6)})

    pairs = read_embeddings(sf_dir).map_batches(
        _BlockVsAll, batch_format="pyarrow", batch_size=1024,
        concurrency=_autoconc(), fn_constructor_kwargs={"ref": blob}).to_pandas()
    if len(pairs) == 0:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    pairs = pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(pairs, preserve_index=False)


def corpus_dedup_drops(sf_dir: str, threshold: float = 0.7):
    """Drop set of the end-to-end dedup pipeline as a DATASET —
    (doc_id, reason) with reason 'exact' | 'near' — never materialized
    on the driver. One row per dropped doc (a doc that is both an exact
    and a near dup reports 'exact': min() over the reason column, and
    'exact' < 'near').

    Exact drops (every non-minimum doc of an identical-text group) are
    computed WHERE the groups live, via the hash-partitioned exchange.
    Near drops come from the MinHash cluster table — cluster members
    only, orders smaller than the corpus by construction.
    """
    from linkinator_ray.pipelines.hashagg import (hash_aggregate,
                                                  hash_partition_apply)

    def exact_drops_part(part: pd.DataFrame) -> pd.DataFrame:
        gmin = part.groupby("text_hash")["doc_id"].transform("min")
        out = part.loc[part["doc_id"] != gmin, ["doc_id"]].copy()
        out["reason"] = pd.array(["exact"] * len(out), dtype="string")
        return out

    hashed = read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _md5_text_hash_kernel, batch_format="pyarrow", batch_size=8192)
    exact_drops = hash_partition_apply(hashed, "text_hash",
                                       exact_drops_part)

    # near drops: non-minimum members of the DISTRIBUTED cluster table
    # (cluster_id IS the cluster min) — the whole near leg, verify and
    # clustering included, now runs without driver-side pair state
    near = dedup_minhash(sf_dir, threshold=threshold,
                         cluster="distributed")

    def near_drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        d = t.filter(pc.not_equal(t["doc_id"], t["cluster_id"]))
        return pa.table({
            "doc_id": d["doc_id"],
            "reason": pa.array(["near"] * d.num_rows, pa.string())})

    drops = exact_drops.union(
        near.map_batches(near_drops, batch_format="pyarrow"))
    # one row per doc_id; 'exact' wins over 'near' (min). Stays a Dataset.
    return hash_aggregate(drops, "doc_id", {"reason": ("reason", "min")})


def corpus_dedup_keep(sf_dir: str, threshold: float = 0.7,
                      out_dir: str | None = None):
    """The end-to-end training-data dedup pipeline: documents → exact
    dedup (keep the lowest doc_id per identical text) → MinHash+LSH
    near-dup (drop every cluster member except the cluster minimum) →
    the KEEP side. With ``out_dir``, kept documents stream to
    hash-partitioned parquet (one file per partition — resumable, never
    one giant file) through a distributed LEFT ANTI join: documents and
    drops are hash-partitioned on doc_id and filtered in workers — the
    drop set never lands on the driver or broadcasts as a Python set
    (it can be billions of ids at 100 TB with a realistic dup rate).

    Returns a pyarrow Table (doc_id, reason) for every DROPPED doc —
    the driver-side materialization happens ONLY for this return
    contract (the correctness-check surface); the keep path reads the
    drops as a Dataset end-to-end.
    """
    from linkinator_ray.pipelines.hashagg import default_parts, hash_join

    drops = corpus_dedup_drops(sf_dir, threshold=threshold)
    if out_dir:
        # materialize once (object store, distributed) so the keep join
        # and the returned table don't re-run the dedup pipeline
        drops = drops.materialize()
        keeps = hash_join(read_docs(sf_dir), drops, on="doc_id",
                          how="left_anti", num_parts=default_parts())
        keeps.write_parquet(out_dir)
    dropped = drops.to_pandas().sort_values("doc_id")
    return pa.table({
        "doc_id": pa.array(dropped["doc_id"].to_numpy(), pa.int64()),
        "reason": pa.array(dropped["reason"].astype(object), pa.string()),
    })


def corpus_diff(sf_dir: str, split_mod: int = 2):
    """Snapshot set-difference by CONTENT: docs of split A (doc_id %
    split_mod != 0 — "the new crawl") whose NORMALIZED text (NFC +
    lowercase + whitespace collapse, the shared ``_normalize_text_arr``
    kernel) appears nowhere in split B (doc_id % split_mod == 0 — "the
    previous snapshot"). The dataset-vs-dataset analogue of
    ``dedup_exact`` (within-corpus) and the exact-text cousin of
    ``contamination_check`` (trigram overlap) — the primitive behind
    "what is genuinely new in this crawl".

    Scale shape: both sides stream through the md5 content-hash
    combiner (48 B/doc crosses the network, never the text), then ONE
    hash-partitioned LEFT ANTI join on text_hash. No driver state, no
    broadcast — the previous snapshot can be as large as the new crawl.

    Output: (doc_id) of the A-side survivors, one row per doc
    (A-internal duplicates are each reported — the diff is row-level,
    dedup is ``corpus_dedup_keep``'s job).
    """
    import pyarrow.compute as pc

    from linkinator_ray.pipelines.hashagg import default_parts, hash_join
    from linkinator_ray.pipelines.text import _normalize_text_arr

    if split_mod < 2:
        raise ValueError(f"split_mod must be >= 2, got {split_mod}")

    def hashed(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = _normalize_text_arr(text.fill_null(""))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text_hash": pa.array(
                [hashlib.md5(t.encode()).hexdigest()
                 for t in norm.to_pylist()], pa.string()),
        })

    docs = _fanout(read_docs(sf_dir, ["doc_id", "text"])).map_batches(
        hashed, batch_format="pyarrow", batch_size=4096)
    mod = pa.scalar(split_mod, pa.int64())

    # Arrow-native split: A = doc_id % mod != 0, B = the rest — both
    # zero-copy pyarrow filters over the SAME hashed pass.
    def part_a(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(_pc_mod(b.column("doc_id"), mod), 0)
        return b.filter(keep)

    def part_b(b: pa.Table) -> pa.Table:
        keep = pc.equal(_pc_mod(b.column("doc_id"), mod), 0)
        return b.filter(keep)

    docs = docs.materialize()  # both splits consume it; hash once
    a = docs.map_batches(part_a, batch_format="pyarrow")
    b = docs.map_batches(part_b, batch_format="pyarrow") \
        .select_columns(["text_hash"])
    out = hash_join(a, b, on="text_hash", how="left_anti",
                    num_parts=default_parts())
    return out.select_columns(["doc_id"])


def _pc_mod(col, mod):
    """Arrow modulo: a %% m for non-negative int64 columns."""
    import pyarrow.compute as pc
    return pc.subtract(col, pc.multiply(
        pc.divide(col, mod), mod))


def embedding_dim(sf_dir: str) -> int:
    """Vector dimensionality — one row-group peek, not a table scan."""
    import pyarrow.parquet as pq
    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(f.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first["embedding"][0])


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.9, n_planes: int = 6,
                        bucket_cap: int = 1024):
    """Embedding near-dup at scale: random-hyperplane buckets (shuffle on
    the bucket key), exact pairwise cosine only WITHIN buckets — the
    all-pairs matmul never materializes. Candidates with cosine ≥
    threshold.

    The bucketer is a constructor-based actor stage (planes built once
    per actor, dim probed from the parquet footer — never per batch).
    Buckets larger than ``bucket_cap`` switch from full pairwise to
    anchor pairing (every member vs the bucket minimum): O(k) instead of
    O(k²), trading recall of *transitive* pairs inside a giant bucket —
    the same connectivity contract as the MinHash pipeline. Raise
    ``n_planes`` (buckets = 2^n_planes) so expected bucket size stays
    under the cap at scale."""
    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    from linkinator_ray.pipelines.similarity import _LshBucketer, read_embeddings

    dim = embedding_dim(sf_dir)
    bucketed = read_embeddings(sf_dir).map_batches(
        lambda b: _LshBucketer.cached(dim, n_planes)(b),
        batch_format="pyarrow", batch_size=4096)

    def within_part(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("vec_id")
            mat = np.stack(g["embedding"].to_numpy())
            ids = g["vec_id"].to_numpy()
            if len(g) > bucket_cap:
                sims = mat[1:] @ mat[0]
                keep = sims >= threshold
                outs.append(pd.DataFrame({
                    "vec_a": np.full(int(keep.sum()), ids[0]),
                    "vec_b": ids[1:][keep],
                    "cosine_ppm": (sims[keep] * 1_000_000).astype("int64")}))
                continue
            sims = mat @ mat.T
            iu = np.triu_indices(len(ids), k=1)
            keep = sims[iu] >= threshold
            outs.append(pd.DataFrame({
                "vec_a": ids[iu[0][keep]], "vec_b": ids[iu[1][keep]],
                "cosine_ppm": (sims[iu][keep] * 1_000_000).astype("int64"),
            }))
        if not outs:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cosine_ppm": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return hash_partition_apply(bucketed, "bucket", within_part)


# ---------------------------------------------------------------------------
# chunk-level exact dedup (paragraph dedup degenerated to token windows)
# ---------------------------------------------------------------------------

# (doc_id, chunk_idx) packed into one int64 so "earliest occurrence"
# is a plain min(); caps docs at 2^20 chunks (16M tokens at W=16)
_CHUNK_STRIDE = 1 << 20


def _explode_chunks(batch: pa.Table, W: int, payload: str) -> pa.Table:
    """Vectorized chunk explode: (doc_id, idx, ckey, chunk|h).

    ``payload="text"`` carries the chunk strings (local rebuild);
    ``payload="hash"`` carries 128-bit md5 hex instead, so the
    winner-marking exchange ships ~32 bytes per chunk no matter how
    long the chunks are."""
    import pyarrow.compute as pc
    if batch.num_rows == 0:
        col = ("chunk", pa.array([], pa.string())) if payload == "text" \
            else ("h", pa.array([], pa.string()))
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "idx": pa.array([], pa.int64()),
                         "ckey": pa.array([], pa.int64()),
                         col[0]: col[1]})
    rbs = batch.to_batches()
    if len(rbs) > 1:
        # multi-block batch: combining >2 GiB of chunked strings
        # overflows int32 offsets — recurse per record batch instead
        return pa.concat_tables([
            _explode_chunks(pa.Table.from_batches([rb]), W, payload)
            for rb in rbs])
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    lst = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    nt = np.asarray(pc.list_value_length(lst).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    total = int(nt.sum())
    starts = np.concatenate(([0], np.cumsum(nt)[:-1]))
    # token position within its doc, then its chunk index
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, nt)
    cidx = j // W
    if cidx.size and int(cidx.max()) >= _CHUNK_STRIDE:
        raise ValueError(
            f"doc exceeds {_CHUNK_STRIDE} chunks at W={W}; "
            "raise chunk_tokens or _CHUNK_STRIDE")
    # chunk boundaries are run starts (tokens of one chunk are
    # contiguous): vectorized per-chunk join via a ListArray view
    bounds = np.flatnonzero(j % W == 0)
    # int64 offsets (LargeListArray): a batch whose total token count
    # exceeds 2^31 would wrap int32 offsets negative and crash
    offsets = np.append(bounds, total).astype(np.int64)
    chunks = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat),
        pa.scalar(" ", flat.type))  # separator type must match values
    if chunks.type not in (pa.string(), pa.large_string()):
        chunks = chunks.cast(pa.string())  # keep block schemas stable
    parents = np.asarray(pc.list_parent_indices(lst).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    doc_np = np.asarray(batch.column("doc_id").to_numpy(
        zero_copy_only=False), dtype=np.int64)
    doc_of_chunk = doc_np[parents[bounds]]
    idx_of_chunk = cidx[bounds]
    cols = {
        "doc_id": pa.array(doc_of_chunk),
        "idx": pa.array(idx_of_chunk),
        "ckey": pa.array(doc_of_chunk * _CHUNK_STRIDE + idx_of_chunk),
    }
    if payload == "text":
        cols["chunk"] = chunks
    else:
        cols["h"] = pa.array([hashlib.md5(c.encode()).hexdigest()
                              for c in chunks.to_pylist()], pa.string())
    return pa.table(cols)


def dedup_chunk(sf_dir: str, chunk_tokens: int = 16):
    """Sub-document exact dedup (the C4/CCNet line-and-paragraph dedup
    adapted to fixed token windows, since the test corpus has no
    newlines): split every doc into ``chunk_tokens``-token chunks, keep
    only the globally-first occurrence of each distinct chunk (ordered
    by (doc_id, chunk_idx)), and rebuild each doc from its surviving
    chunks.

    Output: (doc_id, n_chunks, n_dropped, clean_text), one row per doc.

    Scale shape — chunk TEXT crosses the network exactly once: the
    winner-marking exchange ships only (doc_id, idx, ckey, md5) — ~48
    bytes per chunk regardless of chunk length; the keep flags (3 ints)
    and the RAW docs then co-partition on doc_id, and each rebuild
    partition re-chunks its docs locally (recomputing the split is
    pure CPU — at 100 TB shuffle bytes, not compute, are the scarce
    resource). First-occurrence marking is a vectorized
    groupby-transform-min; nothing materializes on the driver.
    Identity is by 128-bit md5 of the chunk (collision odds are
    negligible even at 10^12 chunks; 64-bit would not be).
    """
    W = int(chunk_tokens)
    if W <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")

    from linkinator_ray.pipelines.hashagg import hash_partition_apply

    exploded = _fanout(read_docs(sf_dir, ["doc_id", "text"])).map_batches(
        lambda b: _explode_chunks(b, W, "hash"),
        batch_format="pyarrow", batch_size=8192)

    def mark_winners(part: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a chunk hash are co-located: vectorized
        # first-occurrence mark, no per-group Python call
        part = part.copy()
        part["keep"] = part["ckey"] == part.groupby("h")["ckey"] \
            .transform("min")
        return part[["doc_id", "idx", "keep"]]

    flags = hash_partition_apply(exploded, "h", mark_winners)

    # tag + union + one doc_id exchange: flags are 3 ints per chunk,
    # docs are the raw (doc_id, text) rows — text's only shuffle
    def tag_flags(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "idx": batch.column("idx"),
            "keep": batch.column("keep"),
            "text": pa.nulls(n, pa.string()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "idx": pa.nulls(n, pa.int64()),
            "keep": pa.nulls(n, pa.bool_()),
            "text": batch.column("text"),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        })

    both = flags.map_batches(tag_flags, batch_format="pyarrow").union(
        read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            tag_docs, batch_format="pyarrow"))

    def rebuild(part: pd.DataFrame) -> pd.DataFrame:
        docs = part.loc[part["__side"] == 1, ["doc_id", "text"]]
        fl = part.loc[part["__side"] == 0, ["doc_id", "idx", "keep"]] \
            .astype({"doc_id": "int64", "idx": "int64", "keep": "bool"})
        docs = docs.astype({"doc_id": "int64"})
        # re-chunk locally with the SAME vectorized explode;
        # large_string: a partition's text can exceed 2 GiB, where
        # int32 string offsets overflow at pa.array construction
        ex = _explode_chunks(
            pa.table({"doc_id": pa.array(docs["doc_id"].to_numpy()),
                      "text": pa.array(docs["text"].astype(object),
                                       pa.large_string())}),
            W, "text").to_pandas()
        m = ex.merge(fl, on=["doc_id", "idx"], how="left")
        m["keep"] = m["keep"].fillna(True).astype(bool)
        m = m.sort_values(["doc_id", "idx"], kind="stable")
        g = m.groupby("doc_id", sort=False)
        n_chunks = g.size()
        n_kept = g["keep"].sum()
        kept_txt = m[m["keep"]].groupby("doc_id", sort=False)["chunk"] \
            .agg(" ".join)
        out = pd.DataFrame({
            "doc_id": n_chunks.index.to_numpy(np.int64),
            "n_chunks": n_chunks.to_numpy(np.int64),
            "n_dropped": (n_chunks - n_kept).to_numpy(np.int64),
        })
        out["clean_text"] = out["doc_id"].map(kept_txt).fillna("")
        return out

    return hash_partition_apply(both, "doc_id", rebuild)


# ---------------------------------------------------------------------------
# exact substring dedup (unaligned sliding windows — Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better", adapted
# from suffix arrays to distributed rolling-hash windows)
# ---------------------------------------------------------------------------

def _explode_windows(batch: pa.Table, w: int) -> pa.Table:
    """Vectorized sliding-window explode: one row per window position
    (doc_id, pos, wh) with wh = the Rabin-Karp polynomial hash of the
    w-token window in base ROLLING_B over the 2^61-1 field (the same
    constants as text.rolling_fingerprint, so the DuckDB oracle
    reproduces every hash exactly). Positions are 0-based within the
    doc; empty/whitespace-only docs count zero tokens (the _shingle_*
    convention — Arrow's split of '' yields [''], a phantom token that
    at w=1 would make empty docs dedup against each other); docs
    shorter than w emit nothing."""
    import pyarrow.compute as pc

    from linkinator_ray.pipelines.text import (ROLLING_B, ROLLING_P,
                                               _addmod_p, _mulmod_p)
    assert ROLLING_P == _MERSENNE  # _token_hashes reduces mod _MERSENNE
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64()),
                      "wh": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    rbs = batch.to_batches()
    if len(rbs) > 1:
        # a multi-block batch keeps its text column CHUNKED; combining
        # >2 GiB of strings overflows int32 offsets, so recurse per
        # record batch (each views ONE chunk, bounded by its block)
        return pa.concat_tables([
            _explode_windows(pa.Table.from_batches([rb]), w)
            for rb in rbs])
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    trimmed = pc.utf8_trim_whitespace(text)
    lst = pc.split_pattern_regex(trimmed, r"\s+")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    nt = np.asarray(pc.list_value_length(lst).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    emptymask = np.asarray(pc.equal(trimmed, "").to_numpy(
        zero_copy_only=False), dtype=bool)
    if emptymask.any():  # drop the phantom '' token of empty docs
        keep = np.ones(int(nt.sum()), bool)
        keep[np.concatenate(([0], np.cumsum(nt)[:-1]))[emptymask]] = False
        flat = flat.filter(pa.array(keep))
        nt = np.where(emptymask, 0, nt)
    total = int(nt.sum())
    if total < w:
        return empty
    # md5 once per DISTINCT token (the stream repeats its vocabulary);
    # _token_hashes is the ONE hash definition shared with the shingle
    # and rolling-fingerprint kernels (and their SQL oracles)
    d = flat.dictionary_encode()
    uh = _token_hashes(d.dictionary.to_pylist())
    h = uh[np.asarray(d.indices.to_numpy(zero_copy_only=False),
                      dtype=np.int64)]
    p = np.repeat(np.arange(len(nt), dtype=np.int64), nt)
    starts = np.concatenate(([0], np.cumsum(nt)[:-1]))
    # window hash at flat position i: Σ_j h[i+j]·B^(w-1-j) mod P —
    # w field multiply-adds over the whole batch, no per-doc dispatch
    m = total - w + 1
    acc = np.zeros(m, np.uint64)
    for j in range(w):
        acc = _addmod_p(acc, _mulmod_p(
            h[j:j + m], np.uint64(pow(ROLLING_B, w - 1 - j, ROLLING_P))))
    valid = p[:m] == p[w - 1:w - 1 + m]  # window inside one doc
    doc_np = np.asarray(batch.column("doc_id").to_numpy(
        zero_copy_only=False), dtype=np.int64)
    pv = p[:m][valid]
    pos = (np.arange(total, dtype=np.int64) - starts[p])[:m][valid]
    return pa.table({"doc_id": pa.array(doc_np[pv]),
                     "pos": pa.array(pos),
                     "wh": pa.array(acc[valid].astype(np.int64))})


def dedup_substring(sf_dir: str, window: int = 16):
    """Exact substring dedup over UNALIGNED sliding token windows: every
    w-token window whose content already occurred earlier in the corpus
    (ordered by (doc_id, pos) — first occurrence wins, within-doc
    repeats included) marks its w positions for removal; each doc is
    rebuilt from its uncovered tokens. Strictly stronger than
    ``dedup_chunk``: a verbatim copy shifted by one token still hits
    (chunk alignment can miss it), which is why Lee et al. 2022 built
    suffix arrays — rolling-hash windows are the shuffle-friendly
    equivalent at fixed match length.

    Output: (doc_id, n_tokens, n_removed, clean_text), one row per doc.

    Scale shape — two exchanges, text crosses once:
    1. window explode → hash-partition on wh (~one row per TOKEN,
       24 B/row; this all-to-all IS the operator — suffix-array dedup
       pays the same sort). Winner per hash = min (doc_id, pos),
       found by one vectorized lexsort per partition; only NON-winner
       occurrences (doc_id, pos — the spans to remove, typically a
       small fraction) leave the partition.
    2. dup spans + raw docs co-partition on doc_id; each rebuild
       partition re-tokenizes locally and removes covered positions
       with one diff-array cumsum (+1 at span start, -1 at span end —
       spans never cross doc boundaries, so one flat cumsum serves the
       whole partition). Nothing materializes on the driver.

    Window hashes live in the 2^61-1 field (md5 token hashes, the
    rolling_fingerprint constants) so the DuckDB oracle reproduces the
    pipeline bit-for-bit; at w=16 a false hash collision needs ~2^30.5
    distinct windows (birthday bound) per the documented budget — the
    oracle computes the SAME hashes, so the comparison is exact either
    way."""
    w = int(window)
    if w <= 0:
        raise ValueError(f"window must be positive, got {window}")

    from linkinator_ray.pipelines.hashagg import hash_partition_apply

    windows = _fanout(read_docs(sf_dir, ["doc_id", "text"])).map_batches(
        lambda b: _explode_windows(b, w),
        batch_format="pyarrow", batch_size=8192)

    def mark_dups(part: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a window hash are co-located: one lexsort,
        # first-of-group is the global winner, everything else drops
        if not len(part):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        part = part.sort_values(["wh", "doc_id", "pos"], kind="stable")
        first = part["wh"].ne(part["wh"].shift())
        return part.loc[~first, ["doc_id", "pos"]]

    spans = hash_partition_apply(windows, "wh", mark_dups)

    def tag_spans(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pos": batch.column("pos"),
            "text": pa.nulls(n, pa.string()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pos": pa.nulls(n, pa.int64()),
            "text": batch.column("text"),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        })

    both = spans.map_batches(tag_spans, batch_format="pyarrow").union(
        read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            tag_docs, batch_format="pyarrow"))

    def rebuild(part: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc
        docs = part.loc[part["__side"] == 1, ["doc_id", "text"]] \
            .sort_values("doc_id", kind="stable")
        if not len(docs):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "n_removed": pd.Series([], dtype="int64"),
                "clean_text": pd.Series([], dtype="object")})
        sp = part.loc[part["__side"] == 0, ["doc_id", "pos"]] \
            .astype({"doc_id": "int64", "pos": "int64"})
        doc_ids = docs["doc_id"].to_numpy(np.int64)
        # large_string: a partition's text can exceed 2 GiB, where
        # int32 string offsets overflow at pa.array construction
        text = pa.array(docs["text"].fillna("").astype(object),
                        pa.large_string())
        trimmed = pc.utf8_trim_whitespace(text)
        lst = pc.split_pattern_regex(trimmed, r"\s+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nt = np.asarray(pc.list_value_length(lst).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        emptymask = np.asarray(pc.equal(trimmed, "").to_numpy(
            zero_copy_only=False), dtype=bool)
        if emptymask.any():  # empty docs: 0 tokens, not the phantom ''
            keeptok = np.ones(int(nt.sum()), bool)
            keeptok[np.concatenate(
                ([0], np.cumsum(nt)[:-1]))[emptymask]] = False
            flat = flat.filter(pa.array(keeptok))
            nt = np.where(emptymask, 0, nt)
        total = int(nt.sum())
        starts = np.concatenate(([0], np.cumsum(nt)[:-1]))
        # coverage via one flat diff-array: +1 at each span's global
        # start, -1 at start+w (≤ the doc's end by construction, so the
        # cumsum never bleeds across doc boundaries)
        diff = np.zeros(total + 1, np.int64)
        if len(sp):
            row_of = {int(d): i for i, d in enumerate(doc_ids)}
            srow = sp["doc_id"].map(row_of).to_numpy(np.int64)
            gpos = starts[srow] + sp["pos"].to_numpy(np.int64)
            np.add.at(diff, gpos, 1)
            np.add.at(diff, gpos + w, -1)
        removed = np.cumsum(diff[:-1]) > 0
        kept = ~removed
        # per-doc kept counts → offsets → one Arrow join for the texts
        doc_of = np.repeat(np.arange(len(nt), dtype=np.int64), nt)
        n_kept = np.zeros(len(nt), np.int64)
        np.add.at(n_kept, doc_of[kept], 1)
        offsets = np.concatenate(([0], np.cumsum(n_kept))).astype(np.int64)
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                flat.filter(pa.array(kept))),
            pa.scalar(" ", flat.type))  # separator type matches values
        return pd.DataFrame({
            "doc_id": doc_ids,
            "n_tokens": nt,
            "n_removed": nt - n_kept,
            "clean_text": joined.to_pylist(),
        })

    return hash_partition_apply(both, "doc_id", rebuild)


# ---------------------------------------------------------------------------
# benchmark-contamination check (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

def contamination_check(sf_dir: str, bench_mod: int = 50):
    """Eval-set decontamination signal: score every training document by
    how many of its word trigrams appear in the "benchmark" documents
    (here the deterministic slice ``doc_id % bench_mod == 0`` stands in
    for an external eval set).

    Output: (doc_id, n_ngrams, n_contaminated, contam_ppm) for every
    non-benchmark doc with at least one trigram.

    Scale shape: real eval benchmarks are MBs against a 100 TB corpus,
    so the distinct benchmark-trigram set is built once and broadcast
    via ``ray.put`` — scoring is then an embarrassingly-parallel
    actor-pool ``map_batches`` with one vectorized ``pc.is_in`` per
    batch; no shuffle at all.
    """
    import pyarrow.compute as pc

    def _tri(batch: pa.Table):
        """Vectorized word trigrams: (parent row indices, trigram strings)."""
        text = batch.column("text")
        if text.null_count:
            text = text.fill_null("")
        lst = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        p = np.asarray(pc.list_parent_indices(lst).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        nt = np.asarray(pc.list_value_length(lst).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        if len(flat) < 3:
            return nt, np.empty(0, np.int64), pa.array([], pa.string())
        m = p[:-2] == p[2:]  # all three tokens in the same doc
        tri = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 2).filter(pa.array(m)),
            flat.slice(1, len(flat) - 2).filter(pa.array(m)),
            flat.slice(2).filter(pa.array(m)), " ")
        return nt, p[:-2][m], tri

    def bench_kernel(batch: pa.Table) -> pa.Table:
        rbs = batch.to_batches()
        if len(rbs) > 1:  # never combine_chunks >2 GiB of text (_tri)
            return pa.concat_tables([
                bench_kernel(pa.Table.from_batches([rb])) for rb in rbs])
        doc = np.asarray(batch.column("doc_id").to_numpy(
            zero_copy_only=False), dtype=np.int64)
        sel = pa.array(doc % bench_mod == 0)
        batch = batch.filter(sel)
        _, _, tri = _tri(batch)
        return pa.table({"g": pc.unique(tri)})

    bench_tris = read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        bench_kernel, batch_format="pyarrow", batch_size=8192).to_pandas()
    bench_set = pa.array(pd.unique(bench_tris["g"]), pa.string())
    try:
        import ray
        bench_ref = ray.put(bench_set) if ray.is_initialized() else bench_set
    except Exception:
        bench_ref = bench_set

    class _Scorer:
        """Actor-pool stage: the benchmark trigram set loads once per
        actor in __init__, not once per batch."""

        def __init__(self, bench_ref):
            try:
                import ray
                self.bench = ray.get(bench_ref) \
                    if not isinstance(bench_ref, pa.Array) else bench_ref
            except Exception:
                self.bench = bench_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            rbs = batch.to_batches()
            if len(rbs) > 1:  # see bench_kernel: per-record-batch _tri
                return pa.concat_tables([
                    self(pa.Table.from_batches([rb])) for rb in rbs])
            doc = np.asarray(batch.column("doc_id").to_numpy(
                zero_copy_only=False), dtype=np.int64)
            nt, parents, tri = _tri(batch)
            hits = np.zeros(batch.num_rows, np.int64)
            if len(tri):
                isin = np.asarray(pc.is_in(tri, value_set=self.bench)
                                  .to_numpy(zero_copy_only=False), dtype=bool)
                np.add.at(hits, parents, isin.astype(np.int64))
            n_ngrams = np.maximum(nt - 2, 0)
            keep = (n_ngrams > 0) & (doc % bench_mod != 0)
            return pa.table({
                "doc_id": pa.array(doc[keep]),
                "n_ngrams": pa.array(n_ngrams[keep]),
                "n_contaminated": pa.array(hits[keep]),
                "contam_ppm": pa.array(
                    hits[keep] * 1_000_000 // n_ngrams[keep]),
            })

    return read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _Scorer, batch_format="pyarrow", batch_size=8192,
        concurrency=_autoconc(), fn_constructor_kwargs={"bench_ref": bench_ref})
