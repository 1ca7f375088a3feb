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

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def read_docs(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup — hash + groupby first (ray_guide 'Exact dedup')
# ---------------------------------------------------------------------------



def _fanout(ds):
    """Repartition to ~CPU count before an all-to-all: Ray Data sizes its
    shuffle off the input block count, and a single-file read gives one
    block -> a serial shuffle (3x slower measured at sf0.1)."""
    try:
        import ray
        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n = 8
    return ds.repartition(min(32, max(4, n)))

def dedup_exact(sf_dir: str):
    """Group identical texts; keep the lowest doc_id per group.

    Output: (keeper_doc_id, dup_count) one row per distinct text.
    """
    from ray.data.aggregate import Count, Min

    def hash_kernel(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "text_hash": [hashlib.md5(t.encode()).hexdigest()
                          for t in batch["text"].fillna("")],
        })

    hashed = read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        hash_kernel, batch_format="pandas", batch_size=8192)
    out = _fanout(hashed).groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keeper_doc_id"),
        Count(alias_name="dup_count"))
    return out.select_columns(["keeper_doc_id", "dup_count"])  # unordered; comparators sort


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    toks = _WS.split(text.strip()) if text.strip() else []
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "little") for g in grams),
        dtype=np.uint64, count=len(grams))
    return np.unique(out)


class MinHasher:
    """num_perms universal-hash minhash signatures; permutation params
    built once per actor (seeded → deterministic across the cluster)."""

    def __init__(self, num_perms: int = 64, ngram: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perms, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perms, dtype=np.uint64)
        self.num_perms = num_perms
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        hs = _shingle_hashes(text, self.ngram)
        if len(hs) == 0:
            return np.zeros(self.num_perms, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perms, n_shingles) universal hash, min over shingles
            prod = (hs[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"].fillna("")])
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "sig": list(sigs.astype(np.uint64)),
        })


def _band_rows(batch: pd.DataFrame, bands: int, rows: int) -> pd.DataFrame:
    """signature → (band_id, band_hash, doc_id) rows — the LSH explode.

    band_hash is int64 (reinterpreted), not uint64: a uint64 groupby key
    silently coerces to float64 in the aggregate path and equality joins
    stop matching."""
    doc_ids = np.repeat(batch["doc_id"].to_numpy(), bands)
    band_ids = np.tile(np.arange(bands), len(batch))
    hashes = np.empty(len(batch) * bands, dtype=np.uint64)
    for i, sig in enumerate(batch["sig"]):
        sig = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            hashes[i * bands + b] = int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little")
    return pd.DataFrame({"band_id": band_ids,
                         "band_hash": hashes.view(np.int64),
                         "doc_id": doc_ids})


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def dedup_minhash(sf_dir: str, threshold: float = 0.7, num_perms: int = 64,
                  bands: int = 16, ngram: int = 3):
    """MinHash+LSH near-dup: shingle → minhash → band → bucket groupby →
    candidate pairs → exact-Jaccard verify → min-label clusters.

    Returns a pyarrow Table (doc_id, cluster_id) for every doc in a
    near-dup cluster of size ≥ 2. The candidate set (LSH collisions) is
    orders smaller than n²; union-find on it runs on the driver
    (ray_guide 'Near-dup').
    """
    rows = num_perms // bands
    docs = read_docs(sf_dir, ["doc_id", "text"])
    sigs = docs.map_batches(MinHasher, batch_format="pandas", batch_size=2048,
                            concurrency=(1, 8),
                            fn_constructor_kwargs={"num_perms": num_perms,
                                                   "ngram": ngram})
    banded = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows), batch_format="pandas",
        batch_size=4096)
    # consumed twice (bucket counts, then pairing) — pin the small
    # (3 int cols × bands/doc) intermediate so signatures compute once
    banded = banded.materialize()

    # candidate pairing without per-group Python: count+min per bucket
    # (one aggregate shuffle), broadcast the hot buckets' anchors, pair
    # every member with its bucket anchor inside map_batches — enough
    # for connectivity, avoids O(k²) blowup on giant buckets
    from ray.data.aggregate import Count as _Count, Min as _Min
    counts = _fanout(banded).groupby(["band_id", "band_hash"]).aggregate(
        _Count(alias_name="n"), _Min("doc_id", alias_name="anchor"))
    hot = counts.filter(expr="n > 1").to_pandas()
    anchor_of = {(b, h): a for b, h, a in
                 zip(hot["band_id"], hot["band_hash"], hot["anchor"])}
    if not anchor_of:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})

    def pair_with_anchor(batch: pd.DataFrame) -> pd.DataFrame:
        anchors = [anchor_of.get((b, h), -1) for b, h in
                   zip(batch["band_id"], batch["band_hash"])]
        out = pd.DataFrame({"a": anchors, "b": batch["doc_id"]})
        return out[(out["a"] >= 0) & (out["a"] != out["b"])]

    pairs = banded.map_batches(pair_with_anchor, batch_format="pandas",
                               batch_size=16384)
    cand = pairs.to_pandas().drop_duplicates()
    if len(cand) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})

    # verify with exact shingle Jaccard (broadcast the involved texts)
    involved = sorted(set(cand["a"]) | set(cand["b"]))
    texts = _texts_for(sf_dir, involved)
    shingles = {d: _shingle_hashes(texts[d], ngram) for d in involved}
    keep = [
        (a, b) for a, b in zip(cand["a"], cand["b"])
        if _jaccard(shingles[a], shingles[b]) >= threshold
    ]
    return _clusters_from_pairs(keep)


def _texts_for(sf_dir: str, doc_ids) -> dict:
    import pyarrow.dataset as pads
    import pyarrow.compute as pc
    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    table = ds.to_table(columns=["doc_id", "text"],
                        filter=pads.field("doc_id").isin(list(doc_ids)))
    return dict(zip(table["doc_id"].to_pylist(), table["text"].to_pylist()))


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

class SimHasher:
    """64-bit SimHash over token hashes; near-dup = small Hamming
    distance. Band tables (4×16-bit) give LSH candidate buckets."""

    def __init__(self):
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = _WS.split(text.strip()) if text.strip() else []
        if not toks:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                            "little") for t in toks),
            dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] & self.bit_masks[None, :]) != 0)
        votes = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 vote per token
        return int(self.bit_masks[votes > 0].sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "simhash": np.array([self.simhash(t) for t in batch["text"].fillna("")],
                                dtype=np.uint64),
        })


def simhash_signatures(sf_dir: str):
    return read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 8))


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup via 4-band LSH (any identical 16-bit band ⇒
    candidate; Hamming ≤ max_hamming over ≤3-bit-different docs is
    guaranteed caught by pigeonhole)."""
    sigs = simhash_signatures(sf_dir)

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for b in range(4):
            rows.append(pd.DataFrame({
                "band_id": b,
                "band_hash": ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)),
                "doc_id": batch["doc_id"],
                "simhash": sh,
            }))
        return pd.concat(rows, ignore_index=True)

    banded = sigs.map_batches(bands, batch_format="pandas", batch_size=8192)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        shs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "ham": []})
        a, b, ham = [], [], []
        base_id, base_sh = ids[0], shs[0]
        for i in range(1, len(ids)):
            d = int(bin(int(base_sh) ^ int(shs[i])).count("1"))
            a.append(base_id)
            b.append(ids[i])
            ham.append(d)
        return pd.DataFrame({"a": a, "b": b, "ham": ham})

    pairs = _fanout(banded).groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas").to_pandas().drop_duplicates()
    keep = [(a, b) for a, b, h in zip(pairs["a"], pairs["b"], pairs["ham"])
            if h <= max_hamming and a != b]
    return _clusters_from_pairs(keep)


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

    With ``limit``: exact pairwise over the first N vectors (numpy
    matmul; DuckDB-checkable). Without: per-batch matmul against the
    broadcast normalized matrix — the brute-force scale path.
    Output: (vec_a, vec_b, cosine), vec_a < vec_b.
    """
    import pyarrow.dataset as pads
    ds = pads.dataset(f"{sf_dir}/embeddings.parquet")
    filt = (pads.field("vec_id") < limit) if limit is not None else None
    table = ds.to_table(columns=["vec_id", "embedding"], filter=filt)
    ids = np.asarray(table["vec_id"].to_pylist())
    mat = np.asarray(table["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.clip(norms, 1e-12, None)
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    a = ids[iu[0][mask]]
    b = ids[iu[1][mask]]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    order = np.lexsort((hi, lo))
    return pa.table({
        "vec_a": pa.array(lo[order], pa.int64()),
        "vec_b": pa.array(hi[order], pa.int64()),
        "cosine": pa.array(np.round(sims[iu][mask][order], 6), pa.float64()),
    })


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.9, n_planes: int = 6):
    """Embedding near-dup at scale: random-hyperplane buckets (shuffle on
    the bucket key), exact pairwise cosine only WITHIN buckets via
    map_groups — the all-pairs matmul never materializes. Candidates
    with cosine ≥ threshold, paired to the bucket minimum for
    connectivity (like the MinHash pipeline)."""
    from linkinator_ray.pipelines.similarity import _LshBucketer, read_embeddings

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        b = _LshBucketer(len(batch["embedding"].iloc[0]), n_planes)
        return b(batch)

    bucketed = read_embeddings(sf_dir).map_batches(
        bucket, batch_format="pandas", batch_size=4096)

    def within(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine_ppm": []})
        g = group.sort_values("vec_id")
        mat = np.stack(g["embedding"].to_numpy())
        ids = g["vec_id"].to_numpy()
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        keep = sims[iu] >= threshold
        return pd.DataFrame({
            "vec_a": ids[iu[0][keep]], "vec_b": ids[iu[1][keep]],
            "cosine_ppm": (sims[iu][keep] * 1_000_000).astype("int64"),
        })

    pairs = _fanout(bucketed).groupby("bucket").map_groups(
        within, batch_format="pandas")
    return pairs
