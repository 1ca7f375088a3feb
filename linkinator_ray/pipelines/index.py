"""Inverted-index build — token → sorted postings list, materialized as
partitioned parquet.

The retrieval-side counterpart of ``bm25_search`` / ``keyword_search``
(text.py): those score queries online in one pass; this materializes the
index once so lookups are a filter, the way a production retrieval stack
(or a dedup/decontamination pass that probes the same corpus repeatedly)
amortizes tokenization.

Scale shape (the whole design, in order):

1. **Combiner**: per-batch tokenize (same ``\\s+`` convention as every
   text operator) + per-doc distinct via one C-speed Arrow ``group_by``
   → (token, doc_id) pairs. A document never spans batches (one parquet
   row = one doc) and doc_ids are unique, so within-batch distinct IS
   globally distinct — the exchange ships each pair exactly once and no
   global dedup pass exists.
2. **ONE hash exchange** routes pairs by hash(token) % P (the same
   FNV buffer-level kernel as hashagg) — all postings of a token land in
   one partition.
3. **Per-partition build is fully vectorized**: one sort by
   (token, doc_id), run-boundary detection with numpy, and a zero-copy
   ``ListArray.from_arrays`` wrap — no Python loop over tokens.
4. **Output is partitioned parquet** (``part-K.parquet`` +
   ``part-K._SUCCESS``), resumable exactly like export.py's sinks: a
   rerun row-filters the pair stream to only the missing partitions. At
   100 TB raise ``num_parts`` until one partition's postings fit a
   worker heap; nothing vocabulary-shaped ever touches the driver (the
   driver sees only the P-row manifest).

The driver-checkable face (``inverted_index``) verifies the ROUNDTRIP:
it reads the written index back and fingerprints each of the top-k-df
terms' postings sets (count/sum/min/max/xor of doc_ids — exact integers,
so the DuckDB oracle reproduces every cell). Top-k is the standard
mergeable shape: per-batch local top-k, driver merges ≤ batches×k rows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from linkinator_ray.pipelines.hashagg import _part_of_table
from linkinator_ray.pipelines.text import _text_col, read_docs

TOKEN_RE = r"\s+"


def _pairs_kernel(batch: pa.Table) -> pa.Table:
    """(token, doc_id) pairs, distinct within the batch — globally
    distinct by construction (docs never span batches)."""
    trimmed = pc.utf8_trim_whitespace(_text_col(batch))
    lst = pc.split_pattern_regex(trimmed, TOKEN_RE)
    par = pc.list_parent_indices(lst)
    pairs = pa.table({"token": pc.list_flatten(lst),
                      "doc_id": pc.take(batch.column("doc_id"), par)})
    return pairs.group_by(["token", "doc_id"],
                          use_threads=False).aggregate([])


def _build_part(part: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """One partition → one parquet file of (token, doc_freq, postings).
    Vectorized: sort, run boundaries, ListArray wrap."""
    pid = int(part["__part"].iloc[0])
    g = part.sort_values(["token", "doc_id"], kind="mergesort")
    tok = g["token"].to_numpy()
    ids = pa.array(g["doc_id"].to_numpy(), type=pa.int64())
    change = np.flatnonzero(tok[1:] != tok[:-1]) + 1
    offsets = np.concatenate(
        [[0], change, [len(tok)]]).astype(np.int64)
    postings = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), ids)
    tokens = pa.array(tok[offsets[:-1]], type=pa.string())
    doc_freq = np.diff(offsets)
    table = pa.table({"token": tokens,
                      "doc_freq": pa.array(doc_freq, type=pa.int64()),
                      "postings": postings})
    import pyarrow.parquet as pq
    pq.write_table(table, os.path.join(out_dir, f"part-{pid}.parquet"))
    return pd.DataFrame({"part": [pid], "n_terms": [len(tokens)],
                         "n_postings": [len(tok)]})


def build_inverted_index(sf_dir: str, out_dir: str,
                         num_parts: int | None = None) -> dict:
    """Build the index under ``out_dir``; returns the manifest dict.

    Resumable: ``part-K._SUCCESS`` marks a trusted partition; a rerun
    deletes untrusted files and filters the pair stream to only the
    missing partitions (same contract as export.py's sinks). A
    partition that received no pairs is stamped with an empty file —
    emptiness is decided from the returned manifest, never a driver
    filesystem probe of worker-written files."""
    from linkinator_ray.pipelines.sink import claim_shards, finalize_shards
    P, done, todo = claim_shards(out_dir, num_parts, "part", ".parquet")
    if not todo:
        return {"num_parts": P, "written": [], "skipped": sorted(done)}
    todo_arr = pa.array(np.asarray(todo, dtype=np.int64))

    def route(batch: pa.Table) -> pa.Table:
        pairs = _pairs_kernel(batch)
        routed = pairs.append_column(
            "__part", _part_of_table(pairs, ["token"], P))
        return routed.filter(pc.is_in(routed.column("__part"),
                                      value_set=todo_arr))

    pairs = read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(route, batch_format="pyarrow", batch_size=8192)

    empty = pd.DataFrame({"part": pd.array([], dtype="int64"),
                          "n_terms": pd.array([], dtype="int64"),
                          "n_postings": pd.array([], dtype="int64")})

    def apply(part: pd.DataFrame) -> pd.DataFrame:
        return _build_part(part, out_dir)

    manifest = pairs.groupby("__part").map_groups(
        apply, batch_format="pandas").to_pandas()
    if len(manifest) == 0:
        manifest = empty
    manifest = manifest.sort_values("part")
    import pyarrow.parquet as pq

    def empty_part(k: int) -> None:  # genuinely empty partition
        pq.write_table(pa.table({
            "token": pa.array([], type=pa.string()),
            "doc_freq": pa.array([], type=pa.int64()),
            "postings": pa.array([], type=pa.large_list(pa.int64()))}),
            os.path.join(out_dir, f"part-{k}.parquet"))

    finalize_shards(out_dir, "part", todo,
                    set(int(p) for p in manifest["part"]), empty_part)
    return {"num_parts": P, "written": todo, "skipped": sorted(done),
            "manifest": manifest.to_dict("records")}


def read_index(out_dir: str):
    """The written index back as a Dataset (token, doc_freq, postings)."""
    import ray.data as rd
    return rd.read_parquet(out_dir, file_extensions=["parquet"])


def lookup_postings(out_dir: str, terms: list[str]) -> pa.Table:
    """Point lookups: postings rows for ``terms`` — a filter over the
    token column (parquet row-group stats prune untouched partitions at
    scale since tokens are sorted within each part file)."""
    value_set = pa.array(terms, type=pa.string())

    def probe(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("token"),
                                     value_set=value_set))

    hits = read_index(out_dir).map_batches(
        probe, batch_format="pyarrow").to_pandas()
    hits = hits.sort_values("token").reset_index(drop=True)
    return pa.Table.from_pandas(hits, preserve_index=False)


def inverted_index(sf_dir: str, k: int = 20,
                   num_parts: int = 8) -> pa.Table:
    """Driver-checkable face: build the index, read it BACK from disk,
    and fingerprint the top-k terms by document frequency. Every cell is
    an exact integer over the postings actually written, so a green hash
    certifies tokenize → exchange → vectorized build → parquet →
    re-read end to end."""
    import tempfile
    out_dir = tempfile.mkdtemp(prefix="invidx-", dir="/tmp")
    try:
        build_inverted_index(sf_dir, out_dir, num_parts=num_parts)

        def fingerprint(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "token": pa.array([], type=pa.string()),
                    "doc_freq": pa.array([], type=pa.int64()),
                    "postings_sum": pa.array([], type=pa.int64()),
                    "postings_min": pa.array([], type=pa.int64()),
                    "postings_max": pa.array([], type=pa.int64()),
                    "postings_xor": pa.array([], type=pa.int64())})
            lst = batch.column("postings").combine_chunks()
            flat = np.asarray(lst.values.to_numpy(zero_copy_only=False),
                              dtype=np.int64)
            off = np.asarray(lst.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int64)
            starts = off[:-1]
            # doc_freq >= 1 always (a term exists because some doc has
            # it), so reduceat segments are never empty
            s = np.add.reduceat(flat, starts)
            mn = np.minimum.reduceat(flat, starts)
            mx = np.maximum.reduceat(flat, starts)
            xr = np.bitwise_xor.reduceat(flat, starts)
            t = pa.table({"token": batch.column("token"),
                          "doc_freq": batch.column("doc_freq"),
                          "postings_sum": pa.array(s, type=pa.int64()),
                          "postings_min": pa.array(mn, type=pa.int64()),
                          "postings_max": pa.array(mx, type=pa.int64()),
                          "postings_xor": pa.array(xr, type=pa.int64())})
            # each row is one complete term (co-located by the build),
            # so a per-batch head is a valid top-k partial
            order = pc.sort_indices(t, sort_keys=[
                ("doc_freq", "descending"), ("token", "ascending")])
            return t.take(order[:k])

        partials = read_index(out_dir).map_batches(
            fingerprint, batch_format="pyarrow").to_pandas()
        top = partials.sort_values(
            ["doc_freq", "token"], ascending=[False, True]).head(k) \
            .reset_index(drop=True)
        return pa.Table.from_pandas(top, preserve_index=False)
    finally:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
