"""Incremental dedup: probe a DELTA of new documents against a
materialized fingerprint store of the historical corpus — the daily
ingest shape of a training-data pipeline, where the historical corpus
(the 100 TB side) must never be re-read or re-shuffled to admit a day's
crawl (the GB side).

Two halves, both built from the same primitives as index.py/export.py:

- ``build_fingerprint_store``: base docs → prefix fingerprint (md5 of
  the first K whitespace tokens — the head-fingerprint convention real
  pipelines use so near-identical boilerplate pages collide; K is a
  knob, md5(full text) is K=None) → ONE hash exchange on the
  fingerprint → per-partition distinct with the MIN base doc_id as the
  canonical owner → one sorted parquet file per partition with a
  ``part-K._SUCCESS`` marker.  Resumable exactly like index.py's sink:
  a rerun deletes untrusted partials and filters the fingerprint
  stream to only missing partitions; emptiness is decided from the
  returned manifest, never a driver probe of worker-written files.

- ``incremental_dedup``: delta docs fingerprint with the SAME kernel,
  route by the SAME hash — so each delta partition's probe reads
  EXACTLY ONE store part file, worker-side, co-located with every
  store fingerprint it could collide with.  Nothing of the base corpus
  moves; the store partition count is the only coupling (recorded in
  the store's manifest and asserted at probe time).  Within a
  partition the probe is two vectorized joins:

    dup_base:  fingerprint exists in the store → owner = stored owner
    dup_delta: first occurrence (min doc_id) inside the delta wins;
               later ones point at it
    kept:      novel fingerprint — owner is the doc itself

Face: (doc_id, status, owner_doc_id) for every delta doc — all
deterministic exact values, so the DuckDB oracle reproduces every row.

At 100 TB: the store build is the one-off historical pass (its
exchange moves one ~48 B row per distinct fingerprint, not documents);
every subsequent ingest moves only delta-sized data.  Raise
``num_parts`` until one partition's fingerprint set fits a worker heap;
probes stay single-part-file reads regardless of corpus size.
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


def _fingerprint_kernel(batch: pa.Table, prefix_tokens: int | None) -> pa.Table:
    """(doc_id, fp) — fp = md5 hex of the first ``prefix_tokens``
    whitespace tokens joined by a single space (md5 of the full text
    when None). Same tokenizer convention as every text operator, and
    the exact expression the SQL oracle runs."""
    import hashlib

    text = _text_col(batch)
    if prefix_tokens is not None:
        trimmed = pc.utf8_trim_whitespace(text)
        lst = pc.split_pattern_regex(trimmed, TOKEN_RE)
        head = pc.list_slice(lst, 0, prefix_tokens)
        text = pc.binary_join(head, " ")
    # md5 has no Arrow kernel; one C call per string on the
    # already-shrunk head strings (<= prefix_tokens tokens each)
    fps = [hashlib.md5(s.encode()).hexdigest()
           for s in text.to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fp": pa.array(fps, type=pa.string())})


def _is_base(doc_id: pa.ChunkedArray, split_mod: int) -> pa.ChunkedArray:
    # deterministic base/delta split: doc_id % split_mod != 0 is base —
    # the stand-in for "yesterday's corpus" vs "today's crawl"
    # (pc.divide on integers is integer division)
    return pc.not_equal(
        pc.subtract(doc_id, pc.multiply(
            pc.divide(doc_id, split_mod), split_mod)), 0)


def build_fingerprint_store(sf_dir: str, out_dir: str,
                            prefix_tokens: int | None = 8,
                            split_mod: int = 5,
                            num_parts: int | None = None) -> dict:
    """Materialize the base corpus's fingerprint store under
    ``out_dir`` (part-K.parquet + part-K._SUCCESS, fp-sorted rows,
    MIN doc_id per fingerprint as owner). Returns the manifest."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.sink import claim_shards, finalize_shards
    P, done, todo = claim_shards(out_dir, num_parts, "part", ".parquet")
    if not todo:
        return {"num_parts": P, "written": [], "skipped": sorted(done)}
    todo_arr = pa.array(np.asarray(todo, dtype=np.int64))

    def route(batch: pa.Table) -> pa.Table:
        base = batch.filter(_is_base(batch.column("doc_id"), split_mod))
        fps = _fingerprint_kernel(base, prefix_tokens)
        # per-batch combiner: distinct fp with local min owner — the
        # exchange ships <= distinct-per-batch rows
        local = fps.group_by("fp", use_threads=False) \
            .aggregate([("doc_id", "min")]) \
            .rename_columns(["fp", "owner_doc_id"])
        routed = local.append_column(
            "__part", _part_of_table(local, ["fp"], P))
        return routed.filter(pc.is_in(routed.column("__part"),
                                      value_set=todo_arr))

    stream = read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(route, batch_format="pyarrow", batch_size=8192)

    def build_part(part: pd.DataFrame) -> pd.DataFrame:
        pid = int(part["__part"].iloc[0])
        g = part.groupby("fp", sort=True)["owner_doc_id"].min() \
            .reset_index()
        table = pa.table({
            "fp": pa.array(g["fp"], type=pa.string()),
            "owner_doc_id": pa.array(g["owner_doc_id"], type=pa.int64())})
        pq.write_table(table, os.path.join(out_dir, f"part-{pid}.parquet"))
        return pd.DataFrame({"part": [pid], "n_fps": [len(g)]})

    manifest = stream.groupby("__part").map_groups(
        build_part, batch_format="pandas").to_pandas()
    if len(manifest) == 0:
        manifest = pd.DataFrame({"part": pd.array([], dtype="int64"),
                                 "n_fps": pd.array([], dtype="int64")})
    def empty_part(k: int) -> None:  # genuinely empty partition
        pq.write_table(pa.table({
            "fp": pa.array([], type=pa.string()),
            "owner_doc_id": pa.array([], type=pa.int64())}),
            os.path.join(out_dir, f"part-{k}.parquet"))

    finalize_shards(out_dir, "part", todo,
                    set(int(p) for p in manifest["part"]), empty_part)
    pq.write_table(
        pa.table({"num_parts": pa.array([P], type=pa.int64()),
                  "prefix_tokens": pa.array(
                      [-1 if prefix_tokens is None else prefix_tokens],
                      type=pa.int64())}),
        os.path.join(out_dir, "_store_meta.parquet"))
    return {"num_parts": P, "written": todo, "skipped": sorted(done),
            "manifest": manifest.sort_values("part").to_dict("records")}


def probe_delta(sf_dir: str, store_dir: str,
                prefix_tokens: int | None = 8,
                split_mod: int = 5,
                include_fp: bool = False):
    """Dedup the delta slice against an existing store. Returns a
    Dataset (doc_id, status, owner_doc_id) — status ∈ dup_base /
    dup_delta / kept. ``include_fp=True`` adds the fp and __part
    columns (rows stay co-located with their store partition) so a
    downstream ``update_store`` can fold kept rows in without a
    second fingerprint pass or any driver materialization."""
    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(store_dir, "_store_meta.parquet"))
    P = int(meta.column("num_parts")[0].as_py())
    stored_k = int(meta.column("prefix_tokens")[0].as_py())
    want_k = -1 if prefix_tokens is None else prefix_tokens
    if stored_k != want_k:
        raise ValueError(
            f"store was built with prefix_tokens={stored_k}, "
            f"probe requested {want_k}")
    for k in range(P):
        if not os.path.exists(os.path.join(store_dir,
                                           f"part-{k}._SUCCESS")):
            raise ValueError(f"store partition {k} is untrusted "
                             f"(missing _SUCCESS) — rebuild first")

    def route(batch: pa.Table) -> pa.Table:
        delta = batch.filter(pc.invert(
            _is_base(batch.column("doc_id"), split_mod)))
        fps = _fingerprint_kernel(delta, prefix_tokens)
        return fps.append_column(
            "__part", _part_of_table(fps, ["fp"], P))

    stream = read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(route, batch_format="pyarrow", batch_size=8192)

    def probe_part(part: pd.DataFrame) -> pd.DataFrame:
        pid = int(part["__part"].iloc[0])
        store = pq.read_table(
            os.path.join(store_dir, f"part-{pid}.parquet")).to_pandas()
        df = part.sort_values("doc_id", kind="mergesort")
        # first delta occurrence per fp (co-located => complete groups)
        first = df.groupby("fp", sort=False)["doc_id"].transform("min") \
            .to_numpy(dtype=np.int64)
        # POSITION indirection, not value map: fp -> row index in the
        # store stays < |store| (float64-exact), then owners gather as
        # int64 — a value map would round-trip owner doc_ids through
        # float64 NaN-land and lose exactness above 2^53
        pos = df["fp"].map(
            {fp: i for i, fp in enumerate(store["fp"])})
        base_mask = pos.notna().to_numpy()
        doc = df["doc_id"].to_numpy(dtype=np.int64)
        owner = np.where(doc != first, first, doc)
        if base_mask.any():
            owner[base_mask] = store["owner_doc_id"].to_numpy(
                dtype=np.int64)[pos.to_numpy()[base_mask].astype(np.int64)]
        status = np.where(base_mask, "dup_base",
                          np.where(doc != first, "dup_delta", "kept"))
        out = pd.DataFrame({"doc_id": doc,
                            "status": status,
                            "owner_doc_id": owner})
        if include_fp:
            out["fp"] = df["fp"].to_numpy()
            out["__part"] = np.full(len(out), pid, dtype=np.int64)
        return out

    return stream.groupby("__part").map_groups(
        probe_part, batch_format="pandas")


def incremental_dedup(sf_dir: str, prefix_tokens: int | None = 8,
                      split_mod: int = 5,
                      num_parts: int = 8) -> pa.Table:
    """Driver face: build the base store, probe the delta against it,
    return every delta doc's verdict. A green hash certifies the
    fingerprint kernel, the store write/reread, the co-located probe
    and both dedup precedence rules cell-for-cell."""
    import shutil
    import tempfile
    out_dir = tempfile.mkdtemp(prefix="fpstore-", dir="/tmp")
    try:
        build_fingerprint_store(sf_dir, out_dir,
                                prefix_tokens=prefix_tokens,
                                split_mod=split_mod, num_parts=num_parts)
        got = probe_delta(sf_dir, out_dir, prefix_tokens=prefix_tokens,
                          split_mod=split_mod).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        return pa.Table.from_pandas(got, preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def update_store(sf_dir: str, store_dir: str,
                 prefix_tokens: int | None = 8,
                 split_mod: int = 5) -> dict:
    """Fold a probed delta's KEPT fingerprints into the store — the
    end-of-ingest commit that makes tomorrow's delta dedup against
    today's.  Runs the probe with ``include_fp=True`` (precedence is
    therefore identical to ``probe_delta``, and each kept row already
    carries its partition) and rewrites ONLY the touched part files —
    merge is a sorted-distinct union per partition, written to a temp
    file and atomically renamed, so a reader never observes a torn
    part and a crashed update leaves every old part intact (markers
    are only refreshed after the rename).

    A kept fp is by definition absent from the store, so the merge is
    a pure insert; re-ingesting the same delta is therefore idempotent
    (second probe returns all dup_base — pinned by test).

    Returns {"touched": [part ids rewritten], "inserted": n}.
    """
    import pyarrow.parquet as pq

    # the probe already co-located every row with its store partition;
    # keep fp/__part so the merge needs no second fingerprint pass and
    # NOTHING lands on the driver except the part-count manifest
    verdicts = probe_delta(sf_dir, store_dir,
                           prefix_tokens=prefix_tokens,
                           split_mod=split_mod, include_fp=True)

    def kept_only(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("status"), "kept"))
        return kept.select(["doc_id", "fp", "__part"])

    stream = verdicts.map_batches(kept_only, batch_format="pyarrow")

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        pid = int(part["__part"].iloc[0])
        path = os.path.join(store_dir, f"part-{pid}.parquet")
        store = pq.read_table(path).to_pandas()
        add = part.rename(columns={"doc_id": "owner_doc_id"})[
            ["fp", "owner_doc_id"]]
        merged = pd.concat([store, add], ignore_index=True) \
            .groupby("fp", sort=True)["owner_doc_id"].min().reset_index()
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "fp": pa.array(merged["fp"], type=pa.string()),
            "owner_doc_id": pa.array(merged["owner_doc_id"],
                                     type=pa.int64())}), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"part": [pid], "inserted": [len(add)]})

    manifest = stream.groupby("__part").map_groups(
        merge_part, batch_format="pandas").to_pandas()
    touched = sorted(int(p) for p in manifest.get("part", []))
    for k in touched:  # refresh trust markers after the atomic renames
        with open(os.path.join(store_dir, f"part-{k}._SUCCESS"), "w"):
            pass
    return {"touched": touched,
            "inserted": int(manifest.get("inserted",
                                         pd.Series(dtype=int)).sum())}
