"""Resumable partitioned corpus export — the write side of a 100 TB run.

A job that streams for hours WILL be preempted; the output layout has
to make the rerun cheap. The recipe here is the standard one:

  * output is hash-partitioned into ``shard=K/`` directories (the same
    deterministic md5 coin as shuffle_export, so the shard of a doc
    never depends on which run wrote it),
  * a shard directory is only trusted once its ``_SUCCESS`` marker
    exists — written after the data files for a run complete,
  * a rerun deletes untrusted (partial) shard directories and
    recomputes ONLY those shards: the input is row-filtered on the
    missing shard ids with one vectorized ``pc.is_in`` per batch, so
    finished shards cost neither read nor write bandwidth beyond the
    pruned coin column.

One streaming pass end-to-end: coin → filter → partitioned
``write_parquet`` (never one giant file); nothing materializes on the
driver but the to-do shard list (≤ num_shards ints).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa

from linkinator_ray.pipelines.dedup import read_docs

_MARKER = "_SUCCESS"


def _shard_kernel(batch: pa.Table, num_shards: int) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    h = np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
         for i in ids), dtype=np.int64, count=len(ids))
    return batch.append_column("shard", pa.array(h % num_shards))


def finished_shards(out_dir: str) -> set[int]:
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("shard=") and os.path.exists(
                os.path.join(out_dir, name, _MARKER)):
            done.add(int(name.split("=", 1)[1]))
    return done


def export_corpus(sf_dir: str, out_dir: str, num_shards: int = 8,
                  columns: list[str] | None = None) -> dict:
    """Export the documents table to ``out_dir/shard=K/*.parquet``,
    skipping shards already marked ``_SUCCESS`` by a previous run.

    Returns a manifest dict: {"num_shards", "written" (shard ids this
    run), "skipped" (already finished)}."""
    from linkinator_ray.pipelines.sink import validate_shard_count
    S = validate_shard_count(out_dir, int(num_shards), "shard")
    cols = columns or ["doc_id", "text", "lang", "source"]
    if "doc_id" not in cols:
        raise ValueError("export columns must include doc_id")

    done = finished_shards(out_dir)
    todo = sorted(set(range(S)) - done)
    if todo:
        # partial output from a crashed run is untrusted — remove it
        for k in todo:
            part = os.path.join(out_dir, f"shard={k}")
            if os.path.isdir(part):
                shutil.rmtree(part)

        todo_arr = pa.array(np.asarray(todo, dtype=np.int64))

        def keep_todo(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            sharded = _shard_kernel(batch, S)
            return sharded.filter(pc.is_in(sharded.column("shard"),
                                           value_set=todo_arr))

        read_docs(sf_dir, cols).map_batches(
            keep_todo, batch_format="pyarrow", batch_size=8192) \
            .write_parquet(out_dir, partition_cols=["shard"])

        for k in todo:
            part = os.path.join(out_dir, f"shard={k}")
            os.makedirs(part, exist_ok=True)  # empty shard still finishes
            with open(os.path.join(part, _MARKER), "w"):
                pass
    return {"num_shards": S, "written": todo, "skipped": sorted(done)}


def read_export(out_dir: str):
    """Read an export back as a Dataset (shard comes from the directory
    partitioning)."""
    import ray.data as rd
    return rd.read_parquet(out_dir)


def export_roundtrip(sf_dir: str, num_shards: int = 8):
    """Driver-checkable face of the export: write (resumably) to a
    scratch directory, read back, return (doc_id, shard, n_chars) —
    proving the partitioned write/read cycle preserves the corpus."""
    import pyarrow.compute as pc
    out_dir = os.path.join("/tmp", "linkinator_ray_export",
                           sf_dir.strip("/").replace("/", "_"),
                           f"s{num_shards}")
    # queries run repeatedly against possibly-regenerated inputs:
    # scratch is cleaned so the check always exercises a fresh write
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    export_corpus(sf_dir, out_dir, num_shards=num_shards)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "shard": pc.cast(batch.column("shard"), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")),
                               pa.int64()),
        })

    return read_export(out_dir).map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# WebDataset-style sharded tar export
# ---------------------------------------------------------------------------

def export_tar(sf_dir: str, out_dir: str, num_shards: int = 8) -> dict:
    """Export documents to WebDataset-style shard tars —
    ``out_dir/shard-K.tar`` with one ``{doc_id}.txt`` member per doc —
    the delivery format large training loaders stream (sequential tar
    reads, one shard per loader worker).

    Same resumability contract as ``export_corpus``: a shard is trusted
    only with its ``shard-K._SUCCESS`` marker; a rerun deletes
    untrusted tars and row-filters the input to ONLY the missing shards
    (one vectorized ``pc.is_in`` per batch). Shard assignment is the
    deterministic md5 coin, member order inside a tar is sorted doc_id,
    and tar metadata (mtime/uid/perm) is zeroed — a shard's bytes are a
    pure function of its docs, so reruns are bit-reproducible.

    Each shard tar is written INSIDE the worker that owns the shard's
    hash partition (hash_map_groups on the shard key): the driver never
    sees document text, only the per-shard manifest rows.
    """
    import pandas as pd

    from linkinator_ray.pipelines.hashagg import hash_map_groups
    from linkinator_ray.pipelines.sink import claim_shards, finalize_shards

    S, done, todo = claim_shards(out_dir, int(num_shards), "shard", ".tar")
    if not todo:
        return {"num_shards": S, "written": [], "skipped": sorted(done)}
    todo_arr = pa.array(np.asarray(todo, dtype=np.int64))

    def keep_todo(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sharded = _shard_kernel(batch, S)
        return sharded.filter(pc.is_in(sharded.column("shard"),
                                       value_set=todo_arr))

    rows = read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        keep_todo, batch_format="pyarrow", batch_size=8192)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile
        k = int(g["shard"].iloc[0])
        g = g.sort_values("doc_id")
        path = os.path.join(out_dir, f"shard-{k}.tar")
        n_bytes = 0
        with tarfile.open(path, "w") as tar:
            for doc_id, text in zip(g["doc_id"], g["text"]):
                payload = (text or "").encode("utf-8")
                info = tarfile.TarInfo(name=f"{int(doc_id)}.txt")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(payload))
                n_bytes += len(payload)
        return pd.DataFrame({"shard": [k], "n_docs": [len(g)],
                             "n_bytes": [n_bytes]})

    empty = pd.DataFrame({"shard": pd.array([], dtype="int64"),
                          "n_docs": pd.array([], dtype="int64"),
                          "n_bytes": pd.array([], dtype="int64")})
    manifest = hash_map_groups(rows, "shard", write_shard,
                               num_parts=min(S, 16), empty=empty) \
        .to_pandas()
    if len(manifest) == 0:
        # a ZERO-row routed stream never reaches per_part, so even the
        # empty template is lost — to_pandas() is column-less and
        # sort_values would KeyError
        manifest = empty
    manifest = manifest.sort_values("shard")

    def empty_tar(k: int) -> None:  # genuinely empty shard
        import tarfile
        tarfile.open(os.path.join(out_dir, f"shard-{k}.tar"), "w").close()

    finalize_shards(out_dir, "shard", todo,
                    set(int(s) for s in manifest["shard"]), empty_tar)
    return {"num_shards": S, "written": todo, "skipped": sorted(done),
            "manifest": manifest.to_dict("records")}


def export_tar_roundtrip(sf_dir: str, num_shards: int = 8):
    """Driver-checkable face of the tar export: write shard tars, read
    every member back, return (doc_id, shard, n_bytes) — proving the
    write/read cycle preserves the corpus byte counts. Oracle: the md5
    shard coin + octet_length over documents."""
    import tarfile

    out_dir = os.path.join("/tmp", "linkinator_ray_export_tar",
                           sf_dir.strip("/").replace("/", "_"),
                           f"s{num_shards}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    export_tar(sf_dir, out_dir, num_shards=num_shards)
    doc_ids, shards, sizes = [], [], []
    for k in range(num_shards):
        with tarfile.open(os.path.join(out_dir, f"shard-{k}.tar")) as tar:
            for m in tar.getmembers():
                doc_ids.append(int(m.name.removesuffix(".txt")))
                shards.append(k)
                sizes.append(m.size)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "shard": pa.array(shards, pa.int64()),
        "n_bytes": pa.array(sizes, pa.int64()),
    })


# ---------------------------------------------------------------------------
# JSONL (NDJSON) sharded export + source — the interchange format most
# training-data pipelines actually move text through
# ---------------------------------------------------------------------------

def export_jsonl(sf_dir: str, out_dir: str, num_shards: int = 8) -> dict:
    """Export documents to sharded newline-delimited JSON —
    ``out_dir/shard-K.jsonl`` with one JSON object per doc (doc_id,
    shard, text, lang, source) — the format corpus-interchange tooling
    (CC pipelines, HF loaders) consumes.

    Same resumability contract as ``export_tar``: a shard is trusted
    only with its ``shard-K._SUCCESS`` marker; a rerun deletes
    untrusted files and row-filters the input to ONLY the missing
    shards. Shard assignment is the deterministic md5 coin, lines are
    sorted by doc_id, and serialization is canonical
    (``sort_keys=True``, compact separators, raw UTF-8) — a shard's
    bytes are a pure function of its docs, so reruns are
    bit-reproducible. Each shard file is written INSIDE the worker
    that owns the shard's hash partition; empty-shard detection comes
    from the returned manifest, never a driver filesystem probe."""
    import json

    import pandas as pd

    from linkinator_ray.pipelines.hashagg import hash_map_groups
    from linkinator_ray.pipelines.sink import claim_shards, finalize_shards

    S, done, todo = claim_shards(out_dir, int(num_shards), "shard",
                                 ".jsonl")
    if not todo:
        return {"num_shards": S, "written": [], "skipped": sorted(done)}
    todo_arr = pa.array(np.asarray(todo, dtype=np.int64))

    def keep_todo(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sharded = _shard_kernel(batch, S)
        return sharded.filter(pc.is_in(sharded.column("shard"),
                                       value_set=todo_arr))

    rows = read_docs(sf_dir, ["doc_id", "text", "lang", "source"]) \
        .map_batches(keep_todo, batch_format="pyarrow", batch_size=8192)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["shard"].iloc[0])
        g = g.sort_values("doc_id")
        path = os.path.join(out_dir, f"shard-{k}.jsonl")
        n_bytes = 0
        with open(path, "wb") as f:
            for rec in g.itertuples(index=False):
                # write + count ENCODED bytes: ensure_ascii=False emits
                # multi-byte UTF-8, so len(str) would undercount
                payload = (json.dumps(
                    {"doc_id": int(rec.doc_id), "shard": k,
                     "text": rec.text or "", "lang": rec.lang,
                     "source": rec.source},
                    ensure_ascii=False, sort_keys=True,
                    separators=(",", ":")) + "\n").encode("utf-8")
                f.write(payload)
                n_bytes += len(payload)
        return pd.DataFrame({"shard": [k], "n_docs": [len(g)],
                             "n_bytes": [n_bytes]})

    empty = pd.DataFrame({"shard": pd.array([], dtype="int64"),
                          "n_docs": pd.array([], dtype="int64"),
                          "n_bytes": pd.array([], dtype="int64")})
    manifest = hash_map_groups(rows, "shard", write_shard,
                               num_parts=min(S, 16), empty=empty) \
        .to_pandas()
    if len(manifest) == 0:
        # zero-row routed stream: map_groups never ran, to_pandas() is
        # column-less and sort_values("shard") would KeyError
        manifest = empty
    manifest = manifest.sort_values("shard")
    finalize_shards(
        out_dir, "shard", todo, set(int(s) for s in manifest["shard"]),
        lambda k: open(os.path.join(out_dir, f"shard-{k}.jsonl"),
                       "w").close())
    return {"num_shards": S, "written": todo, "skipped": sorted(done),
            "manifest": manifest.to_dict("records")}


def read_jsonl(out_dir: str):
    """Read a JSONL export back as a Dataset (pyarrow's NDJSON reader
    under ray.data.read_json; shard ids live inside each record, so no
    partition inference is needed)."""
    import ray.data as rd
    return rd.read_json(out_dir, file_extensions=["jsonl"])


def jsonl_roundtrip(sf_dir: str, num_shards: int = 8):
    """Driver-checkable face of the JSONL source/sink: write shard
    files, read them back through the NDJSON source, return
    (doc_id, shard, n_chars) — proving the write/read cycle preserves
    the corpus. Oracle: the md5 shard coin + length(text) over
    documents (same contract as export_roundtrip)."""
    import pyarrow.compute as pc
    out_dir = os.path.join("/tmp", "linkinator_ray_export_jsonl",
                           sf_dir.strip("/").replace("/", "_"),
                           f"s{num_shards}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    export_jsonl(sf_dir, out_dir, num_shards=num_shards)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "shard": pc.cast(batch.column("shard"), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")),
                               pa.int64()),
        })

    return read_jsonl(out_dir).map_batches(project, batch_format="pyarrow")
