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
    S = int(num_shards)
    if S <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
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
