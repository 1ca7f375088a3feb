"""Per-round checkpoint / resume with lineage (north_rule requirement).

The reference has no crash recovery — a killed run loses everything
(SURVEY.md §4). Here every BFS round writes an atomic checkpoint:
frontier, seen-set shard snapshots, pending fragments, duplicate edges,
results-so-far, counters, and a lineage manifest
``{run_id, round, parent_round, row_counts, wall_clock}``. Writes go to
a temp dir that is renamed into place, so a partially-written round is
never picked up; resume loads the newest complete round and re-enters
the loop.

Layout (one dir per round — the partition unit; a multi-node run writes
per-partition files under the same round dir):

    {checkpoint_dir}/round_{k:06d}/
        manifest.json
        frontier.parquet  pending_fragments.parquet  dup_edges.parquet
        results.parquet   seen_shard_{i:04d}.parquet
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _write(table: pa.Table, path: str) -> None:
    pq.write_table(table, path)
    # durability: the atomic-rename protocol only guarantees "a
    # partially-written round is never picked up" if the data blocks
    # reach disk BEFORE the rename is journaled — fsync each file, then
    # the directories (save_round), or a power loss can leave a renamed
    # round dir holding truncated files that resume would trust
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def save_round(checkpoint_dir: str, run_id: str, round_no: int,
               tables: dict[str, pa.Table], seen_tables: list[pa.Table],
               counters: dict, extra: dict | None = None) -> str:
    final_dir = os.path.join(checkpoint_dir, f"round_{round_no:06d}")
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    row_counts = {}
    for name, table in tables.items():
        _write(table, os.path.join(tmp_dir, f"{name}.parquet"))
        row_counts[name] = table.num_rows
    for i, table in enumerate(seen_tables):
        _write(table, os.path.join(tmp_dir, f"seen_shard_{i:04d}.parquet"))
    manifest = {
        "run_id": run_id,
        "round": round_no,
        "parent_round": round_no - 1,
        "row_counts": row_counts,
        "num_seen_shards": len(seen_tables),
        "wall_clock": time.time(),
        "counters": counters,
        "extra": extra or {},
    }
    with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    _fsync_dir(tmp_dir)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    _fsync_dir(checkpoint_dir)  # persist the rename itself
    return final_dir


def latest_round(checkpoint_dir: str) -> int | None:
    if not os.path.isdir(checkpoint_dir):
        return None
    rounds = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("round_") and not name.endswith(".tmp"):
            try:
                rounds.append(int(name.split("_")[1]))
            except ValueError:
                continue
    # validate candidates newest-first and return the first whose
    # manifest parses (a corrupt manifest — pre-fsync crash — is not a
    # round); a long run accumulates thousands of epoch dirs, so only
    # the winning candidate's manifest is opened, not every one
    for r in sorted(rounds, reverse=True):
        manifest = os.path.join(checkpoint_dir, f"round_{r:06d}",
                                "manifest.json")
        try:
            with open(manifest) as f:
                json.load(f)
        except (OSError, ValueError):
            continue
        return r
    return None


def load_round(checkpoint_dir: str, round_no: int,
               load_seen: bool = True):
    """``load_seen=False`` skips the seen-shard parquet reads (returns
    an empty list) — a journal-based resume rebuilds membership from
    the key journal and never touches the positional shard dumps, which
    at scale are the bulk of a checkpoint's bytes."""
    round_dir = os.path.join(checkpoint_dir, f"round_{round_no:06d}")
    with open(os.path.join(round_dir, "manifest.json")) as f:
        manifest = json.load(f)
    tables = {}
    for name in manifest["row_counts"]:
        tables[name] = pq.read_table(os.path.join(round_dir, f"{name}.parquet"))
    seen_tables = [
        pq.read_table(os.path.join(round_dir, f"seen_shard_{i:04d}.parquet"))
        for i in range(manifest["num_seen_shards"])
    ] if load_seen else []
    return manifest, tables, seen_tables


def load_seen_shards(checkpoint_dir: str, round_no: int,
                     manifest: dict) -> list:
    """The deferred half of ``load_round(load_seen=False)``: read the
    positional seen-shard dumps once the caller knows it needs them."""
    round_dir = os.path.join(checkpoint_dir, f"round_{round_no:06d}")
    return [
        pq.read_table(os.path.join(round_dir, f"seen_shard_{i:04d}.parquet"))
        for i in range(manifest["num_seen_shards"])
    ]
