"""Resumable partitioned-sink scaffolding — shared by the parquet,
tar and JSONL sinks (index.py, incremental.py, export.py).

Contract: ``out_dir`` holds ``{stem}-K{ext}`` payload files plus
``{stem}-K._SUCCESS`` trust markers and a ``_sink_meta.json`` recording
the shard count. A shard is trusted iff its marker exists; a rerun
deletes untrusted payload files (a crashed writer's partial output)
and re-writes ONLY the missing shards.

The shard count is persisted BEFORE any shard work and validated on
every rerun: rows route by ``hash % num``, so resuming with a
DIFFERENT count would silently duplicate rows across shards (grow —
the old trusted files keep rows the new modulus re-routes elsewhere)
or leave stale high-numbered files matching readers' globs (shrink).
Without the persisted meta this failure is even reachable by accident:
a ``num=None`` default resolves to the cluster CPU count, which
changes between machines.

Emptiness is decided from the RETURNED manifest (shards absent from it
received no rows), never from a driver filesystem probe — on a
multi-node cluster without a shared fs, worker-written shards live on
other nodes and an ``os.path.exists`` probe would stamp an empty
payload over real data.
"""

from __future__ import annotations

import json
import os

from linkinator_ray.pipelines.hashagg import default_parts

_META = "_sink_meta.json"


def validate_shard_count(out_dir: str, num: int | None,
                         stem: str) -> int:
    """Resolve/validate the shard count against the sink's persisted
    meta, creating the meta atomically on first use. ``num=None``
    adopts the persisted count of an existing sink (else
    ``default_parts()`` — pinned to the dir from then on, so a resume
    on a different machine stays consistent)."""
    if num is not None and int(num) <= 0:
        raise ValueError(f"shard count (num_parts/num_shards) must be "
                         f"positive, got {num}")
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, _META)
    stored = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = int(json.load(f)["num"])
    if num is None:
        num = stored if stored is not None else default_parts()
    num = int(num)
    if stored is not None and stored != num:
        raise ValueError(
            f"{out_dir} was written with {stored} shards; resuming "
            f"with {num} would duplicate rows across shards (trust "
            f"markers hash rows under the old modulus) — pass "
            f"{stored}, or point at a fresh directory")
    if stored is None:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stem": stem, "num": num}, f)
        os.replace(tmp, meta_path)  # atomic: readers never see a torn meta
    return num


def claim_shards(out_dir: str, num: int | None, stem: str,
                 ext: str) -> tuple[int, set[int], list[int]]:
    """``validate_shard_count`` + compute ``(num, done, todo)`` and
    delete untrusted payload files for every todo shard."""
    num = validate_shard_count(out_dir, num, stem)
    done = {k for k in range(num) if os.path.exists(
        os.path.join(out_dir, f"{stem}-{k}._SUCCESS"))}
    todo = sorted(set(range(num)) - done)
    for k in todo:
        path = os.path.join(out_dir, f"{stem}-{k}{ext}")
        if os.path.exists(path):
            os.remove(path)
    return num, done, todo


def finalize_shards(out_dir: str, stem: str, todo: list[int],
                    written: set[int], write_empty) -> None:
    """Stamp ``_SUCCESS`` for every todo shard. Shards absent from
    ``written`` (the manifest's shard ids) received no rows:
    ``write_empty(k)`` creates their empty payload first so readers
    never 404 a trusted shard."""
    for k in todo:
        if k not in written:
            write_empty(k)
        with open(os.path.join(out_dir, f"{stem}-{k}._SUCCESS"), "w"):
            pass
