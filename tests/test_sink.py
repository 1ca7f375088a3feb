"""Shared resumable-sink scaffolding (pipelines/sink.py): the shard
count is persisted in _sink_meta.json on first use and a resume with a
DIFFERENT count must refuse — rows route by hash % num, so a changed
modulus would silently duplicate rows across trusted shards."""

import json
import os

import pytest


def test_meta_pins_shard_count(tmp_path):
    from linkinator_ray.pipelines.sink import validate_shard_count
    out = str(tmp_path / "sink")
    assert validate_shard_count(out, 8, "shard") == 8
    with open(os.path.join(out, "_sink_meta.json")) as f:
        assert json.load(f)["num"] == 8
    # same count resumes fine; None adopts the pinned count
    assert validate_shard_count(out, 8, "shard") == 8
    assert validate_shard_count(out, None, "shard") == 8
    # different count refuses loudly
    with pytest.raises(ValueError, match="8 shards"):
        validate_shard_count(out, 16, "shard")


def test_nonpositive_count_rejected(tmp_path):
    from linkinator_ray.pipelines.sink import validate_shard_count
    with pytest.raises(ValueError, match="positive"):
        validate_shard_count(str(tmp_path / "s"), 0, "shard")


def test_claim_deletes_untrusted_payload(tmp_path):
    from linkinator_ray.pipelines.sink import claim_shards
    out = str(tmp_path / "sink")
    os.makedirs(out)
    # shard 0 trusted, shard 1 has a crashed writer's partial file
    open(os.path.join(out, "part-0.parquet"), "w").close()
    open(os.path.join(out, "part-0._SUCCESS"), "w").close()
    with open(os.path.join(out, "part-1.parquet"), "w") as f:
        f.write("garbage")
    num, done, todo = claim_shards(out, 2, "part", ".parquet")
    assert (num, done, todo) == (2, {0}, [1])
    assert os.path.exists(os.path.join(out, "part-0.parquet"))
    assert not os.path.exists(os.path.join(out, "part-1.parquet"))


def test_finalize_stamps_and_fills_empties(tmp_path):
    from linkinator_ray.pipelines.sink import finalize_shards
    out = str(tmp_path / "sink")
    os.makedirs(out)
    made = []
    finalize_shards(out, "part", [0, 1, 2], written={0, 2},
                    write_empty=lambda k: made.append(k))
    assert made == [1]  # only the row-less shard gets an empty payload
    for k in (0, 1, 2):
        assert os.path.exists(os.path.join(out, f"part-{k}._SUCCESS"))


def test_sinks_share_the_guard(ray_session, tmp_path):
    """End-to-end: every migrated sink refuses a mismatched resume."""
    from linkinator_ray.pipelines.export import export_jsonl
    from linkinator_ray.pipelines.index import build_inverted_index

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "jsonl")
    export_jsonl(sf, out, num_shards=2)
    with pytest.raises(ValueError, match="2 shards"):
        export_jsonl(sf, out, num_shards=4)

    idx = str(tmp_path / "idx")
    build_inverted_index(sf, idx, num_parts=2)
    with pytest.raises(ValueError, match="2 shards"):
        build_inverted_index(sf, idx, num_parts=3)
