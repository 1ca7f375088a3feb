"""Resumable partitioned export: shard=K dirs + _SUCCESS markers; a
rerun recomputes ONLY untrusted shards."""

import os

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _files_of(out_dir, shard):
    d = os.path.join(out_dir, f"shard={shard}")
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_export_roundtrip_and_resume(ray_session, tmp_path):
    from linkinator_ray.pipelines.export import (export_corpus,
                                                 finished_shards,
                                                 read_export)
    out = str(tmp_path / "export")
    m1 = export_corpus(SF, out, num_shards=4)
    assert m1["written"] == [0, 1, 2, 3] and m1["skipped"] == []
    assert finished_shards(out) == {0, 1, 2, 3}

    # the export preserves the corpus exactly
    back = read_export(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang", "source"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[["doc_id", "text", "lang", "source"]], src)

    # simulate a crash: shards 1 and 3 lose their marker, 3 also has a
    # half-written garbage file
    os.remove(os.path.join(out, "shard=1", "_SUCCESS"))
    os.remove(os.path.join(out, "shard=3", "_SUCCESS"))
    with open(os.path.join(out, "shard=3", "partial.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    untouched = {k: _files_of(out, k) for k in (0, 2)}
    mtimes = {k: os.path.getmtime(os.path.join(out, f"shard={k}",
                                               untouched[k][0]))
              for k in (0, 2)}

    m2 = export_corpus(SF, out, num_shards=4)
    assert m2["written"] == [1, 3] and m2["skipped"] == [0, 2]
    # finished shards were not rewritten (same files, same mtimes)
    for k in (0, 2):
        assert _files_of(out, k) == untouched[k]
        assert os.path.getmtime(os.path.join(
            out, f"shard={k}", untouched[k][0])) == mtimes[k]
    # the garbage partial is gone and the data is whole again
    assert "partial.parquet" not in _files_of(out, 3)
    back2 = read_export(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back2[["doc_id", "text", "lang", "source"]], src)

    # third run: nothing to do
    m3 = export_corpus(SF, out, num_shards=4)
    assert m3["written"] == [] and m3["skipped"] == [0, 1, 2, 3]


def test_export_tar_roundtrip_and_resume(ray_session, tmp_path):
    """Shard tars carry every doc exactly once; a crashed run (marker
    missing, garbage partial tar) rewrites ONLY the untrusted shard —
    finished tars are untouched byte-for-byte AND reproduced
    bit-identically (zeroed tar metadata)."""
    import os
    import tarfile

    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.export import export_tar

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "tars")
    m1 = export_tar(sf, out, num_shards=4)
    assert m1["written"] == [0, 1, 2, 3]

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    seen = {}
    for k in range(4):
        with tarfile.open(os.path.join(out, f"shard-{k}.tar")) as tar:
            for m in tar.getmembers():
                seen[int(m.name.removesuffix(".txt"))] = m.size
    assert set(seen) == set(docs["doc_id"])
    for _, row in docs.iterrows():
        assert seen[row["doc_id"]] == len(row["text"].encode("utf-8"))

    # simulate a crash: shard 2 loses its marker and has a garbage tar
    keep_bytes = {k: open(os.path.join(out, f"shard-{k}.tar"), "rb").read()
                  for k in (0, 1, 3)}
    broken = open(os.path.join(out, "shard-2.tar"), "rb").read()
    os.remove(os.path.join(out, "shard-2._SUCCESS"))
    with open(os.path.join(out, "shard-2.tar"), "wb") as f:
        f.write(b"garbage")

    m2 = export_tar(sf, out, num_shards=4)
    assert m2["written"] == [2] and m2["skipped"] == [0, 1, 3]
    for k in (0, 1, 3):
        assert open(os.path.join(out, f"shard-{k}.tar"), "rb").read() \
            == keep_bytes[k], f"finished shard {k} was touched"
    # bit-reproducible rebuild of the broken shard
    assert open(os.path.join(out, "shard-2.tar"), "rb").read() == broken

    # fully-finished export is a no-op
    m3 = export_tar(sf, out, num_shards=4)
    assert m3["written"] == []


def test_export_jsonl_roundtrip_and_resume(ray_session, tmp_path):
    """JSONL shards carry every doc exactly once and read back through
    the NDJSON source; a crashed run (marker missing, garbage partial
    file) rewrites ONLY the untrusted shard bit-identically (canonical
    serialization)."""
    import json
    import os

    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.export import export_jsonl, read_jsonl

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "jsonl")
    m1 = export_jsonl(sf, out, num_shards=4)
    assert m1["written"] == [0, 1, 2, 3]

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"]) \
        .to_pandas()
    # every line is valid JSON with the full record and its shard id
    seen = {}
    for k in range(4):
        with open(os.path.join(out, f"shard-{k}.jsonl"),
                  encoding="utf-8") as f:
            for line in f:
                rec = json.loads(line)
                assert rec["shard"] == k
                seen[rec["doc_id"]] = rec["text"]
    assert set(seen) == set(docs["doc_id"])
    src_text = dict(zip(docs["doc_id"], docs["text"]))
    assert seen == src_text

    # the Ray NDJSON source reads the corpus back exactly
    back = read_jsonl(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(back) == len(docs)
    assert list(back["text"]) == [src_text[d] for d in back["doc_id"]]

    # crash resume: shard 2 loses its marker and holds garbage
    keep_bytes = {k: open(os.path.join(out, f"shard-{k}.jsonl"),
                          "rb").read() for k in (0, 1, 3)}
    broken = open(os.path.join(out, "shard-2.jsonl"), "rb").read()
    os.remove(os.path.join(out, "shard-2._SUCCESS"))
    with open(os.path.join(out, "shard-2.jsonl"), "wb") as f:
        f.write(b"garbage\n")

    m2 = export_jsonl(sf, out, num_shards=4)
    assert m2["written"] == [2] and m2["skipped"] == [0, 1, 3]
    for k in (0, 1, 3):
        assert open(os.path.join(out, f"shard-{k}.jsonl"), "rb").read() \
            == keep_bytes[k], f"finished shard {k} was touched"
    assert open(os.path.join(out, "shard-2.jsonl"), "rb").read() == broken

    m3 = export_jsonl(sf, out, num_shards=4)
    assert m3["written"] == []
