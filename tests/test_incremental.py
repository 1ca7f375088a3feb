"""Incremental dedup: delta probed against the materialized base
fingerprint store. Planted-corpus semantics, single-machine
differential, store crash-resume, and the coupling guards."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"))
    return str(d)


def _run(sf_dir, **kw):
    from linkinator_ray.pipelines.incremental import incremental_dedup
    t = incremental_dedup(sf_dir, **kw).to_pandas()
    return t.sort_values("doc_id").reset_index(drop=True)


def test_planted_semantics(ray_session, tmp_path):
    # split_mod=5: doc_ids 0,5,10,15 are delta; the rest base.
    # Use prefix_tokens=None (full-text md5) for surgical control.
    texts = [""] * 16
    texts[1] = "alpha beta"      # base
    texts[2] = "gamma"           # base
    texts[6] = "alpha beta"      # base dup of 1 — owner must be min(1,6)=1
    for i in (3, 4, 7, 8, 9, 11, 12, 13, 14):
        texts[i] = f"base filler {i}"
    texts[0] = "alpha beta"      # delta: dup_base -> owner 1
    texts[5] = "delta novel x"   # delta: kept
    texts[10] = "delta novel y"  # delta: first of a delta pair -> kept
    texts[15] = "delta novel y"  # delta: dup_delta -> owner 10
    sf = _write_docs(tmp_path, texts)
    t = _run(sf, prefix_tokens=None, num_parts=4)
    got = {int(r.doc_id): (r.status, int(r.owner_doc_id))
           for _, r in t.iterrows()}
    assert got == {0: ("dup_base", 1), 5: ("kept", 5),
                   10: ("kept", 10), 15: ("dup_delta", 10)}


def test_prefix_fingerprint_collides_on_head(ray_session, tmp_path):
    # same first-2-token head, different tails => prefix dup, full-text not
    texts = ["x " * 7] * 10
    texts[1] = "same head tail-one"
    texts[0] = "same head tail-two"          # delta
    sf = _write_docs(tmp_path, texts)
    t = _run(sf, prefix_tokens=2, num_parts=4)
    r0 = t[t.doc_id == 0].iloc[0]
    assert r0.status == "dup_base" and r0.owner_doc_id == 1
    t_full = _run(sf, prefix_tokens=None, num_parts=4)
    r0 = t_full[t_full.doc_id == 0].iloc[0]
    # full-text fingerprints differ => under full-text hashing doc 0 is
    # novel; the filler delta docs (5, 10, 15) still hit the base copies
    assert r0.status == "kept"
    r5 = t_full[t_full.doc_id == 5].iloc[0]
    assert r5.status == "dup_base" and r5.owner_doc_id == 2


def test_matches_single_machine_reference(ray_session):
    import hashlib
    t = _run(SF, prefix_tokens=8, split_mod=5, num_parts=8)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    fp = docs["text"].map(
        lambda s: hashlib.md5(
            " ".join(s.strip().split()[:8]).encode()).hexdigest())
    docs = docs.assign(fp=fp)
    base = docs[docs.doc_id % 5 != 0].groupby("fp")["doc_id"].min()
    delta = docs[docs.doc_id % 5 == 0]
    firsts = delta.groupby("fp")["doc_id"].min()
    exp = {}
    for _, r in delta.iterrows():
        if r.fp in base.index:
            exp[int(r.doc_id)] = ("dup_base", int(base[r.fp]))
        elif int(r.doc_id) != int(firsts[r.fp]):
            exp[int(r.doc_id)] = ("dup_delta", int(firsts[r.fp]))
        else:
            exp[int(r.doc_id)] = ("kept", int(r.doc_id))
    got = {int(r.doc_id): (r.status, int(r.owner_doc_id))
           for _, r in t.iterrows()}
    assert got == exp
    # the corpus actually exercises all three verdicts at this sf
    assert set(t["status"]) == {"kept", "dup_base", "dup_delta"}


def test_store_crash_resume_rebuilds_only_lost_partition(
        ray_session, tmp_path):
    from linkinator_ray.pipelines.incremental import (
        build_fingerprint_store, probe_delta)
    out = str(tmp_path / "store")
    build_fingerprint_store(SF, out, num_parts=4)
    before = probe_delta(SF, out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    mtimes = {k: os.path.getmtime(os.path.join(out, f"part-{k}.parquet"))
              for k in range(4)}
    # crash: partition 2 loses its marker and leaves a garbage partial
    os.remove(os.path.join(out, "part-2._SUCCESS"))
    with open(os.path.join(out, "part-2.parquet"), "w") as f:
        f.write("garbage")
    manifest = build_fingerprint_store(SF, out, num_parts=4)
    assert manifest["written"] == [2]
    assert manifest["skipped"] == [0, 1, 3]
    for k in (0, 1, 3):  # untouched partitions were not rewritten
        assert os.path.getmtime(
            os.path.join(out, f"part-{k}.parquet")) == mtimes[k]
    after = probe_delta(SF, out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_coupling_guards(ray_session, tmp_path):
    from linkinator_ray.pipelines.incremental import (
        build_fingerprint_store, probe_delta)
    out = str(tmp_path / "store")
    build_fingerprint_store(SF, out, prefix_tokens=8, num_parts=4)
    with pytest.raises(ValueError, match="prefix_tokens"):
        probe_delta(SF, out, prefix_tokens=4)
    os.remove(os.path.join(out, "part-1._SUCCESS"))
    with pytest.raises(ValueError, match="untrusted"):
        probe_delta(SF, out, prefix_tokens=8)
    with pytest.raises(ValueError, match="num_parts"):
        build_fingerprint_store(SF, str(tmp_path / "s2"), num_parts=0)


def test_update_store_second_ingest_is_all_dup_base(ray_session, tmp_path):
    from linkinator_ray.pipelines.incremental import (
        build_fingerprint_store, probe_delta, update_store)
    out = str(tmp_path / "store")
    build_fingerprint_store(SF, out, num_parts=4)
    first = probe_delta(SF, out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    kept = first[first.status == "kept"]
    res = update_store(SF, out)
    assert res["inserted"] == len(kept)
    assert res["touched"]  # at least one partition rewritten
    # idempotent re-ingest: every delta doc now hits the store; kept
    # docs' owners are themselves, dup_delta losers' owners are their
    # delta keeper (who is now IN the store)
    second = probe_delta(SF, out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (second["status"] == "dup_base").all()
    merged_owner = dict(zip(first.doc_id, first.owner_doc_id))
    for _, r in second.iterrows():
        assert int(r.owner_doc_id) == int(merged_owner[int(r.doc_id)])
    # a second update inserts nothing and touches nothing
    res2 = update_store(SF, out)
    assert res2 == {"touched": [], "inserted": 0}


def test_update_store_preserves_untouched_parts(ray_session, tmp_path):
    from linkinator_ray.pipelines.incremental import (
        build_fingerprint_store, update_store)
    import pyarrow.parquet as pq
    out = str(tmp_path / "store")
    build_fingerprint_store(SF, out, num_parts=4)
    sizes = {k: pq.read_table(os.path.join(out, f"part-{k}.parquet"))
             .num_rows for k in range(4)}
    res = update_store(SF, out)
    for k in range(4):
        n = pq.read_table(os.path.join(out, f"part-{k}.parquet")).num_rows
        if k in res["touched"]:
            assert n > sizes[k]
        else:
            assert n == sizes[k]
        # store invariant: fp-distinct (insert-only merge kept it)
        t = pq.read_table(os.path.join(out, f"part-{k}.parquet"))
        fps = t.column("fp").to_pylist()
        assert len(fps) == len(set(fps))


def test_owner_ids_above_2_53_stay_exact(ray_session, tmp_path):
    """Owner doc_ids must never round-trip through float64: with base
    ids above 2^53 (where float64 is no longer integer-exact), dup_base
    owners and dup_delta owners come back bit-exact."""
    big = (1 << 53) + 1   # not representable in float64 (rounds to 2^53)
    big2 = (1 << 53) + 7  # also inexact in float64 (and % 5 != 0)
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    # split_mod=5: ids 0,5 are delta; big ids are base (not % 5 == 0)
    pq.write_table(pa.table({
        "doc_id": pa.array([big, big2, 0, 5, 10, 15], pa.int64()),
        "text": pa.array(["shared base text", "other base text",
                          "shared base text",   # delta dup of big
                          "delta pair", "delta pair",  # delta dup chain
                          "novel delta"], pa.string())}),
        str(d / "documents.parquet"))
    assert big % 5 != 0 and big2 % 5 != 0  # really base rows
    t = _run(str(d), prefix_tokens=None, num_parts=4)
    got = {int(r.doc_id): (r.status, int(r.owner_doc_id))
           for _, r in t.iterrows()}
    assert got[0] == ("dup_base", big)       # exact, not big - 1
    assert got[5] == ("kept", 5)
    assert got[10] == ("dup_delta", 5)
    assert got[15] == ("kept", 15)
