"""Inverted index: postings correctness vs a direct single-machine
computation, resumable partition rebuild, point lookups, and the
mergeable top-k fingerprint face."""

import os
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _expected_postings(docs: pd.DataFrame) -> dict[str, list[int]]:
    post: dict[str, set[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for tok in set(re.split(r"\s+", (text or "").strip())):
            post.setdefault(tok, set()).add(int(doc_id))
    return {t: sorted(s) for t, s in post.items()}


def _read_all_postings(out_dir) -> dict[str, list[int]]:
    got: dict[str, list[int]] = {}
    for f in os.listdir(out_dir):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out_dir, f))
        for tok, lst in zip(t.column("token").to_pylist(),
                            t.column("postings").to_pylist()):
            assert tok not in got, f"token {tok!r} split across partitions"
            got[tok] = [int(x) for x in lst]
    return got


def test_index_matches_single_machine(ray_session, tmp_path):
    from linkinator_ray.pipelines.index import build_inverted_index
    out = str(tmp_path / "idx")
    m = build_inverted_index(SF, out, num_parts=4)
    assert m["written"] == [0, 1, 2, 3]

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    expected = _expected_postings(docs)
    got = _read_all_postings(out)
    assert got == expected
    # postings are sorted ascending within every term
    for lst in got.values():
        assert lst == sorted(lst)


def test_index_resume_rebuilds_only_missing(ray_session, tmp_path):
    from linkinator_ray.pipelines.index import (build_inverted_index,
                                                read_index)
    out = str(tmp_path / "idx")
    build_inverted_index(SF, out, num_parts=4)
    n_terms_full = read_index(out).count()

    # crash simulation: part 2 loses its marker and has a garbage file
    os.remove(os.path.join(out, "part-2._SUCCESS"))
    with open(os.path.join(out, "part-2.parquet"), "wb") as f:
        f.write(b"garbage")
    mtimes = {k: os.path.getmtime(os.path.join(out, f"part-{k}.parquet"))
              for k in (0, 1, 3)}

    m2 = build_inverted_index(SF, out, num_parts=4)
    assert m2["written"] == [2] and m2["skipped"] == [0, 1, 3]
    for k in (0, 1, 3):
        assert os.path.getmtime(
            os.path.join(out, f"part-{k}.parquet")) == mtimes[k]
    assert read_index(out).count() == n_terms_full

    m3 = build_inverted_index(SF, out, num_parts=4)
    assert m3["written"] == [] and m3["skipped"] == [0, 1, 2, 3]


def test_lookup_and_fingerprint_face(ray_session, tmp_path):
    from linkinator_ray.pipelines.index import (build_inverted_index,
                                                inverted_index,
                                                lookup_postings)
    out = str(tmp_path / "idx")
    build_inverted_index(SF, out, num_parts=4)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    expected = _expected_postings(docs)

    # point lookup returns exactly the terms' postings
    some = sorted(expected)[:3] + ["__not_a_token__"]
    hits = lookup_postings(out, some).to_pandas()
    assert list(hits["token"]) == sorted(some[:3])
    for tok, lst in zip(hits["token"], hits["postings"]):
        assert [int(x) for x in lst] == expected[tok]

    # fingerprint face == direct computation over expected postings
    k = 10
    rows = []
    for tok, lst in expected.items():
        a = np.asarray(lst, dtype=np.int64)
        rows.append((tok, len(lst), int(a.sum()), int(a.min()),
                     int(a.max()),
                     int(np.bitwise_xor.reduce(a))))
    want = pd.DataFrame(rows, columns=[
        "token", "doc_freq", "postings_sum", "postings_min",
        "postings_max", "postings_xor"]) \
        .sort_values(["doc_freq", "token"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    want["doc_freq"] = want["doc_freq"].astype("int64")
    got = inverted_index(SF, k=k, num_parts=4).to_pandas()
    pd.testing.assert_frame_equal(got, want)
