"""Link-graph analytics: degree stats and exact-integer PageRank.

PageRank is differential-tested: the distributed Ray pipeline (per-
iteration hash join + combiner exchange) must reproduce the single-
machine integer recurrence bit-for-bit — floor-division fixed point
makes the result order-independent, which is what the DuckDB oracle
relies on too.
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _edges(sf_dir: str) -> list[tuple[int, int]]:
    from linkinator_ray.pipelines.graph import _doc_ids, targets_of
    ids = _doc_ids(sf_dir)
    n = len(ids)
    out = set()
    for d in ids:
        d = int(d)
        if d % 13 == 7:
            continue
        for t in targets_of(d, n):
            out.add((d, t))
    return sorted(out)


def test_degree_stats_matches_ground_truth(ray_session):
    from linkinator_ray.pipelines.linkgraph import degree_stats
    edges = _edges(SF)
    out_t: dict[int, int] = {}
    in_t: dict[int, int] = {}
    for u, v in edges:
        out_t[u] = out_t.get(u, 0) + 1
        in_t[v] = in_t.get(v, 0) + 1
    got = degree_stats(SF).to_pandas().set_index("doc_id").sort_index()
    nodes = sorted(set(out_t) | set(in_t))
    assert list(got.index) == nodes
    for d in nodes:
        assert got.loc[d, "out_deg"] == out_t.get(d, 0)
        assert got.loc[d, "in_deg"] == in_t.get(d, 0)
    # missing docs (d % 13 == 7) are link TARGETS only: in-links, no outs
    missing = [d for d in nodes if d % 13 == 7]
    assert missing and all(got.loc[d, "out_deg"] == 0 for d in missing)


def test_pagerank_reference_star():
    # hub <- spokes: the hub's rank must dominate every spoke's
    from linkinator_ray.pipelines.linkgraph import pagerank_reference
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    # the 0<->1 cycle oscillates at low iteration counts; 40 is well
    # past convergence of the damped recurrence
    pr = pagerank_reference(edges, iters=40)
    assert pr[0] > pr[1] > pr[2] == pr[3] == pr[4] == pr[5]
    # total mass bounded: every value positive and below |V| * scale
    assert all(0 < v < 6 * 10 ** 12 for v in pr.values())


def test_pagerank_distributed_equals_reference(ray_session):
    from linkinator_ray.pipelines.linkgraph import pagerank, \
        pagerank_reference
    expect = pagerank_reference(_edges(SF), iters=4)
    got = pagerank(SF, iters=4).to_pandas()
    assert len(got) == len(expect)
    got = got.set_index("doc_id")["pr"]
    for d, v in expect.items():
        assert int(got.loc[d]) == v, f"doc {d}: {got.loc[d]} != {v}"


def test_pagerank_actors_equals_dataset(ray_session):
    """The actor-partitioned variant (edges scattered once, only rank
    contributions on the wire per iteration) must be BIT-IDENTICAL to
    the Dataset version — same integer recurrence, different physical
    plan. Exercised at two shard counts (partition-invariance)."""
    from linkinator_ray.pipelines.linkgraph import pagerank, \
        pagerank_actors
    want = pagerank(SF, iters=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for shards in (2, 5):
        got = pagerank_actors(SF, iters=4, num_shards=shards).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.values.tolist() == want.values.tolist(), shards


def test_guard_contrib_detects_wraps():
    """Both overflow modes fail loudly: a wrapped-negative SUM partial
    and a contrib too large for the damping multiply."""
    import numpy as np
    import pytest as _pytest
    from linkinator_ray.pipelines.linkgraph import _guard_contrib
    _guard_contrib(np.array([0, 10**15], dtype=np.int64), 85)  # fine
    with _pytest.raises(OverflowError, match="wrapped"):
        _guard_contrib(np.array([5, -3], dtype=np.int64), 85)
    with _pytest.raises(OverflowError, match="damping"):
        _guard_contrib(np.array([(2**63 - 1) // 85 + 1], dtype=np.int64),
                       85)


def test_pagerank_iteration_changes_ranks(ray_session):
    # guards against a silently-cached/unmaterialized loop: iters=0
    # is the uniform init, iters=4 must differ
    from linkinator_ray.pipelines.linkgraph import pagerank_reference
    edges = _edges(SF)
    pr0 = pagerank_reference(edges, iters=0)
    pr4 = pagerank_reference(edges, iters=4)
    assert len(set(pr0.values())) == 1
    assert len(set(pr4.values())) > 10
