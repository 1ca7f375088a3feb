"""Connected components (large-star/small-star) over the duplicate graph.

The engine must find TRANSITIVE clusters — A~B and B~C put A,B,C in one
component even though A and C share nothing — and converge on
adversarial shapes (long chains) where naive min-propagation needs
O(n) rounds.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _components_of(edges_df: pd.DataFrame) -> dict[int, int]:
    """Single-machine union-find ground truth for an (u, v) edge list."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(edges_df["u"], edges_df["v"]):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in list(parent)}


def _run_cc(edges_df: pd.DataFrame) -> pd.DataFrame:
    import ray.data as rd
    from linkinator_ray.pipelines.components import connected_components
    ds = rd.from_pandas(edges_df.astype("int64")).repartition(4)
    # driver_threshold=0 forces the DISTRIBUTED star rounds — the
    # driver union-find fallback would make these tests vacuous
    return connected_components(ds, driver_threshold=0).to_pandas()


def _check(edges_df: pd.DataFrame):
    got = _run_cc(edges_df)
    want = _components_of(edges_df)
    # stars map every non-root node to its component min
    got_map = dict(zip(got["u"].astype(int), got["v"].astype(int)))
    want_nonroot = {n: r for n, r in want.items() if n != r}
    assert got_map == want_nonroot


def test_cc_long_chain(ray_session):
    """200-node path, edges shuffled: one component rooted at 0 —
    the shape that forces the O(log n) star alternation to earn it."""
    rng = np.random.RandomState(7)
    e = pd.DataFrame({"u": np.arange(0, 199), "v": np.arange(1, 200)})
    e = e.sample(frac=1.0, random_state=rng).reset_index(drop=True)
    # randomize direction too
    flip = rng.rand(len(e)) < 0.5
    u = np.where(flip, e["v"], e["u"])
    v = np.where(flip, e["u"], e["v"])
    _check(pd.DataFrame({"u": u, "v": v}))


def test_cc_mixed_shapes(ray_session):
    """Two stars bridged by one edge + a triangle + duplicate and
    self-referential-free edges."""
    edges = [(10, i) for i in range(1, 6)] + \
            [(20, i) for i in range(21, 26)] + \
            [(5, 21),          # bridge: both stars become one component
             (30, 31), (31, 32), (32, 30),   # triangle, separate
             (10, 1), (1, 10)]               # duplicates both ways
    _check(pd.DataFrame(edges, columns=["u", "v"]))


def test_dedup_components_planted(ray_session, tmp_path):
    """A~B by chunk_a, B~C by chunk_c (A and C share NOTHING): all
    three land in component min(A,B,C); an unrelated doc stays a
    singleton."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.components import dedup_components
    chunk = {k: " ".join(f"{k}{i}" for i in range(16)) for k in "abcdx"}
    rows = [
        {"doc_id": 4, "text": chunk["a"] + " " + chunk["b"]},   # A
        {"doc_id": 7, "text": chunk["a"] + " " + chunk["c"]},   # B
        {"doc_id": 9, "text": chunk["c"] + " " + chunk["d"]},   # C
        {"doc_id": 2, "text": chunk["x"]},                       # singleton
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = dedup_components(str(out)).to_pandas().set_index("doc_id")
    assert df.loc[4, "component_id"] == 4
    assert df.loc[7, "component_id"] == 4
    assert df.loc[9, "component_id"] == 4   # transitive through B
    assert df.loc[2, "component_id"] == 2
    assert df.loc[4, "csize"] == 3
    assert df.loc[2, "csize"] == 1


def test_dedup_components_all_unique(ray_session, tmp_path):
    """No shared chunks at all: the empty-graph path labels every doc
    a singleton."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.components import dedup_components
    rows = [{"doc_id": i,
             "text": " ".join(f"t{i}_{j}" for j in range(20))}
            for i in range(5)]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = dedup_components(str(out)).to_pandas()
    assert (df["component_id"] == df["doc_id"]).all()
    assert (df["csize"] == 1).all()
    assert len(df) == 5


def test_driver_fallback_equals_distributed(ray_session):
    """The hybrid's two paths must be indistinguishable: the same edge
    list through the driver union-find (under threshold) and through
    the star rounds (threshold=0) yields the identical star forest."""
    import ray.data as rd

    from linkinator_ray.pipelines.components import connected_components
    rng = np.random.default_rng(7)
    edges = pd.DataFrame({
        "u": rng.integers(0, 300, 500).astype("int64"),
        "v": rng.integers(0, 300, 500).astype("int64"),
    })
    edges = edges[edges["u"] != edges["v"]]
    ds = rd.from_pandas(edges).repartition(4)
    fast = connected_components(ds).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    ds2 = rd.from_pandas(edges).repartition(4)
    dist = connected_components(ds2, driver_threshold=0).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    assert fast.equals(dist)
