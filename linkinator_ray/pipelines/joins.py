"""Join patterns over the star-schema testdata (ray_guide 'Joins and
lookups'): broadcast small-side enrichment and the hash-partitioned
Dataset join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


class _SegmentLookup:
    """Broadcast dimension lookup: the customer→segment map rides the
    object store once (ray.put on the driver, ray.get in __init__ —
    once per actor, never per batch)."""

    def __init__(self, seg_ref):
        try:
            import ray
            self.seg = ray.get(seg_ref) if not isinstance(seg_ref, dict) else seg_ref
        except Exception:
            self.seg = seg_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        seg = batch["user_id"].map(self.seg).fillna("UNKNOWN")
        out = pd.DataFrame({
            "mktsegment": seg,
            "cents": np.floor(batch["value"].to_numpy() * 100).astype("int64"),
        })
        return out.groupby("mktsegment", as_index=False).agg(
            n=("cents", "size"), total=("cents", "sum"))


def events_by_segment(sf_dir: str):
    """Per-market-segment event count + value: broadcast join (customer
    is the small side — a shuffle join would move every event row for a
    150-row dimension table)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    seg_map = dict(zip(customer["c_custkey"].to_pylist(),
                       customer["c_mktsegment"].to_pylist()))
    try:
        import ray
        seg_ref = ray.put(seg_map) if ray.is_initialized() else seg_map
    except Exception:
        seg_ref = seg_map
    partials = _read(sf_dir, "events", ["user_id", "value"]).map_batches(
        _SegmentLookup, batch_format="pandas", batch_size=16384,
        concurrency=(1, 4), fn_constructor_kwargs={"seg_ref": seg_ref})
    from linkinator_ray.pipelines.dedup import _fanout
    return _fanout(partials).groupby("mktsegment").aggregate(
        Sum("n", alias_name="n_events"), Sum("total", alias_name="sum_cents"))


def events_join_customer(sf_dir: str, limit_users: int = 50):
    """Row-level enrichment via the hash-partitioned Dataset join (the
    both-sides-large pattern). Output: (event_id, c_mktsegment)."""
    events = _read(sf_dir, "events", ["event_id", "user_id"]) \
        .filter(expr=f"user_id < {limit_users}")
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = events.join(customer, join_type="inner", num_partitions=8,
                         on=("user_id",), right_on=("c_custkey",))
    return joined.select_columns(["event_id", "c_mktsegment"])
