"""Join patterns over the star-schema testdata (ray_guide 'Joins and
lookups'): broadcast small-side enrichment and the hash-partitioned
Dataset join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from linkinator_ray.pipelines.hashagg import \
    auto_concurrency as _autoconc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


class _SegmentLookup:
    """Broadcast dimension lookup: the customer→(key array, segment
    array) pair rides the object store once (ray.put on the driver,
    ray.get in __init__ — once per actor, never per batch). The probe
    is pure Arrow: ``pc.index_in`` against the broadcast key array +
    ``pc.take`` of the segment array (unmatched keys take the appended
    UNKNOWN slot) — no pandas conversion, no per-row dict probes."""

    def __init__(self, seg_ref):
        try:
            import ray
            keys, vals = ray.get(seg_ref) \
                if not isinstance(seg_ref, tuple) else seg_ref
        except Exception:
            keys, vals = seg_ref
        import pyarrow as pa
        self.keys = pa.array(keys, pa.int64())
        self.vals = pa.array(list(vals) + ["UNKNOWN"], pa.string())
        self.unknown_idx = len(keys)

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        idx = pc.fill_null(
            pc.index_in(batch["user_id"], value_set=self.keys),
            self.unknown_idx)
        seg = pc.take(self.vals, idx)
        cents = pc.cast(pc.floor(pc.multiply(
            batch["value"], pa.scalar(100.0))), pa.int64())
        t = pa.table({"mktsegment": seg, "cents": cents})
        agg = t.group_by("mktsegment", use_threads=False).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return pa.table({"mktsegment": agg["mktsegment"],
                         "n": agg["count_all"],
                         "total": agg["cents_sum"]})


def events_by_segment(sf_dir: str):
    """Per-market-segment event count + value: broadcast join (customer
    is the small side — a shuffle join would move every event row for a
    150-row dimension table)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    seg_pair = (customer["c_custkey"].to_pylist(),
                customer["c_mktsegment"].to_pylist())
    try:
        import ray
        seg_ref = ray.put(seg_pair) if ray.is_initialized() else seg_pair
    except Exception:
        seg_ref = seg_pair
    partials = _read(sf_dir, "events", ["user_id", "value"]).map_batches(
        _SegmentLookup, batch_format="pyarrow", batch_size=16384,
        concurrency=_autoconc(), fn_constructor_kwargs={"seg_ref": seg_ref})
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


def events_asof_order(sf_dir: str):
    """As-of join (a custom operator Ray Data lacks): each event picks
    the customer's LATEST order at-or-before the event time — the
    classic point-in-time feature lookup of a training pipeline.

    Ray-Data-first shape: tag and UNION both sides into one Dataset,
    ONE hash partition on the key, then a per-partition vectorized
    ``pd.merge_asof`` (C-speed backward search). Partitioning
    assumption: all rows of one key land in one partition (guaranteed
    by the exchange); per-partition data = that key range's events +
    orders, so partitions stay bounded however large the corpus is.
    Orders are deduplicated per (custkey, orderdate) to the max
    o_orderkey INSIDE the partition (co-located), making the as-of
    winner deterministic — mirrored by the oracle's max_by CTE.

    Output: (event_id, user_id, ts_us, o_orderkey, total_cents) for
    events with at least one prior order (inner as-of).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from linkinator_ray.pipelines.hashagg import hash_partition_apply

    def tag_events(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("user_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "kind": pa.array(np.zeros(n, np.int8)),
            "event_id": batch.column("event_id"),
            "o_orderkey": pa.array(np.zeros(n, np.int64)),
            "total_cents": pa.array(np.zeros(n, np.int64)),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cents = pc.cast(pc.floor(pc.multiply(
            batch.column("o_totalprice"), pa.scalar(100.0))), pa.int64())
        return pa.table({
            "key": batch.column("o_custkey"),
            "ts_us": pc.cast(batch.column("o_orderdate"), pa.int64()),
            "kind": pa.array(np.ones(n, np.int8)),
            "event_id": pa.array(np.zeros(n, np.int64)),
            "o_orderkey": batch.column("o_orderkey"),
            "total_cents": cents,
        })

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"]) \
        .map_batches(tag_events, batch_format="pyarrow", batch_size=16384)
    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(tag_orders, batch_format="pyarrow", batch_size=16384)

    def asof_part(part: pd.DataFrame) -> pd.DataFrame:
        ev_p = part[part["kind"] == 0]
        od_p = part[part["kind"] == 1]
        if not len(ev_p) or not len(od_p):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "ts_us": pd.Series([], dtype="int64"),
                                 "o_orderkey": pd.Series([], dtype="int64"),
                                 "total_cents": pd.Series([], dtype="int64")})
        # deterministic tie-break: per (key, orderdate) keep max orderkey
        od_p = od_p.sort_values(["key", "ts_us", "o_orderkey"]) \
            .groupby(["key", "ts_us"], as_index=False).last()
        m = pd.merge_asof(
            ev_p[["ts_us", "key", "event_id"]].sort_values(
                "ts_us", kind="mergesort"),
            od_p[["ts_us", "key", "o_orderkey", "total_cents"]].sort_values(
                "ts_us", kind="mergesort"),
            on="ts_us", by="key", direction="backward")
        m = m.dropna(subset=["o_orderkey"])  # inner as-of
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["key"].astype("int64"),
            "ts_us": m["ts_us"].astype("int64"),
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "total_cents": m["total_cents"].astype("int64"),
        })

    return hash_partition_apply(ev.union(od), "key", asof_part)
