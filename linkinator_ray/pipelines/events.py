"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (ray_guide 'Streaming-shaped
workloads'); windows are expressed as key-partitioned groupbys with
in-group pandas over ts-sorted rows. Ordering assumption: correctness
requires only per-key ordering, which map_groups + an in-group sort
provides regardless of block order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read_events(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _epoch_s(ts_col) -> np.ndarray:
    """timestamp[us] column → epoch seconds (int64, zero-copy cast)."""
    import pyarrow.compute as pc
    us = pc.cast(ts_col, pa.int64()).to_numpy(zero_copy_only=False)
    return np.asarray(us, dtype=np.int64) // 1_000_000




def _fanout(ds):
    """Repartition to ~CPU count before an all-to-all: Ray Data sizes its
    shuffle off the input block count, and a single-file read gives one
    block -> a serial shuffle (3x slower measured at sf0.1)."""
    try:
        import ray
        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n = 8
    return ds.repartition(min(32, max(4, n)))

def tumbling_window(sf_dir: str, window_s: int = 3600):
    """Per (event_type, window) count + sum(value): partial aggregation
    per batch, then the two-level hashagg merge (the window key space is
    thousands of groups — Ray's aggregate pays ~0.2 ms per group)."""

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_s(batch["ts"])
        win = (epoch // window_s) * window_s
        # sum in exact integer cents — float sums are order-dependent
        # across a distributed merge, integer sums are not
        cents = np.floor(np.asarray(
            batch["value"].to_numpy(zero_copy_only=False)) * 100) \
            .astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "window_start": pa.array(win),
                      "cents": pa.array(cents)})
        agg = t.group_by(["event_type", "window_start"],
                         use_threads=False).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return pa.table({"event_type": agg.column("event_type"),
                         "window_start": agg.column("window_start"),
                         "n": agg.column("count_all"),
                         "total": agg.column("cents_sum")})

    partials = read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=16384)
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    out = hash_aggregate(partials, ["event_type", "window_start"],
                         {"n_events": ("n", "sum"),
                          "sum_cents": ("total", "sum")})
    return out  # unordered; comparators sort


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Per-user session count + max session length, 30-min inactivity
    gap. Per-user map_groups over ts-sorted events (in-group sort makes
    the result independent of block order)."""

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        epoch = g["ts"].astype("int64") // 1_000_000
        gaps = epoch.diff().fillna(0)
        new_session = (gaps > gap_s).cumsum()
        sizes = new_session.value_counts()
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": [int(new_session.nunique())],
            "max_session_events": [int(sizes.max())],
            "n_events": [len(g)],
        })

    return _fanout(read_events(sf_dir, ["ts", "user_id"])).groupby("user_id").map_groups(
        per_user, batch_format="pandas")  # unordered


def sliding_window(sf_dir: str, window_s: int = 7200, step_s: int = 3600):
    """Per (event_type, window) counts for overlapping windows
    (window_s span, step_s hop): each event contributes to
    window_s/step_s windows — emitted fan-out in the partial kernel,
    merged by the two-level hashagg exchange."""
    hops = window_s // step_s

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_s(batch["ts"])
        etype = batch["event_type"]
        hop_tables = [
            pa.table({"event_type": etype,
                      "window_start": pa.array(
                          ((epoch - h * step_s) // step_s) * step_s)})
            for h in range(hops)]
        agg = pa.concat_tables(hop_tables).group_by(
            ["event_type", "window_start"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"event_type": agg.column("event_type"),
                         "window_start": agg.column("window_start"),
                         "n": agg.column("count_all")})

    partials = read_events(sf_dir, ["ts", "event_type"]).map_batches(
        partial, batch_format="pyarrow", batch_size=16384)
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    return hash_aggregate(partials, ["event_type", "window_start"],
                          {"n_events": ("n", "sum")})


def funnel(sf_dir: str,
           stages: tuple[str, ...] = ("view", "click", "purchase")):
    """Multi-stage funnel analysis — how many users completed stage k
    in ORDER (greedy earliest-completion semantics: t_k = the earliest
    stage-k event strictly after t_{k-1}).

    Shape: events row-filter at the parquet read to the funnel's event
    types + 3 columns, hash-partition ONCE on user_id (all of one
    user's events co-locate), and each partition runs the whole
    per-user greedy chain vectorized (one groupby-min per stage) and
    emits ONE count row per stage — the driver sums P×stages tiny
    rows. No per-user data ever leaves its partition.

    Output: (stage:int64, stage_name, n_users), stage 1-indexed.
    """
    import pyarrow.dataset as pads

    from linkinator_ray.pipelines.hashagg import (hash_aggregate,
                                                  hash_partition_apply)

    ev = read_events(sf_dir, ["user_id", "ts", "event_type"])
    types = pa.array(list(stages))

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["event_type"], value_set=types))

    pruned = ev.map_batches(prune, batch_format="pyarrow", batch_size=65536)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        prev: pd.Series | None = None
        for k, stage in enumerate(stages):
            sub = df[df["event_type"] == stage]
            if prev is not None:
                t_prev = sub["user_id"].map(prev)
                sub = sub[t_prev.notna() & (sub["ts"] > t_prev)]
            cur = sub.groupby("user_id")["ts"].min()
            counts.append(len(cur))
            prev = cur
        return pd.DataFrame({
            "stage": np.arange(1, len(stages) + 1, dtype=np.int64),
            "stage_name": list(stages),
            "n": np.asarray(counts, dtype=np.int64),
        })

    partials = hash_partition_apply(pruned, "user_id", per_part)
    return hash_aggregate(partials, ["stage", "stage_name"],
                          {"n_users": ("n", "sum")})
