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


def read_events(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)




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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("int64") // 1_000_000
        win = (epoch // window_s) * window_s
        # sum in exact integer cents — float sums are order-dependent
        # across a distributed merge, integer sums are not
        g = pd.DataFrame({
            "event_type": batch["event_type"], "window_start": win,
            "cents": np.floor(batch["value"] * 100).astype("int64"),
        }).groupby(["event_type", "window_start"], as_index=False).agg(
            n=("cents", "size"), total=("cents", "sum"))
        return g

    partials = read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=16384)
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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("int64") // 1_000_000
        frames = []
        for h in range(hops):
            start = ((epoch - h * step_s) // step_s) * step_s
            frames.append(pd.DataFrame({
                "event_type": batch["event_type"], "window_start": start}))
        g = pd.concat(frames, ignore_index=True)
        g["n"] = 1
        return g.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"))

    partials = read_events(sf_dir, ["ts", "event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=16384)
    from linkinator_ray.pipelines.hashagg import hash_aggregate
    return hash_aggregate(partials, ["event_type", "window_start"],
                          {"n_events": ("n", "sum")})
