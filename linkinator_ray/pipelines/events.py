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


def sessionize(sf_dir: str, gap_s: int = 1800,
               num_parts: int | None = None):
    """Per-user session count + max session length, 30-min inactivity
    gap.

    Shape: hash-partition ONCE on user_id (all of one user's events
    co-locate), then one segmented numpy kernel per PARTITION — sort by
    (user, ts), boundary mask, ``reduceat`` reductions over session and
    user segments. No per-user Python dispatch: the old
    groupby(user).map_groups built a 1-row frame per user (10^8 pandas
    constructions at 10^8 users); this pays the vectorized cost P
    times. Ties in ts are order-invariant (equal ts ⇒ gap 0 ⇒ same
    session), so the result is independent of block order."""

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_sessions": pd.Series(dtype="int64"),
                "max_session_events": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64")})
        uid = df["user_id"].to_numpy(dtype=np.int64)
        epoch = df["ts"].to_numpy(dtype="datetime64[us]") \
            .astype(np.int64) // 1_000_000
        order = np.lexsort((epoch, uid))
        u, e = uid[order], epoch[order]
        user_start = np.empty(n, dtype=bool)
        user_start[0] = True
        user_start[1:] = u[1:] != u[:-1]
        sess_start = user_start.copy()
        sess_start[1:] |= (e[1:] - e[:-1]) > gap_s
        sess_id = np.cumsum(sess_start) - 1            # 0..S-1 per row
        sess_sizes = np.bincount(sess_id)              # S entries
        urows = np.flatnonzero(user_start)             # first row per user
        n_events = np.diff(np.append(urows, n))
        first_sess = sess_id[urows]                    # user's first session
        n_sessions = np.diff(np.append(first_sess, sess_id[-1] + 1))
        max_sess = np.maximum.reduceat(sess_sizes, first_sess)
        return pd.DataFrame({
            "user_id": u[urows],
            "n_sessions": n_sessions.astype(np.int64),
            "max_session_events": max_sess.astype(np.int64),
            "n_events": n_events.astype(np.int64),
        })

    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    return hash_partition_apply(
        _fanout(read_events(sf_dir, ["ts", "user_id"])), "user_id",
        per_part, num_parts=num_parts)  # unordered


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
