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
    """Repartition to ~CPU count before an all-to-all — shared with
    dedup.py so the skip-when-already-parallel logic (multi-file reads
    on a real cluster need no extra exchange) cannot drift."""
    from linkinator_ray.pipelines.dedup import _fanout as _dedup_fanout
    return _dedup_fanout(ds)

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


def _interval_join_kernel(df: pd.DataFrame, left_type: str,
                          right_type: str, win_us: int) -> pd.DataFrame:
    """The per-partition band-join kernel (module-level so property
    tests can drive it directly on random frames): all (left, right)
    pairs of the same user with 0 < right.ts - left.ts <= win_us."""

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({
            "l_event_id": pd.Series(dtype="int64"),
            "r_event_id": pd.Series(dtype="int64"),
            "gap_us": pd.Series(dtype="int64")})

    if len(df):
        # self-contained: the crawl-scale caller prunes at the scan,
        # but the kernel must not treat a stray third type as a right
        # row (hypothesis-caught contract gap)
        df = df[df["event_type"].isin((left_type, right_type))]
    if not len(df):
        return empty_out()
    uid = df["user_id"].to_numpy(dtype=np.int64)
    ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    eid = df["event_id"].to_numpy(dtype=np.int64)
    is_l = (df["event_type"] == left_type).to_numpy()
    if not is_l.any() or is_l.all():
        return empty_out()
    uniq, code = np.unique(uid, return_inverse=True)
    mn = int(ts.min())
    span = int(ts.max()) - mn + 2
    if len(uniq) > (2**63 - 1) // span:
        raise RuntimeError(
            f"interval_join composite key overflow: {len(uniq)} users x "
            f"{span}us span in one partition - raise num_parts")
    lmask = is_l
    lkey = code[lmask] * span + (ts[lmask] - mn)
    lts, lid = ts[lmask], eid[lmask]
    order = np.argsort(lkey, kind="stable")
    lkey, lts, lid = lkey[order], lts[order], lid[order]
    rmask = ~is_l
    rcode, rts, rid = code[rmask], ts[rmask], eid[rmask]
    # left ts in [rts - win, rts): inclusive lower ('left' at the
    # clamped offset), strict upper ('left' at rts excludes equality)
    lo = np.searchsorted(
        lkey, rcode * span + np.maximum(rts - win_us - mn, 0), "left")
    hi = np.searchsorted(lkey, rcode * span + (rts - mn), "left")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return empty_out()
    ridx = np.repeat(np.arange(len(rts)), cnt)
    base = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    lidx = np.repeat(lo, cnt) + (np.arange(total) - np.repeat(base, cnt))
    return pd.DataFrame({
        "l_event_id": lid[lidx],
        "r_event_id": rid[ridx],
        "gap_us": rts[ridx] - lts[lidx]})


def interval_join(sf_dir: str, left_type: str = "click",
                  right_type: str = "purchase", window_s: int = 1800,
                  num_parts: int | None = None):
    """Interval (band) join the Dataset API lacks: every (left, right)
    event pair of the SAME user where the right event falls within
    ``window_s`` seconds strictly AFTER the left one — the attribution
    shape ("purchases within 30 min of a click"), all matching pairs,
    not just the nearest (that one is ``joins.events_asof_order``).

    Shape: row-filter to the two event types at the scan, ONE hash
    exchange on user_id co-locates both sides (same table, same read —
    the partition carries its lefts and rights together), then a fully
    vectorized per-partition kernel: dense-factorize users, encode
    (user, ts) as one monotonic int64 composite key, two
    ``np.searchsorted`` calls give each right row its left candidate
    range, and the pair list materializes as one repeat/arange gather.
    No per-user Python dispatch; nothing leaves a partition except
    result pairs.

    Partitioning assumption (the composite key must fit int64):
    distinct users per partition × partition ts-span(us) < 2^63 —
    ~290k active users per partition at a 10-year span. Guarded with a
    loud error naming the fix (raise ``num_parts``); hash partitioning
    over enough partitions restores it at any corpus size.
    """
    if left_type == right_type:
        raise ValueError("left_type and right_type must differ")
    win_us = int(window_s) * 1_000_000
    types = pa.array([left_type, right_type])

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["event_type"], value_set=types))

    pruned = _fanout(read_events(
        sf_dir, ["event_id", "ts", "user_id", "event_type"])).map_batches(
        prune, batch_format="pyarrow", batch_size=65536)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return _interval_join_kernel(df, left_type, right_type, win_us)

    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    return hash_partition_apply(pruned, "user_id", per_part,
                                num_parts=num_parts)  # unordered


def user_running_stats(sf_dir: str, mark_type: str = "purchase",
                       num_parts: int | None = None):
    """Per-key SQL window functions (row_number / lag / running sum)
    the Dataset API lacks: for every event, its 1-based sequence
    number within the user's (ts, event_id)-ordered history, the gap
    to the previous event in microseconds (-1 for the first), and the
    running count of ``mark_type`` events up to and including it.

    Shape: ONE hash exchange on user_id, then one segmented numpy
    kernel per PARTITION (lexsort by (user, ts, event_id), user-change
    boundary mask, arange/cumsum rebased at segment starts) — the
    funnel/sessionize pattern; output is exactly input-sized, all
    int64, no per-user Python dispatch. The (ts, event_id) tiebreak
    makes every column deterministic under any block order."""

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return _running_stats_kernel(df, mark_type)

    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    return hash_partition_apply(
        _fanout(read_events(sf_dir,
                            ["event_id", "ts", "user_id", "event_type"])),
        "user_id", per_part, num_parts=num_parts)  # unordered


def _running_stats_kernel(df: pd.DataFrame, mark_type: str) -> pd.DataFrame:
    """The per-partition window-function kernel (module-level so
    property tests can drive it directly on random frames)."""
    n = len(df)
    if n == 0:
        return pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "row_num": pd.Series(dtype="int64"),
            "gap_us": pd.Series(dtype="int64"),
            "cum_marks": pd.Series(dtype="int64")})
    uid = df["user_id"].to_numpy(dtype=np.int64)
    ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    eid = df["event_id"].to_numpy(dtype=np.int64)
    flag = (df["event_type"] == mark_type).to_numpy().astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    u, e, i, m = uid[order], ts[order], eid[order], flag[order]
    start = np.empty(n, dtype=bool)
    start[0] = True
    start[1:] = u[1:] != u[:-1]
    seg_first = np.flatnonzero(start)          # first row per user
    seg_id = np.cumsum(start) - 1              # 0..U-1 per row
    row_num = np.arange(n, dtype=np.int64) - seg_first[seg_id] + 1
    gap = np.empty(n, dtype=np.int64)
    gap[0] = -1
    gap[1:] = e[1:] - e[:-1]
    gap[start] = -1
    c = np.cumsum(m)
    cum = c - (c[seg_first] - m[seg_first])[seg_id]
    return pd.DataFrame({"event_id": i, "row_num": row_num,
                         "gap_us": gap, "cum_marks": cum})


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


def daily_active_users(sf_dir: str, window_s: int = 86400):
    """EXACT distinct-users-per-window (the DAU/WAU primitive) plus
    event counts — count-distinct done scale-safe: the per-batch
    combiner collapses each batch to its DISTINCT (window, user) pairs
    (with per-pair event counts), ONE pair exchange merges them
    globally, and a tiny per-window count finishes. The pair table —
    bounded by active (user, window) combinations — crosses the
    network once; raw events never do.

    Output (window_start, n_users, n_events), all exact int64.
    """
    from linkinator_ray.pipelines.hashagg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_s(batch["ts"])
        win = (epoch // window_s) * window_s
        user = np.asarray(
            batch["user_id"].to_numpy(zero_copy_only=False), np.int64)
        t = pa.table({"window_start": pa.array(win),
                      "user_id": pa.array(user)})
        agg = t.group_by(["window_start", "user_id"],
                         use_threads=False).aggregate([([], "count_all")])
        return pa.table({"window_start": agg["window_start"],
                         "user_id": agg["user_id"],
                         "n": agg["count_all"]})

    pairs = hash_aggregate(
        _fanout(read_events(sf_dir, ["ts", "user_id"])).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["window_start", "user_id"], {"n_events": ("n", "sum")})

    # pairs are now GLOBALLY distinct — a per-batch window count + one
    # tiny window merge yields the exact distinct-user count
    def per_window(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("window_start", use_threads=False).aggregate(
            [([], "count_all"), ("n_events", "sum")])
        return pa.table({"window_start": agg["window_start"],
                         "n_users": agg["count_all"],
                         "n_events": agg["n_events_sum"]})

    return hash_aggregate(
        pairs.map_batches(per_window, batch_format="pyarrow"),
        "window_start",
        {"n_users": ("n_users", "sum"), "n_events": ("n_events", "sum")})


def retention_cohorts(sf_dir: str, window_s: int = 86400):
    """Cohort retention triangle: users grouped by their FIRST active
    window (the cohort); for each (cohort, day offset) the number of
    cohort members active that day.

    Shape: the DAU distinct-pair pass (combiner + ONE exchange), a
    per-user min-window aggregate (cohort assignment — one more
    combiner exchange over pairs, not events), ONE hash join pairing
    each distinct (user, window) with its user's cohort, and a final
    (cohort, offset) count — exact distinct users by construction
    because the pairs are already distinct. Four pair-sized exchanges
    total; the raw event stream is read once.

    Output (cohort_start, day_offset, n_users), all exact int64.
    """
    from linkinator_ray.pipelines.hashagg import hash_aggregate, hash_join

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_s(batch["ts"])
        win = (epoch // window_s) * window_s
        user = np.asarray(
            batch["user_id"].to_numpy(zero_copy_only=False), np.int64)
        t = pa.table({"user_id": pa.array(user),
                      "window_start": pa.array(win)})
        agg = t.group_by(["user_id", "window_start"],
                         use_threads=False).aggregate([([], "count_all")])
        return pa.table({"user_id": agg["user_id"],
                         "window_start": agg["window_start"]})

    # distinct (user, window) pairs; materialized — the cohort
    # aggregate AND the join both consume them (lineage would re-run
    # the events read + distinct pass per consumer)
    du = hash_aggregate(
        _fanout(read_events(sf_dir, ["ts", "user_id"])).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["user_id", "window_start"],
        {"n": ("window_start", "count")}).select_columns(
        ["user_id", "window_start"]).materialize()

    cohorts = hash_aggregate(du, "user_id",
                             {"cohort_start": ("window_start", "min")})
    joined = hash_join(du, cohorts, on="user_id", how="inner")

    def offsets(batch: pa.Table) -> pa.Table:
        win = np.asarray(
            batch["window_start"].to_numpy(zero_copy_only=False), np.int64)
        coh = np.asarray(
            batch["cohort_start"].to_numpy(zero_copy_only=False), np.int64)
        t = pa.table({"cohort_start": pa.array(coh),
                      "day_offset": pa.array((win - coh) // window_s)})
        agg = t.group_by(["cohort_start", "day_offset"],
                         use_threads=False).aggregate([([], "count_all")])
        return pa.table({"cohort_start": agg["cohort_start"],
                         "day_offset": agg["day_offset"],
                         "n": agg["count_all"]})

    return hash_aggregate(
        joined.map_batches(offsets, batch_format="pyarrow",
                           batch_size=65536),
        ["cohort_start", "day_offset"], {"n_users": ("n", "sum")})


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_events(sf_dir: str, types: tuple = EVENT_TYPES):
    """Wide per-user event-type counts — the pivot/crosstab operator
    (one column per event type, a fixed contract as in any pivot). Per
    batch, one C-speed arrow group_by produces (user, type, n) partials
    already exploded into the wide zero-padded layout; ONE combiner
    exchange (hashagg on user_id) sums them — rows moved ≤ distinct
    (user, type) pairs per batch, never raw events. Output is
    user-count-sized; no driver state beyond the return contract."""
    import pyarrow.compute as pc

    from linkinator_ray.pipelines.hashagg import hash_aggregate

    ds = read_events(sf_dir, ["user_id", "event_type"])
    zero = pa.scalar(0, pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["user_id", "event_type"],
                             use_threads=False).aggregate([([], "count_all")])
        n = pc.cast(agg.column("count_all"), pa.int64())
        cols = {"user_id": agg.column("user_id")}
        for t in types:
            cols[f"n_{t}"] = pc.if_else(
                pc.equal(agg.column("event_type"), t), n, zero)
        return pa.table(cols)

    part = _fanout(ds).map_batches(partial, batch_format="pyarrow")
    out = hash_aggregate(
        part, ["user_id"],
        {f"n_{t}": (f"n_{t}", "sum") for t in types})
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def daily_top_users(sf_dir: str, k: int = 3,
                    num_parts: int | None = None):
    """Per-day activity leaderboard — the windowed-aggregate × grouped
    top-k composition: (day, user) event counts via per-batch combiner
    + one hash exchange, then a SECOND day-keyed exchange finishes an
    exact rank with the (n DESC, user_id) total order and keeps rank <=
    k. Ties are deterministic (user_id breaks them), so the SQL
    row_number oracle hashes identically. Exchange volume: distinct
    (day, user) rows, then one row per (day, user) surviving the local
    cap — never raw events."""
    import pandas as pd

    from linkinator_ray.pipelines.hashagg import (hash_aggregate,
                                                  hash_partition_apply)

    ds = read_events(sf_dir, ["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        day = (_epoch_s(batch["ts"]) // 86400) * 86400
        t = pa.table({
            "day": pa.array(day),
            "user_id": batch["user_id"],
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))})
        return pa.TableGroupBy(t, ["day", "user_id"]).aggregate(
            [("n", "sum")]).rename_columns(["day", "user_id", "n"])

    counts = hash_aggregate(
        _fanout(ds).map_batches(partial, batch_format="pyarrow"),
        ["day", "user_id"], {"n": ("n", "sum")}, num_parts=num_parts)

    def topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["day", "n", "user_id"],
                            ascending=[True, False, True], kind="stable")
        rank = df.groupby("day", sort=False).cumcount() + 1
        out = df[rank <= k].copy()
        out["rank"] = rank[rank <= k].astype(np.int64)
        return out

    top = hash_partition_apply(counts, "day", topk, num_parts=num_parts)
    df = top.to_pandas().sort_values(["day", "rank"]).reset_index(drop=True)
    df["day"] = df["day"].astype(np.int64)
    df["n"] = df["n"].astype(np.int64)
    return pa.Table.from_pandas(df[["day", "rank", "user_id", "n"]],
                                preserve_index=False)
