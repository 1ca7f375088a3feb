"""Single-pass table profiling — the DESCRIBE/SUMMARIZE engine utility.

One row per column: non-null count, null count, exact distinct count,
and a typed int64 (lo, hi) range. Everything is schema-driven (the
kernels read the Arrow schema, no per-table code) and exact-integer so
the DuckDB oracle reproduces every cell:

- integers            -> lo/hi the values themselves
- timestamps          -> lo/hi in epoch microseconds
- doubles             -> lo/hi = floor(x*100) cents (floor is monotonic,
                         so floor(min)*.. == min(floor); the same
                         convention as tumbling_window's value sums)
- strings             -> lo/hi = min/max UTF-8 BYTE length (octet_length
                         — collation-free, portable across engines)

Distinct counts are over the same canonical encoding (doubles count
distinct CENTS — documented, exact, portable; raw-float distinct is not
portable across engines). NULLs never count toward distinct or lo/hi.

Scale shape: stats reduce each batch to one row PER COLUMN (merged by
one tiny hash aggregate); distinct routes per-batch-LOCAL-unique
(col, canon) pairs through one hash exchange — wire volume is bounded
by sum of per-column cardinalities, never corpus size. At 100 TB the
exact-distinct exchange for unbounded-cardinality columns is the knob
to swap: text.hll_distinct_tokens shows the mergeable-HLL register
variant (±6.5%, zero value shuffle); this module keeps the exact path
because profiling is usually run per-partition / per-shard anyway.

Deliberate two-scan design: stats and distinct are separate pipelines,
so the source is read twice. The one-scan alternative (a union-schema
combined partial, materialized, split downstream) trades the second
sequential read for holding every distinct (col, canon) pair in the
object store BEFORE the exchange needs it — ~table-sized residency for
key-like columns, a spill storm at 100 TB. Two cheap scans beat one
scan plus a table-sized materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _check_supported(schema: "pa.Schema") -> None:
    """Fail fast, naming the column, instead of an opaque Arrow kernel
    error mid-pipeline."""
    for field in schema:
        t = field.type
        ok = (pa.types.is_integer(t) or pa.types.is_timestamp(t)
              or pa.types.is_floating(t) or pa.types.is_boolean(t)
              or pa.types.is_date32(t) or pa.types.is_string(t)
              or pa.types.is_large_string(t))
        if not ok:
            raise NotImplementedError(
                f"profile_table: column {field.name!r} has unsupported "
                f"type {t} (supported: int/bool/date32/timestamp/float/"
                f"string)")


def _encode_int64(col, typ):
    """Typed int64 encoding for lo/hi and distinct canonicalization;
    None for strings/binary (they range over byte length instead)."""
    import pyarrow.compute as pc
    if pa.types.is_boolean(typ):
        return pc.cast(col, pa.int64())  # 0/1
    if pa.types.is_date32(typ):
        # no direct date32->int64 cast kernel; go through int32 days
        return pc.cast(pc.cast(col, pa.int32()), pa.int64())
    if pa.types.is_integer(typ):
        return pc.cast(col, pa.int64())
    if pa.types.is_timestamp(typ):
        return pc.cast(col, pa.int64())  # epoch us
    if pa.types.is_floating(typ):
        f = pc.cast(col, pa.float64())
        # NaN profiles as NULL (mirrored by the SQL generator's CASE
        # WHEN isnan) — floor(NaN) cannot encode to int64
        f = pc.if_else(pc.is_nan(f), pa.scalar(None, pa.float64()), f)
        return pc.cast(pc.floor(pc.multiply(f, pa.scalar(100.0))),
                       pa.int64())
    return None


def profile_table(sf_dir: str, table: str = "lineitem",
                  num_parts: int | None = None):
    """Profile every column of ``{sf_dir}/{table}.parquet`` in one
    streaming pass + two tiny exchanges. Returns a pandas DataFrame
    (one row per column — driver-sized by construction):
    (col, n, nulls, n_distinct, lo, hi), all int64."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from linkinator_ray.pipelines.hashagg import hash_aggregate

    _check_supported(pq.read_schema(f"{sf_dir}/{table}.parquet"))
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet")

    def partial_stats(batch: pa.Table) -> pa.Table:
        cols, ns, nulls, los, his = [], [], [], [], []
        for name in batch.column_names:
            col = batch.column(name).combine_chunks()
            typ = batch.schema.field(name).type
            enc = _encode_int64(col, typ)
            rng = enc if enc is not None else pc.binary_length(col)
            mm = pc.min_max(rng)
            cols.append(name)
            # null count off the ENCODED array: float NaN profiles as
            # NULL, and binary_length/int encodings preserve nulls
            ns.append(len(col) - rng.null_count)
            nulls.append(rng.null_count)
            los.append(mm["min"].as_py())
            his.append(mm["max"].as_py())
        return pa.table({"col": pa.array(cols, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "nulls": pa.array(nulls, pa.int64()),
                         "lo": pa.array(los, pa.int64()),
                         "hi": pa.array(his, pa.int64())})

    merged = hash_aggregate(
        ds.map_batches(partial_stats, batch_format="pyarrow",
                       batch_size=65536),
        "col", {"n": ("n", "sum"), "nulls": ("nulls", "sum"),
                "lo": ("lo", "min"), "hi": ("hi", "max")},
        num_parts=num_parts)

    def coalesce_range(batch: pa.Table) -> pa.Table:
        # an all-NULL column leaves lo/hi null; coalesce ARROW-side —
        # a null reaching to_pandas would coerce the whole int64 column
        # to float64, silently losing exactness above 2^53 (the same
        # float64 bug class the incremental probe fixed)
        for c in ("lo", "hi"):
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c, pc.fill_null(batch.column(c), 0))
        return batch

    stats = merged.map_batches(
        coalesce_range, batch_format="pyarrow").to_pandas()

    def partial_distinct(batch: pa.Table) -> pa.Table:
        outs = []
        for name in batch.column_names:
            col = batch.column(name).combine_chunks()
            typ = batch.schema.field(name).type
            enc = _encode_int64(col, typ)
            canon = col if enc is None else pc.cast(enc, pa.string())
            u = pc.unique(pc.drop_null(canon))
            outs.append(pa.table({
                "col": pa.array([name] * len(u), pa.string()),
                "canon": pc.cast(u, pa.string())}))
        return pa.concat_tables(outs)

    pairs = ds.map_batches(partial_distinct, batch_format="pyarrow",
                           batch_size=65536)
    # one exchange co-locates each (col, canon); the count-distinct is
    # then a per-batch combiner + one tiny per-col merge
    d1 = hash_aggregate(pairs, ["col", "canon"], {"one": ("canon", "count")},
                        num_parts=num_parts)

    def count_per_col(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("col", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"col": agg["col"], "nd": agg["count_all"]})

    nd = hash_aggregate(
        d1.map_batches(count_per_col, batch_format="pyarrow"),
        "col", {"n_distinct": ("nd", "sum")},
        num_parts=num_parts).to_pandas()

    out = stats.merge(nd, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    for c in ("n", "nulls"):
        out[c] = out[c].astype(np.int64)
    for c in ("lo", "hi"):
        # all-NULL column: no range — 0 by convention (SQL coalesce)
        out[c] = out[c].fillna(0).astype(np.int64)
    return out[["col", "n", "nulls", "n_distinct", "lo", "hi"]] \
        .sort_values("col").reset_index(drop=True)


def _qid(name: str) -> str:
    """Quote a SQL identifier for DuckDB (embedded quotes doubled) so a
    column/table named with spaces, quotes, or reserved words still
    produces valid — and non-injectable — oracle SQL."""
    return '"' + name.replace('"', '""') + '"'


def _qstr(s: str) -> str:
    """Quote a SQL string literal for DuckDB."""
    return "'" + s.replace("'", "''") + "'"


def profile_oracle_sql(table: str, schema: "pa.Schema") -> str:
    """The matching DuckDB SQL — one UNION ALL branch per column with
    the same typed encodings (built from the Arrow schema so the two
    sides can never drift)."""
    _check_supported(schema)
    branches = []
    for field in schema:
        raw, typ = field.name, field.type
        name = _qid(raw)
        expr = name
        if pa.types.is_floating(typ):
            # NaN profiles as NULL, matching the Ray-side encoding
            expr = f"(CASE WHEN isnan({name}) THEN NULL ELSE {name} END)"
            lo = f"floor(min({expr}) * 100)"
            hi = f"floor(max({expr}) * 100)"
            dis = f"count(DISTINCT CAST(floor({expr} * 100) AS BIGINT))"
        elif pa.types.is_boolean(typ):
            lo = f"min(CAST({name} AS BIGINT))"
            hi = f"max(CAST({name} AS BIGINT))"
            dis = f"count(DISTINCT {name})"
        elif pa.types.is_date32(typ):
            # epoch days, matching the Arrow date32 -> int64 cast
            lo = f"min({name} - DATE '1970-01-01')"
            hi = f"max({name} - DATE '1970-01-01')"
            dis = f"count(DISTINCT {name})"
        elif pa.types.is_integer(typ):
            lo, hi = f"min({name})", f"max({name})"
            dis = f"count(DISTINCT {name})"
        elif pa.types.is_timestamp(typ):
            lo, hi = f"epoch_us(min({name}))", f"epoch_us(max({name}))"
            dis = f"count(DISTINCT {name})"
        else:
            lo = f"min(strlen({name}))"   # strlen = BYTE length in DuckDB
            hi = f"max(strlen({name}))"
            dis = f"count(DISTINCT {name})"
        branches.append(
            f"SELECT {_qstr(raw)} AS col, CAST(count({expr}) AS BIGINT) AS n, "
            f"CAST(count(*) - count({expr}) AS BIGINT) AS nulls, "
            f"CAST({dis} AS BIGINT) AS n_distinct, "
            f"CAST(coalesce({lo}, 0) AS BIGINT) AS lo, "
            f"CAST(coalesce({hi}, 0) AS BIGINT) AS hi "
            f"FROM {_qid(table)}")
    return " UNION ALL ".join(branches)
