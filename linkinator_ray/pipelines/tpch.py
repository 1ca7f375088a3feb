"""Classic columnar aggregates over the TPC-H-ish tables — the
pricing-summary and order-enrichment shapes, exercising zero-copy Arrow
kernels + the partial-agg pattern on the largest testdata table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str, ship_before: str = "1998-09-02"):
    """Q1-shaped pricing summary: per (returnflag, linestatus) totals
    over lineitem. Arrow compute in map_batches (zero-copy), integer
    cents so the DuckDB oracle hashes identically, partial aggregation
    before the (tiny) groupby."""
    from ray.data.aggregate import Sum
    cutoff = pa.scalar(np.datetime64(ship_before, "us"))

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["l_shipdate"], cutoff)
        batch = batch.filter(keep)
        qty = batch["l_quantity"]
        price = batch["l_extendedprice"]
        disc = batch["l_discount"]
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        cents = pc.cast(pc.floor(pc.multiply(disc_price, pa.scalar(100.0))),
                        pa.int64())
        qty_centi = pc.cast(pc.floor(pc.multiply(qty, pa.scalar(100.0))),
                            pa.int64())
        tbl = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_centi": qty_centi,
            "disc_cents": cents,
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        # combine within the batch before the shuffle
        return pa.TableGroupBy(tbl, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_centi", "sum"), ("disc_cents", "sum"), ("n", "sum")]
        ).rename_columns(["l_returnflag", "l_linestatus",
                          "qty_centi", "disc_cents", "n"])

    partials = _read(sf_dir, "lineitem",
                     ["l_quantity", "l_extendedprice", "l_discount",
                      "l_returnflag", "l_linestatus", "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow", batch_size=131072)
    from linkinator_ray.pipelines.dedup import _fanout
    return _fanout(partials).groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_centi", alias_name="sum_qty_centi"),
        Sum("disc_cents", alias_name="sum_disc_cents"),
        Sum("n", alias_name="count_order"))


def top_customers(sf_dir: str, k: int = 10):
    """Σ order value per customer (orders ⋈ customer broadcast), top-k
    by total with deterministic (total desc, custkey asc) order."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_name"])
    names = dict(zip(customer["c_custkey"].to_pylist(),
                     customer["c_name"].to_pylist()))
    try:
        import ray
        names_ref = ray.put(names) if ray.is_initialized() else names
    except Exception:
        names_ref = names

    class Enrich:
        def __init__(self):
            try:
                import ray
                self.names = ray.get(names_ref) \
                    if not isinstance(names_ref, dict) else names_ref
            except Exception:
                self.names = names_ref

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "o_custkey": batch["o_custkey"],
                "cents": np.floor(batch["o_totalprice"].to_numpy() * 100)
                .astype("int64"),
            })
            return out.groupby("o_custkey", as_index=False).agg(
                total=("cents", "sum"), n=("cents", "size"))

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        Enrich, batch_format="pandas", batch_size=65536, concurrency=(1, 4))
    from linkinator_ray.pipelines.dedup import _fanout
    merged = _fanout(partials).groupby("o_custkey").aggregate(
        Sum("total", alias_name="total_cents"),
        Sum("n", alias_name="n_orders")).to_pandas()
    merged["c_name"] = merged["o_custkey"].map(names)
    top = merged.sort_values(["total_cents", "o_custkey"],
                             ascending=[False, True]).head(k)
    return pa.Table.from_pandas(
        top[["o_custkey", "c_name", "total_cents", "n_orders"]]
        .reset_index(drop=True), preserve_index=False)
