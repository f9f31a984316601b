"""Relational demo pipelines over the driver's TPC-H-ish testdata.

The reference has only url-local grouped operations (SURVEY.md §2.7: page
concat G1, counters G2, job stats G3); these pipelines exercise the engine's
*wide* operators — groupby aggregation, broadcast joins, windowed event
aggregation, top-k — the way a 100 TB deployment must run them:

  - **partial pre-aggregation**: every groupby first combines inside
    ``map_batches`` (one row per key per batch) so the all-to-all shuffle
    moves partial aggregates, not raw rows;
  - **broadcast joins**: the small side is read once, put in the object
    store (``ray.put``), and joined per batch with a pandas merge — no
    shuffle of the big side;
  - **top-k**: global sort only over the (small) post-aggregate result.

All float aggregates are rounded identically to the oracle SQL so
value-hash comparison is byte-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet  # noqa: F401  (enables pa.parquet.read_table)

import ray
import ray.data


def _read(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _partial_then_final(ds, key_cols, partial_fn, final_agg):
    """partial combine inside map_batches -> small groupby over partials."""
    partials = ds.map_batches(partial_fn, batch_format="pandas")
    return partials.groupby(key_cols).aggregate(*final_agg)


# ---------------------------------------------------------------------------
# q1: pricing summary (groupby two flags, 8 aggregates)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            disc_price=df.l_extendedprice * (1 - df.l_discount),
            charge=df.l_extendedprice * (1 - df.l_discount) * (1 + df.l_tax),
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    out = _partial_then_final(
        ds, ["l_returnflag", "l_linestatus"], partial,
        (
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("sum_charge", alias_name="sum_charge"),
            Sum("sum_disc", alias_name="sum_disc"),
            Sum("count_order", alias_name="count_order"),
        ),
    ).to_pandas()
    out["avg_qty"] = (out.sum_qty / out.count_order).round(4)
    out["avg_price"] = (out.sum_base_price / out.count_order).round(4)
    out["avg_disc"] = (out.sum_disc / out.count_order).round(4)
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
        out[c] = out[c].round(2)
    out = out.drop(columns=["sum_disc"])
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       COUNT(*) AS count_order,
       ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
       ROUND(SUM(l_extendedprice) / COUNT(*), 4) AS avg_price,
       ROUND(SUM(l_discount) / COUNT(*), 4) AS avg_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: top-10 orders by revenue for one market segment (broadcast joins)
# ---------------------------------------------------------------------------

def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    from ..functions.shuffle import bucketed_combine

    # small sides: customer segment filter -> order keys (driver-side read of
    # dimension tables; broadcast once via ray.put as a SORTED array so the
    # per-batch semi-join is a searchsorted, not a per-value set probe)
    cust = pa.parquet.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    keys = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
    orders = pa.parquet.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_pandas()
    orders = orders[orders.o_custkey.isin(keys)]
    odate = dict(zip(orders.o_orderkey, orders.o_orderdate))
    keys_ref = ray.put(np.sort(orders.o_orderkey.to_numpy()))

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arr = ray.get(keys_ref)
        v = df.l_orderkey.to_numpy()
        idx = np.clip(np.searchsorted(arr, v), 0, len(arr) - 1)
        df = df[arr[idx] == v]
        df = df.assign(revenue=df.l_extendedprice * (1 - df.l_discount))
        return df.groupby("l_orderkey", as_index=False).agg(revenue=("revenue", "sum"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_orderkey", as_index=False).agg(revenue=("revenue", "sum"))

    # order-id cardinality grows with the data: bucketed combine, never a
    # per-key Dataset.groupby (functions/shuffle.py)
    agg = bucketed_combine(ds, "l_orderkey", partial, combine).to_pandas()
    agg["revenue"] = agg.revenue.round(2)
    agg["o_orderdate"] = agg.l_orderkey.map(odate)
    agg = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return agg[["l_orderkey", "revenue", "o_orderdate"]].reset_index(drop=True)


Q3_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ANY_VALUE(o_orderdate) AS o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# orders per region (chained broadcast lookups, no shuffle join)
# ---------------------------------------------------------------------------

def orders_per_region(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    region = pa.parquet.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nation = pa.parquet.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    cust = pa.parquet.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    n2r = dict(zip(nation.n_nationkey, nation.n_regionkey))
    # broadcast the customer->region map as two parallel numpy arrays
    # (sorted keys + searchsorted probe): ~16 bytes/customer vs a Python
    # dict's ~100, and zero-copy out of the object store
    order = np.argsort(cust.c_custkey.to_numpy())
    ckeys = cust.c_custkey.to_numpy()[order]
    cregion = np.array(
        [n2r[nk] for nk in cust.c_nationkey.to_numpy()[order]], dtype=np.int32
    )
    r_names = region.sort_values("r_regionkey").r_name.to_numpy()
    keys_ref = ray.put(ckeys)
    vals_ref = ray.put(cregion)

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ck, cr = ray.get(keys_ref), ray.get(vals_ref)
        v = df.o_custkey.to_numpy()
        idx = np.clip(np.searchsorted(ck, v), 0, len(ck) - 1)
        df = df.assign(r_name=r_names[cr[idx]])
        return df.groupby("r_name", as_index=False).agg(
            n_orders=("o_totalprice", "size"), total=("o_totalprice", "sum")
        )

    out = _partial_then_final(
        ds, "r_name", partial,
        (Sum("n_orders", alias_name="n_orders"), Sum("total", alias_name="total")),
    ).to_pandas()
    out["total"] = out.total.round(2)
    out["n_orders"] = out.n_orders.astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


ORDERS_PER_REGION_SQL = """
SELECT r_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# events: tumbling 1-hour windows per event type (streaming-shaped analog of
# the reference's sliding-window counters, ocr_app.py:322-344)
# ---------------------------------------------------------------------------

def events_tumbling_hourly(sf_dir: str) -> pd.DataFrame:
    from ..functions.shuffle import bucketed_combine

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        win = (df.ts.astype("int64") // 3_600_000_000).astype("int64")
        df = df.assign(window_h=win)
        return df.groupby(["window_h", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["window_h", "event_type"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )

    # window count grows with the time range -> bucketed combine
    out = bucketed_combine(ds, ["window_h", "event_type"], partial, combine).to_pandas()
    out["sum_value"] = out.sum_value.round(2)
    out["n_events"] = out.n_events.astype("int64")
    return out.sort_values(["window_h", "event_type"]).reset_index(drop=True)


EVENTS_TUMBLING_SQL = """
SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS window_h,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# events: top-10 users by total value (pre-aggregate then tiny global top-k)
# ---------------------------------------------------------------------------

def events_top_users(sf_dir: str) -> pd.DataFrame:
    from ..functions.shuffle import bucketed_combine

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            total_value=("value", "sum"), n_events=("value", "size")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # each user lands in exactly one bucket -> totals are final here;
        # emit only the bucket's local top-10 so the driver merges 64x10
        # rows regardless of user cardinality
        t = g.groupby("user_id", as_index=False).agg(
            total_value=("total_value", "sum"), n_events=("n_events", "sum")
        )
        return t.sort_values(
            ["total_value", "user_id"], ascending=[False, True]
        ).head(10)

    out = bucketed_combine(ds, "user_id", partial, combine).to_pandas()
    out["total_value"] = out.total_value.round(2)
    out["n_events"] = out.n_events.astype("int64")
    out = out.sort_values(["total_value", "user_id"], ascending=[False, True]).head(10)
    return out[["user_id", "total_value", "n_events"]].reset_index(drop=True)


EVENTS_TOP_USERS_SQL = """
SELECT user_id, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# part: distinct types + stats (distinct-aggregate surface)
# ---------------------------------------------------------------------------

def part_type_stats(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "part", columns=["p_type", "p_retailprice", "p_size"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_type", as_index=False).agg(
            n_parts=("p_size", "size"),
            sum_price=("p_retailprice", "sum"),
            min_size=("p_size", "min"),
            max_size=("p_size", "max"),
        )

    out = _partial_then_final(
        ds, "p_type", partial,
        (
            Sum("n_parts", alias_name="n_parts"),
            Sum("sum_price", alias_name="sum_price"),
            Min("min_size", alias_name="min_size"),
            Max("max_size", alias_name="max_size"),
        ),
    ).to_pandas()
    out["avg_price"] = (out.sum_price / out.n_parts).round(4)
    out = out.drop(columns=["sum_price"])
    out["n_parts"] = out.n_parts.astype("int64")
    out["min_size"] = out.min_size.astype("int32")
    out["max_size"] = out.max_size.astype("int32")
    return out.sort_values("p_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# lineitem x orders distributed hash join (both sides large -> co-partitioned
# bucketed join, functions/shuffle.py; broadcast is not an option here)
# ---------------------------------------------------------------------------

def order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue per order priority via a true two-big-sides join: lineitem
    revenue partial-aggregates per l_orderkey inside map_batches (one row
    per key per batch), then co-partitions with orders on
    hash(orderkey) % B and merges per bucket. The driver combines 5 rows
    per bucket."""
    from ..functions.shuffle import bucketed_join

    line = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(revenue=df.l_extendedprice * (1 - df.l_discount))
        return df.groupby("l_orderkey", as_index=False).agg(
            revenue=("revenue", "sum")
        )

    line_partial = line.map_batches(partial, batch_format="pandas")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def join_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, left_on="l_orderkey", right_on="o_orderkey")
        return m.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum")
        )

    out = bucketed_join(
        line_partial, orders, "l_orderkey", "o_orderkey", join_fn
    ).to_pandas()
    out = out.groupby("o_orderpriority", as_index=False).agg(
        revenue=("revenue", "sum")
    )
    out["revenue"] = out.revenue.round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


ORDER_PRIORITY_REVENUE_SQL = """
SELECT o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


PART_TYPE_STATS_SQL = """
SELECT p_type, COUNT(*) AS n_parts,
       CAST(MIN(p_size) AS INTEGER) AS min_size,
       CAST(MAX(p_size) AS INTEGER) AS max_size,
       ROUND(SUM(p_retailprice) / COUNT(*), 4) AS avg_price
FROM part
GROUP BY p_type
ORDER BY p_type
"""
