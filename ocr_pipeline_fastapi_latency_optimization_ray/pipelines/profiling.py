"""Table profiling — the data-quality report every ingestion pipeline runs
first: per-column row/null/EXACT-distinct counts.

Distinct counting is the scale problem (a column's value set grows with
the data), so the plan melts each batch to deduplicated (column,
value-hash) pairs and counts uniques inside a (column, hash)-bucketed
exchange: every occurrence of a value lands in one bucket, so per-bucket
unique counts sum to the exact global distinct count, and the exchange
carries one row per distinct value per batch, never per row. Row/null
tallies ride the same partial stream as bounded counter rows.

The value hash only needs to be injective on the observed values (both
sides of OUR count use it; the ORACLE counts distinct natively): md5 over
the value's string form, the same collision posture as the md5 exact-dedup
tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.frames import typed_out


def table_profile(sf_dir: str, table: str,
                  columns: list[str] | None = None) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in df.columns:
            s = df[c]
            nn = int(s.isna().sum())
            vals = s.dropna()
            # vectorized stable value hash (fixed pandas hash key — the
            # same value always lands in the same bucket); injectivity on
            # observed values is the md5-dedup collision posture
            h = np.unique(pd.util.hash_pandas_object(
                vals.astype(str), index=False).to_numpy().astype(np.int64)) \
                if len(vals) else np.empty(0, np.int64)
            frames.append(pd.DataFrame({
                "column": c, "h": h,
                "n_rows": np.int64(0), "n_nulls": np.int64(0)}))
            frames.append(pd.DataFrame({
                "column": [c], "h": np.array([-1], np.int64),
                "n_rows": np.array([len(s)], np.int64),
                "n_nulls": np.array([nn], np.int64)}))
        return pd.concat(frames, ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        counters = g[g["n_rows"] > 0].groupby("column", as_index=False).agg(
            n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"))
        vals = g[g["n_rows"] == 0]
        dist = (vals.drop_duplicates(["column", "h"])
                .groupby("column", as_index=False).agg(n_distinct=("h", "size")))
        out = counters.merge(dist, on="column", how="outer")
        for c in ("n_rows", "n_nulls", "n_distinct"):
            out[c] = out[c].fillna(0).astype("int64")
        return out

    from ..functions.shuffle import bucketed_combine

    parts = bucketed_combine(ds, ["column", "h"], partial, combine,
                             num_buckets=16, coalesce_blocks=4).to_pandas()
    schema = {"column": "object", "n_rows": "int64", "n_nulls": "int64",
              "n_distinct": "int64"}
    if parts.empty:
        # scalar-aggregate parity: COUNT over an empty table is still one
        # row per column — mirror the oracle's zero rows from the file
        # schema (no data ever flowed, so names come from the footer)
        import pyarrow.parquet as pq

        names = columns or pq.read_schema(
            f"{sf_dir}/{table}.parquet").names
        return typed_out(pd.DataFrame({
            "column": list(names),
            "n_rows": np.zeros(len(names), np.int64),
            "n_nulls": np.zeros(len(names), np.int64),
            "n_distinct": np.zeros(len(names), np.int64),
        }), schema, sort_by="column")
    out = parts.groupby("column", as_index=False).agg(
        n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"),
        n_distinct=("n_distinct", "sum"))
    return typed_out(out, schema, sort_by="column")


def events_profile(sf_dir: str) -> pd.DataFrame:
    """Profile of the events table (the widest-typed table: ints, floats,
    timestamps, strings)."""
    return table_profile(sf_dir, "events")


EVENTS_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'event_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
  UNION ALL
  SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts), COUNT(DISTINCT ts)
  FROM events
  UNION ALL
  SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
         COUNT(DISTINCT user_id) FROM events
  UNION ALL
  SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
         COUNT(DISTINCT event_type) FROM events
  UNION ALL
  SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
         COUNT(DISTINCT value) FROM events
  UNION ALL
  SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
         COUNT(DISTINCT props) FROM events
)
ORDER BY "column"
"""


def _orphan_counts(child_ds, parent_ds, child_key: str, parent_key: str,
                   relation: str) -> pd.DataFrame:
    """One FK relation's integrity row via a co-partitioned anti-join:
    child batches pre-aggregate to (key, n_rows) partials, parent batches
    to distinct keys; the key-bucketed join marks child keys with no
    parent bucket-locally (every occurrence of a key is in one bucket, so
    the NOT-IN is exact). Bounded output: one counter row per bucket."""
    from ..functions.shuffle import bucketed_join

    def child_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(child_key, as_index=False).agg(
            n_rows=(child_key, "size"))

    def parent_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(parent_key)

    child = child_ds.map_batches(child_partial, batch_format="pandas")
    parent = parent_ds.map_batches(parent_partial, batch_format="pandas")

    def mark(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        g = left.groupby(child_key, as_index=False).agg(
            n_rows=("n_rows", "sum"))
        pk = right[parent_key].unique()
        orphan = ~g[child_key].isin(pk).to_numpy()
        return pd.DataFrame({
            "n_child_rows": [int(g["n_rows"].sum())],
            "n_child_keys": [len(g)],
            "n_orphan_keys": [int(orphan.sum())],
            "n_orphan_rows": [int(g.loc[orphan, "n_rows"].sum())],
        })

    parts = bucketed_join(
        child, parent, child_key, parent_key, mark,
        left_dtypes={child_key: "int64", "n_rows": "int64"},
        right_dtypes={parent_key: "int64"},
        num_buckets=16, coalesce_blocks=8,
    ).to_pandas()
    tot = parts.sum() if len(parts) else None
    return pd.DataFrame({
        "relation": [relation],
        "n_child_rows": [int(tot["n_child_rows"]) if tot is not None else 0],
        "n_child_keys": [int(tot["n_child_keys"]) if tot is not None else 0],
        "n_orphan_keys": [int(tot["n_orphan_keys"]) if tot is not None else 0],
        "n_orphan_rows": [int(tot["n_orphan_rows"]) if tot is not None else 0],
    })


def fk_integrity_check(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity report over the schema's FK relations — the
    second data-quality staple next to ``table_profile`` (orphaned facts
    are the classic symptom of a partial load / bad shard at 100 TB).
    Each relation is one co-partitioned anti-join; totals are real row
    counts, so the report is non-degenerate even on a consistent corpus
    (the planted-orphan case is pinned in tests/test_profiling.py)."""
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
    od = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey"])
    od2 = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])
    cu = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])
    out = pd.concat([
        _orphan_counts(li, od, "l_orderkey", "o_orderkey",
                       "lineitem.l_orderkey->orders.o_orderkey"),
        _orphan_counts(od2, cu, "o_custkey", "c_custkey",
                       "orders.o_custkey->customer.c_custkey"),
    ], ignore_index=True)
    return typed_out(out, {"relation": "object", "n_child_rows": "int64",
                           "n_child_keys": "int64", "n_orphan_keys": "int64",
                           "n_orphan_rows": "int64"}, sort_by="relation")


FK_INTEGRITY_SQL = """
SELECT * FROM (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
         CAST(COUNT(*) AS BIGINT) AS n_child_rows,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_child_keys,
         CAST(COUNT(DISTINCT l_orderkey)
              FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_orphan_keys,
         CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
           AS n_orphan_rows
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         COUNT(*), COUNT(DISTINCT o_custkey),
         COUNT(DISTINCT o_custkey) FILTER (WHERE c_custkey IS NULL),
         COUNT(*) FILTER (WHERE c_custkey IS NULL)
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
)
ORDER BY relation
"""
