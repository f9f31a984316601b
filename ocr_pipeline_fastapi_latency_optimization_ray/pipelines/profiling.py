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
