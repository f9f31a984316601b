"""Explicit hash-partitioned aggregation for high-cardinality keys.

Ray Data's ``groupby(key).aggregate(...)`` pays ~1 ms of per-group Python
overhead after its sort shuffle (measured: 29k groups -> 57 s on this
version, for an aggregate whose data volume is 3 MB). For keys whose
cardinality grows with the data (order ids, content hashes, LSH buckets)
that cost dominates everything.

``bucketed_combine`` is the classic two-stage fix, expressed in Ray Data
primitives:

  1. partial-aggregate inside ``map_batches`` (rows shrink to one per key
     per batch) and tag each partial row with
     ``_bucket = stable_hash(key) % num_buckets``;
  2. ``groupby("_bucket").map_groups(combine)`` — the shuffle key is the
     *bucket* (bounded cardinality, uniform by construction, skew-free), and
     each combine call is one vectorized pandas groupby over the whole
     bucket.

Per-group Python overhead drops from O(#keys) to O(#buckets). On a real
cluster ``num_buckets`` scales with cluster size, not key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def add_bucket_column(df: pd.DataFrame, key_cols: list[str], num_buckets: int) -> pd.DataFrame:
    """Deterministic bucket tag from the first key column (stable across
    processes: pandas hash_array uses a fixed key)."""
    first = df[key_cols[0]]
    if np.issubdtype(first.dtype, np.integer):
        bucket = (first.to_numpy().astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
    else:
        bucket = (
            pd.util.hash_array(first.to_numpy(dtype=object)) % np.uint64(num_buckets)
        ).astype(np.int32)
    out = df.copy()
    out["_bucket"] = bucket
    return out


def bucketed_combine(ds, key_cols, partial_fn, combine_fn, num_buckets: int = 32):
    """partial per batch -> bucket tag -> per-bucket vectorized combine.

    ``partial_fn``: pandas batch -> partial-aggregate frame (must include
    ``key_cols``). ``combine_fn``: pandas frame of one bucket's partials ->
    final rows for the keys in that bucket.
    Returns a Ray Dataset of combined rows.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def partial_with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = partial_fn(df)
        return add_bucket_column(p, key_cols, num_buckets)

    def combine_drop(g: pd.DataFrame) -> pd.DataFrame:
        return combine_fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(partial_with_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(combine_drop, batch_format="pandas")
    )
