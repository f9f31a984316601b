"""Declared-schema finalization for query outputs.

A Ray dataset that ends up with zero blocks (every input row filtered, an
empty fact partition, an all-empty shard) loses its schema: ``to_pandas()``
returns a column-less frame, and the usual ``sort_values``/``astype`` tail
raises ``KeyError``. At 100 TB an empty partition is routine, so every
query finalizes through :func:`typed_out`, which guarantees the declared
output columns and dtypes regardless of input emptiness.
"""

from __future__ import annotations

import pandas as pd


def typed_out(
    df: pd.DataFrame,
    dtypes: dict[str, str],
    sort_by=None,
) -> pd.DataFrame:
    """Project ``df`` onto the declared ``{column: dtype}`` map.

    Present columns are cast to the declared dtype (no-op when already
    right; uncastable object payloads are left as-is); columns missing
    because the upstream dataset was empty are materialized as typed empty
    series. Sorts by ``sort_by`` (str or list) when given and resets the
    index, so call sites need no tail of their own.
    """
    out = pd.DataFrame(index=df.index)
    for c, dt in dtypes.items():
        if c in df.columns:
            s = df[c]
            if str(s.dtype) != dt:
                try:
                    s = s.astype(dt)
                except (TypeError, ValueError):
                    pass
            out[c] = s
        else:
            out[c] = pd.Series(dtype=dt)
    if sort_by is not None and len(out):
        keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        out = out.sort_values(keys, kind="stable")
    return out.reset_index(drop=True)
