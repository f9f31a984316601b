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


def round_away(x, ndigits: int):
    """Round half AWAY from zero, matching SQL ROUND (DuckDB, ANSI).

    numpy/pandas ``round`` is banker's (half to even): 4190.83825 -> .8382
    while DuckDB gives .8383, so any oracle-compared rounded column must
    round with this helper or hash-compare fails whenever a true tie occurs.
    Accepts a pandas Series or numpy array; returns the same shape.
    """
    import numpy as np

    scale = 10.0 ** ndigits
    arr = x.to_numpy(dtype=float) if hasattr(x, "to_numpy") else np.asarray(x, dtype=float)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if hasattr(x, "index"):
        import pandas as pd

        return pd.Series(out, index=x.index)
    return out
