"""Shared audit-sink plumbing for the driver-oracle surfaces.

Several operators tee a bounded intermediate stream (perceptual-hash
signatures, ANN candidate rows, video frame hashes) to a pid-keyed
parquet directory so a DuckDB oracle can independently re-derive the
final answer from the same bytes the engine scored. This module holds
the one implementation of the lifecycle those sinks share:

  reset -> write_parquet -> ensure at least one (possibly empty) file

so a fix to the fallback (e.g. Ray changing its output file extension)
lands in exactly one place.

``audit_sinks_disabled()`` is the production switch: a 100 TB run that
does not need the audit artifact sets ``RAY_GRAFT_DISABLE_AUDIT_SINK=1``
and the operators compute the same results fully streaming, without the
extra write+read cycle (the DuckDB oracles then have nothing to read —
the switch deliberately trades driver-auditability for throughput, and
the oracle-backed tests run with it unset).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa


def audit_sinks_disabled() -> bool:
    return os.environ.get("RAY_GRAFT_DISABLE_AUDIT_SINK", "") not in ("", "0")


def reset_sink(sink_dir: str) -> None:
    shutil.rmtree(sink_dir, ignore_errors=True)


def ensure_sink(sink_dir: str, schema: pa.Schema) -> None:
    """Guarantee ``sink_dir`` holds at least one parquet file so a
    ``read_parquet('<dir>/*.parquet')`` (DuckDB or Ray) never errors on a
    missing/empty directory — writes one empty file when needed."""
    import pyarrow.parquet as pq

    if not glob.glob(f"{sink_dir}/*.parquet"):
        os.makedirs(sink_dir, exist_ok=True)
        pq.write_table(schema.empty_table(), f"{sink_dir}/empty.parquet")


def write_sink(ds, sink_dir: str, schema: pa.Schema) -> None:
    """Reset + write the dataset + ensure non-empty: the one-call sink
    lifecycle used by every audit-sink operator."""
    reset_sink(sink_dir)
    ds.write_parquet(sink_dir)
    ensure_sink(sink_dir, schema)


def write_empty_sink(sink_dir: str, schema: pa.Schema) -> None:
    """Leave ``sink_dir`` holding exactly one empty file — the
    no-candidates audit surface for early-return paths (missing query
    id / empty corpus), so the oracle never sees a stale previous run."""
    reset_sink(sink_dir)
    ensure_sink(sink_dir, schema)
