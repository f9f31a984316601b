"""Unit tests for the Arrow-buffer md5 kernel (functions/hashing.py:
md5_hex_arrow) — the zero-boxing path under the exact-dedup partials.
No Ray needed: pure Arrow/array-level edge cases, especially SLICED
arrays (non-zero chunk offset shifts both the offsets window and the
validity bit positions)."""

import hashlib

import pyarrow as pa
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.functions.hashing import (
    md5_hex_arrow, md5_hex_batch,
)


def ref(values):
    return [None if v is None else hashlib.md5(
        v.encode() if isinstance(v, str) else v).hexdigest() for v in values]


VALUES = ["", "a", "hello world", "日本語テキスト", None, "x" * 10_000, "end"]


def test_matches_hashlib_on_strings():
    arr = pa.array(VALUES, pa.string())
    assert md5_hex_arrow(arr) == ref(VALUES)


def test_matches_md5_hex_batch():
    vals = [v for v in VALUES if v is not None]
    assert md5_hex_arrow(pa.array(vals, pa.string())) == md5_hex_batch(vals)


@pytest.mark.parametrize("typ", [pa.string(), pa.large_string(),
                                 pa.binary(), pa.large_binary()])
def test_all_offset_widths(typ):
    vals = VALUES if "string" in str(typ) else [
        None if v is None else v.encode() for v in VALUES]
    assert md5_hex_arrow(pa.array(vals, typ)) == ref(VALUES)


def test_sliced_array_nonzero_offset():
    # slicing keeps the parent buffers but moves ch.offset — the offsets
    # window AND the validity bit positions must both shift
    arr = pa.array(VALUES, pa.string())
    for start in (1, 3, 4, 5):
        sl = arr.slice(start, len(VALUES) - start)
        assert md5_hex_arrow(sl) == ref(VALUES[start:]), start


def test_chunked_array_mixed_chunks():
    ca = pa.chunked_array([
        pa.array(VALUES[:3], pa.string()),
        pa.array([], pa.string()),
        pa.array(VALUES[3:], pa.string()),
    ])
    assert md5_hex_arrow(ca) == ref(VALUES)


def test_utf8_bytes_equal_duckdb_md5():
    import duckdb

    vals = [v for v in VALUES if v is not None]
    got = md5_hex_arrow(pa.array(vals, pa.string()))
    want = [r[0] for r in duckdb.connect().execute(
        "SELECT md5(t) FROM (SELECT unnest(?) AS t)", [vals]).fetchall()]
    assert got == want


def test_rejects_non_string_types():
    with pytest.raises(TypeError):
        md5_hex_arrow(pa.array([1, 2, 3]))
