"""Multi-format sources for the pages table (S1/S2 analog).

The reference accepts 23 upload formats and normalizes them into one internal
shape (`FileIngestor.process_input`, extension dispatch FileIngestor.py:133-162).
Here the engine-side analog: the pages table can arrive as Parquet (primary),
CSV, or JSON-lines, and every reader normalizes to the same Arrow schema
before entering the pipeline — payload bytes in CSV/JSONL are base64-encoded
(text formats cannot carry raw binary).

All readers are Ray Data native (`read_parquet` / `read_csv` / `read_json`)
so block-based streaming, column pruning (parquet) and parallelism come from
the Dataset layer; schema coercion is one vectorized ``map_batches``.
"""

from __future__ import annotations

import base64

import pyarrow as pa

import ray.data

PAGES_FIELDS = ["url", "html", "text", "lang"]


def _coerce(batch: pa.Table, b64_payload: bool) -> pa.Table:
    """Normalize any raw batch to the canonical pages schema."""
    cols = {}
    for name in PAGES_FIELDS:
        if name in batch.column_names:
            cols[name] = batch[name]
        else:
            cols[name] = pa.nulls(batch.num_rows, pa.string())
    html = cols["html"]
    if b64_payload:
        decoded = [
            base64.b64decode(v) if v is not None else None
            for v in html.to_pylist()
        ]
        html = pa.array(decoded, pa.binary())
    elif not pa.types.is_binary(html.type) and not pa.types.is_large_binary(html.type):
        html = html.cast(pa.binary())
    return pa.Table.from_arrays(
        [
            cols["url"].cast(pa.string()) if hasattr(cols["url"], "cast") else cols["url"],
            html,
            cols["text"].cast(pa.string()),
            cols["lang"].cast(pa.string()),
        ],
        names=PAGES_FIELDS,
    )


def read_pages_parquet(paths) -> "ray.data.Dataset":
    return ray.data.read_parquet(paths, columns=PAGES_FIELDS)


def read_pages_csv(paths) -> "ray.data.Dataset":
    """CSV pages table; the html column is base64 text."""
    ds = ray.data.read_csv(paths)
    return ds.map_batches(
        lambda b: _coerce(b, b64_payload=True), batch_format="pyarrow"
    )


def read_pages_json(paths) -> "ray.data.Dataset":
    """JSON-lines pages table; the html column is base64 text."""
    ds = ray.data.read_json(paths)
    return ds.map_batches(
        lambda b: _coerce(b, b64_payload=True), batch_format="pyarrow"
    )


def write_pages_csv(table: pa.Table, path: str) -> None:
    """Helper for tests/tools: round-trip a pages table to CSV with base64
    payloads."""
    import pyarrow.csv as pacsv

    enc = pa.array(
        [
            base64.b64encode(v).decode() if v is not None else None
            for v in table["html"].to_pylist()
        ],
        pa.string(),
    )
    out = table.set_column(table.column_names.index("html"), "html", enc)
    pacsv.write_csv(out.select(PAGES_FIELDS), path)


def write_pages_json(table: pa.Table, path: str) -> None:
    import json

    with open(path, "w") as f:
        for row in table.select(PAGES_FIELDS).to_pylist():
            if row["html"] is not None:
                row["html"] = base64.b64encode(row["html"]).decode()
            f.write(json.dumps(row) + "\n")
