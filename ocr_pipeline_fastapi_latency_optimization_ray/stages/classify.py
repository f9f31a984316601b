"""Payload classification + size-based skew splitting (stateless stage).

Vectorized where Arrow kernels apply (payload length, partition hash); the
magic-byte sniff reads only the first 8 bytes of each buffer (zero-copy
slices of the Arrow binary column).

Skew splitter (SURVEY.md §4.2, north_rule requirement): the UDF is a
*generator* — it yields the small-row remainder as one table and every huge
payload row as its own single-row table. Each yielded table becomes its own
Ray Data block, so downstream stages running with ``batch_size=None``
(batch == block) process giant HTML/PDF rows in dedicated tasks that never
co-batch with thousands of small rows. This replaces the reference's
only skew control — the per-job timeout (ocr_app.py:922-930) — with real
isolation. The small-row remainder is additionally chunked to
``chunk_rows`` so task granularity is stable regardless of input parquet
row-group sizing (the explicit-repartition analog without an extra pass).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.hashing import stable_hash64_batch
from ..sources.payloads import JPEG_MAGIC, PDF_MAGIC, PNG_MAGIC


def _sniff_kinds(html_col: pa.ChunkedArray | pa.Array, text_col) -> np.ndarray:
    """Vectorized magic-byte sniff: Arrow ``starts_with`` kernels over the
    binary column (no per-row Python)."""
    import pyarrow.compute as pc

    n = len(html_col)
    is_pdf = pc.fill_null(pc.starts_with(html_col, pattern=PDF_MAGIC), False)
    is_img = pc.fill_null(
        pc.or_(
            pc.starts_with(html_col, pattern=PNG_MAGIC[:4]),
            pc.starts_with(html_col, pattern=JPEG_MAGIC),
        ),
        False,
    )
    empty_payload = pc.fill_null(pc.equal(pc.binary_length(html_col), 0), True)
    has_text = pc.fill_null(
        pc.not_equal(pc.binary_length(pc.cast(text_col, pa.string())), 0), False
    )
    kinds = np.where(
        empty_payload.to_numpy(zero_copy_only=False),
        np.where(has_text.to_numpy(zero_copy_only=False), "text", "empty"),
        np.where(
            is_pdf.to_numpy(zero_copy_only=False),
            "pdf",
            np.where(is_img.to_numpy(zero_copy_only=False), "image", "html"),
        ),
    )
    return kinds.astype(object)


def normalize_urls(batch: pa.Table) -> pa.Table:
    """Input-validation projection (M13 analog — the reference's filename
    sanitizer + job-id validators, ocr_app.py:575-604): strip surrounding
    whitespace/control chars from the url key and null out rows whose url is
    empty after cleaning (they flow through with a deterministic
    ``invalid:<row>`` key instead of being dropped — errors are data)."""
    import pyarrow.compute as pc

    urls = pc.utf8_trim_whitespace(pc.fill_null(batch["url"], ""))
    empty = pc.equal(urls, "")
    if pc.any(empty).as_py():
        fixed = [
            u if u else f"invalid:row-{i}"
            for i, u in enumerate(urls.to_pylist())
        ]
        urls = pa.array(fixed, pa.string())
    return batch.set_column(batch.column_names.index("url"), "url", urls)


def make_classifier(cfg: PipelineConfig):
    """Returns the classify_and_split generator UDF for ``map_batches``."""
    huge = cfg.huge_payload_bytes
    chunk_rows = cfg.extract_batch_size or 256
    num_parts = cfg.num_partitions

    def classify_and_split(batch: pa.Table) -> Iterator[pa.Table]:
        n = batch.num_rows
        if n == 0:
            return
        import pyarrow.compute as pc

        batch = normalize_urls(batch)
        payload_bytes = pc.fill_null(pc.binary_length(batch["html"]), 0)
        kinds = _sniff_kinds(batch["html"], batch["text"])
        part = (stable_hash64_batch(batch["url"].to_pylist()) % np.uint64(num_parts)).astype(np.int32)
        out = batch.append_column("payload_kind", pa.array(kinds, pa.string()))
        out = out.append_column("payload_bytes", payload_bytes.cast(pa.int64()))
        out = out.append_column("part", pa.array(part, pa.int32()))

        sizes = payload_bytes.to_numpy(zero_copy_only=False)
        is_huge = sizes >= huge
        small = out.filter(pa.array(~is_huge))
        for s in range(0, small.num_rows, chunk_rows):
            t = small.slice(s, chunk_rows)
            if t.num_rows:
                yield t
        huge_tbl = out.filter(pa.array(is_huge))
        for r in range(huge_tbl.num_rows):
            yield huge_tbl.slice(r, 1)  # one block per giant row

    return classify_and_split
