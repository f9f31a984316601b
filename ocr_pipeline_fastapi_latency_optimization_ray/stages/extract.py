"""Actor-pool extraction stage: warm models in ``__init__``, documents per
``__call__`` batch.

The reference pays model construction per document (DLA()/OCR() built inside
each job, ocr_app.py:989, PageProcessor.py:21); here the layout/recognizer
engines and compiled regexes are amortized across the actor's lifetime
(SURVEY.md §2.5, A1/A2) — the canonical Ray Data actor-pool pattern.

Arrow in / Arrow out. Batches arrive with classify columns
(payload_kind, payload_bytes, part) already attached; huge rows arrive in
their own single-row blocks (stages/classify.py) so one giant PDF never
stalls a batch of small HTML rows.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import PipelineConfig
from ..pipelines.doc_extract import extract_document
from ..stages.layout import LayoutStub, RecognizerStub

SPANS_TYPE = pa.list_(
    pa.struct([("block_id", pa.int32()), ("start", pa.int64()), ("end", pa.int64())])
)
# mask metadata (S8 analog — reference non_text_pairs.json, DLA.py:622-653):
# one entry per masked block, detection order
MASK_META_TYPE = pa.list_(
    pa.struct([
        ("page", pa.int32()),
        ("object", pa.string()),
        ("bbox", pa.list_(pa.float32(), 4)),
    ])
)

RESULT_FIELDS = [
    ("url", pa.string()),
    ("lang", pa.string()),
    ("part", pa.int32()),
    ("payload_kind", pa.string()),
    ("payload_bytes", pa.int64()),
    ("extracted_text", pa.string()),
    ("spans", SPANS_TYPE),
    ("mask_meta", MASK_META_TYPE),
    ("n_blocks_kept", pa.int32()),
    ("n_blocks_dropped", pa.int32()),
    ("extracted_bytes", pa.int64()),
    ("error", pa.string()),
    ("extract_ms", pa.float64()),
]
RESULT_SCHEMA = pa.schema(RESULT_FIELDS)


class DocumentExtractor:
    """Callable class for ``map_batches(DocumentExtractor, concurrency=N)``."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        # warm engines, once per actor (A1/A2 analog); the recognizer may be
        # a primary->backup failover chain (stages/layout.py)
        from ..stages.layout import build_recognizer

        from ..sources.decoders import build_decoder
        from ..stages.layout import build_layout

        self.layout = build_layout(self.cfg.layouts, self.cfg.conf)
        self.recognizer = build_recognizer(
            self.cfg.recognizers,
            max_attempts=self.cfg.recognizer_max_attempts,
            retry_wait_s=self.cfg.recognizer_retry_wait_s,
            retry_max_wait_s=self.cfg.recognizer_retry_max_wait_s,
        )
        self.decoder = build_decoder(self.cfg.decoders)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist()
        parts = batch["part"].to_pylist()
        kinds = batch["payload_kind"].to_pylist()
        sizes = batch["payload_bytes"].to_pylist()
        # The payload columns are the batch's mass: keep them in the
        # shared Arrow buffers (zero-copy view of the object store) and
        # materialize ONE row transiently at call time instead of
        # to_pylist()ing the whole batch up front — peak actor RSS holds
        # a single payload, not batch_size of them. The small metadata
        # columns above are negligible and stay as lists.
        payload_col = batch["html"]
        text_col = batch["text"]

        out_text, kept, dropped, out_bytes, errors, ms = [], [], [], [], [], []
        # spans accumulate as flat columns (ListArray.from_arrays below): one
        # Python dict per span would dominate the batch's Arrow conversion
        span_bid, span_start, span_end = [], [], []
        span_offsets = [0]
        mm_page, mm_obj, mm_bbox = [], [], []
        mm_offsets = [0]
        for i in range(batch.num_rows):
            t0 = time.perf_counter()
            res = extract_document(
                payload_col[i].as_py(), text_col[i].as_py(), langs[i], cfg,
                layout=self.layout, recognizer=self.recognizer, kind=kinds[i],
                decoder=self.decoder,
            )
            ms.append((time.perf_counter() - t0) * 1000.0)
            out_text.append(res.extracted_text)
            for b, s, e in res.spans:
                span_bid.append(b)
                span_start.append(s)
                span_end.append(e)
            span_offsets.append(len(span_bid))
            for p, o, b in (res.mask_meta or []):
                mm_page.append(p)
                mm_obj.append(o)
                mm_bbox.extend(b)
            mm_offsets.append(len(mm_page))
            kept.append(res.n_blocks_kept)
            dropped.append(res.n_blocks_dropped)
            out_bytes.append(len(res.extracted_text.encode("utf-8")))
            errors.append(res.error)

        import numpy as np

        spans_arr = pa.ListArray.from_arrays(
            pa.array(np.asarray(span_offsets, dtype=np.int32)),
            pa.StructArray.from_arrays(
                [
                    pa.array(np.asarray(span_bid, dtype=np.int32)),
                    pa.array(np.asarray(span_start, dtype=np.int64)),
                    pa.array(np.asarray(span_end, dtype=np.int64)),
                ],
                names=["block_id", "start", "end"],
            ),
        )
        mask_meta_arr = pa.ListArray.from_arrays(
            pa.array(np.asarray(mm_offsets, dtype=np.int32)),
            pa.StructArray.from_arrays(
                [
                    pa.array(np.asarray(mm_page, dtype=np.int32)),
                    pa.array(mm_obj, pa.string()),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(np.asarray(mm_bbox, dtype=np.float32)), 4
                    ),
                ],
                names=["page", "object", "bbox"],
            ),
        )
        result = pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(langs, pa.string()),
                pa.array(parts, pa.int32()),
                pa.array(kinds, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(out_text, pa.string()),
                spans_arr,
                mask_meta_arr,
                pa.array(kept, pa.int32()),
                pa.array(dropped, pa.int32()),
                pa.array(out_bytes, pa.int64()),
                pa.array(errors, pa.string()),
                pa.array(ms, pa.float64()),
            ],
            schema=RESULT_SCHEMA,
        )
        # pass through the input-shard id when the resumable job runner
        # (state/lineage.py) attached one upstream of classify
        if "shard" in batch.column_names:
            result = result.append_column("shard", batch["shard"].combine_chunks())
        return result
