"""Size-based skew splitter (stages/classify.py; SURVEY.md §4.2,
north_rule requirement): giant rows isolate into their own blocks and the
isolation never changes output bytes.

Restored per round-2 ADVICE — the hot-key rewrite of test_skew.py dropped
these two tests and left the huge_payload_bytes path uncovered."""

from __future__ import annotations

import pyarrow.parquet as pq

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.extract import (
    build_extraction_pipeline, read_pages,
)
from ocr_pipeline_fastapi_latency_optimization_ray.stages.classify import (
    make_classifier,
)
from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import (
    synth_pages_table,
)


def test_huge_rows_get_single_row_blocks():
    base = synth_pages_table(20).select(["url", "html", "text", "lang"])
    sizes = [len(v) if v else 0 for v in base["html"].to_pylist()]
    threshold = sorted(sizes)[-3]  # top-3 payloads count as "huge"
    cfg = PipelineConfig(huge_payload_bytes=threshold, extract_batch_size=8)
    blocks = list(make_classifier(cfg)(base))
    huge_blocks = [b for b in blocks if b.num_rows == 1
                   and b["payload_bytes"][0].as_py() >= threshold]
    n_huge = sum(1 for s in sizes if s >= threshold)
    assert len(huge_blocks) == n_huge >= 3
    # small-row remainder is chunked to the configured batch size
    small = [b for b in blocks if b not in huge_blocks]
    assert all(b.num_rows <= 8 for b in small)
    # no rows lost
    assert sum(b.num_rows for b in blocks) == base.num_rows


def test_skew_isolation_is_byte_invariant(ray_session, tmp_path):
    t = synth_pages_table(150).select(["url", "html", "text", "lang"])
    pq.write_table(t, tmp_path / "pages.parquet")

    def run(cfg):
        out = build_extraction_pipeline(
            read_pages(str(tmp_path / "pages.parquet")), cfg
        ).to_pandas()
        return (
            out[["url", "extracted_text"]]
            .sort_values("url")
            .reset_index(drop=True)
        )

    normal = run(PipelineConfig())
    # force nearly everything through the huge-row path
    skewed = run(PipelineConfig(huge_payload_bytes=500))
    assert normal.equals(skewed)
