"""Multi-format source readers: CSV/JSONL round-trip into the extraction
pipeline must produce output byte-identical to the parquet path."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.extract import (
    build_extraction_pipeline,
)
from ocr_pipeline_fastapi_latency_optimization_ray.sources.readers import (
    read_pages_csv,
    read_pages_json,
    read_pages_parquet,
    write_pages_csv,
    write_pages_json,
)
from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import synth_pages_table


@pytest.fixture(scope="module")
def fmt_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    t = synth_pages_table(120).select(["url", "html", "text", "lang"])
    pq.write_table(t, d / "pages.parquet")
    write_pages_csv(t, str(d / "pages.csv"))
    write_pages_json(t, str(d / "pages.jsonl"))
    return d


def _extract(ds):
    out = build_extraction_pipeline(ds, PipelineConfig()).to_pandas()
    return (
        out[["url", "extracted_text"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_csv_and_json_match_parquet(ray_session, fmt_dirs):
    base = _extract(read_pages_parquet(str(fmt_dirs / "pages.parquet")))
    assert len(base) == 120
    csv_out = _extract(read_pages_csv(str(fmt_dirs / "pages.csv")))
    json_out = _extract(read_pages_json(str(fmt_dirs / "pages.jsonl")))
    assert csv_out.equals(base)
    assert json_out.equals(base)
