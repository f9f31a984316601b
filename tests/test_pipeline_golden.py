"""Golden byte-identity: the Ray Data pipeline's extracted_text per url must
equal the single-threaded oracle's, row for row, at multiple batch/block
layouts — parallelism must never change bytes (FIXTURES.md §3,
SURVEY.md §7.4)."""

import pyarrow as pa
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.oracle.extract_oracle import oracle_extract
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.extract import build_extraction_pipeline
from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import synth_pages_table

N_ROWS = 240


@pytest.fixture(scope="module")
def pages_table():
    return synth_pages_table(N_ROWS)


@pytest.fixture(scope="module")
def golden(pages_table):
    cfg = PipelineConfig()
    out = {}
    for i in range(pages_table.num_rows):
        url = pages_table["url"][i].as_py()
        out[url] = oracle_extract(
            pages_table["html"][i].as_py(),
            pages_table["text"][i].as_py(),
            pages_table["lang"][i].as_py(),
            cfg,
        )
    return out


def run_pipeline(pages_table, cfg, override_blocks=None):
    import ray.data

    ds = ray.data.from_arrow(pages_table)
    if override_blocks:
        ds = ds.repartition(override_blocks)
    ds = build_extraction_pipeline(ds, cfg)
    return ds.to_pandas()


@pytest.mark.parametrize(
    "batch_size,blocks",
    [(64, 4), (7, 16), (None, 1)],
    ids=["b64x4", "b7x16", "single-block"],
)
def test_byte_identity_vs_oracle(ray_session, pages_table, golden, batch_size, blocks):
    cfg = PipelineConfig(extract_batch_size=batch_size, extract_concurrency=(1, 2))
    df = run_pipeline(pages_table, cfg, override_blocks=blocks)
    assert len(df) == N_ROWS
    got = dict(zip(df["url"], df["extracted_text"]))
    assert set(got) == set(golden)
    bad = [u for u in golden if got[u] != golden[u]]
    assert not bad, f"{len(bad)} urls mismatch, first: {bad[0]!r}"


def test_output_schema_and_spans(ray_session, pages_table):
    cfg = PipelineConfig(extract_concurrency=(1, 2))
    import ray.data

    ds = build_extraction_pipeline(ray.data.from_arrow(pages_table), cfg)
    tbl = pa.Table.from_pandas(ds.to_pandas())
    names = set(tbl.schema.names)
    assert {
        "url", "lang", "part", "payload_kind", "payload_bytes",
        "extracted_text", "spans", "n_blocks_kept", "n_blocks_dropped",
        "extracted_bytes", "error",
    } <= names
    df = tbl.to_pandas()
    for _, row in df.iterrows():
        text = row["extracted_text"]
        for sp in row["spans"]:
            assert 0 <= sp["start"] <= sp["end"] <= len(text)
        assert row["extracted_bytes"] == len(text.encode("utf-8"))
    kinds = set(df["payload_kind"])
    assert {"html", "pdf", "image", "text", "empty"} <= kinds
    # corrupt payloads produce sentinel text + error, never an exception
    errs = df[df["error"].notna()]
    assert (errs["extracted_text"].str.contains(r"\[OCR Failed\]")).all()


def test_partition_assignment_stable(ray_session, pages_table):
    cfg = PipelineConfig(num_partitions=8, extract_concurrency=(1, 2))
    import ray.data

    ds = build_extraction_pipeline(ray.data.from_arrow(pages_table), cfg)
    df = ds.to_pandas()
    assert df["part"].between(0, 7).all()
    # same url -> same partition across runs (stable hash, not PYTHONHASHSEED)
    from ocr_pipeline_fastapi_latency_optimization_ray.functions.hashing import stable_hash64

    for _, row in df.head(20).iterrows():
        assert row["part"] == stable_hash64(row["url"]) % 8
