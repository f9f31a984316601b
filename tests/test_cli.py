"""CLI surface (ocr_pipeline_fastapi_latency_optimization_ray.cli): the
``ray job submit`` entry point the north rule names. Drives extract ->
status -> resume through ``main(argv)`` exactly as a cluster submission
would (Ray already initialized by the session fixture — the CLI must not
re-init)."""

import json

import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.cli import main
from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import (
    synth_pages_table,
)


@pytest.fixture()
def pages_dir(tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    t = synth_pages_table(120)
    pq.write_table(t.slice(0, 60), d / "p0.parquet")
    pq.write_table(t.slice(60), d / "p1.parquet")
    return d


def test_cli_extract_status_resume(ray_session, pages_dir, tmp_path, capsys):
    out = tmp_path / "out"
    rc = main(["extract", "--input", str(pages_dir), "--output", str(out),
               "--num-partitions", "8"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 120
    assert summary["processed"] == summary["partitions"]
    assert summary["skipped"] == 0

    rc = main(["status", "--output", str(out), "--input", str(pages_dir)])
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["partitions_done"] == status["partitions_total"]
    assert status["rows"] == 120

    # resubmit the identical command: every partition is already committed,
    # so the resume prunes the whole input at the read and recomputes nothing
    rc = main(["extract", "--input", str(pages_dir), "--output", str(out),
               "--num-partitions", "8"])
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["skipped"] == summary["partitions"]
    assert summary2["processed"] == 0 and summary2["rows"] == 120

    # output parquet holds every url exactly once
    import glob

    files = glob.glob(str(out / "**/*.parquet"), recursive=True)
    tables = [pq.read_table(f, columns=["url"]) for f in files]
    urls = [u for t in tables for u in t.column("url").to_pylist()]
    assert len(urls) == 120 and len(set(urls)) == 120


def test_cli_unknown_command_exits():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
