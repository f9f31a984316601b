"""Resumable-job tests: per-partition lineage, checkpoint resume, crash
cleanup (state/lineage.py; SURVEY.md §4.3 / north_rule)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import synth_pages_table
from ocr_pipeline_fastapi_latency_optimization_ray.state.lineage import (
    job_status,
    load_lineage,
    read_output,
    run_extraction_job,
)

N_SHARDS = 4
ROWS_PER_SHARD = 30


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_in")
    full = synth_pages_table(N_SHARDS * ROWS_PER_SHARD)
    for i in range(N_SHARDS):
        pq.write_table(
            full.slice(i * ROWS_PER_SHARD, ROWS_PER_SHARD),
            d / f"shard_{i:02d}.parquet",
        )
    return d


def _cfg():
    return PipelineConfig(extract_concurrency=2)


def _sorted_rows(out_dir):
    t = read_output(out_dir).to_pandas()
    return (
        t[["url", "extracted_text"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_full_run_commits_all_partitions(ray_session, pages_dir, tmp_path):
    out = tmp_path / "out"
    summary = run_extraction_job(pages_dir, out, _cfg())
    assert summary["processed"] == N_SHARDS
    assert summary["skipped"] == 0
    assert summary["rows"] == N_SHARDS * ROWS_PER_SHARD

    recs = load_lineage(out)
    assert sorted(recs) == list(range(N_SHARDS))
    for pid, r in recs.items():
        assert r["status"] == "done"
        assert r["row_count"] == ROWS_PER_SHARD
        assert r["input_file"] == f"shard_{pid:02d}.parquet"
        assert r["bytes_out"] > 0 and r["blocks_kept"] > 0
        # data really on disk under part=<pid>/
        files = list((out / f"part={pid}").glob("*.parquet"))
        assert files and sum(pq.ParquetFile(f).metadata.num_rows for f in files) == ROWS_PER_SHARD

    st = job_status(out, pages_dir)
    assert st["partitions_done"] == N_SHARDS and st["percent"] == 100.0


def test_rerun_is_noop(ray_session, pages_dir, tmp_path):
    out = tmp_path / "out"
    run_extraction_job(pages_dir, out, _cfg())
    before = _sorted_rows(out)
    summary2 = run_extraction_job(pages_dir, out, _cfg())
    assert summary2["processed"] == 0
    assert summary2["skipped"] == N_SHARDS
    assert summary2["rows"] == N_SHARDS * ROWS_PER_SHARD
    assert _sorted_rows(out).equals(before)


def test_resume_recomputes_only_missing_partition(ray_session, pages_dir, tmp_path):
    out = tmp_path / "out"
    run_extraction_job(pages_dir, out, _cfg())
    full = _sorted_rows(out)

    # simulate a crash on partition 1: no commit marker, partial data files
    (out / "_lineage" / "part=1.json").unlink()
    stray = out / "part=1" / "stray-partial.parquet"
    keep_mtime = {
        pid: (out / "_lineage" / f"part={pid}.json").stat().st_mtime_ns
        for pid in (0, 2, 3)
    }
    # leave a stray file where the crashed attempt stopped
    src = next((out / "part=0").glob("*.parquet"))
    shutil.copy(src, stray)

    summary = run_extraction_job(pages_dir, out, _cfg())
    assert summary["processed"] == 1 and summary["skipped"] == N_SHARDS - 1
    assert not stray.exists()  # crashed partials wiped, no duplicate rows
    rec = load_lineage(out)[1]
    assert rec["attempt"] == 2  # prior uncommitted attempt detected
    for pid, m in keep_mtime.items():
        assert (out / "_lineage" / f"part={pid}.json").stat().st_mtime_ns == m

    assert _sorted_rows(out).equals(full)  # byte-identical after resume


def test_resume_matches_single_shot_byte_identical(ray_session, pages_dir, tmp_path):
    one_shot = tmp_path / "one"
    resumed = tmp_path / "two"
    run_extraction_job(pages_dir, one_shot, _cfg())

    # resumed job: first commit only shards {0, 2} by running on a pruned
    # input dir, then resume over the full dir
    partial_in = tmp_path / "partial_in"
    partial_in.mkdir()
    for i in (0, 2):
        shutil.copy(pages_dir / f"shard_{i:02d}.parquet", partial_in)
    # NOTE: pids are positional in the sorted shard list; with only two files
    # they'd get ids 0,1 — so instead prime the full run by crashing shards
    # 1 and 3 (delete their markers after a full run)
    shutil.rmtree(partial_in)
    run_extraction_job(pages_dir, resumed, _cfg())
    for pid in (1, 3):
        (resumed / "_lineage" / f"part={pid}.json").unlink()
        shutil.rmtree(resumed / f"part={pid}")
    run_extraction_job(pages_dir, resumed, _cfg())

    assert _sorted_rows(one_shot).equals(_sorted_rows(resumed))


def test_torn_lineage_json_treated_as_uncommitted(ray_session, pages_dir, tmp_path):
    out = tmp_path / "out"
    run_extraction_job(pages_dir, out, _cfg())
    marker = out / "_lineage" / "part=2.json"
    marker.write_text(json.dumps({"partition_id": 2})[:10])  # torn write
    assert 2 not in load_lineage(out)
    summary = run_extraction_job(pages_dir, out, _cfg())
    assert summary["processed"] == 1
    assert load_lineage(out)[2]["status"] == "done"


def test_job_timeout_then_resume(ray_session, pages_dir, tmp_path):
    """A hung/over-ceiling job raises JobTimeoutError after persisting the
    progress heartbeat; a resume completes the remainder with byte-identical
    output and no duplicate rows (simulated hung partition: ceiling 0)."""
    from ocr_pipeline_fastapi_latency_optimization_ray.state.lineage import (
        JobTimeoutError,
    )

    ref = tmp_path / "ref"
    run_extraction_job(pages_dir, ref, _cfg())
    full = _sorted_rows(ref)

    out = tmp_path / "out"
    with pytest.raises(JobTimeoutError):
        run_extraction_job(pages_dir, out, _cfg(), job_timeout_s=0.0)
    # heartbeat persisted; every uncommitted partition is reported stale
    st = job_status(out, pages_dir, stale_after_s=0.0)
    done_before = st["partitions_done"]
    assert done_before < N_SHARDS
    assert st["stale_partitions"], "hung partitions must be surfaced"
    assert set(st["stale_partitions"]).isdisjoint(
        set(load_lineage(out))
    )

    summary = run_extraction_job(pages_dir, out, _cfg())
    assert summary["processed"] == N_SHARDS - done_before
    assert _sorted_rows(out).equals(full)
    # post-completion status has rate + zero ETA
    st2 = job_status(out, pages_dir)
    assert st2["partitions_done"] == N_SHARDS
    assert st2["est_remaining_s"] == 0.0
    assert st2.get("rows_per_sec", 0) > 0


def test_job_status_rate_and_eta(ray_session, pages_dir, tmp_path):
    """G4 rate/ETA (ocr_app.py:932-947): with half the partitions committed,
    status reports rows/sec and a positive remaining estimate."""
    out = tmp_path / "out"
    run_extraction_job(pages_dir, out, _cfg())
    # drop two commit markers -> looks like a half-done job
    for pid in (1, 3):
        (out / "_lineage" / f"part={pid}.json").unlink()
    st = job_status(out, pages_dir)
    assert st["partitions_done"] == 2
    assert st["rows_per_sec"] > 0
    assert st["est_remaining_s"] > 0


def test_partition_writer_idempotent_under_replay(ray_session, pages_dir, tmp_path):
    """A re-executed writer task (same block content) must overwrite its
    data file, not add a duplicate, and its metric row must carry the same
    block_id (the driver dedupes on it) — ADVICE r1."""
    import pyarrow as pa

    from ocr_pipeline_fastapi_latency_optimization_ray.state.lineage import (
        PartitionWriter,
    )

    t = pq.read_table(pages_dir / "shard_00.parquet")
    t = t.append_column("shard", pa.array([0] * t.num_rows, pa.int32()))
    # the writer consumes extraction output; fake the needed metric columns
    for name, arr in [
        ("error", pa.array([None] * t.num_rows, pa.string())),
        ("n_blocks_kept", pa.array([1] * t.num_rows, pa.int32())),
        ("n_blocks_dropped", pa.array([0] * t.num_rows, pa.int32())),
        ("payload_bytes", pa.array([10] * t.num_rows, pa.int64())),
        ("extracted_bytes", pa.array([5] * t.num_rows, pa.int64())),
        ("extract_ms", pa.array([0.1] * t.num_rows, pa.float64())),
    ]:
        t = t.append_column(name, arr)
    out = tmp_path / "wout"
    w = PartitionWriter(str(out))
    m1 = w(t)
    m2 = w(t)  # replay of the same block
    assert m1["block_id"].to_pylist() == m2["block_id"].to_pylist()
    files = list((out / "part=0").glob("*.parquet"))
    assert len(files) == 1  # overwritten, not duplicated
    assert pq.ParquetFile(files[0]).metadata.num_rows == t.num_rows


def test_changed_input_shard_invalidates_commit(ray_session, pages_dir, tmp_path):
    """A shard whose bytes changed since commit is recomputed on resume;
    untouched shards stay skipped (input_fingerprint staleness check)."""
    import pyarrow as pa

    out = tmp_path / "out"
    run_extraction_job(pages_dir, out, _cfg())

    # rewrite shard 2 with different content (different size); copy2 keeps
    # mtime so the untouched shards fingerprint identically
    mod_dir = tmp_path / "mod_in"
    mod_dir.mkdir()
    for f in sorted(pages_dir.glob("*.parquet")):
        shutil.copy2(f, mod_dir / f.name)
    t = pq.read_table(mod_dir / "shard_02.parquet")
    pq.write_table(t.slice(0, 10), mod_dir / "shard_02.parquet")

    # copy the existing lineage/output as if the previous run used mod_dir
    summary = run_extraction_job(mod_dir, out, _cfg())
    assert summary["processed"] == 1 and summary["skipped"] == N_SHARDS - 1
    rec = load_lineage(out)[2]
    assert rec["row_count"] == 10
    assert _sorted_rows(out).shape[0] == (N_SHARDS - 1) * ROWS_PER_SHARD + 10


def test_same_size_rewrite_detected_via_mtime(ray_session, pages_dir, tmp_path):
    """A shard rewritten with identical byte size but different mtime is
    treated as changed (fingerprint includes st_mtime_ns — ADVICE r1: a
    name+size fingerprint silently served stale output)."""
    import os

    out = tmp_path / "out"
    run_extraction_job(pages_dir, out, _cfg())
    mod_dir = tmp_path / "mod_in"
    mod_dir.mkdir()
    for f in sorted(pages_dir.glob("*.parquet")):
        shutil.copy2(f, mod_dir / f.name)
    # same bytes, bumped mtime: simulates a same-size regeneration
    os.utime(mod_dir / "shard_01.parquet", ns=(1, 1))
    summary = run_extraction_job(mod_dir, out, _cfg())
    assert summary["processed"] == 1 and summary["skipped"] == N_SHARDS - 1


def test_cli_extract_and_resume(ray_session, tmp_path):
    """The ray-job CLI entry point: extract runs the partitioned job,
    re-running skips every committed partition, status reports totals."""
    import json

    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray import cli
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import (
        synth_pages_table,
    )

    pages = tmp_path / "pages"
    pages.mkdir()
    pq.write_table(synth_pages_table(120), pages / "p0.parquet")
    pq.write_table(synth_pages_table(120, start=120), pages / "p1.parquet")
    out = tmp_path / "out"

    rc = cli.main(["extract", "--input", str(pages), "--output", str(out),
                   "--num-partitions", "4"])
    assert rc == 0
    rc = cli.main(["status", "--output", str(out)])
    assert rc == 0
    # resume: nothing left to do
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["extract", "--input", str(pages), "--output", str(out),
                  "--num-partitions", "4"])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["processed"] == 0
    assert summary["skipped"] == summary["partitions"]
