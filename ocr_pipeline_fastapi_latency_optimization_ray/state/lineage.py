"""Resumable extraction job: per-partition lineage records + checkpoint resume.

Replaces the reference's mutable in-memory job store and "smart resume"
(ThreadSafeJobStore ocr_app.py:198-305; skip-if-output-exists
FileIngestor.py:246-251, 175-176) with a partition-granular manifest, per
SURVEY.md §4.3 and the north_rule ("resumable from checkpoint with
per-partition lineage + metrics").

Partition unit: one INPUT parquet shard (file). This is stronger than the
url-hash layout sketched in SURVEY.md §4.3: because the partition key is the
input file itself, a resume prunes finished partitions *at the read* — the
skipped data never leaves storage — instead of re-reading everything and
filtering. At 100 TB that is the difference between a free resume and a full
re-scan.

Output layout (resumable, never one giant file):

    out_dir/part=<pid>/<pid>-<rand>.parquet     one file per output block
    out_dir/_lineage/part=<pid>.json            commit marker, written LAST

Lineage record fields mirror the reference's job record + progress
(ocr_app.py:1243-1259, 932-947): row counts, blocks kept/dropped, bytes
in/out, wall seconds, status, attempt, error.

Streaming commit: the writer runs INSIDE ``map_batches`` (data files are
written by workers as blocks complete) and emits tiny per-block metric rows.
The driver consumes the metric stream with ``iter_batches`` — a few bytes
per block, never the data — and commits a partition's lineage JSON the
moment its accumulated row count reaches the expected count from the input
file's parquet footer. A crash mid-job therefore loses only partitions that
were genuinely incomplete; every committed partition is skipped on resume.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import apply_data_context, PipelineConfig

LINEAGE_DIR = "_lineage"

# Schema of the metric rows flowing writer -> driver (one per written block).
# block_id is a content digest: the driver dedupes metric rows on
# (shard, block_id) so a re-executed writer task (worker death, block
# recompute after eviction) never double-counts.
METRIC_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("block_id", pa.string()),
        ("rows", pa.int64()),
        ("n_errors", pa.int64()),
        ("blocks_kept", pa.int64()),
        ("blocks_dropped", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("extract_ms", pa.float64()),
    ]
)

PROGRESS_FILE = "progress.json"


class JobTimeoutError(RuntimeError):
    """Raised when a job exceeds its wall ceiling (the reference's per-job
    3600 s reaper, ocr_app.py:642-655, 922-930). Committed partitions
    survive; a resume reprocesses only the hung remainder."""


def list_input_shards(input_dir: str | Path) -> list[Path]:
    """Deterministic shard list: sorted parquet files under ``input_dir``."""
    return sorted(Path(input_dir).glob("*.parquet"))


def load_lineage(out_dir: str | Path) -> dict[int, dict]:
    """Committed lineage records keyed by partition id."""
    ldir = Path(out_dir) / LINEAGE_DIR
    records: dict[int, dict] = {}
    if not ldir.is_dir():
        return records
    for f in sorted(ldir.glob("part=*.json")):
        try:
            rec = json.loads(f.read_text())
        except (json.JSONDecodeError, OSError):
            continue  # torn write: treat as not committed
        if rec.get("status") == "done":
            records[int(rec["partition_id"])] = rec
    return records


class PartitionWriter:
    """``map_batches`` UDF: writes each block's rows under their shard dirs,
    emits one metric row per (shard, block). Data files land on workers;
    only metrics flow to the driver.

    Idempotent under Ray task retry/recompute: the data-file name is a
    CONTENT digest of the block's url column, written to a temp name and
    published with an atomic rename — a re-executed task overwrites the
    same file instead of adding a duplicate, and its metric row carries the
    same block_id, which the driver dedupes. (Blocks are deterministic
    per input shard: batch_size=None preserves read-block boundaries.)"""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        out_rows = {k: [] for k in METRIC_SCHEMA.names}
        shards = batch["shard"].to_numpy(zero_copy_only=False)
        for pid in np.unique(shards):
            tbl = batch.filter(pa.array(shards == pid))
            part_dir = Path(self.out_dir) / f"part={int(pid)}"
            part_dir.mkdir(parents=True, exist_ok=True)
            h = hashlib.blake2b(digest_size=12)
            h.update(str(int(pid)).encode())
            h.update("\x00".join(tbl["url"].to_pylist()).encode())
            block_id = h.hexdigest()
            final = part_dir / f"{int(pid)}-{block_id}.parquet"
            tmp = part_dir / f".{int(pid)}-{block_id}.{os.getpid()}.tmp"
            pq.write_table(tbl.drop_columns(["shard"]), tmp)
            tmp.replace(final)  # atomic publish; retry overwrites, not adds
            errs = sum(1 for e in tbl["error"].to_pylist() if e)
            out_rows["shard"].append(int(pid))
            out_rows["block_id"].append(block_id)
            out_rows["rows"].append(tbl.num_rows)
            out_rows["n_errors"].append(errs)
            out_rows["blocks_kept"].append(
                int(pa.compute.sum(tbl["n_blocks_kept"]).as_py() or 0)
            )
            out_rows["blocks_dropped"].append(
                int(pa.compute.sum(tbl["n_blocks_dropped"]).as_py() or 0)
            )
            out_rows["bytes_in"].append(
                int(pa.compute.sum(tbl["payload_bytes"]).as_py() or 0)
            )
            out_rows["bytes_out"].append(
                int(pa.compute.sum(tbl["extracted_bytes"]).as_py() or 0)
            )
            out_rows["extract_ms"].append(
                float(pa.compute.sum(tbl["extract_ms"]).as_py() or 0.0)
            )
        return pa.Table.from_pydict(out_rows, schema=METRIC_SCHEMA)


def run_extraction_job(
    input_dir: str | Path,
    out_dir: str | Path,
    cfg: PipelineConfig | None = None,
    job_timeout_s: float | None = None,
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict.

    Idempotent: partitions with a committed lineage record are pruned at the
    read; partially-written partition dirs (a previous crash) are wiped
    before reprocessing so output never contains duplicate rows.

    ``job_timeout_s``: wall ceiling for this run (the reference's stale-job
    reaper analog, ocr_app.py:642-655, 922-930). On breach the run raises
    JobTimeoutError after persisting per-partition progress heartbeats
    (``_lineage/progress.json``); already-committed partitions stay
    committed and a resume call processes only the remainder.
    """
    import ray.data

    from ..pipelines.extract import build_extraction_pipeline

    cfg = cfg or PipelineConfig()
    apply_data_context(cfg)  # block-size target for payload-heavy corpora
    out_dir = Path(out_dir)
    shards = list_input_shards(input_dir)
    if not shards:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    done = load_lineage(out_dir)
    # staleness check: a committed record only skips its shard if the input
    # file still matches the fingerprint recorded at commit time (name +
    # size); a changed shard is recomputed and its stale output wiped
    stale = {
        pid
        for pid, rec in done.items()
        if pid < len(shards)
        and rec.get("input_fingerprint")
        and rec["input_fingerprint"] != _fingerprint(shards[pid])
    }
    for pid in stale:
        (out_dir / LINEAGE_DIR / f"part={pid}.json").unlink(missing_ok=True)
        done.pop(pid)
    todo = [(pid, p) for pid, p in enumerate(shards) if pid not in done]
    t_job = time.perf_counter()
    if not todo:
        return {
            "partitions": len(shards),
            "skipped": len(shards),
            "processed": 0,
            "rows": sum(r["row_count"] for r in done.values()),
            "wall_s": 0.0,
        }

    # wipe partial output of crashed attempts (no commit marker -> not done)
    attempts: dict[int, int] = {}
    for pid, _ in todo:
        part_dir = out_dir / f"part={pid}"
        if part_dir.exists():
            shutil.rmtree(part_dir)
            attempts[pid] = 2  # evidence of a prior uncommitted attempt
    (out_dir / LINEAGE_DIR).mkdir(parents=True, exist_ok=True)

    # expected per-shard row counts from parquet footers (metadata-only read;
    # extraction emits exactly one output row per input row, errors included)
    expected = {pid: pq.ParquetFile(p).metadata.num_rows for pid, p in todo}
    pid_of_path = {str(p.resolve()): pid for pid, p in todo}

    def tag_shard(batch: pa.Table) -> pa.Table:
        pids = [pid_of_path[p] for p in batch["path"].to_pylist()]
        return batch.drop_columns(["path"]).append_column(
            "shard", pa.array(pids, pa.int32())
        )

    ds = ray.data.read_parquet(
        [str(p) for _, p in todo],
        columns=["url", "html", "text", "lang"],
        include_paths=True,
    ).map_batches(tag_shard, batch_format="pyarrow", batch_size=None)
    extracted = build_extraction_pipeline(ds, cfg)
    metrics = extracted.map_batches(
        PartitionWriter(str(out_dir)), batch_format="pyarrow", batch_size=None
    )

    # driver-side commit loop over the tiny metric stream
    num_cols = [n for n in METRIC_SCHEMA.names if n not in ("shard", "block_id")]
    acc: dict[int, dict] = {
        pid: dict.fromkeys(num_cols, 0) for pid in expected
    }
    committed: set[int] = set()
    seen_blocks: set[tuple[int, str]] = set()  # retry dedup (ADVICE r1)
    for pid in expected:  # zero-row shards are trivially complete
        if expected[pid] == 0:
            _commit(out_dir, pid, shards[pid], acc[pid], 0.0,
                    attempts.get(pid, 1))
            committed.add(pid)
    it = metrics.iter_batches(batch_format="pyarrow", batch_size=None)
    try:
        for mb in it:
            now = time.perf_counter()
            for row in mb.to_pylist():
                pid = row["shard"]
                key = (pid, row["block_id"])
                if key in seen_blocks:
                    continue  # re-executed writer task: already counted
                seen_blocks.add(key)
                a = acc[pid]
                for k in num_cols:
                    a[k] += row[k]
                if a["rows"] >= expected[pid] and pid not in committed:
                    _commit(out_dir, pid, shards[pid], a, now - t_job,
                            attempts.get(pid, 1))
                    committed.add(pid)
            _write_progress(out_dir, acc, expected, committed)
            if job_timeout_s is not None and (
                time.perf_counter() - t_job
            ) > job_timeout_s:
                raise JobTimeoutError(
                    f"job exceeded {job_timeout_s}s; committed "
                    f"{len(committed)}/{len(expected)} partitions — resume "
                    f"to process the rest"
                )
    finally:
        close = getattr(it, "close", None)
        if close:
            close()  # stop the streaming executor on abnormal exit
    wall = time.perf_counter() - t_job
    # defensive: commit any partition that reached its count between batches
    missing = [pid for pid in expected if pid not in load_lineage(out_dir)]
    if missing:
        raise RuntimeError(
            f"partitions incomplete after stream end: {missing} "
            f"(rows seen: {[(p, acc[p]['rows'], expected[p]) for p in missing]})"
        )
    return {
        "partitions": len(shards),
        "skipped": len(done),
        "processed": len(committed),
        "rows": sum(a["rows"] for a in acc.values())
        + sum(r["row_count"] for r in done.values()),
        "wall_s": round(wall, 3),
    }


def _fingerprint(p: Path) -> str:
    # name + size + mtime_ns: a shard rewritten with different content but
    # identical byte size is still detected as changed (ADVICE r1)
    st = p.stat()
    return f"{p.name}:{st.st_size}:{st.st_mtime_ns}"


def _write_progress(out_dir: Path, acc: dict, expected: dict,
                    committed: set) -> None:
    """Per-partition heartbeat: rows seen so far + wall timestamp for every
    uncommitted partition. Torn writes are harmless (tmp + atomic rename);
    consumers treat a stale timestamp as a hung partition."""
    rec = {
        "updated_at": time.time(),
        "partitions": {
            str(pid): {"rows": acc[pid]["rows"], "expected": expected[pid]}
            for pid in expected
            if pid not in committed
        },
    }
    tmp = out_dir / LINEAGE_DIR / f".{PROGRESS_FILE}.tmp"
    tmp.write_text(json.dumps(rec))
    tmp.replace(out_dir / LINEAGE_DIR / PROGRESS_FILE)


def _commit(out_dir: Path, pid: int, input_file: Path, a: dict,
            wall_s: float, attempt: int) -> None:
    rec = {
        "partition_id": pid,
        "input_file": input_file.name,
        "input_fingerprint": _fingerprint(input_file),
        "row_count": a["rows"],
        "n_errors": a["n_errors"],
        "blocks_kept": a["blocks_kept"],
        "blocks_dropped": a["blocks_dropped"],
        "bytes_in": a["bytes_in"],
        "bytes_out": a["bytes_out"],
        "extract_ms": round(a["extract_ms"], 3),
        "wall_s": round(wall_s, 3),
        "status": "done",
        "attempt": attempt,
        "error": None,
    }
    tmp = out_dir / LINEAGE_DIR / f".part={pid}.json.tmp"
    final = out_dir / LINEAGE_DIR / f"part={pid}.json"
    tmp.write_text(json.dumps(rec))
    tmp.replace(final)  # atomic commit marker


def read_output(out_dir: str | Path):
    """Dataset over the committed partitions only."""
    import ray.data

    done = load_lineage(out_dir)
    files = [
        str(f)
        for pid in sorted(done)
        for f in sorted((Path(out_dir) / f"part={pid}").glob("*.parquet"))
    ]
    return ray.data.read_parquet(files)


def job_status(out_dir: str | Path, input_dir: str | Path | None = None,
               stale_after_s: float | None = None) -> dict:
    """Aggregate job progress from lineage records alone (the G3/G4 analog:
    counts by status + totals + rate/ETA, ocr_app.py:286-297, 932-947).

    Rate is rows per elapsed wall second (elapsed = the latest commit's
    ``wall_s``, i.e. time from job start — partitions run in parallel, so
    per-partition wall times must not be summed). ETA extrapolates the
    per-partition pace over the remaining count.

    ``stale_after_s``: partitions present in the progress heartbeat whose
    last update is older than this are reported in ``stale_partitions`` —
    the stale-reaper signal (ocr_app.py:642-655) a supervisor would use to
    kill and resume the job."""
    done = load_lineage(out_dir)
    total = len(list_input_shards(input_dir)) if input_dir else None
    out = {
        "partitions_done": len(done),
        "partitions_total": total,
        "rows": sum(r["row_count"] for r in done.values()),
        "n_errors": sum(r["n_errors"] for r in done.values()),
        "bytes_in": sum(r["bytes_in"] for r in done.values()),
        "bytes_out": sum(r["bytes_out"] for r in done.values()),
        "blocks_kept": sum(r["blocks_kept"] for r in done.values()),
        "blocks_dropped": sum(r["blocks_dropped"] for r in done.values()),
    }
    if total:
        out["percent"] = round(100.0 * len(done) / total, 2)
    elapsed = max((r["wall_s"] for r in done.values()), default=0.0)
    if done and elapsed > 0:
        out["rows_per_sec"] = round(out["rows"] / elapsed, 1)
        if total and total > len(done):
            out["est_remaining_s"] = round(
                (total - len(done)) * elapsed / len(done), 3
            )
    if total is not None and total == len(done):
        out["est_remaining_s"] = 0.0
    prog_f = Path(out_dir) / LINEAGE_DIR / PROGRESS_FILE
    if stale_after_s is not None and prog_f.exists():
        try:
            prog = json.loads(prog_f.read_text())
        except (json.JSONDecodeError, OSError):
            prog = None
        if prog and time.time() - prog["updated_at"] > stale_after_s:
            out["stale_partitions"] = sorted(
                int(p) for p in prog["partitions"] if int(p) not in done
            )
    return out
