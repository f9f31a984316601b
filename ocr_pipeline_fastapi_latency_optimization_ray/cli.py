"""Cluster job entry point: ``python -m ocr_pipeline_fastapi_latency_optimization_ray.cli``.

The operational surface the north rule names (`ray job submit` on a
fixed-size cluster). On a cluster:

    ray job submit --working-dir . -- \
        python -m ocr_pipeline_fastapi_latency_optimization_ray.cli extract \
        --input s3://bucket/pages/ --output s3://bucket/out/ --num-partitions 4096

The job driver connects to the cluster Ray (``RAY_ADDRESS`` is set inside
``ray job submit``'s environment); standalone runs fall back to a local
session. Re-submitting the same command RESUMES: committed partitions are
pruned at the read via the lineage manifest (state/lineage.py), so a
preempted job costs only its unfinished partitions — the reference's
smart-resume semantics (ocr_app.py's resumable job store, D4) at
partition granularity.

Subcommands:
  extract  run (or resume) the partitioned extraction job
  status   print the job's lineage status (done/total, rows/sec, ETA)
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():  # ray job submit / tests may already own it
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ocr_pipeline_fastapi_latency_optimization_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run or resume the extraction job")
    pe.add_argument("--input", required=True, help="pages parquet dir")
    pe.add_argument("--output", required=True, help="output/lineage dir")
    pe.add_argument("--num-partitions", type=int, default=None,
                    help="hash partitions for the output layout")
    pe.add_argument("--batch-size", type=int, default=None)
    pe.add_argument("--concurrency", type=int, default=None,
                    help="extract actor-pool size")
    pe.add_argument("--num-cpus", type=int, default=None,
                    help="local fallback only; ignored under ray job submit")
    pe.add_argument("--timeout-s", type=float, default=None)

    ps = sub.add_parser("status", help="print lineage job status")
    ps.add_argument("--output", required=True)
    ps.add_argument("--input", default=None)

    args = p.parse_args(argv)

    if args.cmd == "extract":
        _ensure_ray(args.num_cpus)
        from .config import PipelineConfig
        from .state.lineage import run_extraction_job

        overrides = {}
        if args.num_partitions:
            overrides["num_partitions"] = args.num_partitions
        if args.batch_size:
            overrides["extract_batch_size"] = args.batch_size
        if args.concurrency:
            overrides["extract_concurrency"] = args.concurrency
        summary = run_extraction_job(
            args.input, args.output, PipelineConfig(**overrides),
            job_timeout_s=args.timeout_s,
        )
        print(json.dumps(summary, default=str))
        return 0

    if args.cmd == "status":
        from .state.lineage import job_status

        print(json.dumps(job_status(args.output, args.input), default=str))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
