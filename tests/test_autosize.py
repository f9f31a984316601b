"""RAM-aware actor-pool autosizing (PipelineConfig.autosize) must reproduce
the reference's production worker calculation over the RAM/CPU grid
(ocr_app.py:415-443 compute_optimal_workers: max(2, min(int((ram-4)/1.5),
cpus))) — including the deploy-host shape that yields 38 workers."""

import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig


def _ref_optimal(total_ram_gb, cpus, per=1.5, reserve=4.0):
    # literal transcription of the reference formula (ocr_app.py:428-433)
    available = max(0, total_ram_gb - reserve)
    return max(2, min(int(available / per), cpus))


@pytest.mark.parametrize("ram,cpus", [
    (61.0, 64),    # deploy-host shape: int(57/1.5) = 38 workers
    (128.0, 32),   # CPU-bound: 32
    (8.0, 16),     # RAM-bound small host: int(4/1.5) = 2
    (4.0, 8),      # below reserve: floor of 2
    (2.0, 1),      # tiny: floor of 2 still wins (reference max(2, ...))
    (16.0, 4),     # RAM allows 8, CPU caps at 4
    (1024.0, 256), # big node: CPU-bound 256
])
def test_autosize_matches_reference_grid(ram, cpus):
    cfg = PipelineConfig.autosize(total_ram_gb=ram, cpus=cpus)
    lo, hi = cfg.extract_concurrency
    assert lo == 2
    assert hi == _ref_optimal(ram, cpus)


def test_deploy_host_shape_is_38():
    cfg = PipelineConfig.autosize(total_ram_gb=61.0, cpus=64)
    assert cfg.extract_concurrency == (2, 38)


def test_autosize_probes_host_when_unspecified():
    cfg = PipelineConfig.autosize()
    lo, hi = cfg.extract_concurrency
    assert lo == 2 and hi >= 2


def test_autosize_passes_overrides():
    cfg = PipelineConfig.autosize(total_ram_gb=61.0, cpus=64,
                                  extract_batch_size=64)
    assert cfg.extract_batch_size == 64
    assert cfg.extract_concurrency == (2, 38)
