"""The audit-sink production switch must be result-neutral: with
``RAY_GRAFT_DISABLE_AUDIT_SINK=1`` the sink-audited operators compute
bit-identical results fully streaming, without touching their /tmp
sinks (functions/audit_sink.py)."""

import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_sinks(monkeypatch):
    monkeypatch.setenv("RAY_GRAFT_DISABLE_AUDIT_SINK", "1")


def _paths():
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import (
        multimodal, similarity,
    )

    return [similarity.ANN_LSH_CAND_DIR, similarity.ANN_IVF_CAND_DIR,
            multimodal.AHASH_SIGS_DIR, multimodal.VIDEO_FRAME_SIGS_DIR]


def test_disable_switch_is_result_neutral_and_sinkless(ray_session, no_sinks):
    import os

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import (
        multimodal, similarity,
    )

    for d in _paths():
        shutil.rmtree(d, ignore_errors=True)
    disabled = {
        "lsh": similarity.ann_lsh_topk(SF),
        "ivf": similarity.ann_ivf_topk(SF),
        "ahash": multimodal.image_ahash_dedup_mirrored(SF),
        "video": multimodal.video_scene_cuts(SF),
    }
    # the disabled path must not create ANY sink directory
    assert not any(os.path.isdir(d) for d in _paths())
    # and must agree bit-for-bit with the audited path
    os.environ.pop("RAY_GRAFT_DISABLE_AUDIT_SINK", None)
    audited = {
        "lsh": similarity.ann_lsh_topk(SF),
        "ivf": similarity.ann_ivf_topk(SF),
        "ahash": multimodal.image_ahash_dedup_mirrored(SF),
        "video": multimodal.video_scene_cuts(SF),
    }
    for k in disabled:
        pd.testing.assert_frame_equal(
            disabled[k].reset_index(drop=True),
            audited[k].reset_index(drop=True), obj=k)
