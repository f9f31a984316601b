"""corpus_temperature_mix (pipelines/text_analysis.py): the alpha=0.5
temperature flattening must keep the smallest source fully and downsample
source s at ~sqrt(n_min/n_s) — checked at sf0.1 where the family mix
skews per-source counts 5:2.5:1."""

import numpy as np

from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import text_analysis

SF_DIR = "/root/testdata/sf0.1"


def test_temperature_flattening_rates(ray_session):
    mixed = text_analysis.corpus_mix(SF_DIR)
    flat = text_analysis.corpus_temperature_mix(SF_DIR)
    n_in = mixed.groupby("source").size()
    n_out = flat.groupby("source").size().reindex(n_in.index, fill_value=0)
    n_min = int(n_in.min())
    expected = np.sqrt(n_min / n_in.to_numpy(float))
    got = n_out.to_numpy(float) / n_in.to_numpy(float)
    # hash-threshold selection ~ binomial: 3 sigma at n>=50 is well under 0.15
    assert np.all(np.abs(got - expected) < 0.15), (
        dict(zip(n_in.index, zip(got.round(3), expected.round(3)))))
    # exactness at the boundary: smallest source keeps 100% by construction
    smallest = n_in.idxmin()
    assert n_out[smallest] == n_in[smallest]
    # kept set is a subset of the mixed set (stage 2 only removes rows)
    assert set(flat["doc_id"]) <= set(mixed["doc_id"])
