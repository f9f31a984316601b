"""Multimodal stage tests: deterministic decode stubs, feature math,
exploded frame sampling, corrupt-payload sentinels, Ray plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.sources.media import (
    decode_audio,
    decode_image,
    decode_video_frame,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    media_table_from_documents,
)
from ocr_pipeline_fastapi_latency_optimization_ray.stages.multimodal import (
    AudioFeaturizer,
    ImageFeaturizer,
    VideoFrameSampler,
    _ahash64,
    _resize_nearest,
)


def _batch(ids, payloads):
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
        names=["media_id", "payload"],
    )


def test_decoders_deterministic():
    p = encode_fake_image(7, 40, 30)
    a, b = decode_image(p), decode_image(p)
    assert a.shape == (30, 40, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)

    q = encode_fake_audio(7, 16000, 2048)
    (x1, sr1), (x2, _) = decode_audio(q), decode_audio(q)
    assert sr1 == 16000 and x1.dtype == np.int16 and len(x1) == 2048
    assert np.array_equal(x1, x2)

    v = encode_fake_video(7, 16, 12, 6)
    f0, f0b = decode_video_frame(v, 0), decode_video_frame(v, 0)
    assert np.array_equal(f0, f0b)
    assert not np.array_equal(f0, decode_video_frame(v, 1))
    with pytest.raises(ValueError):
        decode_video_frame(v, 6)


def test_decode_wrong_kind_raises():
    with pytest.raises(ValueError, match="not an image"):
        decode_image(encode_fake_audio(1, 16000, 100))


def test_resize_and_ahash():
    img = np.arange(2 * 100 * 80 * 3, dtype=np.uint8).reshape(200, 80, 3)[:100]
    th = _resize_nearest(img, 10, 8)
    assert th.shape == (10, 8, 3)
    gray = th.astype(float).mean(axis=2)
    h1, h2 = _ahash64(gray), _ahash64(gray)
    assert h1 == h2 and 0 <= h1 < 2 ** 64


def test_image_featurizer_batch():
    ids = [1, 2]
    payloads = [encode_fake_image(11, 64, 48), b"\x89PNG\r\n\x1a\ngarbage"]
    out = ImageFeaturizer()(_batch(ids, payloads)).to_pydict()
    assert out["media_id"] == [1, 2]
    assert out["width"][0] == 64 and out["height"][0] == 48
    assert out["error"][0] is None and out["error"][1]  # corrupt -> sentinel
    assert out["ahash"][0] != 0


def test_audio_featurizer_windows():
    p = encode_fake_audio(3, 16000, 4096)
    out = AudioFeaturizer(frame=1024, hop=512)(_batch([9], [p])).to_pydict()
    # 1 + (4096-1024)//512 = 7 frames
    assert out["n_frames"] == [7]
    assert out["duration_s"] == [0.256]
    assert 0 < out["rms_mean"][0] <= out["rms_max"][0] < 1


def test_video_sampler_explodes_rows():
    p = encode_fake_video(5, 16, 12, 10)
    out = VideoFrameSampler(stride=4)(_batch([4], [p])).to_pydict()
    assert out["frame_idx"] == [0, 4, 8]
    assert out["media_id"] == [4, 4, 4]
    assert len(set(out["ahash"])) == 3  # distinct frames -> distinct hashes


def test_media_table_schema():
    docs = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64())})
    t = media_table_from_documents(docs)
    assert t.column_names == ["media_id", "media_kind", "payload"]
    kinds = t["media_kind"].to_pylist()
    assert set(kinds) == {"image", "audio", "video"}
    # deterministic: regenerating gives identical payload bytes
    t2 = media_table_from_documents(docs)
    assert t["payload"].to_pylist() == t2["payload"].to_pylist()


def test_pipelines_end_to_end(ray_session):
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    img = multimodal.image_features(sf)
    aud = multimodal.audio_features(sf)
    vid = multimodal.video_frame_hashes(sf)
    assert len(img) > 0 and img["error"].isna().all()
    assert len(aud) > 0 and aud["error"].isna().all()
    assert len(vid) > 0 and (vid["frame_idx"] >= 0).all()
    # kinds partition the doc space
    n_docs = img.shape[0] + aud.shape[0] + vid["media_id"].nunique()
    import pyarrow.parquet as pq

    assert n_docs == pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    # determinism across runs
    img2 = multimodal.image_features(sf)
    assert img.equals(img2)


def test_banded_hamming_candidates_planted(ray_session):
    """The shared banded-LSH machinery under the image guise: exact dup
    (hamming 0), near dup (2 flipped bits — inside pigeonhole guarantee),
    far pair (scattered bits across all bands — must be absent)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.dedup import (
        banded_hamming_candidates,
    )

    base = np.int64(0x1234_5678_9ABC_DEF0)
    sigs = pd.DataFrame({
        "media_id": np.array([1, 2, 3, 4, 5], np.int64),
        "ahash": np.array([
            base,                       # 1
            base,                       # 2: exact dup of 1 (hamming 0)
            base ^ np.int64(0b101),     # 3: hamming 2 from 1/2
            base ^ np.int64(
                (1 << 0) | (1 << 17) | (1 << 33) | (1 << 49)
                | (1 << 5) | (1 << 21) | (1 << 37) | (1 << 53)),  # 4: 2 bits
                                        #    flipped in EVERY band -> no
                                        #    shared band, unreachable
            np.int64(-1) ^ base,        # 5: hamming 64
        ], np.int64),
    })
    ds = ray.data.from_pandas(sigs)
    out = banded_hamming_candidates(ds, max_hamming=6,
                                    id_col="media_id", sig_col="ahash")
    got = set(map(tuple, out[["doc_a", "doc_b", "hamming"]].to_numpy()))
    assert (1, 2, 0) in got
    assert (1, 3, 2) in got and (2, 3, 2) in got
    assert not any(4 in (a, b) or 5 in (a, b) for a, b, _ in got)


def test_image_ahash_dedup_runs_and_deterministic(ray_session):
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    out1 = multimodal.image_ahash_dedup(sf)
    out2 = multimodal.image_ahash_dedup(sf)
    assert list(out1.columns) == ["media_a", "media_b", "hamming"]
    assert out1.equals(out2)
    if len(out1):
        assert (out1.hamming <= 6).all() and (out1.media_a < out1.media_b).all()


def test_image_ahash_dedup_mirrored_finds_planted_pairs(ray_session):
    """The mirrored probe MUST surface every planted byte-identical
    re-upload as an (id, id + offset, hamming=0) pair through the full
    decode -> ahash -> banded-LSH path, and any extra pair must respect
    the hamming threshold."""
    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    out = multimodal.image_ahash_dedup_mirrored(sf)
    doc_ids = pq.read_table(f"{sf}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    planted = {
        (d, d + multimodal.AHASH_MIRROR_OFFSET)
        for d in doc_ids
        if d % 3 == 0 and d % multimodal.AHASH_MIRROR_EVERY == 0
    }
    assert planted, "fixture must contain at least one planted pair"
    got = set(zip(out.media_a.tolist(), out.media_b.tolist()))
    missing = planted - got
    assert not missing, f"planted pairs not found: {sorted(missing)[:5]}"
    zero = out.set_index(["media_a", "media_b"]).hamming
    assert all(zero.loc[p] == 0 for p in planted)
    assert (out.hamming <= 6).all() and (out.media_a < out.media_b).all()


def test_video_scene_cuts_boundaries_and_counts(ray_session):
    """Stub frames are independent random rasters (hamming ~32 between any
    two), so the cut threshold is pinned at its extremes: max_hamming=64
    can never fire (popcount <= 64), max_hamming=0 fires at EVERY
    consecutive boundary; frame counts follow the header's closed form
    (ceil(frames / stride))."""
    import numpy as np
    import pyarrow.compute as pc

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import multimodal
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.media import (
        decode_header,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.multimodal import (
        _kind, media_dataset,
    )

    sf = "/root/testdata/sf0.001"
    none = multimodal.video_scene_cuts(sf, max_hamming=64)
    assert len(none) > 0
    assert (none.n_cuts == 0).all()
    every = multimodal.video_scene_cuts(sf, max_hamming=0)
    # random 64-bit hashes collide with probability ~2^-64: every
    # consecutive pair differs, so every boundary is a cut
    assert (every.n_cuts == every.n_frames - 1).all()
    # frame counts match the payload headers (stride 4)
    vids = _kind(media_dataset(sf), "video").to_pandas()
    expect = {int(r.media_id): -(-decode_header(r.payload)["frames"] // 4)
              for r in vids.itertuples()}
    got = dict(zip(every.media_id.astype(int), every.n_frames.astype(int)))
    assert got == expect
    # mean hamming of independent rasters concentrates near 32 bits
    assert 24 < every.mean_hamming.mean() < 40


def test_phash_deterministic_and_tone_robust():
    """pHash must be bit-identical across calls, robust to a global
    brightness shift (which flips many aHash bits), and far from the hash
    of an unrelated image."""
    import numpy as np

    from ocr_pipeline_fastapi_latency_optimization_ray.stages.multimodal import (
        _ahash64,
        _dct_matrix,
        _phash64,
    )

    rng = np.random.RandomState(7)
    g = rng.randint(0, 200, size=(32, 32)).astype(np.float64)
    c = _dct_matrix(32)
    h1, h2 = _phash64(g, c), _phash64(g, c)
    assert h1 == h2
    # brightness shift: DC-only change -> pHash identical (DC excluded)
    h_shift = _phash64(g + 40.0, c)
    assert h_shift == h1
    # the same shift flips aHash bits unless the image is degenerate
    g2 = rng.randint(0, 200, size=(32, 32)).astype(np.float64)
    h_other = _phash64(g2, c)
    assert bin(h1 ^ h_other).count("1") > 10  # unrelated images far apart


def test_image_phash_dedup_runs_and_deterministic(ray_session):
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    out1 = multimodal.image_phash_dedup(sf)
    out2 = multimodal.image_phash_dedup(sf)
    assert list(out1.columns) == ["media_a", "media_b", "hamming"]
    assert out1.equals(out2)
    if len(out1):
        assert (out1.hamming <= 10).all() and (out1.media_a < out1.media_b).all()


def test_audio_vad_segments_structure(ray_session):
    """VAD over the stub sinusoid mixes must be deterministic and
    NON-DEGENERATE: the beating pattern yields real on/off runs (more
    than one segment for most files), and the gaps-and-islands invariants
    hold row by row."""
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    out1 = multimodal.audio_vad_segments(sf)
    out2 = multimodal.audio_vad_segments(sf)
    assert out1.equals(out2)
    assert len(out1) > 0
    ok = out1[out1.error.isna()]
    assert len(ok) > 0
    # invariants: active frames bound segments; longest fits inside active
    assert (ok.n_active <= ok.n_frames).all()
    assert (ok.n_segments <= ok.n_active).all() or (ok.n_active == 0).any()
    assert (ok.longest_segment <= ok.n_active).all()
    # non-degenerate: the relative gate actually splits files
    assert (ok.n_segments > 1).sum() > len(ok) // 2


def test_audio_vad_segments_hand_case(ray_session):
    """Hand-derived gaps-and-islands check: a signal alternating loud and
    silent frames must produce exactly the planted segments."""
    import numpy as np

    frame = 4
    hop = 4
    # 6 frames: loud, loud, silent, silent, loud, silent
    pattern = [1.0, 1.0, 0.0, 0.0, 1.0, 0.0]
    pcm = np.concatenate([
        np.full(frame, 20000.0 * a, dtype=np.float64) for a in pattern
    ]).astype(np.int16)
    # the stub decoder re-synthesizes from the seed, so drive the
    # segmenter's framing/gating math directly on the planted PCM
    x = pcm.astype(np.float64) / 32768.0
    nf = 1 + (len(x) - frame) // hop
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(nf, frame), strides=(x.strides[0] * hop, x.strides[0]))
    rms = np.sqrt((frames ** 2).mean(axis=1))
    active = rms >= rms.mean()
    starts = np.flatnonzero(np.diff(
        np.concatenate(([0], active.view(np.int8)))) == 1)
    ends = np.flatnonzero(np.diff(
        np.concatenate((active.view(np.int8), [0]))) == -1)
    assert list(starts) == [0, 4] and list(ends) == [1, 4]
