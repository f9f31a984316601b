"""Multimodal actor-pool stages: image featurize/resize, audio windowed
energy, video frame sampling.

Media flows as opaque ``binary`` columns (sources/media.py). Each stage is a
callable CLASS for ``map_batches(Cls, concurrency=N, batch_size=B)`` — codec
state (decoder tables, resize kernels; in a real deployment the model
weights) is built once per actor in ``__init__``, per the A1/A2 pattern the
reference pays per-document (DLA()/OCR() per job, ocr_app.py:989).

Decode itself is the deterministic STUB from sources/media.py (no
image/audio codecs in this container); every transform AFTER decode —
strided resize, per-channel stats, average-hash, framing, RMS windows — is
real vectorized numpy over the decoded arrays, which is exactly what the
production version would run.

Batch sizing: media payloads are large; callers should use a small
``batch_size`` (default 32 here) so batch x concurrency stays in worker
heap, letting the object store spill instead of the Python heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import decode_audio, decode_header, decode_image, decode_video_frame

DEFAULT_MEDIA_BATCH = 32


def _ahash64(gray: np.ndarray) -> int:
    """64-bit average hash of a grayscale image (8x8 strided downsample)."""
    h, w = gray.shape
    ys = np.linspace(0, h - 1, 8).astype(int)
    xs = np.linspace(0, w - 1, 8).astype(int)
    g = gray[np.ix_(ys, xs)]
    bits = (g > g.mean()).flatten()
    return int(np.packbits(bits).view(">u8")[0])


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the JPEG transform), built once per
    actor — C @ g @ C.T is the 2-D DCT of grayscale block ``g``."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    c[0] = np.sqrt(1.0 / n)
    return c


def _phash64(gray: np.ndarray, dct_c: np.ndarray) -> int:
    """64-bit perceptual hash (pHash): 2-D DCT of the 32x32 grayscale,
    keep the top-left 8x8 low-frequency block, threshold each AC
    coefficient against the block median (DC excluded from both the bits
    and the median — it only encodes brightness). Robust to resize /
    re-encode noise in a way aHash (plain mean threshold) is not."""
    d = dct_c @ gray @ dct_c.T
    block = d[:8, :8].flatten()
    ac = block[1:]
    med = np.median(ac)
    bits = np.concatenate([[False], ac > med])
    return int(np.packbits(bits).view(">u8")[0])


def _resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (index-gather, no Python loop)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(th) * h) // th, h - 1)
    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return img[np.ix_(ys, xs)]


class ImageFeaturizer:
    """(media_id, payload) -> per-image features + thumbnail stats.

    Output: media_id, width, height, mean_r/g/b, std_gray, ahash, error.
    """

    def __init__(self, thumb: tuple[int, int] = (32, 32)):
        self.thumb = thumb  # "model load" analog: fixed per-actor config

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        # payloads stay in the shared Arrow buffers; one row materializes
        # transiently per iteration (same pattern as stages/extract.py)
        payloads = (batch["payload"][i].as_py()
                    for i in range(batch.num_rows))
        out = {k: [] for k in
               ("media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                "std_gray", "ahash", "error")}
        for mid, p in zip(ids, payloads):
            out["media_id"].append(mid)
            try:
                img = decode_image(p)
                thumb = _resize_nearest(img, *self.thumb).astype(np.float64)
                gray = thumb.mean(axis=2)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["mean_r"].append(round(float(thumb[..., 0].mean()), 4))
                out["mean_g"].append(round(float(thumb[..., 1].mean()), 4))
                out["mean_b"].append(round(float(thumb[..., 2].mean()), 4))
                out["std_gray"].append(round(float(gray.std()), 4))
                out["ahash"].append(np.int64(np.uint64(_ahash64(gray))))
                out["error"].append(None)
            except ValueError as e:
                for k in ("width", "height"):
                    out[k].append(0)
                for k in ("mean_r", "mean_g", "mean_b", "std_gray"):
                    out[k].append(0.0)
                out["ahash"].append(np.int64(0))
                out["error"].append(str(e))
        return pa.Table.from_pydict(out)


class ImagePhasher:
    """(media_id, payload) -> 64-bit DCT perceptual hash per image.

    Output: media_id, phash, error. The DCT basis matrix is built ONCE in
    ``__init__`` (the per-actor "model load"); each image is one
    decode -> 32x32 grayscale -> two 32x32 matmuls.
    """

    def __init__(self, side: int = 32):
        self.side = side
        self.dct_c = _dct_matrix(side)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        # payloads stay in the shared Arrow buffers; one row materializes
        # transiently per iteration (same pattern as stages/extract.py)
        payloads = (batch["payload"][i].as_py()
                    for i in range(batch.num_rows))
        out = {"media_id": [], "phash": [], "error": []}
        for mid, p in zip(ids, payloads):
            out["media_id"].append(mid)
            try:
                img = decode_image(p)
                gray = _resize_nearest(img, self.side, self.side).astype(
                    np.float64).mean(axis=2)
                out["phash"].append(
                    np.int64(np.uint64(_phash64(gray, self.dct_c))))
                out["error"].append(None)
            except ValueError as e:
                out["phash"].append(np.int64(0))
                out["error"].append(str(e))
        return pa.Table.from_pydict(out)


class AudioFeaturizer:
    """(media_id, payload) -> windowed-RMS energy features.

    Output: media_id, sample_rate, n_samples, duration_s, n_frames,
    rms_mean, rms_max, error. Framing is a stride-trick view (zero-copy).
    """

    def __init__(self, frame: int = 1024, hop: int = 512):
        self.frame = frame
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        # payloads stay in the shared Arrow buffers; one row materializes
        # transiently per iteration (same pattern as stages/extract.py)
        payloads = (batch["payload"][i].as_py()
                    for i in range(batch.num_rows))
        out = {k: [] for k in
               ("media_id", "sample_rate", "n_samples", "duration_s",
                "n_frames", "rms_mean", "rms_max", "error")}
        for mid, p in zip(ids, payloads):
            out["media_id"].append(mid)
            try:
                pcm, sr = decode_audio(p)
                x = pcm.astype(np.float64) / 32768.0
                n = len(x)
                nf = max(0, 1 + (n - self.frame) // self.hop)
                frames = np.lib.stride_tricks.as_strided(
                    x, shape=(nf, self.frame),
                    strides=(x.strides[0] * self.hop, x.strides[0]),
                )
                rms = np.sqrt((frames ** 2).mean(axis=1)) if nf else np.zeros(0)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / sr, 4))
                out["n_frames"].append(nf)
                out["rms_mean"].append(round(float(rms.mean()), 6) if nf else 0.0)
                out["rms_max"].append(round(float(rms.max()), 6) if nf else 0.0)
                out["error"].append(None)
            except ValueError as e:
                for k in ("sample_rate", "n_samples", "n_frames"):
                    out[k].append(0)
                for k in ("duration_s", "rms_mean", "rms_max"):
                    out[k].append(0.0)
                out["error"].append(str(e))
        return pa.Table.from_pydict(out)


class VideoFrameSampler:
    """(media_id, payload) -> exploded rows, one per sampled frame.

    Samples every ``stride``-th frame (frame-sample semantics); output rows
    (media_id, frame_idx, ahash) — a row-multiplying map, so the stage is a
    ``map_batches`` UDF returning more rows than it received (never a
    driver-side loop).
    """

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        # payloads stay in the shared Arrow buffers; one row materializes
        # transiently per iteration (same pattern as stages/extract.py)
        payloads = (batch["payload"][i].as_py()
                    for i in range(batch.num_rows))
        o_id, o_frame, o_hash, o_err = [], [], [], []
        for mid, p in zip(ids, payloads):
            try:
                hdr = decode_header(p)
                if hdr.get("kind") != "video":
                    raise ValueError(f"not a video payload: kind={hdr.get('kind')}")
                for f in range(0, hdr["frames"], self.stride):
                    img = decode_video_frame(p, f)
                    gray = img.astype(np.float64).mean(axis=2)
                    o_id.append(mid)
                    o_frame.append(f)
                    o_hash.append(np.int64(np.uint64(_ahash64(gray))))
                    o_err.append(None)
            except ValueError as e:
                o_id.append(mid)
                o_frame.append(-1)
                o_hash.append(np.int64(0))
                o_err.append(str(e))
        return pa.Table.from_arrays(
            [
                pa.array(o_id, pa.int64()),
                pa.array(o_frame, pa.int32()),
                pa.array(o_hash, pa.int64()),
                pa.array(o_err, pa.string()),
            ],
            names=["media_id", "frame_idx", "ahash", "error"],
        )
