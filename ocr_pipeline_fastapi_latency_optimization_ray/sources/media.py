"""Deterministic stand-in media payloads (image / audio / video).

Multimodal columns are opaque ``binary`` payloads with typed metadata, per
the engine contract: the container ships no image/audio codecs (no PIL, no
cv2, no soundfile), so — exactly like sources/payloads.py for documents —
each payload is a real magic prefix followed by a tiny JSON header that a
deterministic generator expands into pixels / PCM samples. The decode step
is therefore a clearly-marked STUB with the real interface: swap
``decode_image``/``decode_audio`` for a codec call when the libraries exist
and nothing else in the Ray plumbing (schemas, batch shapes, actor
signatures) changes.

Pixel/PCM content is a pure function of the header seed (numpy
``RandomState`` — stable across processes and platforms), so every feature
computed downstream is reproducible row-for-row.
"""

from __future__ import annotations

import json

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"
MP4_MAGIC = b"\x00\x00\x00 ftypisom"
_MEDIA_MARK = b"RAYXMEDIA "


def encode_fake_image(seed: int, width: int, height: int) -> bytes:
    hdr = {"kind": "image", "seed": seed, "w": width, "h": height}
    return PNG_MAGIC + _MEDIA_MARK + _hdr_bytes(hdr)


def encode_fake_audio(seed: int, sample_rate: int, n_samples: int) -> bytes:
    hdr = {"kind": "audio", "seed": seed, "sr": sample_rate, "n": n_samples}
    return WAV_MAGIC + _MEDIA_MARK + _hdr_bytes(hdr)


def encode_fake_video(seed: int, width: int, height: int, n_frames: int,
                      fps: int = 8) -> bytes:
    hdr = {"kind": "video", "seed": seed, "w": width, "h": height,
           "frames": n_frames, "fps": fps}
    return MP4_MAGIC + _MEDIA_MARK + _hdr_bytes(hdr)


def _hdr_bytes(hdr: dict) -> bytes:
    return json.dumps(hdr, sort_keys=True, separators=(",", ":")).encode()


def decode_header(payload: bytes) -> dict:
    """Parse the typed metadata header. Raises ValueError on corrupt media
    (drives the sentinel-error path, same contract as documents)."""
    i = payload.find(_MEDIA_MARK)
    if i < 0:
        raise ValueError("unrecognized media payload (no header marker)")
    try:
        return json.loads(payload[i + len(_MEDIA_MARK):].decode("utf-8"))
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"corrupt media header: {e}") from e


def decode_image(payload: bytes) -> np.ndarray:
    """STUB decoder -> (h, w, 3) uint8. Real implementation: PIL.Image.open /
    cv2.imdecode over the binary column; unavailable in this container."""
    hdr = decode_header(payload)
    if hdr.get("kind") != "image":
        raise ValueError(f"not an image payload: kind={hdr.get('kind')}")
    rng = np.random.RandomState(np.uint32(hdr["seed"]))
    return rng.randint(0, 256, size=(hdr["h"], hdr["w"], 3), dtype=np.uint8)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """STUB decoder -> (int16 PCM mono, sample_rate). Real implementation:
    soundfile/librosa load; unavailable in this container."""
    hdr = decode_header(payload)
    if hdr.get("kind") != "audio":
        raise ValueError(f"not an audio payload: kind={hdr.get('kind')}")
    rng = np.random.RandomState(np.uint32(hdr["seed"]))
    # band-limited-ish deterministic signal: sum of a few random sinusoids
    n, sr = hdr["n"], hdr["sr"]
    t = np.arange(n, dtype=np.float64) / sr
    sig = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(50, sr / 4)
        a = rng.uniform(0.05, 0.25)
        sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16), sr


def decode_video_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """STUB frame decoder -> (h, w, 3) uint8 for one frame. Real
    implementation: pyav/ffmpeg seek+decode; unavailable in this container."""
    hdr = decode_header(payload)
    if hdr.get("kind") != "video":
        raise ValueError(f"not a video payload: kind={hdr.get('kind')}")
    if not (0 <= frame_idx < hdr["frames"]):
        raise ValueError(f"frame {frame_idx} out of range [0, {hdr['frames']})")
    rng = np.random.RandomState(np.uint32(hdr["seed"] * 1000003 + frame_idx))
    return rng.randint(0, 256, size=(hdr["h"], hdr["w"], 3), dtype=np.uint8)


def media_table_from_documents(batch, kinds=("image", "audio", "video")):
    """Deterministic media table derived from a documents batch:
    (media_id:int64, media_kind:string, payload:binary, meta fields).
    Pure function of doc_id -> safe to generate in parallel."""
    import pyarrow as pa

    doc_ids = batch["doc_id"].to_pylist()
    ids, knds, payloads = [], [], []
    for d in doc_ids:
        kind = kinds[d % len(kinds)]
        seed = (d * 2654435761) % (2**31)
        if kind == "image":
            payloads.append(encode_fake_image(seed, 64 + d % 64, 48 + d % 48))
        elif kind == "audio":
            payloads.append(encode_fake_audio(seed, 16000, 4000 + (d % 16) * 500))
        else:
            payloads.append(encode_fake_video(seed, 32, 24, 12 + d % 20))
        ids.append(d)
        knds.append(kind)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(knds, pa.string()),
            pa.array(payloads, pa.binary()),
        ],
        names=["media_id", "media_kind", "payload"],
    )
