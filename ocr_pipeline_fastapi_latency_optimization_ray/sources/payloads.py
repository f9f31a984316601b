"""Deterministic stand-in payload format for the PDF/image branch.

The execution environment has no rasterizer, no image libraries and no layout
model (PyMuPDF / PIL / PaddleOCR are unavailable by design), so the binary
``html`` column carries a *deterministic fake document format* for PDF and
image payloads: a standard magic prefix (``%PDF`` / PNG signature — the same
magic bytes the classifier sniffs, analog of the reference's
extension-dispatch at FileIngestor.py:133-162) followed by a JSON body that
plays the role of the rasterized page content.

The JSON body describes per-page "ground truth" blocks: raw model label ids
(indexing the reference's 20-label space, DLA.py:62-80), a detection score, a
pixel bbox and the text under that region. ``LayoutStub.predict`` "detects"
exactly these blocks — a clearly-marked deterministic stand-in for
``LayoutDetection.predict`` (reference DLA.py:146-148) — and everything
downstream (score filter, score-desc sort, label mapping, box padding, D1
merge fixpoint, masking, region OCR) is the real pipeline.

This keeps the Ray-side plumbing (schemas, binary columns, actor signatures,
batch sizes) real and tested while the unavailable native decoders are
stubbed, as SURVEY.md §7.4 prescribes.
"""

from __future__ import annotations

import json

PDF_MAGIC = b"%PDF"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
_BODY_MARK = b"RAYXDOC "


def encode_fake_pdf(pages: list[dict]) -> bytes:
    """pages: [{"w": int, "h": int, "blocks": [{"cls_id": int, "score": float,
    "bbox": [x1,y1,x2,y2], "text": str}, ...]}, ...]"""
    body = json.dumps({"pages": pages}, sort_keys=True, separators=(",", ":"))
    return b"%PDF-1.4\n%" + _BODY_MARK + body.encode("utf-8") + b"\n%%EOF\n"


def encode_fake_image(page: dict) -> bytes:
    body = json.dumps({"pages": [page]}, sort_keys=True, separators=(",", ":"))
    return PNG_MAGIC + _BODY_MARK + body.encode("utf-8")


def decode_fake_doc(payload: bytes) -> list[dict]:
    """Decode pages from a fake PDF/image payload. Raises ValueError on a
    corrupt body (exercises the sentinel-error path)."""
    i = payload.find(_BODY_MARK)
    if i < 0:
        raise ValueError("unrecognized document payload (no body marker)")
    body = payload[i + len(_BODY_MARK):]
    end = body.rfind(b"\n%%EOF")
    if end >= 0:
        body = body[:end]
    try:
        doc = json.loads(body.decode("utf-8"))
        pages = doc["pages"]
        assert isinstance(pages, list)
        return pages
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"corrupt document payload: {e}") from e


def classify_payload_bytes(payload: bytes | None, text: str | None) -> str:
    """Magic-byte payload dispatch (analog of extension dispatch,
    FileIngestor.py:133-162): pdf | image | html | text | empty."""
    if payload is None or len(payload) == 0:
        if text:
            return "text"
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    if payload.startswith(PNG_MAGIC) or payload.startswith(JPEG_MAGIC):
        return "image"
    return "html"
