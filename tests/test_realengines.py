"""Gated REAL-engine integration tests (round-4 VERDICT next-#5).

Every driver-visible run in this container uses the deterministic stub
engines because fitz/PIL/pytesseract/paddleocr are not installed. These
tests light up automatically in any environment where the optional
dependencies exist and prove the real adapters wire into the chain with
the reference's semantics:

- ``FitzPdfRasterizer``: PDF payload -> per-page PNG raster dicts
  (reference FileIngestor.py:239-262 rasters pages at a fixed dpi);
- ``PILImageDecoder``: image payload -> single page dict carrying the
  raster + true dims (reference DLA.py:112-130 loads page images);
- ``TesseractRecognizer``: page raster + bbox -> text (the
  reference's VLM-OCR call shape, OCR.py:117-147, with a local engine);
- the full ``extract_document`` path over a real PDF through a
  real-engine decoder/recognizer chain (sticky failover intact).

Here they must SKIP cleanly (never fail) — `pytest -m realengines`
reports them as skipped with the missing dependency named.
"""

from __future__ import annotations

import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import (
    extract_document,
)
from ocr_pipeline_fastapi_latency_optimization_ray.sources.decoders import (
    FitzPdfRasterizer,
    PILImageDecoder,
    build_decoder,
)
from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
    TesseractRecognizer,
    build_recognizer,
)

pytestmark = pytest.mark.realengines

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _real_pdf_bytes(text: str = "Hello ray-extract") -> bytes:
    """One-page PDF built with fitz itself (no fixture files in-repo)."""
    fitz = pytest.importorskip("fitz", reason="PyMuPDF (fitz) not installed")
    doc = fitz.open()
    page = doc.new_page(width=300, height=120)
    page.insert_text((36, 60), text, fontsize=18)
    out = doc.tobytes()
    doc.close()
    return out


def _real_png_bytes(text: str = "RAY") -> bytes:
    """White PNG with black text drawn by PIL (default bitmap font)."""
    import io

    Image = pytest.importorskip(
        "PIL.Image", reason="PIL not installed")
    ImageDraw = pytest.importorskip("PIL.ImageDraw")
    im = Image.new("RGB", (200, 80), "white")
    ImageDraw.Draw(im).text((20, 30), text, fill="black")
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_fitz_rasterizes_real_pdf():
    payload = _real_pdf_bytes()
    pages = FitzPdfRasterizer(dpi=100).decode(payload, "pdf")
    assert len(pages) == 1
    page = pages[0]
    # FileIngestor.py:239-262 contract: encoded raster + true pixel dims
    assert page["image"].startswith(PNG_MAGIC)
    # 300x120pt at 100dpi -> ~417x167px (allow rounding)
    assert abs(page["w"] - 300 * 100 / 72) <= 2
    assert abs(page["h"] - 120 * 100 / 72) <= 2
    assert page["blocks"] == []
    with pytest.raises(ValueError):
        FitzPdfRasterizer().decode(b"%PDF-1.4 not really a pdf", "pdf")


def test_pil_decodes_real_png():
    payload = _real_png_bytes()
    pages = PILImageDecoder().decode(payload, "image")
    assert len(pages) == 1
    # DLA.py:112-130 contract: payload kept as the page raster, dims real
    assert pages[0]["image"] == payload
    assert (pages[0]["w"], pages[0]["h"]) == (200, 80)
    with pytest.raises(ValueError):
        PILImageDecoder().decode(b"\x89PNG garbage", "image")


def test_tesseract_reads_rendered_text():
    pytest.importorskip("pytesseract", reason="pytesseract not installed")
    payload = _real_png_bytes("HELLO")
    page = PILImageDecoder().decode(payload, "image")[0]
    out = TesseractRecognizer().recognize(
        page, (0, 0, page["w"], page["h"]), mode="markdown")
    assert isinstance(out, str)
    # smoke-level accuracy: a clean black-on-white word must OCR non-empty
    assert out.strip()


def test_real_chain_extracts_pdf_end_to_end():
    """extract_document over a real PDF with the real decoder first in the
    chain and the real recognizer first in the registry — asserts the
    wiring (decode -> layout -> recognize -> skeleton -> finalize), not
    model quality; the stub remains the failover exactly as in prod."""
    pytest.importorskip("fitz", reason="PyMuPDF (fitz) not installed")
    pytest.importorskip("pytesseract", reason="pytesseract not installed")
    pytest.importorskip("PIL.Image", reason="PIL not installed")
    cfg = PipelineConfig()
    decoder = build_decoder(["fitz", "pil", "stub"])
    recognizer = build_recognizer(["tesseract", "stub"])
    res = extract_document(
        _real_pdf_bytes("Integration probe"), None, "en", cfg,
        recognizer=recognizer, kind="pdf", decoder=decoder,
    )
    assert res.error is None
    assert isinstance(res.extracted_text, str)
    for (_b, s, e) in res.spans:
        assert 0 <= s <= e <= len(res.extracted_text)
