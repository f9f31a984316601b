"""S5/M3 decoder registry (sources/decoders.py): selection, absence
failover, sentinel-error preservation, and the real-raster page contract.
The real fitz/PIL engines are import-guarded — absent in this container —
so their construction must raise DecoderUnavailable and chains containing
them must degrade to the stub without losing pages (mirror of the
TesseractRecognizer tests, reference FileIngestor.py:239-262 /
DLA.py:112-130)."""

import numpy as np
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import (
    extract_document,
)
from ocr_pipeline_fastapi_latency_optimization_ray.sources import decoders as dec
from ocr_pipeline_fastapi_latency_optimization_ray.sources.payloads import (
    decode_fake_doc,
    encode_fake_pdf,
)
from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import LayoutStub

HAS_FITZ = True
try:
    import fitz  # noqa: F401
except ImportError:
    HAS_FITZ = False
HAS_PIL = True
try:
    from PIL import Image  # noqa: F401
except ImportError:
    HAS_PIL = False


def _fake_pdf() -> bytes:
    return encode_fake_pdf([
        {"w": 1000, "h": 1400,
         "blocks": [{"bbox": [10, 10, 400, 80], "cls_id": 1,
                     "score": 0.9, "text": "hello decoder"}]}
    ])


def test_stub_decoder_matches_decode_fake_doc():
    p = _fake_pdf()
    chain = dec.build_decoder(("stub",))
    assert chain.decode(p, "pdf") == decode_fake_doc(p)


@pytest.mark.skipif(HAS_FITZ, reason="fitz present: constructor must work")
def test_fitz_unavailable_raises_at_construction():
    with pytest.raises(dec.DecoderUnavailable):
        dec.FitzPdfRasterizer()


@pytest.mark.skipif(HAS_PIL, reason="PIL present: constructor must work")
def test_pil_unavailable_raises_at_construction():
    with pytest.raises(dec.DecoderUnavailable):
        dec.PILImageDecoder()


def test_absent_engines_dropped_chain_still_decodes():
    # real engines first in the chain: when absent they are dropped and
    # the stub keeps decoding — no page is ever lost to a missing optional
    # dependency (same failover contract as build_recognizer)
    chain = dec.build_decoder(("fitz", "pil", "stub"))
    p = _fake_pdf()
    assert chain.decode(p, "pdf") == decode_fake_doc(p)


def test_all_absent_falls_back_to_stub():
    chain = dec.build_decoder(("fitz", "pil") if not (HAS_FITZ or HAS_PIL)
                              else ("stub",))
    assert chain.decode(_fake_pdf(), "pdf") == decode_fake_doc(_fake_pdf())


def test_corrupt_payload_keeps_sentinel_path():
    cfg = PipelineConfig(decoders=("fitz", "pil", "stub"))
    chain = dec.build_decoder(cfg.decoders)
    res = extract_document(b"%PDF-1.4\nRAYXDOC garbage", None, "en", cfg,
                           decoder=chain)
    assert res.error is not None
    assert "[OCR Failed]" in res.extracted_text


def test_extract_document_with_decoder_chain_byte_identical():
    # absence-failover end-to-end: a config selecting the real engines
    # produces byte-identical output to the default stub config when the
    # engines are absent (golden path unchanged)
    p = _fake_pdf()
    base = extract_document(p, None, "en", PipelineConfig())
    cfg = PipelineConfig(decoders=("fitz", "pil", "stub"))
    via = extract_document(p, None, "en", cfg,
                           decoder=dec.build_decoder(cfg.decoders))
    assert via.extracted_text == base.extracted_text
    assert via.spans == base.spans


def test_layout_stub_full_page_block_for_real_raster():
    page = {"image": b"\x89PNGfake", "w": 640, "h": 480, "blocks": []}
    blocks = LayoutStub().predict(page)
    assert len(blocks) == 1
    assert blocks.class_name[0] == "text"
    assert np.allclose(blocks.xyxy[0], [0, 0, 640, 480])


@pytest.mark.skipif(not HAS_FITZ, reason="needs PyMuPDF")
def test_fitz_rasterizes_real_pdf():  # pragma: no cover - dep absent here
    import fitz

    doc = fitz.open()
    doc.new_page(width=200, height=100)
    payload = doc.tobytes()
    pages = dec.FitzPdfRasterizer(dpi=72).decode(payload, "pdf")
    assert len(pages) == 1 and pages[0]["w"] == 200 and pages[0]["image"]


@pytest.mark.skipif(not HAS_PIL, reason="needs PIL")
def test_pil_decodes_real_image():  # pragma: no cover - dep absent here
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16)).save(buf, format="PNG")
    pages = dec.PILImageDecoder().decode(buf.getvalue(), "image")
    assert pages[0]["w"] == 32 and pages[0]["h"] == 16


def test_layout_registry_mirrors_pattern():
    """M1 registry: absent paddle engine raises at construction and
    build_layout falls back to the stub (same contract as recognizer and
    decoder registries)."""
    from ocr_pipeline_fastapi_latency_optimization_ray.stages import layout as lay

    has_paddle = True
    try:
        import paddleocr  # noqa: F401
    except ImportError:
        has_paddle = False
    if not has_paddle:
        with pytest.raises(lay.LayoutUnavailable):
            lay.PaddleLayoutDetector()
        eng = lay.build_layout(("paddle", "stub"), conf=0.38)
        assert isinstance(eng, lay.LayoutStub)
        eng2 = lay.build_layout(("paddle",), conf=0.38)
        assert isinstance(eng2, lay.LayoutStub)
    else:  # pragma: no cover - dep absent here
        assert isinstance(lay.build_layout(("paddle", "stub")),
                          lay.PaddleLayoutDetector)


def test_layout_chain_config_byte_identical():
    """A config selecting the real layout engine produces byte-identical
    output to the stub config when the engine is absent."""
    p = _fake_pdf()
    base = extract_document(p, None, "en", PipelineConfig())
    cfg = PipelineConfig(layouts=("paddle", "stub"))
    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        build_layout,
    )

    via = extract_document(p, None, "en", cfg,
                           layout=build_layout(cfg.layouts, cfg.conf))
    assert via.extracted_text == base.extracted_text
