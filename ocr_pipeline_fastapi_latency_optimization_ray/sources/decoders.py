"""S5/M3 payload decoders behind a registry — PDF rasterization and image
decode, mirroring the recognizer registry pattern (stages/layout.py).

The reference rasterizes PDFs page-by-page with PyMuPDF
(``FileIngestor._pdf_to_images_fitz``, FileIngestor.py:239-262: ``fitz.open``
then ``page.get_pixmap(matrix=Matrix(dpi/72, dpi/72))``) and loads page
images with cv2 (``DLA.set_images``, DLA.py:112-130). Neither fitz nor
PIL/cv2 ships in this container, so the REAL adapters here are
import-guarded exactly like :class:`~..stages.layout.TesseractRecognizer`:
construction raises :class:`DecoderUnavailable` when the dependency is
absent and :func:`build_decoder` drops the engine from the chain — the
deterministic stub stays the golden path by default and whenever the real
engine is missing.

Page-dict contract: every decoder returns ``list[dict]`` (one dict per
page). Stub pages carry ``blocks`` (embedded ground truth the stub
layout/recognizer read); real raster pages carry ``image`` (encoded bytes)
plus ``w``/``h`` and empty ``blocks`` — the layout stub emits a single
full-page text block for them so the recognizer chain (e.g. the Tesseract
adapter) OCRs the whole page, and downstream geometry/merge/enrich stages
are format-agnostic.
"""

from __future__ import annotations

import logging

from .payloads import decode_fake_doc

_LOG = logging.getLogger(__name__)


class DecoderUnavailable(Exception):
    """Raised at CONSTRUCTION when an optional decoder's dependencies are
    absent — ``build_decoder`` drops the engine from the chain."""


class StubDocDecoder:
    """Deterministic fake-document decoder (the golden path): parses the
    JSON body embedded in the synthetic PDF/image payloads
    (sources/payloads.py). Raises ValueError on corrupt payloads — the
    sentinel-error contract."""

    kinds = ("pdf", "image")

    def decode(self, payload: bytes, kind: str) -> list[dict]:
        return decode_fake_doc(payload)


class FitzPdfRasterizer:
    """REAL PDF rasterizer (import-guarded): PyMuPDF page raster at ``dpi``,
    the engine analog of FileIngestor.py:239-262. Each page dict carries
    the encoded PNG under ``image`` for the recognizer chain."""

    kinds = ("pdf",)

    def __init__(self, dpi: int = 200):
        try:
            import fitz  # noqa: F401
        except ImportError as e:  # pragma: no cover - dep absent here
            raise DecoderUnavailable(f"fitz (PyMuPDF) unavailable: {e}")
        self.dpi = dpi

    def decode(self, payload: bytes, kind: str) -> list[dict]:  # pragma: no cover - needs fitz
        import fitz

        try:
            doc = fitz.open(stream=payload, filetype="pdf")
        except Exception as e:  # noqa: BLE001 - mirror reference's wrap
            raise ValueError(f"could not open PDF payload: {e}") from e
        mat = fitz.Matrix(self.dpi / 72, self.dpi / 72)
        pages = []
        for page in doc:
            pix = page.get_pixmap(matrix=mat)
            pages.append({
                "image": pix.tobytes("png"),
                "w": pix.width,
                "h": pix.height,
                "blocks": [],
            })
        doc.close()
        if not pages:
            raise ValueError("PDF payload decoded to zero pages")
        return pages


class PILImageDecoder:
    """REAL image decoder (import-guarded): PIL header parse for dims, the
    payload kept as the page raster (DLA.py:112-130 loads page images into
    memory the same way; decode-to-pixels is the recognizer's job here)."""

    kinds = ("image",)

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - dep absent here
            raise DecoderUnavailable(f"PIL unavailable: {e}")

    def decode(self, payload: bytes, kind: str) -> list[dict]:  # pragma: no cover - needs PIL
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(payload)) as im:
                w, h = im.size
        except Exception as e:  # noqa: BLE001
            raise ValueError(f"could not decode image payload: {e}") from e
        return [{"image": payload, "w": w, "h": h, "blocks": []}]


DECODER_REGISTRY = {
    "stub": StubDocDecoder,
    "fitz": FitzPdfRasterizer,
    "pil": PILImageDecoder,
}


class DecoderChain:
    """kind-dispatched failover: the first constructed engine claiming the
    payload kind that decodes without ValueError wins; when every engine
    fails, the LAST error propagates (the caller's sentinel-error path,
    pipelines/doc_extract.py)."""

    def __init__(self, engines: list):
        self.engines = engines

    def decode(self, payload: bytes, kind: str) -> list[dict]:
        last: Exception | None = None
        for eng in self.engines:
            if kind not in eng.kinds:
                continue
            try:
                return eng.decode(payload, kind)
            except ValueError as e:
                last = e
        if last is not None:
            raise last
        raise ValueError(f"no decoder in chain handles kind {kind!r}")


def build_decoder(names) -> DecoderChain:
    """Decoder chain from registry names, mirroring ``build_recognizer``
    (stages/layout.py): engines whose optional dependencies are absent are
    dropped with a warning; an all-absent selection falls back to the
    deterministic stub so the pipeline never loses pages to a missing
    optional dependency."""
    engines = []
    for n in names:
        try:
            engines.append(DECODER_REGISTRY[n]())
        except DecoderUnavailable as e:
            _LOG.warning("decoder %r unavailable (%s) — dropped from chain",
                         n, e)
    if not engines:
        _LOG.warning("no selected decoder available — falling back to 'stub'")
        engines = [StubDocDecoder()]
    return DecoderChain(engines)
