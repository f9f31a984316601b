"""Layout-detection and recognition stages for PDF/image payloads.

``LayoutStub`` is a clearly-marked deterministic stand-in for the PaddleOCR
``LayoutDetection`` model (reference DLA.py:54-57, predict at DLA.py:146-148):
the execution environment ships no layout model, so detection reads the
ground-truth blocks embedded in the fake document payload
(sources/payloads.py). Everything *around* the stub is the real reference
semantics:

  - score threshold filter (predict(threshold=conf), DLA.py:146-148;
    conf=0.38 default DLA.py:137)
  - score-descending sort (DLA.py:515)
  - int box cast (DLA.py:517)
  - raw->canonical label mapping via ind_map (DLA.py:521-523, table at :62-80)
  - 0.5% box padding for table/formula/figure clamped to page (DLA.py:526-534)

``RecognizerStub`` is the deterministic analog of the VLM OCR engine
(reference OCR.py:117-147): "reading" a region returns the embedded text of
every ground-truth block whose center falls inside the region, in visual
reading order — so D1 merges observably change output text. The
block-type-specific prompt selection (OCR.py:90-101) maps to per-label
render modes.

Both are plain objects held warm inside the actor-pool stage
(stages/extract.py) — loaded once per actor in ``__init__``, used per batch.
"""

from __future__ import annotations

import numpy as np

from ..config import CANONICAL_CLASSES, IND_MAP, MAP_LABELS, PipelineConfig
from ..functions.geometry import pad_boxes
from ..functions.merge import Blocks, filter_duplicates


class LayoutStub:
    """Deterministic layout 'model'. STUB: replace with a real layout model
    (e.g. PaddleOCR LayoutDetection) when native deps are available; the
    call signature and output table shape are the real interface."""

    def __init__(self, conf: float = 0.38):
        self.conf = conf

    def predict(self, page: dict) -> Blocks:
        if not page.get("blocks") and page.get("image") is not None:
            # real-raster page (decoded by a registry engine,
            # sources/decoders.py): no layout model ships here, so emit ONE
            # full-page text block and let the recognizer chain OCR it —
            # plain full-page OCR, the no-DLA degradation the reference
            # supports when layout inference is unavailable
            return Blocks(
                xyxy=np.array([[0.0, 0.0, float(page["w"]),
                                float(page["h"])]]),
                confidence=np.array([1.0]),
                class_name=np.array(["text"], dtype=object),
                text=np.array([""], dtype=object),
            )
        raw = [b for b in page.get("blocks", []) if b["score"] >= self.conf]
        # score-desc stable sort (reference DLA.py:515 list.sort is stable)
        raw.sort(key=lambda b: -b["score"])
        n = len(raw)
        if n == 0:
            return Blocks.empty()
        xyxy = np.array([b["bbox"] for b in raw], dtype=float).astype(int)
        conf = np.array([b["score"] for b in raw], dtype=float)
        cls = np.array([CANONICAL_CLASSES[IND_MAP[int(b["cls_id"])]] for b in raw],
                       dtype=object)
        xyxy = pad_boxes(xyxy, cls, height=page["h"], width=page["w"])
        texts = np.array([""] * n, dtype=object)  # filled by the recognizer
        return Blocks(
            xyxy=xyxy.astype(float), confidence=conf, class_name=cls, text=texts
        )


class LayoutUnavailable(Exception):
    """Raised at CONSTRUCTION when an optional layout model's dependencies
    are absent — ``build_layout`` drops the engine and falls back."""


class PaddleLayoutDetector:
    """Optional REAL layout model behind the registry — the reference's
    PaddleOCR ``LayoutDetection`` engine (DLA.py:54-57 loads
    ``PP-DocLayout_plus-L``; DLA.py:146-148 runs ``predict(img,
    layout_nms=False, threshold=conf)``). Import-guarded: paddleocr does
    not ship in this container, so construction raises
    :class:`LayoutUnavailable` and ``build_layout`` falls back to the
    deterministic stub — same absence-failover contract as the recognizer
    and decoder registries.

    When present, it predicts on pages carrying a real raster under
    ``page["image"]`` and emits the same Blocks table shape the stub does
    (score filter + score-desc stable sort + label map + box padding),
    so everything downstream is engine-agnostic."""

    def __init__(self, conf: float = 0.38,
                 model_name: str = "PP-DocLayout_plus-L"):
        try:
            from paddleocr import LayoutDetection  # noqa: F401
        except ImportError as e:  # pragma: no cover - dep absent here
            raise LayoutUnavailable(f"paddleocr unavailable: {e}")
        self.conf = conf
        self._model = LayoutDetection(model_name=model_name)

    def predict(self, page: dict) -> Blocks:  # pragma: no cover - needs paddleocr
        import io

        raw = page.get("image")
        if raw is None:
            # fake page: defer to the stub's embedded ground truth
            return LayoutStub(self.conf).predict(page)
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        out = self._model.predict(img, layout_nms=False,
                                  threshold=self.conf)[0]
        boxes = out.get("boxes", [])
        if not boxes:
            return Blocks.empty()
        boxes = sorted(boxes, key=lambda b: -float(b["score"]))
        xyxy = np.array([b["coordinate"] for b in boxes], float).astype(int)
        conf = np.array([float(b["score"]) for b in boxes])
        cls = np.array(
            [CANONICAL_CLASSES[MAP_LABELS.get(b["label"], "text")]
             for b in boxes], dtype=object)
        xyxy = pad_boxes(xyxy, cls, height=page["h"], width=page["w"])
        texts = np.array([""] * len(boxes), dtype=object)
        return Blocks(xyxy=xyxy.astype(float), confidence=conf,
                      class_name=cls, text=texts)


LAYOUT_REGISTRY = {
    "stub": LayoutStub,
    "paddle": PaddleLayoutDetector,
}


def build_layout(names, conf: float = 0.38):
    """Layout engine from registry names, mirroring ``build_recognizer`` /
    ``build_decoder``: the first constructible engine wins; engines whose
    optional dependencies are absent are dropped with a warning; an
    all-absent selection falls back to the deterministic stub."""
    import logging

    for n in names:
        try:
            return LAYOUT_REGISTRY[n](conf)
        except LayoutUnavailable as e:
            logging.getLogger(__name__).warning(
                "layout engine %r unavailable (%s) — dropped", n, e)
    logging.getLogger(__name__).warning(
        "no selected layout engine available — falling back to 'stub'")
    return LayoutStub(conf)


def render_mode_for_label(label: str) -> str:
    """Prompt-selector analog (reference OCR.py:90-101): figure/table get
    specialized treatment, everything else the generic markdown mode."""
    if label == "figure":
        return "figure"
    if label == "table":
        return "table"
    return "markdown"


class RecognitionError(RuntimeError):
    """Raised when a recognition engine cannot read a page region."""


class TransientRecognitionError(RecognitionError):
    """A retryable engine failure (network blip / 5xx analog). The chain
    retries the SAME engine with backoff before failing over; any other
    RecognitionError fails over immediately (reference OCR.py:103-115
    retries only requests.exceptions.RequestException)."""


class RecognizerChain:
    """Primary->backup engine failover with in-engine retry (reference
    PageProcessor.py:19-26, 92-104 failover; OCR.py:103-115 tenacity retry).

    Semantics, in order:
      1. transient errors retry the SAME engine up to ``max_attempts``
         total tries with exponential backoff
         (``min(retry_max_wait_s, retry_wait_s * 2^attempt)`` — the
         reference waits 2s/4s/8s capped at 10; tests run with wait 0);
      2. a non-transient error, or transient retries exhausted, swaps to
         the backup (the swap is sticky for the actor's life, exactly like
         the reference's in-place engine swap, PageProcessor.py:99-101);
      3. the backup gets the same retry policy; its failure re-raises so
         the caller emits the page-level sentinel.
    """

    def __init__(self, engines, max_attempts: int = 3,
                 retry_wait_s: float = 0.0, retry_max_wait_s: float = 10.0):
        self.engines = list(engines)
        self.max_attempts = max(1, max_attempts)
        self.retry_wait_s = retry_wait_s
        self.retry_max_wait_s = retry_max_wait_s

    def _recognize_with_retry(self, engine, page: dict, bbox, mode: str) -> str:
        import time

        for attempt in range(self.max_attempts):
            try:
                return engine.recognize(page, bbox, mode)
            except TransientRecognitionError:
                if attempt == self.max_attempts - 1:
                    raise
                if self.retry_wait_s > 0:
                    time.sleep(
                        min(self.retry_max_wait_s,
                            self.retry_wait_s * (2 ** attempt))
                    )
        raise AssertionError("unreachable")

    def recognize(self, page: dict, bbox, mode: str = "markdown") -> str:
        try:
            return self._recognize_with_retry(self.engines[0], page, bbox, mode)
        except RecognitionError:
            if len(self.engines) < 2:
                raise
            self.engines.pop(0)  # sticky failover, PageProcessor.py:99-101
            return self._recognize_with_retry(self.engines[0], page, bbox, mode)


class RecognizerStub:
    """Deterministic region OCR. STUB for a local recognition engine
    (Tesseract-style per the north_star); reads embedded ground-truth text."""

    def recognize(self, page: dict, bbox, mode: str = "markdown") -> str:
        x1, y1, x2, y2 = bbox
        hits = []
        for i, b in enumerate(page.get("blocks", [])):
            bx1, by1, bx2, by2 = b["bbox"]
            cx, cy = (bx1 + bx2) / 2.0, (by1 + by2) / 2.0
            if x1 <= cx <= x2 and y1 <= cy <= y2:
                hits.append((by1, bx1, i, b["text"]))
        hits.sort(key=lambda t: (t[0], t[1], t[2]))
        lines = [t[3] for t in hits]
        if mode == "table":
            return "\n".join(f"| {ln} |" for ln in lines)
        return "\n".join(lines)


def preresize_page(page: dict, max_pixels: int | None) -> tuple[dict, float]:
    """M6 image pre-resize (reference OCR.py:58-88 ``_process_image``): a
    page whose pixel count exceeds ``max_pixels`` is downscaled by
    ``sqrt(max/current) * 0.99`` (the reference's safety margin) before
    recognition; dims are int-truncated exactly as ``int(w * scale)``.

    The rasterizer here is the fake-page stub, so "resizing the image"
    means scaling the page dims and every ground-truth block bbox by the
    same factor — downstream geometry (padding, merge, masking) then runs
    in the resized coordinate space, exactly as the reference's detector
    sees the resized raster. Returns (page, scale); scale == 1.0 when
    under the cap (no copy made)."""
    if not max_pixels:
        return page, 1.0
    w, h = page["w"], page["h"]
    total = w * h
    if total <= max_pixels:
        return page, 1.0
    import math

    s = math.sqrt(max_pixels / total) * 0.99
    blocks = [
        {**b, "bbox": [c * s for c in b["bbox"]]} for b in page.get("blocks", [])
    ]
    return {**page, "w": int(w * s), "h": int(h * s), "blocks": blocks}, s


def analyze_fake_page(
    page: dict, layout: LayoutStub, recognizer: RecognizerStub, cfg: PipelineConfig
) -> Blocks:
    """Full per-page DLA for a fake-document page: detect -> merge -> OCR.

    Mirrors the golden path of ``DLA.analyze`` (DLA.py:137-179) with
    filter_dup=True, merge_visual=False (call site ocr_app.py:990); block
    text is recognized from the merged geometry. Oversized pages are
    pre-resized under ``cfg.max_pixels`` first (M6, OCR.py:58-88).
    """
    page, _scale = preresize_page(page, cfg.max_pixels)
    blocks = layout.predict(page)
    if cfg.filter_dup and len(blocks):
        blocks = filter_duplicates(blocks, iou=cfg.iou)
    if cfg.merge_visual and len(blocks):
        from ..functions.merge_visual import merge_formula_text, merge_text_figure_table

        blocks = merge_formula_text(blocks)
        blocks = merge_text_figure_table(blocks)
    for i in range(len(blocks)):
        mode = render_mode_for_label(blocks.class_name[i])
        blocks.text[i] = recognizer.recognize(page, blocks.xyxy[i], mode)
    return blocks


class FlakyRecognizerStub:
    """Test engine: fails on any page whose embedded text contains the
    marker (deterministic analog of a transient model failure)."""

    def __init__(self, marker: str = "FAIL_PRIMARY"):
        self.marker = marker

    def recognize(self, page: dict, bbox, mode: str = "markdown") -> str:
        if any(self.marker in b.get("text", "") for b in page.get("blocks", [])):
            raise RecognitionError(f"engine refused page containing {self.marker!r}")
        return RecognizerStub().recognize(page, bbox, mode)


class CountdownFlakyRecognizer:
    """Test engine: raises TransientRecognitionError for the first
    ``n_failures`` recognize() calls (per-actor counter — the deterministic
    analog of a model endpoint riding out a brief outage), then behaves like
    RecognizerStub."""

    def __init__(self, n_failures: int = 2):
        self.remaining = n_failures

    def recognize(self, page: dict, bbox, mode: str = "markdown") -> str:
        if self.remaining > 0:
            self.remaining -= 1
            raise TransientRecognitionError("transient blip")
        return RecognizerStub().recognize(page, bbox, mode)


class EngineUnavailable(RecognitionError):
    """Raised at CONSTRUCTION when an optional engine's dependencies are
    absent — ``build_recognizer`` drops the engine from the chain (it never
    reaches per-page failover, which is for runtime errors)."""


class TesseractRecognizer:
    """Optional REAL local OCR engine behind the registry (the
    Tesseract-style recognizer the north_star names; reference OCR.py:32-56
    registers named engine configs the same way). Import-guarded: this
    container ships neither pytesseract nor PIL, so construction raises
    :class:`EngineUnavailable` and ``build_recognizer`` falls through to
    the next registry name — the deterministic stub stays the golden path
    by default and whenever the engine is absent.

    When the dependencies ARE present, the engine recognizes pages that
    carry a real raster under ``page["image"]`` (encoded bytes); the
    deterministic fake pages carry none, so such pages raise
    ``RecognitionError`` and the chain's sticky failover hands them to the
    stub — real rasters and fake pages can coexist in one run."""

    def __init__(self, lang: str = "eng"):
        try:
            import pytesseract  # noqa: F401
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - deps absent here
            raise EngineUnavailable(f"tesseract engine unavailable: {e}")
        self._pytesseract = pytesseract
        self.lang = lang

    def recognize(self, page: dict, bbox, mode: str = "markdown") -> str:  # pragma: no cover - needs pytesseract
        import io

        from PIL import Image

        raw = page.get("image")
        if raw is None:
            raise RecognitionError("page carries no raster image")
        im = Image.open(io.BytesIO(raw))
        x1, y1, x2, y2 = (int(round(c)) for c in bbox)
        text = self._pytesseract.image_to_string(
            im.crop((x1, y1, x2, y2)), lang=self.lang
        ).strip()
        if mode == "table":
            return "\n".join(f"| {ln} |" for ln in text.split("\n"))
        return text


# Model-registry analog (reference OCR.py:37-48: name -> engine config;
# primary/fallback choice PageProcessor.py:19-26). Names are the extension
# surface: PipelineConfig.recognizers selects the chain.
RECOGNIZER_REGISTRY = {
    "stub": RecognizerStub,
    "flaky": FlakyRecognizerStub,
    "flaky_transient": CountdownFlakyRecognizer,
    "tesseract": TesseractRecognizer,
}


def build_recognizer(names, max_attempts: int = 3, retry_wait_s: float = 0.0,
                     retry_max_wait_s: float = 10.0):
    """Engine chain from registry names. Always returns a RecognizerChain so
    single engines get the same transient-retry policy as failover chains
    (the reference decorates the inference call itself, OCR.py:103-115).
    Engines whose optional dependencies are absent (EngineUnavailable at
    construction) are dropped with a warning; an all-absent selection falls
    back to the deterministic stub so the pipeline never loses pages to a
    missing optional dependency."""
    import logging

    engines = []
    for n in names:
        try:
            engines.append(RECOGNIZER_REGISTRY[n]())
        except EngineUnavailable as e:
            logging.getLogger(__name__).warning(
                "recognizer %r unavailable (%s) — dropped from chain", n, e)
    if not engines:
        logging.getLogger(__name__).warning(
            "no selected recognizer available — falling back to 'stub'")
        engines = [RecognizerStub()]
    return RecognizerChain(engines, max_attempts=max_attempts,
                           retry_wait_s=retry_wait_s,
                           retry_max_wait_s=retry_max_wait_s)
