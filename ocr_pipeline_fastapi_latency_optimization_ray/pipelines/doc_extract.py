"""Per-document extraction core: payload -> (extracted_text, spans, metrics).

This is the unit of work the Ray actor-pool stage applies to every row. One
document is inherently a sequential parse (exactly as in the reference, where
the unit of scheduling is a job/document, ocr_app.py:909-1088); the engine's
parallelism axis is documents-within-batches across the actor pool.

Stage order per document mirrors the reference lifecycle (SURVEY.md §3.1):
  ingest/dispatch -> layout/tokenize -> D1 merge -> mask+skeleton ->
  enrichment join (url-local, J1) -> substitution -> fence strip -> spans.

Error semantics: a corrupt/undecodable payload yields the reference's
double-failure sentinel text as the document body (PageProcessor.py:102-104)
rather than raising — errors are data, not exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import PipelineConfig
from ..functions.enrich import finalize_document
from ..functions.html_tokenize import blocks_table_from_html
from ..functions.masking import PageSkeleton, build_page_skeleton
from ..functions.merge import filter_duplicates
from ..functions.rtl import contains_rtl, rtl_normalize_text
from ..sources.payloads import classify_payload_bytes, decode_fake_doc
from ..stages.layout import (
    LayoutStub,
    RecognitionError,
    RecognizerStub,
    analyze_fake_page,
)


def ocr_failed_sentinel(err: str) -> str:
    # exact format of the double-failure sentinel, PageProcessor.py:102-104
    return f"> **[OCR Failed] Both Primary and Backup models failed. Final Error: {err}**"


@dataclass
class ExtractResult:
    extracted_text: str
    spans: list[tuple[int, int, int]]
    n_blocks_kept: int
    n_blocks_dropped: int
    error: str | None = None
    # (page, object, bbox) per masked block — the S8 mask-metadata column
    # (reference non_text_pairs.json, DLA.py:622-653)
    mask_meta: list = None


def extract_document(
    payload: bytes | None,
    text: str | None,
    lang: str | None,
    cfg: PipelineConfig,
    layout: LayoutStub | None = None,
    recognizer: RecognizerStub | None = None,
    kind: str | None = None,
    decoder=None,
) -> ExtractResult:
    kind = kind or classify_payload_bytes(payload, text)

    if kind == "empty":
        return ExtractResult("", [], 0, 0)

    if kind == "text":
        # pre-extracted text path (reference text->PDF->OCR round trip,
        # FileIngestor.py:189-237, collapses to identity in a deterministic
        # engine); fence strip still applies (PageProcessor.py:116).
        # The S4 semantic (FileIngestor.py:208-221): payloads containing
        # RTL runs are reshaped into contextual presentation forms and
        # reordered into display order per line (functions/rtl.py) before
        # the identity collapse. The gate is CONTENT, not the lang column —
        # the reference applies its Arabic branch to every non-empty line
        # whenever the libraries import, so an LTR-lang document with an
        # embedded Arabic/Hebrew run is normalized exactly like an Arabic
        # one (round-3 ADVICE). Docs with no RTL code points skip per-line
        # processing entirely (reshape+bidi are identities there), keeping
        # the doc-level strip contract of EXTRACT_CLOSED_PATHS_SQL.
        if contains_rtl(text):
            src = rtl_normalize_text(text)
        else:
            src = text
        page = PageSkeleton(parts=[src.strip()], block_ids=[0], enrich=[],
                            n_kept=1, n_dropped=0)
        out_text, spans, kept, dropped = finalize_document([page], {})
        return ExtractResult(out_text, spans, kept, dropped)

    if kind == "html":
        blocks, _raw = blocks_table_from_html(
            payload, cfg.link_density_abandon, cfg.boilerplate_hints
        )
        if cfg.filter_dup and len(blocks):
            blocks = filter_duplicates(blocks, iou=cfg.iou)
        page = build_page_skeleton(blocks, page_num=0)
        enrich_map = {(p, t, k): c for (p, t, k, c) in page.enrich}
        out_text, spans, kept, dropped = finalize_document([page], enrich_map)
        meta = [(0, o, b) for (o, b) in (page.mask_meta or [])]
        return ExtractResult(out_text, spans, kept, dropped, mask_meta=meta)

    # pdf / image branch — payload -> pages via the decoder chain (S5/M3,
    # sources/decoders.py; default chain is the deterministic stub, real
    # fitz/PIL adapters slot in when their dependencies are present)
    layout = layout or LayoutStub(cfg.conf)
    recognizer = recognizer or RecognizerStub()
    try:
        if decoder is not None:
            fake_pages = decoder.decode(payload, kind)
        else:
            fake_pages = decode_fake_doc(payload)
    except ValueError as e:
        return ExtractResult(ocr_failed_sentinel(str(e)), [], 0, 0, error=str(e))

    skels: list[PageSkeleton] = []
    enrich_map: dict[tuple[int, str, int], str] = {}
    page_errors = 0
    for pnum, page in enumerate(fake_pages):
        try:
            blocks = analyze_fake_page(page, layout, recognizer, cfg)
        except RecognitionError as e:
            # per-page double failure: the sentinel text BECOMES the page
            # content, other pages continue (reference PageProcessor.py:92-104
            # returns the error string as that page's markdown)
            skels.append(PageSkeleton(
                parts=[ocr_failed_sentinel(str(e))], block_ids=[0],
                enrich=[], n_kept=1, n_dropped=0,
            ))
            page_errors += 1
            continue
        skel = build_page_skeleton(blocks, page_num=pnum)
        for (p, t, k, c) in skel.enrich:
            enrich_map[(p, t, k)] = c
        skels.append(skel)
    out_text, spans, kept, dropped = finalize_document(skels, enrich_map)
    meta = [
        (pnum, o, b)
        for pnum, sk in enumerate(skels)
        for (o, b) in (sk.mask_meta or [])
    ]
    err = f"{page_errors} page(s) failed recognition" if page_errors else None
    return ExtractResult(out_text, spans, kept, dropped, error=err, mask_meta=meta)
