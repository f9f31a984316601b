"""Single-threaded pure-Python oracle for the extraction semantics.

This is the golden-fixture generator (FIXTURES.md §3): a deliberately simple,
sequential implementation of the document contract — skeleton assembly,
placeholder enrichment via ``re.sub`` exactly as the reference does it
(MarkdownEnricher.py:62-67), and fence strip via ``str.replace``
(PageProcessor.py:116). It shares only the leaf kernels with the engine
(tokenizer, merge fixpoint, layout stub — re-implementing an HTML parser
twice would test the parser, not the engine); everything the Ray pipeline
does with batches, actors, ordering and span bookkeeping is independently
re-derived here with plain string operations.

pytest asserts the Ray pipeline's extracted_text is byte-identical to this
oracle per url at multiple parallelism levels — parallelism must never
change bytes (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

from ..config import (
    PAGE_SEPARATOR,
    PLACEHOLDER_PATTERN,
    UNMASKED_LABELS,
    PipelineConfig,
    missing_crop_sentinel,
    placeholder_tag,
)
from ..functions.html_tokenize import blocks_table_from_html
from ..functions.merge import Blocks, filter_duplicates
from ..pipelines.doc_extract import ocr_failed_sentinel
from ..sources.payloads import classify_payload_bytes, decode_fake_doc
from ..stages.layout import LayoutStub, RecognizerStub, analyze_fake_page


def _oracle_page(blocks: Blocks, page_num: int, crops: dict) -> str:
    """Render one page skeleton; fills ``crops[(page, type, idx)]``."""
    # counters in score-descending order (detection order)
    det = np.argsort(-blocks.confidence, kind="stable")
    counters = {"figure": 0, "table": 0}
    tags = {}
    for i in det:
        name = str(blocks.class_name[i])
        if name in UNMASKED_LABELS:
            continue
        if "figure" in name.lower():
            k = counters["figure"]; counters["figure"] += 1
            tags[int(i)] = placeholder_tag(page_num, "figure", k)
            crops[(page_num, "figure", k)] = str(blocks.text[i])
        elif "table" in name.lower():
            k = counters["table"]; counters["table"] += 1
            tags[int(i)] = placeholder_tag(page_num, "table", k)
            crops[(page_num, "table", k)] = str(blocks.text[i])
        else:
            tags[int(i)] = f"PAGE {page_num} {name}: HERE"
    # reading order
    order = sorted(
        range(len(blocks)),
        key=lambda i: (blocks.xyxy[i, 1], blocks.xyxy[i, 0], i),
    )
    parts = []
    for i in order:
        name = str(blocks.class_name[i])
        if name == "abandon":
            continue
        contrib = tags.get(i, str(blocks.text[i]))
        if contrib:
            parts.append(contrib)
    return "\n\n".join(parts)


def oracle_extract(
    payload: bytes | None, text: str | None, lang: str | None,
    cfg: PipelineConfig | None = None,
) -> str:
    """Reference-semantics extraction of one document, sequentially."""
    cfg = cfg or PipelineConfig()
    kind = classify_payload_bytes(payload, text)

    if kind == "empty":
        return ""

    crops: dict = {}
    page_strs: list[str] = []

    if kind == "text":
        # pre-extracted text page: enrichment regex + fence strip still apply
        # (the reference OCRs the rendered text page like any other).
        # S4: content-gated RTL normalization, identical to the engine
        # (FileIngestor.py:208-221 applies the Arabic branch per line
        # whenever the libraries import, regardless of document language)
        from ..functions.rtl import contains_rtl, rtl_normalize_text

        src = rtl_normalize_text(text) if contains_rtl(text) else text
        page_strs.append(src.strip())
    elif kind == "html":
        # engine="reference": the oracle always takes the stdlib-HTMLParser
        # tokenizer path, so the byte-identity suite cross-validates the
        # engine's fast regex scanner against it on every run
        blocks, _ = blocks_table_from_html(
            payload, cfg.link_density_abandon, cfg.boilerplate_hints,
            engine="reference",
        )
        if cfg.filter_dup and len(blocks):
            blocks = filter_duplicates(blocks, iou=cfg.iou)
        page_strs.append(_oracle_page(blocks, 0, crops))
    else:
        layout = LayoutStub(cfg.conf)
        recog = RecognizerStub()
        try:
            pages = decode_fake_doc(payload)
        except ValueError as e:
            return ocr_failed_sentinel(str(e)).replace("```", "")
        for pnum, page in enumerate(pages):
            blocks = analyze_fake_page(page, layout, recog, cfg)
            page_strs.append(_oracle_page(blocks, pnum, crops))

    skeleton = PAGE_SEPARATOR.join(page_strs)

    # enrichment exactly as the reference: pattern.sub with a lookup callback
    # (MarkdownEnricher.py:62-67); every match gets an entry (content or
    # sentinel), so substitution always fires
    def _cb(m):
        typ = m.group(2).lower()
        idx = m.group(3)
        if idx is not None:
            key = (int(m.group(1)), typ, int(idx))
            if key in crops:
                return f"\n{crops[key]}\n"
            key2 = (int(m.group(1)), typ.rstrip("s"), int(idx))
            if key2 in crops:
                return f"\n{crops[key2]}\n"
        return missing_crop_sentinel(typ, idx)

    final = PLACEHOLDER_PATTERN.sub(_cb, skeleton)
    return final.replace("```", "")
