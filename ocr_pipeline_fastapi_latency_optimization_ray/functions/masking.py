"""Masking / placeholder stamping / skeleton building (M4 analog).

The reference white-masks every block NOT in {text, formula, abandon} and
stamps a deterministic placeholder tag at the block position
(ContentMasker.py:53-81), with per-page per-class counters in mask-metadata
order — which is detection order, i.e. score-descending (DLA.py:515 sort
feeds DLA.py:622-653 ``save_structure_json``). The main OCR pass then reads
the masked page in visual order, so placeholders appear in the skeleton in
READING order while their indices were assigned in DETECTION order.

Our deterministic engine reproduces both orders explicitly:
  - ``detection_idx``: permutation of blocks in score-descending order
    (stable; ties broken by original index) — drives tag counters;
  - ``reading_idx``: permutation in visual reading order (y0, then x0) —
    drives skeleton assembly; for HTML this equals document order.

The "crop" content for each masked block is carried in-band (binary/string
column) instead of a crop PNG on disk (reference S7, DLA.py:588-620).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import UNMASKED_LABELS, placeholder_tag, placeholder_tag_fallback
from .merge import Blocks


@dataclass
class PageSkeleton:
    parts: list[str]          # one contribution per kept block, reading order
    block_ids: list[int]      # parallel block ids
    enrich: list[tuple[int, str, int, str]]  # (page, type, index, content)
    n_kept: int
    n_dropped: int
    # mask metadata (S8 analog, DLA.py:622-653 save_structure_json): one
    # (object=class_name, bbox) per masked block, detection order
    mask_meta: list[tuple[str, list[float]]] = None


def detection_order(blocks: Blocks) -> np.ndarray:
    """Score-descending stable permutation (reference DLA.py:515; stable sort
    with original-index tiebreak so equal scores cannot reorder —
    SURVEY.md §7.4 determinism risk)."""
    return np.argsort(-blocks.confidence, kind="stable")


def reading_order(blocks: Blocks) -> np.ndarray:
    """Visual reading order: (y_min, x_min, original index)."""
    n = len(blocks)
    return np.lexsort((np.arange(n), blocks.xyxy[:, 0], blocks.xyxy[:, 1]))


def build_page_skeleton(
    blocks: Blocks,
    page_num: int,
    crop_text: dict[int, str] | None = None,
) -> PageSkeleton:
    """Build one page's skeleton parts + enrichment entries.

    ``crop_text`` optionally overrides the enrichment content per block id
    (the PDF branch recognizer supplies region-OCR text); by default the
    block's own ``text`` payload is used (HTML branch).
    """
    det_idx = detection_order(blocks)
    read_idx = reading_order(blocks)

    # Tag assignment in detection order with per-class counters
    # (ContentMasker.py:57-77: fig_count / table_count per page).
    counters: dict[str, int] = {}
    tags: dict[int, str] = {}        # block array index -> tag
    enrich: list[tuple[int, str, int, str]] = []
    mask_meta: list[tuple[str, list[float]]] = []
    for i in det_idx:
        name = blocks.class_name[i]
        if name in UNMASKED_LABELS:
            continue
        mask_meta.append((str(name), [float(v) for v in blocks.xyxy[i]]))
        lower = name.lower()
        if "figure" in lower:
            k = counters.get("figure", 0)
            counters["figure"] = k + 1
            tags[int(i)] = placeholder_tag(page_num, "figure", k)
            key = ("figure", k)
        elif "table" in lower:
            k = counters.get("table", 0)
            counters["table"] = k + 1
            tags[int(i)] = placeholder_tag(page_num, "table", k)
            key = ("table", k)
        else:
            # ContentMasker.py:76-77 fallback for other captions
            tags[int(i)] = placeholder_tag_fallback(page_num, name)
            key = None
        if key is not None:
            content = (
                crop_text[int(i)]
                if crop_text is not None and int(i) in crop_text
                else str(blocks.text[i])
            )
            enrich.append((page_num, key[0], key[1], content))

    parts: list[str] = []
    block_ids: list[int] = []
    n_dropped = 0
    for i in read_idx:
        name = blocks.class_name[i]
        if name == "abandon":
            n_dropped += 1
            continue
        if int(i) in tags:
            contrib = tags[int(i)]
        else:
            contrib = str(blocks.text[i])
        if not contrib:
            n_dropped += 1
            continue
        parts.append(contrib)
        block_ids.append(int(blocks.block_id[i]))
    return PageSkeleton(
        parts=parts,
        block_ids=block_ids,
        enrich=enrich,
        n_kept=len(parts),
        n_dropped=n_dropped,
        mask_meta=mask_meta,
    )
