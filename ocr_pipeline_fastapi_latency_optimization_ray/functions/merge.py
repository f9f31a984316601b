"""Block-table merge/dedup operators (the heart of DLA — SURVEY.md §2.4).

Operates on one page's block table held as a columnar struct-of-arrays
(``Blocks``), exactly like the reference holds ``sv.Detections``
(DLA.py:536-541). Semantics faithfully re-derived from:

  - D1 generic fixpoint merge  — reference DLA.py:193-251 (`_merge_object_pair`)
  - union/removal helpers      — reference DLA.py:485-506
  - golden-path invocation     — reference DLA.py:149-171 (`analyze`,
    filter_dup=True): four passes with thresholds (iou, iou, iou, 0.0)

The golden path runs with ``merge_visual=False`` (ocr_app.py:990), so the
caption-attachment passes D2/D3 (DLA.py:253-472) are implemented separately in
``merge_visual.py`` and off by default.

Fixpoint cost is worst-case O(n^3) in pathological block counts; iterations
are capped at ``MERGE_MAX_ITERS`` and the hit is reported so lineage can
record it (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import IOU_THRESHOLD, MERGE_MAX_ITERS
from .geometry import boxes_inclusion, union_box


@dataclass
class Blocks:
    """Columnar per-page block table (struct-of-arrays, analog of
    ``sv.Detections``)."""

    xyxy: np.ndarray          # (n, 4) float/int
    confidence: np.ndarray    # (n,) float
    class_name: np.ndarray    # (n,) object/str
    text: np.ndarray          # (n,) object — block text payload (our engine
                              # carries text in-band instead of crop PNGs)
    block_id: np.ndarray = field(default=None)  # (n,) int32 stable ids

    def __post_init__(self):
        if self.block_id is None:
            self.block_id = np.arange(len(self.confidence), dtype=np.int32)

    def __len__(self) -> int:
        return len(self.confidence)

    def take(self, mask_or_idx) -> "Blocks":
        return Blocks(
            xyxy=self.xyxy[mask_or_idx],
            confidence=self.confidence[mask_or_idx],
            class_name=self.class_name[mask_or_idx],
            text=self.text[mask_or_idx],
            block_id=self.block_id[mask_or_idx],
        )

    def copy(self) -> "Blocks":
        return Blocks(
            xyxy=self.xyxy.copy(),
            confidence=self.confidence.copy(),
            class_name=self.class_name.copy(),
            text=self.text.copy(),
            block_id=self.block_id.copy(),
        )

    @staticmethod
    def empty() -> "Blocks":
        return Blocks(
            xyxy=np.zeros((0, 4), dtype=float),
            confidence=np.zeros(0, dtype=float),
            class_name=np.array([], dtype=object),
            text=np.array([], dtype=object),
            block_id=np.zeros(0, dtype=np.int32),
        )


def merge_object_pair(
    blocks: Blocks,
    rlabel: str | list[str],
    tlabel: str | list[str] | None = None,
    threshold: float = 0.0,
    max_iters: int = MERGE_MAX_ITERS,
) -> Blocks:
    """Generic fixpoint merge (D1, reference DLA.py:193-251).

    For each base box of class in ``rlabel``, find candidates of class in
    ``tlabel`` (or the same class when ``tlabel`` is None) whose inclusion
    score — the fraction of the *candidate* overlapping the base,
    ``inter(base, cand) / area(cand)`` — is >= ``threshold``; union the
    candidates into the base box
    (min/min/max/max), drop the merged rows; repeat until no change.

    Sweep-level details preserved exactly:
      - the inclusion matrix is computed ONCE per sweep (box growth during a
        sweep is not observed until the next sweep);
      - merged rows' matrix rows/cols are zeroed within the sweep so they
        cannot merge again;
      - array order (score-descending from detection) is preserved — removal
        filters, union edits the base row in place.
    """
    if isinstance(rlabel, str):
        rlabel = [rlabel]
    if isinstance(tlabel, str):
        tlabel = [tlabel]

    merged = blocks.copy()
    rset = set(rlabel)
    tset = set(tlabel) if tlabel is not None else None

    for _ in range(max_iters):
        if len(merged) == 0:
            return merged
        current = merged.class_name
        is_base = np.array([c in rset for c in current], dtype=bool)
        if not is_base.any():
            return merged

        mat = boxes_inclusion(merged.xyxy.astype(float), dzeros=True)
        keep = np.ones(len(merged), dtype=bool)
        changed = False

        for i in range(len(merged)):
            if not is_base[i]:
                continue
            if tset is None:
                cand = current == current[i]
            else:
                cand = np.array([c in tset for c in current], dtype=bool)
            scores = mat[i, :].copy()
            scores[~cand] = 0.0
            scores[scores < threshold] = 0.0
            if scores.sum() > 0:
                merge_idx = np.nonzero(scores)[0]
                merged.xyxy[i, :] = union_box(
                    merged.xyxy[[i, *merge_idx.tolist()], :]
                )
                keep[merge_idx] = False
                mat[merge_idx, :] = 0
                mat[:, merge_idx] = 0
                changed = True

        merged = merged.take(keep)
        if not changed:
            return merged
    return merged  # iteration cap hit (recorded upstream in lineage)


def filter_duplicates(blocks: Blocks, iou: float = IOU_THRESHOLD) -> Blocks:
    """The golden-path duplication-filter sequence (reference DLA.py:151-171,
    invoked with filter_dup=True):

      1. text absorbs overlapping abandon blocks,
      2. text/table/figure absorb overlapping formula blocks,
      3. abandon absorbs into any overlapping class (incl. abandon),
      4. same-class overlap cleanup among the four main classes (threshold 0).
    """
    # fast path: if no two boxes overlap at all, every pass is a no-op
    # (the common case for well-formed HTML synthetic geometry — blocks are
    # stacked with gaps).
    if len(blocks) < 2:
        return blocks
    # O(n log n) pretest first: boxes whose y-intervals are pairwise disjoint
    # (stacked layout) cannot overlap regardless of x — sort by y-top and
    # check each top clears the previous bottom. Only when that fails pay
    # the O(n^2) all-pairs inclusion matrix.
    y1 = blocks.xyxy[:, 1].astype(float)
    y2 = blocks.xyxy[:, 3].astype(float)
    order = np.argsort(y1, kind="stable")
    if np.all(y1[order][1:] >= y2[order][:-1]):
        return blocks
    if boxes_inclusion(blocks.xyxy.astype(float), dzeros=True).max() <= 0.0:
        return blocks
    b = merge_object_pair(blocks, "text", tlabel="abandon", threshold=iou)
    b = merge_object_pair(b, ["text", "table", "figure"], tlabel="formula", threshold=iou)
    b = merge_object_pair(
        b, "abandon", tlabel=["figure", "table", "formula", "text", "abandon"],
        threshold=iou,
    )
    b = merge_object_pair(b, ["text", "figure", "table", "formula"])
    return b
