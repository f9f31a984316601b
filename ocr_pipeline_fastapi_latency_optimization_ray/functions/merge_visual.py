"""Visual merge operators D2/D3 (caption/title/formula attachment).

Semantics re-derived from the reference:
  - D2 ``merge_text_figure_table`` — text captions below figures/tables and
    titles above tables merge into the visual block (DLA.py:253-417), with
    the multi-line caption walk and its stop conditions (DLA.py:348-375).
  - D3 ``merge_formula_text``     — text inside a formula's vertical band
    with near-square aspect, and text stacked below a formula with no
    non-formula blocker between, merge in (DLA.py:419-472).

Both production call sites run with ``merge_visual=False`` (ocr_app.py:990,
backup_app.py:146) so these are OFF in the golden path; they are part of the
reference's operator surface (SURVEY.md §2.4) and are exposed through
``PipelineConfig(merge_visual=True)``.

Like D1, these edit only geometry and row membership: block text is
recognized AFTER merging (stages/layout.py), so a grown box captures the
text of everything merged into it — the in-band analog of the reference
cropping the union box.

Quirks of the reference preserved deliberately:
  - the nearest-neighbor constraint reuses the mutated ``is_below`` mask
    (DLA.py:292), not a fresh one;
  - ``is_close_enough`` compares candidate BOTTOM minus base bottom against
    the BASE height (DLA.py:301), not the gap against the candidate height;
  - the single-candidate table rule uses ``dist_y`` measured top-minus-
    bottom (DLA.py:298,310);
  - the multi-line walk always merges the first candidate before applying
    stop conditions between consecutive pairs (DLA.py:346);
  - D3 strategy 2 (text stacked below a formula, DLA.py:451-470) is DEAD
    CODE in the reference: its blocker mask ``~is_formula`` includes every
    text candidate, so the window cut ``top < blockers.min()`` always
    excludes the candidate itself. Preserved as-is (pinned by
    tests/test_merge_visual.py).
"""

from __future__ import annotations

import numpy as np

from .geometry import bbox_iou_vert, boxes_inclusion, union_box
from .merge import Blocks


def _union_into(blocks: Blocks, base: int, merge_idx) -> None:
    idx = [base, *list(merge_idx)]
    blocks.xyxy[base, :] = union_box(blocks.xyxy[idx, :])


def merge_text_figure_table(blocks: Blocks) -> Blocks:
    """D2: captions below figures/tables, titles above tables (DLA.py:253-417)."""
    det = blocks.copy()
    n = len(det)
    if n == 0:
        return det
    names = det.class_name
    is_text = names == "text"
    is_fig = names == "figure"
    is_table = names == "table"
    keep = np.ones(n, dtype=bool)

    if not (is_text.sum() * (is_fig.sum() + is_table.sum())):
        return det

    # ---- pass 1: text at the BOTTOM of figures/tables (captions) ----
    for i in range(n):
        if not (keep[i] and (is_fig[i] or is_table[i])):
            continue
        bbox = det.xyxy.astype(float)
        is_below = bbox[:, 1] > bbox[i, 1]
        iou_vert = bbox_iou_vert(bbox)
        is_aligned = iou_vert[i, :] > 0

        # nearest non-text neighbor below bounds the search window
        nontext_below = is_below * is_aligned * (~is_text)
        if nontext_below.sum():
            is_below = is_below & (bbox[:, 1] < bbox[nontext_below, 1].min())

        heights = bbox[:, 3] - bbox[:, 1]
        widths = bbox[:, 2] - bbox[:, 0]
        dist_y = bbox[:, 1] - bbox[i, 3]
        is_close_enough = (bbox[:, 3] - bbox[i, 3]) <= heights[i]

        valid = is_text & is_below & is_aligned & is_close_enough & keep

        if valid.sum() == 1:
            idx = int(np.argmax(valid))
            should = True
            if is_table[i] and dist_y[idx] > heights[idx]:
                should = False
            if (bbox[idx, 0] < bbox[i, 0]) and (bbox[idx, 2] < bbox[i, 2]):
                should = False
            if is_fig[i]:
                mat_inc = boxes_inclusion(bbox, dzeros=True)
                center_x = (bbox[i, 2] + bbox[i, 0]) / 2
                if (bbox[idx, 2] < center_x) and (mat_inc[i, idx] < 0.5):
                    should = False
            if should:
                _union_into(det, i, [idx])
                is_text[idx] = False
                keep[idx] = False

        elif valid.sum() > 1:
            indices = np.nonzero(valid)[0]
            indices = indices[np.argsort(bbox[indices, 1], kind="stable")]
            is_main_inc = (bbox[:, 0] >= bbox[i, 0]) & (bbox[:, 2] <= bbox[i, 2])
            to_merge = [int(indices[0])]
            for k in range(len(indices) - 1):
                curr, nxt = int(indices[k]), int(indices[k + 1])
                gap = bbox[nxt, 1] - bbox[curr, 3]
                if (2 * heights[curr] < gap) or (2 * heights[nxt] < gap):
                    break
                if widths[i] / max(widths[curr], 1e-9) > 4:
                    break
                if not iou_vert[curr, nxt]:
                    break
                if is_main_inc[curr] and not is_main_inc[nxt]:
                    break
                if not is_main_inc[curr] and not is_main_inc[nxt]:
                    break
                if not is_main_inc[curr]:
                    if (bbox[nxt, 0] <= bbox[curr, 0]) or (bbox[nxt, 2] >= bbox[curr, 2]):
                        break
                center_curr = (bbox[curr, 2] + bbox[curr, 0]) / 2
                if bbox[nxt, 2] < center_curr:
                    break
                if (bbox[nxt, 0] < bbox[i, 0]) and (bbox[nxt, 2] < bbox[i, 2]):
                    break
                to_merge.append(nxt)
            _union_into(det, i, to_merge)
            is_text[to_merge] = False
            keep[to_merge] = False

    # ---- pass 2: text at the TOP of tables (titles) ----
    for i in range(n):
        if not (keep[i] and is_table[i]):
            continue
        bbox = det.xyxy.astype(float)
        is_above = bbox[:, 3] < bbox[i, 3]
        is_aligned = bbox_iou_vert(bbox)[i, :] > 0

        nontext_above = is_above * is_aligned * (~is_text)
        if nontext_above.sum():
            is_above = is_above & (bbox[:, 3] > bbox[nontext_above, 3].max())

        is_included = (bbox[:, 0] >= bbox[i, 0]) & (bbox[:, 2] <= bbox[i, 2])
        heights = bbox[:, 3] - bbox[:, 1]
        dist_y = bbox[i, 1] - bbox[:, 3]
        is_close = dist_y <= heights

        valid = is_text & is_above & is_aligned & is_included & is_close & keep
        if valid.sum():
            valid = valid & (bbox[:, 3] > bbox[valid, 1].max())
            indices = np.nonzero(valid)[0]
            if len(indices):
                _union_into(det, i, indices)
                is_text[indices] = False
                keep[indices] = False

    return det.take(keep)


def merge_formula_text(blocks: Blocks) -> Blocks:
    """D3: text fragments merge into formulas (DLA.py:419-472)."""
    det = blocks.copy()
    n = len(det)
    if n == 0:
        return det
    names = det.class_name
    is_text = names == "text"
    is_formula = names == "formula"
    keep = np.ones(n, dtype=bool)

    if not (is_formula.sum() * is_text.sum()):
        return det

    # strategy 1: text inside the formula's vertical band, near-square aspect
    for i in range(n):
        if not (is_formula[i] and keep[i]):
            continue
        bbox = det.xyxy.astype(float)
        is_inside = (bbox[i, 3] >= bbox[:, 3]) & (bbox[i, 1] <= bbox[:, 1])
        heights = bbox[:, 3] - bbox[:, 1]
        widths = bbox[:, 2] - bbox[:, 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.maximum(heights, widths) / np.maximum(
                np.minimum(heights, widths), 1e-9
            )
        ratio_ok = ratio < 2
        cand = keep & is_text & is_inside & ratio_ok
        if cand.sum():
            indices = np.nonzero(cand)[0]
            _union_into(det, i, indices)
            keep[indices] = False

    # strategy 2: text stacked below the formula, no non-formula blocker
    for i in range(n):
        if not (is_formula[i] and keep[i]):
            continue
        bbox = det.xyxy.astype(float)
        iou_vert = bbox_iou_vert(bbox)
        is_below = bbox[:, 1] > bbox[i, 1]
        is_aligned = iou_vert[i, :] > 0
        blockers = is_below * is_aligned * (~is_formula)
        if blockers.sum():
            is_below = is_below & (bbox[:, 1] < bbox[blockers, 1].min())
        cand = keep & is_text & is_below & is_aligned
        if cand.sum():
            indices = np.nonzero(cand)[0]
            _union_into(det, i, indices)
            keep[indices] = False

    return det.take(keep)
