"""Geometry kernel library (pure numpy).

Re-implements the reference's scalar/array function library with identical
semantics (SURVEY.md §2.3, kernels K1-K6):

  - boxes_area       — reference utils.py:20-21   (K1)
  - boxes_stats      — reference utils.py:23-41   (K2)
  - boxes_iou        — reference utils.py:44-55   (K3)
  - boxes_inclusion  — reference utils.py:58-68   (K4)
  - vert_dist        — reference utils.py:12-18   (K5)
  - bbox_iou_vert    — reference DLA.py:478-483   (K6)

Boxes are float arrays of shape (n, 4) in (x_min, y_min, x_max, y_max) format.
All-pairs matrices are tiny (tens of blocks per page), so these run per group
inside ``map_batches`` — the parallelism axis is rows/documents, never pairs.
"""

from __future__ import annotations

import numpy as np


def boxes_area(box: np.ndarray) -> np.ndarray:
    """Area per box. Accepts the transposed layout the reference uses
    (``boxes_area(boxes.T)``): box[0], box[1], box[2], box[3] are the
    x1/y1/x2/y2 vectors."""
    return (box[2] - box[0]) * (box[3] - box[1])


def boxes_stats(boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All-pairs (area, intersection, union) via broadcast."""
    area = boxes_area(boxes.T)
    top_left = np.maximum(boxes[:, None, :2], boxes[:, :2])
    bottom_right = np.minimum(boxes[:, None, 2:], boxes[:, 2:])
    area_inter = np.prod(np.clip(bottom_right - top_left, a_min=0, a_max=None), axis=2)
    area_union = area[:, None] + area - area_inter
    return area, area_inter, area_union


def boxes_iou(boxes: np.ndarray, dzeros: bool = False) -> np.ndarray:
    """Symmetric IoU matrix; ``dzeros`` zeroes the diagonal."""
    area, area_inter, area_union = boxes_stats(boxes)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = area_inter / area_union
    ratio = np.nan_to_num(ratio, nan=0.0, posinf=0.0, neginf=0.0)
    if dzeros:
        ratio[np.diag_indices_from(ratio)] = 0
    return ratio


def boxes_inclusion(boxes: np.ndarray, dzeros: bool = False) -> np.ndarray:
    """Asymmetric inclusion matrix: entry (i, j) = inter(i, j) / area(j) —
    the fraction of box j that overlaps box i (broadcast divides each column
    j by area[j], exactly as reference utils.py:58-68)."""
    area, area_inter, _ = boxes_stats(boxes)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = area_inter / area
    ratio = np.nan_to_num(ratio, nan=0.0, posinf=0.0, neginf=0.0)
    if dzeros:
        ratio[np.diag_indices_from(ratio)] = 0
    return ratio


def vert_dist(v0: np.ndarray, v1: np.ndarray) -> np.ndarray:
    """Min pairwise distance among the 4 y-edge combinations (K5)."""
    n = len(v0)
    ds = np.zeros((n, n))
    for i in range(n):
        mt = np.abs(np.array([v0[i] - v0, v0[i] - v1, v1[i] - v0, v1[i] - v1]))
        ds[i, :] = np.min(mt, 0)
    return ds


def bbox_iou_vert(bbox: np.ndarray) -> np.ndarray:
    """Vertical-projection IoU: x-coords flattened to [0, 1] (K6)."""
    cbbox = bbox.astype(float).copy()
    cbbox[:, [0, 2]] = [0, 1]
    return boxes_iou(cbbox, dzeros=False)


def union_box(boxes: np.ndarray) -> np.ndarray:
    """Bounding box of a set of boxes (min x, min y, max x, max y) —
    reference ``_union_objects`` DLA.py:499-506."""
    return np.array(
        [boxes[:, 0].min(), boxes[:, 1].min(), boxes[:, 2].max(), boxes[:, 3].max()]
    )


def pad_boxes(
    xyxy: np.ndarray, labels: np.ndarray, height: float, width: float,
    frac: float = 0.005, pad_labels: frozenset = frozenset({"table", "formula", "figure"}),
) -> np.ndarray:
    """Pad table/formula/figure boxes by ``frac * min(H, W)``, clamped to the
    page bounds — reference ``_convert_pp_to_sv`` padding (DLA.py:526-534).
    Boxes are int-cast first (DLA.py:517), and the padded result stays int
    (the reference assigns the padded floats into an int array)."""
    out = xyxy.astype(int).copy()
    padding = min(height, width) * frac
    for i, name in enumerate(labels):
        if name in pad_labels:
            out[i, :] = [
                max(0, out[i, 0] - padding),
                max(0, out[i, 1] - padding),
                min(width, out[i, 2] + padding),
                min(height, out[i, 3] + padding),
            ]
    return out
