"""Unit tests for the geometry kernel library (K1-K6, reference
utils.py:12-68 and DLA.py:478-483) against hand-computed matrices."""

import numpy as np
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.functions.geometry import (
    bbox_iou_vert,
    boxes_area,
    boxes_inclusion,
    boxes_iou,
    boxes_stats,
    pad_boxes,
    union_box,
    vert_dist,
)

BOXES = np.array(
    [
        [0, 0, 10, 10],    # A: area 100
        [5, 5, 15, 15],    # B: overlaps A by 25
        [20, 20, 30, 30],  # C: disjoint
        [2, 2, 8, 8],      # D: fully inside A, area 36
    ],
    dtype=float,
)


def test_boxes_area():
    assert list(boxes_area(BOXES.T)) == [100, 100, 100, 36]


def test_boxes_stats_intersection():
    _, inter, union = boxes_stats(BOXES)
    assert inter[0, 1] == 25
    assert inter[0, 2] == 0
    assert inter[0, 3] == 36
    assert union[0, 1] == 175
    assert union[0, 0] == 100


def test_boxes_iou_hand_computed():
    iou = boxes_iou(BOXES)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(25 / 175)
    assert iou[0, 2] == 0.0
    assert iou[0, 3] == pytest.approx(36 / 100)
    # symmetric
    assert np.allclose(iou, iou.T)


def test_boxes_iou_dzeros():
    iou = boxes_iou(BOXES, dzeros=True)
    assert np.all(np.diag(iou) == 0)


def test_boxes_inclusion_asymmetric():
    # inc[i, j] = inter(i, j) / area(j): fraction of box j overlapping box i
    # (broadcast semantics of reference utils.py:58-68)
    inc = boxes_inclusion(BOXES)
    # D fully inside A -> all of D overlaps: inc[A, D] = 36/36 = 1
    assert inc[0, 3] == pytest.approx(1.0)
    # but only 36% of A overlaps D: inc[D, A] = 36/100
    assert inc[3, 0] == pytest.approx(0.36)


def test_inclusion_zero_area_box_no_nan():
    boxes = np.array([[0, 0, 0, 0], [0, 0, 10, 10]], dtype=float)
    inc = boxes_inclusion(boxes)
    assert np.isfinite(inc).all()


def test_union_box():
    assert list(union_box(BOXES[:2])) == [0, 0, 15, 15]


def test_vert_dist_shape():
    d = vert_dist(BOXES[:, 1], BOXES[:, 3])
    assert d.shape == (4, 4)
    assert d[0, 0] == 0


def test_bbox_iou_vert_flattens_x():
    # boxes sharing the same y-band have vertical IoU 1 regardless of x
    boxes = np.array([[0, 0, 5, 10], [100, 0, 200, 10]], dtype=float)
    v = bbox_iou_vert(boxes)
    assert v[0, 1] == pytest.approx(1.0)


def test_pad_boxes_only_visual_classes_padded_and_clamped():
    xyxy = np.array([[0, 0, 100, 100], [500, 500, 600, 600]], dtype=float)
    labels = np.array(["text", "table"], dtype=object)
    out = pad_boxes(xyxy, labels, height=1000, width=1000)
    assert list(out[0]) == [0, 0, 100, 100]  # text untouched
    # padding = min(1000,1000)*0.005 = 5 -> int truncation
    assert list(out[1]) == [495, 495, 605, 605]
    # clamping at page edge
    out2 = pad_boxes(
        np.array([[0, 0, 1000, 1000]], dtype=float),
        np.array(["figure"], dtype=object),
        height=1000, width=1000,
    )
    assert list(out2[0]) == [0, 0, 1000, 1000]
