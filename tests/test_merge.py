"""Unit tests for the D1 fixpoint merge (reference DLA.py:193-251) — the
cases FIXTURES.md §2.1 prescribes: threshold boundary, chained merges, empty
table, single box, all-overlapping degenerate case, order preservation."""

import numpy as np

from ocr_pipeline_fastapi_latency_optimization_ray.functions.merge import (
    Blocks,
    filter_duplicates,
    merge_object_pair,
)


def mk(boxes, names, conf=None, texts=None):
    n = len(boxes)
    return Blocks(
        xyxy=np.array(boxes, dtype=float),
        confidence=np.array(conf if conf is not None else [1.0 - 0.01 * i for i in range(n)]),
        class_name=np.array(names, dtype=object),
        text=np.array(texts if texts is not None else [f"t{i}" for i in range(n)], dtype=object),
    )


def test_empty_table():
    out = merge_object_pair(Blocks.empty(), "text", tlabel="abandon", threshold=0.5)
    assert len(out) == 0


def test_single_box_untouched():
    b = mk([[0, 0, 10, 10]], ["text"])
    out = merge_object_pair(b, "text", tlabel="abandon", threshold=0.5)
    assert len(out) == 1
    assert list(out.xyxy[0]) == [0, 0, 10, 10]


def test_no_merge_below_threshold():
    # abandon box only 25% inside the text box -> below 0.5 threshold
    b = mk([[0, 0, 10, 10], [5, 5, 15, 15]], ["text", "abandon"])
    out = merge_object_pair(b, "text", tlabel="abandon", threshold=0.5)
    assert len(out) == 2


def test_merge_at_threshold_boundary():
    # text box A [0,0,10,10]; abandon box exactly half-overlapping A:
    # inclusion of A inside B = 50/100 = 0.5 -> merges at threshold 0.5 (>=)
    b = mk([[0, 0, 10, 10], [0, 0, 10, 5]], ["text", "abandon"])
    out = merge_object_pair(b, "text", tlabel="abandon", threshold=0.5)
    assert len(out) == 1
    assert out.class_name[0] == "text"
    assert list(out.xyxy[0]) == [0, 0, 10, 10]


def test_union_grows_base_box():
    b = mk([[0, 0, 10, 10], [2, 2, 20, 8]], ["text", "abandon"])
    # inclusion of text row0 in abandon row1: inter (2..10 x 2..8)=48 /100 ->
    # 0.48 < 0.5 no merge; lower threshold merges and unions
    out = merge_object_pair(b, "text", tlabel="abandon", threshold=0.4)
    assert len(out) == 1
    assert list(out.xyxy[0]) == [0, 0, 20, 10]


def test_chained_merge_fixpoint():
    # A-B overlap, B-C overlap but A-C don't: first sweep merges B into A
    # (growing A to cover C), second sweep merges C -> fixpoint chains
    b = mk(
        [[0, 0, 10, 10], [8, 0, 18, 10], [16, 0, 26, 10]],
        ["text", "text", "text"],
    )
    out = merge_object_pair(b, "text")  # same-class, threshold 0
    assert len(out) == 1
    assert list(out.xyxy[0]) == [0, 0, 26, 10]


def test_all_overlapping_degenerate():
    boxes = [[0, 0, 10, 10]] * 5
    b = mk(boxes, ["text"] * 5)
    out = merge_object_pair(b, "text")
    assert len(out) == 1


def test_order_preserved_and_base_keeps_identity():
    # score-desc order must survive merging: row order is preserved, merged
    # rows removed, base row edited in place (reference DLA.py:485-506)
    b = mk(
        [[0, 0, 10, 10], [100, 0, 110, 10], [1, 1, 9, 9]],
        ["text", "text", "text"],
        conf=[0.9, 0.8, 0.7],
    )
    out = merge_object_pair(b, "text")
    assert len(out) == 2
    assert list(out.confidence) == [0.9, 0.8]
    assert list(out.block_id) == [0, 1]


def test_cross_class_merge_does_not_touch_other_classes():
    b = mk(
        [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
        ["text", "formula", "figure"],
    )
    out = merge_object_pair(b, ["text", "table", "figure"], tlabel="formula", threshold=0.5)
    assert len(out) == 2
    assert set(out.class_name) == {"text", "figure"}


def test_filter_duplicates_golden_sequence():
    # text + overlapping abandon + duplicate text + disjoint table
    b = mk(
        [
            [0, 0, 100, 100],     # text
            [0, 0, 100, 100],     # abandon duplicate -> absorbed by pass 1
            [10, 10, 90, 90],     # text duplicate -> absorbed by pass 4
            [200, 200, 300, 300], # table, untouched
        ],
        ["text", "abandon", "text", "table"],
    )
    out = filter_duplicates(b, iou=0.5)
    assert len(out) == 2
    assert sorted(out.class_name) == ["table", "text"]


def test_iteration_cap_terminates():
    b = mk([[0, 0, 10, 10], [0, 0, 10, 10]], ["text", "text"])
    out = merge_object_pair(b, "text", max_iters=1)
    assert len(out) == 1
