"""D2/D3 visual merge tests (functions/merge_visual.py) against
hand-computed geometries mirroring reference DLA.py:253-472 behavior.

Key reference semantic: "vertically aligned" means the two boxes' y-ranges
INTERSECT (``_bbox_iou_vert`` flattens x to [0,1] and takes IoU of the
y-intervals, DLA.py:478-483) — so caption merges fire only for boxes that
overlap vertically, which real detections do because visual boxes are
padded 0.5% before this stage (DLA.py:526-534)."""

from __future__ import annotations

import numpy as np

from ocr_pipeline_fastapi_latency_optimization_ray.functions.merge import Blocks
from ocr_pipeline_fastapi_latency_optimization_ray.functions.merge_visual import (
    merge_formula_text,
    merge_text_figure_table,
)


def mk(boxes, classes):
    n = len(classes)
    return Blocks(
        xyxy=np.array(boxes, dtype=float),
        confidence=np.linspace(0.9, 0.5, n),
        class_name=np.array(classes, dtype=object),
        text=np.array([""] * n, dtype=object),
    )


# ---------------------------------------------------------------------------
# D2: captions / titles
# ---------------------------------------------------------------------------

def test_caption_overlapping_figure_bottom_merges():
    # text overlaps the (padded) figure's bottom band -> caption merge
    b = mk(
        [[100, 100, 500, 400], [120, 390, 480, 430]],
        ["figure", "text"],
    )
    out = merge_text_figure_table(b)
    assert len(out) == 1
    assert out.class_name[0] == "figure"
    assert list(out.xyxy[0]) == [100, 100, 500, 430]


def test_caption_strictly_below_not_aligned_no_merge():
    # disjoint y-ranges -> iou_vert == 0 -> never a candidate
    b = mk(
        [[100, 100, 500, 400], [120, 410, 480, 440]],
        ["figure", "text"],
    )
    assert len(merge_text_figure_table(b)) == 2


def test_caption_bottom_exceeds_height_window_no_merge():
    # is_close_enough: cand_bottom - fig_bottom must be <= fig height
    b = mk(
        [[100, 100, 500, 200], [120, 190, 480, 320]],
        ["figure", "text"],
    )
    assert len(merge_text_figure_table(b)) == 2  # 320-200=120 > height 100


def test_left_outdented_caption_not_merged():
    # text starts left of figure AND ends left of figure right edge
    b = mk(
        [[200, 100, 500, 400], [100, 390, 450, 430]],
        ["figure", "text"],
    )
    assert len(merge_text_figure_table(b)) == 2


def test_multiline_chain_merges_first_then_stops_on_gap():
    # three text candidates inside the figure band; the walk always merges
    # the first (DLA.py:346), then breaks on gap > 2x height
    b = mk(
        [
            [100, 100, 500, 400],   # figure (h=300)
            [120, 150, 480, 160],   # A (h=10)
            [120, 340, 480, 350],   # B: gap A->B = 180 > 2*10 -> stop
            [120, 390, 480, 420],   # C (never reached)
        ],
        ["figure", "text", "text", "text"],
    )
    out = merge_text_figure_table(b)
    assert len(out) == 3
    fig = out.take(out.class_name == "figure")
    assert list(fig.xyxy[0]) == [100, 100, 500, 400]  # A was inside already


def test_table_title_above_merges():
    # text x-included, overlapping the table's top band
    b = mk(
        [[120, 80, 480, 130], [100, 120, 500, 400]],
        ["text", "table"],
    )
    out = merge_text_figure_table(b)
    assert len(out) == 1
    assert out.class_name[0] == "table"
    assert list(out.xyxy[0]) == [100, 80, 500, 400]


def test_no_visual_blocks_noop():
    b = mk([[0, 0, 10, 10], [20, 20, 30, 30]], ["text", "text"])
    assert len(merge_text_figure_table(b)) == 2


# ---------------------------------------------------------------------------
# D3: formula-text merges
# ---------------------------------------------------------------------------

def test_text_in_formula_band_with_square_aspect_merges():
    b = mk(
        [[100, 100, 600, 200], [300, 120, 360, 180]],
        ["formula", "text"],
    )
    out = merge_formula_text(b)
    assert len(out) == 1 and out.class_name[0] == "formula"


def test_wide_text_in_band_rejected_by_s1_and_s2_inert():
    # aspect 300/30=10 >= 2 -> strategy 1 rejects. Strategy 2 can never fire
    # in the reference: its blocker mask is ``~is_formula`` (DLA.py:461),
    # which includes every text candidate, so the window cut
    # ``top < blockers.min()`` always excludes the candidate itself.
    # Faithfully preserved -> no merge.
    b = mk(
        [[100, 100, 600, 200], [150, 130, 450, 160]],
        ["formula", "text"],
    )
    assert len(merge_formula_text(b)) == 2


def test_strategy2_is_dead_code_as_in_reference():
    # text overlapping the formula's bottom band but not contained in it:
    # strategy 1 misses (not inside), strategy 2 self-blocks (see above)
    b = mk(
        [[100, 100, 600, 300], [100, 280, 600, 330]],
        ["formula", "text"],
    )
    assert len(merge_formula_text(b)) == 2


def test_empty_and_no_formula_noop():
    assert len(merge_formula_text(Blocks.empty())) == 0
    b = mk([[0, 0, 10, 10]], ["text"])
    assert len(merge_formula_text(b)) == 1


# ---------------------------------------------------------------------------
# pipeline wiring: merge_visual=True flows through extraction
# ---------------------------------------------------------------------------

def test_merge_visual_config_changes_output():
    from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.payloads import (
        encode_fake_pdf,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import (
        extract_document,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        LayoutStub, RecognizerStub,
    )

    # figure with an overlapping caption line (raw label 1 = image -> figure;
    # raw label 2 = text)
    page = {
        "w": 1000, "h": 1000,
        "blocks": [
            {"cls_id": 1, "score": 0.9, "bbox": [100, 100, 500, 400],
             "text": "FIG"},
            {"cls_id": 2, "score": 0.8, "bbox": [120, 390, 480, 430],
             "text": "Caption line"},
        ],
    }
    payload = encode_fake_pdf([page])
    layout, rec = LayoutStub(), RecognizerStub()

    off = extract_document(payload, None, "en", PipelineConfig(),
                           layout=layout, recognizer=rec, kind="pdf")
    on = extract_document(payload, None, "en",
                          PipelineConfig(merge_visual=True),
                          layout=layout, recognizer=rec, kind="pdf")
    assert off.extracted_text != on.extracted_text
    # merged: caption text is captured inside the figure region, so the
    # separate text block disappears
    assert on.n_blocks_kept < off.n_blocks_kept
