"""Tests for placeholder parsing/substitution (M9-M12, reference
MarkdownEnricher.py:24-94, PageProcessor.py:112-116) — the tolerant-regex,
sentinel and fence-strip cases FIXTURES.md §2.3 prescribes."""

from ocr_pipeline_fastapi_latency_optimization_ray.config import (
    PAGE_SEPARATOR,
    PLACEHOLDER_PATTERN,
    placeholder_tag,
)
from ocr_pipeline_fastapi_latency_optimization_ray.functions.enrich import (
    assemble_skeleton,
    enrich_document,
    finalize_document,
    strip_fences,
)
from ocr_pipeline_fastapi_latency_optimization_ray.functions.masking import PageSkeleton


def page(parts, enrich=()):
    return PageSkeleton(
        parts=list(parts),
        block_ids=list(range(len(parts))),
        enrich=list(enrich),
        n_kept=len(parts),
        n_dropped=0,
    )


def test_regex_matches_canonical_tag():
    m = PLACEHOLDER_PATTERN.search("PAGE 3 figure_2: HERE")
    assert m and m.groups() == ("3", "figure", "2")


def test_regex_tolerant_variants():
    # case-insensitive, escaped underscore, arbitrary junk before index
    for s, groups in [
        ("page 1 table_0: here", ("1", "table", "0")),
        ("Page 12 Figure\\_3 ... HERE", ("12", "Figure", "3")),
        ("PAGE 0 table 7 is right here", ("0", "table", "7")),
    ]:
        m = PLACEHOLDER_PATTERN.search(s)
        assert m and m.groups() == groups, s


def test_regex_missing_index_gives_none_group():
    m = PLACEHOLDER_PATTERN.search("page 2 figure: here")
    assert m and m.group(3) is None


def test_regex_does_not_cross_newlines():
    assert PLACEHOLDER_PATTERN.search("page 1 table\n_0: here") is None


def test_substitution_and_span_adjustment():
    sk = page(["intro", placeholder_tag(0, "table", 0), "outro"])
    skeleton, spans = assemble_skeleton([sk])
    text, spans2 = enrich_document(skeleton, spans, {(0, "table", 0): "| a |"})
    assert text == "intro\n\n\n| a |\n\n\noutro"
    # block 1's span covers the substituted text
    b1 = spans2[1]
    assert text[b1[1] : b1[2]] == "\n| a |\n"
    b2 = spans2[2]
    assert text[b2[1] : b2[2]] == "outro"


def test_missing_crop_sentinel():
    sk = page(["x", placeholder_tag(0, "figure", 5)])
    skeleton, spans = assemble_skeleton([sk])
    text, _ = enrich_document(skeleton, spans, {})
    assert "> **[Missing Crop] Could not find image for figure 5**" in text


def test_missing_index_sentinel_prints_none():
    skeleton = "page 2 figure: here"
    text, _ = enrich_document(skeleton, [(0, 0, len(skeleton))], {})
    assert text == "\n> **[Missing Crop] Could not find image for figure None**\n"


def test_substitution_left_to_right_nonoverlapping():
    sk = page([placeholder_tag(0, "figure", 0), placeholder_tag(0, "figure", 1)])
    skeleton, spans = assemble_skeleton([sk])
    text, _ = enrich_document(
        skeleton, spans, {(0, "figure", 0): "A", (0, "figure", 1): "B"}
    )
    assert text == "\nA\n\n\n\nB\n"


def test_page_separator():
    sk0, sk1 = page(["p0"]), page(["p1"])
    skeleton, spans = assemble_skeleton([sk0, sk1])
    assert skeleton == f"p0{PAGE_SEPARATOR}p1"
    assert spans == [(0, 0, 2), (0, 9, 11)]


def test_fence_strip_adjusts_spans():
    text = "a```b```c"
    spans = [(0, 0, len(text))]
    out, spans2 = strip_fences(text, spans)
    assert out == "abc"
    assert spans2 == [(0, 0, 3)]


def test_finalize_document_end_to_end():
    sk = page(
        ["start", placeholder_tag(0, "table", 0), "```fenced```"],
    )
    text, spans, kept, dropped = finalize_document(
        [sk], {(0, "table", 0): "| t |"}
    )
    assert "```" not in text
    assert "| t |" in text
    assert kept == 3 and dropped == 0
    for bid, s, e in spans:
        assert 0 <= s <= e <= len(text)


def test_adversarial_body_text_matching_regex_is_substituted():
    # body text that merely LOOKS like a tag still gets substituted (the
    # reference regex-scans the whole skeleton) -> missing-crop sentinel
    sk = page(["as seen on page 4 table_9: right here folks"])
    text, spans, _, _ = finalize_document([sk], {})
    assert "[Missing Crop]" in text
    assert "table 9" in text


def test_mask_meta_column(ray_session):
    """S8 mask-metadata column: (page, object, bbox) per masked block in
    detection order, mirroring the reference's non_text_pairs.json."""
    import pyarrow as pa

    from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import (
        extract_document,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.payloads import (
        encode_fake_pdf,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        LayoutStub, RecognizerStub,
    )

    pages = [
        {"w": 1000, "h": 1000, "blocks": [
            {"cls_id": 2, "score": 0.9, "bbox": [0, 0, 500, 100], "text": "t"},
            {"cls_id": 1, "score": 0.8, "bbox": [0, 200, 500, 400], "text": "f"},
            {"cls_id": 8, "score": 0.7, "bbox": [0, 500, 500, 700], "text": "tb"},
        ]},
        {"w": 1000, "h": 1000, "blocks": [
            {"cls_id": 8, "score": 0.9, "bbox": [0, 0, 400, 300], "text": "tb2"},
        ]},
    ]
    res = extract_document(
        encode_fake_pdf(pages), None, "en", PipelineConfig(),
        layout=LayoutStub(), recognizer=RecognizerStub(), kind="pdf",
    )
    objs = [(p, o) for (p, o, b) in res.mask_meta]
    assert objs == [(0, "figure"), (0, "table"), (1, "table")]
    for _, _, bbox in res.mask_meta:
        assert len(bbox) == 4 and bbox[2] > bbox[0] and bbox[3] > bbox[1]


def test_recognizer_failover_chain():
    """Engine failover (reference PageProcessor.py:92-104): primary fails ->
    backup answers; single flaky engine -> page-level sentinel embedded in
    the doc while other pages extract normally."""
    from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import (
        extract_document, ocr_failed_sentinel,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.payloads import (
        encode_fake_pdf,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        LayoutStub, build_recognizer,
    )

    pages = [
        {"w": 1000, "h": 1000, "blocks": [
            {"cls_id": 2, "score": 0.9, "bbox": [0, 0, 500, 100],
             "text": "good page"}]},
        {"w": 1000, "h": 1000, "blocks": [
            {"cls_id": 2, "score": 0.9, "bbox": [0, 0, 500, 100],
             "text": "FAIL_PRIMARY content"}]},
    ]
    payload = encode_fake_pdf(pages)
    lay = LayoutStub()

    # flaky -> stub chain: backup rescues the failing page
    chain = build_recognizer(("flaky", "stub"))
    ok = extract_document(payload, None, "en", PipelineConfig(),
                          layout=lay, recognizer=chain, kind="pdf")
    assert ok.error is None
    assert "FAIL_PRIMARY content" in ok.extracted_text
    assert "good page" in ok.extracted_text

    # flaky alone: the failing page becomes a sentinel, the good page stays
    flaky = build_recognizer(("flaky",))
    bad = extract_document(payload, None, "en", PipelineConfig(),
                           layout=lay, recognizer=flaky, kind="pdf")
    assert bad.error == "1 page(s) failed recognition"
    assert "good page" in bad.extracted_text
    assert "[OCR Failed]" in bad.extracted_text
    assert "FAIL_PRIMARY content" not in bad.extracted_text

    # sticky swap: after one failover the chain keeps using the backup
    chain2 = build_recognizer(("flaky", "stub"))
    extract_document(payload, None, "en", PipelineConfig(),
                     layout=lay, recognizer=chain2, kind="pdf")
    assert len(chain2.engines) == 1


def test_transient_retry_before_failover():
    """In-engine retry (reference OCR.py:103-115): a twice-transient primary
    recovers WITHOUT failover and output bytes equal the healthy engine's;
    retries exhausted -> sticky failover; non-transient skips retry."""
    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        CountdownFlakyRecognizer, RecognizerChain, RecognizerStub,
        RecognitionError, TransientRecognitionError,
    )

    page = {"w": 1000, "h": 1000, "blocks": [
        {"cls_id": 2, "score": 0.9, "bbox": [0, 0, 500, 100], "text": "hello"}]}
    bbox = [0, 0, 1000, 1000]

    # 2 transient failures < 3 attempts: same engine recovers, no failover
    primary = CountdownFlakyRecognizer(n_failures=2)
    chain = RecognizerChain([primary, RecognizerStub()], max_attempts=3)
    assert chain.recognize(page, bbox) == RecognizerStub().recognize(page, bbox)
    assert len(chain.engines) == 2 and chain.engines[0] is primary

    # 5 transient failures > 3 attempts: retries exhaust, sticky failover
    chain = RecognizerChain(
        [CountdownFlakyRecognizer(n_failures=5), RecognizerStub()],
        max_attempts=3,
    )
    assert chain.recognize(page, bbox) == RecognizerStub().recognize(page, bbox)
    assert len(chain.engines) == 1  # swapped

    # single engine, retries exhaust -> the error propagates (sentinel path)
    import pytest as _pytest

    chain = RecognizerChain([CountdownFlakyRecognizer(n_failures=5)],
                            max_attempts=3)
    with _pytest.raises(TransientRecognitionError):
        chain.recognize(page, bbox)

    # non-transient error fails over immediately (no retry burned)
    class HardFail:
        calls = 0

        def recognize(self, page, bbox, mode="markdown"):
            HardFail.calls += 1
            raise RecognitionError("hard")

    chain = RecognizerChain([HardFail(), RecognizerStub()], max_attempts=3)
    chain.recognize(page, bbox)
    assert HardFail.calls == 1  # not retried


def test_preresize_page_geometry():
    """M6 pre-resize (reference OCR.py:58-88): hand-computed scaled dims and
    bboxes for an over-cap page; under-cap pages pass through untouched."""
    import math

    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        preresize_page,
    )

    blocks = [{"cls_id": 2, "score": 0.9, "bbox": [100.0, 200.0, 900.0, 400.0],
               "text": "t"}]
    big = {"w": 8000, "h": 6000, "blocks": blocks}
    cap = 33_177_600
    out, s = preresize_page(big, cap)
    s_exp = math.sqrt(cap / (8000 * 6000)) * 0.99
    assert abs(s - s_exp) < 1e-12
    assert out["w"] == int(8000 * s_exp) and out["h"] == int(6000 * s_exp)
    assert out["w"] * out["h"] <= cap
    got = out["blocks"][0]["bbox"]
    exp = [c * s_exp for c in [100.0, 200.0, 900.0, 400.0]]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, exp))
    # original page object untouched (no aliasing)
    assert big["blocks"][0]["bbox"] == [100.0, 200.0, 900.0, 400.0]

    small = {"w": 1240, "h": 1754, "blocks": blocks}
    same, s1 = preresize_page(small, cap)
    assert s1 == 1.0 and same is small
    off, s2 = preresize_page(big, None)
    assert s2 == 1.0 and off is big


def test_preresize_byte_identity_under_cap():
    """Default max_pixels leaves the golden corpus untouched: extraction
    output is byte-identical with the cap on and off."""
    from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import (
        extract_document,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.payloads import (
        encode_fake_pdf,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import (
        _fake_doc_pages,
    )
    import random

    for rid in range(5):
        pages = _fake_doc_pages(rid, random.Random(rid), ["alpha", "beta", "gamma"])
        payload = encode_fake_pdf(pages)
        with_cap = extract_document(payload, None, "en",
                                    PipelineConfig(), kind="pdf")
        no_cap = extract_document(payload, None, "en",
                                  PipelineConfig(max_pixels=None), kind="pdf")
        assert with_cap.extracted_text == no_cap.extracted_text
        assert with_cap.spans == no_cap.spans

    # an over-cap page DOES change geometry but text content survives
    huge = [{"w": 80_000, "h": 60_000, "blocks": [
        {"cls_id": 2, "score": 0.9, "bbox": [0, 0, 50_000, 10_000],
         "text": "resized content"}]}]
    res = extract_document(encode_fake_pdf(huge), None, "en",
                           PipelineConfig(), kind="pdf")
    assert "resized content" in res.extracted_text


def test_optional_engine_absent_falls_back_to_stub():
    """Registry extension surface (VERDICT r2 missing #3): the import-guarded
    tesseract adapter is registered but its deps are absent in this
    container — build_recognizer must drop it (selection still honors the
    remaining names) and an all-absent selection falls back to the stub, so
    the golden path's byte identity never depends on optional libraries."""
    import pytest

    from ocr_pipeline_fastapi_latency_optimization_ray.stages.layout import (
        EngineUnavailable, RECOGNIZER_REGISTRY, RecognizerStub,
        TesseractRecognizer, build_recognizer,
    )

    assert "tesseract" in RECOGNIZER_REGISTRY
    with pytest.raises(EngineUnavailable):
        TesseractRecognizer()

    chain = build_recognizer(("tesseract", "stub"))
    assert len(chain.engines) == 1
    assert isinstance(chain.engines[0], RecognizerStub)

    only = build_recognizer(("tesseract",))
    assert len(only.engines) == 1
    assert isinstance(only.engines[0], RecognizerStub)


def test_registry_selection_prefers_available_engine(monkeypatch):
    """When an optional engine IS constructible it leads the chain and the
    stub stays the backup (primary/backup choice, PageProcessor.py:19-26)."""
    from ocr_pipeline_fastapi_latency_optimization_ray.stages import layout

    class FakeReal:
        def recognize(self, page, bbox, mode="markdown"):
            return layout.RecognizerStub().recognize(page, bbox, mode)

    monkeypatch.setitem(layout.RECOGNIZER_REGISTRY, "tesseract", FakeReal)
    chain = layout.build_recognizer(("tesseract", "stub"))
    assert isinstance(chain.engines[0], FakeReal)
    assert isinstance(chain.engines[1], layout.RecognizerStub)
