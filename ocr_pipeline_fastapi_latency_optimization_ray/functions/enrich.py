"""Document assembly + placeholder enrichment + fence strip, with char-span
tracking (M9-M12 analogs, SURVEY.md §2.2).

Semantics preserved exactly from the reference:
  - page join with ``"\\n\\n---\\n\\n"``                (PageProcessor.py:112)
  - tolerant placeholder regex                          (MarkdownEnricher.py:24-27)
  - leftmost-first substitution via the same scan as ``pattern.sub``
                                                        (MarkdownEnricher.py:62-67)
  - enrichment content wrapped ``"\\n{content}\\n"``    (MarkdownEnricher.py:95)
  - missing-key -> ``[Missing Crop]`` sentinel, singular/plural key fallback
                                                        (MarkdownEnricher.py:86-94)
  - global ``` strip                                    (PageProcessor.py:116)

On top of the reference semantics we emit char-span offsets per kept block
into the final text (north_star requirement). A placeholder match can never
straddle a block boundary: the regex has no DOTALL and ``[^\\d\\n]*`` /
``.*?`` cannot cross the ``\\n\\n`` separators, so span adjustment is exact.
"""

from __future__ import annotations

from ..config import FENCE, PAGE_SEPARATOR, BLOCK_SEPARATOR, PLACEHOLDER_PATTERN, missing_crop_sentinel
from .masking import PageSkeleton

Span = tuple[int, int, int]  # (block_id, start, end)


def assemble_skeleton(pages: list[PageSkeleton]) -> tuple[str, list[Span]]:
    """Join per-page parts into the document skeleton, tracking block spans."""
    pieces: list[str] = []
    spans: list[Span] = []
    pos = 0
    for pi, page in enumerate(pages):
        if pi > 0:
            pieces.append(PAGE_SEPARATOR)
            pos += len(PAGE_SEPARATOR)
        for bi, (part, bid) in enumerate(zip(page.parts, page.block_ids)):
            if bi > 0:
                pieces.append(BLOCK_SEPARATOR)
                pos += len(BLOCK_SEPARATOR)
            pieces.append(part)
            spans.append((bid, pos, pos + len(part)))
            pos += len(part)
    return "".join(pieces), spans


def _shift(spans: list[Span], edits: list[tuple[int, int, int]]) -> list[Span]:
    """Apply position deltas from non-overlapping left-to-right edits.

    ``edits`` = [(start, end, new_len)] in ascending order. An original
    offset p maps to p + sum(delta for edits with end <= p); block ends also
    absorb deltas of edits contained in (start, end]."""
    if not edits:
        return spans
    out = []
    for bid, s, e in spans:
        ds = de = 0
        for (ms, me, nl) in edits:
            delta = nl - (me - ms)
            if me <= s:
                ds += delta
            if me <= e:
                de += delta
            elif ms >= e:
                break
        out.append((bid, s + ds, e + de))
    return out


def enrich_document(
    skeleton: str,
    spans: list[Span],
    enrich_map: dict[tuple[int, str, int], str],
) -> tuple[str, list[Span]]:
    """Find placeholders, substitute enrichment content, adjust spans.

    ``enrich_map`` keys are (page_num, obj_type, obj_index) with obj_type in
    {"figure", "table"}; values are the raw crop-OCR content (wrapping
    ``"\\n…\\n"`` applied here, matching MarkdownEnricher.py:95).
    """
    matches = list(PLACEHOLDER_PATTERN.finditer(skeleton))
    if not matches:
        return skeleton, spans
    pieces: list[str] = []
    edits: list[tuple[int, int, int]] = []
    last = 0
    for m in matches:
        page_s, typ, idx_s = m.group(1), m.group(2).lower(), m.group(3)
        rep = None
        if idx_s is not None:
            key = (int(page_s), typ, int(idx_s))
            if key in enrich_map:
                rep = f"\n{enrich_map[key]}\n"
            else:
                # singular/plural fallback (MarkdownEnricher.py:86-91)
                key2 = (int(page_s), typ.rstrip("s"), int(idx_s))
                if key2 in enrich_map:
                    rep = f"\n{enrich_map[key2]}\n"
        if rep is None:
            rep = missing_crop_sentinel(typ, idx_s)
        pieces.append(skeleton[last : m.start()])
        pieces.append(rep)
        edits.append((m.start(), m.end(), len(rep)))
        last = m.end()
    pieces.append(skeleton[last:])
    return "".join(pieces), _shift(spans, edits)


def strip_fences(text: str, spans: list[Span]) -> tuple[str, list[Span]]:
    """Remove every ``` occurrence (PageProcessor.py:116), left-to-right
    non-overlapping — identical to ``str.replace``."""
    edits = []
    start = 0
    while True:
        i = text.find(FENCE, start)
        if i < 0:
            break
        edits.append((i, i + len(FENCE), 0))
        start = i + len(FENCE)
    if not edits:
        return text, spans
    return text.replace(FENCE, ""), _shift(spans, edits)


def finalize_document(
    pages: list[PageSkeleton],
    enrich_map: dict[tuple[int, str, int], str],
) -> tuple[str, list[Span], int, int]:
    """skeleton -> enrich -> fence strip; returns (text, spans, kept, dropped)."""
    skeleton, spans = assemble_skeleton(pages)
    text, spans = enrich_document(skeleton, spans, enrich_map)
    text, spans = strip_fences(text, spans)
    n_kept = sum(p.n_kept for p in pages)
    n_dropped = sum(p.n_dropped for p in pages)
    # clamp spans defensively (substitution inside a block keeps them exact;
    # clamping guards only against pathological out-of-range)
    n = len(text)
    spans = [(b, min(s, n), min(e, n)) for b, s, e in spans]
    return text, spans, n_kept, n_dropped
