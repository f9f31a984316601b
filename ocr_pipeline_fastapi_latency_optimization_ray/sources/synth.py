"""Deterministic synthetic Common-Crawl-style ``pages`` table generator.

Schema exactly per BASELINE.json ``input_hint``:
    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

Two producers share one per-row builder (seeded purely by the integer row id
— no cross-row RNG state, so generation is order-independent, reproducible
and embarrassingly parallel):

  - ``synth_pages_table(n, seed)``: standalone table for unit tests/fixtures
    (FIXTURES.md §1 payload mix);
  - ``pages_from_documents(batch)``: maps rows of the driver's ``documents``
    parquet (doc_id, text, lang, ...) into pages rows — used by the
    correctness queries and the benchmark so page content derives from the
    provided testdata rather than ad-hoc data.

Payload mix (FIXTURES.md §1): ~90% HTML (boilerplate nav/footer/aside,
tables, figures, math, malformed markup, adversarial placeholder-lookalike
text, code fences), ~8% fake-PDF payloads, ~2% fake-image payloads, plus
text-only rows, empty rows, corrupt payloads (sentinel path) and a skew tail
of 100x-1000x median payloads (exercises the size-based skew splitter).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from ..config import RAW_CLASSES
from .payloads import encode_fake_image, encode_fake_pdf

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_VOCAB = (
    "stream batch arrow block shuffle actor parquet vector schema merge "
    "extract layout page table figure formula caption anchor window spill "
    "lineage checkpoint partition skew broadcast index token corpus crawl"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh", "ar"]

# raw label ids for the fake layout model (index into the reference's
# 20-label space, DLA.py:62-80)
_RAW_ID = {name: i for i, name in enumerate(RAW_CLASSES)}


def _words(rng: random.Random, n: int, vocab) -> str:
    return " ".join(rng.choice(vocab) for _ in range(n))


def _html_doc(rid: int, rng: random.Random, vocab: list[str], skew: bool) -> bytes:
    title = _words(rng, 4, vocab).title()
    para_n = 3 + rng.randrange(5)
    if skew:
        para_n *= 120  # 100x+ median payload: skew-splitter fodder
    paras = [
        f"<p>{_words(rng, 20 + rng.randrange(40), vocab)}.</p>"
        for _ in range(para_n)
    ]
    nav_links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(vocab, 6)
    )
    parts = [
        "<html><head><title>", title, "</title>",
        "<script>var x = 1;</script><style>p{color:red}</style></head><body>",
        f"<nav>{nav_links}</nav>",
        f'<div class="sidebar">{_words(rng, 8, vocab)}</div>',
        f"<article><h1>{title}</h1>",
    ]
    parts.extend(paras[: max(1, para_n // 2)])
    if rid % 5 == 1:
        rows = "".join(
            "<tr>" + "".join(f"<td>{_words(rng, 2, vocab)}</td>" for _ in range(3)) + "</tr>"
            for _ in range(1 + rng.randrange(4))
        )
        header = "<tr>" + "".join(f"<th>{w}</th>" for w in rng.sample(vocab, 3)) + "</tr>"
        parts.append(f"<table>{header}{rows}</table>")
    if rid % 5 == 2:
        parts.append(
            f'<figure><img src="/img/{rid}.png" alt="{_words(rng, 3, vocab)}">'
            f"<figcaption>{_words(rng, 6, vocab)}</figcaption></figure>"
        )
    if rid % 7 == 3:
        parts.append(f'<img src="/hero/{rid}.jpg" alt="{_words(rng, 2, vocab)}">')
    if rid % 11 == 4:
        parts.append(f"<math>E = m c^2 + {rid}</math>")
    if rid % 13 == 6:
        parts.append(f"<pre>```\ncode {_words(rng, 5, vocab)}\n```</pre>")
    if rid % 101 == 17:
        # adversarial: body text that LOOKS like a placeholder tag — the
        # tolerant regex (MarkdownEnricher.py:24-27) matches it, so the
        # missing-crop sentinel path must fire deterministically
        parts.append(f"<p>as seen on page {rid % 7} table_9: right here</p>")
    parts.append(f"<ul>{''.join(f'<li>{_words(rng, 5, vocab)}</li>' for _ in range(3))}</ul>")
    parts.append(f"<blockquote>{_words(rng, 10, vocab)}</blockquote>")
    parts.extend(paras[max(1, para_n // 2):])
    parts.append("</article>")
    parts.append(f"<aside>{_words(rng, 10, vocab)}</aside>")
    parts.append(f"<footer>(c) {_words(rng, 5, vocab)}</footer>")
    if rid % 17 != 9:  # rid%17==9 -> malformed: unclosed body/html
        parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _fake_doc_pages(rid: int, rng: random.Random, vocab: list[str]) -> list[dict]:
    n_pages = 1 + rid % 3
    pages = []
    for p in range(n_pages):
        w, h = 1240, 1754
        blocks = []
        y = 40.0
        n_blocks = 4 + rng.randrange(6)
        for b in range(n_blocks):
            label = rng.choice(
                ["text", "text", "text", "paragraph_title", "table", "image",
                 "chart", "formula", "footer", "aside_text", "figure_title"]
            )
            bh = 60.0 + rng.randrange(120)
            bbox = [60.0, y, 60.0 + 900 + rng.randrange(200), y + bh]
            score = round(0.30 + rng.random() * 0.69, 4)  # some below conf=0.38
            blocks.append(
                {
                    "cls_id": _RAW_ID[label],
                    "score": score,
                    "bbox": bbox,
                    "text": _words(rng, 6 + rng.randrange(12), vocab),
                }
            )
            y += bh + 20
            # occasionally emit an overlapping duplicate detection so the D1
            # merge fixpoint has real work (same-class overlap cleanup)
            if rng.random() < 0.25:
                dup = dict(blocks[-1])
                dup["bbox"] = [bbox[0] + 15, bbox[1] + 10, bbox[2] - 10, bbox[3] + 30]
                dup["score"] = round(max(0.31, score - 0.05), 4)
                dup["text"] = _words(rng, 4, vocab)
                blocks.append(dup)
        pages.append({"w": w, "h": h, "blocks": blocks})
    return pages


def build_page_row(rid: int, base_text: str | None, lang: str | None, seed: int = 42):
    """One deterministic pages row. Returns (url, warc_ts_us, html, text, lang)."""
    rng = random.Random(rid * 2654435761 + seed)
    vocab = (base_text.split() if base_text else []) or _VOCAB
    vocab = vocab[:64] if len(vocab) >= 8 else list(_VOCAB)
    lang = lang or _LANGS[rid % len(_LANGS)]
    url = f"https://site{rid % 97}.example/{lang}/doc/{rid}"
    ts = _EPOCH_2024_US + (rid * 1_000_003) % (365 * 86_400) * 1_000_000

    m = rid % 50
    if m == 43:
        return url, ts, b"", None, lang          # empty row
    if m == 44:
        return url, ts, None, (base_text or _words(rng, 60, vocab)), lang  # text path
    if rid % 997 == 13:
        # corrupt PDF payload -> sentinel path
        return url, ts, b"%PDF-1.4\nRAYXDOC {not json" + bytes([rid % 256]), None, lang
    if m >= 49:
        return url, ts, encode_fake_image(_fake_doc_pages(rid, rng, vocab)[0]), None, lang
    if m >= 45:
        return url, ts, encode_fake_pdf(_fake_doc_pages(rid, rng, vocab)), None, lang
    skew = rid % 211 == 5
    return url, ts, _html_doc(rid, rng, vocab, skew), base_text, lang


def _rows_to_table(rows) -> pa.Table:
    if not rows:  # filtered-out batch: keep the schema, zero rows
        return PAGES_SCHEMA.empty_table()
    urls, tss, htmls, texts, langs = zip(*rows)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(np.array(tss, dtype="int64"), pa.int64()).cast(pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def synth_pages_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [build_page_row(i, None, None, seed) for i in range(start, start + n)]
    return _rows_to_table(rows)


def pages_from_documents(batch: pa.Table, repeat: int = 1, seed: int = 42) -> pa.Table:
    """Map a ``documents`` batch (doc_id, text, lang, ...) to pages rows.

    ``repeat`` > 1 fans each document out to several page rows (distinct ids)
    to scale the benchmark workload deterministically.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    rows = []
    for did, txt, lg in zip(doc_ids, texts, langs):
        for r in range(repeat):
            rows.append(build_page_row(did * repeat + r, txt, lg, seed))
    return _rows_to_table(rows)
