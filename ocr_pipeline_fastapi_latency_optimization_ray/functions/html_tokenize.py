"""Deterministic DOM tokenizer for the HTML branch.

The webtext analog of the reference's layout-detection stage (SURVEY.md §7.1):
where the reference runs a PaddleOCR layout model per page image
(DLA.py:146-148) and maps 20 raw labels to 5 canonical classes
(DLA.py:59-80), this tokenizer parses HTML with the stdlib ``html.parser``
into an ordered block table with readability/trafilatura-style
text-density / link-density scoring, labeled with the SAME canonical class
set {text, figure, table, formula, abandon}:

  - nav / footer / aside / header subtrees and class/id boilerplate hints
    -> ``abandon`` (analog of the reference's abandon labels, DLA.py:74,78);
  - link-dense text blocks -> ``abandon`` (boilerplate);
  - ``<table>`` -> ``table`` block (content = deterministic markdown render);
  - ``<figure>`` / ``<img>`` -> ``figure`` block;
  - ``<math>`` / formula-classed elements -> ``formula``;
  - everything else -> ``text``.

Every block receives a synthetic bbox on a virtual page so the geometry
kernels (geometry.py) and the D1 merge fixpoint (merge.py) operate on real
coordinates on this branch too, and a deterministic pseudo-confidence
(hashing.pseudo_confidence) standing in for the model score that drives
counter ordering (reference DLA.py:515).

Pure Python per document, but invoked batched over Arrow columns inside
``map_batches`` — the parallelism axis is documents.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

import numpy as np

from ..config import (
    BOILERPLATE_HINTS,
    BOILERPLATE_TAGS,
    HTML_BLOCK_GAP,
    HTML_LINE_CHARS,
    HTML_LINE_HEIGHT,
    HTML_PAGE_WIDTH,
    LINK_DENSITY_ABANDON,
    SKIP_TAGS,
    TEXT_BLOCK_TAGS,
)
from .hashing import pseudo_confidence
from .merge import Blocks

_NON_ALNUM_RE = re.compile(r"[^0-9A-Za-zÀ-￿]+")  # one C pass vs per-char isalnum

# Structural tags that force a text-block boundary without emitting content.
STRUCT_TAGS = frozenset(
    {"div", "section", "article", "main", "body", "html", "ul", "ol", "dl",
     "form", "tr", "hr", "br"}
)

_HEADING_PREFIX = {f"h{i}": "#" * i + " " for i in range(1, 7)}


def _norm(s: str) -> str:
    # whitespace-collapse: split()/join is ~5x faster than the regex and
    # equivalent (both treat all unicode whitespace as separators)
    return " ".join(s.split())


@dataclass
class RawBlock:
    label: str
    content: str
    text_density: float
    link_density: float
    tag_path: str = ""


@dataclass
class _TableCapture:
    rows: list = field(default_factory=list)
    cur_row: list = field(default_factory=list)
    cur_cell: list = field(default_factory=list)
    in_cell: bool = False


@dataclass
class _FigureCapture:
    img_alt: str = ""
    img_src: str = ""
    caption_parts: list = field(default_factory=list)


class _Tokenizer(HTMLParser):
    def __init__(self, link_density_abandon: float, boilerplate_hints: tuple):
        super().__init__(convert_charrefs=True)
        self.link_density_abandon = link_density_abandon
        self.boilerplate_hints = boilerplate_hints
        self.blocks: list[RawBlock] = []
        self.stack: list[str] = []
        self.skip_depth = 0
        self.boiler_depth = 0
        self.a_depth = 0
        self.math_depth = 0
        self.table: _TableCapture | None = None
        self.table_depth = 0
        self.figure: _FigureCapture | None = None
        self.figcaption_depth = 0
        self.pending_prefix = ""
        self.buf: list[str] = []
        self.buf_chars = 0
        self.buf_link_chars = 0

    # -- helpers ----------------------------------------------------------

    def _is_boiler_attrs(self, attrs) -> bool:
        for k, v in attrs:
            if k in ("class", "id", "role") and v:
                lv = v.lower()
                if any(h in lv for h in self.boilerplate_hints):
                    return True
        return False

    def _flush(self):
        if not self.buf:
            self.pending_prefix = ""
            return
        raw = "".join(self.buf)
        content = _norm(raw)
        self.buf = []
        chars = self.buf_chars
        link_chars = self.buf_link_chars
        self.buf_chars = 0
        self.buf_link_chars = 0
        prefix = self.pending_prefix
        self.pending_prefix = ""
        if not content:
            return
        link_density = link_chars / max(1, chars)
        # alnum mass in one C-level regex pass (letters incl. U+00C0+, digits)
        alnum = len(_NON_ALNUM_RE.sub("", content))
        text_density = alnum / max(1, len(content))
        if self.boiler_depth > 0:
            label = "abandon"
        elif link_density > self.link_density_abandon:
            label = "abandon"
        else:
            label = "text"
        self.blocks.append(
            RawBlock(
                label=label,
                content=prefix + content,
                text_density=round(text_density, 6),
                link_density=round(link_density, 6),
                tag_path="/".join(self.stack[-3:]),
            )
        )

    def _emit(self, label: str, content: str, td: float = 1.0, ld: float = 0.0):
        content = content.strip()
        if not content:
            return
        self.blocks.append(
            RawBlock(label=label, content=content, text_density=round(td, 6),
                     link_density=round(ld, 6), tag_path="/".join(self.stack[-3:]))
        )

    def _render_table(self, cap: _TableCapture) -> str:
        rows = [r for r in cap.rows if r]
        if not rows:
            return ""
        width = max(len(r) for r in rows)
        norm_rows = []
        for r in rows:
            cells = [_norm(c).replace("|", "/") for c in r]
            cells += [""] * (width - len(cells))
            norm_rows.append(cells)
        lines = ["| " + " | ".join(norm_rows[0]) + " |"]
        lines.append("| " + " | ".join(["---"] * width) + " |")
        for r in norm_rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)

    # -- HTMLParser hooks --------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return

        if self.table is not None and tag != "table":
            # inside table capture: track rows/cells, ignore other structure
            if tag == "tr":
                if self.table.cur_row or self.table.in_cell:
                    self._table_end_cell()
                    self.table.rows.append(self.table.cur_row)
                    self.table.cur_row = []
                return
            if tag in ("td", "th"):
                self._table_end_cell()
                self.table.in_cell = True
                return
            return

        if tag == "math" or self._has_formula_class(attrs):
            self._flush()
            self.math_depth += 1
            self.stack.append(tag)
            return

        if self.math_depth:
            self.stack.append(tag)
            return

        boiler = tag in BOILERPLATE_TAGS or self._is_boiler_attrs(attrs)
        if boiler:
            self._flush()
            self.boiler_depth += 1
            self.stack.append(tag + "!b")
            return

        if tag == "table":
            self._flush()
            self.table_depth += 1
            if self.table is None:
                self.table = _TableCapture()
            self.stack.append(tag)
            return

        if tag == "figure":
            self._flush()
            if self.figure is None:
                self.figure = _FigureCapture()
            self.stack.append(tag)
            return

        if tag == "figcaption":
            self.figcaption_depth += 1
            self.stack.append(tag)
            return

        if tag == "img":
            alt = src = ""
            for k, v in attrs:
                if k == "alt":
                    alt = v or ""
                elif k == "src":
                    src = v or ""
            if self.figure is not None:
                self.figure.img_alt, self.figure.img_src = alt, src
            else:
                self._flush()
                lbl = "abandon" if self.boiler_depth else "figure"
                self._emit(lbl, f"![{_norm(alt)}]({src.strip()})")
            return

        if tag == "a":
            self.a_depth += 1
            self.stack.append(tag)
            return

        if tag in TEXT_BLOCK_TAGS:
            self._flush()
            if tag in _HEADING_PREFIX:
                self.pending_prefix = _HEADING_PREFIX[tag]
            elif tag == "li":
                self.pending_prefix = "- "
            elif tag == "blockquote":
                self.pending_prefix = "> "
            self.stack.append(tag)
            return

        if tag in STRUCT_TAGS:
            self._flush()
            if tag not in ("hr", "br"):
                self.stack.append(tag)
            return

        self.stack.append(tag)

    def _has_formula_class(self, attrs) -> bool:
        for k, v in attrs:
            if k == "class" and v and "formula" in v.lower():
                return True
        return False

    def _table_end_cell(self):
        if self.table is not None and self.table.in_cell:
            self.table.cur_row.append("".join(self.table.cur_cell))
            self.table.cur_cell = []
            self.table.in_cell = False

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return

        if self.table is not None and tag != "table":
            if tag in ("td", "th"):
                self._table_end_cell()
            elif tag == "tr":
                self._table_end_cell()
                self.table.rows.append(self.table.cur_row)
                self.table.cur_row = []
            return

        if self.math_depth and tag == "math":
            self.math_depth -= 1
            if self.math_depth == 0:
                content = _norm("".join(self.buf))
                self.buf = []
                self.buf_chars = 0
                self.buf_link_chars = 0
                lbl = "abandon" if self.boiler_depth else "formula"
                self._emit(lbl, content)
            self._pop(tag)
            return

        if tag == "table" and self.table_depth:
            self.table_depth -= 1
            if self.table_depth == 0 and self.table is not None:
                self._table_end_cell()
                if self.table.cur_row:
                    self.table.rows.append(self.table.cur_row)
                    self.table.cur_row = []
                rendered = self._render_table(self.table)
                self.table = None
                lbl = "abandon" if self.boiler_depth else "table"
                self._emit(lbl, rendered)
            self._pop(tag)
            return

        if tag == "figure" and self.figure is not None:
            fig = self.figure
            self.figure = None
            caption = _norm("".join(fig.caption_parts))
            content = f"![{_norm(fig.img_alt)}]({fig.img_src.strip()})"
            if caption:
                content += f"\n*{caption}*"
            lbl = "abandon" if self.boiler_depth else "figure"
            self._emit(lbl, content)
            self._pop(tag)
            return

        if tag == "figcaption":
            self.figcaption_depth = max(0, self.figcaption_depth - 1)
            self._pop(tag)
            return

        if tag == "a":
            self.a_depth = max(0, self.a_depth - 1)
            self._pop(tag)
            return

        if tag in BOILERPLATE_TAGS or (self.stack and self.stack[-1] == tag + "!b"):
            self._flush()
            if self.stack and self.stack[-1] == tag + "!b":
                self.boiler_depth = max(0, self.boiler_depth - 1)
                self.stack.pop()
            else:
                self._pop(tag)
            return

        if tag in TEXT_BLOCK_TAGS or tag in STRUCT_TAGS:
            self._flush()
            self._pop(tag)
            return

        self._pop(tag)

    def _pop(self, tag):
        # pop the nearest matching open tag (tolerant of malformed nesting)
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag or self.stack[i] == tag + "!b":
                if self.stack[i].endswith("!b"):
                    self.boiler_depth = max(0, self.boiler_depth - 1)
                del self.stack[i]
                return

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.table is not None:
            if self.table.in_cell:
                self.table.cur_cell.append(data)
            return
        if self.figure is not None:
            if self.figcaption_depth:
                self.figure.caption_parts.append(data)
            return
        self.buf.append(data)
        n = len(data.strip())
        self.buf_chars += n
        if self.a_depth:
            self.buf_link_chars += n

    def close(self):
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Fast scanner: one compiled regex drives the SAME _Tokenizer state machine.
#
# stdlib HTMLParser costs ~19 us per tag event (generality we don't need:
# per-event charref scanning, tolerant attr regexes, CDATA modes). This
# scanner tokenizes with a single C-level regex pass and dispatches to the
# identical handle_* hooks, so block output is bit-equal by construction on
# everything it can parse; any input it cannot fully consume (stray '<' in
# text, exotic markup) falls back to the HTMLParser path. The oracle
# (oracle/extract_oracle.py) always uses the HTMLParser path, so the
# byte-identity suite cross-validates the two implementations on every run.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</(?P<end>[a-zA-Z][a-zA-Z0-9-]*)\s*>"
    r"|<(?P<start>[a-zA-Z][a-zA-Z0-9-]*)(?P<attrs>(?:[^>\"']|\"[^\"]*\"|'[^']*')*)>"
    r"|(?P<data>[^<]+)",
    re.S,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>/]+)"
)
_RAWTEXT_TAGS = ("script", "style")


def _parse_attrs(a: str) -> list[tuple[str, str]]:
    from html import unescape

    out = []
    for k, v in _ATTR_RE.findall(a):
        if v[:1] in "\"'":
            v = v[1:-1]
        if "&" in v:
            v = unescape(v)
        out.append((k.lower(), v))
    return out


def _fast_feed(tok: _Tokenizer, s: str) -> bool:
    """Drive the tokenizer with the regex scanner; False = input not fully
    consumable (caller re-runs the HTMLParser path)."""
    from html import unescape

    pos, n = 0, len(s)
    while pos < n:
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            return False
        pos = m.end()
        kind = m.lastgroup  # one attribute access instead of 3 group() probes
        if kind == "data":
            data = m.group("data")
            tok.handle_data(unescape(data) if "&" in data else data)
            continue
        if kind == "attrs" or kind == "start":
            t = m.group("start").lower()
            a = m.group("attrs") or ""
            tok.handle_starttag(t, _parse_attrs(a) if "=" in a else [])
            if a.rstrip().endswith("/"):
                tok.handle_endtag(t)
            elif t in _RAWTEXT_TAGS:
                # raw-text element: content is data until the matching close
                # (HTMLParser CDATA mode analog)
                end = s.find(f"</{t}", pos)
                if end < 0:
                    tok.handle_data(s[pos:])
                    pos = n
                else:
                    if end > pos:
                        tok.handle_data(s[pos:end])
                    close = s.find(">", end)
                    pos = n if close < 0 else close + 1
                    tok.handle_endtag(t)
            continue
        if kind == "end":
            tok.handle_endtag(m.group("end").lower())
        # comments / doctype / CDATA / processing instructions: ignored,
        # exactly as the unoverridden HTMLParser hooks ignore them
    return True


def tokenize_html(
    payload: bytes | str,
    link_density_abandon: float = LINK_DENSITY_ABANDON,
    boilerplate_hints: tuple = BOILERPLATE_HINTS,
    engine: str = "fast",
) -> list[RawBlock]:
    """Parse one HTML document into an ordered list of labeled blocks.

    ``engine="fast"`` (default) uses the regex scanner with HTMLParser
    fallback; ``engine="reference"`` forces the stdlib HTMLParser path (the
    oracle uses this so tests cross-validate both implementations).
    """
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", "replace")
    if engine == "fast":
        tok = _Tokenizer(link_density_abandon, boilerplate_hints)
        try:
            if _fast_feed(tok, payload):
                tok._flush()
                return tok.blocks
        except Exception:
            pass  # fall through to the tolerant reference path
    tok = _Tokenizer(link_density_abandon, boilerplate_hints)
    try:
        tok.feed(payload)
        tok.close()
    except Exception:
        # tolerate pathological markup: keep whatever was emitted; the
        # remainder of the buffer is flushed (sentinel-free degradation,
        # analog of the reference's unreadable-page skip, DLA.py:124-126)
        tok._flush()
    return tok.blocks


def blocks_table_from_html(
    payload: bytes | str,
    link_density_abandon: float = LINK_DENSITY_ABANDON,
    boilerplate_hints: tuple = BOILERPLATE_HINTS,
    engine: str = "fast",
) -> tuple[Blocks, list[RawBlock]]:
    """Tokenize + assign synthetic geometry and pseudo-confidence.

    Returns a columnar ``Blocks`` table in document order (block_id =
    document order) with bboxes on a virtual page: full-width rows stacked
    top to bottom, height proportional to content length. Non-overlapping by
    construction, so the D1 fixpoint is an intentional no-op on well-formed
    HTML — it exists to absorb duplicate/nested emissions from malformed
    markup, mirroring the reference where D1 dedups overlapping detections.
    """
    raw = tokenize_html(payload, link_density_abandon, boilerplate_hints, engine)
    n = len(raw)
    xyxy = np.zeros((n, 4), dtype=float)
    conf = np.zeros(n, dtype=float)
    names = np.empty(n, dtype=object)
    texts = np.empty(n, dtype=object)
    y = 0.0
    for i, b in enumerate(raw):
        h = HTML_LINE_HEIGHT * (1 + len(b.content) // HTML_LINE_CHARS)
        xyxy[i] = (0.0, y, float(HTML_PAGE_WIDTH), y + h)
        y += h + HTML_BLOCK_GAP
        conf[i] = pseudo_confidence(b.content)
        names[i] = b.label
        texts[i] = b.content
    return (
        Blocks(xyxy=xyxy, confidence=conf, class_name=names, text=texts),
        raw,
    )
