"""content-keyed RTL text normalization — the S4 semantic.

The reference's text->PDF renderer reshapes Arabic letters into their
contextual presentation forms and reorders each line into visual (display)
order before drawing it (FileIngestor.py:208-221: ``arabic_reshaper.reshape``
then ``bidi.algorithm.get_display``). SURVEY.md §2.1 maps that semantic to a
vectorized normalization step in the extract stage keyed on RTL content. Those two libraries are not available here, so this module
implements the same two public algorithms from first principles:

- **Contextual shaping** (``reshape_arabic``): Unicode Arabic Presentation
  Forms (U+FB50-U+FBFF, U+FE70-U+FEFC) selected by the standard joining
  rules. The form tables are derived at import time from the stdlib's
  ``unicodedata`` character names (ARABIC LETTER <X> <FORM> FORM), so no
  hand-typed code-point table can drift from the Unicode data. Joining
  classes fall out of the same tables: a letter with an INITIAL form is
  dual-joining, FINAL-only is right-joining; combining marks are
  transparent; tatweel is join-causing. The four LAM+ALEF ligatures are
  folded (the default ligature set of the reference's reshaper); harakat
  are preserved as-is.

- **Display reordering** (``bidi_display``): the UAX #9 bidirectional
  algorithm restricted to plain text — rules P2-P3 (paragraph level from
  the first strong character), W1-W7 (weak types), N1-N2 (neutrals),
  I1-I2 (implicit levels), L1 (trailing whitespace), L2 (level-run
  reversal) and L4 (bracket mirroring). Explicit embedding/override/isolate
  controls (X rules) are out of scope for extracted web text and treated
  as neutral.

Batch shape: ``rtl_normalize_texts`` is the stage-facing entry — it takes a
whole column and touches ONLY rows that actually contain RTL code points
(``contains_rtl``; the reference applies its Arabic branch to every line
whenever the libraries import, regardless of the document's language —
FileIngestor.py:209 — so the faithful gate is content, not the ``lang``
column). Per-char shaping is inherently sequential, so the vectorized win
is the mask: on a web corpus the RTL subset is a few percent of rows and
every other row is rejected by one C-speed ``max`` and passes through
untouched, zero-copy.
"""

from __future__ import annotations

import unicodedata

RTL_LANGS = frozenset({"ar", "fa", "ur", "he"})
# languages written in Arabic script get contextual shaping; Hebrew only
# needs display reordering
ARABIC_SCRIPT_LANGS = frozenset({"ar", "fa", "ur"})

_TATWEEL = "ـ"
_LAM = "ل"
_FORM_ORDER = ("ISOLATED", "FINAL", "INITIAL", "MEDIAL")


def _build_tables():
    forms: dict[str, dict[str, str]] = {}
    lam_lig: dict[str, dict[str, str]] = {}  # alef char -> form -> ligature
    for cp in list(range(0xFB50, 0xFC00)) + list(range(0xFE70, 0xFEFD)):
        ch = chr(cp)
        try:
            name = unicodedata.name(ch)
        except ValueError:
            continue
        parts = name.rsplit(" ", 2)
        if len(parts) != 3 or parts[2] != "FORM" or parts[1] not in _FORM_ORDER:
            continue
        base_name, form = parts[0], parts[1]
        if base_name.startswith("ARABIC LETTER "):
            try:
                base = unicodedata.lookup(base_name)
            except KeyError:
                continue
            forms.setdefault(base, {})[form] = ch
        elif base_name.startswith("ARABIC LIGATURE LAM WITH "):
            try:
                alef = unicodedata.lookup(
                    "ARABIC LETTER " + base_name[len("ARABIC LIGATURE LAM WITH "):]
                )
            except KeyError:
                continue
            lam_lig.setdefault(alef, {})[form] = ch
    # only the four alef variants form default ligatures (reference default)
    lam_lig = {a: f for a, f in lam_lig.items()
               if a in "آأإا"}
    return forms, lam_lig


_FORMS, _LAM_LIG = _build_tables()


def _join_class(c: str) -> str:
    """D = dual-joining, R = right-joining, C = join-causing (tatweel),
    T = transparent (combining marks), U = non-joining."""
    if c == _TATWEEL:
        return "C"
    f = _FORMS.get(c)
    if f is not None:
        if "INITIAL" in f or "MEDIAL" in f:
            return "D"
        if "FINAL" in f:
            return "R"
        return "U"
    if unicodedata.combining(c):
        return "T"
    return "U"


def reshape_arabic(s: str) -> str:
    """Contextual presentation forms + LAM-ALEF ligatures, logical order
    preserved (reordering is bidi's job). Non-Arabic text is returned
    byte-identical."""
    n = len(s)
    out: list[str] = []
    # classes once; transparent chars are skipped for joining context
    cls = [_join_class(c) for c in s]

    def prev_links(i: int) -> bool:
        j = i - 1
        while j >= 0 and cls[j] == "T":
            j -= 1
        return j >= 0 and cls[j] in ("D", "C")

    def next_strong(i: int) -> int:
        j = i + 1
        while j < n and cls[j] == "T":
            j += 1
        return j

    def next_links(i: int) -> bool:
        j = next_strong(i)
        return j < n and cls[j] in ("D", "R", "C")

    i = 0
    while i < n:
        c = s[i]
        k = cls[i]
        if k in ("U", "T"):
            out.append(c)
            i += 1
            continue
        # LAM + ALEF-variant (immediately adjacent) folds to a ligature
        if c == _LAM and i + 1 < n and s[i + 1] in _LAM_LIG:
            lig = _LAM_LIG[s[i + 1]]
            form = "FINAL" if prev_links(i) else "ISOLATED"
            out.append(lig.get(form, lig.get("ISOLATED", c)))
            i += 2
            continue
        if k == "C":  # tatweel renders as itself in every position
            out.append(c)
            i += 1
            continue
        pl, nl = prev_links(i), next_links(i)
        if k == "R":
            form = "FINAL" if pl else "ISOLATED"
        else:  # dual-joining
            form = ("MEDIAL" if nl else "FINAL") if pl else (
                "INITIAL" if nl else "ISOLATED")
        f = _FORMS.get(c, {})
        out.append(f.get(form) or f.get("ISOLATED") or c)
        i += 1
    return "".join(out)


_MIRROR = {}
for _a, _b in ("()", "[]", "{}", "<>", "«»", "‹›"):
    _MIRROR[_a] = _b
    _MIRROR[_b] = _a

# Arabic presentation forms carry bidirectional class AL already via
# unicodedata.bidirectional; no extra range table needed.
_STRONG = {"L", "R", "AL"}


def bidi_display(s: str) -> str:
    """UAX #9 display reordering for plain text (see module docstring for
    the rule subset). Pure-LTR input is returned byte-identical."""
    if not s:
        return s
    types = [unicodedata.bidirectional(c) or "ON" for c in s]
    n = len(s)

    # P2/P3: paragraph level from the first strong type
    base = 0
    for t in types:
        if t in ("R", "AL"):
            base = 1
            break
        if t == "L":
            break
    sos = "R" if base else "L"

    # W1: NSM takes the type of the previous character
    prev = sos
    for i, t in enumerate(types):
        if t == "NSM":
            types[i] = prev if prev not in ("PDF",) else "ON"
        prev = types[i]
    # W2: EN -> AN when the last strong type is AL
    strong = sos
    for i, t in enumerate(types):
        if t in _STRONG:
            strong = t
        elif t == "EN" and strong == "AL":
            types[i] = "AN"
    # W3: AL -> R
    types = ["R" if t == "AL" else t for t in types]
    # W4: single separator between same-typed numbers joins them
    for i in range(1, n - 1):
        if types[i] == "ES" and types[i - 1] == "EN" and types[i + 1] == "EN":
            types[i] = "EN"
        elif types[i] == "CS" and types[i - 1] == types[i + 1] \
                and types[i - 1] in ("EN", "AN"):
            types[i] = types[i - 1]
    # W5: ET runs adjacent to EN become EN
    i = 0
    while i < n:
        if types[i] == "ET":
            j = i
            while j < n and types[j] == "ET":
                j += 1
            before = types[i - 1] if i > 0 else sos
            after = types[j] if j < n else sos
            if before == "EN" or after == "EN":
                for k in range(i, j):
                    types[k] = "EN"
            i = j
        else:
            i += 1
    # W6: remaining separators/terminators are neutral
    types = ["ON" if t in ("ES", "ET", "CS") else t for t in types]
    # W7: EN -> L when the last strong type is L
    strong = sos
    for i, t in enumerate(types):
        if t in ("L", "R"):
            strong = t
        elif t == "EN" and strong == "L":
            types[i] = "L"

    # N1/N2: resolve neutral runs (WS/ON/S/B and anything unhandled)
    def is_neutral(t: str) -> bool:
        return t not in ("L", "R", "EN", "AN")

    def as_strong(t: str) -> str:
        return "R" if t in ("R", "EN", "AN") else "L"

    i = 0
    while i < n:
        if is_neutral(types[i]):
            j = i
            while j < n and is_neutral(types[j]):
                j += 1
            before = as_strong(types[i - 1]) if i > 0 else sos
            after = as_strong(types[j]) if j < n else sos
            fill = before if before == after else ("R" if base else "L")
            for k in range(i, j):
                types[k] = fill
            i = j
        else:
            i += 1

    # I1/I2: implicit levels
    levels = []
    for t in types:
        if base == 0:
            levels.append(0 if t == "L" else (1 if t == "R" else 2))
        else:
            levels.append(1 if t == "R" else 2)

    # L1: trailing whitespace returns to the paragraph level
    for i in range(n - 1, -1, -1):
        if unicodedata.bidirectional(s[i]) in ("WS", "S", "B"):
            levels[i] = base
        else:
            break

    # L4: mirror brackets on RTL-resolved positions
    chars = [
        _MIRROR.get(c, c) if (lv % 2 == 1 and c in _MIRROR) else c
        for c, lv in zip(s, levels)
    ]

    # L2: reverse maximal runs from the highest level down to 1
    for level in range(max(levels), 0, -1):
        i = 0
        while i < n:
            if levels[i] >= level:
                j = i
                while j < n and levels[j] >= level:
                    j += 1
                chars[i:j] = chars[i:j][::-1]
                i = j
            else:
                i += 1
    return "".join(chars)


def contains_rtl(s: str | None) -> bool:
    """True iff ``s`` holds any code point with bidirectional class R, AL
    or AN — the content gate for RTL normalization. Fast path: every code
    point below U+0590 (ASCII, Latin, Greek, Cyrillic — the overwhelming
    bulk of a web corpus) is rejected by one C-speed ``max`` without any
    per-char Python work."""
    if not s or max(s) < "\u0590":
        return False
    return any(unicodedata.bidirectional(c) in ("R", "AL", "AN") for c in s)


def rtl_normalize_line(line: str, lang: str | None = None) -> str:
    """reshape then reorder one logical line. Shaping runs unconditionally
    (the reference reshapes every line it renders, FileIngestor.py:209-213;
    ``reshape_arabic`` is the identity on non-Arabic text so Hebrew-only
    lines are unaffected). ``lang`` is kept for API compatibility and
    ignored."""
    return bidi_display(reshape_arabic(line))


def rtl_normalize_text(text: str, lang: str | None = None) -> str:
    """The S4 semantic over a whole text payload: per line — strip, then
    reshape+reorder (the reference renders line-by-line and strips each
    line, FileIngestor.py:205-221). The reference applies this branch to
    EVERY non-empty line whenever Arabic support is importable, regardless
    of the document's language — so callers gate on CONTENT
    (:func:`contains_rtl`), not on the ``lang`` column: an English document
    with an embedded Arabic/Hebrew run is normalized exactly like an
    Arabic one, and the per-line gate below skips lines with no RTL code
    points (where shaping and reordering are both identities) without
    paying the sequential per-char cost."""
    return "\n".join(
        rtl_normalize_line(ln.strip()) if contains_rtl(ln) else ln.strip()
        for ln in text.split("\n")
    )


def rtl_normalize_texts(texts: list[str | None],
                        langs: list[str | None] | None = None) -> list[str | None]:
    """Column-level entry: content-mask first, transform only rows that
    actually hold RTL code points (``langs`` is accepted for API
    compatibility and ignored — the gate is content, matching the
    reference's HAS_ARABIC_SUPPORT branch which never consults language)."""
    return [
        rtl_normalize_text(t) if (t and contains_rtl(t)) else t
        for t in texts
    ]
