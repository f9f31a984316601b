"""S4 RTL normalization semantic (functions/rtl.py; reference
FileIngestor.py:208-221 reshape + bidi per line, keyed here on CONTENT —
the reference's Arabic branch runs on every line whenever the libraries
import, regardless of document language). Expected strings are
hand-derived from the public Unicode data: Arabic Presentation Forms code
points via their standard joining rules, display order via UAX #9."""

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_pipeline_fastapi_latency_optimization_ray.functions import rtl

# hand-derived presentation forms
SEEN_INIT = "ﺳ"
LAM_ALEF_FINAL = "ﻼ"
MEEM_ISO = "ﻡ"
MEEM_FINAL = "ﻢ"
BEH_INIT = "ﺑ"
SEEN_MEDIAL = "ﺴ"
DAL_ISO = "ﺩ"
ALEF_ISO = "ﺍ"
REH_ISO = "ﺭ"
TEH_FINAL = "ﺖ"


def test_reshape_contextual_forms_and_ligature():
    # س(dual, word-initial) ل+ا(ligature, prev connects) م(isolated: the
    # ligature's alef is right-joining and cannot connect forward)
    assert rtl.reshape_arabic("سلام") == SEEN_INIT + LAM_ALEF_FINAL + MEEM_ISO


def test_reshape_right_joining_chain():
    # د ا ر are all right-joining: none connects forward, all isolated
    assert rtl.reshape_arabic("دار") == DAL_ISO + ALEF_ISO + REH_ISO


def test_reshape_harakat_transparent():
    # ب ِ س ْ م: marks pass through and do not break joining context
    got = rtl.reshape_arabic("بِسْم")
    assert got == BEH_INIT + "ِ" + SEEN_MEDIAL + "ْ" + MEEM_FINAL


def test_reshape_tatweel_join_causing():
    got = rtl.reshape_arabic("بـت")
    assert got == BEH_INIT + "ـ" + TEH_FINAL


def test_reshape_ascii_identity():
    assert rtl.reshape_arabic("plain ascii text 123") == "plain ascii text 123"


def test_bidi_pure_rtl_reverses():
    assert rtl.bidi_display("ﺳﻼﻡ") == "ﻡﻼﺳ"


def test_bidi_ltr_identity():
    for t in ("hello world", "a (b) c 12.5%", "", "tabs\tstay"):
        assert rtl.bidi_display(t) == t


def test_bidi_mixed_numbers_stay_ltr():
    # L paragraph: the Arabic run reverses in place; digits after an AL
    # run type as AN (W2) but still read left-to-right within the display
    assert rtl.bidi_display("abc سلام 123") == "abc 123 مالس"


def test_bidi_mirrors_brackets_in_rtl():
    # logical ب ( ت ) in an RTL paragraph -> display ( ت ) ب with the
    # bracket glyphs mirrored so they still open toward the content
    assert rtl.bidi_display("ب(ت)") == "(ت)ب"


def test_hebrew_reorders_without_shaping():
    assert rtl.rtl_normalize_text("שלום עולם", "he") == "םלוע םולש"


def test_normalize_per_line_and_content_mask():
    t = "  سلام  \n  keep ltr  "
    # each line stripped, Arabic line shaped+reordered, LTR line intact
    got = rtl.rtl_normalize_text(t)
    assert got == MEEM_ISO + LAM_ALEF_FINAL + SEEN_INIT + "\nkeep ltr"
    # the gate is CONTENT (round-3 ADVICE): a doc with RTL runs is
    # normalized no matter what the lang column says — the reference's
    # Arabic branch never consults language (FileIngestor.py:209)
    out = rtl.rtl_normalize_texts([t, None, "x"], ["en", "ar", None])
    assert out[0] == got
    # rows with no RTL code points pass through untouched (same object)
    assert out[1] is None and out[2] == "x"
    plain = ["hello", "tabs\tstay", ""]
    assert rtl.rtl_normalize_texts(plain, ["ar", "he", "ar"]) == plain


def test_contains_rtl_gate():
    assert not rtl.contains_rtl(None)
    assert not rtl.contains_rtl("")
    assert not rtl.contains_rtl("plain ascii, Ωμέγα, über, 日本語")
    assert rtl.contains_rtl("embedded سلام run")
    assert rtl.contains_rtl("שלום")  # Hebrew (class R)
    assert rtl.contains_rtl("ﻡﻼﺳ")  # presentation forms (class AL)


def test_extraction_pipeline_applies_rtl_for_text_kind(ray_session, tmp_path):
    """End-to-end byte identity: a text-kind page containing Arabic runs
    comes out shaped + display-ordered REGARDLESS of the lang column (the
    content gate, round-3 ADVICE); a pure-LTR page is identity."""
    from ocr_pipeline_fastapi_latency_optimization_ray.config import (
        PipelineConfig,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.extract import (
        build_extraction_pipeline, read_pages,
    )

    body = "سلام\nplain line"
    plain = "just latin text\nsecond line"
    t = pa.table({
        "url": pa.array(["https://a.example/ar/doc/1",
                         "https://a.example/en/doc/2",
                         "https://a.example/en/doc/3"], pa.string()),
        "warc_ts": pa.array([0, 0, 0], pa.timestamp("us")),
        "html": pa.array([None, None, None], pa.binary()),
        "text": pa.array([body, body, plain], pa.string()),
        "lang": pa.array(["ar", "en", "en"], pa.string()),
    })
    pq.write_table(t, tmp_path / "pages.parquet")
    out = (
        build_extraction_pipeline(
            read_pages(str(tmp_path / "pages.parquet")), PipelineConfig()
        )
        .to_pandas()
        .set_index("url")["extracted_text"]
    )
    normalized = MEEM_ISO + LAM_ALEF_FINAL + SEEN_INIT + "\nplain line"
    assert out["https://a.example/ar/doc/1"] == normalized
    # lang='en' but the content has an Arabic run: normalized identically
    assert out["https://a.example/en/doc/2"] == normalized
    # no RTL content: byte identity
    assert out["https://a.example/en/doc/3"] == plain
