"""Tests for the HTML tokenizer (webtext layout analog) and the block
labeling rules: boilerplate, link density, tables, figures, formulas."""

from ocr_pipeline_fastapi_latency_optimization_ray.config import PipelineConfig
from ocr_pipeline_fastapi_latency_optimization_ray.functions.html_tokenize import (
    blocks_table_from_html,
    tokenize_html,
)
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.doc_extract import extract_document

CFG = PipelineConfig()


def labels(html):
    return [(b.label, b.content) for b in tokenize_html(html)]


def test_basic_paragraphs():
    out = labels("<html><body><p>hello world</p><p>second para</p></body></html>")
    assert out == [("text", "hello world"), ("text", "second para")]


def test_heading_prefix_and_list():
    out = labels("<h2>Title Here</h2><ul><li>one</li><li>two</li></ul>")
    assert ("text", "## Title Here") in out
    assert ("text", "- one") in out and ("text", "- two") in out


def test_nav_footer_aside_are_abandon():
    html = "<nav><a href='/x'>x</a> link</nav><p>body text</p><footer>foot</footer><aside>side</aside>"
    out = labels(html)
    assert ("text", "body text") in out
    for lbl, content in out:
        if content in ("foot", "side") or "link" in content:
            assert lbl == "abandon"


def test_class_hint_boilerplate():
    out = labels('<div class="sidebar-widget"><p>promo stuff</p></div><p>real</p>')
    d = dict((c, l) for l, c in out)
    assert d["promo stuff"] == "abandon"
    assert d["real"] == "text"


def test_link_density_abandon():
    html = '<p><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></p>'
    out = labels(html)
    assert out[0][0] == "abandon"
    html2 = '<p>lots of plain words here with just <a href="/a">one</a> link in a long sentence</p>'
    assert labels(html2)[0][0] == "text"


def test_script_style_skipped():
    out = labels("<script>var x=1;</script><style>p{}</style><p>kept</p>")
    assert out == [("text", "kept")]


def test_table_rendered_markdown():
    html = "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
    out = labels(html)
    assert len(out) == 1
    lbl, content = out[0]
    assert lbl == "table"
    assert content.splitlines() == ["| a | b |", "| --- | --- |", "| 1 | 2 |"]


def test_figure_with_caption():
    html = '<figure><img src="/i.png" alt="An Image"><figcaption>cap text</figcaption></figure>'
    out = labels(html)
    assert out == [("figure", "![An Image](/i.png)\n*cap text*")]


def test_standalone_img():
    out = labels('<p>before</p><img src="/x.jpg" alt="pic"><p>after</p>')
    assert ("figure", "![pic](/x.jpg)") in out


def test_math_formula():
    out = labels("<p>intro</p><math>E = mc^2</math>")
    assert ("formula", "E = mc^2") in out


def test_malformed_html_tolerated():
    out = labels("<p>open para <div>nested <p>deep</p>")
    assert any(l == "text" for l, _ in out)


def test_entity_decoding():
    out = labels("<p>a &amp; b &lt;c&gt;</p>")
    assert out == [("text", "a & b <c>")]


def test_geometry_monotonic_nonoverlapping():
    blocks, raw = blocks_table_from_html("<p>one</p><p>two</p><p>three</p>")
    assert len(blocks) == 3
    for i in range(1, len(blocks)):
        assert blocks.xyxy[i, 1] > blocks.xyxy[i - 1, 3]


def test_extract_document_drops_boilerplate():
    html = b"<nav><a href='/'>h</a></nav><article><p>alpha</p><p>beta</p></article><footer>f</footer>"
    r = extract_document(html, None, "en", CFG)
    assert r.extracted_text == "alpha\n\nbeta"
    assert r.n_blocks_dropped >= 2
    assert [s[1:] for s in r.spans] == [(0, 5), (7, 11)]


def test_extract_document_table_placeholder_enriched():
    html = (
        b"<p>before</p><table><tr><th>h1</th><th>h2</th></tr>"
        b"<tr><td>x</td><td>y</td></tr></table><p>after</p>"
    )
    r = extract_document(html, None, "en", CFG)
    assert "| h1 | h2 |" in r.extracted_text
    assert "PAGE 0" not in r.extracted_text  # placeholder fully substituted
    assert "before" in r.extracted_text and "after" in r.extracted_text


def test_span_roundtrip():
    html = (
        b"<h1>Title</h1><p>alpha beta</p>"
        b'<figure><img src="/i.png" alt="A"><figcaption>c</figcaption></figure>'
        b"<p>tail</p>"
    )
    r = extract_document(html, None, "en", CFG)
    for bid, s, e in r.spans:
        assert 0 <= s <= e <= len(r.extracted_text)
    covered = "".join(r.extracted_text[s:e] for _, s, e in r.spans)
    assert "Title" in covered and "tail" in covered


def test_normalize_urls_projection():
    """M13 analog: whitespace-stripped keys, deterministic invalid-row keys."""
    import pyarrow as pa

    from ocr_pipeline_fastapi_latency_optimization_ray.stages.classify import (
        normalize_urls,
    )

    batch = pa.table(
        {
            "url": pa.array(["  https://a.example/x \t", "", None, "ok"]),
            "html": pa.array([b"x", b"y", b"z", b"w"], pa.binary()),
        }
    )
    out = normalize_urls(batch)
    assert out["url"].to_pylist() == [
        "https://a.example/x", "invalid:row-1", "invalid:row-2", "ok",
    ]


def test_fast_scanner_equals_htmlparser_on_corpus():
    """The regex scanner and the stdlib-HTMLParser path must emit identical
    block lists over the full synthetic corpus and adversarial markup."""
    from ocr_pipeline_fastapi_latency_optimization_ray.functions.html_tokenize import (
        tokenize_html,
    )
    from ocr_pipeline_fastapi_latency_optimization_ray.sources.synth import (
        synth_pages_table,
    )

    t = synth_pages_table(400)
    payloads = [
        p for p, in zip(t["html"].to_pylist())
        if p and not p.startswith(b"%PDF") and not p.startswith(b"\x89PNG")
    ]
    assert len(payloads) > 200
    adversarial = [
        b"<p>a &amp; b &#65; &lt;tag&gt;</p>",
        b"<div class='sidebar'><p>boiler</p></div><p>keep</p>",
        b"<script>if (a<b) { x('</div>'); }</script><p>after script</p>",
        b"<!-- comment --><!DOCTYPE html><?pi ?><p>x</p>",
        b"<img src=a.png alt='A &quot;B'/><br/><hr>",
        b"<table><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></table>",
        b"<ul><li>one<li>two</ul>",                    # unclosed li
        b"<p>unclosed paragraph",
        b"<figure><img src=x.png alt=y><figcaption>cap &amp; co</figcaption></figure>",
        b"<math>E = mc^2</math>",
        b"<p>text with stray < bracket</p>",           # forces fallback
        "<p>café — UNICODE مثال</p>".encode(),
    ]
    for p in payloads + adversarial:
        fast = tokenize_html(p, engine="fast")
        ref = tokenize_html(p, engine="reference")
        assert [
            (b.label, b.content, b.text_density, b.link_density) for b in fast
        ] == [
            (b.label, b.content, b.text_density, b.link_density) for b in ref
        ], p[:120]
