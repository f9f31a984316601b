"""Unit + semantic tests for the round-3 text metrics: per-document
character entropy, PMI collocations, and inter-document gram coverage
(the distinct-docs variant of the window-dup statistic)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.curation import (
    CROSS_DOC_GRAM_COVERAGE_SQL,
    cross_doc_gram_coverage,
)
from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.text_analysis import (
    DOC_CHAR_ENTROPY_SQL,
    TOKEN_PMI_TOPK_SQL,
    doc_char_entropy,
    entropy_batch,
    token_pmi_topk,
)


def test_entropy_batch_hand_cases():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["aab", None, "", "zzzz", "héδ\U0001d11e δ xyz aab"],
    })
    got = entropy_batch(df)
    # 'aab': -(2/3)log2(2/3) - (1/3)log2(1/3)
    exp_aab = round(-(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3), 6)
    assert got.entropy.tolist()[0] == pytest.approx(exp_aab, abs=1e-9)
    # NULL and empty text: zero chars, zero entropy, no NaN
    assert got.n_chars.tolist()[1:3] == [0, 0]
    assert got.entropy.tolist()[1:3] == [0.0, 0.0]
    # single distinct char: entropy exactly +0.0 (never -0.0)
    assert got.entropy.tolist()[3] == 0.0
    assert math.copysign(1.0, got.entropy.tolist()[3]) == 1.0
    # astral codepoint (U+1D11E) counted as ONE char
    assert got.n_chars.tolist()[4] == 14


def test_entropy_batch_matches_duckdb_oracle():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["aab", None, "", "zzzz", "héδ\U0001d11e δ xyz aab"],
    })
    con = duckdb.connect()
    con.register("documents_src", df)
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    sql = con.execute(DOC_CHAR_ENTROPY_SQL).df()
    got = entropy_batch(df).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, sql, check_dtype=False)


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s0"] * len(texts),
        "n_chars": [len(t or "") for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.register("documents_src", df)
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    return str(tmp_path), con


def test_cross_doc_coverage_distinct_docs_semantics(ray_session, tmp_path):
    # doc 0 repeats its own 5-gram ('a b c d e' twice) but shares nothing
    # -> intra-doc repetition must NOT count as cross-doc duplication
    # docs 1 and 2 share a 5-gram -> both flagged
    texts = [
        "a b c d e a b c d e",          # self-repeat only
        "p q r s t u v w",              # shares 'p q r s t' with doc 2
        "p q r s t x y z",
        "k l m",                        # too short: absent from output
        None,                           # NULL: absent
    ]
    sf, con = _write_docs(tmp_path, texts)
    got = cross_doc_gram_coverage(sf)
    sql = con.execute(CROSS_DOC_GRAM_COVERAGE_SQL).df()
    pd.testing.assert_frame_equal(got, sql, check_dtype=False)
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_dup_grams"] == 0          # self-repeat ignored
    assert by_id.loc[1, "n_dup_grams"] == 1
    assert by_id.loc[2, "n_dup_grams"] == 1
    assert 3 not in by_id.index and 4 not in by_id.index
    # doc 0: positions 1..6 but only 6 DISTINCT grams... positions = 6,
    # distinct = 6 (cyclic repeat collapses 'a b c d e' + shifted copies)
    assert by_id.loc[0, "n_grams"] == len(
        {tuple(texts[0].split()[i:i + 5]) for i in range(6)})


def test_token_pmi_topk_matches_oracle_and_ranks_collocation(
        ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vocab = ["the", "cat", "sat", "on", "mat", "machine", "learning", "data"]
    texts = []
    for _ in range(40):
        toks = list(rng.choice(vocab, size=30))
        for j in range(0, 24, 8):
            toks[j:j + 2] = ["new", "york"]  # injected collocation
        texts.append(" ".join(toks))
    sf, con = _write_docs(tmp_path, texts)
    got = token_pmi_topk(sf)
    sql = con.execute(TOKEN_PMI_TOPK_SQL).df()
    assert got.bigram.tolist() == sql.bigram.tolist()
    assert got.n.tolist() == sql.n.tolist()
    np.testing.assert_allclose(got.pmi.to_numpy(), sql.pmi.to_numpy(),
                               rtol=0, atol=1e-9)
    assert got.bigram.iloc[0] == "new york"  # collocation must win


def test_doc_zipf_fit_matches_oracle(ray_session, tmp_path):
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.text_analysis import (
        DOC_ZIPF_FIT_SQL,
        doc_zipf_fit,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    # Zipf-ish draw so the fit is non-degenerate
    p = 1.0 / np.arange(1, 41)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=50, p=p)) for _ in range(30)]
    sf, con = _write_docs(tmp_path, texts)
    got = doc_zipf_fit(sf)
    sql = con.execute(DOC_ZIPF_FIT_SQL).df()
    assert got.n_terms.tolist() == sql.n_terms.tolist()
    np.testing.assert_allclose(got.zipf_slope.to_numpy(),
                               sql.zipf_slope.to_numpy(), rtol=0, atol=1e-9)
    np.testing.assert_allclose(got.zipf_intercept.to_numpy(),
                               sql.zipf_intercept.to_numpy(), rtol=0, atol=1e-9)
    assert got.zipf_slope.iloc[0] < -0.5  # Zipf-ish corpus fits steeply


def test_doc_char_entropy_pipeline_roundtrip(ray_session, tmp_path):
    texts = ["aab", None, "", "zzzz", "mixed content here 123"]
    sf, con = _write_docs(tmp_path, texts)
    got = doc_char_entropy(sf)
    sql = con.execute(DOC_CHAR_ENTROPY_SQL).df()
    pd.testing.assert_frame_equal(got, sql, check_dtype=False)


def test_entropy_batch_property_vs_slow_reference():
    """Property: the vectorized packed-unique kernel equals a per-doc
    Counter reference on arbitrary unicode text (incl. astral planes,
    NULLs, repeats)."""
    import collections

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.lists(
        st.one_of(st.none(), st.text(max_size=60)), min_size=1, max_size=12))
    def prop(texts):
        df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                           "text": pd.Series(texts, dtype=object)})
        got = entropy_batch(df)
        for i, s in enumerate(texts):
            s = s or ""
            if not s:
                exp = 0.0
            else:
                cnt = np.array(list(collections.Counter(s).values()), float)
                p = cnt / cnt.sum()
                exp = float(-(p * np.log2(p)).sum())
            assert got.n_chars.iloc[i] == len(s)
            assert abs(got.entropy.iloc[i] - round(exp, 6)) <= 1e-6

    prop()


def test_corpus_token_entropy_matches_oracle(ray_session, tmp_path):
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.text_analysis import (
        CORPUS_TOKEN_ENTROPY_SQL,
        corpus_token_entropy,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    texts += [None, "", "w0 w0 w0"]
    sf, con = _write_docs(tmp_path, texts)
    got = corpus_token_entropy(sf)
    sql = con.execute(CORPUS_TOKEN_ENTROPY_SQL).df()
    assert got.n_vocab.tolist() == sql.n_vocab.tolist()
    assert got.n_tokens.tolist() == sql.n_tokens.tolist()
    np.testing.assert_allclose(got.token_entropy.to_numpy(),
                               sql.token_entropy.to_numpy(),
                               rtol=0, atol=1e-9)


def test_doc_compression_ratio_exact_zlib(ray_session):
    """rows-only entry: values pinned against direct zlib.compress level 6."""
    import zlib

    import numpy as np
    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import (
        text_analysis,
    )

    sf = "/root/testdata/sf0.001"
    got = text_analysis.doc_compression_ratio(sf)
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    raw = np.array([len((t or "").encode()) for t in docs.text], np.int64)
    comp = np.array([len(zlib.compress((t or "").encode(), 6))
                     for t in docs.text], np.int64)
    assert (got.doc_id.to_numpy() == docs.doc_id.to_numpy()).all()
    assert (got.raw_bytes.to_numpy() == raw).all()
    assert (got.compressed_bytes.to_numpy() == comp).all()
