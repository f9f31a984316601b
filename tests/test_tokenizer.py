"""BPE trainer/encoder vs an independent brute-force reference.

The trainer has no SQL analog (iterative merges), so the pin is a
from-scratch reference implementation (collections.Counter over
DuckDB-derived word counts) compared merge-for-merge, plus hand-derived
encode cases.
"""
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.tokenizer import (
    END,
    BpeEncoder,
    bpe_encode_stats,
    bpe_train_merges,
    encode_word,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def _ref_word_counts(sf_dir: str, cap: int) -> pd.DataFrame:
    con = duckdb.connect()
    df = con.execute(f"""
        SELECT tok AS word, COUNT(*) AS n FROM (
          SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok
          FROM '{sf_dir}/documents.parquet')
        WHERE tok != ''
        GROUP BY tok ORDER BY n DESC, word LIMIT {cap}
    """).df()
    df["n"] = df["n"].astype("int64")
    return df


def _ref_train(words: pd.DataFrame, n_merges: int):
    """Independent reference: Counter-based pair stats, dict-of-word
    representation keyed by the symbol tuple (the Sennrich reference
    structure), merges applied via string join/split on a separator."""
    vocab = {}
    for w, n in zip(words["word"], words["n"]):
        key = " ".join(list(w) + [END])
        vocab[key] = vocab.get(key, 0) + int(n)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for key, n in vocab.items():
            syms = key.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = best
        new_vocab = {}
        for key, n in vocab.items():
            syms = key.split(" ")
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k2 = " ".join(out)
            new_vocab[k2] = new_vocab.get(k2, 0) + n
        vocab = new_vocab
        merges.append((rank, a, b, cnt))
    return merges


def test_train_matches_reference(ray_session):
    got = bpe_train_merges(SF, n_merges=15, vocab_cap=5000)
    ref = _ref_train(_ref_word_counts(SF, 5000), 15)
    exp = pd.DataFrame(ref, columns=["merge_rank", "left", "right",
                                     "pair_count"])
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    assert len(got) == 15
    # counts are weighted by word frequency and non-increasing is NOT
    # guaranteed (merged symbols form new pairs), but all must be >= 1
    assert (got["pair_count"] >= 1).all()


def test_train_deterministic(ray_session):
    a = bpe_train_merges(SF, n_merges=8, vocab_cap=1000)
    b = bpe_train_merges(SF, n_merges=8, vocab_cap=1000)
    pd.testing.assert_frame_equal(a, b)


def test_encode_word_hand_cases():
    merges = [(1, "a", "b", 0), (2, "ab", "c", 0), (3, "d", END, 0)]
    rank_of = {(a, b): r for r, a, b, _ in merges}
    # "abc" -> a b c </w> -> ab c </w> -> abc </w>
    assert encode_word("abc", rank_of) == ["abc", END]
    # "abd" -> a b d </w> -> ab d </w> -> ab d</w>
    assert encode_word("abd", rank_of) == ["ab", "d</w>"]
    # no applicable merge
    assert encode_word("xyz", rank_of) == ["x", "y", "z", END]
    # lowest rank wins before later ranks even when later appears earlier
    merges2 = [(1, "y", "z", 0), (2, "x", "y", 0)]
    r2 = {(a, b): r for r, a, b, _ in merges2}
    assert encode_word("xyz", r2) == ["x", "yz", END]


def test_encoder_batch_counts(ray_session):
    merges = [(1, "a", "b", 0)]
    enc = BpeEncoder(merges)
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["ab ab", "cd", None]})
    out = enc(df)
    # "ab" -> [ab, </w>] = 2 subwords each; "cd" -> [c, d, </w>] = 3
    assert out["n_subwords"].tolist() == [4, 3, 0]
    assert out["n_words"].tolist() == [2, 1, 0]


def test_encode_stats_pipeline(ray_session):
    out = bpe_encode_stats(SF, n_merges=10, vocab_cap=1000)
    assert len(out) == 500
    assert (out["n_subwords"] >= out["n_words"]).all()
    # merges can only shrink the char-level encoding
    char_level = bpe_encode_stats(SF, n_merges=0, vocab_cap=1000)
    assert (out["n_subwords"] <= char_level["n_subwords"]).all()
