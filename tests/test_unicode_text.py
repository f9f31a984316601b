"""Unicode stress: 30% of documents get CJK / emoji / combining-mark /
RTL snippets appended. Code-point semantics (Python ``len`` / pandas str
ops vs DuckDB ``length`` / ``string_split``) must agree everywhere the
oracle compares — tokenization, normalization (NFC), hashing, PII regexes,
length stats."""

import shutil

import duckdb
import numpy as np
import pytest

from test_null_text import DOC_QUERIES
from test_queries_oracle import TABLES, compare, to_df

SRC = "/root/testdata/sf0.001"

SNIPPETS = [
    "日本語のテキスト 漢字 テスト", "emoji 🎉🚀 mix", "café naïve résumé",
    "Ωμέγα ελληνικά", "über straße", "éclair combining", "عربى نص",
    "한국어 텍스트 테스트",
    # Non-ASCII whitespace: NBSP, ideographic space, line separator,
    # vertical tab. Python str.split() collapses ALL of these; the RE2
    # '\s+' kernel the engine and the oracles share collapses NONE of the
    # first three — this row pins corpus_build/doc_normalize to the RE2
    # semantics (round-2 ADVICE: corpus_build diverged here).
    "nb sp　wide line\x0bvt   mix",
    # Reshaped RTL: Arabic Presentation Forms code points (what the S4
    # rtl normalization emits, functions/rtl.py) — downstream token/
    # hash/length ops must treat them as ordinary code points.
    "ﻡﻼﺳ ﺪﻳﺪﺟ ﺺﻧ",
]


@pytest.fixture(scope="module")
def uni_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("uni_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    idx = np.where(np.random.RandomState(5).rand(len(docs)) < 0.3)[0]
    texts = docs["text"].copy()
    for i in idx:
        texts.iloc[i] = (texts.iloc[i] or "") + " " + SNIPPETS[i % len(SNIPPETS)]
    docs["text"] = texts
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def uni_ddb(uni_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{uni_sf}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_unicode_text_matches_oracle(entry_mod, uni_ddb, uni_sf, name):
    ray_df = to_df(entry_mod.queries()[name](uni_sf))
    sql_df = uni_ddb.execute(entry_mod.oracle_sql()[name]).df()
    compare(ray_df, sql_df, f"{name}[unicode]")
