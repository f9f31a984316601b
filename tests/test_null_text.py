"""NULL-text stress: 20% of documents have ``text = NULL`` (routine at web
scale: fetch failures, binary pages, extraction nulls). Every SQL-checked
query over the documents table must still match the DuckDB oracle on the
same null-injected views — round 1 found exactly one silent NULL-dropping
bug (dedup_exact + pandas groupby dropna); this pins the whole surface."""

import shutil

import duckdb
import numpy as np
import pytest

from test_queries_oracle import SQL_CHECKED, TABLES, compare, to_df

SRC = "/root/testdata/sf0.001"
NULL_FRAC = 0.2

DOC_QUERIES = [
    n for n in SQL_CHECKED
    if n.startswith(("doc", "dedup", "token", "chunk", "dup", "pii",
                     "contamination", "source", "filter", "corpus",
                     "pack", "ngram", "tf_idf", "window", "cross", "lang",
                     "quality"))
    or n == "docs_longest"
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    mask = np.random.RandomState(3).rand(len(docs)) < NULL_FRAC
    docs.loc[mask, "text"] = None
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def null_ddb(null_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_sf}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


def test_fixture_really_has_nulls(null_sf):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{null_sf}/documents.parquet", columns=["text"])
    assert t.column("text").null_count > 0.1 * t.num_rows


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_null_text_matches_oracle(entry_mod, null_ddb, null_sf, name):
    ray_df = to_df(entry_mod.queries()[name](null_sf))
    sql_df = null_ddb.execute(entry_mod.oracle_sql()[name]).df()
    compare(ray_df, sql_df, f"{name}[null-text]")
