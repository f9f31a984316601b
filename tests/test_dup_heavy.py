"""Duplicate-heavy stress: 50% of documents are copies drawn from a pool
of 20 originals — the regime deduplication exists for (crawl mirrors,
boilerplate pages), and simultaneously a hot-TEXT skew test: the dedup
exchanges key on text hash, so 20 hashes own half the corpus. Every
SQL-checked documents query must still match the oracle."""

import shutil

import duckdb
import numpy as np
import pytest

from test_null_text import DOC_QUERIES
from test_queries_oracle import TABLES, compare, to_df

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("dup_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    rng = np.random.RandomState(9)
    pool = docs["text"].iloc[:20].tolist()
    mask = rng.rand(len(docs)) < 0.5
    docs.loc[mask, "text"] = [pool[i % len(pool)] for i in np.where(mask)[0]]
    # keep the derived length column consistent with the rewritten text
    docs["n_chars"] = docs["text"].fillna("").str.len().astype("int64")
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def dup_ddb(dup_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dup_sf}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


def test_fixture_really_is_dup_heavy(dup_sf):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{dup_sf}/documents.parquet", columns=["text"])
    texts = t.column("text").to_pylist()
    assert len(set(texts)) < 0.6 * len(texts)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_dup_heavy_matches_oracle(entry_mod, dup_ddb, dup_sf, name):
    ray_df = to_df(entry_mod.queries()[name](dup_sf))
    sql_df = dup_ddb.execute(entry_mod.oracle_sql()[name]).df()
    compare(ray_df, sql_df, f"{name}[dup-heavy]")
