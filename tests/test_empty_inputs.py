"""Degenerate-partition contract: every query must survive EMPTY fact
tables (documents/events/embeddings/orders/lineitem — the routine case at
scale: an all-filtered shard, an empty input split) and return its declared
schema. For the SQL-checked queries the DuckDB oracle runs on the same
empty views, so the value comparison extends the correctness gate to the
empty case (dimension-driven queries legitimately return rows)."""

import shutil

import duckdb
import pytest

from test_queries_oracle import SQL_CHECKED, TABLES, compare, to_df

FACTS = ["documents", "events", "embeddings", "orders", "lineitem"]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("emptyfact_sf")
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if t in FACTS:
            pq.write_table(pq.read_schema(src).empty_table(), d / f"{t}.parquet")
        else:
            shutil.copy(src, d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def empty_ddb(empty_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


def all_query_names():
    import __ray_entry__

    return sorted(__ray_entry__.queries())


@pytest.mark.parametrize("name", all_query_names())
def test_query_survives_empty_facts(entry_mod, empty_sf, name):
    res = entry_mod.queries()[name](empty_sf)
    df = to_df(res)
    assert df is not None  # no exception, a frame came back


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_empty_facts_match_oracle(entry_mod, empty_sf, empty_ddb, name):
    ray_df = to_df(entry_mod.queries()[name](empty_sf))
    sql_df = empty_ddb.execute(entry_mod.oracle_sql()[name]).df()
    compare(ray_df, sql_df, name)
