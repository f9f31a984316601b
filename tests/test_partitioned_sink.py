"""Hive-partitioned sink round-trip: write the documents table partitioned
by a column value (`lang`) with Ray Data's native `partition_cols`, then
verify (a) the directory layout is one partition dir per key — the
resumable-output shape (a failed run skips finished partitions), and
(b) reading a single partition back returns exactly the oracle's rows for
that key, i.e. partition pruning at the READ works on our own output."""

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def out_dir(ray_session, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("hive_out") / "docs_by_lang")
    ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    ds.write_parquet(d, partition_cols=["lang"])
    return d


def test_one_directory_per_lang(out_dir):
    parts = sorted(p for p in os.listdir(out_dir) if p.startswith("lang="))
    langs = duckdb.sql(
        f"SELECT DISTINCT lang FROM read_parquet('{SF_DIR}/documents.parquet') "
        "ORDER BY lang"
    ).df()["lang"].tolist()
    assert parts == [f"lang={lg}" for lg in langs]


def test_single_partition_read_matches_oracle(out_dir, ray_session):
    import ray.data

    parts = sorted(p for p in os.listdir(out_dir) if p.startswith("lang="))
    lang = parts[0].split("=", 1)[1]
    # prune at the read: only this partition's files are listed
    got = (
        ray.data.read_parquet(f"{out_dir}/{parts[0]}")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF_DIR}/documents.parquet') "
        f"WHERE lang = '{lang}' ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()
