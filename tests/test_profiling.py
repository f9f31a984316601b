"""fk_integrity_check against a corpus with PLANTED orphans — the
non-vacuity pin (the driver corpus is referentially consistent, so its
orphan columns are legitimately zero; this fixture proves the anti-join
actually detects breakage)."""
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.profiling import (
    FK_INTEGRITY_SQL,
    fk_integrity_check,
    table_profile,
)

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def broken_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("broken_sf")
    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    # break FK 1: retag 5 known orderkeys on the lineitem side to ids
    # beyond the orders domain
    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    victims = np.sort(li["l_orderkey"].unique())[:5]
    hit = li["l_orderkey"].isin(victims)
    li.loc[hit, "l_orderkey"] = (
        li.loc[hit, "l_orderkey"] + 10_000_000)
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   d / "lineitem.parquet")
    # break FK 2: delete 3 referenced customers
    od = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    cu = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    gone = np.sort(od["o_custkey"].unique())[:3]
    cu = cu[~cu["c_custkey"].isin(gone)]
    pq.write_table(pa.Table.from_pandas(cu, preserve_index=False),
                   d / "customer.parquet")
    n_orphan_rows_li = int(hit.sum())
    n_orphan_rows_od = int(od["o_custkey"].isin(gone).sum())
    return str(d), n_orphan_rows_li, n_orphan_rows_od


def test_planted_orphans_detected(ray_session, broken_sf):
    d, n_li, n_od = broken_sf
    out = fk_integrity_check(d).set_index("relation")
    li_row = out.loc["lineitem.l_orderkey->orders.o_orderkey"]
    od_row = out.loc["orders.o_custkey->customer.c_custkey"]
    assert li_row["n_orphan_keys"] == 5
    assert li_row["n_orphan_rows"] == n_li > 0
    assert od_row["n_orphan_keys"] == 3
    assert od_row["n_orphan_rows"] == n_od > 0


def test_planted_orphans_match_oracle(ray_session, broken_sf):
    d, _, _ = broken_sf
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    got = fk_integrity_check(d).reset_index(drop=True)
    exp = con.execute(FK_INTEGRITY_SQL).df()
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_table_profile_with_nulls(ray_session, tmp_path):
    """Nulls are counted and excluded from distinct — pinned on a frame
    with known null structure (the driver corpus has none)."""
    df = pd.DataFrame({
        "a": pd.array([1, 1, None, 3], dtype="Int64"),
        "b": ["x", None, None, "x"],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "t.parquet")
    out = table_profile(str(tmp_path), "t").set_index("column")
    assert out.loc["a", "n_rows"] == 4 and out.loc["a", "n_nulls"] == 1
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["b", "n_nulls"] == 2 and out.loc["b", "n_distinct"] == 1


def test_incremental_build_covers_same_hash_set(ray_session):
    """Incremental first-seen-wins keeps a possibly different KEEPER per
    duplicate group than the one-shot global-min build, but the surviving
    HASH SET must be identical — dedup coverage is order-independent."""
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.curation import (
        corpus_build,
        corpus_build_incremental,
    )

    full = corpus_build(SRC)
    inc = corpus_build_incremental(SRC)
    assert set(full["norm_md5"]) == set(inc["norm_md5"])
    assert len(inc) == len(full)
    assert inc["norm_md5"].is_unique
    assert set(inc["snapshot"]) <= {"a", "b"}
    # every A-snapshot keeper must actually hash-split into A
    ids = inc.loc[inc["snapshot"] == "a", "doc_id"].to_numpy("uint64")
    b = (ids * 2654435761) % (1 << 32) % 100
    assert (b < 50).all()
