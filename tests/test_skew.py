"""Hot-key skew stress: one user owns HALF the event stream (the classic
power-law head at web scale). The wide operators must (a) complete without
one straggler bucket stalling the pipeline, and (b) still match the DuckDB
oracle exactly — skew may cost time, never correctness.

Why these three: events_user_sessions is the one HOLISTIC per-key operator
(a key's rows must co-locate; a hot key concentrates in one bucket — the
vectorized sort+diff+cumsum inside the bucket keeps it O(rows log rows),
not O(rows^2)); events_top_users and events_tumbling_hourly are algebraic,
where per-batch partial aggregation collapses the hot key to one row per
batch BEFORE any shuffle, so the exchange never sees the skew at all."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from test_queries_oracle import compare, to_df

N_EVENTS = 60_000
HOT_USER = 7


@pytest.fixture(scope="module")
def skewed_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("skewed_sf")
    rng = np.random.RandomState(42)
    n_hot = N_EVENTS // 2
    user = np.concatenate([
        np.full(n_hot, HOT_USER, dtype=np.int64),
        rng.randint(100, 2000, N_EVENTS - n_hot).astype(np.int64),
    ])
    # January 2024, matching the real testdata epoch — and BEFORE the
    # decay reference instant of events_decayed_value, so weights stay <= 1
    ts = (np.datetime64("2024-01-01", "us")
          + np.sort(rng.randint(0, 30 * 86400, N_EVENTS)).astype("timedelta64[s]"))
    df = pd.DataFrame({
        "event_id": np.arange(N_EVENTS, dtype=np.int64),
        "ts": ts,
        "user_id": user,
        "event_type": np.where(rng.rand(N_EVENTS) < 0.1, "purchase", "click"),
        "value": rng.rand(N_EVENTS) * 100,
        "props": "",
    })
    # shuffle row order so the hot user is interleaved across blocks, the
    # way a crawl shard interleaves a hot domain
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   d / "events.parquet", row_group_size=4000)
    return str(d)


@pytest.fixture(scope="module")
def skew_ddb(skewed_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_sf}/events.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.mark.parametrize("name", [
    "events_user_sessions", "events_top_users", "events_tumbling_hourly",
    "events_decayed_value",
])
def test_skewed_hot_key_matches_oracle(entry_mod, skew_ddb, skewed_sf, name):
    ray_df = to_df(entry_mod.queries()[name](skewed_sf))
    sql_df = skew_ddb.execute(entry_mod.oracle_sql()[name]).df()
    compare(ray_df, sql_df, f"{name}[skewed]")


def test_hot_user_dominates_fixture(skewed_sf):
    """Guard: the fixture really is skewed (hot user holds 50% of rows)."""
    import pyarrow.parquet as pq

    u = pq.read_table(f"{skewed_sf}/events.parquet", columns=["user_id"])
    share = (u.column("user_id").to_numpy() == HOT_USER).mean()
    assert share > 0.45
