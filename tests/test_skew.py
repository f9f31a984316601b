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


def _join_inputs(tmp, hot_frac, n_left=60_000, n_keys=2000, seed=3):
    """Left fact table with ``hot_frac`` of rows on ONE key + a right dim
    table; returns (left_path, right_path, expected merge via pandas)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    n_hot = int(n_left * hot_frac)
    key = np.concatenate([
        np.full(n_hot, HOT_USER, dtype=np.int64),
        rng.randint(0, n_keys, n_left - n_hot).astype(np.int64),
    ])
    left = pd.DataFrame({
        "k": key,
        "v": rng.randint(0, 1000, n_left).astype(np.int64),
    }).sample(frac=1.0, random_state=11).reset_index(drop=True)
    right = pd.DataFrame({
        "rk": np.arange(n_keys, dtype=np.int64),
        "w": rng.randint(1, 5, n_keys).astype(np.int64),
    })
    lp, rp = str(tmp / f"l_{hot_frac}.parquet"), str(tmp / f"r_{hot_frac}.parquet")
    pq.write_table(pa.Table.from_pandas(left, preserve_index=False), lp,
                   row_group_size=4000)
    pq.write_table(pa.Table.from_pandas(right, preserve_index=False), rp)
    exp = (left.merge(right, left_on="k", right_on="rk")
           .assign(wv=lambda d: d.v * d.w)
           .groupby("k", as_index=False).agg(s=("wv", "sum"),
                                             n=("wv", "size"))
           .sort_values("k").reset_index(drop=True))
    return lp, rp, exp


def _run_bucketed_join(lp, rp):
    import ray.data

    from ocr_pipeline_fastapi_latency_optimization_ray.functions.shuffle import (
        bucketed_join,
    )

    def join_fn(left, right):
        m = left.merge(right, left_on="k", right_on="rk")
        m["wv"] = m.v * m.w
        return m.groupby("k", as_index=False).agg(s=("wv", "sum"),
                                                  n=("wv", "size"))

    out = bucketed_join(
        ray.data.read_parquet(lp), ray.data.read_parquet(rp),
        "k", "rk", join_fn,
        left_dtypes={"k": "int64", "v": "int64"},
        right_dtypes={"rk": "int64", "w": "int64"},
        num_buckets=16,
    ).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_bucketed_join_hot_key_exact_and_linear(ray_session, tmp_path):
    """VERDICT r3 #7: one join key holding 30% of the fact side must (a)
    join exactly — the hot key co-locates in one bucket and the bucket's
    vectorized merge handles it — and (b) cost ~linearly more than a
    uniform input of the same size: the per-bucket merge is hash-join
    linear in bucket rows, so a quadratic regression would show up as a
    ~100x blowup, far beyond the 15x guard (sized for VM noise, not
    precision)."""
    import time

    lp_u, rp_u, exp_u = _join_inputs(tmp_path, hot_frac=0.0)
    t0 = time.time()
    got_u = _run_bucketed_join(lp_u, rp_u)
    t_uniform = time.time() - t0
    pd.testing.assert_frame_equal(got_u, exp_u.astype(got_u.dtypes.to_dict()))

    lp_h, rp_h, exp_h = _join_inputs(tmp_path, hot_frac=0.3)
    t0 = time.time()
    got_h = _run_bucketed_join(lp_h, rp_h)
    t_hot = time.time() - t0
    pd.testing.assert_frame_equal(got_h, exp_h.astype(got_h.dtypes.to_dict()))
    assert (got_h.loc[got_h.k == HOT_USER, "n"] >= 18_000).all()
    assert t_hot < 15 * max(t_uniform, 0.5), (
        f"hot-key join {t_hot:.1f}s vs uniform {t_uniform:.1f}s — "
        "superlinear bucket behavior")
