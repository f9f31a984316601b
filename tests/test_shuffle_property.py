"""Property tests for the bucketed shuffle helpers: on randomized inputs,
``bucketed_combine`` must equal a plain pandas groupby and
``bucketed_join`` a plain pandas merge — across bucket counts, dtype
hints, coalescing, duplicate keys, negative ints and datetimes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.functions.shuffle import (
    bucketed_combine,
    bucketed_join,
)


def _write(tmp_path, name, df):
    p = tmp_path / f"{name}.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    import ray.data

    return ray.data.read_parquet(str(p))


def _rand_frame(rng, n, key_space):
    return pd.DataFrame({
        "k": rng.integers(-key_space, key_space, n),
        "v": rng.random(n) * 100 - 50,
        "w": rng.integers(0, 1000, n),
    })


@pytest.mark.parametrize("seed,num_buckets,coalesce", [
    (0, 4, None), (1, 16, 4), (2, 1, 2), (3, 64, None),
])
def test_bucketed_combine_equals_pandas_groupby(ray_session, tmp_path,
                                                seed, num_buckets, coalesce):
    rng = np.random.default_rng(seed)
    df = _rand_frame(rng, 500, 40)
    ds = _write(tmp_path, f"c{seed}", df)

    def partial(b):
        return b.groupby("k", as_index=False).agg(
            sv=("v", "sum"), mw=("w", "max"), n=("v", "size"))

    def combine(g):
        return g.groupby("k", as_index=False).agg(
            sv=("sv", "sum"), mw=("mw", "max"), n=("n", "sum"))

    got = (bucketed_combine(ds, "k", partial, combine,
                            num_buckets=num_buckets, coalesce_blocks=coalesce)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k", as_index=False)
            .agg(sv=("v", "sum"), mw=("w", "max"), n=("v", "size"))
            .sort_values("k").reset_index(drop=True))
    assert np.array_equal(got.k, want.k)
    assert np.allclose(got.sv, want.sv)
    assert np.array_equal(got.mw, want.mw)
    assert np.array_equal(got.n, want.n)


@pytest.mark.parametrize("seed,num_buckets,hints", [
    (0, 4, False), (1, 16, True), (2, 1, True), (3, 32, False),
])
def test_bucketed_join_equals_pandas_merge(ray_session, tmp_path,
                                           seed, num_buckets, hints):
    rng = np.random.default_rng(seed + 10)
    left = pd.DataFrame({
        "lk": rng.integers(-20, 20, 300),
        "lv": rng.random(300),
        "lts": pd.to_datetime(
            rng.integers(1_600_000_000, 1_700_000_000, 300), unit="s"
        ).astype("datetime64[us]"),
    })
    right = pd.DataFrame({
        "rk": rng.integers(-20, 20, 80),
        "rs": [f"s{i}" for i in rng.integers(0, 9, 80)],
    })
    lds = _write(tmp_path, f"l{seed}", left)
    rds = _write(tmp_path, f"r{seed}", right)

    def join_fn(l, r):
        return l.merge(r, left_on="lk", right_on="rk")

    kwargs = {}
    if hints:
        kwargs = {
            "left_dtypes": {"lk": "int64", "lv": "float64",
                            "lts": "datetime64[us]"},
            "right_dtypes": {"rk": "int64", "rs": "object"},
        }
    got = (bucketed_join(lds, rds, "lk", "rk", join_fn,
                         num_buckets=num_buckets, **kwargs)
           .to_pandas()
           .sort_values(["lk", "lv", "rs"]).reset_index(drop=True))
    want = (left.merge(right, left_on="lk", right_on="rk")
            .sort_values(["lk", "lv", "rs"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert np.array_equal(got.lk, want.lk)
    assert np.allclose(got.lv, want.lv)
    assert np.array_equal(got.lts.astype("int64"), want.lts.astype("int64"))
    assert list(got.rs) == list(want.rs)


def test_bucketed_join_dtype_roundtrip(ray_session, tmp_path):
    """int64 keys and datetimes survive the wire exactly — no float
    promotion artifacts (large ints near 2^53 would corrupt under the old
    NaN-padding scheme's float64 wire if restore were skipped)."""
    big = np.array([2**53 + 3, 2**53 + 5, 7], dtype=np.int64)
    left = pd.DataFrame({"k": big, "v": [1.0, 2.0, 3.0]})
    right = pd.DataFrame({"k2": big[:2], "tag": ["a", "b"]})
    lds = _write(tmp_path, "big_l", left)
    rds = _write(tmp_path, "big_r", right)

    def join_fn(l, r):
        # join_fn runs in workers: surface the observed dtype as a column
        m = l.merge(r, left_on="k", right_on="k2")[["k", "tag"]]
        m["l_dtype"] = str(l["k"].dtype)
        return m

    got = (bucketed_join(lds, rds, "k", "k2", join_fn, num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert set(got.l_dtype) == {"int64"}
    assert list(got.k) == [2**53 + 3, 2**53 + 5]
    assert list(got.tag) == ["a", "b"]


def test_stable_order_is_arrival_order_invariant():
    """_stable_order (key cols + row-hash tiebreak) must produce the SAME
    row order for any arrival permutation of the same row multiset — the
    property float-sum determinism rests on. Pure unit test (no Ray).
    Includes duplicate keys with differing payloads and fully duplicated
    rows (interchangeable, so any position among equals is fine: compare
    the full frame, which is equal iff ordering of distinct rows is
    fixed)."""
    import numpy as np
    import pandas as pd

    from ocr_pipeline_fastapi_latency_optimization_ray.functions.shuffle import (
        _stable_order,
    )

    rng = np.random.RandomState(7)
    base = pd.DataFrame({
        "k": rng.randint(0, 5, 64),
        "text": [f"payload-{i % 7}" * 10 for i in range(64)],
        "x": rng.standard_normal(64),
    })
    # exact duplicate rows too
    base = pd.concat([base, base.iloc[:8]], ignore_index=True)

    ref = _stable_order(
        base.sample(frac=1, random_state=0).reset_index(drop=True), ["k"]
    ).reset_index(drop=True)
    for seed in (1, 2, 3):
        perm = _stable_order(
            base.sample(frac=1, random_state=seed).reset_index(drop=True),
            ["k"],
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(ref, perm)
    # keys are primary: non-decreasing after ordering
    assert (np.diff(ref["k"].to_numpy()) >= 0).all()
    # and a float sum per key is reproducible bit-for-bit
    s1 = ref.groupby("k")["x"].sum()
    s2 = _stable_order(
        base.sample(frac=1, random_state=9).reset_index(drop=True), ["k"]
    ).groupby("k")["x"].sum()
    assert (s1 == s2).all()
