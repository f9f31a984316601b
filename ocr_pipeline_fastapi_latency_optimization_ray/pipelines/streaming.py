"""Stream-shaped operators over the ``events`` table: as-of join, sliding
windows, session (gap) windows, distinct counts, per-group top-k.

These are the operators a Ray Data user reaches for that the Dataset API
does not ship natively (SURVEY.md §2.10 notes the reference's only
streaming semantics are service-level); each is expressed as the survey's
custom-operator recipe (a): composition of ``map_batches`` partial work +
a hash-bucketed ``groupby().map_groups`` — the shuffle key is always a
bounded bucket, never a per-entity key, so key cardinality growth never
adds shuffle partitions (functions/shuffle.py).

All per-group work inside ``map_groups`` is vectorized pandas/numpy
(``merge_asof``, diff/cumsum sessionization, partial top-k) — no Python
loops over rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.frames import round_away, typed_out
from ..functions.shuffle import add_bucket_column, bucketed_combine

EVENTS_COLS = ["ts", "user_id", "event_type", "value"]


def _events(sf_dir: str, columns=None, event_types=None):
    """events reader; ``event_types`` pushes an IN-list predicate into the
    parquet scan (row groups whose stats exclude every wanted type are never
    read, and no downstream batch filter stage is needed)."""
    import pyarrow.dataset as pads

    flt = pads.field("event_type").isin(list(event_types)) \
        if event_types else None
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=columns or EVENTS_COLS,
        filter=flt,
    )


# ---------------------------------------------------------------------------
# filter pushdown: predicate applied at the parquet read
# ---------------------------------------------------------------------------

def events_high_value_errors(sf_dir: str, min_value: float = 90.0) -> pd.DataFrame:
    """Error events above a value threshold, with the predicate pushed into
    the parquet scan (row groups whose min/max stats exclude the range are
    never read) — the read-level pruning posture the 100 TB deployment
    needs. Returns (event_id, user_id, value) sorted by event_id."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(pads.field("event_type") == "error")
        & (pads.field("value") >= min_value),
    )
    out = ds.to_pandas()
    if out.empty:
        return typed_out(out, {"event_id": "int64", "user_id": "int64",
                               "value": "float64"})
    out = out[["event_id", "user_id", "value"]]
    out["value"] = round_away(out.value, 6)
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_HIGH_VALUE_ERRORS_SQL = """
SELECT event_id, user_id, ROUND(value, 6) AS value
FROM events
WHERE event_type = 'error' AND value >= 90.0
ORDER BY event_id
"""


def events_user_anomalies(sf_dir: str, n_sigma: float = 3.0) -> pd.DataFrame:
    """Per-user outlier profile: how many of each user's events sit more
    than ``n_sigma`` population standard deviations from that user's own
    mean value — the fraud/telemetry-QC staple (a per-entity z-score needs
    TWO passes over grouped data, which is exactly what makes it a good
    distributed-plan exercise).

    Plan: (1) mergeable per-user moments (n, sum, sum-of-squares) via a
    user-bucketed combine; (2) a user-keyed bucketed join flags each event
    against its user's mean/std and pre-aggregates in-bucket. Events and
    moments co-partition on the same key, so pass 2 reshuffles only the
    (user, n, sum, sumsq) stats stream. STRICT ``>`` keeps single-event
    users (std = 0) non-anomalous on both sides. ``value`` is a dense
    (non-NULL) column in this schema — the moments do not NaN-guard.
    Determinism: the moments accumulate in EXACT INTEGER CENTS (value is
    cent-precision by schema; sums and sums-of-squares stay < 2^53), so
    mean and std are bit-identical to the oracle's regardless of
    summation order — float sums drifted onto round-half-at-6dp ties at
    sf0.1 (means like 49.5071875 with n = 64)."""
    from ..functions.shuffle import bucketed_combine, bucketed_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    out_schema = {"user_id": "int64", "n_events": "int64",
                  "mean_value": "float64", "std_value": "float64",
                  "n_anomalies": "int64"}

    def mom_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        g = df.assign(c=c, c2=c * c).groupby("user_id", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), s2=("c2", "sum"))
        g["n"] = g.n.astype("int64")
        return g

    def mom_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))

    stats = bucketed_combine(ds, "user_id", mom_partial, mom_combine,
                             num_buckets=16, coalesce_blocks=4)

    def flag(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="user_id")
        if m.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_schema.items()})
        n = m.n.to_numpy(np.float64)
        sc = m.s.to_numpy(np.float64)    # exact integer cents
        sc2 = m.s2.to_numpy(np.float64)  # exact integer cents^2
        mean = (sc / n) / 100.0
        var = np.maximum(sc2 / n - (sc / n) * (sc / n), 0.0) / 10000.0
        std = np.sqrt(var)
        anom = (np.abs(m["value"].to_numpy(np.float64) - mean)
                > n_sigma * std)
        out = pd.DataFrame({"user_id": m.user_id.to_numpy(np.int64),
                            "n_events": m.n.to_numpy(np.int64),
                            "mean_value": mean, "std_value": std,
                            "anom": anom.astype(np.int64)})
        agg = out.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "first"), mean_value=("mean_value", "first"),
            std_value=("std_value", "first"), n_anomalies=("anom", "sum"))
        return agg

    out = bucketed_join(
        ds, stats, "user_id", "user_id", flag,
        num_buckets=16,
        left_dtypes={"user_id": "int64", "value": "float64"},
        right_dtypes={"user_id": "int64", "n": "int64",
                      "s": "int64", "s2": "int64"},
        coalesce_blocks=8,
    ).to_pandas()
    if out.empty:
        return typed_out(out, out_schema)
    out["mean_value"] = round_away(out.mean_value, 6)
    out["std_value"] = round_away(out.std_value, 6)
    return typed_out(out, out_schema, sort_by="user_id")


EVENTS_USER_ANOMALIES_SQL = """
WITH cts AS (
  -- exact integer cents (value is cent-precision by schema): mean/std
  -- derive from order-independent integer sums, bit-identical to the
  -- engine's fold
  SELECT user_id, value, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n_events,
         (CAST(SUM(c) AS DOUBLE) / COUNT(*)) / 100.0 AS mean_value,
         SQRT(GREATEST(CAST(SUM(c * c) AS DOUBLE) / COUNT(*)
                       - (CAST(SUM(c) AS DOUBLE) / COUNT(*))
                         * (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 0)
              / 10000.0) AS std_value
  FROM cts GROUP BY user_id
)
SELECT e.user_id,
       CAST(MAX(s.n_events) AS BIGINT) AS n_events,
       ROUND(MAX(s.mean_value), 6) AS mean_value,
       ROUND(MAX(s.std_value), 6) AS std_value,
       CAST(SUM(CASE WHEN ABS(e.value - s.mean_value) > 3.0 * s.std_value
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM events e JOIN s USING (user_id)
GROUP BY e.user_id
ORDER BY e.user_id
"""


# ---------------------------------------------------------------------------
# as-of join: each purchase joined to the user's latest prior-or-equal click
# ---------------------------------------------------------------------------

def events_asof_purchase_click(sf_dir: str) -> pd.DataFrame:
    """For every purchase event, the most recent click of the same user with
    click.ts <= purchase.ts (classic as-of join). Both sides co-partition by
    ``hash(user_id) % B``, and each bucket runs one vectorized
    ``pd.merge_asof`` (sort by ts, by=user_id).

    Output: (user_id, purchase_ts, click_ts, gap_s) sorted by user/ts;
    purchases with no prior click keep a null click_ts.
    """
    ds = _events(sf_dir, ["ts", "user_id", "event_type"],
                 event_types=("purchase", "click"))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(df, ["user_id"], 32)

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable")
        left = g[g.event_type == "purchase"][["ts", "user_id"]]
        right = g[g.event_type == "click"][["ts", "user_id"]].rename(
            columns={"ts": "click_ts"}
        )
        if len(left) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "purchase_ts": pd.Series(dtype="datetime64[us]"),
                "click_ts": pd.Series(dtype="datetime64[us]"),
                "gap_s": pd.Series(dtype="float64"),
            })
        m = pd.merge_asof(
            left, right, left_on="ts", right_on="click_ts",
            by="user_id", direction="backward",
        )
        out = pd.DataFrame(
            {
                "user_id": m.user_id.astype("int64"),
                "purchase_ts": m.ts,
                "click_ts": m.click_ts,
                "gap_s": round_away((m.ts - m.click_ts).dt.total_seconds(), 6),
            }
        )
        return out

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: asof_bucket(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    return typed_out(out, {"user_id": "int64",
                           "purchase_ts": "datetime64[us]",
                           "click_ts": "datetime64[us]",
                           "gap_s": "float64"},
                     sort_by=["user_id", "purchase_ts"])


EVENTS_ASOF_SQL = """
SELECT p.user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       ROUND(EXTRACT(EPOCH FROM (p.ts - c.ts)), 6) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, purchase_ts
"""


# ---------------------------------------------------------------------------
# range join: clicks inside a bounded interval before each purchase
# ---------------------------------------------------------------------------

def events_clicks_before_purchase(sf_dir: str, window_s: int = 3600) -> pd.DataFrame:
    """For every purchase, the number of the same user's clicks in the
    window ``[ts - window_s, ts)`` — an interval/range join, the join class
    between equality (hash) and as-of (one nearest match): each left row
    matches a RANGE of right rows.

    The naive plan (join then filter) is quadratic per hot user. Instead
    each user-hash bucket computes per-user prefix counts of clicks
    (cumcount, vectorized) and answers each purchase with a difference of
    two ``merge_asof`` probes: ``C(ts - 1us) - C(ts - window - 1us)``,
    where C(x) = clicks with click_ts <= x. Timestamps are integral
    microseconds, so the 1-us shift makes both window edges exact
    (left-closed, right-open). Everything in the bucket is one sort plus
    two vectorized asof merges — no per-user loop, and a hot user costs
    O(its rows), not O(rows^2)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"],
                 event_types=("purchase", "click"))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(df, ["user_id"], 32)

    out_schema = {"event_id": "int64", "user_id": "int64",
                  "purchase_ts": "datetime64[us]", "n_clicks_1h": "int64"}

    def range_bucket(g: pd.DataFrame) -> pd.DataFrame:
        purch = g[g.event_type == "purchase"]
        if len(purch) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=dt) for c, dt in out_schema.items()})
        clicks = (
            g[g.event_type == "click"][["user_id", "ts"]]
            .sort_values(["ts", "user_id"], kind="stable")
        )
        # per-user running click count AFTER this click (1-based)
        clicks["cum"] = clicks.groupby("user_id").cumcount() + 1

        def prefix_count(at: pd.Series, base: pd.DataFrame) -> np.ndarray:
            probe = pd.DataFrame({
                "user_id": base.user_id.to_numpy(),
                # Timedelta arithmetic upcasts to ns; merge_asof needs both
                # sides at the table's native us resolution (values are
                # integral us, so the cast is lossless)
                "at": at.to_numpy().astype("datetime64[us]"),
            }).sort_values(["at", "user_id"], kind="stable")
            m = pd.merge_asof(probe, clicks, left_on="at", right_on="ts",
                              by="user_id", direction="backward")
            # un-sort back to base order
            c = pd.Series(m["cum"].fillna(0).to_numpy(np.int64),
                          index=probe.index)
            return c.sort_index().to_numpy()

        one_us = pd.Timedelta(microseconds=1)
        win = pd.Timedelta(seconds=window_s)
        purch = purch.reset_index(drop=True)
        hi = prefix_count(purch.ts - one_us, purch)
        lo = prefix_count(purch.ts - win - one_us, purch)
        return pd.DataFrame({
            "event_id": purch.event_id.astype("int64"),
            "user_id": purch.user_id.astype("int64"),
            "purchase_ts": purch.ts,
            "n_clicks_1h": (hi - lo).astype("int64"),
        })

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: range_bucket(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    return typed_out(out, {"event_id": "int64", "user_id": "int64",
                           "purchase_ts": "datetime64[us]",
                           "n_clicks_1h": "int64"},
                     sort_by=["event_id"])


EVENTS_RANGE_JOIN_SQL = """
SELECT p.event_id,
       p.user_id,
       p.ts AS purchase_ts,
       CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_1h
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts < p.ts
 AND c.ts >= p.ts - INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# sequential funnel: view -> click -> purchase, in time order per user
# ---------------------------------------------------------------------------

def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Time-ordered conversion funnel: users with a view, users with a
    click AFTER their first view, users with a purchase AFTER that first
    qualifying click — the product-analytics staple that needs event
    SEQUENCE, not mere co-occurrence (a purchase before any view must not
    count).

    Each user's full event history lands in one user-hash bucket, where
    the three stages are chained vectorized groupby-mins (t1 = min view
    ts; t2 = min click ts > t1; t3 = min purchase ts > t2) — no per-user
    loop, no self-join. Buckets emit 3 counter rows each; the driver sums
    ``buckets x 3`` rows however many users exist."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"],
                 event_types=("view", "click", "purchase"))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(df, ["user_id"], 32)

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        views = g[g.event_type == "view"]
        t1 = (views.groupby("user_id", as_index=False)["ts"].min()
              .rename(columns={"ts": "t1"}))

        clicks = g[g.event_type == "click"].merge(t1, on="user_id")
        clicks = clicks[clicks.ts > clicks.t1]
        t2 = (clicks.groupby("user_id", as_index=False)["ts"].min()
              .rename(columns={"ts": "t2"}))

        purch = g[g.event_type == "purchase"].merge(t2, on="user_id")
        purch = purch[purch.ts > purch.t2]
        t3 = purch.groupby("user_id", as_index=False)["ts"].min()

        return pd.DataFrame({
            "stage": ["stage1_view", "stage2_click", "stage3_purchase"],
            "n_users": np.array([len(t1), len(t2), len(t3)], dtype=np.int64),
        })

    parts = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: funnel_bucket(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        parts = pd.DataFrame({
            "stage": ["stage1_view", "stage2_click", "stage3_purchase"],
            "n_users": np.zeros(3, dtype=np.int64),
        })
    out = parts.groupby("stage", as_index=False).agg(n_users=("n_users", "sum"))
    out["n_users"] = out["n_users"].astype("int64")
    return typed_out(out, {"stage": "object", "n_users": "int64"},
                     sort_by="stage")


def events_path_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov transition counts between consecutive event types per user —
    the behavioral-path matrix behind funnel discovery and session-flow
    dashboards (which step follows which, corpus-wide).

    Plan: one user-bucketed exchange of (user, ts, event_id, type) rows —
    all of a user's events co-locate, so each bucket sorts its users'
    streams once (ts, event_id tiebreak exactly like the oracle's window
    ORDER BY) and forms consecutive pairs with a vectorized shift-compare;
    the (from_type, to_type) count matrix is bounded by n_types^2, so the
    driver merge is constant-size at any corpus scale."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(object)
        if len(g) < 2:
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        same = u[1:] == u[:-1]
        t = (pd.DataFrame({"from_type": et[:-1][same],
                           "to_type": et[1:][same]})
             .groupby(["from_type", "to_type"], as_index=False).size()
             .rename(columns={"size": "n"}))
        t["n"] = t.n.astype("int64")
        return t

    out = bucketed_combine(ds, "user_id", lambda df: df, combine,
                           num_buckets=16, coalesce_blocks=8).to_pandas()
    if out.empty:
        return typed_out(out, {"from_type": "object", "to_type": "object",
                               "n": "int64"})
    out = out.groupby(["from_type", "to_type"], as_index=False).agg(
        n=("n", "sum"))
    out["n"] = out.n.astype("int64")
    return (out.sort_values(["from_type", "to_type"])
            .reset_index(drop=True))


EVENTS_PATH_TRANSITIONS_SQL = """
WITH o AS (
  SELECT event_type,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM o
WHERE prev IS NOT NULL
GROUP BY 1, 2
ORDER BY from_type, to_type
"""


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'stage1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'stage2_click', CAST(COUNT(*) AS BIGINT) FROM c
UNION ALL
SELECT 'stage3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# sliding windows: 1 h windows sliding every 30 min
# ---------------------------------------------------------------------------

def events_sliding_hourly(sf_dir: str) -> pd.DataFrame:
    """Event counts + value sums per (1 h window starting every 30 min,
    event_type). Each event is exploded to its two covering windows inside
    ``map_batches`` (vectorized), then bucketed-combined — the streaming
    sliding-window as a batch explode + partial aggregation."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        half = df["ts"].dt.floor("30min")
        w = pd.concat([half, half - pd.Timedelta(minutes=30)], ignore_index=True)
        et = pd.concat([df["event_type"], df["event_type"]], ignore_index=True)
        v = pd.concat([df["value"], df["value"]], ignore_index=True)
        x = pd.DataFrame({"window_start": w, "event_type": et, "value": v})
        return x.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )

    out = bucketed_combine(
        ds, ["window_start", "event_type"], partial, combine
    ).to_pandas()
    if out.empty:
        return typed_out(out, {"window_start": "datetime64[us]",
                               "event_type": "object", "n_events": "int64",
                               "sum_value": "float64"})
    out["sum_value"] = round_away(out.sum_value, 2)
    out["n_events"] = out.n_events.astype("int64")
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


EVENTS_SLIDING_SQL = """
WITH exploded AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type, value
  FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM exploded
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# session windows: per-user sessions split at 30 min inactivity gaps
# ---------------------------------------------------------------------------

def events_user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization: a user's events belong to one session while
    consecutive gaps are <= 30 min. Output one row per session:
    (user_id, session_start, session_end, n_events, duration_s).

    Bucketed by user hash; inside a bucket the session ids come from a
    vectorized sort + diff + cumsum over ALL the bucket's users at once.
    """
    ds = _events(sf_dir, ["ts", "user_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(df, ["user_id"], 32)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        new_user = g.user_id.ne(g.user_id.shift())
        big_gap = g.ts.diff() > gap
        sid = (new_user | big_gap).cumsum()
        agg = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "first"),
            session_end=("ts", "last"),
            n_events=("ts", "size"),
        )
        agg["duration_s"] = (
            round_away((agg.session_end - agg.session_start).dt.total_seconds(), 6)
        )
        return agg.reset_index(drop=True)

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: sessions(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return typed_out(out, {"user_id": "int64",
                               "session_start": "datetime64[us]",
                               "session_end": "datetime64[us]",
                               "n_events": "int64", "duration_s": "float64"})
    out["n_events"] = out.n_events.astype("int64")
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)


EVENTS_SESSIONS_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessioned AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       ROUND(EXTRACT(EPOCH FROM (MAX(ts) - MIN(ts))), 6) AS duration_s
FROM sessioned
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# distinct counts: exact (pair-dedup) and approximate (HLL sketch)
# ---------------------------------------------------------------------------

def events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT user_id) per event_type. Per-batch pair dedup
    shrinks the stream to unique (event_type, user_id) pairs; each pair
    lands in exactly one user-hash bucket, so the per-bucket dedup+count is
    exact and the driver only sums tiny per-bucket partials."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(partial(df), ["user_id"], 32)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["event_type", "user_id"])
        return u.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size")
        )

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: count_bucket(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return typed_out(out, {"event_type": "object", "n_users": "int64"})
    out = out.groupby("event_type", as_index=False).agg(n_users=("n_users", "sum"))
    out["n_users"] = out.n_users.astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_distinct_users_hll(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Approximate distinct users per event_type via a HyperLogLog sketch
    (2^p registers). Each batch emits one mergeable sketch per event_type;
    register-wise max merges them — the canonical mergeable-sketch
    aggregation (no oracle: approximate by design; accuracy pinned in
    tests against the exact operator)."""
    ds = _events(sf_dir, ["user_id", "event_type"])
    m = 1 << p

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        out_t, out_r = [], []
        for et, g in df.groupby("event_type"):
            import pandas as pd_util  # noqa: F401
            h = pd.util.hash_array(g.user_id.to_numpy()).astype(np.uint64)
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            w = h & np.uint64((1 << (64 - p)) - 1)  # low 64-p bits
            # rank = 1 + leading zeros of w within its (64-p)-bit field
            #      = (64-p) - floor(log2(w))  for w > 0;  64-p+1 for w == 0
            wf = w.astype(np.float64)
            rank = np.where(
                w == 0,
                64 - p + 1,
                (64 - p) - np.floor(np.log2(np.clip(wf, 1, None))).astype(np.int64),
            )
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, idx, rank.astype(np.int8))
            out_t.append(et)
            out_r.append(regs)
        return pd.DataFrame({"event_type": out_t, "regs": out_r})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce(np.stack(g["regs"].values))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "n_users_approx": [int(round(est))]}
        )

    out = (
        ds.map_batches(sketch, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return typed_out(out, {"event_type": "object", "n_users_approx": "int64"},
                     sort_by="event_type")


# ---------------------------------------------------------------------------
# per-group top-k (window-function analog)
# ---------------------------------------------------------------------------

def orders_topk_by_priority(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k orders by totalprice within each order priority (ROW_NUMBER()
    window analog). Partial top-k per batch (nlargest on each batch) shrinks
    the stream to k rows per (priority, batch); the final per-priority top-k
    runs on that residue."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["o_totalprice", "o_orderkey"], ascending=[False, True]
            )
            .groupby("o_orderpriority", as_index=False)
            .head(k)
        )

    out = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    if out.empty:
        return typed_out(out, {"o_orderpriority": "object", "rank": "int64",
                               "o_orderkey": "int64",
                               "o_totalprice": "float64"})
    out = (
        out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .groupby("o_orderpriority", as_index=False)
        .head(k)
    )
    out = out.sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    ).reset_index(drop=True)
    out["rank"] = out.groupby("o_orderpriority").cumcount() + 1
    return out[["o_orderpriority", "rank", "o_orderkey", "o_totalprice"]]


ORDERS_TOPK_SQL = """
SELECT o_orderpriority, rank, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rank
  FROM orders
)
WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""


def events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention: users grouped by their first-active day; for each
    (cohort_day, day_offset) the count of cohort users active that day —
    the standard product-analytics matrix, here as a two-level distributed
    plan with no self-join: per-batch distinct (user, day) pairs shrink the
    stream, one bucketed exchange on user_id computes each user's cohort
    and emits its (cohort, offset) pairs, and the final count is a groupby
    whose cardinality is bounded by days^2, not users."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "day": df["ts"].dt.floor("D"),
        })
        return out.drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id")["day"].transform("min")
        offs = (g["day"] - cohort).dt.days
        pairs = pd.DataFrame({"cohort_day": cohort, "day_offset": offs})
        c = pairs.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return c.rename(columns={"size": "n_users"})

    parts = bucketed_combine(ds, "user_id", partial, combine,
                             num_buckets=16, coalesce_blocks=8)
    out = (
        parts.groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    if out.empty:
        return typed_out(out, {"cohort_day": "object", "day_offset": "int64",
                               "n_users": "int64"})
    out["cohort_day"] = pd.to_datetime(out["cohort_day"]).dt.strftime("%Y-%m-%d")
    out["day_offset"] = out["day_offset"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)


EVENTS_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), c AS (
  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id
)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', c.cohort, ud.day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_decayed_value(sf_dir: str, tau_days: float = 7.0,
                         ref_ts: str = "2024-02-01") -> pd.DataFrame:
    """Time-decayed value aggregate — the recency-weighted statistic of a
    feature store: SUM(value * exp(-(T_ref - ts)/tau)) per event_type, with
    a FIXED reference instant so the weight is a pure per-row function and
    the aggregate stays algebraic/mergeable (one weighted partial per
    (type, batch) on the wire, |types| rows out; no second pass to find
    max(ts), no order sensitivity). The float formula mirrors the oracle's
    expression; the bounded partial stream reduces after a sort (q1
    pattern)."""
    from ..functions.frames import round_away, typed_out

    ds = _events(sf_dir, ["ts", "event_type", "value"])
    ref = pd.Timestamp(ref_ts)
    tau_s = tau_days * 86400.0

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        age_s = (ref - df["ts"]).dt.total_seconds().to_numpy(np.float64)
        w = np.exp(-age_s / tau_s)
        return (df.assign(wv=df["value"].to_numpy(np.float64) * w, w=w)
                .groupby("event_type", as_index=False)
                .agg(decayed_value=("wv", "sum"),
                     decayed_weight=("w", "sum"),
                     n_events=("w", "size")))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return typed_out(parts, {"event_type": "object", "n_events": "int64",
                                 "decayed_value": "float64",
                                 "decayed_weight": "float64"})
    parts = parts.sort_values(list(parts.columns), kind="stable")
    out = parts.groupby("event_type", as_index=False).agg(
        decayed_value=("decayed_value", "sum"),
        decayed_weight=("decayed_weight", "sum"),
        n_events=("n_events", "sum"))
    out["decayed_value"] = round_away(out.decayed_value, 4)
    out["decayed_weight"] = round_away(out.decayed_weight, 4)
    out["n_events"] = out.n_events.astype("int64")
    return (out[["event_type", "n_events", "decayed_value", "decayed_weight"]]
            .sort_values("event_type").reset_index(drop=True))


EVENTS_DECAYED_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value * exp(-(EXTRACT(epoch FROM (TIMESTAMP '2024-02-01'
                 - ts))) / (7.0 * 86400.0))), 4) AS decayed_value,
       ROUND(SUM(exp(-(EXTRACT(epoch FROM (TIMESTAMP '2024-02-01'
                 - ts))) / (7.0 * 86400.0))), 4) AS decayed_weight
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_hourly_active_users(sf_dir: str) -> pd.DataFrame:
    """Exact distinct active users per clock hour — the windowed variant of
    ``events_distinct_users`` (DAU/HAU dashboards; capacity planning). The
    stream shrinks to unique (hour, user) pairs per batch, each pair lands
    in exactly one user-hash bucket, so the per-bucket dedup+count is
    exact and the driver sums bounded (hours x buckets) partials."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({
            "window_h": (df["ts"].astype("int64")
                         // 3_600_000_000).astype("int64"),
            "user_id": df["user_id"].to_numpy(np.int64),
        }).drop_duplicates()
        return add_bucket_column(p, ["user_id"], 32)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["window_h", "user_id"])
        return u.groupby("window_h", as_index=False).agg(
            n_users=("user_id", "size"))

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: count_bucket(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return typed_out(out, {"window_h": "int64", "n_users": "int64"})
    out = out.groupby("window_h", as_index=False).agg(
        n_users=("n_users", "sum"))
    out["n_users"] = out.n_users.astype("int64")
    out["window_h"] = out.window_h.astype("int64")
    return out.sort_values("window_h").reset_index(drop=True)


EVENTS_HOURLY_ACTIVE_SQL = """
SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS window_h,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
ORDER BY window_h
"""


def events_inter_arrival_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-arrival profile: number of gaps, mean and max gap in
    seconds between consecutive events — the burstiness signal behind bot
    detection and session-gap calibration (events_user_sessions' 30-min
    threshold is normally derived from exactly this distribution).

    Same plan shape as ``events_path_transitions``: one user-bucketed
    exchange co-locates each user's stream; the bucket sorts once
    (ts, event_id — the oracle's window order) and gap statistics come
    from one vectorized diff per bucket. Output is one row per user with
    >= 2 events, exactly like the oracle's HAVING."""
    from ..functions.frames import round_away
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "n_gaps": pd.Series(dtype="int64"),
                              "mean_gap_s": pd.Series(dtype="float64"),
                              "max_gap_s": pd.Series(dtype="float64")})
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()  # microseconds
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        gaps = (ts[1:] - ts[:-1])[same] / 1_000_000.0
        d = pd.DataFrame({"user_id": u[1:][same], "gap": gaps})
        out = d.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"), sum_gap=("gap", "sum"),
            max_gap_s=("gap", "max"))
        out["mean_gap_s"] = round_away(
            out.pop("sum_gap").to_numpy() / out["n_gaps"].to_numpy(), 4)
        out["max_gap_s"] = round_away(out["max_gap_s"], 4)
        out["n_gaps"] = out.n_gaps.astype("int64")
        return out[["user_id", "n_gaps", "mean_gap_s", "max_gap_s"]]

    out = bucketed_combine(ds, "user_id", lambda df: df, combine,
                           num_buckets=16, coalesce_blocks=8).to_pandas()
    schema = {"user_id": "int64", "n_gaps": "int64",
              "mean_gap_s": "float64", "max_gap_s": "float64"}
    if out.empty:
        return typed_out(out, schema)
    return typed_out(out, schema, sort_by="user_id")


EVENTS_INTER_ARRIVAL_SQL = """
WITH g AS (
  -- exact integer microsecond difference, THEN one float division: the
  -- engine computes (ts_us[i] - ts_us[i-1]) / 1e6, and EPOCH()'s double
  -- seconds (~1.7e9, resolution ~2e-7 s) would diverge at ROUND(,4)
  -- boundaries
  SELECT user_id,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0 AS gap
  FROM events
)
SELECT user_id,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       ROUND(SUM(gap) / COUNT(gap), 4) AS mean_gap_s,
       ROUND(MAX(gap), 4) AS max_gap_s
FROM g
WHERE gap IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


def events_seasonality_profile(sf_dir: str) -> pd.DataFrame:
    """Day-of-week x hour-of-day activity profile — the calendar
    seasonality matrix behind traffic forecasting / crawl-rate shaping
    (load follows a weekly clock; this is its empirical shape).

    One streaming ``map_batches`` of per-batch (dow, hour) partials; the
    merged state is at most 7 x 24 cells — schema-bounded, NOT
    data-bounded — so the driver fold is O(1) and nothing shuffles at any
    scale (the same shape as ``corpus_lang_source_contingency``).

    dow follows the SQL convention (EXTRACT(dow): Sunday = 0), mapped
    from pandas' Monday=0 ``dayofweek`` vectorized."""
    ds = _events(sf_dir, ["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"]
        return pd.DataFrame({
            "dow": ((ts.dt.dayofweek.to_numpy(np.int64) + 1) % 7),
            "hour": ts.dt.hour.to_numpy(np.int64),
            "n_events": np.int64(1),
            "sum_value": df["value"].to_numpy(np.float64),
        }).groupby(["dow", "hour"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"dow": "int64", "hour": "int64", "n_events": "int64",
              "sum_value": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    out = parts.groupby(["dow", "hour"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
    out["sum_value"] = round_away(out["sum_value"], 2)
    return typed_out(out, schema, sort_by=["dow", "hour"])


EVENTS_SEASONALITY_PROFILE_SQL = """
SELECT CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY dow, hour
"""


def events_user_cumulative_value(sf_dir: str) -> pd.DataFrame:
    """Per-user RUNNING TOTAL of event value in event-time order — the
    ordered-window cumulative (SUM OVER PARTITION BY ... ORDER BY ...),
    the one window shape the family still lacked (tumbling/sliding/
    session/rolling/rank/asof/decayed all exist).

    Determinism note: DuckDB evaluates window SUM with a segment tree, so
    its float running totals differ from a sequential fold by ~1e-12 —
    enough to flip a 6dp rounding boundary once per ~10^6 rows. The
    statistic is therefore computed in integer CENTS (value rounded
    half-away to 2dp, scaled): integer cumulative sums are associative,
    so ANY aggregation tree gives the bit-identical answer on both sides.

    Plan: rows project to fixed-width (user, ts, event_id, cents) at the
    scan; the user-bucketed exchange sorts each bucket once by
    (user, ts, event_id) and cumsums per user vectorized — a key's whole
    history co-locates, the holistic-window requirement."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "ts": df["ts"],
            "user_id": df["user_id"].to_numpy(np.int64),
            "cents": round_away(df["value"].to_numpy(np.float64) * 100.0,
                                0).astype(np.int64),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["user_id", "ts", "event_id"])
        return pd.DataFrame({
            "event_id": s["event_id"].to_numpy(np.int64),
            "user_id": s["user_id"].to_numpy(np.int64),
            "cum_value_cents": s.groupby("user_id")["cents"].cumsum()
                                .to_numpy(np.int64),
        })

    out = bucketed_combine(ds, "user_id", partial, combine,
                           num_buckets=32, coalesce_blocks=8).to_pandas()
    return typed_out(out, {"event_id": "int64", "user_id": "int64",
                           "cum_value_cents": "int64"}, sort_by="event_id")


EVENTS_USER_CUMULATIVE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_value_cents
FROM events
ORDER BY event_id
"""


def events_new_users_by_hour(sf_dir: str) -> pd.DataFrame:
    """Acquisition cohorts: how many users saw their FIRST-ever event in
    each clock hour — the new-user curve every growth dashboard plots next
    to events_hourly_active_users' HAU.

    First-seen is MIN(ts) per user, a textbook two-level min: each batch
    pre-reduces to one (user, min_ts) row, a user-hash bucket finishes the
    exact min (all of a user's partials co-locate), and the same bucket
    immediately collapses its users to a per-hour count — the driver merge
    is bounded by hours x buckets, never by users."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def first_seen_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            first_ts=("ts", "min"))

    def hour_counts(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id", as_index=False).agg(
            first_ts=("first_ts", "min"))
        h = (f["first_ts"].astype("int64")
             // 3_600_000_000).astype("int64")
        out = pd.DataFrame({"window_h": h}).groupby(
            "window_h", as_index=False).size()
        out["new_users"] = out.pop("size").astype("int64")
        return out

    out = bucketed_combine(ds, "user_id", first_seen_partial, hour_counts,
                           num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"window_h": "int64", "new_users": "int64"}
    if out.empty:
        return typed_out(out, schema)
    out = out.groupby("window_h", as_index=False).agg(
        new_users=("new_users", "sum"))
    out["new_users"] = out.new_users.astype("int64")
    out["window_h"] = out.window_h.astype("int64")
    return typed_out(out, schema, sort_by="window_h")


EVENTS_NEW_USERS_BY_HOUR_SQL = """
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT CAST(FLOOR(EPOCH(first_ts) / 3600) AS BIGINT) AS window_h,
       CAST(COUNT(*) AS BIGINT) AS new_users
FROM f
GROUP BY 1
ORDER BY window_h
"""


def events_props_k_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured property extraction: parse the integer ``k`` field
    out of the JSON ``props`` column and profile it per event type — the
    log-enrichment staple (every clickstream warehouse starts by lifting
    typed fields out of a JSON blob).

    The parse is a vectorized Arrow regex (``pc.extract_regex`` over the
    UTF-8 buffer — no json.loads per row, no Python loop); rows whose
    props lack a parsable k are counted, not dropped. Per-type (n, n_k,
    sum_k, min_k, max_k) partials are schema-bounded (5 event types), so
    the driver fold is constant-size and integer-exact."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def partial(t) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        et = t.column("event_type").to_pandas().to_numpy(object)
        props = pc.coalesce(t.column("props"), "")
        ext = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        has = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        kvals = np.zeros(len(t), dtype=np.int64)
        if has.any():
            kints = pc.fill_null(
                pc.struct_field(ext, 0).cast(pa.int64()), 0)
            kvals = kints.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "has": has, "k": kvals})
        g = df.groupby("event_type")
        out = pd.DataFrame({
            "event_type": np.array(list(g.groups), dtype=object),
            "n": g.size().to_numpy(np.int64),
            "n_k": g["has"].sum().to_numpy(np.int64),
        })
        kk = df[df.has]
        if kk.empty:
            out["sum_k"] = np.int64(0)
            out["min_k"] = np.int64(np.iinfo(np.int64).max)
            out["max_k"] = np.int64(np.iinfo(np.int64).min)
        else:
            kg = kk.groupby("event_type")["k"]
            out = out.merge(
                pd.DataFrame({"event_type": np.array(list(kg.groups),
                                                     dtype=object),
                              "sum_k": kg.sum().to_numpy(np.int64),
                              "min_k": kg.min().to_numpy(np.int64),
                              "max_k": kg.max().to_numpy(np.int64)}),
                on="event_type", how="left")
            out["sum_k"] = out.sum_k.fillna(0).astype("int64")
            out["min_k"] = out.min_k.fillna(np.iinfo(np.int64).max
                                            ).astype("int64")
            out["max_k"] = out.max_k.fillna(np.iinfo(np.int64).min
                                            ).astype("int64")
        return out

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    schema = {"event_type": "object", "n": "int64", "n_k": "int64",
              "sum_k": "int64", "min_k": "int64", "max_k": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), n_k=("n_k", "sum"), sum_k=("sum_k", "sum"),
        min_k=("min_k", "min"), max_k=("max_k", "max"))
    # types with zero parsable k keep NULL min/max like the oracle
    none_k = out.n_k.to_numpy() == 0
    out["min_k"] = out.min_k.astype("float64")
    out["max_k"] = out.max_k.astype("float64")
    out.loc[none_k, ["min_k", "max_k"]] = np.nan
    for c in ("n", "n_k", "sum_k"):
        out[c] = out[c].astype("int64")
    return typed_out(out, {**schema, "min_k": "float64",
                           "max_k": "float64"}, sort_by="event_type")


EVENTS_PROPS_K_STATS_SQL = """
WITH x AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(COALESCE(props, ''), '$.k')
                  AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_k,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS DOUBLE) AS min_k,
       CAST(MAX(k) AS DOUBLE) AS max_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


def events_late_arrivals(sf_dir: str,
                         lateness_us: int = 300_000_000) -> pd.DataFrame:
    """Watermark / late-data profile: how many events arrive AFTER the
    running event-time watermark has already passed them by more than the
    allowed lateness — the number that sizes every streaming job's state
    retention. Arrival order is a closed-form hash permutation of
    event_id (odd-multiplier bijection mod 2^32 — the committed corpus is
    ts-sorted by event_id, so a simulated shuffled delivery is what makes
    the statistic non-degenerate; the oracle reproduces the same order).

    This is the catalog's GLOBAL ORDERED PREFIX-SCAN: a running max over
    one total order, distributed as the textbook two-pass scan — pass 1
    folds a per-arrival-range max(ts) partial (bounded: ranges x blocks
    rows), the driver takes the EXCLUSIVE prefix max over the 32 ranges,
    and pass 2 is one range-bucketed exchange where each bucket sorts its
    own slice, seeds the in-range exclusive running max with its prefix,
    and emits bounded per-type counters. No global sort of the data."""
    MULT = np.uint64(2654435761)
    MASK = np.uint64(0xFFFFFFFF)
    N_RANGES = 32
    SHIFT = np.uint64(27)  # 2^32 / 32 ranges

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "ts"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        arr = ((df.event_id.to_numpy(np.int64).astype(np.uint64) * MULT)
               & MASK)
        return pd.DataFrame({
            "arr": arr.astype(np.int64),
            "rid": (arr >> SHIFT).astype(np.int64),
            "event_type": df.event_type.to_numpy(object),
            "ts_us": df.ts.astype("int64").to_numpy(),
        })

    tagged = ds.map_batches(tag, batch_format="pandas")

    # pass 1: per-range max event time (bounded partials, integer max)
    p1 = tagged.map_batches(
        lambda df: df.groupby("rid", as_index=False).agg(
            mx=("ts_us", "max")),
        batch_format="pandas",
    ).to_pandas()
    schema = {"event_type": "object", "n": "int64", "n_late": "int64",
              "max_lateness_us": "int64"}
    if p1.empty:
        return typed_out(pd.DataFrame(), schema)
    range_max = np.full(N_RANGES, np.iinfo(np.int64).min, dtype=np.int64)
    g = p1.groupby("rid").mx.max()
    range_max[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    # exclusive prefix max: watermark entering each range
    prefix = np.full(N_RANGES, np.iinfo(np.int64).min, dtype=np.int64)
    prefix[1:] = np.maximum.accumulate(range_max)[:-1]
    prefix_list = prefix.tolist()  # broadcast via closure (32 ints)

    def scan_range(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values("arr", kind="stable")
        ts = grp.ts_us.to_numpy(np.int64)
        seed = prefix_list[int(grp.rid.iloc[0])]
        run = np.maximum.accumulate(ts)
        wm = np.empty_like(run)  # exclusive running max, seeded
        wm[0] = seed
        wm[1:] = np.maximum(run[:-1], seed)
        has_wm = wm != np.iinfo(np.int64).min
        late = wm - ts
        out = pd.DataFrame({
            "event_type": grp.event_type.to_numpy(object),
            "n": np.int64(1),
            "is_late": (has_wm & (late > lateness_us)).astype(np.int64),
            "lateness": np.where(has_wm, late, np.iinfo(np.int64).min),
        })
        return out.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_late=("is_late", "sum"),
            max_lateness_us=("lateness", "max"))

    out = (
        tagged.groupby("rid")
        .map_groups(scan_range, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), n_late=("n_late", "sum"),
        max_lateness_us=("max_lateness_us", "max"))
    none = out.max_lateness_us.to_numpy() == np.iinfo(np.int64).min
    out.loc[none, "max_lateness_us"] = 0
    for c in ("n", "n_late", "max_lateness_us"):
        out[c] = out[c].astype("int64")
    return typed_out(out, schema, sort_by="event_type")


EVENTS_LATE_ARRIVALS_SQL = """
WITH a AS (
  SELECT event_type, ts,
         (event_id * 2654435761) % 4294967296 AS arr
  FROM events
), w AS (
  SELECT event_type, ts,
         MAX(ts) OVER (ORDER BY arr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm
  FROM a
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (wm IS NOT NULL
            AND epoch_us(wm) - epoch_us(ts) > 300000000) AS BIGINT)
         AS n_late,
       CAST(COALESCE(MAX(CASE WHEN wm IS NOT NULL
                          THEN epoch_us(wm) - epoch_us(ts) END), 0)
            AS BIGINT) AS max_lateness_us
FROM w
GROUP BY event_type
ORDER BY event_type
"""


def events_sliding_distinct_users(sf_dir: str,
                                  window_hours: int = 24) -> pd.DataFrame:
    """EXACT distinct users per 24-hour window sliding by one hour — the
    rolling-reach metric whose naive plan (re-deduplicate 24 panes per
    anchor) does 24x the work and whose sketch plan (HLL per pane) gives
    up exactness. This is the scalable EXACT formulation: each user's
    contribution to ALL windows is an interval union, and the rollup is a
    difference array — no per-window work at all.

    Plan: (1) tiny pass folds the global max active hour; (2) the stream
    shrinks to distinct (user, hour) pairs per batch, one user-bucketed
    exchange co-locates each user's hours, and the bucket merges each
    user's [h, h+23] spans (consecutive actives with gaps <= 23 coalesce)
    into +1/-1 boundary deltas — ONE vectorized run-id pass over the
    sorted bucket, never a loop per window; (3) the driver folds the
    bounded (boundary, delta) stream (bounded by the crawl's hour range,
    not by events or users) and one prefix-sum yields every anchor's
    exact count. Integers end to end."""
    look = window_hours - 1

    ds = _events(sf_dir, ["ts", "user_id"])

    def hours_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": (df["ts"].astype("int64") // 3_600_000_000),
            "user_id": df["user_id"].to_numpy(np.int64),
        }).drop_duplicates()

    tagged = ds.map_batches(hours_partial, batch_format="pandas")

    # pass 1: global max active hour (bounded partials)
    mx = tagged.map_batches(
        lambda df: pd.DataFrame({"mx": [df.h.max()]})
        if len(df) else pd.DataFrame({"mx": pd.Series(dtype="int64")}),
        batch_format="pandas",
    ).to_pandas()
    schema = {"window_h": "int64", "n_users": "int64"}
    if mx.empty or mx.mx.isna().all():
        return typed_out(pd.DataFrame(), schema)
    max_h = int(mx.mx.max())

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "h"]).sort_values(
            ["user_id", "h"], kind="stable")
        u = g.user_id.to_numpy(np.int64)
        h = g.h.to_numpy(np.int64)
        new_run = np.ones(len(g), dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (h[1:] - h[:-1] > look)
        run_id = np.cumsum(new_run) - 1
        starts = h[new_run]
        # run end = last h of the run + look, capped at the global max
        last_idx = np.flatnonzero(
            np.concatenate((new_run[1:], [True])))
        ends = np.minimum(h[last_idx] + look, max_h)
        pos = np.concatenate((starts, ends + 1))
        dlt = np.concatenate((np.ones(len(starts), dtype=np.int64),
                              -np.ones(len(ends), dtype=np.int64)))
        out = pd.DataFrame({"pos": pos, "delta": dlt}).groupby(
            "pos", as_index=False).agg(delta=("delta", "sum"))
        return out

    out = (
        tagged.map_batches(
            lambda df: add_bucket_column(df, ["user_id"], 32),
            batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: deltas(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("pos", as_index=False).agg(delta=("delta", "sum"))
    out = out.sort_values("pos", kind="stable")
    pos = out.pos.to_numpy(np.int64)
    counts = np.cumsum(out.delta.to_numpy(np.int64))
    # expand segments [pos_i, pos_{i+1}) with count > 0 into hourly rows
    seg_ends = np.concatenate((pos[1:], [max_h + 1]))
    keep = counts > 0
    ws, ns = [], []
    for s, e, c in zip(pos[keep], seg_ends[keep], counts[keep]):
        e = min(int(e), max_h + 1)
        if e > s:
            ws.append(np.arange(s, e, dtype=np.int64))
            ns.append(np.full(e - s, c, dtype=np.int64))
    if not ws:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame({"window_h": np.concatenate(ws),
                        "n_users": np.concatenate(ns)})
    return typed_out(res, schema, sort_by="window_h")


EVENTS_SLIDING_DISTINCT_SQL = """
WITH hours AS (
  SELECT DISTINCT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS h, user_id
  FROM events
), anchors AS (
  SELECT DISTINCT a.h + g.g AS w0
  FROM hours a, generate_series(0, 23) g(g)
  WHERE a.h + g.g <= (SELECT MAX(h) FROM hours)
)
SELECT w0 AS window_h, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM anchors JOIN hours ON h BETWEEN w0 - 23 AND w0
GROUP BY w0
ORDER BY window_h
"""


def events_user_burst_detection(sf_dir: str, k: int = 3,
                                window_s: int = 3600) -> pd.DataFrame:
    """Burst / rate-gate detection: users who emitted ``k`` events inside
    any ``window_s`` span, with how many such burst windows and the
    tightest one — the abuse/bot gate every event pipeline runs before
    sessionization (a crawler that fetches 3 pages in an hour is a user;
    3,000 is a bot).

    The sliding COUNT-within-time-window primitive, made exact with no
    window re-scans: one user-bucketed exchange co-locates each user's
    stream, the bucket sorts once by the oracle's (ts, event_id) order
    and a single k-shifted vectorized compare finds every burst start
    (ts[i+k-1] - ts[i] <= window). Microsecond integers end to end."""
    span_cap = np.int64(window_s) * np.int64(1_000_000)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df.user_id.to_numpy(np.int64),
            "ts_us": df.ts.astype("int64").to_numpy(),
            "event_id": df.event_id.to_numpy(np.int64),
        })

    def bursts(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "n_bursts": pd.Series(dtype="int64"),
                              "min_span_us": pd.Series(dtype="int64")})
        if len(g) < k:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        u = g.user_id.to_numpy(np.int64)
        ts = g.ts_us.to_numpy(np.int64)
        same = u[k - 1:] == u[:len(u) - k + 1]
        span = ts[k - 1:] - ts[:len(ts) - k + 1]
        hit = same & (span <= span_cap)
        if not hit.any():
            return empty
        out = pd.DataFrame({"user_id": u[:len(u) - k + 1][hit],
                            "span_us": span[hit]})
        res = out.groupby("user_id", as_index=False).agg(
            n_bursts=("span_us", "size"), min_span_us=("span_us", "min"))
        res["n_bursts"] = res.n_bursts.astype("int64")
        return res

    out = bucketed_combine(ds.map_batches(partial, batch_format="pandas"),
                           "user_id", lambda df: df, bursts,
                           num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"user_id": "int64", "n_bursts": "int64",
              "min_span_us": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    return typed_out(out, schema, sort_by="user_id")


EVENTS_USER_BURST_SQL = """
WITH o AS (
  SELECT user_id, ts,
         LEAD(ts, 2) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS te
  FROM events
), b AS (
  SELECT user_id, epoch_us(te) - epoch_us(ts) AS span_us
  FROM o
  WHERE te IS NOT NULL
    AND epoch_us(te) - epoch_us(ts) <= CAST(3600 AS BIGINT) * 1000000
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_bursts,
       CAST(MIN(span_us) AS BIGINT) AS min_span_us
FROM b
GROUP BY user_id
ORDER BY user_id
"""


def events_dau_wau_stickiness(sf_dir: str) -> pd.DataFrame:
    """DAU / WAU stickiness per day — the product-health ratio (what share
    of the week's audience shows up on a given day). WAU is a TRAILING
    7-day distinct count, the small sibling of
    ``events_sliding_distinct_users``' 24h/1h window, and it reuses the
    same exact formulation: each user's contribution to every trailing
    window is an interval union, rolled up as a difference array.

    One user-bucketed exchange of distinct (user, day) pairs feeds BOTH
    aggregates: per bucket, active-day counts (DAU partials) and unioned
    [day, day+6] coverage deltas (WAU partials) come out of the same
    sorted pass; the driver folds two day-range-bounded streams, takes
    one prefix sum, and joins them on the active days. Integers until the
    final ratio."""
    LOOK = 6  # window = 7 days

    ds = _events(sf_dir, ["ts", "user_id"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": (df["ts"].astype("int64")
                    // 86_400_000_000).astype("int64"),
            "user_id": df["user_id"].to_numpy(np.int64),
        }).drop_duplicates()

    def both_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="stable")
        u = g.user_id.to_numpy(np.int64)
        d = g.day.to_numpy(np.int64)
        # DAU partials: one (+count) row per active day in this bucket
        dau = g.groupby("day", as_index=False).agg(v=("user_id", "size"))
        dau["kind"] = "dau"
        dau = dau.rename(columns={"day": "pos"})
        # WAU deltas: union of [day, day+LOOK] per user
        new_run = np.ones(len(g), dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > LOOK)
        starts = d[new_run]
        last_idx = np.flatnonzero(np.concatenate((new_run[1:], [True])))
        ends = d[last_idx] + LOOK
        wau = pd.DataFrame({
            "pos": np.concatenate((starts, ends + 1)),
            "v": np.concatenate((np.ones(len(starts), np.int64),
                                 -np.ones(len(ends), np.int64))),
            "kind": "wau",
        })
        out = pd.concat([dau[["pos", "v", "kind"]], wau],
                        ignore_index=True)
        return out.groupby(["kind", "pos"], as_index=False).agg(
            v=("v", "sum"))

    out = bucketed_combine(
        ds.map_batches(pairs, batch_format="pandas"),
        "user_id", lambda df: df, both_partials,
        num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"day": "int64", "dau": "int64", "wau": "int64",
              "stickiness": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby(["kind", "pos"], as_index=False).agg(v=("v", "sum"))
    dau = out[out.kind == "dau"].set_index("pos").v
    deltas = out[out.kind == "wau"].sort_values("pos")
    pos = deltas.pos.to_numpy(np.int64)
    cover = np.cumsum(deltas.v.to_numpy(np.int64))
    days = np.sort(dau.index.to_numpy(np.int64))
    # WAU at each active day = coverage level of the segment containing it
    seg = np.searchsorted(pos, days, side="right") - 1
    wau = cover[seg]
    res = pd.DataFrame({
        "day": days,
        "dau": dau.loc[days].to_numpy(np.int64),
        "wau": wau.astype(np.int64),
    })
    res["stickiness"] = round_away(
        res.dau.to_numpy(np.float64) / res.wau.to_numpy(np.float64), 6)
    return typed_out(res, schema, sort_by="day")


EVENTS_DAU_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
), wau AS (
  SELECT d.day, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
  FROM dau d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT day, dau, wau, ROUND(dau * 1.0 / wau, 6) AS stickiness
FROM dau JOIN wau USING (day)
ORDER BY day
"""


# ---------------------------------------------------------------------------
# RFM segmentation: exact triple-NTILE(4) via sorted-cutoff broadcast
# ---------------------------------------------------------------------------


def events_rfm_segments(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """RFM user segmentation — every user quartiled independently on
    Recency (last event ts), Frequency (event count) and Monetary (value
    sum), then the 4x4x4 segment occupancy counted: the classic
    marketing/behavior rollup, and a triple exact-NTILE exercise.

    NTILE needs global ranks, but segment COUNTS only need the quartile
    BOUNDARIES: per metric, the engine sorts the per-user aggregate once
    (``Dataset.sort`` on (metric, user_id) — the oracle's deterministic
    tiebreak) and extracts the sort key at the <=3 tile-start positions
    (per-block row counts -> exclusive prefix -> only the block holding a
    cutoff materializes one row). The 9 cutoff tuples are broadcast and a
    single vectorized pass assigns all three tiles per user, followed by
    a bounded (<=64-cell) count combine. No rank table is ever
    materialized and no rank join runs — 3 sorts of the aggregate, O(k)
    driver state.

    Monetary is rounded half-away to 2 BEFORE ranking (events.value is a
    2-decimal quantity, so per-user sums sit exactly on the cent grid and
    the round is fold-order-independent), matching the oracle's
    ROUND(SUM(value), 2) sort key."""
    import ray

    from ..functions.frames import typed_out

    ev = _events(sf_dir, columns=["ts", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df.user_id.to_numpy(np.int64),
            "ts_us": df.ts.astype("int64"),
            "value": df.value.to_numpy(np.float64),
        }).groupby("user_id", as_index=False).agg(
            last_ts=("ts_us", "max"), freq=("ts_us", "size"),
            monetary=("value", "sum"))
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("user_id", as_index=False).agg(
            last_ts=("last_ts", "max"), freq=("freq", "sum"),
            monetary=("monetary", "sum"))
        t["monetary"] = round_away(t["monetary"], 2)
        return t

    users = bucketed_combine(ev, "user_id", partial, combine,
                             coalesce_blocks=8)
    schema = {"r_tile": "int64", "f_tile": "int64", "m_tile": "int64",
              "n_users": "int64"}
    # the per-user aggregate is sorted once per metric; materialize the
    # (already user-bounded) aggregate so the raw event scan runs once
    users = users.materialize()
    n = users.count()
    if n == 0:
        return typed_out(pd.DataFrame(), schema)

    def _tile_starts(n_rows: int, tiles: int) -> list[int]:
        """0-based start position of tiles 2..k that are non-empty
        (SQL NTILE: the first n%k tiles hold base+1 rows)."""
        base, rem = divmod(n_rows, tiles)
        starts = []
        for t in range(2, tiles + 1):
            s = ((t - 1) * (base + 1) if t - 1 <= rem
                 else rem * (base + 1) + (t - 1 - rem) * base)
            if s < n_rows:
                starts.append(s)
        return starts

    @ray.remote(num_cpus=0.25)
    def _rows_at(tbl, metric: str, local_idx: list[int]) -> list[tuple]:
        # keep native dtypes: last_ts is int64 microseconds (~1.7e18),
        # beyond float64's exact-integer range — a float cast could merge
        # distinct cutoff keys at the equality test
        m = tbl.column(metric).to_numpy(zero_copy_only=False)
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        return [(m[i].item(), int(u[i])) for i in local_idx]

    @ray.remote(num_cpus=0.25)
    def _nrows(tbl) -> int:
        return tbl.num_rows

    cutoffs: dict[str, list[tuple]] = {}
    for metric in ("last_ts", "freq", "monetary"):
        s = users.sort([metric, "user_id"])
        refs = s.to_arrow_refs()
        counts = ray.get([_nrows.remote(r) for r in refs])
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
            np.int64)
        want = _tile_starts(n, k)
        futs = []
        for r, off, cnt in zip(refs, offsets, counts):
            local = [w - off for w in want if off <= w < off + cnt]
            if local:
                futs.append(_rows_at.remote(r, metric, local))
        got = [row for part in ray.get(futs) for row in part]
        cutoffs[metric] = sorted(got)

    cut_ref = ray.put(cutoffs)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cuts = ray.get(cut_ref)
        out = {}
        for metric, col in (("last_ts", "r_tile"), ("freq", "f_tile"),
                            ("monetary", "m_tile")):
            mv = df[metric].to_numpy()  # native dtype (int64 ts stays exact)
            uv = df["user_id"].to_numpy(np.int64)
            tile = np.ones(len(df), dtype=np.int64)
            for cm, cu in cuts[metric]:
                tile += (mv > cm) | ((mv == cm) & (uv >= cu))
            out[col] = tile
        return pd.DataFrame(out).groupby(
            ["r_tile", "f_tile", "m_tile"], as_index=False).agg(
            n_users=("r_tile", "size"))

    parts = users.map_batches(assign, batch_format="pandas").to_pandas()
    out = parts.groupby(["r_tile", "f_tile", "m_tile"], as_index=False).agg(
        n_users=("n_users", "sum"))
    return typed_out(out, schema, sort_by=["r_tile", "f_tile", "m_tile"])


EVENTS_RFM_SEGMENTS_SQL = """
WITH u AS (
  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
         ROUND(SUM(value), 2) AS monetary
  FROM events GROUP BY user_id
), t AS (
  SELECT NTILE(4) OVER (ORDER BY last_ts, user_id) AS r_tile,
         NTILE(4) OVER (ORDER BY freq, user_id) AS f_tile,
         NTILE(4) OVER (ORDER BY monetary, user_id) AS m_tile
  FROM u
)
SELECT r_tile, f_tile, m_tile, COUNT(*) AS n_users
FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# weekly cohort-retention matrix: (cohort week x week offset) distinct users
# ---------------------------------------------------------------------------


def events_cohort_week_matrix(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort-retention matrix — users grouped by the Monday-start
    week of their FIRST event (their cohort), then counted distinct in
    every later week they were active, keyed by the week offset: the
    product-health triangle every activation dashboard draws.

    Plan: one user-bucketed exchange. Per batch, (user, week) activity
    pairs dedupe locally (integer week index = (epoch_day + 3) // 7 —
    Monday-start, matching DATE_TRUNC('week')); per bucket, each user's
    cohort is the min week and the (cohort, offset) distinct-user counts
    are emitted as bounded partials (weeks x weeks cells, not users).
    Users partition cleanly across buckets, so cross-bucket cell sums are
    exact integers — one shuffle, O(weeks^2) result."""
    from ..functions.frames import typed_out

    ev = _events(sf_dir, columns=["ts", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        week = (day + 3) // 7  # 1969-12-29 (a Monday) is week 0
        return pd.DataFrame({
            "user_id": df.user_id.to_numpy(np.int64), "week": week,
        }).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week"])
        cohort = g.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame({
            "cohort_week": cohort.to_numpy(np.int64),
            "week_offset": (g.week.to_numpy(np.int64)
                            - cohort.to_numpy(np.int64)),
        }).groupby(["cohort_week", "week_offset"], as_index=False).agg(
            n_users=("week_offset", "size"))
        return out

    parts = bucketed_combine(ev, "user_id", partial, combine,
                             coalesce_blocks=8).to_pandas()
    schema = {"cohort_week": "datetime64[us]", "week_offset": "int64",
              "n_users": "int64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    out = parts.groupby(["cohort_week", "week_offset"], as_index=False).agg(
        n_users=("n_users", "sum"))
    out["cohort_week"] = pd.to_datetime(
        (out.cohort_week.to_numpy(np.int64) * 7 - 3) * 86_400_000_000,
        unit="us")
    return typed_out(out, schema, sort_by=["cohort_week", "week_offset"])


EVENTS_COHORT_WEEK_MATRIX_SQL = """
WITH a AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
), c AS (
  SELECT user_id, MIN(wk) AS cohort FROM a GROUP BY 1
)
SELECT c.cohort AS cohort_week,
       CAST((EPOCH(a.wk) - EPOCH(c.cohort)) / 604800 AS BIGINT)
           AS week_offset,
       COUNT(*) AS n_users
FROM a JOIN c ON a.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# exact heavy hitters via a Misra-Gries candidate sweep + verify pass
# ---------------------------------------------------------------------------


def events_heavy_hitters(sf_dir: str, k: int = 127) -> pd.DataFrame:
    """EXACT frequent-user detection at sketch cost — the two-pass
    Misra-Gries plan (Misra & Gries '82; mergeable-summaries form of
    Agarwal et al. 2012): pass 1 folds per-batch MG(k) summaries into one
    k-counter summary whose candidate set PROVABLY contains every user
    with frequency > n/(k+1) under ANY partitioning; pass 2 broadcasts
    the <=k candidates and counts them exactly, keeping those above the
    threshold. Output is deterministic even though intermediate MG state
    is partition-order-dependent — the sketch only ever proposes, the
    exact count disposes.

    Driver state is bounded at k counters; the summary stream it folds is
    k rows per block (streamed via iter_batches, never materialized
    whole). The full per-user count table never exists anywhere — that is
    the point at 10^12 rows where users outnumber worker memory."""
    from ..functions.frames import typed_out

    import ray as _ray

    ev = _events(sf_dir, columns=["user_id"])
    schema = {"user_id": "int64", "n_events": "int64"}

    def mg_partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby("user_id", as_index=False).agg(
            w=("user_id", "size"))
        w = counts.w.to_numpy(np.int64)
        if len(counts) > k:
            s = np.partition(w, len(w) - k - 1)[len(w) - k - 1]
            keep = w - s > 0
            counts = pd.DataFrame({"user_id": counts.user_id.to_numpy()[keep],
                                   "w": (w - s)[keep]})
        counts["w"] = counts.w.astype("int64")
        return counts

    summaries = ev.map_batches(mg_partial, batch_format="pandas")

    counters = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "w": pd.Series(dtype="int64")})
    for batch in summaries.iter_batches(batch_format="pandas"):
        merged = (pd.concat([counters, batch], ignore_index=True)
                  .groupby("user_id", as_index=False).agg(w=("w", "sum")))
        w = merged.w.to_numpy(np.int64)
        if len(merged) > k:
            s = np.partition(w, len(w) - k - 1)[len(w) - k - 1]
            keep = w - s > 0
            merged = pd.DataFrame({"user_id": merged.user_id.to_numpy()[keep],
                                   "w": (w - s)[keep]})
        counters = merged
    if counters.empty:
        return typed_out(pd.DataFrame(), schema)

    cand_ref = _ray.put(frozenset(int(u) for u in counters.user_id))

    def exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        cands = _ray.get(cand_ref)
        hit = df[df.user_id.isin(cands)]
        g = hit.groupby("user_id", as_index=False).agg(
            n_events=("user_id", "size"))
        g["n_events"] = g.n_events.astype("int64")
        # ride the batch's total row count along for the global threshold
        g = pd.concat([g, pd.DataFrame({"user_id": [np.int64(-1)],
                                        "n_events": [np.int64(len(df))]})],
                      ignore_index=True)
        return g

    parts = ev.map_batches(exact_partial, batch_format="pandas").to_pandas()
    totals = parts.groupby("user_id", as_index=False).agg(
        n_events=("n_events", "sum"))
    n_total = int(totals.loc[totals.user_id == -1, "n_events"].sum())
    out = totals[(totals.user_id != -1)
                 & (totals.n_events > n_total / (k + 1.0))]
    return typed_out(out, schema, sort_by="user_id")


EVENTS_HEAVY_HITTERS_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
HAVING COUNT(*) > (SELECT COUNT(*) FROM events) / 128.0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# damped Markov stationary distribution over the event-type chain
# ---------------------------------------------------------------------------


def events_markov_stationary(sf_dir: str, damping: float = 0.85,
                             tol: float = 1e-14,
                             max_iter: int = 10_000) -> pd.DataFrame:
    """Stationary distribution of the event-type Markov chain — where a
    user's behavior settles long-run, PageRank-style damped so the chain
    is irreducible even when some type never transitions out.

    The distributed work IS ``events_path_transitions`` (one user-bucketed
    exchange, n_types^2 bounded output); the power iteration then runs on
    the driver over a <=n_types-square matrix — constant-size at any
    corpus scale, the sanctioned place for an iterative fixpoint whose
    state is schema-bounded (same pattern as dup_graph_kcore's peel).
    No SQL analog (iterative); pinned against numpy's dominant-eigenvector
    solution in tests/test_text_metrics.py."""
    from ..functions.frames import typed_out

    trans = events_path_transitions(sf_dir)
    schema = {"event_type": "object", "stationary_prob": "float64",
              "n_out": "int64"}
    if trans.empty:
        return typed_out(pd.DataFrame(), schema)
    types = sorted(set(trans.from_type) | set(trans.to_type))
    idx = {t: i for i, t in enumerate(types)}
    m = len(types)
    P = np.zeros((m, m), np.float64)
    P[[idx[a] for a in trans.from_type],
      [idx[b] for b in trans.to_type]] = trans.n.to_numpy(np.float64)
    n_out = P.sum(axis=1)
    row_sum = np.where(n_out > 0, n_out, 1.0)
    P = np.where(n_out[:, None] > 0, P / row_sum[:, None], 1.0 / m)
    pi = np.full(m, 1.0 / m)
    for _ in range(max_iter):
        nxt = damping * (pi @ P) + (1.0 - damping) / m
        if np.abs(nxt - pi).sum() < tol:
            pi = nxt
            break
        pi = nxt
    out = pd.DataFrame({"event_type": types,
                        "stationary_prob": round_away(pi, 6),
                        "n_out": n_out.astype(np.int64)})
    return typed_out(out, schema, sort_by="event_type")


# ---------------------------------------------------------------------------
# exact per-type value quantiles via the value-histogram exchange
# ---------------------------------------------------------------------------


def events_value_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact q25/q50/q75/q95 of the transaction value per event type —
    the latency/value-profile rollup (p95 being the one every dashboard
    asks for), computed WITHOUT sorting events: ``value`` is a 2-decimal
    quantity from a bounded range, so the per-type VALUE HISTOGRAM is
    small and the exchange carries one (type, value, cnt) row per
    distinct value per batch — the doc_length_median_by_lang trick on a
    float grid. Each bucket folds its types' histograms and walks the
    cumulative counts with DuckDB quantile_cont interpolation; results
    round to 6 (the interpolation arithmetic is the only cross-side float
    op, and it runs on identical doubles)."""
    from ..functions.frames import typed_out
    from .text_analysis import _hist_quantile_cont

    ev = _events(sf_dir, columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "value"], as_index=False).agg(
            cnt=("value", "size"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "value"], as_index=False).agg(
            cnt=("cnt", "sum"))
        rows = []
        for et, f in g.groupby("event_type"):
            vals = f["value"].to_numpy(np.float64)
            cnts = f["cnt"].to_numpy(np.int64)
            qs = [round_away(_hist_quantile_cont(vals, cnts, p), 6)
                  for p in (0.25, 0.5, 0.75, 0.95)]
            rows.append((et, int(cnts.sum()), *qs))
        return pd.DataFrame(rows, columns=["event_type", "n", "q25", "q50",
                                           "q75", "q95"])

    out = bucketed_combine(ev, "event_type", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    return typed_out(out, {"event_type": "object", "n": "int64",
                           "q25": "float64", "q50": "float64",
                           "q75": "float64", "q95": "float64"},
                     sort_by="event_type")


EVENTS_VALUE_QUANTILES_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.25), 6) AS q25,
       ROUND(quantile_cont(value, 0.50), 6) AS q50,
       ROUND(quantile_cont(value, 0.75), 6) AS q75,
       ROUND(quantile_cont(value, 0.95), 6) AS q95
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# funnel latency: exact quantiles of per-user signup -> purchase delay
# ---------------------------------------------------------------------------


def events_funnel_time_to_convert(sf_dir: str) -> pd.DataFrame:
    """Conversion-latency profile — for every user whose first purchase
    follows their first click, the click->purchase delay, summarized as
    exact q25/q50/q75 plus the converted-user count: the time-to-convert
    read that pairs with ``events_funnel``'s step counts.

    Plan: per-user first-click/first-purchase timestamps come from one
    user-bucketed combine (MIN partials fold exactly); the delta stream —
    one int64 row per converted user — is then quantiled EXACTLY via one
    ``Dataset.sort`` + block-offset rank scan (the customer_revenue_gini
    machinery: only the <=2 blocks holding a middle rank materialize one
    row each per quantile). Deltas are integer microseconds; the
    quantile_cont interpolation (pos = q*(n-1)) runs on exact doubles up
    to 2^53 us (~285 years), so both sides interpolate identical values."""
    from ..functions.frames import typed_out

    import ray as _ray

    ev = _events(sf_dir, columns=["ts", "user_id", "event_type"],
                 event_types=("click", "purchase"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "user_id": df.user_id.to_numpy(np.int64),
            "ts_us": df.ts.astype("int64"),
            "is_click": (df.event_type == "click").to_numpy(),
        })
        g = t.groupby(["user_id", "is_click"], as_index=False).agg(
            first_ts=("ts_us", "min"))
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "is_click"], as_index=False).agg(
            first_ts=("first_ts", "min"))
        c = g[g.is_click].set_index("user_id")["first_ts"]
        p = g[~g.is_click].set_index("user_id")["first_ts"]
        both = c.index.intersection(p.index)
        delta = (p.loc[both] - c.loc[both])
        delta = delta[delta >= 0]
        return pd.DataFrame({"user_id": delta.index.to_numpy(np.int64),
                             "delta_us": delta.to_numpy(np.int64)})

    deltas = bucketed_combine(ev, "user_id", partial, combine,
                              coalesce_blocks=8)
    schema = {"n_converted": "int64", "q25_us": "float64",
              "q50_us": "float64", "q75_us": "float64"}

    d_sorted = deltas.sort(["delta_us", "user_id"])
    refs = d_sorted.to_arrow_refs()

    @_ray.remote(num_cpus=0.25)
    def _nrows(tbl) -> int:
        return tbl.num_rows

    counts = _ray.get([_nrows.remote(r) for r in refs]) if refs else []
    n = int(sum(counts))
    if n == 0:
        return typed_out(pd.DataFrame(
            {"n_converted": [0], "q25_us": [np.nan], "q50_us": [np.nan],
             "q75_us": [np.nan]}), schema)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    want = sorted({int(np.floor(p * (n - 1))) for p in (0.25, 0.5, 0.75)}
                  | {int(np.ceil(p * (n - 1))) for p in (0.25, 0.5, 0.75)})

    @_ray.remote(num_cpus=0.25)
    def _delta_at(tbl, local_idx: list[int]) -> list[tuple[int, int]]:
        v = tbl.column("delta_us").to_numpy(zero_copy_only=False)
        return [(i, int(v[i])) for i in local_idx]

    futs, bases = [], []
    for r, off, cnt in zip(refs, offsets, counts):
        local = [w - off for w in want if off <= w < off + cnt]
        if local:
            futs.append(_delta_at.remote(r, local))
            bases.append(int(off))
    at = {}
    for base, part in zip(bases, _ray.get(futs)):
        for i, v in part:
            at[base + i] = v

    def q_cont(p: float) -> float:
        pos = p * (n - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        return at[lo] + (at[hi] - at[lo]) * (pos - lo)

    out = pd.DataFrame({"n_converted": [n],
                        "q25_us": [q_cont(0.25)],
                        "q50_us": [q_cont(0.5)],
                        "q75_us": [q_cont(0.75)]})
    return typed_out(out, schema)


EVENTS_FUNNEL_TTC_SQL = """
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS c,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
), d AS (
  SELECT CAST(EPOCH_US(p) - EPOCH_US(c) AS BIGINT) AS delta_us
  FROM f WHERE c IS NOT NULL AND p IS NOT NULL AND p >= c
)
SELECT COUNT(*) AS n_converted,
       quantile_cont(delta_us, 0.25) AS q25_us,
       quantile_cont(delta_us, 0.50) AS q50_us,
       quantile_cont(delta_us, 0.75) AS q75_us
FROM d
"""


# ---------------------------------------------------------------------------
# composition drift: day-over-day event-type share deltas
# ---------------------------------------------------------------------------


def events_type_share_drift(sf_dir: str) -> pd.DataFrame:
    """Composition-drift monitor — per event type, how much its share of
    daily traffic moves day over day (max and mean |Delta share|): the
    canary a streaming pipeline watches to catch upstream mix shifts
    (a new client version, a broken producer) before volume alarms fire.

    The (day, type) count matrix is schema-bounded (days x 5), so one
    partial-combine exchange carries everything; shares, the LAG diff and
    the per-type rollup run on the bounded frame driver-side in fixed
    order. Shares divide exact integer counts — identical doubles on both
    sides — and round to 6 only at the output."""
    from ..functions.frames import typed_out

    ev = _events(sf_dir, columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        return pd.DataFrame({"day": day,
                             "event_type": df.event_type.to_numpy(object)}
                            ).groupby(["day", "event_type"],
                                      as_index=False).size().rename(
            columns={"size": "n"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"event_type": "object", "n_days": "int64",
              "max_abs_drift": "float64", "mean_abs_drift": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby(["day", "event_type"], as_index=False).agg(
        n=("n", "sum"))
    # dense (day x type) grid: a type absent on a day has share 0
    days = np.sort(m.day.unique())
    types = np.sort(m.event_type.unique())
    grid = (m.pivot(index="day", columns="event_type", values="n")
            .reindex(index=days, columns=types).fillna(0.0))
    share = grid.to_numpy(np.float64)
    share = share / share.sum(axis=1, keepdims=True)
    drift = np.abs(np.diff(share, axis=0))
    if drift.shape[0] == 0:  # single day: no day-over-day pairs
        out = pd.DataFrame({"event_type": types,
                            "n_days": np.int64(len(days)),
                            "max_abs_drift": np.nan,
                            "mean_abs_drift": np.nan})
    else:
        out = pd.DataFrame({
            "event_type": types,
            "n_days": np.int64(len(days)),
            "max_abs_drift": round_away(drift.max(axis=0), 6),
            "mean_abs_drift": round_away(drift.mean(axis=0), 6),
        })
    return typed_out(out, schema, sort_by="event_type")


EVENTS_TYPE_SHARE_DRIFT_SQL = """
WITH d AS (
  SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM d),
types AS (SELECT DISTINCT event_type FROM d),
dense AS (
  SELECT days.day, types.event_type, COALESCE(d.n, 0) AS n
  FROM days CROSS JOIN types
  LEFT JOIN d ON d.day = days.day AND d.event_type = types.event_type
), s AS (
  SELECT day, event_type,
         n / SUM(n) OVER (PARTITION BY day) AS share
  FROM dense
), dr AS (
  SELECT event_type,
         ABS(share - LAG(share) OVER (PARTITION BY event_type
                                      ORDER BY day)) AS drift
  FROM s
)
SELECT event_type,
       (SELECT COUNT(*) FROM days) AS n_days,
       ROUND(MAX(drift), 6) AS max_abs_drift,
       ROUND(AVG(drift), 6) AS mean_abs_drift
FROM dr GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bot detection: inter-arrival regularity, exact integer comparator
# ---------------------------------------------------------------------------


def events_bot_regularity(sf_dir: str, min_events: int = 20) -> pd.DataFrame:
    """Bot screen — users firing events at suspiciously regular intervals:
    among users with >= ``min_events`` events, how many have an
    inter-arrival coefficient of variation below 0.85 (a Poisson arrival
    process has CV = 1, so traffic materially below that band is
    scheduler-regular, not human). The classic pre-training-corpus
    traffic filter.

    The CV gate is evaluated in EXACT INTEGER arithmetic: with n deltas,
    S = sum(d) and Q = sum(d^2) (timestamps are integer microseconds),
    CV < 0.85  <=>  CV^2 < 0.7225  <=>  10000*n*Q < 17225*S^2 — Python
    bigints engine-side, HUGEINT in the oracle, so no
    float-summation-order noise can flip a borderline user. Per-user
    state is one (user, ts) exchange via the user-bucketed combine; delta
    multisets are tie-order invariant (sorted ts values). The driver
    folds one (eligible, bots) pair per bucket."""
    ev = _events(sf_dir, columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df.user_id.to_numpy(np.int64),
            "ts_us": df.ts.astype("int64"),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        uid = g.user_id.to_numpy(np.int64)
        ts = g.ts_us.to_numpy(np.int64)
        users, starts = np.unique(uid, return_index=True)
        bounds = np.append(starts, len(uid))
        n_eligible = 0
        n_bots = 0
        for i in range(len(users)):
            t = ts[bounds[i]:bounds[i + 1]]
            if len(t) < min_events:
                continue
            s = int(t[-1]) - int(t[0])
            if s <= 0:
                continue
            n_eligible += 1
            d = np.diff(t)
            q = int(np.dot(d.astype(object), d.astype(object)))
            n = len(d)
            if 10000 * n * q < 17225 * s * s:
                n_bots += 1
        return pd.DataFrame({"n_eligible": [n_eligible], "n_bots": [n_bots]})

    parts = bucketed_combine(ev, "user_id", partial, combine,
                             coalesce_blocks=8).to_pandas()
    schema = {"n_eligible": "int64", "n_bots": "int64", "bot_rate": "float64"}
    if parts.empty or parts.n_eligible.sum() == 0:
        # scalar-aggregate mirror: COUNT over empty is 0, SUM/ROUND are NULL
        ne = int(parts.n_eligible.sum()) if not parts.empty else 0
        return typed_out(pd.DataFrame(
            {"n_eligible": [ne], "n_bots": [np.nan], "bot_rate": [np.nan]}),
            schema)
    ne = int(parts.n_eligible.sum())
    nb = int(parts.n_bots.sum())
    out = pd.DataFrame({"n_eligible": [ne], "n_bots": [nb],
                        "bot_rate": round_away(np.asarray([nb / ne]), 6)})
    return typed_out(out, schema)


EVENTS_BOT_REGULARITY_SQL = """
WITH d AS (
  SELECT user_id,
         EPOCH_US(ts) - LAG(EPOCH_US(ts))
             OVER (PARTITION BY user_id ORDER BY ts) AS dt
  FROM events
), s AS (
  SELECT user_id, COUNT(dt) AS n, SUM(dt) AS sd,
         SUM(CAST(dt AS HUGEINT) * dt) AS sd2
  FROM d WHERE dt IS NOT NULL GROUP BY user_id
), e AS (
  SELECT (10000 * n * sd2 < 17225 * CAST(sd AS HUGEINT) * sd) AS is_bot
  FROM s WHERE n >= 19 AND sd > 0
)
SELECT COUNT(*) AS n_eligible,
       CAST(SUM(CASE WHEN is_bot THEN 1 ELSE 0 END) AS BIGINT) AS n_bots,
       ROUND(CAST(SUM(CASE WHEN is_bot THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS bot_rate
FROM e
"""


# ---------------------------------------------------------------------------
# behavioral diversity: per-user event-type entropy histogram
# ---------------------------------------------------------------------------


def events_user_type_entropy(sf_dir: str) -> pd.DataFrame:
    """Behavioral-diversity histogram — per user, the Shannon entropy (nats)
    of their event-type mix, bucketed into 0.05-nat bands: single-purpose
    accounts land in band 0, organic users spread toward ln(5)=1.61
    (band 32). The per-(user,type) count matrix pre-aggregates inside
    every batch, so the user-bucketed exchange moves one row per
    (user,type,batch), never raw events; each bucket's combine emits band
    counts (<=33 rows) and the driver folds 32 tiny frames. Entropy uses
    the same -sum(p*ln p) form as the oracle; only a user whose
    irrational entropy sits within float noise of a band edge could flip
    (measured margin at sf0.01: 2.7e-5 nats vs ~1e-15 noise) — entropy
    exactly 0 (one type) is the lone exact edge case and floors to band 0
    on both sides."""
    ev = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["user_id", "event_type"], as_index=False)
                .size().rename(columns={"size": "n"}))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"))
        tot = c.groupby("user_id")["n"].transform("sum").to_numpy(np.float64)
        p = c.n.to_numpy(np.float64) / tot
        term = -(p * np.log(p))
        ent = pd.DataFrame({"user_id": c.user_id, "term": term}).groupby(
            "user_id")["term"].sum()
        band = np.floor(ent.to_numpy(np.float64) / 0.05).astype(np.int64)
        return (pd.DataFrame({"band": band}).groupby("band", as_index=False)
                .size().rename(columns={"size": "n_users"}))

    parts = bucketed_combine(ev, "user_id", partial, combine,
                             coalesce_blocks=8).to_pandas()
    schema = {"band": "int64", "n_users": "int64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    out = parts.groupby("band", as_index=False).agg(n_users=("n_users", "sum"))
    return typed_out(out, schema, sort_by="band")


EVENTS_USER_TYPE_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
), t AS (
  SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1
), h AS (
  SELECT c.user_id,
         -SUM((n / tot) * LN(n / tot)) AS ent
  FROM c JOIN t USING (user_id) GROUP BY c.user_id
)
SELECT CAST(FLOOR(ent / 0.05) AS BIGINT) AS band, COUNT(*) AS n_users
FROM h GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# audience overlap: Jaccard of user sets between event types
# ---------------------------------------------------------------------------


def events_type_user_overlap(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap matrix — for every pair of event types, the Jaccard
    similarity of their distinct-user sets: which behaviors share an
    audience (click vs purchase) and which are disjoint populations. Only
    pairs with at least one shared user are emitted.

    Per-batch distinct (user,type) pairs flow through ONE user-bucketed
    exchange; inside each bucket a self-merge on user_id yields the
    co-occurrence counts (each user contributes <= C(5,2)=10 pairs) and
    singleton type counts ride along as marker rows (type_b=''), so the
    driver folds at most 32 x 15 tiny rows. Jaccard divides exact
    integers — bit-identical on both sides before the round."""
    ev = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "event_type"]].drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["user_id", "event_type"])
        singles = u.groupby("event_type", as_index=False).size().rename(
            columns={"event_type": "type_a", "size": "n"})
        singles["type_b"] = ""
        m = u.merge(u, on="user_id")
        m = m[m.event_type_x < m.event_type_y]
        pairs = m.groupby(["event_type_x", "event_type_y"],
                          as_index=False).size().rename(
            columns={"event_type_x": "type_a", "event_type_y": "type_b",
                     "size": "n"})
        return pd.concat([singles[["type_a", "type_b", "n"]], pairs],
                         ignore_index=True)

    parts = bucketed_combine(ev, "user_id", partial, combine,
                             coalesce_blocks=8).to_pandas()
    schema = {"type_a": "object", "type_b": "object", "n_a": "int64",
              "n_b": "int64", "n_both": "int64", "jaccard": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    folded = parts.groupby(["type_a", "type_b"], as_index=False).agg(
        n=("n", "sum"))
    singles = folded[folded.type_b == ""].set_index("type_a")["n"]
    pairs = folded[folded.type_b != ""]
    if pairs.empty:
        return typed_out(pd.DataFrame(), schema)
    na = singles.reindex(pairs.type_a).to_numpy(np.int64)
    nb = singles.reindex(pairs.type_b).to_numpy(np.int64)
    co = pairs.n.to_numpy(np.int64)
    out = pd.DataFrame({
        "type_a": pairs.type_a.to_numpy(object),
        "type_b": pairs.type_b.to_numpy(object),
        "n_a": na, "n_b": nb, "n_both": co,
        "jaccard": round_away(co / (na + nb - co), 6),
    })
    return typed_out(out, schema, sort_by=["type_a", "type_b"])


EVENTS_TYPE_USER_OVERLAP_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), tc AS (
  SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id
                     AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
       ROUND(CAST(n_both AS DOUBLE) / (ta.n + tb.n - n_both), 6) AS jaccard
FROM pairs
JOIN tc ta ON ta.event_type = type_a
JOIN tc tb ON tb.event_type = type_b
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# time-series diagnostics on the bounded hourly/daily count grid
# ---------------------------------------------------------------------------

def events_hourly_autocorr(sf_dir: str, max_lag: int = 24) -> pd.DataFrame:
    """Autocorrelation function of the hourly event-count series at lags
    1..max_lag — the seasonality detector (a spike at lag 24 = daily
    rhythm, at lag 168 = weekly) that tells a capacity planner whether
    the load is periodic or bursty.

    Hour-bucketed counts are the only thing that leaves the cluster: the
    (hour, n) partials combine to a frame bounded by the TIME SPAN of the
    corpus (one row per hour — a decade is ~88k rows), never by event
    volume, so the dense-grid fill, the lag shifts and the Pearson ratios
    all run driver-side in fixed order. Counts are exact integers; the
    correlation divides sample moments computed in one numpy pass, and
    only the output rounds (6 dp). Lags whose pair count is zero (span
    shorter than the lag) are dropped, matching the SQL GROUP BY; a
    zero-variance side yields NaN like SQL CORR's NULL."""
    ev = _events(sf_dir, columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = df.ts.astype("int64").to_numpy() // 3_600_000_000
        return pd.DataFrame({"hr": hr}).groupby("hr", as_index=False) \
            .size().rename(columns={"size": "n"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"lag": "int64", "n_pairs": "int64", "acf": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby("hr", as_index=False).agg(n=("n", "sum"))
    lo, hi = int(m.hr.min()), int(m.hr.max())
    series = np.zeros(hi - lo + 1, np.float64)
    series[m.hr.to_numpy(np.int64) - lo] = m.n.to_numpy(np.float64)
    rows = []
    for lag in range(1, max_lag + 1):
        if lag >= len(series):
            break  # zero pairs: SQL's join produces no group
        x, y = series[:-lag], series[lag:]
        n = len(x)
        if n < 2:
            rows.append((lag, n, np.nan))  # sample stddev undefined
            continue
        sx, sy = x.sum(), y.sum()
        cov = (x * y).sum() - sx * sy / n
        vx = (x * x).sum() - sx * sx / n
        vy = (y * y).sum() - sy * sy / n
        acf = np.nan if vx <= 0.0 or vy <= 0.0 \
            else cov / np.sqrt(vx) / np.sqrt(vy)
        rows.append((lag, n, acf))
    out = pd.DataFrame(rows, columns=["lag", "n_pairs", "acf"])
    out["acf"] = round_away(out.acf, 6)
    return typed_out(out, schema, sort_by="lag")


EVENTS_HOURLY_AUTOCORR_SQL = """
WITH h AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hr, COUNT(*) AS n
  FROM events GROUP BY 1
), b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h WHERE hr IS NOT NULL),
grid AS (
  SELECT UNNEST(generate_series(b.lo, b.hi)) AS hr FROM b
), s AS (
  SELECT grid.hr, CAST(COALESCE(h.n, 0) AS DOUBLE) AS n
  FROM grid LEFT JOIN h ON h.hr = grid.hr
), lags AS (
  SELECT UNNEST(generate_series(1, 24)) AS lag
)
SELECT l.lag, COUNT(*) AS n_pairs, ROUND(CORR(a.n, c.n), 6) AS acf
FROM lags l
JOIN s a ON TRUE
JOIN s c ON c.hr = a.hr + l.lag
GROUP BY l.lag ORDER BY l.lag
"""


def events_type_trend(sf_dir: str) -> pd.DataFrame:
    """Per-type traffic trend — population-OLS slope and intercept of the
    daily count series (dense day grid, absent days count 0, x = days
    since the corpus's first day): the one-number-per-type answer to "is
    this event growing or dying", the input to deprecation decisions.

    Same bounded-grid shape as the drift monitor: only (day, type) count
    partials leave the cluster (days x n_types rows, time-span bounded),
    the dense pivot and the closed-form regression moments run
    driver-side. x is re-based to the first day so intercepts stay at
    count magnitude (large raw epoch-day x would push float error past
    the 6-dp round). Sums of int-count x int-day products are exact in
    float64; only slope/intercept round."""
    ev = _events(sf_dir, columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        return pd.DataFrame({"day": day,
                             "event_type": df.event_type.to_numpy(object)}
                            ).groupby(["day", "event_type"],
                                      as_index=False).size().rename(
            columns={"size": "n"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"event_type": "object", "n_days": "int64",
              "slope": "float64", "intercept": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby(["day", "event_type"], as_index=False).agg(
        n=("n", "sum"))
    lo = int(m.day.min())
    days = np.arange(lo, int(m.day.max()) + 1, dtype=np.int64)
    types = np.sort(m.event_type.unique())
    grid = (m.pivot(index="day", columns="event_type", values="n")
            .reindex(index=days, columns=types).fillna(0.0))
    y = grid.to_numpy(np.float64)                   # (n_days, n_types)
    x = (days - lo).astype(np.float64)[:, None]
    n = np.float64(len(days))
    sx, sy = x.sum(), y.sum(axis=0)
    cov = (x * y).sum(axis=0) - sx * sy / n         # population * n
    vx = (x * x).sum() - sx * sx / n
    slope = np.full(len(types), np.nan) if vx == 0.0 else cov / vx
    intercept = sy / n - slope * (sx / n)
    out = pd.DataFrame({"event_type": types,
                        "n_days": np.int64(len(days)),
                        "slope": round_away(slope, 6),
                        "intercept": round_away(intercept, 6)})
    return typed_out(out, schema, sort_by="event_type")


EVENTS_TYPE_TREND_SQL = """
WITH d AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d WHERE day IS NOT NULL),
grid AS (
  SELECT UNNEST(generate_series(b.lo, b.hi)) AS day FROM b
), types AS (SELECT DISTINCT event_type FROM d),
dense AS (
  SELECT CAST(grid.day - b.lo AS DOUBLE) AS x, types.event_type,
         CAST(COALESCE(d.n, 0) AS DOUBLE) AS n
  FROM grid CROSS JOIN types CROSS JOIN b
  LEFT JOIN d ON d.day = grid.day AND d.event_type = types.event_type
)
SELECT event_type, COUNT(*) AS n_days,
       ROUND(REGR_SLOPE(n, x), 6) AS slope,
       ROUND(REGR_INTERCEPT(n, x), 6) AS intercept
FROM dense GROUP BY event_type ORDER BY event_type
"""


def events_bounce_rate_by_entry_type(sf_dir: str,
                                     gap_minutes: int = 30) -> pd.DataFrame:
    """Bounce rate by session entry point — sessionize each user's stream
    (30-min gap windows), label every session with the event type of its
    FIRST event, and report per entry type how many sessions consist of
    that single event and nothing else. The landing-page health metric:
    an entry type with a high bounce rate is where users arrive and
    immediately leave.

    Same one-exchange shape as ``events_user_sessions``: user-hash
    buckets, vectorized sort + diff + cumsum sessionization inside the
    bucket — but each bucket emits only its (entry_type, n_sessions,
    n_bounces) PARTIAL, bounded by the type vocabulary, so session
    volume never reaches the driver. Integer partials fold exactly; the
    single ratio divides once, driver-side, and rounds half-away like
    the oracle. Ties at identical (user, ts) break on event_id on both
    sides, so "first event of the session" is deterministic."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(df, ["user_id"], 32)

    def bounce_partial(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"entry_type": pd.Series(dtype=object),
                                 "n_sessions": pd.Series(dtype="int64"),
                                 "n_bounces": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g.user_id.ne(g.user_id.shift())
        big_gap = g.ts.diff() > gap
        sid = (new_user | big_gap).cumsum()
        per = g.groupby(sid).agg(entry_type=("event_type", "first"),
                                 n=("event_type", "size"))
        return (per.assign(bounce=(per.n == 1).astype(np.int64))
                .groupby("entry_type", as_index=False)
                .agg(n_sessions=("n", "size"), n_bounces=("bounce", "sum")))

    parts = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: bounce_partial(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    schema = {"entry_type": "object", "n_sessions": "int64",
              "n_bounces": "int64", "bounce_rate": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    agg = parts.groupby("entry_type", as_index=False).agg(
        n_sessions=("n_sessions", "sum"), n_bounces=("n_bounces", "sum"))
    agg["bounce_rate"] = round_away(
        agg.n_bounces.to_numpy(np.float64)
        / agg.n_sessions.to_numpy(np.float64), 6)
    return typed_out(agg, schema, sort_by="entry_type")


EVENTS_BOUNCE_RATE_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
), per AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, sid) AS n
  FROM s
)
SELECT event_type AS entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS bounce_rate
FROM per
WHERE rn = 1
GROUP BY 1 ORDER BY 1
"""


def events_attribution_last_touch(sf_dir: str) -> pd.DataFrame:
    """Last-touch revenue attribution: every purchase is credited to the
    user's most recent PRIOR non-purchase event type (the touchpoint that
    "closed" the sale); purchases with no prior touch credit 'none'. The
    marketing-analytics staple that needs full per-user event ordering —
    exactly what a hash-bucketed exchange plus an in-bucket sort gives.

    One exchange: user-hash buckets; inside a bucket, one stable sort on
    (user, ts, event_id) and a per-user forward-fill of the last
    non-purchase type (purchase rows carry NaN, so the filled value at a
    purchase row is the latest strictly-prior touch — the oracle's
    LAST_VALUE IGNORE NULLS over 1 PRECEDING). Buckets emit
    (touch_type, n, sum_value) partials bounded by the type vocabulary;
    partials sort before the driver fold so the float revenue sums are
    order-stable, and the total rounds 2 dp like the SQL. (ts, event_id)
    is a total order (event_id unique), so ties at equal ts are
    deterministic on both sides."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type",
                          "value"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(df, ["user_id"], 32)

    def attr_partial(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_type": pd.Series(dtype=object),
                              "n_purchases": pd.Series(dtype="int64"),
                              "sum_value": pd.Series(dtype="float64")})
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        np_type = g.event_type.where(g.event_type != "purchase")
        attr = np_type.groupby(g.user_id).ffill()
        p = g[g.event_type == "purchase"]
        if p.empty:
            return empty
        touch = attr[p.index].fillna("none").to_numpy(object)
        frame = pd.DataFrame({"source_type": touch,
                              "value": p.value.to_numpy(np.float64)})
        out = []
        for st, sub in frame.groupby("source_type"):
            v = np.sort(sub.value.to_numpy(np.float64))
            out.append((st, np.int64(len(v)), float(v.sum())))
        return pd.DataFrame(out, columns=["source_type", "n_purchases",
                                          "sum_value"])

    parts = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: attr_partial(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    schema = {"source_type": "object", "n_purchases": "int64",
              "attributed_value": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(["source_type", "n_purchases", "sum_value"],
                              kind="stable")
    agg = parts.groupby("source_type", as_index=False).agg(
        n_purchases=("n_purchases", "sum"), sum_value=("sum_value", "sum"))
    agg["attributed_value"] = round_away(agg.sum_value, 2)
    agg["n_purchases"] = agg.n_purchases.astype("int64")
    return typed_out(
        agg[["source_type", "n_purchases", "attributed_value"]],
        schema, sort_by="source_type")


EVENTS_ATTRIBUTION_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS np_type
  FROM events
), w AS (
  SELECT event_type, value,
         LAST_VALUE(np_type IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM s
)
SELECT COALESCE(touch, 'none') AS source_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(value), 2) AS attributed_value
FROM w
WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# events_weekly_churn: INTERSECT / EXCEPT retention between week cohorts
# ---------------------------------------------------------------------------

def events_weekly_churn(sf_dir: str) -> pd.DataFrame:
    """Week-over-week churn: per ISO week, how many purchase-active users
    stay active the NEXT week (INTERSECT of the two weekly user sets) and
    how many lapse (EXCEPT). Activity = made a purchase that week — the
    raw any-event definition is vacuous on this corpus (every user fires
    events every week), purchases actually churn.

    The set operations never materialize user sets: one user-bucketed
    exchange of distinct (user, week) pairs, then inside each bucket a
    single k=1 shifted compare over the (user, week)-sorted runs — a
    user's week w is retained iff the next distinct week for the same
    user is exactly w+7. Each bucket emits one (week, active, retained)
    counter row per active week; the driver folds a
    ``num_buckets x weeks`` frame. EXCEPT falls out as
    active - retained, no second pass. Integers end to end."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"],
                 event_types=["purchase"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("int64") // 86_400_000_000).astype("int64")
        # ISO Monday truncation: epoch day 0 (1970-01-01) was a Thursday
        wk = day - ((day + 3) % 7)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "wk": wk,
        }).drop_duplicates()

    def week_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "wk"]).sort_values(
            ["user_id", "wk"], kind="stable")
        u = g.user_id.to_numpy(np.int64)
        w = g.wk.to_numpy(np.int64)
        nxt = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            nxt[:-1] = (u[1:] == u[:-1]) & (w[1:] - w[:-1] == 7)
        out = pd.DataFrame({"wk": w, "retained": nxt.astype(np.int64)})
        return out.groupby("wk", as_index=False).agg(
            active_users=("retained", "size"),
            retained_next=("retained", "sum"))

    out = bucketed_combine(
        ds.map_batches(pairs, batch_format="pandas"),
        "user_id", lambda df: df, week_partials,
        num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"wk": "datetime64[us]", "active_users": "int64",
              "retained_next": "int64", "churned_next": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("wk", as_index=False).agg(
        active_users=("active_users", "sum"),
        retained_next=("retained_next", "sum"))
    out["churned_next"] = out.active_users - out.retained_next
    out["wk"] = pd.to_datetime(out.wk.to_numpy(np.int64) * 86_400,
                               unit="s").astype("datetime64[us]")
    return typed_out(out, schema, sort_by="wk")


EVENTS_WEEKLY_CHURN_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events WHERE event_type = 'purchase'
)
SELECT a.wk AS wk,
       COUNT(*) AS active_users,
       COUNT(b.user_id) AS retained_next,
       COUNT(*) - COUNT(b.user_id) AS churned_next
FROM uw a
LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 7
GROUP BY a.wk
ORDER BY wk
"""


# ---------------------------------------------------------------------------
# events_rate_changepoint: CUSUM over the daily event-rate series
# ---------------------------------------------------------------------------

def events_rate_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint diagnostic over the daily event-count series —
    the sequential drift detector (did the crawl rate shift?): per day,
    the running sum of (count - global mean). The series itself is the
    output; a monitor thresholds |cusum| downstream. Per-batch day-count
    partials are the only thing the scan emits (bounded by the day
    range), the driver folds them, and the cumulative sum runs
    left-to-right in day order — the SAME evaluation order as the
    oracle's windowed SUM, so the float hash is stable. Mean and cumsum
    touch only the bounded grid; nothing about this scales with events."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("int64") // 86_400_000_000).astype("int64")
        c = pd.Series(day).value_counts()
        return pd.DataFrame({"day": c.index.to_numpy(np.int64),
                             "n_events": c.to_numpy(np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n_events", alias_name="n_events"))
        .to_pandas()
    )
    schema = {"day": "int64", "n_events": "int64", "cusum": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("day", kind="stable").reset_index(drop=True)
    n = out.n_events.to_numpy(np.int64)
    mu = n.sum() / len(n)
    out["cusum"] = round_away(np.cumsum(n - mu), 6)
    out["n_events"] = out.n_events.astype("int64")
    return typed_out(out, schema, sort_by="day")


EVENTS_RATE_CHANGEPOINT_SQL = """
WITH d AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
m AS (SELECT AVG(n) AS mu FROM d)
SELECT day, CAST(n AS BIGINT) AS n_events,
       ROUND(SUM(n - mu) OVER (ORDER BY day), 6) AS cusum
FROM d, m
ORDER BY day
"""


# ---------------------------------------------------------------------------
# events_overdispersion_by_type: index-of-dispersion audit
# ---------------------------------------------------------------------------

def events_overdispersion_by_type(sf_dir: str) -> pd.DataFrame:
    """Index of dispersion (variance-to-mean of per-user event counts)
    per event type — the over/under-dispersion screen that separates
    Poisson-like organic traffic (ratio ~1) from bursty bots (>>1) and
    rate-limited clients (<<1). Per-(user, type) partial counts shrink
    each batch to its distinct keys; the user-bucketed exchange makes
    the per-user counts exact; each bucket then collapses to THREE
    moment rows per type (k, sum, sum-of-squares), so the driver folds
    ``types x buckets`` fixed-width rows and finishes with the
    closed-form sample variance. Nothing driver-side scales with users."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size"))

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"))
        n = g.n.to_numpy(np.float64)
        g = g.assign(n=n, n2=n * n)
        return g.groupby("event_type", as_index=False).agg(
            k=("n", "size"), s1=("n", "sum"), s2=("n2", "sum"))

    out = bucketed_combine(
        ds.map_batches(pairs, batch_format="pandas"),
        "user_id", lambda df: df, moments,
        num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"event_type": "object", "n_users": "int64",
              "mean_n": "float64", "var_n": "float64",
              "dispersion": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values(["event_type", "k", "s1", "s2"],
                          kind="stable")
    f = out.groupby("event_type", as_index=False).agg(
        k=("k", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))
    k = f.k.to_numpy(np.float64)
    s1 = f.s1.to_numpy(np.float64)
    s2 = f.s2.to_numpy(np.float64)
    mean = s1 / k
    with np.errstate(divide="ignore", invalid="ignore"):
        var = np.where(k > 1, (s2 - s1 * s1 / k) / (k - 1), np.nan)
    res = pd.DataFrame({
        "event_type": f.event_type,
        "n_users": f.k.astype("int64"),
        "mean_n": round_away(mean, 6),
        "var_n": round_away(var, 6),
        "dispersion": round_away(var / mean, 6),
    })
    return typed_out(res, schema, sort_by="event_type")


EVENTS_OVERDISPERSION_SQL = """
WITH c AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(n), 6) AS mean_n,
       ROUND(VAR_SAMP(n), 6) AS var_n,
       ROUND(VAR_SAMP(n) / AVG(n), 6) AS dispersion
FROM c GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# events_user_survival_curve: purchase-lifespan survival function
# ---------------------------------------------------------------------------

def events_user_survival_curve(sf_dir: str) -> pd.DataFrame:
    """Survival curve of user purchase lifespans — S(t) = share of
    purchasing users whose first-to-last-purchase span reaches t days
    (the retention/survival-analysis staple; any-event lifespans are
    vacuous on this corpus because every user fires events all month,
    purchases actually vary). Per-batch (user, min-day, max-day)
    partials shrink each batch to its users; the user-bucketed exchange
    makes the per-user extremes exact; each bucket emits a
    lifetime-histogram bounded by the day range. The driver folds the
    histograms and takes ONE reverse cumulative sum down the day grid —
    integers until the final share."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"],
                 event_types=["purchase"])

    def extremes(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("int64") // 86_400_000_000).astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "lo": day, "hi": day})
        return g.groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))

    def lifetime_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))
        lt = (g.hi - g.lo).to_numpy(np.int64)
        u, n = np.unique(lt, return_counts=True)
        return pd.DataFrame({"lt": u.astype(np.int64),
                             "n_users": n.astype(np.int64)})

    out = bucketed_combine(
        ds.map_batches(extremes, batch_format="pandas"),
        "user_id", lambda df: df, lifetime_hist,
        num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"t_days": "int64", "n_surviving": "int64",
              "surv_frac": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("lt", as_index=False).agg(n_users=("n_users", "sum"))
    max_lt = int(out["lt"].max())
    counts = np.zeros(max_lt + 1, dtype=np.int64)
    counts[out["lt"].to_numpy(np.int64)] = out.n_users.to_numpy(np.int64)
    surviving = np.cumsum(counts[::-1])[::-1]
    total = float(counts.sum())
    res = pd.DataFrame({
        "t_days": np.arange(max_lt + 1, dtype=np.int64),
        "n_surviving": surviving.astype(np.int64),
        "surv_frac": round_away(surviving / total, 6),
    })
    return typed_out(res, schema, sort_by="t_days")


EVENTS_USER_SURVIVAL_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(FLOOR(EPOCH(MAX(ts)) / 86400)
              - FLOOR(EPOCH(MIN(ts)) / 86400) AS BIGINT) AS lt
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
g AS (SELECT UNNEST(generate_series(0, (SELECT MAX(lt) FROM u))) AS t)
SELECT CAST(g.t AS BIGINT) AS t_days,
       CAST(SUM(CASE WHEN u.lt >= g.t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_surviving,
       ROUND(SUM(CASE WHEN u.lt >= g.t THEN 1 ELSE 0 END)
             / CAST((SELECT COUNT(*) FROM u) AS DOUBLE), 6) AS surv_frac
FROM g CROSS JOIN u
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# events_k_anonymity_audit: quasi-identifier k-anonymity privacy screen
# ---------------------------------------------------------------------------

def events_k_anonymity_audit(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """k-anonymity audit over the (event_type, hour-of-day, value-bucket)
    quasi-identifier combination — the privacy screen a
    training-data release runs next to `pii_scan`: any QI group with
    fewer than k rows re-identifies its members. Per-batch combo-count
    partials are bounded by the QI domain (types x 24 x value buckets),
    the integer fold is exact in any order, and the driver reduces the
    bounded group table to ONE audit row (groups, violating groups,
    exposed rows). Scaling this to 100 TB changes nothing but the
    partial count."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def combos(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "hour": ((df["ts"].astype("int64") // 3_600_000_000) % 24
                     ).astype("int64"),
            "vbucket": np.floor(
                df["value"].to_numpy(np.float64) / 100).astype(np.int64),
        })
        return g.groupby(["event_type", "hour", "vbucket"],
                         as_index=False).agg(cnt=("hour", "size"))

    out = (
        ds.map_batches(combos, batch_format="pandas")
        .groupby(["event_type", "hour", "vbucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    schema = {"n_groups": "int64", "n_violating_groups": "int64",
              "n_exposed_rows": "int64", "n_rows": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    cnt = out.cnt.to_numpy(np.int64)
    viol = cnt < k
    res = pd.DataFrame([{
        "n_groups": np.int64(len(cnt)),
        "n_violating_groups": np.int64(viol.sum()),
        "n_exposed_rows": np.int64(cnt[viol].sum()),
        "n_rows": np.int64(cnt.sum()),
    }])
    return typed_out(res, schema)


EVENTS_K_ANONYMITY_SQL = """
WITH q AS (
  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
         CAST(FLOOR(value / 100) AS BIGINT) AS vbucket
  FROM events
),
g AS (SELECT event_type, hour, vbucket, COUNT(*) AS cnt FROM q GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (cnt < 5) AS BIGINT) AS n_violating_groups,
       CAST(COALESCE(SUM(cnt) FILTER (cnt < 5), 0) AS BIGINT)
         AS n_exposed_rows,
       CAST(SUM(cnt) AS BIGINT) AS n_rows
FROM g
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# events_value_tail_index: Hill estimator over the global top-k
# ---------------------------------------------------------------------------

def events_value_tail_index(sf_dir: str, k: int = 500) -> pd.DataFrame:
    """Hill tail-index estimate over the top-k event values — the
    heavy-tail screen (alpha < 2: unbounded variance, revenue
    concentrated in freak events; this corpus' uniform-ish values give
    alpha ~3.8, i.e. a thin tail, which is the finding). The global
    top-k uses the standard two-level prune: each batch keeps its local
    (value DESC, event_id ASC) top-k, the driver merge-sorts blocks x k
    candidate rows and takes the exact k — the event_id tiebreak makes
    the selected MULTISET identical to the oracle's LIMIT under ties.
    At open scale the same prune nests once more per bucket before the
    driver; k is a constant."""
    ds = _events(sf_dir, ["event_id", "value"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"] > 0]
        df = pd.DataFrame({"value": df["value"].to_numpy(np.float64),
                           "event_id": df["event_id"].to_numpy(np.int64)})
        df = df.sort_values(["value", "event_id"],
                            ascending=[False, True], kind="stable")
        return df.head(k)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    schema = {"k_used": "int64", "x_k": "float64", "hill_alpha": "float64"}
    if cand.empty:
        return typed_out(pd.DataFrame(), schema)
    cand = cand.sort_values(["value", "event_id"],
                            ascending=[False, True], kind="stable").head(k)
    x = cand.value.to_numpy(np.float64)
    xk = float(x.min())
    logs = np.sort(np.log(x / xk))
    out = pd.DataFrame([{
        "k_used": np.int64(len(x)),
        "x_k": round_away(np.float64(xk), 6) + 0.0,
        "hill_alpha": round_away(np.float64(len(x) / logs.sum()), 6) + 0.0,
    }])
    return typed_out(out, schema)


EVENTS_VALUE_TAIL_SQL = """
WITH t AS (
  SELECT value FROM events WHERE value > 0
  ORDER BY value DESC, event_id LIMIT 500
),
m AS (SELECT MIN(value) AS xk FROM t)
SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
       ROUND(MIN(m.xk), 6) AS x_k,
       ROUND(COUNT(*) / SUM(LN(value / m.xk)), 6) AS hill_alpha
FROM t, m
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# events_hourly_uniformity_chi2: chi-square GOODNESS-OF-FIT vs uniform
# ---------------------------------------------------------------------------

def events_hourly_uniformity_chi2(sf_dir: str) -> pd.DataFrame:
    """Chi-square goodness-of-fit of the hour-of-day traffic profile
    against the uniform expectation — the GOF member of the chi-square
    family (``part_type_size_chi2`` tests independence; this tests a
    known distribution). 24-bin integer partials, one row out. The sum
    runs over OBSERVED hours with e = total/24, same as the oracle (at
    any real scale all 24 hours are occupied; a missing hour at toy
    scale contributes to neither side)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = ((df["ts"].astype("int64") // 3_600_000_000) % 24
             ).astype("int64")
        c = pd.Series(h).value_counts()
        return pd.DataFrame({"hour": c.index.to_numpy(np.int64),
                             "n": c.to_numpy(np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_bins": "int64", "n_events": "int64", "chi2": "float64",
              "dof": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("hour", kind="stable")
    n = out.n.to_numpy(np.float64)
    tot = n.sum()
    e = tot / 24
    chi2 = float(((n - e) ** 2 / e).sum())
    res = pd.DataFrame([{
        "n_bins": np.int64(len(n)), "n_events": np.int64(tot),
        "chi2": round_away(np.float64(chi2), 6) + 0.0,
        "dof": np.int64(23),
    }])
    return typed_out(res, schema)


EVENTS_HOURLY_UNIFORMITY_SQL = """
WITH h AS (
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1
),
t AS (SELECT SUM(n) AS tot, CAST(COUNT(*) AS DOUBLE) AS bins FROM h)
SELECT CAST(t.bins AS BIGINT) AS n_bins, CAST(t.tot AS BIGINT) AS n_events,
       ROUND(SUM(POW(h.n - t.tot / 24, 2) / (t.tot / 24)), 6) AS chi2,
       CAST(23 AS BIGINT) AS dof
FROM h, t GROUP BY t.bins, t.tot
"""


# ---------------------------------------------------------------------------
# events_kruskal_by_type: Kruskal-Wallis H across event types
# ---------------------------------------------------------------------------

def events_kruskal_by_type(sf_dir: str) -> pd.DataFrame:
    """Kruskal-Wallis H test — does `value` differ across event types?
    The k-group generalization of the Mann-Whitney pair test, computed
    the same rank-free way: per-(type, value) count partials (bounded by
    the 2-decimal value domain x types, never by events), pooled
    midranks from one cumulative pass over the sorted value grid, rank
    sums as a weighted join against that grid, and the closed form with
    the standard tie correction. No event row is ever ranked."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "value"], as_index=False).agg(
            n=("value", "size")).rename(columns={"value": "v"})

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_events": "int64", "n_groups": "int64",
              "h_stat": "float64", "h_corrected": "float64"}
    if c.empty or c.event_type.nunique() < 2:
        return typed_out(pd.DataFrame(), schema)
    pool = c.groupby("v", as_index=False).agg(m=("n", "sum")).sort_values(
        "v", kind="stable")
    m = pool.m.to_numpy(np.float64)
    mid = np.cumsum(m) - m + (m + 1) / 2
    midmap = pd.Series(mid, index=pool.v.to_numpy())
    c = c.sort_values(["event_type", "v"], kind="stable")
    c["r"] = midmap.loc[c.v].to_numpy()
    rl = c.assign(rs=c.n.to_numpy(np.float64) * c.r).groupby(
        "event_type", as_index=False).agg(nl=("n", "sum"), rsum=("rs", "sum"))
    n = float(rl.nl.sum())
    k = len(rl)
    h_raw = (12.0 / (n * (n + 1))
             * float((rl.rsum.to_numpy(np.float64) ** 2
                      / rl.nl.to_numpy(np.float64)).sum())
             - 3.0 * (n + 1))
    tie = float((m ** 3 - m).sum())
    corr = 1.0 - tie / (n ** 3 - n)
    res = pd.DataFrame([{
        "n_events": np.int64(n), "n_groups": np.int64(k),
        "h_stat": round_away(np.float64(h_raw), 6) + 0.0,
        "h_corrected": round_away(np.float64(h_raw / corr), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_KRUSKAL_SQL = """
WITH c AS (
  SELECT event_type, value AS v, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
pool AS (SELECT v, SUM(n) AS m FROM c GROUP BY 1),
mid AS (
  SELECT v, m, SUM(m) OVER (ORDER BY v) - m + (m + 1) / 2 AS r
  FROM pool
),
rl AS (
  SELECT c.event_type, SUM(c.n) AS nl, SUM(c.n * mid.r) AS rsum
  FROM c JOIN mid ON mid.v = c.v GROUP BY 1
),
tot AS (SELECT SUM(nl) AS n, CAST(COUNT(*) AS DOUBLE) AS k FROM rl),
tc AS (SELECT COALESCE(SUM(m * m * m - m), 0) AS tie FROM pool),
h AS (
  SELECT tot.n, tot.k,
         12.0 / (tot.n * (tot.n + 1))
           * (SELECT SUM(rsum * rsum / nl) FROM rl)
           - 3.0 * (tot.n + 1) AS h_raw,
         1.0 - tc.tie / (tot.n * tot.n * tot.n - tot.n) AS corr
  FROM tot, tc
)
SELECT CAST(n AS BIGINT) AS n_events, CAST(k AS BIGINT) AS n_groups,
       ROUND(h_raw, 6) AS h_stat,
       ROUND(h_raw / corr, 6) AS h_corrected
FROM h WHERE k > 1
"""


# ---------------------------------------------------------------------------
# events_hour_value_spearman: Spearman rank correlation on bounded grids
# ---------------------------------------------------------------------------

def events_hour_value_spearman(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between hour-of-day and value bucket —
    the RANK-correlation family member (``lineitem_corr`` is Pearson on
    raw values; Spearman on midranks is robust to any monotone
    transform). Both variables live on schema-bounded grids (24 hours x
    integer value buckets), so the exact tie-midrank Pearson needs only
    the joint contingency counts: marginal cumulative passes give the
    midranks, one weighted-moment fold gives rho. Nothing row-scaled
    reaches the driver."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "h": ((df["ts"].astype("int64") // 3_600_000_000) % 24
                  ).astype("int64"),
            "b": np.floor(df["value"].to_numpy(np.float64)).astype(np.int64),
        })
        return g.groupby(["h", "b"], as_index=False).agg(n=("h", "size"))

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["h", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_events": "int64", "spearman_rho": "float64"}
    if c.empty or int(c.n.sum()) < 2:
        return typed_out(pd.DataFrame(), schema)

    def midranks(keys, cnts):
        order = np.argsort(keys, kind="stable")
        m = cnts[order].astype(np.float64)
        r = np.cumsum(m) - m + (m + 1) / 2
        return pd.Series(r, index=keys[order])

    hm = c.groupby("h", as_index=False).agg(m=("n", "sum"))
    bm = c.groupby("b", as_index=False).agg(m=("n", "sum"))
    rx = midranks(hm.h.to_numpy(np.int64), hm.m.to_numpy(np.int64))
    ry = midranks(bm.b.to_numpy(np.int64), bm.m.to_numpy(np.int64))
    c = c.sort_values(["h", "b"], kind="stable")
    w = c.n.to_numpy(np.float64)
    x = rx.loc[c.h].to_numpy()
    y = ry.loc[c.b].to_numpy()
    n = w.sum()
    sx, sy = (w * x).sum(), (w * y).sum()
    sxx, syy = (w * x * x).sum(), (w * y * y).sum()
    sxy = (w * x * y).sum()
    rho = (sxy - sx * sy / n) / np.sqrt(
        (sxx - sx * sx / n) * (syy - sy * sy / n))
    res = pd.DataFrame([{
        "n_events": np.int64(n),
        "spearman_rho": round_away(np.float64(rho), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_HOUR_VALUE_SPEARMAN_SQL = """
WITH c AS (
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
         CAST(FLOOR(value) AS BIGINT) AS b,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
hm AS (SELECT h, SUM(n) AS m FROM c GROUP BY 1),
bm AS (SELECT b, SUM(n) AS m FROM c GROUP BY 1),
hr AS (SELECT h, SUM(m) OVER (ORDER BY h) - m + (m + 1) / 2 AS r FROM hm),
br AS (SELECT b, SUM(m) OVER (ORDER BY b) - m + (m + 1) / 2 AS r FROM bm),
j AS (
  SELECT c.n, hr.r AS rx, br.r AS ry
  FROM c JOIN hr ON hr.h = c.h JOIN br ON br.b = c.b
),
m AS (
  SELECT SUM(n) AS n, SUM(n * rx) AS sx, SUM(n * ry) AS sy,
         SUM(n * rx * rx) AS sxx, SUM(n * ry * ry) AS syy,
         SUM(n * rx * ry) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_events,
       ROUND((sxy - sx * sy / n)
             / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
         AS spearman_rho
FROM m WHERE n > 1
"""


# ---------------------------------------------------------------------------
# events_circular_hour_stats: directional statistics on time-of-day
# ---------------------------------------------------------------------------

def events_circular_hour_stats(sf_dir: str) -> pd.DataFrame:
    """Circular (directional) statistics of event time-of-day per type —
    time-of-day is a CIRCLE, and the arithmetic 'mean hour' of traffic
    straddling midnight is nonsense; the circular mean resolves it, and
    the resultant length R says how concentrated the daily rhythm is
    (R ~ 0: uniform around the clock, as here; R -> 1: a sharp daily
    peak). Each batch folds to (type, n, sum-sin, sum-cos) — the
    angular sufficient statistics — and the driver evaluates the
    closed forms on the type-bounded frame."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64") % 86_400_000_000
        th = 2 * np.pi * us.to_numpy(np.float64) / 86_400_000_000
        g = pd.DataFrame({"event_type": df["event_type"], "n": 1.0,
                          "sy": np.sin(th), "sx": np.cos(th)})
        return g.groupby("event_type", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"event_type": "object", "n_events": "int64",
              "circular_mean_hour": "float64",
              "resultant_length": "float64",
              "circular_variance": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(list(parts.columns), kind="stable")
    m = parts.groupby("event_type", as_index=False).sum()
    n = m.n.to_numpy(np.float64)
    sy, sx = m.sy.to_numpy(np.float64), m.sx.to_numpy(np.float64)
    r = np.sqrt(sx * sx + sy * sy) / n
    mean_h = np.fmod(np.arctan2(sy / n, sx / n) / (2 * np.pi) * 24 + 24, 24)
    out = pd.DataFrame({
        "event_type": m.event_type,
        "n_events": n.astype(np.int64),
        "circular_mean_hour": round_away(mean_h, 6),
        "resultant_length": round_away(r, 6),
        "circular_variance": round_away(1 - r, 6),
    })
    return typed_out(out, schema, sort_by="event_type")


EVENTS_CIRCULAR_HOUR_SQL = """
WITH a AS (
  SELECT event_type,
         2 * PI() * (EPOCH_US(ts) % 86400000000) / 86400000000 AS th
  FROM events
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(SIN(th)) AS sy, SUM(COS(th)) AS sx
  FROM a GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       ROUND(FMOD(ATAN2(sy / n, sx / n) / (2 * PI()) * 24 + 24, 24), 6)
         AS circular_mean_hour,
       ROUND(SQRT(sx * sx + sy * sy) / n, 6) AS resultant_length,
       ROUND(1 - SQRT(sx * sx + sy * sy) / n, 6) AS circular_variance
FROM m ORDER BY event_type
"""


def events_type_cross_correlation(sf_dir: str) -> pd.DataFrame:
    """Lead-lag cross-correlation between the click and purchase daily
    series — the pipeline question behind it: does click volume LEAD
    purchase volume (positive lag peak) or just co-move (lag-0 peak)?
    The autocorr sibling (events_hourly_autocorr) correlates one series
    with itself; this correlates two. Each batch folds to (day, type)
    counts; the driver zero-fills the date-range-bounded day grid and
    evaluates Pearson r at each lag in [-3, 3] from INTEGER sufficient
    statistics (counts dot counts — bit-exact, no float-summation-order
    hazard at any scale)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "event_type"],
                 event_types=("click", "purchase"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "day": (df["ts"].astype("int64")
                    // 86_400_000_000).astype("int64"),
            "event_type": df["event_type"],
        }).groupby(["day", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lag": "int64", "n_days": "int64", "xcorr": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    d0 = int(out.day.min())
    k = int(out.day.max()) - d0 + 1
    x = np.zeros(k, np.int64)
    y = np.zeros(k, np.int64)
    cl = out[out.event_type == "click"]
    pu = out[out.event_type == "purchase"]
    x[cl.day.to_numpy(np.int64) - d0] = cl.n.to_numpy(np.int64)
    y[pu.day.to_numpy(np.int64) - d0] = pu.n.to_numpy(np.int64)
    rows = []
    for lag in range(-3, 4):
        lo, hi = max(0, -lag), k - max(0, lag)
        if hi - lo < 2:
            continue
        xa, ya = x[lo:hi], y[lo + lag:hi + lag]
        n = hi - lo
        sx, sy = int(xa.sum()), int(ya.sum())
        vx = n * int(np.dot(xa, xa)) - sx * sx
        vy = n * int(np.dot(ya, ya)) - sy * sy
        if vx <= 0 or vy <= 0:
            continue  # constant window: r undefined (oracle guard)
        r = (n * int(np.dot(xa, ya)) - sx * sy) / np.sqrt(float(vx) * float(vy))
        rows.append({"lag": np.int64(lag), "n_days": np.int64(n),
                     "xcorr": round_away(np.float64(r), 6) + 0.0})
    return typed_out(pd.DataFrame(rows), schema, sort_by="lag")


EVENTS_CROSS_CORRELATION_SQL = """
WITH e AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS d, event_type
  FROM events WHERE event_type IN ('click', 'purchase')
),
span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e HAVING COUNT(*) > 0),
days AS (SELECT UNNEST(generate_series(d0, d1)) AS dd FROM span),
g AS (
  SELECT days.dd AS d,
         CAST(COALESCE(SUM(CASE WHEN e.event_type = 'click'
                                THEN 1 END), 0) AS BIGINT) AS cx,
         CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                THEN 1 END), 0) AS BIGINT) AS cy
  FROM days LEFT JOIN e ON e.d = days.dd GROUP BY 1
),
lags AS (SELECT UNNEST([-3, -2, -1, 0, 1, 2, 3]) AS lag),
p AS (
  SELECT l.lag AS lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a.cx) AS sx, SUM(b.cy) AS sy,
         SUM(a.cx * a.cx) AS sxx, SUM(b.cy * b.cy) AS syy,
         SUM(a.cx * b.cy) AS sxy
  FROM lags l JOIN g a ON TRUE JOIN g b ON b.d = a.d + l.lag
  GROUP BY 1
)
SELECT lag, n AS n_days,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS xcorr
FROM p
WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY lag
"""


def events_ab_conversion_ztest(sf_dir: str) -> pd.DataFrame:
    """Two-proportion z-test between deterministic A/B cohorts — the
    experiment readout every event pipeline ends in (reference has no
    stats layer; this is the training-data-engine companion to the
    one-sample Wilson interval in ``orders_priority_late_share_ci``:
    two samples, pooled variance, signed effect). Cohort assignment is
    ``user_id % 2`` — the hash-mod split an A/B service would emit —
    and conversion is "user has >= 1 purchase event with value >= 100"
    (every synth user purchases at least once, so bare purchase would be
    a vacuous 100%-vs-100% readout; the big-ticket gate converts ~80%
    and leaves both cohorts with real variance).

    Plan: per-batch pre-shrink to distinct (user, purchased) pairs, one
    user-bucketed exchange of those fixed-width rows (O(distinct users),
    never O(events)), per-bucket fold to 4 integers per cohort; the z
    statistic is one closed-form expression on the driver from exact
    integer counts, so it is bit-identical in any arrival order."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({
            "user_id": df["user_id"],
            "purchased": ((df["event_type"] == "purchase")
                          & (df["value"] >= 100.0)).astype("int64"),
        })
        return p.groupby("user_id", as_index=False).agg(
            purchased=("purchased", "max"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False).agg(
            purchased=("purchased", "max"))
        cohort = (u.user_id % 2).to_numpy()
        conv = u.purchased.to_numpy()
        return pd.DataFrame({
            "n_a": [int((cohort == 0).sum())],
            "conv_a": [int(conv[cohort == 0].sum())],
            "n_b": [int((cohort == 1).sum())],
            "conv_b": [int(conv[cohort == 1].sum())],
        })

    out = bucketed_combine(ds, "user_id", partial, combine,
                           num_buckets=16, coalesce_blocks=8).to_pandas()
    schema = {"n_a": "int64", "conv_a": "int64", "n_b": "int64",
              "conv_b": "int64", "rate_a": "float64", "rate_b": "float64",
              "z_score": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    n_a, c_a = int(out.n_a.sum()), int(out.conv_a.sum())
    n_b, c_b = int(out.n_b.sum()), int(out.conv_b.sum())
    if n_a == 0 or n_b == 0:
        return typed_out(pd.DataFrame(), schema)
    ra, rb = c_a / n_a, c_b / n_b
    pool = (c_a + c_b) / (n_a + n_b)
    se2 = pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
    z = (ra - rb) / np.sqrt(se2) if se2 > 0 else 0.0
    res = pd.DataFrame({
        "n_a": [n_a], "conv_a": [c_a], "n_b": [n_b], "conv_b": [c_b],
        "rate_a": round_away(np.array([ra]), 6) + 0.0,
        "rate_b": round_away(np.array([rb]), 6) + 0.0,
        "z_score": round_away(np.array([z]), 6) + 0.0,
    })
    return typed_out(res, schema)


EVENTS_AB_ZTEST_SQL = """
WITH u AS (
  SELECT user_id, user_id % 2 AS cohort,
         MAX(CASE WHEN event_type = 'purchase' AND value >= 100
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), k AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS n_a,
    CAST(COALESCE(SUM(conv) FILTER (WHERE cohort = 0), 0) AS BIGINT)
        AS conv_a,
    CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS n_b,
    CAST(COALESCE(SUM(conv) FILTER (WHERE cohort = 1), 0) AS BIGINT)
        AS conv_b
  FROM u HAVING COUNT(*) > 0
)
SELECT n_a, conv_a, n_b, conv_b,
       ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
       ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN 0.0
            ELSE ROUND((CAST(conv_a AS DOUBLE) / n_a
                        - CAST(conv_b AS DOUBLE) / n_b)
             / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) END AS z_score
FROM k WHERE n_a > 0 AND n_b > 0
"""


def events_transition_entropy(sf_dir: str) -> pd.DataFrame:
    """Conditional next-step entropy H(next | current) per event type —
    the predictability profile of the behavioral Markov chain
    (``events_path_transitions`` gives the raw matrix;
    ``events_markov_stationary`` its fixpoint; this is the per-state
    uncertainty a sequence model would face, the sequence-mining
    closed-form companion). A state whose followers are deterministic
    scores 0 nats; a uniformly-branching one scores ln(n_types).

    Plan: reuses the transition-count machinery (user-bucketed exchange,
    shift-compare pairs, n_types^2-bounded matrix); entropy is the
    decomposed form H = ln(total) - sum(n*ln n)/total on exact integer
    counts — one flop per matrix cell on the driver, same literal
    expression as the oracle."""
    t = events_path_transitions(sf_dir)
    schema = {"from_type": "object", "n_transitions": "int64",
              "n_next_types": "int64", "entropy": "float64"}
    if t.empty:
        return typed_out(pd.DataFrame(), schema)
    n = t.n.to_numpy(np.float64)
    t = t.assign(nlogn=n * np.log(n))
    g = t.groupby("from_type", as_index=False).agg(
        n_transitions=("n", "sum"), n_next_types=("n", "size"),
        nlogn=("nlogn", "sum"))
    tot = g.n_transitions.to_numpy(np.float64)
    ent = np.log(tot) - g.nlogn.to_numpy(np.float64) / tot
    res = pd.DataFrame({
        "from_type": g.from_type,
        "n_transitions": g.n_transitions.astype("int64"),
        "n_next_types": g.n_next_types.astype("int64"),
        "entropy": round_away(ent, 6) + 0.0,
    })
    return typed_out(res, schema, sort_by=["from_type"])


EVENTS_TRANSITION_ENTROPY_SQL = """
WITH o AS (
  SELECT event_type,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), c AS (
  SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
)
SELECT from_type,
       CAST(SUM(n) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_next_types,
       ROUND(LN(CAST(SUM(n) AS DOUBLE))
             - SUM(CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE)))
               / CAST(SUM(n) AS DOUBLE), 6) AS entropy
FROM c GROUP BY from_type ORDER BY from_type
"""


def events_weekly_decomposition(sf_dir: str) -> pd.DataFrame:
    """Classical seasonal decomposition (trend = centered 7-day moving
    average, seasonal = day-of-week mean of the detrended series) of
    the daily event-count stream — the additive-decomposition readout
    behind "is Saturday really 20% quieter, or is that the launch-week
    trend?". ``events_seasonality_profile`` averages RAW counts per
    slot; this one removes the trend first, so a ramping corpus does
    not masquerade as seasonality.

    Plan: per-batch (epoch-day, count) integer partials -> a grid
    bounded by the TIME SPAN; zero-fill, the 7-day window sums come
    off one cumulative sum (exact integers divided by 7.0, same flop
    as the oracle's AVG window), and the day-of-week fold only covers
    days with a FULL window, mirroring the oracle's row-number
    filter."""
    ev = _events(sf_dir, columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        return pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size().rename(columns={"size": "n"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"dow": "int64", "n_days": "int64", "seasonal": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby("day", as_index=False).agg(n=("n", "sum"))
    lo, hi = int(m.day.min()), int(m.day.max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[m.day.to_numpy(np.int64) - lo] = m.n.to_numpy(np.int64)
    n = len(y)
    if n < 7:
        return typed_out(pd.DataFrame(), schema)
    cs = np.concatenate(([0], np.cumsum(y)))
    centers = np.arange(3, n - 3)
    trend = (cs[centers + 4] - cs[centers - 3]) / 7.0
    det = y[centers].astype(np.float64) - trend
    dow = ((lo + centers) + 4) % 7  # epoch day 0 = Thursday = DuckDB 4
    g = pd.DataFrame({"dow": dow, "det": det}).groupby(
        "dow", as_index=False).agg(n_days=("det", "size"),
                                   seasonal=("det", "mean"))
    g["seasonal"] = round_away(g.seasonal.to_numpy(np.float64), 6) + 0.0
    g["n_days"] = g.n_days.astype("int64")
    g["dow"] = g.dow.astype("int64")
    return typed_out(g, schema, sort_by="dow")


EVENTS_WEEKLY_DECOMPOSITION_SQL = """
WITH b AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
  FROM events HAVING COUNT(*) > 0
), spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
), c AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
), d AS (
  SELECT CAST(s.day AS DATE) AS day, COALESCE(c.n, 0) AS y,
         ROW_NUMBER() OVER (ORDER BY s.day) AS i,
         COUNT(*) OVER () AS nn
  FROM spine s LEFT JOIN c ON c.day = CAST(s.day AS DATE)
), t AS (
  SELECT day, y, i, nn,
         AVG(y) OVER (ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tr
  FROM d
), f AS (
  SELECT dayofweek(day) AS dow, y - tr AS det
  FROM t WHERE i >= 4 AND i <= nn - 3 AND nn >= 7
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(det), 6) AS seasonal
FROM f GROUP BY dow ORDER BY dow
"""


def events_error_pchart(sf_dir: str) -> pd.DataFrame:
    """SPC p-chart over the daily error proportion — the
    statistical-process-control gate (Shewhart 3-sigma limits with
    per-day sample-size-adjusted bounds) that separates "error rate
    wobbles within binomial noise" from "a day genuinely broke":
    the changepoint operator finds WHERE the level shifted; this
    counts how many days are incompatible with ONE stable level.

    Plan: per-batch (day, n, n_err) integer partials -> a span-bounded
    grid; pbar and every per-day limit are closed-form driver flops on
    exact integers, written as the same literal expressions as the
    oracle so the strict above/below comparisons agree bit-for-bit."""
    ev = _events(sf_dir, columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        g = pd.DataFrame({
            "day": day, "n": 1,
            "e": (df.event_type == "error").astype("int64").to_numpy(),
        })
        return g.groupby("day", as_index=False).agg(n=("n", "sum"),
                                                    e=("e", "sum"))

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"n_days": "int64", "p_bar": "float64",
              "days_above_ucl": "int64", "days_below_lcl": "int64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby("day", as_index=False).agg(n=("n", "sum"),
                                                 e=("e", "sum"))
    tot_n, tot_e = int(m.n.sum()), int(m.e.sum())
    if tot_n == 0:
        return typed_out(pd.DataFrame(), schema)
    pbar = tot_e / float(tot_n)
    nd = m.n.to_numpy(np.float64)
    p = m.e.to_numpy(np.float64) / nd
    sig = np.sqrt(pbar * (1.0 - pbar) / nd)
    ucl = pbar + 3.0 * sig
    lcl = np.maximum(pbar - 3.0 * sig, 0.0)
    res = pd.DataFrame([{
        "n_days": np.int64(len(m)),
        "p_bar": round_away(np.float64(pbar), 6) + 0.0,
        "days_above_ucl": np.int64(int((p > ucl).sum())),
        "days_below_lcl": np.int64(int((p < lcl).sum())),
    }])
    return typed_out(res, schema)


EVENTS_ERROR_PCHART_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS e
  FROM events GROUP BY 1
), k AS (
  SELECT SUM(e) / CAST(SUM(n) AS DOUBLE) AS pbar FROM d
  HAVING SUM(n) > 0
), f AS (
  SELECT d.e / CAST(d.n AS DOUBLE) AS p,
         k.pbar + 3.0 * SQRT(k.pbar * (1.0 - k.pbar) / d.n) AS ucl,
         GREATEST(k.pbar - 3.0 * SQRT(k.pbar * (1.0 - k.pbar) / d.n),
                  0.0) AS lcl,
         k.pbar
  FROM d CROSS JOIN k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(MAX(pbar), 6) AS p_bar,
       CAST(SUM(CASE WHEN p > ucl THEN 1 ELSE 0 END) AS BIGINT)
           AS days_above_ucl,
       CAST(SUM(CASE WHEN p < lcl THEN 1 ELSE 0 END) AS BIGINT)
           AS days_below_lcl
FROM f HAVING COUNT(*) > 0
"""


def events_daily_permutation_entropy(sf_dir: str) -> pd.DataFrame:
    """Order-3 permutation entropy of the zero-filled daily event-count
    series — the model-free complexity readout (Bandt-Pompe): a ramp or
    strict weekly sawtooth concentrates all triples in one or two
    ordinal patterns (entropy ~ 0), white noise spreads them uniformly
    over the 6 patterns (entropy ~ ln 6). Where Ljung-Box needs linear
    correlation to convict, this sees ANY monotone structure. Ties
    break by POSITION (stable ascending sort), the classic Bandt-Pompe
    convention, encoded as identical rank comparisons on both sides.

    Plan: per-batch (epoch-day, count) integer partials -> span-bounded
    zero-filled grid; the triple ranks are three vectorized compares on
    the driver array (span-sized), the pattern histogram has at most 6
    rows."""
    ev = _events(sf_dir, columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        return pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size().rename(columns={"size": "n"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"n_triples": "int64", "n_patterns": "int64",
              "perm_entropy": "float64", "normalized_pe": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby("day", as_index=False).agg(n=("n", "sum"))
    lo, hi = int(m.day.min()), int(m.day.max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[m.day.to_numpy(np.int64) - lo] = m.n.to_numpy(np.int64)
    if len(y) < 3:
        return typed_out(pd.DataFrame(), schema)
    a, b, c = y[:-2], y[1:-1], y[2:]
    r0 = (b < a).astype(np.int64) + (c < a).astype(np.int64)
    r1 = (a <= b).astype(np.int64) + (c < b).astype(np.int64)
    r2 = (a <= c).astype(np.int64) + (b <= c).astype(np.int64)
    code = r0 * 9 + r1 * 3 + r2
    cnt = pd.Series(code).value_counts().to_numpy(np.float64)
    tn = float(cnt.sum())
    h = float(-np.sum((cnt / tn) * np.log(cnt / tn)))
    res = pd.DataFrame([{
        "n_triples": np.int64(tn), "n_patterns": np.int64(len(cnt)),
        "perm_entropy": round_away(np.float64(h), 6) + 0.0,
        "normalized_pe": round_away(np.float64(h / np.log(6.0)), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_PERMUTATION_ENTROPY_SQL = """
WITH b AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
  FROM events HAVING COUNT(*) > 0
), spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
), c AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
), d AS (
  SELECT CAST(s.day AS DATE) AS day, COALESCE(c.n, 0) AS y
  FROM spine s LEFT JOIN c ON c.day = CAST(s.day AS DATE)
), t AS (
  SELECT y AS a,
         LEAD(y, 1) OVER (ORDER BY day) AS b2,
         LEAD(y, 2) OVER (ORDER BY day) AS c2
  FROM d
), p AS (
  SELECT (CASE WHEN b2 < a THEN 1 ELSE 0 END)
         + (CASE WHEN c2 < a THEN 1 ELSE 0 END) AS r0,
         (CASE WHEN a <= b2 THEN 1 ELSE 0 END)
         + (CASE WHEN c2 < b2 THEN 1 ELSE 0 END) AS r1,
         (CASE WHEN a <= c2 THEN 1 ELSE 0 END)
         + (CASE WHEN b2 <= c2 THEN 1 ELSE 0 END) AS r2
  FROM t WHERE c2 IS NOT NULL
), g AS (
  SELECT r0 * 9 + r1 * 3 + r2 AS code, CAST(COUNT(*) AS DOUBLE) AS n
  FROM p GROUP BY 1
), tot AS (
  SELECT SUM(n) AS tn FROM g
)
SELECT CAST(tot.tn AS BIGINT) AS n_triples,
       CAST(COUNT(*) AS BIGINT) AS n_patterns,
       ROUND(-SUM((n / tot.tn) * LN(n / tot.tn)), 6) AS perm_entropy,
       ROUND(-SUM((n / tot.tn) * LN(n / tot.tn)) / LN(6.0), 6)
           AS normalized_pe
FROM g CROSS JOIN tot
GROUP BY tot.tn
"""


def events_daily_grubbs(sf_dir: str) -> pd.DataFrame:
    """Grubbs extreme-outlier statistic on the daily event-count series
    — G = max|y - mean| / sd (sample sd), plus WHICH day is the extreme
    (earliest on ties): the single-worst-day audit that complements the
    p-chart (which counts limit breaches) and CUSUM (which finds level
    shifts) by naming the one day most incompatible with the rest.

    Plan: per-batch (epoch-day, count) integer partials -> span-bounded
    zero-filled grid; mean/sd come from exact integer sums in the same
    literal expression shape as the oracle, argmax is one vectorized
    pass with the earliest-day tie rule mirrored by the oracle's
    ORDER BY dev DESC, day LIMIT 1."""
    ev = _events(sf_dir, columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df.ts.astype("int64").to_numpy() // 86_400_000_000
        return pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size().rename(columns={"size": "n"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"n_days": "int64", "mean_n": "float64", "sd_n": "float64",
              "g_stat": "float64", "outlier_day": "object",
              "outlier_n": "int64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    m = parts.groupby("day", as_index=False).agg(n=("n", "sum"))
    lo, hi = int(m.day.min()), int(m.day.max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[m.day.to_numpy(np.int64) - lo] = m.n.to_numpy(np.int64)
    nn = len(y)
    if nn < 3:
        return typed_out(pd.DataFrame(), schema)
    s1, s2 = int(y.sum()), int((y * y).sum())
    mu = s1 / float(nn)
    var = (s2 - s1 * (s1 / float(nn))) / (nn - 1.0)
    if var <= 0:
        return typed_out(pd.DataFrame(), schema)
    dev = np.abs(y.astype(np.float64) - mu)
    idx = int(np.argmax(dev))  # first max = earliest day
    g = float(dev[idx] / np.sqrt(var))
    day_str = str(np.datetime64(int(lo + idx), "D"))
    res = pd.DataFrame([{
        "n_days": np.int64(nn),
        "mean_n": round_away(np.float64(mu), 6) + 0.0,
        "sd_n": round_away(np.float64(np.sqrt(var)), 6) + 0.0,
        "g_stat": round_away(np.float64(g), 6) + 0.0,
        "outlier_day": day_str,
        "outlier_n": np.int64(y[idx]),
    }])
    return typed_out(res, schema)


EVENTS_DAILY_GRUBBS_SQL = """
WITH b AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
  FROM events HAVING COUNT(*) > 0
), spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
), c AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
), d AS (
  SELECT CAST(s.day AS DATE) AS day, COALESCE(c.n, 0) AS y
  FROM spine s LEFT JOIN c ON c.day = CAST(s.day AS DATE)
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
         SUM(CAST(y AS DOUBLE)) AS s1,
         SUM(CAST(y AS DOUBLE) * y) AS s2
  FROM d HAVING COUNT(*) >= 3
), k AS (
  SELECT nn, s1 / nn AS mu,
         (s2 - s1 * (s1 / nn)) / (nn - 1.0) AS var
  FROM m
), w AS (
  SELECT d.day, d.y, ABS(d.y - k.mu) AS dev, k.nn, k.mu, k.var
  FROM d CROSS JOIN k WHERE k.var > 0
  ORDER BY ABS(d.y - k.mu) DESC, d.day
  LIMIT 1
)
SELECT nn AS n_days,
       ROUND(mu, 6) AS mean_n,
       ROUND(SQRT(var), 6) AS sd_n,
       ROUND(dev / SQRT(var), 6) AS g_stat,
       CAST(day AS VARCHAR) AS outlier_day,
       CAST(y AS BIGINT) AS outlier_n
FROM w
"""


def events_type_burstiness(sf_dir: str) -> pd.DataFrame:
    """Goh-Barabási burstiness B = (sd - mean)/(sd + mean) and memory
    coefficient M = corr(gap_i, gap_{i+1}) of the inter-arrival gaps
    per event type — the two-axis fingerprint that separates periodic
    crawler traffic (B < 0), Poisson background (B ~ 0, M ~ 0) and
    human bursts (B > 0, M > 0). The per-USER gap profile feeds bot
    scoring; this per-TYPE one answers "which event streams can be
    batch-scheduled vs need burst headroom?".

    Plan: a type-bucketed exchange co-locates each type's stream (the
    ``events_inter_arrival_stats`` shape; salt by time range if one
    type dominates at larger scale); the bucket sorts once
    (ts, event_id — the oracle's window order), gaps are one diff, and
    B / M come from population-moment sums written as the oracle's
    literal expressions on identical second-scaled doubles."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "n_gaps", "mean_gap_s", "burstiness",
                "memory_coef"]
        empty = pd.DataFrame({c: pd.Series(dtype=d) for c, d in zip(
            cols, ["object", "int64", "float64", "float64", "float64"])})
        if len(g) < 3:
            return empty
        g = g.sort_values(["event_type", "ts", "event_id"], kind="stable")
        rows = []
        for et, f in g.groupby("event_type", sort=True):
            us = f.ts.astype("int64").to_numpy()
            if len(us) < 3:
                continue
            gap = np.diff(us).astype(np.float64) / 1000000.0
            n = float(len(gap))
            mu = float(np.sum(gap)) / n
            var = float(np.sum(gap * gap)) / n - mu * mu
            sd = np.sqrt(var) if var > 0 else 0.0
            if sd + mu <= 0:
                continue
            a, b = gap[:-1], gap[1:]
            m = float(len(a))
            if m < 2:
                continue
            ma = float(np.sum(a)) / m
            mb = float(np.sum(b)) / m
            cov = float(np.sum(a * b)) / m - ma * mb
            va = float(np.sum(a * a)) / m - ma * ma
            vb = float(np.sum(b * b)) / m - mb * mb
            if va * vb <= 0:
                continue
            rows.append((et, np.int64(len(gap)),
                         round_away(np.float64(mu), 6) + 0.0,
                         round_away(np.float64((sd - mu) / (sd + mu)), 6)
                         + 0.0,
                         round_away(np.float64(cov / np.sqrt(va * vb)), 6)
                         + 0.0))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=cols)

    out = bucketed_combine(ds, "event_type", lambda df: df, combine,
                           num_buckets=8, coalesce_blocks=4).to_pandas()
    schema = {"event_type": "object", "n_gaps": "int64",
              "mean_gap_s": "float64", "burstiness": "float64",
              "memory_coef": "float64"}
    return typed_out(out, schema, sort_by="event_type")


EVENTS_TYPE_BURSTINESS_SQL = """
WITH e AS (
  SELECT event_type, EPOCH_US(ts) AS us, event_id FROM events
), g AS (
  SELECT event_type, us, event_id,
         CAST(us - LAG(us) OVER (PARTITION BY event_type
                                 ORDER BY us, event_id) AS DOUBLE)
             / 1000000.0 AS gap
  FROM e
), h AS (
  SELECT event_type, gap,
         LAG(gap) OVER (PARTITION BY event_type
                        ORDER BY us, event_id) AS pg
  FROM g WHERE gap IS NOT NULL
), s AS (
  SELECT event_type,
         CAST(COUNT(gap) AS DOUBLE) AS n,
         SUM(gap) AS s1, SUM(gap * gap) AS s2,
         CAST(COUNT(pg) AS DOUBLE) AS m,
         SUM(CASE WHEN pg IS NOT NULL THEN pg END) AS sa,
         SUM(CASE WHEN pg IS NOT NULL THEN gap END) AS sb,
         SUM(pg * gap) AS sab,
         SUM(pg * pg) AS saa,
         SUM(CASE WHEN pg IS NOT NULL THEN gap * gap END) AS sbb
  FROM h GROUP BY event_type
), k AS (
  SELECT event_type, n, s1 / n AS mu,
         CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0
              THEN SQRT(s2 / n - (s1 / n) * (s1 / n)) ELSE 0.0 END AS sd,
         m, sa / m AS ma, sb / m AS mb,
         sab / m - (sa / m) * (sb / m) AS cov,
         saa / m - (sa / m) * (sa / m) AS va,
         sbb / m - (sb / m) * (sb / m) AS vb
  FROM s WHERE n >= 2 AND m >= 2
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND(mu, 6) AS mean_gap_s,
       ROUND((sd - mu) / (sd + mu), 6) AS burstiness,
       ROUND(cov / SQRT(va * vb), 6) AS memory_coef
FROM k WHERE sd + mu > 0 AND va * vb > 0
ORDER BY event_type
"""


def events_friedman_by_type(sf_dir: str) -> pd.DataFrame:
    """Friedman blocked rank test — do the event types maintain a
    consistent daily ORDERING of volume (blocks = days, treatments =
    types)? Kruskal pools all observations and is blind to day-to-day
    level shifts; Friedman ranks WITHIN each day, so a type that is
    reliably the busiest every single day convicts even when absolute
    volumes swing. The scheduler's question: is the type mix stable
    enough to plan per-type capacity by rank?

    Plan: one (day, type) count fold — grid bounded by span x schema,
    never by events — then the driver zero-fills the grid, mid-ranks
    each day's k counts (pandas average ranks = the oracle's
    RANK + (ties-1)/2 window), and evaluates the classic Q plus
    scipy's tie-corrected variant Q / (1 - sum(t^3-t)/(n k (k^2-1)))."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "day": (df.ts.astype("int64") // 86_400_000_000),
            "event_type": df.event_type,
        })
        return g.groupby(["day", "event_type"], as_index=False).agg(
            n=("day", "size"))

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_days": "int64", "k_types": "int64", "q_stat": "float64",
              "q_corrected": "float64"}
    if c.empty or c.event_type.nunique() < 2:
        return typed_out(pd.DataFrame(), schema)
    days = np.sort(c.day.unique())
    types = np.sort(c.event_type.unique().astype(object))
    grid = (pd.MultiIndex.from_product([days, types],
                                       names=["day", "event_type"])
            .to_frame(index=False)
            .merge(c, on=["day", "event_type"], how="left"))
    grid["n"] = grid.n.fillna(0).astype(np.int64)
    grid["r"] = grid.groupby("day")["n"].rank(method="average")
    nn = float(len(days))
    k = float(len(types))
    rj = grid.groupby("event_type")["r"].sum().to_numpy(np.float64)
    q = (12.0 / (nn * k * (k + 1.0)) * float(np.sum(rj * rj))
         - 3.0 * nn * (k + 1.0))
    tt = grid.groupby(["day", "n"])["r"].transform("size").to_numpy(
        np.float64)
    ties = float(np.sum(tt * tt - 1.0))
    corr = 1.0 - ties / (k * (k * k - 1.0) * nn)
    if corr <= 0:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame([{
        "n_days": np.int64(nn), "k_types": np.int64(k),
        "q_stat": round_away(np.float64(q), 6) + 0.0,
        "q_corrected": round_away(np.float64(q / corr), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_FRIEDMAN_SQL = """
WITH e AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM e),
types AS (SELECT DISTINCT event_type FROM e),
g AS (
  SELECT d.day, t.event_type, COALESCE(e.n, 0) AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN e ON e.day = d.day AND e.event_type = t.event_type
), r AS (
  SELECT day, event_type, n,
         RANK() OVER (PARTITION BY day ORDER BY n)
             + (COUNT(*) OVER (PARTITION BY day, n) - 1) / 2.0 AS mr,
         CAST(COUNT(*) OVER (PARTITION BY day, n) AS DOUBLE) AS tt
  FROM g
), rs AS (
  SELECT event_type, SUM(mr) AS rj FROM r GROUP BY 1
), dims AS (
  SELECT CAST((SELECT COUNT(*) FROM days) AS DOUBLE) AS nn,
         CAST((SELECT COUNT(*) FROM types) AS DOUBLE) AS k,
         (SELECT SUM(tt * tt - 1.0) FROM r) AS ties
), q AS (
  SELECT nn, k,
         12.0 / (nn * k * (k + 1.0)) * (SELECT SUM(rj * rj) FROM rs)
             - 3.0 * nn * (k + 1.0) AS q_raw,
         1.0 - ties / (k * (k * k - 1.0) * nn) AS corr
  FROM dims
)
SELECT CAST(nn AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_types,
       ROUND(q_raw, 6) AS q_stat,
       ROUND(q_raw / corr, 6) AS q_corrected
FROM q WHERE k >= 2 AND corr > 0
"""


def events_daily_hodges_lehmann(sf_dir: str) -> pd.DataFrame:
    """Hodges-Lehmann estimate of the typical daily event volume — the
    median of all Walsh averages (x_i + x_j)/2, i <= j. The rank-test
    companion to the plain median: ~95% Gaussian efficiency (the
    median's is 64%) while keeping a 29% breakdown point, so a handful
    of outage/spike days cannot drag it the way they drag the mean.
    The right "normal day" number to provision against.

    Plan: the standard day-count fold (span-bounded integer grid); the
    Walsh set is the grid's upper triangle INCLUDING the diagonal —
    quadratic only in the bounded day span, one np.add.outer on the
    driver — and the median interpolates linearly exactly like the
    oracle's MEDIAN over the mirrored self-join."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df.ts.astype("int64") // 86_400_000_000).astype("int64")
        c = pd.Series(day).value_counts()
        return pd.DataFrame({"day": c.index.to_numpy(np.int64),
                             "n": c.to_numpy(np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_days": "int64", "n_walsh": "int64",
              "hl_estimate": "float64", "raw_median": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    c = np.sort(out.n.to_numpy(np.int64))
    iu = np.triu_indices(len(c))
    walsh = (c[iu[0]] + c[iu[1]]) / 2.0
    res = pd.DataFrame([{
        "n_days": np.int64(len(c)),
        "n_walsh": np.int64(len(walsh)),
        "hl_estimate": round_away(np.float64(
            np.percentile(walsh, 50, method="linear")), 6) + 0.0,
        "raw_median": round_away(np.float64(
            np.percentile(c.astype(np.float64), 50, method="linear")), 6)
            + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_HODGES_LEHMANN_SQL = """
WITH d AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), w AS (
  SELECT (a.n + b.n) / 2.0 AS v
  FROM d a JOIN d b ON a.day <= b.day
)
SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_walsh,
       ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY v), 6)
           AS hl_estimate,
       ROUND((SELECT percentile_cont(0.5)
                  WITHIN GROUP (ORDER BY CAST(n AS DOUBLE)) FROM d), 6)
           AS raw_median
FROM w HAVING COUNT(*) > 0
"""


def events_gap_exponential_gof(sf_dir: str) -> pd.DataFrame:
    """One-sample Kolmogorov-Smirnov goodness-of-fit of the global
    inter-arrival gaps against a fitted exponential — the formal
    verdict on "is this stream Poisson?" that burstiness (a summary
    index) and overdispersion (count-variance) only hint at: D is the
    largest ECDF deviation from 1-exp(-x/mean), with the asymptotic
    Kolmogorov p (k<=100 series, Stephens correction — same machinery
    as the BH pair tests). Poisson-compatible streams can be
    batch-scheduled from the rate alone; a rejected fit needs burst
    headroom.

    Plan: gaps are microsecond-quantized, so a (gap, count) fold is
    bounded by the DISTINCT-gap domain, never the event count; the
    driver walks the sorted grid once (both ECDF one-sided deviations,
    the oracle's F_hi/F_lo), with mean and N exact integers until the
    final divisions."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "event_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["ts", "event_id"], kind="stable")
        us = d.ts.astype("int64").to_numpy()
        if len(us) < 2:
            return pd.DataFrame({"gap": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        gap = np.diff(us)
        c = pd.Series(gap).value_counts()
        return pd.DataFrame({"gap": c.index.to_numpy(np.int64),
                             "n": c.to_numpy(np.int64)})

    # events.parquet is globally ts-sorted (TESTDATA.md), but batches
    # split the stream: per-batch diffs miss the boundary gaps. Fold the
    # per-batch interior gaps AND stitch the per-batch (first, last)
    # halo rows on the driver — bounded by block count, same shape as
    # the SNM halo.
    def halo(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["ts", "event_id"], kind="stable")
        if not len(d):
            return pd.DataFrame({"first_us": pd.Series(dtype="int64"),
                                 "last_us": pd.Series(dtype="int64")})
        us = d.ts.astype("int64").to_numpy()
        return pd.DataFrame({"first_us": [np.int64(us[0])],
                             "last_us": [np.int64(us[-1])]})

    interior = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("gap")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    halos = ds.map_batches(halo, batch_format="pandas").to_pandas()
    schema = {"n_gaps": "int64", "mean_gap_s": "float64",
              "ks_stat": "float64", "p_value": "float64"}
    if halos.empty:
        return typed_out(pd.DataFrame(), schema)
    halos = halos.sort_values(["first_us", "last_us"], kind="stable")
    boundary = (halos.first_us.to_numpy(np.int64)[1:]
                - halos.last_us.to_numpy(np.int64)[:-1])
    cnt = pd.concat([
        interior,
        pd.DataFrame({"gap": boundary,
                      "n": np.ones(len(boundary), np.int64)}),
    ]).groupby("gap", as_index=False).agg(n=("n", "sum"))
    if cnt.empty or cnt.n.sum() < 2:
        return typed_out(pd.DataFrame(), schema)
    cnt = cnt.sort_values("gap", kind="stable")
    g = cnt.gap.to_numpy(np.int64)
    n = cnt.n.to_numpy(np.int64)
    nn = float(n.sum())
    mu = float((g * n).sum()) / nn / 1000000.0
    if mu <= 0:
        return typed_out(pd.DataFrame(), schema)
    gs = g.astype(np.float64) / 1000000.0
    ft = 1.0 - np.exp(-gs / mu)
    hi = np.cumsum(n).astype(np.float64) / nn
    lo = (np.cumsum(n) - n).astype(np.float64) / nn
    d = float(np.max(np.maximum(np.abs(hi - ft), np.abs(lo - ft))))
    lam = (np.sqrt(nn) + 0.12 + 0.11 / np.sqrt(nn)) * d
    kk = np.arange(1, 101, dtype=np.float64)
    sgn = np.where(np.arange(1, 101) % 2 == 1, 1.0, -1.0)
    p = 2.0 * float(np.sum(sgn * np.exp(-2.0 * kk * kk * lam * lam)))
    res = pd.DataFrame([{
        "n_gaps": np.int64(nn),
        "mean_gap_s": round_away(np.float64(mu), 6) + 0.0,
        "ks_stat": round_away(np.float64(d), 6) + 0.0,
        "p_value": round_away(np.float64(min(1.0, max(0.0, p))), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_GAP_EXPONENTIAL_GOF_SQL = """
WITH e AS (
  SELECT EPOCH_US(ts) AS us, event_id FROM events
), gp AS (
  SELECT us - LAG(us) OVER (ORDER BY us, event_id) AS gap FROM e
), cnt AS (
  SELECT gap, CAST(COUNT(*) AS BIGINT) AS n
  FROM gp WHERE gap IS NOT NULL GROUP BY gap
), dims AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS nn,
         SUM(gap * n) / CAST(SUM(n) AS DOUBLE) / 1000000.0 AS mu
  FROM cnt HAVING SUM(n) >= 2
), walk AS (
  SELECT CAST(SUM(n) OVER (ORDER BY gap) AS DOUBLE) / dims.nn AS hi,
         CAST(SUM(n) OVER (ORDER BY gap) - n AS DOUBLE) / dims.nn AS lo,
         1.0 - EXP(-(gap / 1000000.0) / dims.mu) AS ft,
         dims.nn AS nn
  FROM cnt, dims WHERE dims.mu > 0
), dstat AS (
  SELECT MAX(GREATEST(ABS(hi - ft), ABS(lo - ft))) AS d,
         MAX(nn) AS nn
  FROM walk HAVING COUNT(*) > 0
), lamb AS (
  SELECT nn, d, (SQRT(nn) + 0.12 + 0.11 / SQRT(nn)) * d AS lam
  FROM dstat
)
SELECT CAST(nn AS BIGINT) AS n_gaps,
       ROUND((SELECT mu FROM dims), 6) AS mean_gap_s,
       ROUND(d, 6) AS ks_stat,
       ROUND(LEAST(1.0, GREATEST(0.0, 2.0 * (
           SELECT SUM(CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
                      * EXP(-2.0 * k * k * lamb.lam * lamb.lam))
           FROM (SELECT UNNEST(range(1, 101)) AS k)))), 6) AS p_value
FROM lamb
"""


def events_daily_bootstrap_ci(sf_dir: str, b: int = 200) -> pd.DataFrame:
    """Percentile-bootstrap 95% CI for the mean daily event volume —
    RESAMPLING inference, the model-free uncertainty family the catalog
    lacked: the Wilson/z intervals assume a parametric form, the
    bootstrap only assumes exchangeable days, so a heavy-tailed or
    multi-modal daily distribution gets an honest (often asymmetric)
    interval. The replicate RNG is md5("r:i") — deterministic and
    REPRODUCED BIT-FOR-BIT by the oracle, the same fixed-hash trick the
    corpus samplers use, so "random" resampling stays a testable pure
    function of the input.

    Plan: the day-count fold (span-bounded); the driver materializes
    b x n_days md5 draws (6k hashes at b=200 on a 30-day stream —
    constant work, never scales with events)."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df.ts.astype("int64") // 86_400_000_000).astype("int64")
        c = pd.Series(day).value_counts()
        return pd.DataFrame({"day": c.index.to_numpy(np.int64),
                             "n": c.to_numpy(np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_days": "int64", "b_replicates": "int64",
              "mean_daily": "float64", "ci_lo": "float64",
              "ci_hi": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("day", kind="stable")
    c = out.n.to_numpy(np.int64)
    n = len(c)
    idx = np.empty((b, n), np.int64)
    for r in range(1, b + 1):
        for i in range(n):
            h = hashlib.md5(f"{r}:{i}".encode()).hexdigest()
            idx[r - 1, i] = int(h[:8], 16) % n
    means = c[idx].sum(axis=1) / float(n)
    res = pd.DataFrame([{
        "n_days": np.int64(n), "b_replicates": np.int64(b),
        "mean_daily": round_away(
            np.float64(float(c.sum()) / n), 6) + 0.0,
        "ci_lo": round_away(np.float64(
            np.percentile(means, 2.5, method="linear")), 6) + 0.0,
        "ci_hi": round_away(np.float64(
            np.percentile(means, 97.5, method="linear")), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_BOOTSTRAP_CI_SQL = """
WITH d AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), ix AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i,
         COUNT(*) OVER () AS nn
  FROM d
), draws AS (
  SELECT r.r, x.i,
         CAST(CONCAT('0x', SUBSTR(md5(r.r || ':' || x.i), 1, 8))
              AS BIGINT) % x.nn AS pick
  FROM (SELECT UNNEST(range(1, 201)) AS r) r
  CROSS JOIN (SELECT i, nn FROM ix) x
), means AS (
  SELECT r, SUM(ix.n) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM draws JOIN ix ON ix.i = draws.pick
  GROUP BY r
)
SELECT CAST((SELECT MAX(nn) FROM ix) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS b_replicates,
       ROUND((SELECT CAST(SUM(n) AS DOUBLE) / MAX(nn) FROM ix), 6)
           AS mean_daily,
       ROUND(percentile_cont(0.025) WITHIN GROUP (ORDER BY m), 6)
           AS ci_lo,
       ROUND(percentile_cont(0.975) WITHIN GROUP (ORDER BY m), 6)
           AS ci_hi
FROM means HAVING COUNT(*) > 0
"""


def events_purchase_value_stump(sf_dir: str) -> pd.DataFrame:
    """Best single-threshold decision stump predicting event_type =
    'purchase' from `value` — CART's first split, the supervised-
    learning primitive the catalog lacked: correlation/Spearman say
    whether value and purchasing co-move, the stump says WHERE to cut
    and how much label impurity the cut removes (the exact computation
    a feature-importance pass or a quality-filter threshold search
    runs, just at depth 1).

    Plan: a (value, n, n_purchase) count fold — bounded by the
    2-decimal value domain — then every candidate threshold is one
    vectorized cumsum pass: weighted Gini for all splits at once,
    argmin with the smallest-threshold tie-break (the oracle's ORDER BY
    impurity, threshold LIMIT 1)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "v": df.value,
            "one": np.ones(len(df), np.int64),
            "k": (df.event_type == "purchase").to_numpy().astype(np.int64),
        })
        return g.groupby("v", as_index=False).agg(n=("one", "sum"),
                                                  k=("k", "sum"))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
    )
    schema = {"n_events": "int64", "best_threshold": "float64",
              "n_left": "int64", "base_gini": "float64",
              "split_gini": "float64", "gini_gain": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("v", kind="stable")
    v = out.v.to_numpy(np.float64)
    cn = np.cumsum(out.n.to_numpy(np.int64)).astype(np.float64)
    ck = np.cumsum(out.k.to_numpy(np.int64)).astype(np.float64)
    nn, kk = cn[-1], ck[-1]
    valid = cn < nn
    if not valid.any():
        return typed_out(pd.DataFrame(), schema)
    cn, ck, v = cn[valid], ck[valid], v[valid]
    pl = ck / cn
    pr = (kk - ck) / (nn - cn)
    gl = 1.0 - pl * pl - (1.0 - pl) * (1.0 - pl)
    gr = 1.0 - pr * pr - (1.0 - pr) * (1.0 - pr)
    w = (cn / nn) * gl + ((nn - cn) / nn) * gr
    p0 = kk / nn
    g0 = 1.0 - p0 * p0 - (1.0 - p0) * (1.0 - p0)
    i = int(np.argmin(w))
    res = pd.DataFrame([{
        "n_events": np.int64(nn),
        "best_threshold": round_away(np.float64(v[i]), 6) + 0.0,
        "n_left": np.int64(cn[i]),
        "base_gini": round_away(np.float64(g0), 6) + 0.0,
        "split_gini": round_away(np.float64(w[i]), 6) + 0.0,
        "gini_gain": round_away(np.float64(g0 - w[i]), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_VALUE_STUMP_SQL = """
WITH c AS (
  SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events GROUP BY 1
), w AS (
  SELECT v,
         CAST(SUM(n) OVER (ORDER BY v) AS DOUBLE) AS cn,
         CAST(SUM(k) OVER (ORDER BY v) AS DOUBLE) AS ck,
         CAST(SUM(n) OVER () AS DOUBLE) AS nn,
         CAST(SUM(k) OVER () AS DOUBLE) AS kk
  FROM c
), s AS (
  SELECT v, cn, nn, kk,
         (cn / nn) * (1.0 - (ck / cn) * (ck / cn)
                      - (1.0 - ck / cn) * (1.0 - ck / cn))
         + ((nn - cn) / nn)
           * (1.0 - ((kk - ck) / (nn - cn)) * ((kk - ck) / (nn - cn))
              - (1.0 - (kk - ck) / (nn - cn))
                * (1.0 - (kk - ck) / (nn - cn))) AS w
  FROM w WHERE cn < nn
)
SELECT CAST(nn AS BIGINT) AS n_events,
       ROUND(v, 6) AS best_threshold,
       CAST(cn AS BIGINT) AS n_left,
       ROUND(1.0 - (kk / nn) * (kk / nn)
             - (1.0 - kk / nn) * (1.0 - kk / nn), 6) AS base_gini,
       ROUND(w, 6) AS split_gini,
       ROUND((1.0 - (kk / nn) * (kk / nn)
              - (1.0 - kk / nn) * (1.0 - kk / nn)) - w, 6) AS gini_gain
FROM s ORDER BY w, v LIMIT 1
"""


def events_value_psi(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index of the event-value distribution,
    first half of the stream vs second half — the industry drift score
    (PSI > 0.25 = re-fit your models): type_share_drift watches the
    LABEL mix, PSI watches the VALUE distribution itself, over ten
    fixed-width bins (fixed edges remove the quantile-edge parity
    hazard) with Laplace 0.5 smoothing so empty bins stay finite.

    Plan: one (window, bin, n) count fold — 20 cells on the wire —
    after an integer midpoint-day split both sides compute identically;
    PSI is 10 driver flops."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "value"])

    span = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["ts"]).aggregate(
        ray.data.aggregate.Min("ts"), ray.data.aggregate.Max("ts"))
    if span is None or span.get("min(ts)") is None:
        return typed_out(pd.DataFrame(), {
            "split_day": "int64", "n_first": "int64", "n_second": "int64",
            "psi": "float64"})
    lo = int(pd.Timestamp(span["min(ts)"]).value // 1000) // 86_400_000_000
    hi = int(pd.Timestamp(span["max(ts)"]).value // 1000) // 86_400_000_000
    mid = (lo + hi + 1) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df.ts.astype("int64") // 86_400_000_000).astype("int64")
        b = np.clip(np.floor(df.value.to_numpy(np.float64) / 10.0),
                    0, 9).astype(np.int64)
        g = pd.DataFrame({"w": (day >= mid).astype(np.int64), "b": b,
                          "one": np.ones(len(df), np.int64)})
        return g.groupby(["w", "b"], as_index=False).agg(n=("one", "sum"))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["w", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"split_day": "int64", "n_first": "int64",
              "n_second": "int64", "psi": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    c = np.zeros((2, 10), np.int64)
    c[out.w.to_numpy(np.int64), out.b.to_numpy(np.int64)] = (
        out.n.to_numpy(np.int64))
    n1, n2 = float(c[0].sum()), float(c[1].sum())
    if n1 == 0 or n2 == 0:
        return typed_out(pd.DataFrame(), schema)
    p = (c[0] + 0.5) / (n1 + 5.0)
    q = (c[1] + 0.5) / (n2 + 5.0)
    psi = float(np.sum((p - q) * np.log(p / q)))
    res = pd.DataFrame([{
        "split_day": np.int64(mid), "n_first": np.int64(n1),
        "n_second": np.int64(n2),
        "psi": round_away(np.float64(psi), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_VALUE_PSI_SQL = """
WITH dims AS (
  SELECT (CAST(FLOOR(EPOCH(MIN(ts)) / 86400) AS BIGINT)
          + CAST(FLOOR(EPOCH(MAX(ts)) / 86400) AS BIGINT) + 1) // 2
             AS mid
  FROM events HAVING COUNT(*) > 0
), cells AS (
  SELECT CASE WHEN CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) >= dims.mid
              THEN 1 ELSE 0 END AS w,
         LEAST(GREATEST(CAST(FLOOR(value / 10.0) AS BIGINT), 0), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events, dims GROUP BY 1, 2, dims.mid
), bins AS (
  SELECT w.w, g.b, COALESCE(c.n, 0) AS n
  FROM (SELECT UNNEST([0, 1]) AS w) w
  CROSS JOIN (SELECT UNNEST(range(0, 10)) AS b) g
  LEFT JOIN cells c ON c.w = w.w AND c.b = g.b
), tot AS (
  SELECT CAST(SUM(CASE WHEN w = 0 THEN n END) AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN w = 1 THEN n END) AS DOUBLE) AS n2
  FROM bins
), pq AS (
  SELECT b,
         (MAX(CASE WHEN w = 0 THEN n END) + 0.5) / (tot.n1 + 5.0) AS p,
         (MAX(CASE WHEN w = 1 THEN n END) + 0.5) / (tot.n2 + 5.0) AS q,
         tot.n1 AS n1, tot.n2 AS n2
  FROM bins, tot GROUP BY b, tot.n1, tot.n2
)
SELECT (SELECT mid FROM dims) AS split_day,
       CAST(MAX(n1) AS BIGINT) AS n_first,
       CAST(MAX(n2) AS BIGINT) AS n_second,
       ROUND(SUM((p - q) * LN(p / q)), 6) AS psi
FROM pq
WHERE n1 > 0 AND n2 > 0
HAVING COUNT(*) > 0
"""


def events_purchase_did(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences on the purchase share: cohort A
    (user_id % 2 = 0) vs cohort B, first half of the stream vs second —
    the causal-inference workhorse for "did the rollout move the
    metric beyond the trend?". DiD = (A2 - A1) - (B2 - B1) with the
    four-proportion pooled SE; on this corpus the estimate sits at the
    null (cohorts are synthetic halves), which is exactly the
    calibration a DiD harness must reproduce before anyone trusts its
    nonzero readings.

    Plan: ONE scan folds the eight (cohort, window) integers; the
    estimate and z are driver flops in the oracle's literal order."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["ts", "user_id", "event_type"])

    span = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["ts"]).aggregate(
        ray.data.aggregate.Min("ts"), ray.data.aggregate.Max("ts"))
    schema = {"split_day": "int64", "did_estimate": "float64",
              "z_score": "float64", "share_a1": "float64",
              "share_a2": "float64", "share_b1": "float64",
              "share_b2": "float64"}
    if span is None or span.get("min(ts)") is None:
        return typed_out(pd.DataFrame(), schema)
    lo = int(pd.Timestamp(span["min(ts)"]).value // 1000) // 86_400_000_000
    hi = int(pd.Timestamp(span["max(ts)"]).value // 1000) // 86_400_000_000
    mid = (lo + hi + 1) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df.ts.astype("int64") // 86_400_000_000).astype("int64")
        g = pd.DataFrame({
            "a": (df.user_id.to_numpy(np.int64) % 2 == 0).astype(np.int64),
            "w": (day >= mid).astype(np.int64),
            "one": np.ones(len(df), np.int64),
            "k": (df.event_type == "purchase").to_numpy().astype(np.int64),
        })
        return g.groupby(["a", "w"], as_index=False).agg(n=("one", "sum"),
                                                         k=("k", "sum"))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["a", "w"])
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
    )
    if out.empty or len(out) < 4 or (out.n <= 0).any():
        return typed_out(pd.DataFrame(), schema)
    c = {(int(r.a), int(r.w)): (float(r.n), float(r.k))
         for r in out.itertuples()}
    p = {kk: v[1] / v[0] for kk, v in c.items()}
    did = (p[(1, 1)] - p[(1, 0)]) - (p[(0, 1)] - p[(0, 0)])
    se = np.sqrt(sum(p[kk] * (1.0 - p[kk]) / c[kk][0] for kk in
                     [(1, 1), (1, 0), (0, 1), (0, 0)]))
    if se <= 0:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame([{
        "split_day": np.int64(mid),
        "did_estimate": round_away(np.float64(did), 6) + 0.0,
        "z_score": round_away(np.float64(did / se), 6) + 0.0,
        "share_a1": round_away(np.float64(p[(1, 0)]), 6) + 0.0,
        "share_a2": round_away(np.float64(p[(1, 1)]), 6) + 0.0,
        "share_b1": round_away(np.float64(p[(0, 0)]), 6) + 0.0,
        "share_b2": round_away(np.float64(p[(0, 1)]), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_PURCHASE_DID_SQL = """
WITH dims AS (
  SELECT (CAST(FLOOR(EPOCH(MIN(ts)) / 86400) AS BIGINT)
          + CAST(FLOOR(EPOCH(MAX(ts)) / 86400) AS BIGINT) + 1) // 2
             AS mid
  FROM events HAVING COUNT(*) > 0
), cells AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
         CASE WHEN CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) >= dims.mid
              THEN 1 ELSE 0 END AS w,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS DOUBLE) AS k
  FROM events, dims GROUP BY 1, 2
), p AS (
  SELECT MAX(CASE WHEN a = 1 AND w = 0 THEN k / n END) AS pa1,
         MAX(CASE WHEN a = 1 AND w = 1 THEN k / n END) AS pa2,
         MAX(CASE WHEN a = 0 AND w = 0 THEN k / n END) AS pb1,
         MAX(CASE WHEN a = 0 AND w = 1 THEN k / n END) AS pb2,
         MAX(CASE WHEN a = 1 AND w = 0 THEN n END) AS na1,
         MAX(CASE WHEN a = 1 AND w = 1 THEN n END) AS na2,
         MAX(CASE WHEN a = 0 AND w = 0 THEN n END) AS nb1,
         MAX(CASE WHEN a = 0 AND w = 1 THEN n END) AS nb2
  FROM cells HAVING COUNT(*) >= 4
), s AS (
  SELECT (pa2 - pa1) - (pb2 - pb1) AS did,
         SQRT(pa2 * (1.0 - pa2) / na2 + pa1 * (1.0 - pa1) / na1
              + pb2 * (1.0 - pb2) / nb2 + pb1 * (1.0 - pb1) / nb1) AS se,
         pa1, pa2, pb1, pb2
  FROM p
  WHERE pa1 IS NOT NULL AND pa2 IS NOT NULL
    AND pb1 IS NOT NULL AND pb2 IS NOT NULL
)
SELECT (SELECT mid FROM dims) AS split_day,
       ROUND(did, 6) AS did_estimate,
       ROUND(did / se, 6) AS z_score,
       ROUND(pa1, 6) AS share_a1, ROUND(pa2, 6) AS share_a2,
       ROUND(pb1, 6) AS share_b1, ROUND(pb2, 6) AS share_b2
FROM s WHERE se > 0
"""


# ---------------------------------------------------------------------------
# events_logrank_cohorts: log-rank test between user cohorts
# ---------------------------------------------------------------------------

def events_logrank_cohorts(sf_dir: str) -> pd.DataFrame:
    """Log-rank (Mantel-Cox) test comparing the purchase-lifespan
    survival curves of the user_id%2 cohorts — the inferential
    companion to events_user_survival_curve: the curve DESCRIBES
    retention, the log-rank statistic says whether two cohorts' curves
    differ beyond chance (the standard A/B readout for retention
    experiments). Lifespans are first-to-last purchase day per user
    (same convention as the curve; all observed, no censoring), and at
    each distinct lifespan t the hypergeometric expectation/variance of
    cohort-1 deaths given the at-risk sets accumulates into
    chi2 = (O1-E1)^2 / V.

    Plan: user-bucketed extremes exchange (the survival-curve fold)
    collapsed to a (cohort, lifespan, n_users) histogram — day-range ×
    2 cells on the wire — then the O/E/V sums are a reverse-cumsum
    scan over the bounded lifespan grid on the driver, written as the
    oracle's literal expressions."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"],
                 event_types=["purchase"])

    def extremes(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("int64") // 86_400_000_000).astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "lo": day, "hi": day})
        return g.groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))

    def cohort_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))
        out = pd.DataFrame({
            "c": (g.user_id.to_numpy(np.int64) % 2),
            "lt": (g.hi - g.lo).to_numpy(np.int64),
            "one": np.ones(len(g), np.int64)})
        return out.groupby(["c", "lt"], as_index=False).agg(
            n_users=("one", "sum"))

    out = bucketed_combine(
        ds.map_batches(extremes, batch_format="pandas"),
        "user_id", lambda df: df, cohort_hist,
        num_buckets=32, coalesce_blocks=8).to_pandas()
    schema = {"n_users": "int64", "n_cohort1": "int64", "o1": "int64",
              "e1": "float64", "var1": "float64",
              "logrank_chi2": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby(["c", "lt"], as_index=False).agg(
        n_users=("n_users", "sum"))
    max_lt = int(out["lt"].max())
    cnt = np.zeros((2, max_lt + 1), np.int64)
    cnt[out.c.to_numpy(np.int64), out["lt"].to_numpy(np.int64)] = (
        out.n_users.to_numpy(np.int64))
    # at-risk = reverse cumulative death counts
    atr = np.cumsum(cnt[:, ::-1], axis=1)[:, ::-1].astype(np.float64)
    d = cnt.sum(axis=0).astype(np.float64)         # total deaths at t
    d1 = cnt[1].astype(np.float64)                 # cohort-1 deaths
    n = atr.sum(axis=0)                            # total at risk
    n1 = atr[1]
    keep = d > 0
    o1 = float(d1[keep].sum())
    e1 = float((d[keep] * n1[keep] / n[keep]).sum())
    kv = keep & (n > 1)
    var1 = float((d[kv] * (n1[kv] / n[kv]) * (1.0 - n1[kv] / n[kv])
                  * (n[kv] - d[kv]) / (n[kv] - 1.0)).sum())
    if var1 <= 0:
        return typed_out(pd.DataFrame(), schema)
    chi2 = (o1 - e1) ** 2 / var1
    res = pd.DataFrame([{
        "n_users": np.int64(cnt.sum()), "n_cohort1": np.int64(cnt[1].sum()),
        "o1": np.int64(o1),
        "e1": round_away(np.float64(e1), 6) + 0.0,
        "var1": round_away(np.float64(var1), 6) + 0.0,
        "logrank_chi2": round_away(np.float64(chi2), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_LOGRANK_COHORTS_SQL = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS c,
         CAST(FLOOR(EPOCH(MAX(ts)) / 86400)
              - FLOOR(EPOCH(MIN(ts)) / 86400) AS BIGINT) AS lt
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), t AS (SELECT DISTINCT lt FROM u),
grid AS (
  SELECT t.lt,
         CAST(SUM(CASE WHEN u.lt >= t.lt THEN 1 ELSE 0 END) AS DOUBLE)
             AS n,
         CAST(SUM(CASE WHEN u.lt >= t.lt AND u.c = 1 THEN 1 ELSE 0 END)
              AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN u.lt = t.lt THEN 1 ELSE 0 END) AS DOUBLE)
             AS d,
         CAST(SUM(CASE WHEN u.lt = t.lt AND u.c = 1 THEN 1 ELSE 0 END)
              AS DOUBLE) AS d1
  FROM t CROSS JOIN u GROUP BY 1
), s AS (
  SELECT SUM(d1) AS o1, SUM(d * n1 / n) AS e1,
         SUM(CASE WHEN n > 1
             THEN d * (n1 / n) * (1.0 - n1 / n) * (n - d) / (n - 1.0)
             ELSE 0 END) AS var1
  FROM grid WHERE d > 0
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_users,
       (SELECT CAST(SUM(c) AS BIGINT) FROM u) AS n_cohort1,
       CAST(o1 AS BIGINT) AS o1,
       ROUND(e1, 6) AS e1, ROUND(var1, 6) AS var1,
       ROUND((o1 - e1) * (o1 - e1) / var1, 6) AS logrank_chi2
FROM s WHERE var1 > 0
"""


def events_poisson_gof(sf_dir: str, kmax: int = 8) -> pd.DataFrame:
    """Chi-square goodness-of-fit of per-(user, day) activity counts to a
    Poisson law — the full-shape companion of the variance/mean screen
    (events_overdispersion_by_type): dispersion ~1 can still hide a
    non-Poisson shape (e.g. a mixture of quiet users and bots), and this
    statistic convicts it bin by bin.

    Convention (documented, mirrored exactly by the oracle): the sample
    is the OBSERVED user-days (activity conditional on >=1 event — the
    zero cell is unobservable without materializing the user x day
    grid), lambda is the plain mean of the truncated counts (the standard
    quick estimator; the exact zero-truncated MLE needs iteration), and
    expected masses are the Poisson pmf renormalized by 1-p0 with counts
    > kmax pooled into one tail bin. dof = (kmax+1) - 2.

    Plan: per-batch (user, day, n) partials -> user-bucketed exchange
    (per-user-day totals exact in-bucket) -> per-bucket collapse to a
    (k, f) histogram; the driver folds a max-count-bounded frame into
    four scalars."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df.ts.astype("int64") // 86_400_000_000).astype("int64")
        g = pd.DataFrame({"user_id": df.user_id.to_numpy(np.int64),
                          "day": day})
        return g.groupby(["user_id", "day"], as_index=False).size().rename(
            columns={"size": "n"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "day"], as_index=False).agg(n=("n", "sum"))
        fof = c.n.value_counts()
        return pd.DataFrame({"k": fof.index.to_numpy(np.int64),
                             "f": fof.to_numpy(np.int64)})

    out = bucketed_combine(ds, "user_id", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    schema = {"n_user_days": "int64", "lambda_hat": "float64",
              "chi2": "float64", "dof": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    fof = out.groupby("k", as_index=False).agg(f=("f", "sum"))
    kk = fof.k.to_numpy(np.int64)
    ff = fof.f.to_numpy(np.int64)
    nn = int(ff.sum())
    if nn == 0:
        return typed_out(pd.DataFrame(), schema)
    lam = float(np.sum(kk * ff)) / nn
    import math

    p0 = math.exp(-lam)
    ks = np.arange(1, kmax + 1, dtype=np.float64)
    pk = np.array([math.exp(-lam) * lam ** k / math.gamma(k + 1.0)
                   for k in ks])
    psum = float(np.sum(pk))
    obs = np.zeros(kmax, np.float64)
    inside = (kk >= 1) & (kk <= kmax)
    obs[kk[inside] - 1] = ff[inside].astype(np.float64)
    ek = nn * pk / (1.0 - p0)
    chi_head = float(np.sum((obs - ek) * (obs - ek) / ek))
    ptail = 1.0 - p0 - psum
    if ptail <= 1e-12:
        chi2 = chi_head
    else:
        obs_tail = nn - float(np.sum(obs))
        exp_tail = nn * ptail / (1.0 - p0)
        chi2 = chi_head + (obs_tail - exp_tail) ** 2 / exp_tail
    res = pd.DataFrame([{
        "n_user_days": np.int64(nn),
        "lambda_hat": round_away(np.float64(lam), 6) + 0.0,
        "chi2": round_away(np.float64(chi2), 6) + 0.0,
        "dof": np.int64(kmax - 1),
    }])
    return typed_out(res, schema)


EVENTS_POISSON_GOF_SQL = """
WITH c AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), f AS (
  SELECT n AS k, CAST(COUNT(*) AS BIGINT) AS f FROM c GROUP BY 1
), s AS (
  SELECT CAST(SUM(f) AS BIGINT) AS nn,
         SUM(k * f) / CAST(SUM(f) AS DOUBLE) AS lam
  FROM f HAVING SUM(f) > 0
), grid AS (
  SELECT UNNEST(generate_series(1, 8)) AS k
), p AS (
  SELECT g.k,
         EXP(-s.lam) * POWER(s.lam, g.k) / GAMMA(g.k + 1.0) AS pk,
         s.nn, s.lam, EXP(-s.lam) AS p0
  FROM grid g CROSS JOIN s
), e AS (
  SELECT p.k, p.nn * p.pk / (1.0 - p.p0) AS ek,
         CAST(COALESCE(f.f, 0) AS DOUBLE) AS ok,
         p.nn, p.lam, p.p0, p.pk
  FROM p LEFT JOIN f ON f.k = p.k
), t AS (
  SELECT MAX(nn) AS nn, MAX(lam) AS lam, MAX(p0) AS p0,
         SUM(pk) AS psum, SUM(ok) AS osum,
         SUM((ok - ek) * (ok - ek) / ek) AS chi_head
  FROM e
)
SELECT nn AS n_user_days,
       ROUND(lam, 6) AS lambda_hat,
       ROUND(CASE WHEN (1.0 - p0 - psum) <= 1e-12 THEN chi_head
             ELSE chi_head
                  + ((nn - osum) - nn * (1.0 - p0 - psum) / (1.0 - p0))
                    * ((nn - osum) - nn * (1.0 - p0 - psum) / (1.0 - p0))
                    / (nn * (1.0 - p0 - psum) / (1.0 - p0))
             END, 6) AS chi2,
       CAST(7 AS BIGINT) AS dof
FROM t
WHERE nn IS NOT NULL
"""


def events_wilcoxon_signed_rank(sf_dir: str) -> pd.DataFrame:
    """Wilcoxon signed-rank test on per-user activity, first half of the
    stream vs second half (integer midpoint-day split, the events_value_psi
    convention) — the PAIRED member of the rank-test family: the A/B
    z-test and Mann-Whitney compare two user GROUPS, this tests whether
    the SAME users changed level between windows, immune to the heavy
    cross-user variance that drowns a paired t. Zero differences drop,
    ties take midranks, and the normal approximation carries the standard
    tie correction sum(t^3-t)/48.

    Plan: (user, window, n) count partials -> user-bucketed exchange
    (per-user window counts exact in-bucket) -> per-bucket (d, cnt)
    difference histogram; the driver ranks a frame bounded by the
    DISTINCT-difference domain, never the user count."""
    ds = _events(sf_dir, ["user_id", "ts"])

    span = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["ts"]).aggregate(
        ray.data.aggregate.Min("ts"), ray.data.aggregate.Max("ts"))
    schema = {"n_nonzero": "int64", "w_plus": "float64", "z": "float64"}
    if span is None or span.get("min(ts)") is None:
        return typed_out(pd.DataFrame(), schema)
    lo = int(pd.Timestamp(span["min(ts)"]).value // 1000) // 86_400_000_000
    hi = int(pd.Timestamp(span["max(ts)"]).value // 1000) // 86_400_000_000
    mid = (lo + hi + 1) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df.ts.astype("int64") // 86_400_000_000).astype("int64")
        g = pd.DataFrame({"user_id": df.user_id.to_numpy(np.int64),
                          "w": (day >= mid).astype(np.int64)})
        return g.groupby(["user_id", "w"], as_index=False).size().rename(
            columns={"size": "n"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "w"], as_index=False).agg(n=("n", "sum"))
        piv = c.pivot_table(index="user_id", columns="w", values="n",
                            aggfunc="sum", fill_value=0)
        x = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(
            len(piv), np.int64)
        y = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(
            len(piv), np.int64)
        d = y - x
        d = d[d != 0]
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"d": vc.index.to_numpy(np.int64),
                             "cnt": vc.to_numpy(np.int64)})

    out = bucketed_combine(ds, "user_id", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    h = out.groupby("d", as_index=False).agg(cnt=("cnt", "sum"))
    h["ad"] = np.abs(h.d.to_numpy(np.int64))
    n = int(h.cnt.sum())
    if n == 0:
        return typed_out(pd.DataFrame(), schema)
    # min-rank per |d| group (1-based), midrank = rmin + (t - 1) / 2
    grp = h.groupby("ad", as_index=False).agg(t=("cnt", "sum")).sort_values(
        "ad", kind="stable")
    t = grp.t.to_numpy(np.int64)
    rmin = np.concatenate(([1], 1 + np.cumsum(t)[:-1]))
    mr = pd.Series(rmin + (t - 1) / 2.0, index=grp.ad.to_numpy(np.int64))
    pos = h[h.d > 0]
    wplus = float(np.sum(pos.cnt.to_numpy(np.float64)
                         * mr.loc[pos.ad].to_numpy(np.float64)))
    ties = float(np.sum(t.astype(np.float64) ** 3 - t))
    mean = n * (n + 1) / 4.0
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    z = (wplus - mean) / np.sqrt(var) if var > 0 else 0.0
    res = pd.DataFrame([{
        "n_nonzero": np.int64(n),
        "w_plus": round_away(np.float64(wplus), 6) + 0.0,
        "z": round_away(np.float64(z), 6) + 0.0,
    }])
    return typed_out(res, schema)


EVENTS_WILCOXON_SQL = """
WITH dims AS (
  SELECT (CAST(FLOOR(EPOCH(MIN(ts)) / 86400) AS BIGINT)
          + CAST(FLOOR(EPOCH(MAX(ts)) / 86400) AS BIGINT) + 1) // 2
             AS mid
  FROM events HAVING COUNT(*) > 0
), c AS (
  SELECT user_id,
         CASE WHEN CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) >= dims.mid
              THEN 1 ELSE 0 END AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events, dims GROUP BY 1, 2
), p AS (
  SELECT user_id,
         SUM(CASE WHEN w = 1 THEN n ELSE 0 END)
         - SUM(CASE WHEN w = 0 THEN n ELSE 0 END) AS d
  FROM c GROUP BY 1
), nz AS (
  SELECT d, ABS(d) AS ad FROM p WHERE d <> 0
), rk AS (
  SELECT d, ad,
         RANK() OVER (ORDER BY ad) AS rmin,
         COUNT(*) OVER (PARTITION BY ad) AS t
  FROM nz
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CASE WHEN d > 0 THEN rmin + (t - 1) / 2.0 ELSE 0 END) AS wplus
  FROM rk HAVING COUNT(*) > 0
), tt AS (
  SELECT COALESCE(SUM(CAST(t AS DOUBLE) * t * t - t), 0) AS ties
  FROM (SELECT COUNT(*) AS t FROM nz GROUP BY ad)
)
SELECT s.n AS n_nonzero,
       ROUND(s.wplus, 6) AS w_plus,
       ROUND(CASE WHEN s.n * (s.n + 1) * (2 * s.n + 1) / 24.0
                       - tt.ties / 48.0 > 0
             THEN (s.wplus - s.n * (s.n + 1) / 4.0)
                  / SQRT(s.n * (s.n + 1) * (2 * s.n + 1) / 24.0
                         - tt.ties / 48.0)
             ELSE 0.0 END, 6) AS z
FROM s CROSS JOIN tt
"""


def events_dwell_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-event-type DWELL profile: the time from an event to the same
    user's NEXT event (any type), attributed to the first event's type —
    the engagement signal behind session design ("how long does a user
    linger after a view vs after an error?"). A user's last event has no
    successor and drops, exactly like the oracle's LEAD.

    Plan: the events_inter_arrival_stats shape — a user-bucketed exchange
    co-locates each user's stream (gaps need physical adjacency, the one
    exchange this family cannot avoid); each bucket sorts per user once
    (ts, event_id tiebreak), diffs, and collapses to per-type INTEGER
    microsecond partials (n, sum, min, max), so every crossing value is
    exact and the only float is the final mean division."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df.user_id.to_numpy(np.int64),
            "ts": df.ts.astype("int64"),
            "event_id": df.event_id.to_numpy(np.int64),
            "event_type": df.event_type.to_numpy(object),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g.ts.to_numpy(np.int64)
        uid = g.user_id.to_numpy(np.int64)
        gap = ts[1:] - ts[:-1]
        same = uid[1:] == uid[:-1]
        d = pd.DataFrame({
            "event_type": g.event_type.to_numpy(object)[:-1][same],
            "gap": gap[same],
        })
        if d.empty:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "n_gaps": pd.Series(dtype="int64"),
                "sum_gap_us": pd.Series(dtype="int64"),
                "min_gap_us": pd.Series(dtype="int64"),
                "max_gap_us": pd.Series(dtype="int64")})
        return d.groupby("event_type", as_index=False).agg(
            n_gaps=("gap", "size"), sum_gap_us=("gap", "sum"),
            min_gap_us=("gap", "min"), max_gap_us=("gap", "max"))

    out = bucketed_combine(ds, "user_id", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    schema = {"event_type": "object", "n_gaps": "int64",
              "mean_gap_s": "float64", "min_gap_us": "int64",
              "max_gap_us": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    g = out.groupby("event_type", as_index=False).agg(
        n_gaps=("n_gaps", "sum"), sum_gap_us=("sum_gap_us", "sum"),
        min_gap_us=("min_gap_us", "min"), max_gap_us=("max_gap_us", "max"))
    g["mean_gap_s"] = round_away(
        g.sum_gap_us.to_numpy(np.float64) / 1_000_000.0
        / g.n_gaps.to_numpy(np.float64), 6)
    return typed_out(g, schema, sort_by="event_type")


EVENTS_DWELL_BY_TYPE_SQL = """
WITH nxt AS (
  SELECT event_type,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n_ts,
         ts
  FROM events
), g AS (
  SELECT event_type,
         CAST(EPOCH_US(n_ts) - EPOCH_US(ts) AS BIGINT) AS gap
  FROM nxt WHERE n_ts IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(SUM(gap) / 1000000.0 / COUNT(*), 6) AS mean_gap_s,
       CAST(MIN(gap) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM g
GROUP BY event_type
ORDER BY event_type
"""
