"""Unit tests for pipelines/curation.py — the cases the sf0.01 oracle runs
can't exercise: PII text that actually contains PII, duplicate clusters
checked against a brute-force union-find, and chunk-hash edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import curation as C


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(sources or ["s0"] * n, pa.string()),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


PII_TEXTS = [
    "contact bob@example.com or alice.smith+x@sub.domain.org today",
    "call +1 415-555-2671 or 212 555 0199 from 10.0.0.1",
    "server at 192.168.001.005 mailed root@localhost.localdomain",
    "nothing sensitive here at all",
    None,
]


def test_pii_scan_nondegenerate(ray_session, tmp_path):
    """Counts and chained redaction on text that DOES contain PII, checked
    against DuckDB running the exact oracle SQL over the same rows —
    the sf0.01 corpus has no PII, so this is the non-trivial pin."""
    sf = _write_docs(tmp_path, PII_TEXTS)
    got = C.pii_scan(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(C.PII_SCAN_SQL).df()
    assert got["n_emails"].tolist() == want["n_emails"].tolist() == [2, 0, 1, 0, 0]
    assert got["n_ipv4"].tolist() == want["n_ipv4"].tolist()
    assert got["n_phones"].tolist() == want["n_phones"].tolist()
    assert got["redacted_md5"].tolist() == want["redacted_md5"].tolist()
    # the redaction actually fired: hashes differ from the raw-text hashes
    raw = con.execute(
        "SELECT md5(COALESCE(text,'')) AS h FROM documents ORDER BY doc_id"
    ).df()["h"]
    assert (got["redacted_md5"] != raw).tolist()[:3] == [True, True, True]


def _brute_clusters(texts, k=5):
    """Union-find over 'share a k-token chunk' edges."""
    def chunks(t):
        toks = (t or "").lower().split(" ")
        return {" ".join(toks[i:i + k]) for i in range(0, len(toks), k)}

    n = len(texts)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sets = [chunks(t) for t in texts]
    by_chunk = {}
    for i, s in enumerate(sets):
        for c in s:
            by_chunk.setdefault(c, []).append(i)
    for ids in by_chunk.values():
        for j in ids[1:]:
            a, b = find(ids[0]), find(j)
            if a != b:
                parent[max(a, b)] = min(a, b)
    # path-compress to canonical minimum
    out = []
    for i in range(n):
        r = find(i)
        # min element of the component
        out.append(min(j for j in range(n) if find(j) == r))
    return out


def test_dup_clusters_high_duplication_vs_union_find(ray_session, tmp_path):
    """A corpus with ~50% near-dups and chained components (A~B via chunk1,
    B~C via chunk2) must produce exactly the union-find clusters — and the
    chain forces >1 propagation round, exercising the iteration."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mid = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    tail = "phi chi psi omega aleph bet gimel dalet he vav"
    texts = [
        base + " unique one two three four",          # 0: shares base-chunk w/ 1
        base + " " + mid,                             # 1: bridges 0 and 2
        mid + " " + tail,                             # 2: bridges 1 and 3
        tail + " totally different ending here now",  # 3
        "an island document with its own words only", # 4: singleton
        "another isolated text nothing shared at all",# 5: singleton
        base + " yet another suffix for the corpus",  # 6: joins cluster of 0
    ]
    sf = _write_docs(tmp_path, texts)
    got = C.dup_clusters(sf)
    want = _brute_clusters(texts)
    assert got["doc_id"].tolist() == list(range(len(texts)))
    assert got["cluster_id"].tolist() == want
    # the chain really is one component
    assert want[0] == want[1] == want[2] == want[3] == want[6] == 0
    assert want[4] == 4 and want[5] == 5


def test_chunk_dedup_stats_edge_cases(ray_session, tmp_path):
    """Empty text (one empty-string chunk), within-doc repeats, and
    multi-space token boundaries all match the SQL semantics."""
    texts = [
        "",                                   # one chunk: ""
        "a b c d e a b c d e",                # within-doc duplicate chunk
        "a b c d e x y z w v",                # shares first chunk with doc 1
        "solo words that match nothing else", # unique chunk(s)
    ]
    sf = _write_docs(tmp_path, texts)
    got = C.chunk_dedup_stats(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(C.CHUNK_DEDUP_STATS_SQL).df()
    assert got["n_chunks"].tolist() == want["n_chunks"].tolist()
    assert got["n_dup_chunks"].tolist() == want["n_dup_chunks"].tolist()
    # doc 1: both its chunks are the duplicated "a b c d e"
    assert got.loc[1, "n_dup_chunks"] == 2


def test_repetition_stats_synthetic(ray_session, tmp_path):
    texts = ["x x x y", "a b a b a", "once upon a time", ""]
    sf = _write_docs(tmp_path, texts)
    got = C.doc_repetition_stats(sf)
    # "x x x y": max token count 3; bigrams: (x x)x2,(x y) -> 2 dup positions
    assert got.loc[0, "max_token_count"] == 3
    assert got.loc[0, "n_dup_bigram_positions"] == 2
    # "a b a b a": (a b)x2, (b a)x2 -> 4 dup bigram positions
    assert got.loc[1, "n_dup_bigram_positions"] == 4
    assert got.loc[2, "n_dup_bigram_positions"] == 0
    # empty text splits to one empty token
    assert got.loc[3, "n_tokens"] == 1 and got.loc[3, "max_token_count"] == 1


def test_contamination_counts_synthetic(ray_session, tmp_path):
    """Doc 0 is the benchmark (doc_id % 97 == 0); overlapping trigram counts
    are exact."""
    texts = [
        "the quick brown fox jumps",        # benchmark: 3 trigrams
        "the quick brown dog sits today",   # shares 1 trigram w/ benchmark
        "quick brown fox and the rest",     # shares 1
        "no overlap at all here",           # 0
    ]
    sf = _write_docs(tmp_path, texts)
    got = C.contamination_check(sf).set_index("doc_id")
    assert got.loc[0, "n_contaminated"] == 3  # benchmark vs itself
    assert got.loc[1, "n_contaminated"] == 1
    assert got.loc[2, "n_contaminated"] == 1
    assert got.loc[3, "n_contaminated"] == 0


def test_normalize_unicode_and_whitespace(ray_session, tmp_path):
    """NFC composition (e + combining acute == é) and whitespace collapse
    produce identical hashes for visually identical text."""
    composed = "café au lait"
    decomposed = "café   au\tlait"
    sf = _write_docs(tmp_path, [composed, decomposed])
    got = C.doc_normalize(sf)
    assert got.loc[0, "norm_md5"] == got.loc[1, "norm_md5"]
    assert got.loc[0, "n_chars_norm"] == got.loc[1, "n_chars_norm"] == 12
    # and the oracle agrees on non-ASCII input too
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(C.DOC_NORMALIZE_SQL).df()
    assert got["norm_md5"].tolist() == want["norm_md5"].tolist()
    assert got["n_chars_norm"].tolist() == want["n_chars_norm"].tolist()


def test_cc_bsp_chain_and_forest(ray_session):
    """Direct BSP check on a graph that needs multi-hop propagation: a
    10-node path (diameter 9), a triangle, and isolated pairs — labels
    must reach the component minimum, matching union-find."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ocr_pipeline_fastapi_latency_optimization_ray.state.cc_bsp import (
        connected_components_bsp,
    )

    edges = [(i, i + 1) for i in range(100, 109)]          # path 100..109
    edges += [(200, 201), (201, 202), (202, 200)]          # triangle
    edges += [(300, 301), (400, 401)]                      # pairs
    df = pd.DataFrame({"a": [a for a, _ in edges],
                       "b": [b for _, b in edges]})
    ds = ray.data.from_pandas(df)
    out = connected_components_bsp(ds, n_buckets=4).to_pandas()
    got = dict(zip(out.node, out.label))

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        parent[find(a)] = find(b)
    for a, b in edges:
        union(a, b)
    comp_min = {}
    for n in list(parent):
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}
    assert got == want


def test_cc_bsp_raises_on_nonconvergence(ray_session):
    """A component whose propagation diameter exceeds max_iters must FAIL
    LOUDLY, not return plausible-but-wrong labels (round-2 ADVICE): a
    10-node path cannot converge in 2 min-label supersteps."""
    import pandas as pd
    import pytest
    import ray.data

    from ocr_pipeline_fastapi_latency_optimization_ray.state.cc_bsp import (
        connected_components_bsp,
    )

    edges = [(i, i + 1) for i in range(100, 109)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": [a for a, _ in edges], "b": [b for _, b in edges]}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_bsp(ds, n_buckets=4, max_iters=2).to_pandas()


def test_events_funnel_sequence_matters(ray_session, tmp_path):
    """The funnel is ORDER-sensitive: a purchase before any click, or a
    click before any view, must not advance the user — exactly the case
    the sf0.01 oracle check cannot discriminate (every user there reaches
    every stage)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.streaming import events_funnel

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # u1: view -> click -> purchase (full conversion)
        (1, t0, "view"), (1, t0 + h, "click"), (1, t0 + 2 * h, "purchase"),
        # u2: purchase BEFORE click; click before view -> stage1 only
        (2, t0, "purchase"), (2, t0 + h, "click"), (2, t0 + 2 * h, "view"),
        # u3: view -> click, purchase earlier than the click -> stage2 only
        (3, t0, "purchase"), (3, t0 + h, "view"), (3, t0 + 2 * h, "click"),
        # u4: clicks only -> no stage at all
        (4, t0, "click"), (4, t0 + h, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["event_id"] = range(len(df))
    df["value"] = 0.0
    df["props"] = ""
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")

    out = events_funnel(str(tmp_path)).set_index("stage")["n_users"]
    assert out["stage1_view"] == 3       # u1, u2, u3
    assert out["stage2_click"] == 2      # u1, u3 (u2's click precedes its view)
    assert out["stage3_purchase"] == 1   # u1 only


def test_pagerank_bsp_matches_numpy_power_iteration(ray_session):
    """The BSP machinery (resident edge shards, per-destination pre-summed
    messages, fixed-order folds) must reproduce a single-process numpy
    power iteration of the same formula to float precision, and be
    bit-identical across runs."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ocr_pipeline_fastapi_latency_optimization_ray.state.pagerank_bsp import (
        pagerank_bsp,
    )

    rng = np.random.RandomState(23)
    n = 60
    a = rng.randint(0, n, 300)
    b = rng.randint(0, n, 300)
    keep = a != b
    edges = pd.DataFrame({"a": a[keep].astype(np.int64),
                          "b": b[keep].astype(np.int64)}).drop_duplicates()

    got = pagerank_bsp(ray.data.from_pandas(edges), n_buckets=4, n_iters=20)
    got2 = pagerank_bsp(ray.data.from_pandas(edges), n_buckets=4, n_iters=20)
    pd.testing.assert_frame_equal(got, got2)  # deterministic

    # numpy reference: same symmetrization, degrees, damping, iterations
    sym = np.unique(np.concatenate(
        [edges.to_numpy(), edges.to_numpy()[:, ::-1]]), axis=0)
    nodes = np.unique(sym)
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for s, _d in sym:
        deg[idx[s]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(20):
        acc = np.zeros(N)
        for s, d in sym:
            acc[idx[d]] += r[idx[s]] / deg[idx[s]]
        r = 0.15 / N + 0.85 * acc
    ref = pd.DataFrame({"node": nodes, "rank": r})
    m = got.merge(ref, on="node", suffixes=("", "_ref"))
    assert len(m) == N
    assert np.allclose(m["rank"], m["rank_ref"], rtol=0, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_doc_dup_pagerank_on_dup_corpus(ray_session, tmp_path):
    """On a corpus where one boilerplate chunk recurs in many docs, the
    chunk's min-doc hub out-ranks every spoke, and ranks sum to 1."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import curation

    boiler = "alpha beta gamma delta epsilon"   # one 5-token chunk
    texts = {i: boiler + f" unique{i} filler{i} pad{i} x{i} y{i}"
             for i in range(12)}
    for i in range(12, 20):                      # unrelated docs
        texts[i] = f"only{i} words{i} here{i} none{i} shared{i}"
    pq.write_table(
        pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())}),
        tmp_path / "documents.parquet")
    out = curation.doc_dup_pagerank(str(tmp_path))
    # only the 12 boilerplate docs are in the graph
    assert set(out.doc_id) == set(range(12))
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    hub = out.set_index("doc_id")["rank"]
    assert hub[0] == hub.max()  # star center (min doc of the chunk)
    assert (hub[0] > hub.drop(0) * 2).all()


def test_markov_stationary_vs_numpy_eig(ray_session):
    """events_markov_stationary's power iteration must match the dominant
    left eigenvector of the damped transition matrix built independently
    from the oracle-checked transition counts."""
    import numpy as np

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import streaming

    sf = "/root/testdata/sf0.01"
    out = streaming.events_markov_stationary(sf)
    assert abs(out.stationary_prob.sum() - 1.0) < 5e-6
    trans = streaming.events_path_transitions(sf)
    types = sorted(set(trans.from_type) | set(trans.to_type))
    idx = {t: i for i, t in enumerate(types)}
    m = len(types)
    P = np.zeros((m, m))
    P[[idx[a] for a in trans.from_type],
      [idx[b] for b in trans.to_type]] = trans.n.to_numpy(float)
    n_out = P.sum(axis=1)
    P = np.where(n_out[:, None] > 0,
                 P / np.where(n_out > 0, n_out, 1.0)[:, None], 1.0 / m)
    G = 0.85 * P + 0.15 / m
    vals, vecs = np.linalg.eig(G.T)
    v = np.real(vecs[:, np.argmax(np.real(vals))])
    v = v / v.sum()
    assert list(out.event_type) == types
    assert np.allclose(out.stationary_prob.to_numpy(), v, atol=1e-5)


def test_heavy_hitters_superset_under_hostile_partitioning(ray_session,
                                                           tmp_path):
    """The MG candidate sweep must keep every true heavy hitter no matter
    how the stream is partitioned: a skewed corpus written as many tiny
    row groups (worst case for per-batch summaries) must produce exactly
    the brute-force answer."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import streaming

    rng = np.random.default_rng(11)
    # one dominant user (30%), a mid tier, and a long uniform tail
    users = np.concatenate([
        np.full(3000, 7), np.repeat(np.arange(100, 110), 150),
        rng.integers(1000, 3000, 5500),
    ])
    rng.shuffle(users)
    n = len(users)
    d = tmp_path / "hh"
    d.mkdir()
    ts = pd.Timestamp("2024-01-01").value // 1000 + np.arange(n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, d / "events.parquet", row_group_size=256)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        import shutil
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")

    k = 127
    out = streaming.events_heavy_hitters(str(d), k=k)
    cnt = pd.Series(users).value_counts()
    expect = sorted(int(u) for u, c in cnt.items() if c > n / (k + 1.0))
    assert list(out.user_id) == expect
    assert list(out.n_events) == [int(cnt[u]) for u in expect]


def test_cdc_chunks_shift_robust(ray_session, tmp_path):
    """The CDC property fixed-width chunking lacks: inserting one token at
    the FRONT of a document re-syncs at the next content boundary, so the
    tail chunks still dedup against the original. With fixed k-token
    chunks every window would shift and nothing past the insertion point
    would match."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.curation import (
        dedup_cdc_chunks,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [base, "INSERTED " + base, "totally different words here"],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [len(base), len(base) + 9, 28],
    })
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = dedup_cdc_chunks(str(tmp_path))
    out = out.set_index("doc_id")
    # doc 1 = doc 0 with one token prepended: all of doc 0's chunks except
    # possibly its first re-occur in doc 1 -> both docs see heavy dup mass
    assert out.loc[0, "n_dup_chunks"] >= out.loc[0, "n_chunks"] - 1
    assert out.loc[1, "n_dup_chunks"] >= out.loc[1, "n_chunks"] - 2
    # the unrelated doc shares nothing
    assert out.loc[2, "n_dup_chunks"] == 0
