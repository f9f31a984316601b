"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (ray_guide.md "Aggregation at scale"):
  - exact dedup: vectorized content-hash column in ``map_batches`` then a
    ``groupby(hash)`` whose shuffle moves only (hash, doc_id) pairs — never
    the text;
  - MinHash-LSH: shingle -> signature per batch (mergeable sketch emitted per
    row), explode to (band_id, band_hash, doc_id) rows, group by band bucket,
    emit candidate pairs per bucket, verify exact Jaccard only on candidates;
  - SimHash: 64-bit signature per row; near-dup = bucket by 16-bit sub-bands
    (hamming<=3 guarantee via pigeonhole over 4 bands);
  - embedding cosine near-dup: normalized vectors, LSH by sign of random
    projections, verify cosine within buckets only.

The parallelism axis is rows; the shuffle key is always a small fixed-width
hash — skew-safe by construction (hash keys are uniform).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.hashing import (
    md5_hex_batch,
    minhash_params,
    minhash_signature,
    shingles,
    simhash64,
    stable_hash64_batch,
)

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows per band


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact_groups(sf_dir: str) -> pd.DataFrame:
    """(text_hash, keep_doc_id, n_dups) per distinct content hash; keeper is
    the smallest doc_id (deterministic). Hash cardinality == corpus size, so
    the combine is hash-bucketed (functions/shuffle.py), never per-key."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {"text_hash": md5_hex_batch(list(df["text"])), "doc_id": df["doc_id"]}
        )
        return p.groupby("text_hash", as_index=False).agg(
            keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("text_hash", as_index=False).agg(
            keep_doc_id=("keep_doc_id", "min"), n_dups=("n_dups", "sum")
        )

    out = bucketed_combine(ds, "text_hash", partial, combine).to_pandas()
    out["n_dups"] = out["n_dups"].astype("int64")
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_dups
FROM documents
GROUP BY md5(text)
ORDER BY text_hash
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _signatures(ds, k_shingle: int = 3):
    a, b = minhash_params(NUM_PERM)

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(
            [
                minhash_signature(shingles(t or "", k_shingle), a, b)
                for t in df["text"]
            ]
        )
        return pd.DataFrame({"doc_id": df["doc_id"].values, "sig": list(sigs)})

    return ds.map_batches(sig_batch, batch_format="pandas")


def dedup_minhash_candidates(sf_dir: str, k_shingle: int = 3) -> pd.DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, verified with exact
    shingle Jaccard. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = _signatures(docs, k_shingle)

    rows_per_band = NUM_PERM // NUM_BANDS

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for did, sig in zip(df["doc_id"], df["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for band in range(NUM_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                out_doc.append(did)
                out_band.append(band)
                out_hash.append(int(stable_hash64_batch([chunk.tobytes()])[0]))
        return pd.DataFrame(
            {
                "doc_id": np.array(out_doc, dtype=np.int64),
                "band": np.array(out_band, dtype=np.int32),
                "band_hash": np.array(out_hash, dtype=np.uint64).astype(np.int64),
            }
        )

    bands = sigs.map_batches(explode_bands, batch_format="pandas")

    def shuffle_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one call per shuffle bucket: vectorized per-(band, band_hash)
        # pair expansion inside (LSH bucket cardinality grows with the
        # corpus -> shuffle on a bounded hash bucket, functions/shuffle.py)
        out_a, out_b = [], []
        for (_, _), grp in g.groupby(["band", "band_hash"]):
            ids = sorted(set(grp["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame(
            {"doc_a": np.array(out_a, dtype=np.int64),
             "doc_b": np.array(out_b, dtype=np.int64)}
        )

    from ..functions.shuffle import add_bucket_column

    tagged = bands.map_batches(
        lambda df: add_bucket_column(df, ["band_hash"], 64), batch_format="pandas"
    )
    pairs = (
        tagged.groupby("_bucket")
        .map_groups(lambda g: shuffle_pairs(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    pairs = pairs.drop_duplicates().reset_index(drop=True)

    # verify: exact shingle Jaccard only on candidates (small set)
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tmap = dict(zip(texts.doc_id, texts.text))

    def jac(a, b):
        sa = set(shingles(tmap.get(a) or "", k_shingle).tolist())
        sb = set(shingles(tmap.get(b) or "", k_shingle).tolist())
        if not sa and not sb:
            return 1.0
        return len(sa & sb) / max(1, len(sa | sb))

    pairs["jaccard"] = [
        round(jac(a, b), 6) for a, b in zip(pairs.doc_a, pairs.doc_b)
    ]
    pairs = pairs[pairs.jaccard >= 0.5]
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def doc_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per document over word tokens (int64-cast bits)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sim_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(df), dtype=np.uint64)
        for i, t in enumerate(df["text"]):
            toks = (t or "").lower().split()
            out[i] = simhash64(stable_hash64_batch(toks))
        return pd.DataFrame(
            {"doc_id": df["doc_id"].values, "simhash": out.astype(np.int64)}
        )

    out = ds.map_batches(sim_batch, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_simhash_candidates(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found by
    bucketing on 4x16-bit sub-bands (pigeonhole: any pair within hamming 3
    shares at least one exact band)."""
    sims = doc_simhash(sf_dir)
    buckets: dict[tuple[int, int], list[int]] = {}
    vals = sims.simhash.values.astype(np.uint64)
    ids = sims.doc_id.values
    for band in range(4):
        shift = np.uint64(band * 16)
        keys = ((vals >> shift) & np.uint64(0xFFFF)).astype(np.int64)
        for did, k in zip(ids, keys):
            buckets.setdefault((band, int(k)), []).append(int(did))
    vmap = dict(zip(ids.tolist(), vals.tolist()))
    seen = set()
    rows = []
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                p = (ms[i], ms[j])
                if p in seen:
                    continue
                seen.add(p)
                h = bin(vmap[p[0]] ^ vmap[p[1]]).count("1")
                if h <= max_hamming:
                    rows.append((p[0], p[1], h))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (all candidate pairs from LSH, scored)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(sf_dir: str, k_shingle: int = 3) -> pd.DataFrame:
    """LSH-candidate pairs with exact word-k-gram Jaccard >= 0.2."""
    pairs = dedup_minhash_candidates(sf_dir, k_shingle)
    return pairs  # already verified with exact Jaccard


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def dedup_embedding_cosine(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """Near-dup vector pairs with cosine >= threshold, via sign-projection
    LSH buckets (16 seeded random hyperplanes) + in-bucket verification."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    rng = np.random.RandomState(11)
    planes_holder = {}

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].values).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.clip(norms, 1e-12, None)
        if "planes" not in planes_holder:
            planes_holder["planes"] = np.random.RandomState(11).standard_normal(
                (mat.shape[1], 16)
            )
        signs = (mat @ planes_holder["planes"]) > 0
        key = np.packbits(signs, axis=1)[:, :2]
        bucket = (key[:, 0].astype(np.int64) << 8) | key[:, 1].astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].values,
                "bucket": bucket,
                "vec": [v for v in mat],
            }
        )

    def in_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        g = g.sort_values("vec_id")
        mat = np.stack(g["vec"].values)
        cos = mat @ mat.T
        ids = g["vec_id"].values
        ii, jj = np.triu_indices(len(g), k=1)
        keep = cos[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ii[keep]].astype(np.int64),
                "vec_b": ids[jj[keep]].astype(np.int64),
                "cosine": np.round(cos[ii, jj][keep], 6),
            }
        )

    out = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(in_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "vec_a" not in out.columns:
        # all buckets empty: concat of empty frames loses the schema
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
