"""Text-analysis operators over the ``documents`` table — the training-data
pipeline staples (language-ID, quality scoring, token counting, document
fingerprinting) expressed as vectorized batch transforms.

Each operator is a ``map_batches`` stage; the language-ID and quality models
are held warm in an actor (compiled regexes / stopword sets built once per
actor — SURVEY.md §2.5 pattern)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

from ..functions.frames import round_away, typed_out
from ..functions.hashing import stable_hash64_batch

# fixed stopword lists for the n-gram/stopword language heuristic — tiny and
# deterministic; data, not a model
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "por"},
}

_QUALITY_STOPWORDS = STOPWORDS["en"]
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?|[^\sA-Za-z0-9]")  # BPE-ish split


def token_stats_batch(t) -> "pa.Table":
    """Whitespace token counting on zero-copy Arrow batches: split/length
    via pyarrow.compute kernels (the strings never box into pandas
    objects), distinct-per-doc via dictionary-encode -> pack (doc, code)
    into int64 -> one np.unique + bincount. Everything is C level; the
    only per-token Python object ever created is none."""
    import pyarrow as pa
    import pyarrow.compute as pc

    text = pc.coalesce(t.column("text"), "")
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())  # code points, = SQL length()
    n = len(t)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    codes = pc.dictionary_encode(flat).combine_chunks()
    code_np = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    packed = (parents.astype(np.int64) << np.int64(32)) | code_np
    uniq_parent = (np.unique(packed) >> np.int64(32)).astype(np.int64)
    nd = np.bincount(uniq_parent, minlength=n).astype(np.int64)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "n_distinct_tokens": pa.array(nd, pa.int64()),
    })


def doc_token_stats(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(token_stats_batch, batch_format="pyarrow").to_pandas()
    return typed_out(out, {"doc_id": "int64", "n_tokens": "int64",
                           "n_chars": "int64", "n_distinct_tokens": "int64"},
                     sort_by="doc_id")


DOC_TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(COALESCE(text, ''), ' ')) AS n_tokens,
       length(COALESCE(text, '')) AS n_chars,
       len(list_distinct(string_split(COALESCE(text, ''), ' '))) AS n_distinct_tokens
FROM documents
ORDER BY doc_id
"""


def quality_batch(t) -> "pa.Table":
    """Quality scoring components: the standard cheap quality filters of
    web-scale corpora (length, stopword hits, alphabetic mass). Emitted as
    exact integer counts — ratios of small integers land on decimal .5
    boundaries where numpy (half-to-even) and SQL ROUND (half-away) disagree,
    so the comparable surface stays integral; consumers derive ratios.

    Arrow-native: stopword membership tests run against the batch's token
    DICTIONARY (unique tokens), not every token — one is_in over ~thousands
    of uniques instead of millions of occurrences, then a code-indexed
    gather + bincount."""
    import pyarrow as pa
    import pyarrow.compute as pc

    text = pc.coalesce(t.column("text"), "")
    toks = pc.split_pattern(text, " ")
    n = len(t)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    d = pc.dictionary_encode(flat).combine_chunks()
    stop_dict = pc.is_in(
        d.dictionary, value_set=pa.array(sorted(_QUALITY_STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    stop_tok = stop_dict[d.indices.to_numpy(zero_copy_only=False)]
    n_stop = np.bincount(parents[stop_tok], minlength=n).astype(np.int64)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "n_alpha": pc.cast(
            pc.count_substring_regex(text, "[A-Za-z]"), pa.int64()),
    })


def doc_quality(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow").to_pandas()
    return typed_out(out, {"doc_id": "int64", "n_tokens": "int64",
                           "n_chars": "int64", "n_stopwords": "int64",
                           "n_alpha": "int64"}, sort_by="doc_id")


DOC_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(txt) AS n_chars,
       len(list_filter(toks, w -> w IN
           ('the','a','of','and','to','in','is','that','it','for')))
           AS n_stopwords,
       length(regexp_replace(txt, '[^A-Za-z]', '', 'g')) AS n_alpha
FROM t
ORDER BY doc_id
"""


class LangIdModel:
    """Stopword/character n-gram language heuristic, held warm per actor."""

    def __init__(self):
        self.langs = sorted(STOPWORDS)
        self.tables = {lg: frozenset(ws) for lg, ws in STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        # vectorized scoring: explode tokens once, one C-level isin per
        # language, counts re-aggregated by row position
        ex = toks.explode()
        pos = ex.index
        scores = {}
        for lg in self.langs:
            hit = ex.isin(self.tables[lg])
            scores[lg] = (
                hit.groupby(pos).sum().reindex(df.index, fill_value=0).astype(int)
            )
        sc = pd.DataFrame(scores)
        best = sc.idxmax(axis=1)                        # ties -> first alphabetically
        best = best.where(sc.max(axis=1) > 0, "und")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "pred_lang": best.values,
                "score": sc.max(axis=1).astype("int64").values,
            }
        )


def doc_langid(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        LangIdModel, batch_format="pandas", concurrency=2
    ).to_pandas()
    return typed_out(out, {"doc_id": "int64", "pred_lang": "object",
                           "score": "int64"}, sort_by="doc_id")


def _langid_sql() -> str:
    """DuckDB equivalent of LangIdModel: per-language occurrence counts via
    list_filter, argmax with ties broken in sorted-language order (pandas
    ``idxmax`` takes the first column), 'und' when every score is zero."""
    langs = sorted(STOPWORDS)  # de, en, es, fr — idxmax tie order
    counts = ",\n       ".join(
        "len(list_filter(toks, w -> w IN ({}))) AS {}".format(
            ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lg])), lg
        )
        for lg in langs
    )
    greatest = "GREATEST({})".format(", ".join(langs))
    case = "CASE WHEN {g} = 0 THEN 'und' ".format(g=greatest)
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lg} >= {other}" for other in langs[i + 1:])
        case += f"WHEN {conds} THEN '{lg}' "
    case += f"ELSE '{langs[-1]}' END"
    return f"""
WITH t AS (
  SELECT doc_id,
         string_split(lower(COALESCE(text, '')), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
       {counts}
  FROM t
)
SELECT doc_id,
       {case} AS pred_lang,
       {greatest} AS score
FROM s
ORDER BY doc_id
"""


DOC_LANGID_SQL = _langid_sql()


_ROLL_BASE = np.uint64(1099511628211)  # FNV prime; wraparound mod 2^64
_ROLL_WINDOW = 16


def _min_rolling_hash(text: str, w: int = _ROLL_WINDOW) -> np.uint64:
    """Minimum Rabin-Karp rolling hash over all w-byte windows (winnowing-
    style fingerprint: stable under edits outside the minimizing window).
    Vectorized: sliding windows x precomputed base powers, uint64 wraparound."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < w:
        return np.uint64(stable_hash64_batch([text])[0])
    powers = np.power(_ROLL_BASE, np.arange(w - 1, -1, -1, dtype=np.uint64))
    wins = np.lib.stride_tricks.sliding_window_view(b.astype(np.uint64), w)
    with np.errstate(over="ignore"):
        hashes = (wins * powers).sum(axis=1, dtype=np.uint64)
    return hashes.min()


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Document fingerprint: stable 64-bit content hash, prefix/suffix
    signatures, and a winnowing-style minimum rolling hash."""
    text = df["text"].fillna("")
    full = stable_hash64_batch(list(text)).astype(np.int64)
    head = stable_hash64_batch([t[:64] for t in text]).astype(np.int64)
    tail = stable_hash64_batch([t[-64:] for t in text]).astype(np.int64)
    roll = np.array([_min_rolling_hash(t) for t in text], dtype=np.uint64)
    return pd.DataFrame(
        {"doc_id": df["doc_id"], "fp_full": full, "fp_head": head,
         "fp_tail": tail, "fp_roll": roll.astype(np.int64)}
    )


def docs_longest(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Top-k documents by length via a true distributed ``Dataset.sort``
    (range-partitioned sample sort) + ``limit`` — the one query here that
    exercises the global-sort exchange rather than avoiding it. The sort
    moves only (doc_id, n_chars, lang); text never shuffles."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    )
    out = (
        ds.sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return typed_out(out, {"doc_id": "int64", "n_chars": "int64",
                           "lang": "object"})


DOCS_LONGEST_SQL = """
SELECT doc_id, n_chars, lang
FROM documents
ORDER BY n_chars DESC, doc_id
LIMIT 100
"""


def doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint_batch, batch_format="pandas").to_pandas()
    return typed_out(out, {"doc_id": "int64", "fp_full": "object",
                           "fp_head": "object", "fp_tail": "object",
                           "fp_roll": "int64"}, sort_by="doc_id")


def token_topk(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k corpus vocabulary by frequency (the BPE/vocab-prep staple).

    Token cardinality grows with the corpus, so counting is hash-bucketed
    (``bucketed_combine``): every occurrence of a token lands in one bucket,
    the bucket emits only its local top-k, and the driver merges
    ``num_buckets x k`` rows regardless of vocabulary size. Ties break on
    the token string, matching the oracle's ORDER BY."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t) -> pd.DataFrame:
        # fully-Arrow counting (split_pattern -> list_flatten ->
        # value_counts): no Python-object boxing of the text column —
        # measured 5x over the pandas str.split/explode partial on the
        # sf0.1 batch (52 ms -> 10 ms); output bit-identical
        import pyarrow.compute as pc

        toks = pc.list_flatten(
            pc.split_pattern(pc.coalesce(t.column("text"), ""), " "))
        vc = toks.value_counts()
        return pd.DataFrame({
            "token": vc.field("values").to_pandas().to_numpy(object),
            "n": vc.field("counts").to_numpy(
                zero_copy_only=False).astype(np.int64),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        return t.sort_values(["n", "token"], ascending=[False, True]).head(k)

    out = bucketed_combine(ds, "token", partial, combine,
                           partial_format="pyarrow").to_pandas()
    if out.empty:
        return typed_out(out, {"token": "object", "n": "int64"})
    out["n"] = out.n.astype("int64")
    return (
        out.sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


TOKEN_TOPK_SQL = """
SELECT tok AS token, COUNT(*) AS n
FROM (
  SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents
)
GROUP BY tok
ORDER BY n DESC, token
LIMIT 50
"""


def token_doc_freq(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k vocabulary by DOCUMENT frequency — the IDF denominator table
    (how many docs contain each token, vs ``token_topk``'s raw occurrence
    count). The standard prep for TF-IDF weighting / stopword discovery on
    a new corpus.

    Exactness without a doc-level shuffle: each document is one row, so one
    batch sees every occurrence of a doc's tokens — per-batch
    ``drop_duplicates(doc, token)`` gives exact per-doc distinct sets, and
    summing those partials over the token-bucketed exchange is the exact
    global df. What shuffles is (token, count) partials, never text; the
    driver merges ``num_buckets x k`` rows regardless of vocabulary size."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        d = (
            pd.DataFrame({"doc_id": ex.index.to_numpy(),
                          "token": ex.to_numpy(object)})
            .drop_duplicates()
        )
        c = d["token"].value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(object),
                             "df": c.to_numpy(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("token", as_index=False).agg(df=("df", "sum"))
        return t.sort_values(["df", "token"], ascending=[False, True]).head(k)

    out = bucketed_combine(ds, "token", partial, combine).to_pandas()
    if out.empty:
        return typed_out(out, {"token": "object", "df": "int64"})
    out["df"] = out.df.astype("int64")
    return (
        out.sort_values(["df", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


TOKEN_DOC_FREQ_SQL = """
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS df
FROM (
  SELECT DISTINCT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents
)
GROUP BY tok
ORDER BY df DESC, token
LIMIT 50
"""


def token_bigram_topk(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k adjacent token pairs — the first merge-candidate table of
    BPE-style tokenizer training (which symbol pairs co-occur most).

    Bigrams are formed vectorized from the exploded token stream: two
    consecutive explode entries form a pair iff they carry the same source
    row index (numpy shift-compare, no per-row loop). Counting then follows
    the ``token_topk`` shape: bigram-bucketed partial sums, each bucket
    emits its local top-k, driver merges ``buckets x k`` rows regardless of
    the (corpus-sized) distinct-bigram count."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        arr = ex.to_numpy(object)
        idx = ex.index.to_numpy()
        if len(arr) < 2:
            return pd.DataFrame({"bigram": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        same = idx[1:] == idx[:-1]
        pairs = (pd.Series(arr[:-1][same]) + " " + pd.Series(arr[1:][same]))
        c = pairs.value_counts()
        return pd.DataFrame({"bigram": c.index.to_numpy(object),
                             "n": c.to_numpy(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("bigram", as_index=False).agg(n=("n", "sum"))
        return t.sort_values(["n", "bigram"], ascending=[False, True]).head(k)

    out = bucketed_combine(ds, "bigram", partial, combine).to_pandas()
    if out.empty:
        return typed_out(out, {"bigram": "object", "n": "int64"})
    out["n"] = out.n.astype("int64")
    return (
        out.sort_values(["n", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


TOKEN_BIGRAM_TOPK_SQL = """
WITH t AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks FROM documents
),
p AS (
  SELECT toks[i] AS a, toks[i + 1] AS b
  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
)
SELECT a || ' ' || b AS bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM p
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 50
"""


def doc_sample_split(sf_dir: str, eval_pct: int = 10) -> pd.DataFrame:
    """Deterministic train/eval split by multiplicative hash of doc_id —
    the standard reproducible held-out-set assignment (no RNG state, stable
    under any partitioning / reordering of the corpus). Bucket =
    ``(doc_id * 2654435761) mod 2^32 mod 100`` (Knuth multiplicative hash),
    exactly reproducible in SQL with HUGEINT arithmetic."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def split(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.uint64)
        bucket = ((ids * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(100)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "bucket": bucket.astype(np.int64),
                "split": np.where(bucket < eval_pct, "eval", "train"),
            }
        )

    out = ds.map_batches(split, batch_format="pandas").to_pandas()
    return typed_out(out, {"doc_id": "int64", "bucket": "int64",
                           "split": "object"}, sort_by="doc_id")


def doc_length_histogram(sf_dir: str, bucket_chars: int = 50) -> pd.DataFrame:
    """Document-length histogram (the corpus-profiling staple): bucket by
    ``n_chars // bucket_chars``, partial counts inside map_batches, tiny
    final groupby (bucket count is bounded by max document length)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["n_chars"].to_numpy(np.int64) // bucket_chars)
        c = pd.Series(b).value_counts()
        return pd.DataFrame({"bucket": c.index.to_numpy(np.int64),
                             "n_docs": c.to_numpy(np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    return typed_out(out, {"bucket": "int64", "n_docs": "int64"},
                     sort_by="bucket")


DOC_LENGTH_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket,
       COUNT(*) AS n_docs
FROM documents
GROUP BY bucket
ORDER BY bucket
"""


DOC_SAMPLE_SPLIT_SQL = """
SELECT doc_id,
       CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 100
            AS BIGINT) AS bucket,
       CASE WHEN (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 100 < 10
            THEN 'eval' ELSE 'train' END AS split
FROM documents
ORDER BY doc_id
"""


def doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT order statistics of document length at corpus scale without a
    global sort: per-batch value counts -> one small groupby (cardinality
    bounded by the number of distinct lengths, not the corpus) -> driver
    walks the cumulative histogram. The discrete-quantile convention
    matches SQL ``percentile_disc``: the value at row ``ceil(p * n)`` of
    the sorted sequence — smallest v with cum_count(v) >= ceil(p * n)."""
    import math

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n_chars"].value_counts()
        return pd.DataFrame({"v": c.index.to_numpy(np.int64),
                             "n": c.to_numpy(np.int64)})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    if "v" not in hist.columns or not len(hist):
        # empty corpus: percentile over nothing is NULL (matches the oracle)
        return pd.DataFrame({"p": ps, "n_chars_q": [np.nan] * len(ps)})
    hist = hist.sort_values("v")
    vals = hist["v"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    qs = [int(vals[np.searchsorted(cum, math.ceil(p * n))]) for p in ps]
    return pd.DataFrame({"p": ps, "n_chars_q": pd.array(qs, dtype="int64")})


DOC_LENGTH_QUANTILES_SQL = """
SELECT 0.25 AS p, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS n_chars_q FROM documents
UNION ALL
SELECT 0.5 AS p, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS n_chars_q FROM documents
UNION ALL
SELECT 0.75 AS p, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS n_chars_q FROM documents
UNION ALL
SELECT 0.9 AS p, CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS n_chars_q FROM documents
UNION ALL
SELECT 0.99 AS p, CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS n_chars_q FROM documents
ORDER BY p
"""


def doc_length_quantiles_sketch(
    sf_dir: str, sketch_size: int = 256, combine_blocks: int = 8
) -> pd.DataFrame:
    """APPROXIMATE quantiles via a mergeable weighted equi-depth summary —
    the third sketch next to HLL (events_distinct_users_hll) and count-min
    (token_topk_cms), and the scale path when the value domain is NOT
    bounded (doc_length_quantiles' exact histogram assumes distinct-value
    cardinality << corpus; continuous scores break that).

    Shape: each batch collapses to ``sketch_size`` weighted points at
    even local ranks (weight = batch_n / S); a second map_batches level
    compacts ``combine_blocks`` coalesced summary blocks the same way, so
    what reaches the driver is O(combine_blocks x S) regardless of input
    size — a two-level KLL-style hierarchy. Deterministic (rank midpoints,
    no sampling); rank error is O(levels / sketch_size), pinned against
    the exact operator in tests. No SQL oracle: approximate by design."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def _compact(vals: np.ndarray, wts: np.ndarray, s: int):
        """(values, weights) -> <= s equi-depth points of equal weight."""
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        total = wts.sum()
        if len(vals) <= s:
            return vals, wts
        cum = wts.cumsum()
        targets = total * (np.arange(s) + 0.5) / s
        idx = np.searchsorted(cum, targets, side="left")
        return vals[np.clip(idx, 0, len(vals) - 1)], np.full(s, total / s)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["n_chars"].to_numpy(np.float64)
        if not len(v):
            return pd.DataFrame({"v": pd.Series([], dtype="float64"),
                                 "w": pd.Series([], dtype="float64")})
        pv, pw = _compact(v, np.ones(len(v)), sketch_size)
        return pd.DataFrame({"v": pv, "w": pw})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        cv, cw = _compact(df["v"].to_numpy(np.float64),
                          df["w"].to_numpy(np.float64), sketch_size)
        return pd.DataFrame({"v": cv, "w": cw})

    summary = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(combine_blocks)
        .map_batches(combine, batch_format="pandas")
        .to_pandas()
    )
    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    if summary.empty:
        return pd.DataFrame({"p": ps, "n_chars_q": [np.nan] * len(ps)})
    # deterministic final reduce: full sort of <= combine_blocks x S points
    summary = summary.sort_values(["v", "w"], kind="stable")
    vals = summary["v"].to_numpy(np.float64)
    cum = summary["w"].to_numpy(np.float64).cumsum()
    total = cum[-1]
    qs = [float(vals[min(np.searchsorted(cum, p * total), len(vals) - 1)])
          for p in ps]
    return pd.DataFrame({"p": ps, "n_chars_q": qs})


def _mix_batch(df: pd.DataFrame) -> pd.DataFrame:
    """The corpus_mix keep rule as a reusable batch filter: Knuth
    multiplicative hash of doc_id vs the source family's rate
    (100 / 50 / 20 %). Shared by ``corpus_mix`` and the temperature
    stage that composes on top of it."""
    ids = df["doc_id"].to_numpy(np.uint64)
    bucket = ((ids * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(100)
    fam = df["source"].str[3:].astype(int).to_numpy(np.int64) % 3
    rate = np.select([fam == 0, fam == 1], [100, 50], default=20)
    keep = bucket < rate
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
        "source": df["source"].to_numpy()[keep],
    })


def corpus_mix(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-source downsampling — the data-mixing step that
    reweights a corpus before training (keep 100% of one source family,
    50% / 20% of others). Keep decision = Knuth multiplicative hash of
    doc_id compared against the source's rate, so the sample is exactly
    reproducible under any partitioning and in SQL. Pure map + filter:
    no shuffle at any scale."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    out = ds.map_batches(_mix_batch, batch_format="pandas").to_pandas()
    return typed_out(out, {"doc_id": "int64", "source": "object"},
                     sort_by="doc_id")


CORPUS_MIX_SQL = """
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 100 AS bucket,
         CASE CAST(substr(source, 4) AS INTEGER) % 3
              WHEN 0 THEN 100 WHEN 1 THEN 50 ELSE 20 END AS rate
  FROM documents
)
WHERE bucket < rate
ORDER BY doc_id
"""


def corpus_temperature_mix(sf_dir: str) -> pd.DataFrame:
    """Temperature-flattened source sampling (alpha = 0.5) composed on top
    of the family mix — the multilingual/multi-source reweighting step
    (cf. T5/mC4-style p_s ∝ n_s^alpha): after the family-rate mix skews
    per-source counts, each source s is downsampled at
    ``rate_s = sqrt(n_min / n_s)`` so the kept distribution flattens
    toward n_s^0.5 while the smallest source keeps 100%.

    The keep decision is EXACT integer arithmetic — no float pow on
    either engine: with a 20-bit doc hash ``h``, keep iff
    ``h^2 <= (2^40 * n_min - 1) // n_s`` (equivalent to
    ``h / 2^20 < sqrt(n_min / n_s)``). Thresholds are computed on the
    driver with arbitrary-precision Python ints from the bounded
    per-source counts and broadcast as a tiny dict; workers compare two
    int64s. The second-stage hash uses a different multiplier than the
    mix stage so the two sampling decisions are uncorrelated.

    Two streaming passes (counts, then filter); per-source counts are the
    only driver state — bounded by the source dimension, not the corpus."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = _mix_batch(df)
        c = m.groupby("source", sort=False).size().reset_index(name="n")
        return c

    parts = ds.map_batches(count_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return typed_out(pd.DataFrame(), {"doc_id": "int64", "source": "object"})
    counts = parts.groupby("source")["n"].sum()
    n_min = int(counts.min())
    # exact: h^2 <= (2^40 * n_min - 1) // n_s  <=>  h/2^20 < sqrt(n_min/n_s);
    # thresholds <= 2^40 so they always fit int64 regardless of corpus size
    thr = {s: (((1 << 40) * n_min) - 1) // int(n) for s, n in counts.items()}

    def temp_filter(df: pd.DataFrame) -> pd.DataFrame:
        m = _mix_batch(df)
        ids = m["doc_id"].to_numpy(np.uint64)
        h = ((ids * np.uint64(2246822519)) % np.uint64(2**32)) % np.uint64(1 << 20)
        h2 = (h * h).astype(np.int64)
        t = m["source"].map(thr).to_numpy(np.int64)
        keep = h2 <= t
        return m.loc[keep].reset_index(drop=True)

    out = ds.map_batches(temp_filter, batch_format="pandas").to_pandas()
    return typed_out(out, {"doc_id": "int64", "source": "object"},
                     sort_by="doc_id")


CORPUS_TEMPERATURE_MIX_SQL = """
WITH mixed AS (
  SELECT doc_id, source
  FROM (
    SELECT doc_id, source,
           (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 100 AS bucket,
           CASE CAST(substr(source, 4) AS INTEGER) % 3
                WHEN 0 THEN 100 WHEN 1 THEN 50 ELSE 20 END AS rate
    FROM documents
  )
  WHERE bucket < rate
), counts AS (
  SELECT source, COUNT(*)::HUGEINT AS n FROM mixed GROUP BY source
), thr AS (
  SELECT source,
         (1099511627776::HUGEINT * (SELECT MIN(n) FROM counts) - 1) // n AS t
  FROM counts
), hashed AS (
  SELECT m.doc_id, m.source, t.t,
         (CAST(m.doc_id AS HUGEINT) * 2246822519) % 4294967296 % 1048576 AS h
  FROM mixed m JOIN thr t USING (source)
)
SELECT doc_id, source
FROM hashed
WHERE h * h <= t
ORDER BY doc_id
"""


def corpus_sample_quota(sf_dir: str, quota: int = 20) -> pd.DataFrame:
    """Exact-quota stratified sample: exactly ``min(quota, n)`` docs per
    source, chosen by multiplicative-hash order — the fixed-budget
    counterpart to rate-based ``corpus_mix`` (e.g. "eval set: 10k docs per
    source, reproducibly, regardless of source size").

    Hash order makes the selection a per-group top-k, so no per-source
    global sort is needed: each batch keeps at most ``quota`` rows per
    source it sees (partial top-k), the source-bucketed combine merges
    partials and keeps the global smallest ``quota``. Rows on the wire are
    bounded by ``quota x sources x batches`` pre-combine and
    ``quota x sources`` after — never corpus-sized, and skew-immune because
    a giant source still ships only ``quota`` rows per batch."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["h", "doc_id"], kind="stable")
            .groupby("source", as_index=False, sort=False)
            .head(quota)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(2**32)
        return _top(pd.DataFrame({
            "source": df["source"].to_numpy(object),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "h": h.astype(np.int64),
        }))

    out = bucketed_combine(ds, "source", partial, _top,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    if out.empty:
        return typed_out(out, {"source": "object", "doc_id": "int64"})
    return typed_out(out.drop(columns=["h"]),
                     {"source": "object", "doc_id": "int64"},
                     sort_by=["source", "doc_id"])


CORPUS_SAMPLE_QUOTA_SQL = """
SELECT source, doc_id
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296,
                    doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 20
ORDER BY source, doc_id
"""


def token_topk_cms(
    sf_dir: str, k: int = 50, width: int = 4096, depth: int = 4
) -> pd.DataFrame:
    """Approximate heavy hitters via a count-min sketch — the mergeable-
    sketch alternative to the exact bucketed ``token_topk`` when even one
    row per distinct token per bucket is too much (open-vocabulary n-grams
    at corpus scale). Each batch emits ONE fixed-size (depth x width)
    count matrix plus its local top candidates; matrices merge by
    elementwise sum (the CMS property), so the reduce is O(batches) over
    constant-size state no matter the vocabulary. Final counts = CMS
    estimate (min over rows) for the union of local candidates.
    Overestimates only (one-sided error <= eps*N with eps = e/width);
    accuracy pinned against the exact top-k in tests."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        toks = ex.dropna().to_numpy(dtype=object)
        cms = np.zeros((depth, width), np.int64)
        if len(toks):
            h = pd.util.hash_array(toks)  # stable across processes
            for d in range(depth):
                with np.errstate(over="ignore"):
                    idx = ((h * seeds[d]) >> np.uint64(40)) % np.uint64(width)
                np.add.at(cms[d], idx.astype(np.int64), 1)
            c = pd.Series(toks).value_counts().head(2 * k)
            cand = c.index.to_numpy(object)
        else:
            cand = np.empty(0, object)
        return pd.DataFrame({
            "cms": [cms.tobytes()],
            "cand": [list(map(str, cand))],
        })

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    if parts.empty:
        from ..functions.frames import typed_out

        return typed_out(parts, {"token": "object", "n_est": "int64"})
    total = np.zeros((depth, width), np.int64)
    cands: set[str] = set()
    for b, cl in zip(parts["cms"], parts["cand"]):
        total += np.frombuffer(b, np.int64).reshape(depth, width)
        cands.update(cl)
    cand = np.array(sorted(cands), object)
    if not len(cand):
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "n_est": pd.Series(dtype="int64")})
    h = pd.util.hash_array(cand)
    est = np.full(len(cand), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        with np.errstate(over="ignore"):
            idx = ((h * seeds[d]) >> np.uint64(40)) % np.uint64(width)
        est = np.minimum(est, total[d, idx.astype(np.int64)])
    out = pd.DataFrame({"token": cand, "n_est": est})
    return (out.sort_values(["n_est", "token"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def doc_length_quantiles_by_source(sf_dir: str) -> pd.DataFrame:
    """GROUPED exact order statistics: the median + p90 of document length
    PER SOURCE, without a sort — the grouped variant of
    ``doc_length_quantiles``. Per-batch (source, n_chars) value counts ->
    one distributed groupby whose cardinality is bounded by
    |sources| x |distinct lengths| (independent of corpus row count) ->
    driver walks each source's cumulative histogram. Convention matches
    SQL ``percentile_disc``: smallest v with cum_count(v) >= ceil(p*n)."""
    import math

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["source", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if "source" not in hist.columns or not len(hist):
        return pd.DataFrame({"source": pd.Series([], dtype="object"),
                             "median_chars": pd.Series([], dtype="int64"),
                             "p90_chars": pd.Series([], dtype="int64")})
    rows = []
    for src, g in hist.sort_values(["source", "n_chars"]).groupby("source"):
        vals = g["n_chars"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        rows.append({
            "source": src,
            "median_chars": int(vals[np.searchsorted(cum, math.ceil(0.5 * n))]),
            "p90_chars": int(vals[np.searchsorted(cum, math.ceil(0.9 * n))]),
        })
    out = pd.DataFrame(rows)
    out["median_chars"] = out.median_chars.astype("int64")
    out["p90_chars"] = out.p90_chars.astype("int64")
    return out.sort_values("source").reset_index(drop=True)


DOC_LENGTH_QUANTILES_BY_SOURCE_SQL = """
SELECT source,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
           AS median_chars,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
           AS p90_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def doc_length_moments(sf_dir: str) -> pd.DataFrame:
    """Distributed mergeable-moments aggregate: per-source mean / population
    variance / stddev of document length from EXACT integer partials
    (count, sum, sum-of-squares per batch). Integer addition is associative,
    so the combine is order-independent with no sorted-reduce workaround —
    the textbook mergeable aggregate. The float math happens ONCE at the
    end, written as the exact same double expression the oracle SQL uses
    ((s2 - s*s/n)/n), so rounding is bit-stable across engines.

    Range note: int64 sum-of-squares is exact while per-batch
    sum(n_chars^2) < 2^63 — true for any batch of real documents
    (n_chars < 1e8 -> c^2 <= 1e16, >900 such docs per batch before
    overflow); a corpus of pathological multi-GB single documents would
    need the skew splitter upstream anyway."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n_chars"].astype("int64")
        return (df.assign(c=c, c2=c * c)
                .groupby("source", as_index=False)
                .agg(n=("c", "size"), s1=("c", "sum"), s2=("c2", "sum")))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"source": pd.Series([], dtype="object"),
                             "n_docs": pd.Series([], dtype="int64"),
                             "mean_chars": pd.Series([], dtype="float64"),
                             "var_chars": pd.Series([], dtype="float64"),
                             "std_chars": pd.Series([], dtype="float64")})
    agg = parts.groupby("source", as_index=False).agg(
        n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))
    n = agg["n"].to_numpy(np.float64)
    s1 = agg["s1"].to_numpy(np.float64)
    s2 = agg["s2"].to_numpy(np.float64)
    var = (s2 - s1 * s1 / n) / n
    from ..functions.frames import round_away as _ra
    out = pd.DataFrame({
        "source": agg["source"],
        "n_docs": agg["n"].astype("int64"),
        "mean_chars": _ra(pd.Series(s1 / n), 4),
        "var_chars": _ra(pd.Series(var), 4),
        "std_chars": _ra(pd.Series(np.sqrt(var)), 4),
    })
    return out.sort_values("source").reset_index(drop=True)


DOC_LENGTH_MOMENTS_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS mean_chars,
       ROUND((CAST(SUM(n_chars * n_chars) AS DOUBLE)
              - CAST(SUM(n_chars) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE)
                / COUNT(*)) / COUNT(*), 4) AS var_chars,
       ROUND(sqrt((CAST(SUM(n_chars * n_chars) AS DOUBLE)
              - CAST(SUM(n_chars) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE)
                / COUNT(*)) / COUNT(*)), 4) AS std_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def tf_idf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k TF-IDF terms per document — the composition showcase: per-doc
    term counts (complete per batch: one doc = one row) -> token-bucketed
    exchange for the exact global document frequency -> token-keyed
    bucketed join scoring tf * ln(N/df) -> doc-keyed exchange for the
    per-doc top-k (per-batch local top-k per doc prunes first; top-k of a
    union is contained in the union of per-part top-ks, so the prune is
    exact). Two bucketed exchanges, both moving (token|doc, small-int)
    partials — never text. Ranking uses the UNROUNDED double score with
    token tiebreak, mirrored exactly by the oracle's ROW_NUMBER."""
    from ..functions.frames import round_away as _ra
    from ..functions.shuffle import bucketed_combine, bucketed_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = ds.count()  # parquet metadata count — no scan
    empty_schema = {"doc_id": "int64", "token": "object", "tf": "int64",
                    "df": "int64", "tfidf": "float64"}
    if not n_docs:
        return typed_out(pd.DataFrame(), empty_schema)

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        g = (pd.DataFrame({"doc_id": ex.index.to_numpy(),
                           "token": ex.to_numpy(object)})
             .groupby(["doc_id", "token"], as_index=False).size()
             .rename(columns={"size": "tf"}))
        g["tf"] = g.tf.astype("int64")
        return g

    tf = ds.map_batches(tf_partial, batch_format="pandas")

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        # input IS the tf stream: one row per (doc, token), so counting
        # rows per token per batch sums to the exact global df
        c = df["token"].value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(object),
                             "df": c.to_numpy(np.int64)})

    def df_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(df=("df", "sum"))

    # tf is consumed twice (df build + the scoring join): materialize the
    # (doc, token, tf) partials once; they are small-int rows, not text
    tf = tf.materialize()
    dfreq = bucketed_combine(tf, "token", df_partial, df_combine)

    def score_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="token")
        if m.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in empty_schema.items()
                                 }).rename(columns={"tfidf": "score"})
        m["score"] = m.tf.to_numpy(np.float64) * np.log(
            float(n_docs) / m.df.to_numpy(np.float64))
        # local prune: top-k per doc within this bucket's frame
        m = m.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True], kind="stable")
        return m.groupby("doc_id", as_index=False).head(k)

    scored = bucketed_join(
        tf, dfreq, "token", "token", score_fn,
        left_dtypes={"doc_id": "int64", "token": "object", "tf": "int64"},
        right_dtypes={"token": "object", "df": "int64"},
        coalesce_blocks=16,
    )

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("doc_id", as_index=False).head(k)

    def topk_combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True], kind="stable")
        return g.groupby("doc_id", as_index=False).head(k)

    out = bucketed_combine(
        scored, "doc_id", topk_partial, topk_combine, coalesce_blocks=16
    ).to_pandas()
    if out.empty:
        return typed_out(pd.DataFrame(), empty_schema)
    out["tfidf"] = _ra(out["score"], 6)
    out = out.drop(columns=["score"])
    out["doc_id"] = out.doc_id.astype("int64")
    out["tf"] = out.tf.astype("int64")
    out["df"] = out.df.astype("int64")
    return (out[["doc_id", "token", "tf", "df", "tfidf"]]
            .sort_values(["doc_id", "tfidf", "token"],
                         ascending=[True, False, True], kind="stable")
            .reset_index(drop=True))


TF_IDF_TOP_TERMS_SQL = """
WITH tf AS (
  SELECT doc_id, tok AS token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
), dfreq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS score,
         ROW_NUMBER() OVER (
             PARTITION BY tf.doc_id
             ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) DESC,
                      tf.token) AS rn
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, ROUND(score, 6) AS tfidf
FROM scored WHERE rn <= 3
ORDER BY doc_id, tfidf DESC, token
"""


# ---------------------------------------------------------------------------
# corpus-unigram-LM document scoring (CCNet-style quality proxy)
# ---------------------------------------------------------------------------

def doc_unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Mean log-probability of each document's tokens under the corpus's
    OWN unigram distribution — the classic cheap LM-quality proxy (CCNet /
    Gopher filtering families): gibberish and boilerplate-free prose
    separate cleanly on this score before any real LM runs.

    Plan (two bucketed exchanges, text never shuffles):
      1. (doc, token, cnt) partials, complete per batch;
      2. token-bucketed combine -> exact global term frequency f(token);
         total token count N reduces exactly (integers) on the driver;
      3. token-keyed bucketed join attaches ln(f) and pre-aggregates per
         doc WITHIN the bucket (sum cnt*ln f, sum cnt);
      4. doc-keyed exchange sums the bucket partials; logprob =
         sum/n_tokens - ln(N), rounded half-away like the oracle.

    Determinism: both exchanges run over _stable_order'ed buckets, so the
    float sums add in a fixed order; the 1e-6 rounding absorbs DuckDB's
    own summation-order ulps. Returns (doc_id, logprob, n_tokens)."""
    from ..functions.frames import round_away
    from ..functions.shuffle import bucketed_combine, bucketed_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    empty_schema = {"doc_id": "int64", "logprob": "float64",
                    "n_tokens": "int64"}

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        g = (pd.DataFrame({"doc_id": ex.index.to_numpy(),
                           "token": ex.to_numpy(object)})
             .groupby(["doc_id", "token"], as_index=False).size()
             .rename(columns={"size": "tf"}))
        g["tf"] = g.tf.astype("int64")
        return g

    # consumed twice (frequency build + scoring join): materialize the
    # small-int (doc, token, tf) partials once
    tf = ds.map_batches(tf_partial, batch_format="pandas").materialize()

    def f_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).agg(f=("tf", "sum"))

    def f_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(f=("f", "sum"))

    freq = bucketed_combine(tf, "token", f_partial, f_combine).materialize()

    n_parts = freq.map_batches(
        lambda df: pd.DataFrame({"n": [np.int64(df.f.sum())]}),
        batch_format="pandas",
    ).to_pandas()
    n_total = int(n_parts.n.sum()) if len(n_parts) else 0
    if n_total == 0:
        return typed_out(pd.DataFrame(), empty_schema)

    def attach(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="token")
        if m.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n_tok": pd.Series(dtype="int64")})
        m["s"] = m.tf.to_numpy(np.float64) * np.log(m.f.to_numpy(np.float64))
        return m.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), n_tok=("tf", "sum"))

    partials = bucketed_join(
        tf, freq, "token", "token", attach,
        left_dtypes={"doc_id": "int64", "token": "object", "tf": "int64"},
        right_dtypes={"token": "object", "f": "int64"},
        coalesce_blocks=16,
    )

    def docsum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), n_tok=("n_tok", "sum"))
        return pd.DataFrame({
            "doc_id": out.doc_id.to_numpy(np.int64),
            "logprob": round_away(
                out.s.to_numpy() / out.n_tok.to_numpy() - np.log(n_total), 6),
            "n_tokens": out.n_tok.to_numpy(np.int64),
        })

    out = bucketed_combine(
        partials, "doc_id", lambda df: df, docsum, coalesce_blocks=8,
    ).to_pandas()
    return typed_out(out, empty_schema, sort_by="doc_id")


DOC_UNIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), freq AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS f FROM tok GROUP BY w
), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok)
SELECT t.doc_id,
       ROUND(SUM(ln(f.f)) / COUNT(*) - ln((SELECT n FROM tot)), 6) AS logprob,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok t JOIN freq f ON t.w = f.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# per-document character entropy (gibberish / binary-junk filter signal)
# ---------------------------------------------------------------------------

def entropy_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Shannon entropy over each document's Unicode codepoints, fully
    vectorized: ONE ``str.join`` + ONE utf-32 encode per batch turns the
    whole batch's text into a flat uint32 codepoint array; per-doc
    boundaries come from codepoint lengths; per-(doc, char) counts from
    one ``np.unique`` over packed ``row << 21 | codepoint`` keys (21 bits
    covers U+10FFFF); per-doc reduction via ``np.add.reduceat``. No
    per-character Python objects are ever created."""
    texts = df["text"].fillna("")
    lens = texts.str.len().to_numpy(np.int64)
    joined = "".join(texts.to_numpy(object))
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    cps = cps.astype(np.int64)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    ent = np.zeros(len(lens), np.float64)
    if len(cps):
        packed = (rows << np.int64(21)) | cps
        uniq, counts = np.unique(packed, return_counts=True)
        up = (uniq >> np.int64(21)).astype(np.int64)
        p = counts.astype(np.float64) / lens[up].astype(np.float64)
        contrib = -(p * np.log2(p))
        # uniq is sorted, so per-doc runs are contiguous: reduceat over
        # the run starts sums each doc's contributions in codepoint order
        # (a fixed order — the 1e-6 rounding absorbs DuckDB's own ulps)
        starts = np.flatnonzero(np.r_[True, up[1:] != up[:-1]])
        ent[up[starts]] = np.add.reduceat(contrib, starts)
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(np.int64),
        "n_chars": lens,
        # + 0.0 folds IEEE -0.0 (single-distinct-char docs) to +0.0 so the
        # value-hash compare can never see a sign-of-zero difference
        "entropy": round_away(ent, 6) + 0.0,
    })


def doc_char_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    cheap gibberish/binary-junk detector of web-corpus quality filtering:
    natural prose sits ~3.5-4.5 bits, mojibake and base64 blobs jump
    higher, single-character spam drops to ~0. Pure ``map_batches``: no
    shuffle at any scale."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(entropy_batch, batch_format="pandas").to_pandas()
    return typed_out(out, {"doc_id": "int64", "n_chars": "int64",
                           "entropy": "float64"}, sort_by="doc_id")


DOC_CHAR_ENTROPY_SQL = """
WITH c AS (
  SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), '')) AS ch
  FROM documents
), cnt AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS m FROM c GROUP BY 1, 2
), n AS (
  SELECT doc_id, SUM(m) AS n FROM cnt GROUP BY 1
), h AS (
  SELECT cnt.doc_id, -SUM((m / n.n) * LOG2(m / n.n)) AS ent
  FROM cnt JOIN n USING (doc_id) GROUP BY cnt.doc_id
)
SELECT d.doc_id,
       CAST(length(COALESCE(d.text, '')) AS BIGINT) AS n_chars,
       ROUND(COALESCE(h.ent, 0.0), 6) + 0.0 AS entropy
FROM documents d LEFT JOIN h USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations (tokenizer-merge / multi-word-expression candidates)
# ---------------------------------------------------------------------------

def token_pmi_topk(sf_dir: str, k: int = 50, min_count: int = 5) -> pd.DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual information —
    the statistic behind multi-word-expression mining and informed BPE
    merges: PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) ranks pairs that co-occur
    far above chance, where raw bigram counts just rank frequent pairs.

    Plan (everything distributed, text never shuffles):
      1. bigram counts via bigram-bucketed combine, pruned to
         ``n >= min_count`` (the support filter standard in collocation
         mining — and what bounds the candidate set at corpus scale);
      2. unigram counts via token-bucketed combine; corpus totals T
         (tokens) and B (adjacent pairs) reduce exactly as integers;
      3. two bucketed joins attach p(a) then p(b) (candidates re-key by
         the b token between them);
      4. per-bucket local top-k by (unrounded PMI, bigram), driver merges
         buckets x k rows.
    """
    from ..functions.frames import round_away as _ra
    from ..functions.shuffle import bucketed_combine, bucketed_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    empty_schema = {"bigram": "object", "n": "int64", "pmi": "float64"}
    n_docs = ds.count()
    if not n_docs:
        return typed_out(pd.DataFrame(), empty_schema)

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        c = ex.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(object),
                             "f": c.to_numpy(np.int64)})

    def uni_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(f=("f", "sum"))

    uni = bucketed_combine(ds, "token", uni_partial, uni_combine,
                           partial_format="pandas").materialize()

    t_parts = uni.map_batches(
        lambda df: pd.DataFrame({"t": [np.int64(df.f.sum())]}),
        batch_format="pandas").to_pandas()
    t_total = int(t_parts.t.sum()) if len(t_parts) else 0
    b_total = t_total - n_docs  # sum over docs of (len - 1)
    if b_total <= 0:
        return typed_out(pd.DataFrame(), empty_schema)

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        arr = ex.to_numpy(object)
        idx = ex.index.to_numpy()
        if len(arr) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        same = idx[1:] == idx[:-1]
        g = (pd.DataFrame({"a": arr[:-1][same], "b": arr[1:][same]})
             .groupby(["a", "b"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g.n.astype("int64")
        return g

    def big_combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["a", "b"], as_index=False).agg(n=("n", "sum"))
        return t[t.n >= min_count]

    # bucket by the full bigram (both tokens): a hot unigram like "the"
    # spreads across buckets instead of landing in one
    def big_partial_keyed(df: pd.DataFrame) -> pd.DataFrame:
        g = big_partial(df)
        g["bigram"] = g.a.astype(object) + " " + g.b.astype(object)
        return g

    cands = bucketed_combine(ds, "bigram", big_partial_keyed,
                             big_combine, partial_format="pandas")

    def attach_a(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right.rename(columns={"token": "a", "f": "fa"}), on="a")
        return m[["a", "b", "n", "fa"]]

    with_fa = bucketed_join(
        cands, uni, "a", "token", attach_a,
        left_dtypes={"a": "object", "b": "object", "n": "int64"},
        right_dtypes={"token": "object", "f": "int64"},
        coalesce_blocks=8,
    )

    def attach_b(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right.rename(columns={"token": "b", "f": "fb"}), on="b")
        if m.empty:
            return pd.DataFrame({"bigram": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64"),
                                 "pmi": pd.Series(dtype="float64")})
        T, B = np.float64(t_total), np.float64(b_total)
        n2 = m.n.to_numpy(np.float64)
        # round BEFORE the local prune: the oracle orders by ROUND(pmi, 6),
        # so two bigrams that round equal tie-break lexicographically — an
        # unrounded local sort could prune the one the global rounded sort
        # keeps at a k-boundary
        pmi = _ra(np.log((n2 / B) / ((m.fa.to_numpy(np.float64) / T)
                                     * (m.fb.to_numpy(np.float64) / T))), 6)
        out = pd.DataFrame({"bigram": (m.a.astype(object) + " "
                                       + m.b.astype(object)),
                            "n": m.n.to_numpy(np.int64), "pmi": pmi})
        # local prune: this bucket's top-k is a superset of its share of
        # the global top-k
        return (out.sort_values(["pmi", "bigram"], ascending=[False, True],
                                kind="stable").head(k))

    scored = bucketed_join(
        with_fa, uni, "b", "token", attach_b,
        left_dtypes={"a": "object", "b": "object", "n": "int64",
                     "fa": "int64"},
        right_dtypes={"token": "object", "f": "int64"},
        coalesce_blocks=8,
    )

    out = scored.to_pandas()  # <= num_buckets x k rows
    if out.empty:
        return typed_out(pd.DataFrame(), empty_schema)
    out["pmi"] = _ra(out["pmi"], 6)
    out["n"] = out.n.astype("int64")
    return (out.sort_values(["pmi", "bigram"], ascending=[False, True],
                            kind="stable")
            .head(k)[["bigram", "n", "pmi"]]
            .reset_index(drop=True))


TOKEN_PMI_TOPK_SQL = """
WITH t AS (
  SELECT string_split(COALESCE(text, ''), ' ') AS ts FROM documents
), tot AS (
  SELECT CAST(SUM(len(ts)) AS DOUBLE) AS T,
         CAST(SUM(len(ts) - 1) AS DOUBLE) AS B
  FROM t
), uni AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS f
  FROM (SELECT UNNEST(ts) AS w FROM t) GROUP BY w
), big AS (
  SELECT ts[i] AS a, ts[i + 1] AS b, COUNT(*) AS n
  FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS s(i)
  GROUP BY 1, 2
  HAVING COUNT(*) >= 5
)
SELECT big.a || ' ' || big.b AS bigram,
       CAST(big.n AS BIGINT) AS n,
       ROUND(LN((big.n / tot.B) / ((ua.f / tot.T) * (ub.f / tot.T))), 6)
           AS pmi
FROM big
CROSS JOIN tot
JOIN uni ua ON ua.w = big.a
JOIN uni ub ON ub.w = big.b
ORDER BY pmi DESC, bigram
LIMIT 50
"""


# ---------------------------------------------------------------------------
# Zipf fit (corpus-health diagnostic)
# ---------------------------------------------------------------------------

def doc_zipf_fit(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """Least-squares Zipf fit over the top-``top_n`` token frequencies:
    slope of ln(freq) on ln(rank). Natural-language corpora sit near -1;
    template/boilerplate floods flatten the head and machine-generated
    junk steepens it — a one-number corpus-health diagnostic computed
    before/after every curation step.

    Distribution: exact global top-N comes out of the token-bucketed
    combine (each bucket emits its local top-N; the global top-N of a
    disjoint union is inside the union of per-bucket top-Ns), driver fits
    OLS on N bounded rows. Rank ties broken by token, mirroring the
    oracle's ROW_NUMBER ordering."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        c = ex.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(object),
                             "n": c.to_numpy(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        return t.sort_values(["n", "token"], ascending=[False, True]).head(top_n)

    out = bucketed_combine(ds, "token", partial, combine).to_pandas()
    if out.empty:
        # aggregate-without-GROUP-BY parity: the oracle returns ONE row
        # (count 0, NULL slope/intercept) on an empty corpus
        return pd.DataFrame({"n_terms": np.array([0], np.int64),
                             "zipf_slope": [np.nan],
                             "zipf_intercept": [np.nan]})
    top = (out.sort_values(["n", "token"], ascending=[False, True])
           .head(top_n))
    y = np.log(top.n.to_numpy(np.float64))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    if len(top) < 2:  # var_pop(x) = 0: regr_slope is NULL in SQL
        slope = intercept = np.nan
    else:
        # population covariance / variance — the regr_slope definition
        mx, my = x.mean(), y.mean()
        slope = ((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum()
        intercept = my - slope * mx
    return pd.DataFrame({
        "n_terms": np.array([len(top)], np.int64),
        "zipf_slope": round_away(np.array([slope]), 6),
        "zipf_intercept": round_away(np.array([intercept]), 6),
    })


DOC_ZIPF_FIT_SQL = """
WITH f AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS n
  FROM (SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
        FROM documents)
  GROUP BY w
  ORDER BY n DESC, w
  LIMIT 100
), r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(LN(n), LN(rank)), 6) AS zipf_slope,
       ROUND(regr_intercept(LN(n), LN(rank)), 6) AS zipf_intercept
FROM r
"""


def corpus_token_entropy(sf_dir: str) -> pd.DataFrame:
    """Exact unigram-distribution Shannon entropy of the WHOLE corpus
    (nats) plus exact vocabulary size — the information-density dial of a
    training mix (low entropy = boilerplate-flooded; the per-token
    average-depth bound a tokenizer/LM sees).

    Exact at any scale because the statistic decomposes over disjoint
    token buckets: H = ln(T) - (sum over tokens of n ln n) / T, and each
    bucketed-combine group owns ALL occurrences of its tokens, so one
    (sum_n, sum_nlogn, n_vocab) triple per bucket reduces to the exact
    global answer — no vocabulary-sized table ever leaves the workers."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        c = ex.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(object),
                             "n": c.to_numpy(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        n = t.n.to_numpy(np.float64)
        return pd.DataFrame({
            "n_vocab": np.array([len(t)], np.int64),
            "n_tok": np.array([int(t.n.sum())], np.int64),
            "nlogn": np.array([(n * np.log(n)).sum()], np.float64),
        })

    parts = bucketed_combine(ds, "token", partial, combine).to_pandas()
    if parts.empty or not parts.n_tok.sum():
        return pd.DataFrame({"n_vocab": np.array([0], np.int64),
                             "n_tokens": np.array([0], np.int64),
                             "token_entropy": [np.nan]})
    t = np.float64(int(parts.n_tok.sum()))
    h = np.log(t) - np.float64(parts.nlogn.sum()) / t
    return pd.DataFrame({
        "n_vocab": np.array([int(parts.n_vocab.sum())], np.int64),
        "n_tokens": np.array([int(parts.n_tok.sum())], np.int64),
        "token_entropy": round_away(np.array([h]), 6),
    })


CORPUS_TOKEN_ENTROPY_SQL = """
WITH f AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS n
  FROM (SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
        FROM documents)
  GROUP BY w
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tokens,
       ROUND(LN((SELECT SUM(n) FROM f))
             - SUM(n * LN(n)) / (SELECT SUM(n) FROM f), 6) AS token_entropy
FROM f
"""


_COVERAGE_KS = (10, 50, 100, 500, 1000)


def token_coverage_curve(sf_dir: str) -> pd.DataFrame:
    """What fraction of all token OCCURRENCES the top-k vocabulary covers,
    at k in {10, 50, 100, 500, 1000} — the curve that sizes a tokenizer
    vocabulary (and exposes boilerplate floods: unnaturally steep heads).

    One token-bucketed exchange: each bucket emits its local top-1000
    (the global top-1000 of a disjoint union is inside the union of
    per-bucket top-1000s) PLUS one exact total-occurrence row for its
    whole token set, so the tail is counted without ever shipping the
    vocabulary. Driver merges buckets x (1000 + 1) rows."""
    from ..functions.shuffle import bucketed_combine

    top_n = _COVERAGE_KS[-1]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.split(" ").explode()
        c = ex.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(object),
                             "n": c.to_numpy(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        top = t.sort_values(["n", "token"], ascending=[False, True]).head(top_n)
        top = top.assign(is_tot=False)
        tot = pd.DataFrame({"token": [""], "n": [np.int64(t.n.sum())],
                            "is_tot": [True]})
        return pd.concat([top, tot], ignore_index=True)

    out = bucketed_combine(ds, "token", partial, combine).to_pandas()
    ks = np.array(_COVERAGE_KS, np.int64)
    if out.empty or not out[out.is_tot].n.sum():
        return pd.DataFrame({"top_k": ks,
                             "coverage_pct": np.full(len(ks), np.nan)})
    t_total = np.float64(int(out[out.is_tot].n.sum()))
    top = (out[~out.is_tot]
           .sort_values(["n", "token"], ascending=[False, True])
           .head(top_n))
    cum = np.cumsum(top.n.to_numpy(np.float64))
    # coverage at k: cumulative count at rank min(k, vocab size); cum is
    # non-empty here (the early return above handles the empty corpus)
    idx = np.minimum(ks, len(cum)) - 1
    cov = cum[idx]
    return pd.DataFrame({
        "top_k": ks,
        "coverage_pct": round_away(cov / t_total * 100.0, 6),
    })


TOKEN_COVERAGE_CURVE_SQL = """
WITH f AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS n
  FROM (SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
        FROM documents)
  GROUP BY w
), tot AS (SELECT SUM(n) AS t FROM f),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rnk FROM f
), c AS (
  SELECT rnk, SUM(n) OVER (ORDER BY rnk) AS cum FROM r
), ks AS (SELECT UNNEST([10, 50, 100, 500, 1000]) AS k)
SELECT CAST(ks.k AS BIGINT) AS top_k,
       ROUND((SELECT MAX(cum) FROM c WHERE rnk <= ks.k) / tot.t * 100, 6)
           AS coverage_pct
FROM ks CROSS JOIN tot
ORDER BY top_k
"""


def token_hapax_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source hapax legomena profile: total token occurrences, distinct
    vocabulary, and tokens occurring EXACTLY ONCE within the source —
    hapax rate is the standard productivity/noise signal (OCR garbage and
    boilerplate push it in opposite directions) used to calibrate
    vocabulary truncation per source.

    One token-bucketed exchange of (source, token, count) partials — all
    occurrences of a token-within-source land in one bucket, so the
    exactly-once test is exact in-bucket; the per-source rollup is bounded
    by n_sources, so the driver merge is constant-size."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "source"])

    def partial(t) -> pd.DataFrame:
        # fully-Arrow (source, token) counting: split_pattern ->
        # list_parent_indices maps tokens back to their row's source, and
        # Arrow's native group_by counts without boxing a single string —
        # measured 5x over the pandas explode/groupby partial on the
        # sf0.1 batch (132 ms -> 26 ms); output bit-identical
        import pyarrow as pa
        import pyarrow.compute as pc

        lists = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        flat = pa.table({
            "source": pc.take(t.column("source"),
                              pc.list_parent_indices(lists)),
            "token": pc.list_flatten(lists),
        })
        flat = flat.filter(pc.not_equal(flat.column("token"), ""))
        g = (flat.group_by(["source", "token"])
             .aggregate([("token", "count")]).to_pandas()
             .rename(columns={"token_count": "m"}))
        g["m"] = g.m.astype("int64")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["source", "token"], as_index=False).agg(m=("m", "sum"))
        m = c["m"].to_numpy(np.int64)
        out = pd.DataFrame({
            "source": c["source"].to_numpy(object),
            "n_tokens": m,
            "n_distinct": np.ones(len(c), np.int64),
            "n_hapax": (m == 1).astype(np.int64),
        })
        return out.groupby("source", as_index=False).sum()

    out = bucketed_combine(ds, "token", partial, combine,
                           num_buckets=16, coalesce_blocks=4,
                           partial_format="pyarrow").to_pandas()
    empty = {"source": "object", "n_tokens": "int64", "n_distinct": "int64",
             "n_hapax": "int64", "hapax_frac": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), empty)
    out = out.groupby("source", as_index=False).agg(
        n_tokens=("n_tokens", "sum"), n_distinct=("n_distinct", "sum"),
        n_hapax=("n_hapax", "sum"))
    out["hapax_frac"] = round_away(
        out.n_hapax.to_numpy(np.float64)
        / np.maximum(out.n_distinct.to_numpy(np.float64), 1.0), 6)
    for c in ("n_tokens", "n_distinct", "n_hapax"):
        out[c] = out[c].astype("int64")
    return typed_out(out, empty, sort_by="source")


TOKEN_HAPAX_STATS_SQL = """
WITH tok AS (
  SELECT source, UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), t AS (
  SELECT source, w, COUNT(*) AS m FROM tok WHERE w <> '' GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(m) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) * 1.0
             / GREATEST(COUNT(*), 1), 6) AS hapax_frac
FROM t
GROUP BY source
ORDER BY source
"""


def doc_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-document zlib compression ratio — the Gopher-style redundancy
    signal (highly repetitive boilerplate compresses far below natural
    text; random OCR noise barely compresses at all). No SQL analog
    (DuckDB has no zlib scalar), so the driver records a rows-only check;
    exact values are pinned against direct ``zlib.compress`` in
    tests/test_text_metrics.py.

    Pure streaming map — one batch in, fixed-width metrics out; the text
    never leaves the batch."""
    import zlib

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def ratio(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        texts = pc.coalesce(t.column("text"), "").to_pylist()
        raw = np.array([len(x.encode("utf-8")) for x in texts], np.int64)
        comp = np.array(
            [len(zlib.compress(x.encode("utf-8"), 6)) for x in texts],
            np.int64)
        return pd.DataFrame({
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False)
                       .astype(np.int64),
            "raw_bytes": raw,
            "compressed_bytes": comp,
            "compression_ratio": round_away(
                comp.astype(np.float64) / np.maximum(raw, 1), 6),
        })

    out = ds.map_batches(ratio, batch_format="pyarrow").to_pandas()
    return typed_out(out, {"doc_id": "int64", "raw_bytes": "int64",
                           "compressed_bytes": "int64",
                           "compression_ratio": "float64"},
                     sort_by="doc_id")


def doc_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Mean conditional log-probability of each document's token BIGRAMS
    under the corpus's own bigram LM — one step up the LM-proxy ladder
    from ``doc_unigram_logprob`` (CCNet-style quality filtering: word
    salad scores low here even when its unigrams are common):

        logprob(d) = mean over bigram instances (v,w) of
                     ln f2(v,w) - ln f1(v)

    where f2 is the global bigram count and f1(v) the global count of v
    as a bigram PREFIX (so P(w|v) sums to 1 and no smoothing is needed —
    the corpus is scored under itself, every observed bigram has
    f2 >= 1).

    Plan (the unigram plan one key wider; text never shuffles): per-doc
    (doc, a, b, cnt) partials materialize once and feed three consumers —
    a bigram-bucketed combine (exact f2), an a-bucketed combine (exact
    f1), and the scoring joins (bigram-keyed then prefix-keyed) which
    pre-aggregate per doc inside each bucket before the final doc-keyed
    rollup. All exchanges are hash-bucketed over _stable_order'ed
    buckets; 1e-6 rounding absorbs summation-order ulps."""
    from ..functions.frames import round_away as _ra
    from ..functions.shuffle import bucketed_combine, bucketed_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    empty_schema = {"doc_id": "int64", "n_bigrams": "int64",
                    "logprob": "float64"}

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        doc = ex.index.to_numpy()
        tok = ex.to_numpy(object)
        if len(tok) < 2:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64")})
        same = doc[1:] == doc[:-1]
        g = (pd.DataFrame({"doc_id": doc[:-1][same],
                           "a": tok[:-1][same], "b": tok[1:][same]})
             .groupby(["doc_id", "a", "b"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        g["cnt"] = g.cnt.astype("int64")
        return g

    tf = ds.map_batches(big_partial, batch_format="pandas").materialize()

    def f2_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).agg(f2=("cnt", "sum"))
        g["bigram"] = g.a.astype(object) + " " + g.b.astype(object)
        return g

    def f2_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["bigram", "a", "b"], as_index=False).agg(
            f2=("f2", "sum"))

    f2 = bucketed_combine(tf, "bigram", f2_partial, f2_combine).materialize()

    def f1_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("a", as_index=False).agg(f1=("cnt", "sum"))

    def f1_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("a", as_index=False).agg(f1=("f1", "sum"))

    f1 = bucketed_combine(tf, "a", f1_partial, f1_combine).materialize()

    def key_tf(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bigram"] = df.a.astype(object) + " " + df.b.astype(object)
        return df

    tf_keyed = tf.map_batches(key_tf, batch_format="pandas")

    def attach_f2(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right[["bigram", "f2"]], on="bigram")
        return m[["doc_id", "a", "cnt", "f2"]]

    with_f2 = bucketed_join(
        tf_keyed, f2, "bigram", "bigram", attach_f2,
        left_dtypes={"doc_id": "int64", "a": "object", "b": "object",
                     "cnt": "int64", "bigram": "object"},
        coalesce_blocks=8,
    )

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="a")
        if m.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        cnt = m.cnt.to_numpy(np.float64)
        term = cnt * (np.log(m.f2.to_numpy(np.float64))
                      - np.log(m.f1.to_numpy(np.float64)))
        d = pd.DataFrame({"doc_id": m.doc_id.to_numpy(np.int64),
                          "s": term, "n": cnt.astype(np.int64)})
        return d.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum"))

    scored = bucketed_join(
        with_f2, f1, "a", "a", score,
        left_dtypes={"doc_id": "int64", "a": "object", "cnt": "int64",
                     "f2": "int64"},
        coalesce_blocks=8,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", as_index=False).agg(s=("s", "sum"),
                                                    n=("n", "sum"))
        s["logprob"] = _ra(s.s.to_numpy() / s.n.to_numpy(np.float64), 6)
        s["n_bigrams"] = s.n.astype("int64")
        return s[["doc_id", "n_bigrams", "logprob"]]

    out = bucketed_combine(scored, "doc_id", lambda df: df, final,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    if out.empty:
        return typed_out(pd.DataFrame(), empty_schema)
    return typed_out(out, empty_schema, sort_by="doc_id")


DOC_BIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ts
  FROM documents
), big AS (
  SELECT doc_id, ts[i] AS a, ts[i + 1] AS b
  FROM tok, UNNEST(range(1, len(ts))) AS t(i)
  WHERE len(ts) >= 2
), f2 AS (
  SELECT a, b, COUNT(*) AS f2 FROM big GROUP BY 1, 2
), f1 AS (
  SELECT a, COUNT(*) AS f1 FROM big GROUP BY 1
)
SELECT big.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln(f2.f2) - ln(f1.f1)), 6) AS logprob
FROM big JOIN f2 USING (a, b) JOIN f1 USING (a)
GROUP BY big.doc_id
ORDER BY doc_id
"""


def _hist_quantile_cont(vals: np.ndarray, cnts: np.ndarray, q: float) -> float:
    """Exact continuous quantile (DuckDB ``quantile_cont`` semantics:
    pos = q*(n-1), linear interpolation between the straddling order
    statistics) computed from a VALUE HISTOGRAM instead of the sorted
    expansion — the trick that makes exact medians distributable: the
    exchange carries one row per distinct value, never per document."""
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    n = int(cnts.sum())
    pos = q * (n - 1)
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    cum = np.cumsum(cnts)
    v_lo = float(vals[np.searchsorted(cum, lo + 1)])
    v_hi = float(vals[np.searchsorted(cum, hi + 1)])
    return v_lo + (v_hi - v_lo) * (pos - lo)


def doc_length_median_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language EXACT median and MAD (median absolute deviation) of
    document length — the robust-statistics profile (mean/stddev are in
    ``doc_length_moments``; medians resist the heavy tail a web corpus
    always has). Exact medians normally need a per-group sort of every
    value; here the value domain is bounded (a length in chars), so a
    VALUE-HISTOGRAM exchange is exact: per-batch (lang, n_chars, cnt)
    partials, a lang-bucketed combine folds them and walks the cumulative
    histogram for the median, then builds the |x - median| DEVIATION
    histogram (distinct-value-sized again) and walks it for the MAD.
    Interpolation mirrors DuckDB quantile_cont bit-for-bit (values and
    half-grid deviations are small integers scaled by 0.5 — exact
    doubles)."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "n_chars"], as_index=False).agg(
            cnt=("n_chars", "size"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["lang", "n_chars"], as_index=False).agg(
            cnt=("cnt", "sum"))
        rows = []
        for lang, f in g.groupby("lang"):
            vals = f["n_chars"].to_numpy(np.float64)
            cnts = f["cnt"].to_numpy(np.int64)
            med = _hist_quantile_cont(vals, cnts, 0.5)
            dev = np.abs(vals - med)
            dd = pd.DataFrame({"d": dev, "cnt": cnts}).groupby(
                "d", as_index=False).agg(cnt=("cnt", "sum"))
            mad = _hist_quantile_cont(dd["d"].to_numpy(np.float64),
                                      dd["cnt"].to_numpy(np.int64), 0.5)
            rows.append((lang, int(cnts.sum()), med, mad))
        return pd.DataFrame(rows, columns=["lang", "n_docs",
                                           "median_n_chars", "mad_n_chars"])

    out = bucketed_combine(ds, "lang", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    return typed_out(out, {"lang": "object", "n_docs": "int64",
                           "median_n_chars": "float64",
                           "mad_n_chars": "float64"}, sort_by="lang")


DOC_LENGTH_MEDIAN_BY_LANG_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       median(n_chars) AS median_n_chars,
       mad(n_chars) AS mad_n_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def heldout_bigram_logprob(sf_dir: str, eval_pct: int = 10) -> pd.DataFrame:
    """Held-out LM evaluation — score EVAL-split documents under a bigram
    LM fitted on the TRAIN split only (the ``doc_sample_split`` hash
    split), Laplace-smoothed so unseen eval bigrams stay finite:

        term(v,w) = ln( (f2_train(v,w) + 1) / (f1_train(v) + V_train) )

    with V_train the train prefix vocabulary. This is the train/apply
    SHAPE every data-pipeline model pass has (fit on one partition of the
    stream, apply to another) — unlike ``doc_bigram_logprob`` which
    scores the corpus under itself, the scoring joins here are LEFT:
    eval bigrams the model never saw must survive with count 0.

    Plan: one bigram-counting pass tags each doc's split from doc_id
    (zero extra I/O); train-side f2/f1/V come from split-filtered
    bucketed combines (V folds one distinct-count per bucket); eval rows
    flow through bigram-keyed then prefix-keyed LEFT joins with
    bucket-local per-doc pre-aggregation. 1e-6 rounding absorbs
    summation-order ulps; perplexity is exp of the ROUNDED mean so both
    sides exponentiate identical doubles."""
    from ..functions.frames import round_away as _ra
    from ..functions.shuffle import bucketed_combine, bucketed_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    empty_schema = {"doc_id": "int64", "n_bigrams": "int64",
                    "logprob": "float64", "ppl": "float64"}

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        doc = ex.index.to_numpy()
        tok = ex.to_numpy(object)
        base = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "a": pd.Series(dtype=object),
                             "b": pd.Series(dtype=object),
                             "cnt": pd.Series(dtype="int64"),
                             "is_eval": pd.Series(dtype="bool")})
        if len(tok) < 2:
            return base
        same = doc[1:] == doc[:-1]
        g = (pd.DataFrame({"doc_id": doc[:-1][same],
                           "a": tok[:-1][same], "b": tok[1:][same]})
             .groupby(["doc_id", "a", "b"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        g["cnt"] = g.cnt.astype("int64")
        ids = g["doc_id"].to_numpy(np.uint64)
        bucket = ((ids * np.uint64(2654435761)) % np.uint64(2**32)) \
            % np.uint64(100)
        g["is_eval"] = bucket < eval_pct
        return g

    tf = ds.map_batches(big_partial, batch_format="pandas").materialize()

    def f2_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[~df["is_eval"]]
        g = t.groupby(["a", "b"], as_index=False).agg(f2=("cnt", "sum"))
        g["bigram"] = g.a.astype(object) + " " + g.b.astype(object)
        return g

    def f2_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["bigram"], as_index=False).agg(f2=("f2", "sum"))

    f2 = bucketed_combine(tf, "bigram", f2_partial, f2_combine).materialize()

    def f1_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[~df["is_eval"]]
        return t.groupby("a", as_index=False).agg(f1=("cnt", "sum"))

    def f1_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("a", as_index=False).agg(f1=("f1", "sum"))

    f1 = bucketed_combine(tf, "a", f1_partial, f1_combine).materialize()

    def v_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[~df["is_eval"]]
        return pd.DataFrame({"a": pd.unique(t["a"].to_numpy(object))})

    def v_combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": ["_"], "nv": [g["a"].nunique()]})

    v_rows = bucketed_combine(tf, "a", v_partial, v_combine,
                              coalesce_blocks=8).to_pandas()
    v_train = float(v_rows["nv"].sum()) if len(v_rows) else 0.0

    def key_eval(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["is_eval"]].copy()
        df["bigram"] = df.a.astype(object) + " " + df.b.astype(object)
        return df[["doc_id", "a", "bigram", "cnt"]]

    ev = tf.map_batches(key_eval, batch_format="pandas")

    def attach_f2(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right[["bigram", "f2"]], on="bigram", how="left")
        m["f2"] = m["f2"].fillna(0).astype("int64")
        return m[["doc_id", "a", "cnt", "f2"]]

    with_f2 = bucketed_join(
        ev, f2, "bigram", "bigram", attach_f2,
        left_dtypes={"doc_id": "int64", "a": "object", "bigram": "object",
                     "cnt": "int64"},
        right_dtypes={"bigram": "object", "f2": "int64"},
        coalesce_blocks=8,
    )

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="a", how="left")
        if m.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        cnt = m.cnt.to_numpy(np.float64)
        f2v = m.f2.to_numpy(np.float64)
        f1v = m.f1.fillna(0).to_numpy(np.float64)
        term = cnt * np.log((f2v + 1.0) / (f1v + v_train))
        d = pd.DataFrame({"doc_id": m.doc_id.to_numpy(np.int64),
                          "s": term, "n": cnt.astype(np.int64)})
        return d.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum"))

    scored = bucketed_join(
        with_f2, f1, "a", "a", score,
        left_dtypes={"doc_id": "int64", "a": "object", "cnt": "int64",
                     "f2": "int64"},
        right_dtypes={"a": "object", "f1": "int64"},
        coalesce_blocks=8,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", as_index=False).agg(s=("s", "sum"),
                                                    n=("n", "sum"))
        lp = _ra(s.s.to_numpy() / s.n.to_numpy(np.float64), 6)
        s["logprob"] = lp
        s["ppl"] = _ra(np.exp(-lp), 4)
        s["n_bigrams"] = s.n.astype("int64")
        return s[["doc_id", "n_bigrams", "logprob", "ppl"]]

    out = bucketed_combine(scored, "doc_id", lambda df: df, final,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    if out.empty:
        return typed_out(pd.DataFrame(), empty_schema)
    return typed_out(out, empty_schema, sort_by="doc_id")


HELDOUT_BIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ts,
         ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 100 < 10)
           AS is_eval
  FROM documents
), big AS (
  SELECT doc_id, is_eval, ts[i] AS a, ts[i + 1] AS b
  FROM tok, UNNEST(range(1, len(ts))) AS t(i)
  WHERE len(ts) >= 2
), f2 AS (
  SELECT a, b, COUNT(*) AS f2 FROM big WHERE NOT is_eval GROUP BY 1, 2
), f1 AS (
  SELECT a, COUNT(*) AS f1 FROM big WHERE NOT is_eval GROUP BY 1
), v AS (
  SELECT CAST(COUNT(DISTINCT a) AS DOUBLE) AS nv FROM big WHERE NOT is_eval
), per_doc AS (
  SELECT big.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         ROUND(AVG(ln((CAST(COALESCE(f2.f2, 0) AS DOUBLE) + 1.0)
                      / (CAST(COALESCE(f1.f1, 0) AS DOUBLE) + v.nv))), 6)
           AS logprob
  FROM big
  LEFT JOIN f2 ON big.a = f2.a AND big.b = f2.b
  LEFT JOIN f1 ON big.a = f1.a
  CROSS JOIN v
  WHERE big.is_eval
  GROUP BY big.doc_id
)
SELECT doc_id, n_bigrams, logprob, ROUND(exp(-logprob), 4) AS ppl
FROM per_doc
ORDER BY doc_id
"""


class QualityClassifier:
    """Linear quality filter held warm per actor — the fasttext/logreg
    model-inference shape (CCNet's quality LM, Llama's quality
    classifiers): weights load ONCE in ``__init__`` (here fixed
    constants standing in for trained parameters — swap in a real
    coefficient file at deploy time), ``__call__`` scores a batch
    vectorized. Features are the ``doc_quality`` signals; the sigmoid is
    written as the exact double expression the oracle SQL uses."""

    STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that",
                 "it", "for")
    W0, W_LNTOK, W_STOP, W_ALPHA, W_MTL = -3.0, 0.45, 6.0, 1.5, 0.05

    def __init__(self):
        self.stop = frozenset(self.STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        toks = txt.str.split(" ")
        ex = toks.explode()
        n_tok = toks.str.len().to_numpy(np.float64)
        n_stop = (ex.isin(self.stop).groupby(ex.index).sum()
                  .reindex(df.index, fill_value=0).to_numpy(np.float64))
        n_chars = txt.str.len().to_numpy(np.float64)
        n_alpha = txt.str.count("[A-Za-z]").to_numpy(np.float64)
        z = (self.W0
             + self.W_LNTOK * np.log(n_tok + 1.0)
             + self.W_STOP * (n_stop / n_tok)
             + self.W_ALPHA * (n_alpha / (n_chars + 1.0))
             + self.W_MTL * (n_chars / n_tok))
        score = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "quality_score": round_away(score, 6),
            "label": np.where(score >= 0.5, "keep", "drop"),
        })


def doc_quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Model-scoring pass over the documents table through an ACTOR POOL
    (``map_batches`` with a callable class + ``concurrency``): per-actor
    one-time setup in ``__init__``, vectorized batched inference in
    ``__call__`` — the plumbing every learned quality/toxicity filter
    runs on at 100 TB. Zero shuffles; one streaming pass."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(QualityClassifier, batch_format="pandas",
                         concurrency=2).to_pandas()
    return typed_out(out, {"doc_id": "int64", "quality_score": "float64",
                           "label": "object"}, sort_by="doc_id")


DOC_QUALITY_CLASSIFIER_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), z AS (
  SELECT doc_id,
         -3.0 + 0.45 * ln(n_tok + 1.0) + 6.0 * (n_stop / n_tok)
         + 1.5 * (n_alpha / (n_chars + 1.0)) + 0.05 * (n_chars / n_tok)
           AS z
  FROM f
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
       CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5 THEN 'keep' ELSE 'drop' END
         AS label
FROM z
ORDER BY doc_id
"""


def doc_word_length_histogram(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide token-length distribution — the first plot of any
    tokenizer-budget study (length spikes reveal concatenation bugs and
    OCR garbage; the tail sets the BPE pre-token length cap).

    No exchange at all: token length is a BOUNDED key (a handful of
    distinct values), so each batch reduces to its own (length, count)
    rows — vectorized str.len on the exploded token column — and the
    driver folds the bounded partials. Integer sums are order-exact."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        txt = pc.coalesce(t.column("text"), "").to_pandas()
        toks = txt.str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        lens = toks.str.len().astype("int64")
        out = pd.DataFrame({"word_len": lens}).groupby(
            "word_len", as_index=False).size()
        out["n"] = out.pop("size").astype("int64")
        return out

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    schema = {"word_len": "int64", "n": "int64"}
    if out.empty:
        return typed_out(out, schema)
    out = out.groupby("word_len", as_index=False).agg(n=("n", "sum"))
    out["word_len"] = out.word_len.astype("int64")
    out["n"] = out.n.astype("int64")
    return typed_out(out, schema, sort_by="word_len")


DOC_WORD_LENGTH_HISTOGRAM_SQL = """
WITH tok AS (
  SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS w FROM documents
)
SELECT CAST(LENGTH(w) AS BIGINT) AS word_len, CAST(COUNT(*) AS BIGINT) AS n
FROM tok WHERE w <> ''
GROUP BY 1
ORDER BY word_len
"""


def doc_ttr_by_lang(sf_dir: str) -> pd.DataFrame:
    """Lexical diversity per language: documents, token occurrences,
    per-doc distinct types summed, and the aggregate type/token ratio —
    the diversity gate that separates template spam (TTR→0) from natural
    prose when tuning per-language quality thresholds.

    The per-doc reduction (distinct-within-doc) is ROW-LOCAL — a doc's
    tokens never cross a batch boundary, so no exchange happens at all:
    each batch emits bounded (lang, n_docs, sum_types, sum_tokens)
    partials and the driver folds integers (order-exact; the only float,
    the final ratio, is computed once from exact integer sums)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        txt = pc.coalesce(t.column("text"), "").to_pandas()
        lang = t.column("lang").to_pandas().to_numpy(object)
        toks = txt.str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        per = pd.DataFrame({
            "lang": pd.Series(lang).reindex(toks.index).to_numpy(object),
            "doc": toks.index.to_numpy(),
            "token": toks.to_numpy(object),
        })
        g = per.groupby(["lang", "doc"]).agg(
            n_types=("token", "nunique"), n_toks=("token", "size"))
        out = g.reset_index().groupby("lang", as_index=False).agg(
            n_docs=("doc", "size"), sum_types=("n_types", "sum"),
            sum_tokens=("n_toks", "sum"))
        return out

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    schema = {"lang": "object", "n_docs": "int64", "sum_types": "int64",
              "sum_tokens": "int64", "ttr": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), sum_types=("sum_types", "sum"),
        sum_tokens=("sum_tokens", "sum"))
    for c in ("n_docs", "sum_types", "sum_tokens"):
        out[c] = out[c].astype("int64")
    out["ttr"] = round_away(
        out.sum_types.to_numpy(np.float64)
        / np.maximum(out.sum_tokens.to_numpy(np.float64), 1.0), 6)
    return typed_out(out, schema, sort_by="lang")


DOC_TTR_BY_LANG_SQL = """
WITH tok AS (
  SELECT doc_id, lang,
         UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), per AS (
  SELECT doc_id, lang, COUNT(DISTINCT w) AS n_types, COUNT(*) AS n_toks
  FROM tok WHERE w <> '' GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_types) AS BIGINT) AS sum_types,
       CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
       ROUND(SUM(n_types) * 1.0 / GREATEST(SUM(n_toks), 1), 6) AS ttr
FROM per
GROUP BY lang
ORDER BY lang
"""


def quality_classifier_pr_curve(sf_dir: str) -> pd.DataFrame:
    """Precision/recall curve of the quality classifier against a
    deterministic reference label — the threshold-calibration report every
    learned filter ships with (pick the operating point, then gate the
    corpus at it).

    The reference label is closed-form (doc_id % 10 < 7 → positive) so
    the oracle reproduces it; the predicted score is the SAME rounded
    sigmoid the classifier emits (scored through the same actor-pool
    class — weights once per actor). Each batch reduces to 9 x (tp, fp,
    fn) integer partials (one per threshold in 0.1..0.9), so the driver
    fold is bounded and order-exact; the two ratios per threshold are
    computed once from exact integer counts."""
    thresholds = np.round(np.arange(1, 10) * 0.1, 1)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    class _PrPartial(QualityClassifier):
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            scored = super().__call__(df)
            score = scored.quality_score.to_numpy(np.float64)
            truth = (scored.doc_id.to_numpy(np.int64) % 10 < 7)
            rows = []
            for t in thresholds:
                pred = score >= t
                rows.append((float(t),
                             int(np.sum(pred & truth)),
                             int(np.sum(pred & ~truth)),
                             int(np.sum(~pred & truth))))
            return pd.DataFrame(rows, columns=["threshold", "tp", "fp",
                                               "fn"])

    out = ds.map_batches(_PrPartial, batch_format="pandas",
                         concurrency=2).to_pandas()
    schema = {"threshold": "float64", "tp": "int64", "fp": "int64",
              "fn": "int64", "precision": "float64", "recall": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby("threshold", as_index=False).agg(
        tp=("tp", "sum"), fp=("fp", "sum"), fn=("fn", "sum"))
    tp = out.tp.to_numpy(np.float64)
    out["precision"] = round_away(
        tp / np.maximum(tp + out.fp.to_numpy(np.float64), 1.0), 6)
    out["recall"] = round_away(
        tp / np.maximum(tp + out.fn.to_numpy(np.float64), 1.0), 6)
    for c in ("tp", "fp", "fn"):
        out[c] = out[c].astype("int64")
    return typed_out(out, schema, sort_by="threshold")


QUALITY_CLASSIFIER_PR_CURVE_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), s AS (
  SELECT doc_id,
         ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.45 * ln(n_tok + 1.0)
               + 6.0 * (n_stop / n_tok)
               + 1.5 * (n_alpha / (n_chars + 1.0))
               + 0.05 * (n_chars / n_tok)))), 6) AS score,
         (doc_id % 10 < 7) AS truth
  FROM f
), th AS (
  SELECT ROUND(g * 0.1, 1) AS threshold FROM generate_series(1, 9) AS t(g)
), c AS (
  SELECT threshold,
         SUM(CASE WHEN score >= threshold AND truth THEN 1 ELSE 0 END)
           AS tp,
         SUM(CASE WHEN score >= threshold AND NOT truth THEN 1 ELSE 0 END)
           AS fp,
         SUM(CASE WHEN score < threshold AND truth THEN 1 ELSE 0 END)
           AS fn
  FROM th CROSS JOIN s
  GROUP BY threshold
)
SELECT threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       ROUND(tp * 1.0 / GREATEST(tp + fp, 1), 6) AS precision,
       ROUND(tp * 1.0 / GREATEST(tp + fn, 1), 6) AS recall
FROM c
ORDER BY threshold
"""


def doc_langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Confusion matrix of the stopword language-ID model against the
    corpus's labeled ``lang`` column — the eval report that tells you
    WHERE a classifier fails, not just how often (which true language
    leaks into which prediction, and how much lands in 'und').

    Per-batch bounded (lang x pred_lang) count partials ride out of the
    same actor-pool inference pass (model in ``__init__``, vectorized
    scoring per batch); the driver folds a constant-size matrix. The
    oracle re-derives the prediction with doc_langid's exact SQL model."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    class _ConfusionPartial(LangIdModel):
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pred = super().__call__(df[["doc_id", "text"]])
            out = pd.DataFrame({
                "lang": df.lang.to_numpy(object),
                "pred_lang": pred.pred_lang.to_numpy(object),
            }).groupby(["lang", "pred_lang"], as_index=False).size()
            out["n"] = out.pop("size").astype("int64")
            return out

    out = ds.map_batches(_ConfusionPartial, batch_format="pandas",
                         concurrency=2).to_pandas()
    schema = {"lang": "object", "pred_lang": "object", "n": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.groupby(["lang", "pred_lang"], as_index=False).agg(
        n=("n", "sum"))
    out["n"] = out.n.astype("int64")
    return typed_out(out, schema, sort_by=["lang", "pred_lang"])


def _langid_confusion_sql() -> str:
    langs = sorted(STOPWORDS)
    counts = ",\n       ".join(
        "len(list_filter(toks, w -> w IN ({}))) AS {}".format(
            ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lg])), lg
        )
        for lg in langs
    )
    greatest = "GREATEST({})".format(", ".join(langs))
    case = "CASE WHEN {g} = 0 THEN 'und' ".format(g=greatest)
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lg} >= {other}" for other in langs[i + 1:])
        case += f"WHEN {conds} THEN '{lg}' "
    case += f"ELSE '{langs[-1]}' END"
    return f"""
WITH t AS (
  SELECT lang, string_split(lower(COALESCE(text, '')), ' ') AS toks
  FROM documents
), s AS (
  SELECT lang,
       {counts}
  FROM t
)
SELECT lang, {case} AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM s
GROUP BY 1, 2
ORDER BY lang, pred_lang
"""


DOC_LANGID_CONFUSION_SQL = _langid_confusion_sql()


def token_topk_by_lang(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k vocabulary PER LANGUAGE — the grouped variant of
    ``token_topk`` (the per-language vocab seed every multilingual
    tokenizer build starts from).

    Grouped top-k with exact local pruning: counts exchange on the token
    (every (lang, token) pair lands in one bucket, so in-bucket counts
    are exact), each bucket emits its local top-k PER LANG (a group's
    global top-k is inside the union of per-bucket top-ks — same
    argument as token_topk), and the driver merges a bounded
    buckets x langs x k stream. Ties break (n desc, token asc) exactly
    like the oracle's ROW_NUMBER order."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang"])

    def partial(t) -> pd.DataFrame:
        # same fully-Arrow counting as token_hapax_stats (5x measured)
        import pyarrow as pa
        import pyarrow.compute as pc

        lists = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        flat = pa.table({
            "lang": pc.take(t.column("lang"),
                            pc.list_parent_indices(lists)),
            "token": pc.list_flatten(lists),
        })
        flat = flat.filter(pc.not_equal(flat.column("token"), ""))
        g = (flat.group_by(["lang", "token"])
             .aggregate([("token", "count")]).to_pandas()
             .rename(columns={"token_count": "n"}))
        g["n"] = g.n.astype("int64")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["lang", "token"], as_index=False).agg(n=("n", "sum"))
        t = t.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True], kind="stable")
        return t.groupby("lang", as_index=False).head(k)

    out = bucketed_combine(ds, "token", partial, combine,
                           num_buckets=16, coalesce_blocks=4,
                           partial_format="pyarrow").to_pandas()
    schema = {"lang": "object", "token": "object", "n": "int64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True], kind="stable")
    out = out.groupby("lang", as_index=False).head(k)
    out["n"] = out.n.astype("int64")
    return typed_out(out.reset_index(drop=True), schema)


TOKEN_TOPK_BY_LANG_SQL = """
WITH tok AS (
  SELECT lang, UNNEST(string_split(COALESCE(text, ''), ' ')) AS token
  FROM documents
), c AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok WHERE token <> '' GROUP BY lang, token
), r AS (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n DESC, token) AS rn
  FROM c
)
SELECT lang, token, n FROM r WHERE rn <= 10
ORDER BY lang, n DESC, token
"""


# ---------------------------------------------------------------------------
# CCNet-style LM filter: per-source share of docs at-or-below the global
# median unigram score
# ---------------------------------------------------------------------------


def doc_perplexity_filter_rate(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity gate audit: score every document under the
    corpus's own unigram LM (the ``doc_unigram_logprob`` score, unrounded),
    split at the GLOBAL median score, and report what fraction of each
    source falls in the kept ("head") half — the per-source survival-rate
    read a curation operator takes before committing to an LM filter.

    Plan: the unigram scoring sub-plan (token-frequency combine +
    token-keyed scoring join + doc-keyed sum — see doc_unigram_logprob)
    lands per-doc (source, score) rows; the exact median comes from ONE
    ``Dataset.sort`` over those rows (per-block counts -> the one or two
    blocks holding the middle ranks materialize single rows); the
    broadcast median then gates a per-source counting combine. No rank
    table, no per-row driver state.

    Boundary robustness: scores carry summation-order ulp noise between
    the engine and the oracle, but the gate compares each score against a
    median DERIVED FROM THE SAME SIDE'S scores — the only docs within
    noise of the median are the middle docs themselves, and score <=
    median resolves identically for them on both sides (equality for the
    odd-n middle; a <= (a+b)/2 iff a <= b for the even-n pair)."""
    from ..functions.frames import typed_out
    from ..functions.shuffle import bucketed_combine, bucketed_join

    import ray as _ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    schema = {"source": "object", "n_docs": "int64", "n_kept": "int64",
              "kept_rate": "float64"}

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        g = (pd.DataFrame({"doc_id": ex.index.to_numpy(),
                           "token": ex.to_numpy(object)})
             .groupby(["doc_id", "token"], as_index=False).size()
             .rename(columns={"size": "tf"}))
        g["tf"] = g.tf.astype("int64")
        return g

    tf = ds.map_batches(tf_partial, batch_format="pandas").materialize()

    freq = bucketed_combine(
        tf, "token",
        lambda df: df.groupby("token", as_index=False).agg(f=("tf", "sum")),
        lambda g: g.groupby("token", as_index=False).agg(f=("f", "sum")),
    ).materialize()

    n_parts = freq.map_batches(
        lambda df: pd.DataFrame({"n": [np.int64(df.f.sum())]}),
        batch_format="pandas",
    ).to_pandas()
    n_total = int(n_parts.n.sum()) if len(n_parts) else 0
    if n_total == 0:
        return typed_out(pd.DataFrame(), schema)

    def attach(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="token")
        if m.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n_tok": pd.Series(dtype="int64")})
        m["s"] = m.tf.to_numpy(np.float64) * np.log(m.f.to_numpy(np.float64))
        return m.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), n_tok=("tf", "sum"))

    partials = bucketed_join(
        tf, freq, "token", "token", attach,
        left_dtypes={"doc_id": "int64", "token": "object", "tf": "int64"},
        right_dtypes={"token": "object", "f": "int64"},
        coalesce_blocks=16,
    )

    def docscore(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), n_tok=("n_tok", "sum"))
        return pd.DataFrame({
            "doc_id": out.doc_id.to_numpy(np.int64),
            "score": (out.s.to_numpy() / out.n_tok.to_numpy()
                      - np.log(n_total)),
        })

    scores = bucketed_combine(
        partials, "doc_id", lambda df: df, docscore, coalesce_blocks=8,
    ).materialize()

    # exact global median: one distributed sort, <=2 single-row lookups
    s_sorted = scores.sort(["score", "doc_id"])
    refs = s_sorted.to_arrow_refs()

    @_ray.remote(num_cpus=0.25)
    def _nrows(tbl) -> int:
        return tbl.num_rows

    counts = _ray.get([_nrows.remote(r) for r in refs])
    n = int(sum(counts))
    if n == 0:
        return typed_out(pd.DataFrame(), schema)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    mids = sorted({(n - 1) // 2, n // 2})

    @_ray.remote(num_cpus=0.25)
    def _score_at(tbl, local_idx: list[int]) -> list[float]:
        v = tbl.column("score").to_numpy(zero_copy_only=False)
        return [float(v[i]) for i in local_idx]

    futs = []
    for r, off, cnt in zip(refs, offsets, counts):
        local = [m - off for m in mids if off <= m < off + cnt]
        if local:
            futs.append(_score_at.remote(r, local))
    mid_vals = [v for part in _ray.get(futs) for v in part]
    median = float(np.mean(mid_vals))

    # gate + per-source count: broadcast the scalar, one bounded combine
    src = ds.map_batches(
        lambda df: df[["doc_id", "source"]], batch_format="pandas")

    def gate(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="doc_id")
        if m.empty:
            return pd.DataFrame({"source": pd.Series(dtype=object),
                                 "n_docs": pd.Series(dtype="int64"),
                                 "n_kept": pd.Series(dtype="int64")})
        kept = (m.score.to_numpy(np.float64) <= median).astype(np.int64)
        return m.assign(kept=kept).groupby("source", as_index=False).agg(
            n_docs=("kept", "size"), n_kept=("kept", "sum"))

    parts = bucketed_join(
        scores, src, "doc_id", "doc_id", gate,
        left_dtypes={"doc_id": "int64", "score": "float64"},
        right_dtypes={"doc_id": "int64", "source": "object"},
        coalesce_blocks=8,
    ).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_kept=("n_kept", "sum"))
    out["kept_rate"] = round_away(
        out.n_kept.to_numpy(np.float64) / out.n_docs.to_numpy(np.float64), 6)
    return typed_out(out, schema, sort_by="source")


DOC_PERPLEXITY_FILTER_RATE_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), freq AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS f FROM tok GROUP BY w
), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
sc AS (
  SELECT t.doc_id,
         SUM(LN(f.f)) / COUNT(*) - (SELECT LN(NULLIF(n, 0)) FROM tot) AS score
  FROM tok t JOIN freq f ON t.w = f.w
  GROUP BY t.doc_id
), m AS (SELECT MEDIAN(score) AS med FROM sc)
SELECT d.source,
       COUNT(*) AS n_docs,
       SUM(CASE WHEN sc.score <= m.med THEN 1 ELSE 0 END) AS n_kept,
       ROUND(SUM(CASE WHEN sc.score <= m.med THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS kept_rate
FROM sc JOIN documents d USING (doc_id), m
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS): window-min k-gram sampling per document
# ---------------------------------------------------------------------------


def doc_winnow_fingerprints(sf_dir: str, k: int = 8, w: int = 4) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-char gram, slide a
    w-gram window, and select each window's MINIMUM hash; the selected
    "minimizer" set is the classic position-robust fingerprint for
    plagiarism/near-dup detection, guaranteed to share fingerprints with
    any copy that overlaps by >= w+k-1 chars.

    Per doc the engine reports n_grams, n_selected (minimizer positions)
    and n_distinct (distinct selected hashes) — the density ~2/(w+1)
    check. Everything runs inside one ``map_batches`` pass (documents
    shard freely; no shuffle at all): per doc, the gram hashes become a
    uint64 vector and the window minima come from a strided sliding-
    window view; a position is selected iff its hash equals the min of
    ANY window covering it (ALL tying positions — repetitive text makes
    equal grams share a window — exactly like the oracle's join).

    Hash parity: the hash is the first 16 hex chars of md5(gram) parsed
    as uint64 — lexicographic order of the hex prefix IS numeric order,
    and DuckDB's ``substring(md5(x), 1, 16)`` computes the identical
    string, so the selected sets match byte-for-byte. (md5 is the oracle-
    parity choice; at open scale the same plan runs on any vectorizable
    64-bit hash.)"""
    from ..functions.frames import typed_out
    from ..functions.hashing import md5_hex_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    schema = {"doc_id": "int64", "n_grams": "int64",
              "n_selected": "int64", "n_distinct": "int64"}

    def winnow(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df.doc_id.to_numpy(np.int64),
                                df.text.fillna("").to_numpy(object)):
            m = len(text) - k + 1
            if m < w:  # no full window -> no fingerprints (oracle drops doc)
                continue
            grams = [text[i:i + k] for i in range(m)]
            h = np.array([int(x[:16], 16) for x in md5_hex_batch(grams)],
                         dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(h, w)
            wmin = win.min(axis=1)  # window j covers positions [j, j+w-1]
            sel = np.zeros(m, dtype=bool)
            for o in range(w):
                # position p sits in window p-o when 0 <= p-o <= m-w
                lo, hi = o, len(wmin) + o
                sel[lo:hi] |= h[lo:hi] == wmin
            rows.append((doc_id, m, int(sel.sum()),
                         int(np.unique(h[sel]).size)))
        return pd.DataFrame(rows, columns=["doc_id", "n_grams",
                                           "n_selected", "n_distinct"])

    out = ds.map_batches(winnow, batch_format="pandas").to_pandas()
    return typed_out(out, schema, sort_by="doc_id")


DOC_WINNOW_FINGERPRINTS_SQL = """
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  WHERE len(COALESCE(text, '')) >= 8 + 4 - 1
), g AS (
  SELECT doc_id, text, UNNEST(range(1, len(text) - 8 + 2)) AS i FROM d
), h AS (
  SELECT doc_id, i,
         substring(md5(substring(text, CAST(i AS INT), 8)), 1, 16) AS h,
         COUNT(*) OVER (PARTITION BY doc_id) AS m
  FROM g
), wmin AS (
  SELECT doc_id, i AS j,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm
  FROM h
  QUALIFY i <= m - 4 + 1
), sel AS (
  SELECT DISTINCT x.doc_id, x.i, x.h
  FROM h x JOIN wmin ON x.doc_id = wmin.doc_id
       AND x.i BETWEEN wmin.j AND wmin.j + 3
       AND x.h = wmin.wm
)
SELECT h.doc_id,
       ANY_VALUE(h.m) AS n_grams,
       COUNT(DISTINCT sel.i) AS n_selected,
       COUNT(DISTINCT sel.h) AS n_distinct
FROM h JOIN sel ON h.doc_id = sel.doc_id AND h.i = sel.i
GROUP BY h.doc_id
ORDER BY h.doc_id
"""


# ---------------------------------------------------------------------------
# character-shingle vocabulary profile per language
# ---------------------------------------------------------------------------


def _char_shingle_starts(offsets: np.ndarray, k: int):
    """Window starts + owning doc index for k-char windows that stay inside
    one document, computed from an Arrow string offsets vector (no per-row
    Python). Returns (doc_idx, starts) int64 arrays."""
    lens = np.diff(offsets.astype(np.int64))
    w = np.clip(lens - k + 1, 0, None)
    tot = int(w.sum())
    if tot == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    doc_idx = np.repeat(np.arange(len(w), dtype=np.int64), w)
    base = np.repeat(offsets[:-1].astype(np.int64), w)
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.cumsum(w) - w, w)
    return doc_idx, base + within


def doc_shingle_profile(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Character-shingle vocabulary profile — per language: how many
    ``k``-char windows the corpus contains and how many are DISTINCT. The
    distinct/total ratio is the raw-material number behind every
    shingle-based dedup design (MinHash bands, winnowing density): a
    near-1 ratio means shingles are discriminative, a collapsing ratio
    means the alphabet is too small for k and near-dup buckets will
    saturate.

    Shingles are UTF-8 BYTE windows (the standard convention for
    shingle-based dedup — hashes run over bytes, not codepoints; on
    ASCII text bytes and characters coincide). Shingling never touches
    Python strings: window starts come straight off the Arrow offsets
    buffer (`_char_shingle_starts`), the 5-byte windows pack INJECTIVELY
    into int64 codes (40 bits), and per-batch UNIQUE (lang, code) pairs
    — not text — flow
    through one shingle-keyed exchange where per-bucket dedup makes
    distinct counts additive. Per-lang totals ride the same exchange as
    sentinel rows (code -1). Counting distinct CODES equals counting
    distinct substrings because the packing is injective, so the oracle's
    COUNT(DISTINCT substr) agrees exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.shuffle import bucketed_combine

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["lang", "text"])

    def partial(tbl) -> pd.DataFrame:
        text = tbl.column("text").combine_chunks()
        if pa.types.is_large_string(text.type):
            text = text.cast(pa.string())
        n_rows = len(text)
        if n_rows == 0:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "sh": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        off = np.frombuffer(text.buffers()[1], dtype=np.int32)[
            text.offset: text.offset + n_rows + 1]
        data = np.frombuffer(text.buffers()[2], dtype=np.uint8)
        doc_idx, starts = _char_shingle_starts(off, k)

        lang_dict = pc.dictionary_encode(
            tbl.column("lang").combine_chunks())
        lang_codes = lang_dict.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        lang_values = lang_dict.dictionary.to_pylist()

        codes = np.zeros(len(starts), dtype=np.int64)
        for j in range(k):
            codes = codes * 256 + data[starts + j].astype(np.int64)
        li = lang_codes[doc_idx]
        # unique (lang, code) pairs in one pass: codes < 2^40, lang ids tiny
        key = np.unique((li << 40) | codes)
        pairs = pd.DataFrame({
            "lang": np.asarray(lang_values, dtype=object)[key >> 40],
            "sh": (key & ((1 << 40) - 1)).astype(np.int64),
        })
        pairs["n"] = np.int64(0)
        tot = np.bincount(li, minlength=len(lang_values)).astype(np.int64) \
            if len(li) else np.zeros(len(lang_values), np.int64)
        nz = np.nonzero(tot)[0]
        sent = pd.DataFrame({
            "lang": np.asarray(lang_values, dtype=object)[nz],
            "sh": np.int64(-1),
            "n": tot[nz],
        })
        return pd.concat([pairs, sent], ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        sent = g[g.sh < 0].groupby("lang", as_index=False).agg(
            n_shingles=("n", "sum"))
        dist = (g[g.sh >= 0].drop_duplicates(["lang", "sh"])
                .groupby("lang", as_index=False).size()
                .rename(columns={"size": "n_distinct"}))
        return sent.merge(dist, on="lang", how="outer").fillna(0)

    parts = bucketed_combine(docs, "sh", partial, combine,
                             partial_format="pyarrow",
                             coalesce_blocks=8).to_pandas()
    schema = {"lang": "object", "n_shingles": "int64",
              "n_distinct": "int64", "distinct_ratio": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    out = parts.groupby("lang", as_index=False).agg(
        n_shingles=("n_shingles", "sum"), n_distinct=("n_distinct", "sum"))
    out = out[out.n_shingles > 0]
    out["distinct_ratio"] = round_away(
        out.n_distinct.to_numpy(np.float64)
        / out.n_shingles.to_numpy(np.float64), 6)
    return typed_out(out, schema, sort_by="lang")


DOC_SHINGLE_PROFILE_SQL = """
-- BYTE shingles (UTF-8), matching the engine's offsets-buffer windows:
-- DuckDB has no BLOB substring, so windows come off the hex encoding
-- (2 hex chars per byte -> a 5-byte window is 10 hex chars at 2*i-1);
-- hex is injective, so COUNT(DISTINCT) is unchanged by the encoding
WITH src AS (
  SELECT lang, hex(ENCODE(text)) AS h,
         OCTET_LENGTH(ENCODE(text)) AS blen
  FROM documents WHERE OCTET_LENGTH(ENCODE(text)) >= 5
), s AS (
  SELECT lang, SUBSTR(h, 2 * CAST(i AS BIGINT) - 1, 10) AS sh
  FROM (SELECT lang, h, UNNEST(range(1, blen - 3)) AS i
        FROM src)
)
SELECT lang, COUNT(*) AS n_shingles, COUNT(DISTINCT sh) AS n_distinct,
       ROUND(CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*), 6)
           AS distinct_ratio
FROM s GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# top-token dominance histogram (Gopher-style repetition quality rule)
# ---------------------------------------------------------------------------


def doc_top_token_share_histogram(sf_dir: str) -> pd.DataFrame:
    """Per-source histogram of each document's TOP-TOKEN SHARE — the
    fraction of the document occupied by its single most frequent token.
    This is the Gopher/MassiveText repetition rule ("most common word
    covers > X% of the doc" => drop) turned into a distribution, so the
    threshold is chosen from the data instead of guessed.

    Embarrassingly parallel: a document's text lives in ONE row, so the
    max-count/total ratio is batch-local — no exchange at all. Each batch
    dictionary-encodes its token stream once (counts run over (doc, code)
    pairs, not strings) and emits (source, bin) integer partials bounded
    by sources x 11 bins; integer counts fold in any order. The ratio
    bins via floor(mx * 10.0 / nt) computed in the same f64 ops as the
    oracle's BIGINT*10.0/BIGINT, so bin edges are bit-identical. NULL
    text coalesces to '' (splits to one empty token -> share 1.0, bin
    10) exactly like the SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "source"])

    def partial(t: "pa.Table") -> pd.DataFrame:
        text = pc.coalesce(t.column("text"), "")
        toks = pc.split_pattern(text, " ")
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(pc.list_flatten(toks)).combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False)
        pair = pd.DataFrame({"p": parents, "c": codes})
        cnt = pair.groupby(["p", "c"], as_index=False).size()
        mx = np.zeros(len(t), np.int64)
        pm = cnt.groupby("p")["size"].max()
        mx[pm.index.to_numpy(np.int64)] = pm.to_numpy(np.int64)
        bins = np.minimum(
            np.floor(mx * 10.0 / np.maximum(nt, 1)).astype(np.int64), 10)
        src = t.column("source").to_pandas().to_numpy(object)
        return (pd.DataFrame({"source": src, "bin": bins})
                .groupby(["source", "bin"], as_index=False).size()
                .rename(columns={"size": "n_docs"}))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    schema = {"source": "object", "bin": "int64", "n_docs": "int64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    out = parts.groupby(["source", "bin"], as_index=False).agg(
        n_docs=("n_docs", "sum"))
    return typed_out(out, schema, sort_by=["source", "bin"])


DOC_TOP_TOKEN_SHARE_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents
), tc AS (
  SELECT doc_id, source, tok, COUNT(*) AS c
  FROM toks GROUP BY 1, 2, 3
), dm AS (
  SELECT doc_id, source, MAX(c) AS mx, SUM(c) AS nt
  FROM tc GROUP BY 1, 2
)
SELECT source,
       LEAST(CAST(FLOOR(mx * 10.0 / nt) AS BIGINT), 10) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM dm GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# doc_length_ks_by_lang: two-sample Kolmogorov-Smirnov between languages
# ---------------------------------------------------------------------------

def doc_length_ks_by_lang(sf_dir: str) -> pd.DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between every pair of
    languages' document-length distributions — the distribution-drift test
    a corpus-balance audit runs (is French systematically longer than
    English?). The KS sup over an EXACT ECDF needs only the per-(lang,
    length) counts: partial histograms inside map_batches, one bounded
    fold on the driver (rows <= langs x distinct lengths, capped by the
    length domain, never the document count), then cumulative sums down a
    dense [lang x pooled-grid] matrix and one vectorized pairwise max.
    Integer counts cross the wire; the only floats are the final ECDF
    divisions, evaluated in the same order as the oracle's windowed
    running sums so the round(6) hash is stable."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.dropna(subset=["lang"]).groupby(
            ["lang", "n_chars"], as_index=False).agg(n=("n_chars", "size"))
        return g.rename(columns={"n_chars": "x"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "x"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lang_a": "object", "lang_b": "object", "ks_stat": "float64"}
    if counts.empty:
        return typed_out(pd.DataFrame(), schema)
    langs = np.sort(counts.lang.unique())
    grid = np.sort(counts.x.unique())
    mat = np.zeros((len(langs), len(grid)), dtype=np.int64)
    li = pd.Series(range(len(langs)), index=langs)
    gi = pd.Series(range(len(grid)), index=grid)
    mat[li.loc[counts.lang].to_numpy(), gi.loc[counts.x].to_numpy()] = (
        counts.n.to_numpy(np.int64))
    cum = np.cumsum(mat, axis=1).astype(np.float64)
    ecdf = cum / cum[:, -1:]
    rows = []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            rows.append((langs[i], langs[j],
                         np.max(np.abs(ecdf[i] - ecdf[j]))))
    out = pd.DataFrame(rows, columns=["lang_a", "lang_b", "ks_stat"])
    out["ks_stat"] = round_away(out.ks_stat, 6)
    return typed_out(out, schema, sort_by=["lang_a", "lang_b"])


DOC_LENGTH_KS_SQL = """
WITH counts AS (
  SELECT lang, n_chars AS x, COUNT(*) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
),
langs AS (SELECT DISTINCT lang FROM counts),
grid AS (SELECT DISTINCT x FROM counts),
lg AS (SELECT l.lang, g.x FROM langs l CROSS JOIN grid g),
cum AS (
  SELECT lg.lang, lg.x,
         CAST(SUM(COALESCE(c.n, 0))
              OVER (PARTITION BY lg.lang ORDER BY lg.x) AS DOUBLE)
           / SUM(COALESCE(c.n, 0)) OVER (PARTITION BY lg.lang) AS f
  FROM lg LEFT JOIN counts c ON c.lang = lg.lang AND c.x = lg.x
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       ROUND(MAX(ABS(a.f - b.f)), 6) AS ks_stat
FROM cum a JOIN cum b ON b.x = a.x AND a.lang < b.lang
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# doc_length_anova_by_lang: one-way ANOVA F-statistic across languages
# ---------------------------------------------------------------------------

def doc_length_anova_by_lang(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F-statistic of document length across languages —
    the mean-difference member of the hypothesis-test trio (KS compares
    whole distributions, chi-square categorical independence, F group
    means). ANOVA is fully moment-decomposable: each batch emits one
    (lang, n, sum, sum-of-squares) row per language, the driver folds
    the lang-bounded partials in sorted order (float-sum determinism)
    and evaluates the closed forms — between/within mean squares never
    see a document. Output is empty when the test is undefined
    (fewer than 2 groups or no residual df), matching the oracle's
    guard."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["lang"])
        x = df.n_chars.to_numpy(np.float64)
        g = df.assign(n=1, s1=x, s2=x * x)
        return g.groupby("lang", as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"n_groups": "int64", "n_docs": "int64",
              "ms_between": "float64", "ms_within": "float64",
              "f_stat": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(list(parts.columns), kind="stable")
    m = parts.groupby("lang", as_index=False).agg(
        n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))
    k = float(len(m))
    n = float(m.n.sum())
    if k <= 1 or n <= k:
        return typed_out(pd.DataFrame(), schema)
    s1 = m.s1.to_numpy(np.float64)
    nn = m.n.to_numpy(np.float64)
    sq = float((s1 * s1 / nn).sum())
    s1t = float(s1.sum())
    s2t = float(m.s2.sum())
    ms_between = (sq - s1t * s1t / n) / (k - 1)
    ms_within = (s2t - sq) / (n - k)
    out = pd.DataFrame([{
        "n_groups": np.int64(k), "n_docs": np.int64(n),
        "ms_between": round_away(np.float64(ms_between), 6) + 0.0,
        "ms_within": round_away(np.float64(ms_within), 6) + 0.0,
        "f_stat": round_away(np.float64(ms_between / ms_within), 6) + 0.0,
    }])
    return typed_out(out, schema)


DOC_LENGTH_ANOVA_SQL = """
WITH m AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(n_chars AS DOUBLE)) AS s1,
         SUM(CAST(n_chars AS DOUBLE) * n_chars) AS s2
  FROM documents WHERE lang IS NOT NULL GROUP BY 1
),
t AS (
  SELECT SUM(n) AS n, SUM(s1) AS s1, SUM(s1 * s1 / n) AS sq,
         SUM(s2) AS s2, CAST(COUNT(*) AS DOUBLE) AS k
  FROM m
)
SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_docs,
       ROUND((sq - s1 * s1 / n) / (k - 1), 6) AS ms_between,
       ROUND((s2 - sq) / (n - k), 6) AS ms_within,
       ROUND(((sq - s1 * s1 / n) / (k - 1)) / ((s2 - sq) / (n - k)), 6)
         AS f_stat
FROM t WHERE k > 1 AND n > k
"""


# ---------------------------------------------------------------------------
# doc_length_mannwhitney_by_lang: rank-sum (Mann-Whitney U) test per pair
# ---------------------------------------------------------------------------

def doc_length_mannwhitney_by_lang(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U (rank-sum) statistic and rank-biserial effect size
    between every language pair's length distributions — the RANK-based
    member of the test family (KS takes the ECDF sup, U counts
    discordant pairs, so U sees stochastic dominance KS understates).
    U decomposes over the same (lang, length) count matrix as the KS
    fold: U_ab = sum_x n_a(x) * (count_b(<x) + n_b(x)/2) — ties get the
    half — evaluated as one vectorized pass down the pooled grid per
    pair. Counts are integers until the effect-size division; U itself
    is exact in halves (rounded to 1dp to pin the dtype)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.dropna(subset=["lang"]).groupby(
            ["lang", "n_chars"], as_index=False).agg(n=("n_chars", "size"))
        return g.rename(columns={"n_chars": "x"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "x"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lang_a": "object", "lang_b": "object",
              "u_stat": "float64", "rank_biserial": "float64"}
    if counts.empty:
        return typed_out(pd.DataFrame(), schema)
    langs = np.sort(counts.lang.unique())
    grid = np.sort(counts.x.unique())
    mat = np.zeros((len(langs), len(grid)), dtype=np.float64)
    li = pd.Series(range(len(langs)), index=langs)
    gi = pd.Series(range(len(grid)), index=grid)
    mat[li.loc[counts.lang].to_numpy(), gi.loc[counts.x].to_numpy()] = (
        counts.n.to_numpy(np.float64))
    below = np.cumsum(mat, axis=1) - mat
    tot = mat.sum(axis=1)
    rows = []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            u = float((mat[i] * (below[j] + 0.5 * mat[j])).sum())
            r = 1.0 - 2.0 * u / (tot[i] * tot[j])
            rows.append((langs[i], langs[j], u, r))
    out = pd.DataFrame(rows, columns=["lang_a", "lang_b", "u_stat",
                                      "rank_biserial"])
    out["u_stat"] = round_away(out.u_stat, 1)
    out["rank_biserial"] = round_away(out.rank_biserial, 6)
    return typed_out(out, schema, sort_by=["lang_a", "lang_b"])


DOC_LENGTH_MANNWHITNEY_SQL = """
WITH counts AS (
  SELECT lang, n_chars AS x, CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
),
langs AS (SELECT DISTINCT lang FROM counts),
grid AS (SELECT DISTINCT x FROM counts),
lg AS (SELECT l.lang, g.x FROM langs l CROSS JOIN grid g),
cum AS (
  SELECT lg.lang, lg.x, COALESCE(c.n, 0) AS n,
         SUM(COALESCE(c.n, 0)) OVER (PARTITION BY lg.lang ORDER BY lg.x)
           - COALESCE(c.n, 0) AS below
  FROM lg LEFT JOIN counts c ON c.lang = lg.lang AND c.x = lg.x
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       ROUND(SUM(a.n * (b.below + 0.5 * b.n)), 1) AS u_stat,
       ROUND(1 - 2 * SUM(a.n * (b.below + 0.5 * b.n))
                 / (SUM(a.n) * SUM(b.n)), 6) AS rank_biserial
FROM cum a JOIN cum b ON b.x = a.x AND a.lang < b.lang
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# quality_classifier_calibration: reliability diagram of the quality score
# ---------------------------------------------------------------------------

def quality_classifier_calibration(sf_dir: str) -> pd.DataFrame:
    """Calibration (reliability-diagram) bins for the quality
    classifier — the companion report to the PR curve: per predicted-
    score decile, how often the reference label is actually positive
    (a well-calibrated filter has pos_rate tracking mean_score; this
    one over-predicts the low bins, which is what the report is for).
    Same actor-pool scoring as ``quality_classifier_pr_curve`` (weights
    once per actor, the SAME rounded sigmoid the oracle reproduces);
    each batch reduces to <= 10 (bin, n, n_pos, sum_score) partials,
    folded in stable order on the driver."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    class _CalibPartial(QualityClassifier):
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            scored = super().__call__(df)
            score = scored.quality_score.to_numpy(np.float64)
            truth = (scored.doc_id.to_numpy(np.int64) % 10 < 7)
            b = np.minimum(np.floor(score * 10), 9).astype(np.int64)
            g = pd.DataFrame({"bin": b, "pos": truth.astype(np.int64),
                              "score": score})
            g = g.sort_values(["bin", "score"], kind="stable")
            return g.groupby("bin", as_index=False).agg(
                n_docs=("pos", "size"), n_pos=("pos", "sum"),
                sum_score=("score", "sum"))

    out = ds.map_batches(_CalibPartial, batch_format="pandas",
                         concurrency=2).to_pandas()
    schema = {"bin": "int64", "n_docs": "int64", "n_pos": "int64",
              "pos_rate": "float64", "mean_score": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values(list(out.columns), kind="stable")
    agg = out.groupby("bin", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_pos=("n_pos", "sum"),
        sum_score=("sum_score", "sum"))
    agg["pos_rate"] = round_away(
        agg.n_pos.to_numpy(np.float64) / agg.n_docs.to_numpy(np.float64), 6)
    agg["mean_score"] = round_away(
        agg.sum_score.to_numpy(np.float64)
        / agg.n_docs.to_numpy(np.float64), 6)
    agg = agg.drop(columns=["sum_score"])
    agg["n_docs"] = agg.n_docs.astype("int64")
    agg["n_pos"] = agg.n_pos.astype("int64")
    return typed_out(agg, schema, sort_by="bin")


QUALITY_CLASSIFIER_CALIBRATION_SQL = """
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), s AS (
  SELECT doc_id,
         ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.45 * ln(n_tok + 1.0)
               + 6.0 * (n_stop / n_tok)
               + 1.5 * (n_alpha / (n_chars + 1.0))
               + 0.05 * (n_chars / n_tok)))), 6) AS score,
         (doc_id % 10 < 7) AS truth
  FROM f
)
SELECT CAST(LEAST(FLOOR(score * 10), 9) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       ROUND(SUM(CASE WHEN truth THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS pos_rate,
       ROUND(AVG(score), 6) AS mean_score
FROM s GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# doc_heaps_law_fit: vocabulary-growth (Heaps' law) fit over shingles
# ---------------------------------------------------------------------------

def doc_heaps_law_fit(sf_dir: str, n_ck: int = 20) -> pd.DataFrame:
    """Heaps'-law fit V(N) ~ K * N^beta of 3-token-shingle vocabulary
    growth — the curve a tokenizer/dedup budget is planned against (how
    fast does new vocabulary keep arriving as the corpus grows?). Word
    vocabulary is vacuous on this synthetic corpus (31 words, saturates
    in checkpoint 0); 3-token shingles grow for real (16k+ distinct at
    sf0.01, new mass in every checkpoint).

    The ordered 'scan the corpus and watch vocabulary grow' semantics
    distribute exactly without any ordered scan: a shingle's
    contribution to the growth curve is fully determined by its FIRST
    document (gram-bucketed MIN exchange — the token_doc_freq pattern),
    and both curves then collapse to ``n_ck`` checkpoint counters
    (first-occurrence histogram for V, shingle-count histogram for N —
    the latter needs no exchange at all). The driver takes two
    cumulative sums and a closed-form log-log OLS over n_ck points."""
    import ray.data
    from ray.data.aggregate import Sum
    from ..functions.shuffle import bucketed_combine

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    schema = {"n_checkpoints": "int64", "heaps_beta": "float64",
              "heaps_k": "float64"}
    md_row = docs.max("doc_id")
    if md_row is None:
        return typed_out(pd.DataFrame(), schema)
    md = int(md_row) + 1

    def shingles(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_d = [], []
        for did, txt in zip(df.doc_id.to_numpy(np.int64),
                            df.text.fillna("")):
            toks = txt.split(" ") if txt else []
            for i in range(len(toks) - 2):
                out_g.append(" ".join(toks[i:i + 3]))
                out_d.append(did)
        return pd.DataFrame({"gram": pd.Series(out_g, dtype=object),
                             "doc_id": pd.Series(out_d, dtype="int64")})

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = shingles(df)
        return g.groupby("gram", as_index=False).agg(fd=("doc_id", "min"))

    def first_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("gram", as_index=False).agg(fd=("fd", "min"))
        ck = (g.fd.to_numpy(np.int64) * n_ck // md)
        u, v = np.unique(ck, return_counts=True)
        return pd.DataFrame({"ck": u.astype(np.int64),
                             "v": v.astype(np.int64)})

    vb = bucketed_combine(
        docs.map_batches(first_partial, batch_format="pandas"),
        "gram", lambda df: df, first_hist,
        num_buckets=32, coalesce_blocks=8).to_pandas()

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = shingles(df)
        ck = (g.doc_id.to_numpy(np.int64) * n_ck // md)
        u, n = np.unique(ck, return_counts=True)
        return pd.DataFrame({"ck": u.astype(np.int64),
                             "n": n.astype(np.int64)})

    nb = (
        docs.map_batches(count_partial, batch_format="pandas")
        .groupby("ck")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if vb.empty or nb.empty:
        return typed_out(pd.DataFrame(), schema)
    vgrid = np.zeros(n_ck, dtype=np.float64)
    ngrid = np.zeros(n_ck, dtype=np.float64)
    vb = vb.groupby("ck", as_index=False).agg(v=("v", "sum"))
    vgrid[vb.ck.to_numpy(np.int64)] = vb.v.to_numpy(np.float64)
    ngrid[nb.ck.to_numpy(np.int64)] = nb.n.to_numpy(np.float64)
    cv = np.cumsum(vgrid)
    cn = np.cumsum(ngrid)
    keep = (cv > 0) & (cn > 0)
    x = np.log(cn[keep])
    y = np.log(cv[keep])
    k = float(len(x))
    if k <= 1:
        return typed_out(pd.DataFrame(), schema)
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    beta = (sxy - sx * sy / k) / (sxx - sx * sx / k)
    kc = np.exp((sy - beta * sx) / k)
    out = pd.DataFrame([{
        "n_checkpoints": np.int64(k),
        "heaps_beta": round_away(np.float64(beta), 6) + 0.0,
        "heaps_k": round_away(np.float64(kc), 6) + 0.0,
    }])
    return typed_out(out, schema)


DOC_HEAPS_LAW_SQL = """
WITH t AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
  FROM t, UNNEST(range(1, GREATEST(len(toks) - 2, 0) + 1)) AS u(i)
),
mx AS (SELECT MAX(doc_id) + 1 AS md FROM documents),
firsts AS (SELECT gram, MIN(doc_id) AS fd FROM sh GROUP BY 1),
vb AS (SELECT CAST(fd * 20 // mx.md AS BIGINT) AS ck,
              CAST(COUNT(*) AS DOUBLE) AS v FROM firsts, mx GROUP BY 1),
nb AS (SELECT CAST(doc_id * 20 // mx.md AS BIGINT) AS ck,
              CAST(COUNT(*) AS DOUBLE) AS n FROM sh, mx GROUP BY 1),
grid AS (SELECT UNNEST(generate_series(0, 19)) AS ck),
cums AS (
  SELECT g.ck,
         SUM(COALESCE(vb.v, 0)) OVER (ORDER BY g.ck) AS cv,
         SUM(COALESCE(nb.n, 0)) OVER (ORDER BY g.ck) AS cn
  FROM grid g LEFT JOIN vb ON vb.ck = g.ck LEFT JOIN nb ON nb.ck = g.ck
),
pts AS (SELECT LN(cn) AS x, LN(cv) AS y FROM cums WHERE cn > 0 AND cv > 0),
o AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT CAST(k AS BIGINT) AS n_checkpoints,
       ROUND((sxy - sx * sy / k) / (sxx - sx * sx / k), 6) AS heaps_beta,
       ROUND(EXP((sy - (sxy - sx * sy / k) / (sxx - sx * sx / k) * sx) / k),
             6) AS heaps_k
FROM o WHERE k > 1
"""


# ---------------------------------------------------------------------------
# doc_token_char_regression: grouped OLS from decomposable moments
# ---------------------------------------------------------------------------

def doc_token_char_regression(sf_dir: str) -> pd.DataFrame:
    """Per-language OLS of token count on character count — the grouped
    LINEAR-REGRESSION operator (slope ~ 1/avg-word-length, r^2 ~ 0.995
    here: the tokenizer-budget rule of thumb 'tokens per char' with its
    goodness of fit, per language). OLS is fully moment-decomposable:
    each batch emits one (lang, n, sum-x, sum-y, sum-xx, sum-xy, sum-yy)
    row per language, folded in sorted order; slope/intercept/r^2 are
    closed forms on the lang-bounded frame."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["lang"])
        x = df.n_chars.to_numpy(np.float64)
        y = np.array([len(t.split(" ")) if t else 1
                      for t in df.text.fillna("")], dtype=np.float64)
        g = pd.DataFrame({"lang": df.lang, "n": 1.0, "sx": x, "sy": y,
                          "sxx": x * x, "sxy": x * y, "syy": y * y})
        return g.groupby("lang", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"lang": "object", "n_docs": "int64", "slope": "float64",
              "intercept": "float64", "r2": "float64"}
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    parts = parts.sort_values(list(parts.columns), kind="stable")
    m = parts.groupby("lang", as_index=False).sum()
    m = m[m.n > 1]
    if m.empty:
        return typed_out(pd.DataFrame(), schema)
    n = m.n.to_numpy(np.float64)
    sx, sy = m.sx.to_numpy(np.float64), m.sy.to_numpy(np.float64)
    sxx, sxy = m.sxx.to_numpy(np.float64), m.sxy.to_numpy(np.float64)
    syy = m.syy.to_numpy(np.float64)
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    out = pd.DataFrame({
        "lang": m.lang,
        "n_docs": n.astype(np.int64),
        "slope": round_away(slope, 6),
        "intercept": round_away((sy - slope * sx) / n, 6),
        "r2": round_away((sxy - sx * sy / n) ** 2
                         / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6),
    })
    return typed_out(out, schema, sort_by="lang")


DOC_TOKEN_CHAR_REGRESSION_SQL = """
WITH f AS (
  SELECT lang, CAST(n_chars AS DOUBLE) AS x,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS DOUBLE) AS y
  FROM documents WHERE lang IS NOT NULL
),
m AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM f GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
       ROUND((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n, 6)
         AS intercept,
       ROUND(POW(sxy - sx * sy / n, 2)
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
FROM m WHERE n > 1 ORDER BY lang
"""


def quality_classifier_roc_auc(sf_dir: str) -> pd.DataFrame:
    """Exact ROC AUC of the quality classifier via the rank-sum (Mann-
    Whitney) identity — the threshold-FREE companion to the PR curve
    and calibration reports: AUC = P(score_pos > score_neg) + 0.5 *
    P(tie). No pair of documents is ever compared: each batch folds to
    per-score (n_pos, n_neg) counts through the same warm actor pool,
    and because the emitted score is rounded to 6 decimals the score
    grid is hard-bounded at ~1e6 cells regardless of corpus size. The
    doubled U statistic stays INTEGER (ties contribute odd halves), so
    the fold is exact in any arrival order."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    class _AucPartial(QualityClassifier):
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            scored = super().__call__(df)
            truth = scored.doc_id.to_numpy(np.int64) % 10 < 7
            g = pd.DataFrame({"score": scored.quality_score,
                              "p": truth.astype(np.int64),
                              "q": (~truth).astype(np.int64)})
            return g.groupby("score", as_index=False).sum()

    out = ds.map_batches(_AucPartial, batch_format="pandas",
                         concurrency=2).to_pandas()
    schema = {"n_pos": "int64", "n_neg": "int64", "roc_auc": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    m = out.groupby("score", as_index=False).sum().sort_values("score")
    p = m.p.to_numpy(np.int64)
    q = m.q.to_numpy(np.int64)
    n_pos, n_neg = int(p.sum()), int(q.sum())
    if n_pos == 0 or n_neg == 0:
        # single-class corpus: AUC undefined (oracle guard mirrors)
        return typed_out(pd.DataFrame(), schema)
    cq = np.concatenate(([0], np.cumsum(q)[:-1]))  # negs strictly below
    u2 = int((p * (2 * cq + q)).sum())             # 2U: ties count once
    res = pd.DataFrame([{
        "n_pos": np.int64(n_pos), "n_neg": np.int64(n_neg),
        "roc_auc": round_away(
            np.float64(u2 / (2.0 * n_pos * n_neg)), 6) + 0.0,
    }])
    return typed_out(res, schema)


QUALITY_CLASSIFIER_ROC_AUC_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), s AS (
  SELECT ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.45 * ln(n_tok + 1.0)
               + 6.0 * (n_stop / n_tok)
               + 1.5 * (n_alpha / (n_chars + 1.0))
               + 0.05 * (n_chars / n_tok)))), 6) AS score,
         (doc_id % 10 < 7) AS truth
  FROM f
), g AS (
  SELECT score,
         CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(CASE WHEN NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS q
  FROM s GROUP BY 1
), w AS (
  SELECT p, q,
         COALESCE(SUM(q) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cq
  FROM g
), u AS (
  SELECT CAST(SUM(p * (2 * cq + q)) AS BIGINT) AS u2,
         CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(q) AS BIGINT) AS nq
  FROM w
)
SELECT np AS n_pos, nq AS n_neg,
       ROUND(CAST(u2 AS DOUBLE) / (2.0 * np * nq), 6) AS roc_auc
FROM u WHERE np > 0 AND nq > 0
"""


class _RaterConfusionPartial(QualityClassifier):
    """Per-batch 2x2 confusion between the learned classifier (keep iff
    rounded score >= 0.5) and the rule-based stopword-density gate
    (keep iff n_stop/n_tok >= 0.2) — shared by the kappa and McNemar
    rater-agreement operators."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        scored = super().__call__(df)
        txt = df["text"].fillna("")
        toks = txt.str.split(" ")
        ex = toks.explode()
        n_tok = toks.str.len().to_numpy(np.float64)
        n_stop = (ex.isin(self.stop).groupby(ex.index).sum()
                  .reindex(df.index, fill_value=0)
                  .to_numpy(np.float64))
        a = scored.quality_score.to_numpy(np.float64) >= 0.5
        b = (n_stop / n_tok) >= 0.2
        return pd.DataFrame([{
            "kk": int(np.sum(a & b)), "kd": int(np.sum(a & ~b)),
            "dk": int(np.sum(~a & b)), "dd": int(np.sum(~a & ~b)),
        }])


def _rater_confusion(sf_dir: str):
    """Fold the per-batch 2x2 rows to global (kk, kd, dk, dd); None on an
    empty corpus."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(_RaterConfusionPartial, batch_format="pandas",
                         concurrency=2).to_pandas()
    if out.empty:
        return None
    kk, kd = int(out.kk.sum()), int(out.kd.sum())
    dk, dd = int(out.dk.sum()), int(out.dd.sum())
    if kk + kd + dk + dd == 0:
        return None
    return kk, kd, dk, dd


def quality_rater_agreement_kappa(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa between two independent keep/drop 'raters' — the
    learned quality classifier (keep iff rounded score >= 0.5) and a
    rule-based stopword-density gate (keep iff n_stop/n_tok >= 0.2):
    the label-audit statistic that discounts the agreement two filters
    get for free from the base rate (raw agreement of two 99%-keep
    filters is ~98% even if independent; kappa reads ~0 there). Each
    batch emits ONE 2x2 confusion row; the driver folds four integers
    and evaluates the closed form."""
    schema = {"n_docs": "int64", "observed_agree": "float64",
              "expected_agree": "float64", "kappa": "float64"}
    conf = _rater_confusion(sf_dir)
    if conf is None:
        return typed_out(pd.DataFrame(), schema)
    kk, kd, dk, dd = conf
    n = kk + kd + dk + dd
    po = (kk + dd) / float(n)
    pe = ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)) / (float(n) * n)
    if 1.0 - pe <= 0:
        # both raters constant: kappa undefined (oracle guard mirrors)
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame([{
        "n_docs": np.int64(n),
        "observed_agree": round_away(np.float64(po), 6) + 0.0,
        "expected_agree": round_away(np.float64(pe), 6) + 0.0,
        "kappa": round_away(np.float64((po - pe) / (1.0 - pe)), 6) + 0.0,
    }])
    return typed_out(res, schema)


QUALITY_RATER_KAPPA_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), s AS (
  SELECT (ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.45 * ln(n_tok + 1.0)
               + 6.0 * (n_stop / n_tok)
               + 1.5 * (n_alpha / (n_chars + 1.0))
               + 0.05 * (n_chars / n_tok)))), 6) >= 0.5) AS a,
         ((n_stop / n_tok) >= 0.2) AS b
  FROM f
), c AS (
  SELECT CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS kk,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
           AS kd,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
           AS dk,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
           AS dd
  FROM s HAVING COUNT(*) > 0
), k AS (
  SELECT kk + kd + dk + dd AS n,
         (kk + dd) / CAST(kk + kd + dk + dd AS DOUBLE) AS po,
         ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd))
           / (CAST(kk + kd + dk + dd AS DOUBLE)
              * (kk + kd + dk + dd)) AS pe
  FROM c
)
SELECT n AS n_docs,
       ROUND(po, 6) AS observed_agree,
       ROUND(pe, 6) AS expected_agree,
       ROUND((po - pe) / (1.0 - pe), 6) AS kappa
FROM k WHERE n > 0 AND 1.0 - pe > 0
"""


def lang_token_llr_topk(sf_dir: str) -> pd.DataFrame:
    """Dunning log-likelihood-ratio (G-test) DISTINCTIVE tokens per
    language — the corpus-linguistics keyword extractor (tf-idf asks
    'what is frequent here'; LLR asks 'what is frequent here relative
    to everywhere else, beyond chance'), the standard report when
    auditing a multilingual mix for contamination or register drift.
    Each batch folds to (lang, token) counts; the (vocab x lang) grid
    is bounded by the vocabulary, and every 2x2 G2 is evaluated
    vectorized on the driver frame. Ranking uses the ROUNDED statistic
    with a token tiebreak so both engines induce the same total order."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        lang = df["lang"]
        ex = pd.DataFrame({"lang": lang.repeat(toks.str.len()),
                           "token": np.concatenate(toks.to_numpy())
                           if len(df) else np.array([], dtype=object)})
        ex = ex[ex.token != ""]
        g = ex.groupby(["lang", "token"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lang": "object", "token": "object", "n_in_lang": "int64",
              "g2_llr": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    a = out.n.to_numpy(np.float64)
    tok_tot = out.groupby("token").n.transform("sum").to_numpy(np.float64)
    lang_tot = out.groupby("lang").n.transform("sum").to_numpy(np.float64)
    n = float(out.n.sum())
    b = tok_tot - a
    c = lang_tot - a
    d = n - tok_tot - c
    ea = tok_tot * lang_tot / n
    eb = tok_tot * (n - lang_tot) / n
    ec = (n - tok_tot) * lang_tot / n
    ed = (n - tok_tot) * (n - lang_tot) / n

    def term(o, e):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(o > 0, o * np.log(o / e), 0.0)

    g2 = 2.0 * (term(a, ea) + term(b, eb) + term(c, ec) + term(d, ed))
    res = pd.DataFrame({"lang": out.lang, "token": out.token,
                        "n_in_lang": out.n.astype("int64"),
                        "g2_llr": round_away(g2, 6) + 0.0})
    res = res.sort_values(["lang", "g2_llr", "token"],
                          ascending=[True, False, True], kind="stable")
    res = res.groupby("lang", as_index=False).head(5)
    return typed_out(res, schema, sort_by=["lang", "token"])


LANG_TOKEN_LLR_SQL = """
WITH tok AS (
  SELECT lang, UNNEST(string_split(COALESCE(text, ''), ' ')) AS token
  FROM documents
), c AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS a
  FROM tok WHERE token <> '' GROUP BY 1, 2
), m AS (
  SELECT lang, token, a,
         SUM(a) OVER (PARTITION BY token) AS tt,
         SUM(a) OVER (PARTITION BY lang) AS lt,
         SUM(a) OVER () AS n
  FROM c
), g AS (
  SELECT lang, token, a,
         ROUND(2.0 * (
           (CASE WHEN a > 0 THEN a * LN(a / (CAST(tt AS DOUBLE) * lt / n))
                 ELSE 0.0 END)
           + (CASE WHEN tt - a > 0 THEN (tt - a)
                * LN((tt - a) / (CAST(tt AS DOUBLE) * (n - lt) / n))
                 ELSE 0.0 END)
           + (CASE WHEN lt - a > 0 THEN (lt - a)
                * LN((lt - a) / (CAST(n - tt AS DOUBLE) * lt / n))
                 ELSE 0.0 END)
           + (CASE WHEN n - tt - (lt - a) > 0 THEN (n - tt - (lt - a))
                * LN((n - tt - (lt - a))
                     / (CAST(n - tt AS DOUBLE) * (n - lt) / n))
                 ELSE 0.0 END)), 6) AS g2_llr
  FROM m
), r AS (
  SELECT lang, token, a, g2_llr,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY g2_llr DESC, token) AS rn
  FROM g
)
SELECT lang, token, a AS n_in_lang, g2_llr
FROM r WHERE rn <= 5 ORDER BY lang, token
"""


def lang_unigram_cross_entropy(sf_dir: str) -> pd.DataFrame:
    """Cross-entropy and KL divergence between per-language unigram LMs,
    for every ordered language pair — the corpus-drift matrix behind
    "is the es split just translated en?" audits (JS divergence in
    ``source_lang_js_divergence`` compares LABEL distributions; this
    compares the LANGUAGE MODELS the text itself induces). P_a is the
    MLE unigram model of language a; Q_b is Laplace-smoothed over the
    union vocabulary so unseen tokens stay finite:
    Q_b(t) = (n_bt + 1) / (N_b + V).

    Plan: the same per-batch (lang, token) integer partials as
    ``lang_token_llr_topk`` and one vocab-bounded groupby; the pair
    matrix is (langs x langs) driver flops over the (vocab x lang)
    grid — bounded by vocabulary, not corpus."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        ex = pd.DataFrame({"lang": df["lang"].repeat(toks.str.len()),
                           "token": np.concatenate(toks.to_numpy())
                           if len(df) else np.array([], dtype=object)})
        ex = ex[ex.token != ""]
        g = ex.groupby(["lang", "token"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lang_a": "object", "lang_b": "object",
              "cross_entropy": "float64", "kl_divergence": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    grid = out.pivot_table(index="token", columns="lang", values="n",
                           aggfunc="sum", fill_value=0)
    counts = grid.to_numpy(np.float64)           # (V, L)
    langs = list(grid.columns)
    v = float(len(grid))
    totals = counts.sum(axis=0)                  # N_l
    rows = []
    for ia, la in enumerate(langs):
        pa = counts[:, ia] / totals[ia]
        sup = pa > 0
        lp = np.log(pa[sup])
        for ib, lb in enumerate(langs):
            lq = np.log((counts[sup, ib] + 1.0) / (totals[ib] + v))
            ce = -float(np.sum(pa[sup] * lq))
            kl = float(np.sum(pa[sup] * (lp - lq)))
            rows.append((la, lb, ce, kl))
    res = pd.DataFrame(rows, columns=["lang_a", "lang_b",
                                      "cross_entropy", "kl_divergence"])
    for c in ("cross_entropy", "kl_divergence"):
        res[c] = round_away(res[c].to_numpy(np.float64), 6) + 0.0
    return typed_out(res, schema, sort_by=["lang_a", "lang_b"])


LANG_CROSS_ENTROPY_SQL = """
WITH tok AS (
  SELECT lang, UNNEST(string_split(COALESCE(text, ''), ' ')) AS token
  FROM documents
), c AS (
  SELECT lang, token, COUNT(*) AS n
  FROM tok WHERE token <> '' GROUP BY 1, 2
), vv AS (
  SELECT CAST(COUNT(DISTINCT token) AS DOUBLE) AS v FROM c
), tot AS (
  SELECT lang, CAST(SUM(n) AS DOUBLE) AS nl FROM c GROUP BY lang
), pair AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         a.nl AS na, b.nl AS nb
  FROM tot a CROSS JOIN tot b
), terms AS (
  SELECT p.lang_a, p.lang_b,
         ca.n / p.na AS pa,
         LN(ca.n / p.na) AS lpa,
         LN((COALESCE(cb.n, 0) + 1.0) / (p.nb + vv.v)) AS lqb
  FROM pair p
  JOIN c ca ON ca.lang = p.lang_a
  LEFT JOIN c cb ON cb.lang = p.lang_b AND cb.token = ca.token
  CROSS JOIN vv
)
SELECT lang_a, lang_b,
       ROUND(-SUM(pa * lqb), 6) AS cross_entropy,
       ROUND(SUM(pa * (lpa - lqb)), 6) AS kl_divergence
FROM terms GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b
"""


def quality_rater_mcnemar(sf_dir: str) -> pd.DataFrame:
    """McNemar paired test between the same two keep/drop raters as
    ``quality_rater_agreement_kappa`` — kappa says HOW MUCH the filters
    agree; McNemar says whether their DISAGREEMENTS are one-sided (one
    filter systematically keeps what the other drops), which is the
    question when deciding if swapping filters changes the corpus. Uses
    the continuity-corrected statistic (|b - c| - 1)^2 / (b + c) over
    the two discordant cells; shares the per-batch confusion fold, so
    the only new work is one closed form on two integers."""
    schema = {"n_docs": "int64", "a_only_keep": "int64",
              "b_only_keep": "int64", "mcnemar_chi2": "float64"}
    conf = _rater_confusion(sf_dir)
    if conf is None:
        return typed_out(pd.DataFrame(), schema)
    kk, kd, dk, dd = conf
    if kd + dk == 0:
        return typed_out(pd.DataFrame(), schema)
    stat = (abs(kd - dk) - 1.0) ** 2 / float(kd + dk)
    res = pd.DataFrame([{
        "n_docs": np.int64(kk + kd + dk + dd),
        "a_only_keep": np.int64(kd), "b_only_keep": np.int64(dk),
        "mcnemar_chi2": round_away(np.float64(stat), 6) + 0.0,
    }])
    return typed_out(res, schema)


QUALITY_RATER_MCNEMAR_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), s AS (
  SELECT (ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.45 * ln(n_tok + 1.0)
               + 6.0 * (n_stop / n_tok)
               + 1.5 * (n_alpha / (n_chars + 1.0))
               + 0.05 * (n_chars / n_tok)))), 6) >= 0.5) AS a,
         ((n_stop / n_tok) >= 0.2) AS b
  FROM f
), c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
           AS kd,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
           AS dk
  FROM s HAVING COUNT(*) > 0
)
SELECT n AS n_docs, kd AS a_only_keep, dk AS b_only_keep,
       ROUND(POWER(ABS(CAST(kd - dk AS DOUBLE)) - 1.0, 2)
             / CAST(kd + dk AS DOUBLE), 6) AS mcnemar_chi2
FROM c WHERE kd + dk > 0
"""


def doc_length_levene_by_lang(sf_dir: str) -> pd.DataFrame:
    """Brown-Forsythe test (Levene with median centers) for equality of
    document-length VARIANCE across languages — the homoscedasticity
    gate that decides whether the ANOVA in ``doc_length_anova_by_lang``
    is trustworthy (ANOVA compares means assuming equal spread; a web
    corpus where one language is all boilerplate snippets and another
    is long articles fails exactly here). The statistic is a one-way
    ANOVA F on the absolute deviations z = |len - median(lang)|.

    Plan: the same VALUE-HISTOGRAM trick as the exact-median operator —
    per-batch (lang, n_chars, cnt) partials, lang-bucketed combine
    walks the cumulative histogram for each language's median and
    emits one (n, sum_z, sum_z2) triple per language. z values are
    half-integers (len integer, median on the 0.5 grid) so every
    product and sum is an EXACT double; the F closed form is driver
    flops on a #langs-bounded frame."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "n_chars"], as_index=False).agg(
            cnt=("n_chars", "size"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["lang", "n_chars"], as_index=False).agg(
            cnt=("cnt", "sum"))
        rows = []
        for lang, f in g.groupby("lang"):
            vals = f["n_chars"].to_numpy(np.float64)
            cnts = f["cnt"].to_numpy(np.int64)
            med = _hist_quantile_cont(vals, cnts, 0.5)
            z = np.abs(vals - med)
            rows.append((lang, int(cnts.sum()),
                         float(np.sum(cnts * z)),
                         float(np.sum(cnts * z * z))))
        return pd.DataFrame(rows, columns=["lang", "n", "sz", "sz2"])

    out = bucketed_combine(ds, "lang", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    schema = {"n_langs": "int64", "n_docs": "int64", "f_stat": "float64"}
    if out.empty or len(out) < 2:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("lang")
    n = out.n.to_numpy(np.float64)
    sz = out.sz.to_numpy(np.float64)
    sz2 = out.sz2.to_numpy(np.float64)
    k, nn = len(out), float(n.sum())
    zb = sz / n
    zbar = float(sz.sum()) / nn
    num = float(np.sum(n * (zb - zbar) ** 2))
    den = float(np.sum(sz2 - n * zb * zb))
    if den <= 0:
        return typed_out(pd.DataFrame(), schema)
    f_stat = ((nn - k) / (k - 1.0)) * num / den
    res = pd.DataFrame([{
        "n_langs": np.int64(k), "n_docs": np.int64(nn),
        "f_stat": round_away(np.float64(f_stat), 6) + 0.0,
    }])
    return typed_out(res, schema)


DOC_LENGTH_LEVENE_SQL = """
WITH m AS (
  SELECT lang, MEDIAN(n_chars) AS med FROM documents GROUP BY lang
), z AS (
  SELECT d.lang, ABS(d.n_chars - m.med) AS z
  FROM documents d JOIN m ON d.lang = m.lang
), g AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(z) AS sz, SUM(z * z) AS sz2
  FROM z GROUP BY lang
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         SUM(n * POWER(sz / n
             - (SELECT SUM(sz) FROM g) / (SELECT SUM(n) FROM g), 2))
           AS num,
         SUM(sz2 - n * (sz / n) * (sz / n)) AS den,
         CAST(COUNT(*) AS DOUBLE) AS kk, SUM(n) AS nn
  FROM g HAVING COUNT(*) >= 2
)
SELECT n_langs, n_docs,
       ROUND(((nn - kk) / (kk - 1.0)) * num / den, 6) AS f_stat
FROM agg WHERE den > 0
"""


def doc_length_cohens_d(sf_dir: str) -> pd.DataFrame:
    """Pairwise Cohen's d effect sizes for document length between every
    unordered language pair — the practical-significance companion to
    the ANOVA/Brown-Forsythe omnibus tests (an F-test on a web corpus
    is 'significant' at almost any real difference; d says whether the
    gap is 0.05 sd trivia or a 0.8 sd pipeline bug). Pooled-sd
    convention: sp^2 = ((n1-1)s1^2 + (n2-1)s2^2) / (n1+n2-2).

    Plan: one streaming pass of per-batch (lang, n, sum, sum2) integer
    moment partials (the doc_length_moments fold); all pair math is
    driver flops on a #langs-bounded frame with the same literal
    expressions as the oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        g = pd.DataFrame({"lang": df["lang"], "n": 1,
                          "s1": x, "s2": x * x})
        return g.groupby("lang", as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))

    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"lang_a": "object", "lang_b": "object", "n_a": "int64",
              "n_b": "int64", "mean_diff": "float64", "cohens_d": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    g = out.groupby("lang", as_index=False).agg(
        n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))
    g = g.sort_values("lang").reset_index(drop=True)
    rows = []
    for ia in range(len(g)):
        for ib in range(ia + 1, len(g)):
            a, b = g.iloc[ia], g.iloc[ib]
            na, nb = int(a.n), int(b.n)
            if na < 2 or nb < 2 or na + nb < 3:
                continue
            ma, mb = a.s1 / na, b.s1 / nb
            va = (a.s2 - na * ma * ma) / (na - 1.0)
            vb = (b.s2 - nb * mb * mb) / (nb - 1.0)
            sp2 = ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
            if sp2 <= 0:
                continue
            d = (ma - mb) / np.sqrt(sp2)
            rows.append((a.lang, b.lang, na, nb, ma - mb, d))
    if not rows:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame(rows, columns=["lang_a", "lang_b", "n_a", "n_b",
                                      "mean_diff", "cohens_d"])
    for c in ("mean_diff", "cohens_d"):
        res[c] = round_away(res[c].to_numpy(np.float64), 6) + 0.0
    return typed_out(res, schema, sort_by=["lang_a", "lang_b"])


DOC_LENGTH_COHENS_D_SQL = """
WITH g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s1,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY lang
), p AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         a.n AS na, b.n AS nb,
         a.s1 / CAST(a.n AS DOUBLE) AS ma,
         b.s1 / CAST(b.n AS DOUBLE) AS mb,
         (a.s2 - a.n * (a.s1 / CAST(a.n AS DOUBLE))
               * (a.s1 / CAST(a.n AS DOUBLE))) / (a.n - 1.0) AS va,
         (b.s2 - b.n * (b.s1 / CAST(b.n AS DOUBLE))
               * (b.s1 / CAST(b.n AS DOUBLE))) / (b.n - 1.0) AS vb
  FROM g a JOIN g b ON a.lang < b.lang
  WHERE a.n >= 2 AND b.n >= 2
), q AS (
  SELECT lang_a, lang_b, na, nb, ma - mb AS mean_diff,
         ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0) AS sp2
  FROM p
)
SELECT lang_a, lang_b, na AS n_a, nb AS n_b,
       ROUND(mean_diff, 6) AS mean_diff,
       ROUND(mean_diff / SQRT(sp2), 6) AS cohens_d
FROM q WHERE sp2 > 0 ORDER BY lang_a, lang_b
"""


def doc_length_trimmed_mean_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language 10%-trimmed and winsorized mean of document length
    — the robust location estimates between the mean (tail-dominated,
    ``doc_length_moments``) and the median (throws away 50% of the
    sample, ``doc_length_median_by_lang``): trim drops the k=floor(n/10)
    smallest and largest values; winsorize clamps them to the surviving
    extremes, so boilerplate stubs and concatenation monsters stop
    dragging the per-language length budget.

    Plan: the same VALUE-HISTOGRAM exchange as the exact median —
    per-batch (lang, n_chars, cnt) partials, a lang-bucketed combine
    sorts the bounded distinct-value grid and takes rank-interval
    overlaps off one cumulative count walk. All sums are integer
    (value x effective-count), so both means are exact rationals in
    doubles, matching the oracle's rank-filtered AVG bit-for-bit."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "n_chars"], as_index=False).agg(
            cnt=("n_chars", "size"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["lang", "n_chars"], as_index=False).agg(
            cnt=("cnt", "sum"))
        rows = []
        for lang, f in g.groupby("lang"):
            f = f.sort_values("n_chars", kind="mergesort")
            vals = f["n_chars"].to_numpy(np.int64)
            cnts = f["cnt"].to_numpy(np.int64)
            n = int(cnts.sum())
            k = n // 10
            cum = np.cumsum(cnts)
            prev = cum - cnts
            # effective count of each value inside rank window (k, n-k]
            eff = np.minimum(cum, n - k) - np.maximum(prev, k)
            eff = np.maximum(eff, 0)
            m = n - 2 * k
            tsum = int(np.sum(vals * eff))
            lo = int(vals[np.searchsorted(cum, k + 1)])
            hi = int(vals[np.searchsorted(cum, n - k)])
            wsum = tsum + k * lo + k * hi
            rows.append((lang, n, k, tsum / float(m), wsum / float(n)))
        return pd.DataFrame(rows, columns=["lang", "n_docs", "trim_k",
                                           "trimmed_mean",
                                           "winsorized_mean"])

    out = bucketed_combine(ds, "lang", partial, combine,
                           num_buckets=16, coalesce_blocks=4).to_pandas()
    schema = {"lang": "object", "n_docs": "int64", "trim_k": "int64",
              "trimmed_mean": "float64", "winsorized_mean": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out["trimmed_mean"] = round_away(
        out.trimmed_mean.to_numpy(np.float64), 6) + 0.0
    out["winsorized_mean"] = round_away(
        out.winsorized_mean.to_numpy(np.float64), 6) + 0.0
    return typed_out(out, schema, sort_by="lang")


DOC_LENGTH_TRIMMED_MEAN_SQL = """
WITH r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
), lim AS (
  SELECT lang,
         MAX(CASE WHEN rn = n // 10 + 1 THEN n_chars END) AS lo,
         MAX(CASE WHEN rn = n - n // 10 THEN n_chars END) AS hi
  FROM r GROUP BY lang
)
SELECT r.lang,
       CAST(MAX(r.n) AS BIGINT) AS n_docs,
       CAST(MAX(r.n) // 10 AS BIGINT) AS trim_k,
       ROUND(AVG(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                      THEN CAST(n_chars AS DOUBLE) END), 6)
           AS trimmed_mean,
       ROUND(AVG(CAST(CASE WHEN rn <= n // 10 THEN lim.lo
                           WHEN rn > n - n // 10 THEN lim.hi
                           ELSE n_chars END AS DOUBLE)), 6)
           AS winsorized_mean
FROM r JOIN lim ON lim.lang = r.lang
GROUP BY r.lang ORDER BY r.lang
"""


def doc_length_jarque_bera_by_lang(sf_dir: str) -> pd.DataFrame:
    """Jarque-Bera normality test of document length per language —
    skewness and excess kurtosis from one pass of raw power sums, and
    JB = n/6 (g1^2 + g2^2/4), the moment-based answer to "is this
    length distribution even roughly Gaussian, or do the tail-driven
    z-score filters downstream need a different null?" (the KS/MW
    operators compare LANGUAGES to each other; this tests each against
    normality itself).

    Plan: per-batch (lang, n, s1..s4) INT64 power-sum partials (length
    is a small int, s4 stays far below 2^53 at any tested SF; at
    larger scale the partial dtype widens to float with the same
    algebra) -> one lang-bounded fold; every central moment and the JB
    closed form are written as the oracle's literal expressions over
    the exact sums."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df.n_chars.to_numpy(np.int64)
        g = pd.DataFrame({"lang": df.lang, "n": 1, "s1": x, "s2": x * x,
                          "s3": x * x * x, "s4": x * x * x * x})
        return g.groupby("lang", as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"),
            s3=("s3", "sum"), s4=("s4", "sum"))

    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    schema = {"lang": "object", "n_docs": "int64", "skewness": "float64",
              "ex_kurtosis": "float64", "jb_stat": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    g = out.groupby("lang", as_index=False).agg(
        n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"),
        s3=("s3", "sum"), s4=("s4", "sum"))
    rows = []
    for r in g.itertuples(index=False):
        n = float(r.n)
        if r.n < 4:
            continue
        mu = r.s1 / n
        m2 = r.s2 / n - mu * mu
        if m2 <= 0:
            continue
        m3 = r.s3 / n - 3 * mu * (r.s2 / n) + 2 * mu * mu * mu
        m4 = (r.s4 / n - 4 * mu * (r.s3 / n) + 6 * mu * mu * (r.s2 / n)
              - 3 * mu * mu * mu * mu)
        skew = m3 / m2 ** 1.5
        exk = m4 / (m2 * m2) - 3
        jb = n / 6.0 * (skew ** 2 + exk ** 2 / 4.0)
        rows.append((r.lang, np.int64(r.n),
                     round_away(np.float64(skew), 6) + 0.0,
                     round_away(np.float64(exk), 6) + 0.0,
                     round_away(np.float64(jb), 6) + 0.0))
    res = pd.DataFrame(rows, columns=list(schema))
    return typed_out(res, schema, sort_by="lang")


DOC_LENGTH_JARQUE_BERA_SQL = """
WITH s AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS nn,
         SUM(CAST(n_chars AS DOUBLE)) AS s1,
         SUM(CAST(n_chars AS DOUBLE) * n_chars) AS s2,
         SUM(CAST(n_chars AS DOUBLE) * n_chars * n_chars) AS s3,
         SUM(CAST(n_chars AS DOUBLE) * n_chars * n_chars * n_chars) AS s4
  FROM documents GROUP BY lang
), m AS (
  SELECT lang, n, nn, s1 / n AS mu, s2, s3, s4 FROM s
), cm AS (
  SELECT lang, n, nn,
         s2 / n - mu * mu AS m2,
         s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu AS m3,
         s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
             - 3 * mu * mu * mu * mu AS m4
  FROM m
)
SELECT lang, CAST(nn AS BIGINT) AS n_docs,
       ROUND(m3 / POWER(m2, 1.5), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3, 6) AS ex_kurtosis,
       ROUND(n / 6.0 * (POWER(m3 / POWER(m2, 1.5), 2)
             + POWER(m4 / (m2 * m2) - 3, 2) / 4.0), 6) AS jb_stat
FROM cm WHERE m2 > 0 AND nn >= 4 ORDER BY lang
"""


def quality_classifier_ks(sf_dir: str) -> pd.DataFrame:
    """Kolmogorov-Smirnov separation of the quality classifier — the
    max gap between the positive-class and negative-class score CDFs,
    and the score where it opens (the classic single-number "how
    separable are the classes" readout; AUC integrates the whole
    curve, KS names the best operating threshold). Ties on the gap
    break to the LOWEST score on both sides.

    Plan: the same per-score (n_pos, n_neg) count-grid exchange as the
    ROC AUC operator (scores are rounded to 6 decimals, so the grid is
    hard-bounded at ~1e6 cells regardless of corpus size); both CDFs
    are exact integer-cumsum / total divisions, and the max walk is
    one vectorized pass over the grid."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    class _KsPartial(QualityClassifier):
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            scored = super().__call__(df)
            truth = scored.doc_id.to_numpy(np.int64) % 10 < 7
            g = pd.DataFrame({"score": scored.quality_score,
                              "p": truth.astype(np.int64),
                              "q": (~truth).astype(np.int64)})
            return g.groupby("score", as_index=False).sum()

    out = ds.map_batches(_KsPartial, batch_format="pandas",
                         concurrency=2).to_pandas()
    schema = {"n_pos": "int64", "n_neg": "int64", "ks_stat": "float64",
              "ks_score": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    m = out.groupby("score", as_index=False).sum().sort_values("score")
    p = m.p.to_numpy(np.int64)
    q = m.q.to_numpy(np.int64)
    n_pos, n_neg = int(p.sum()), int(q.sum())
    if n_pos == 0 or n_neg == 0:
        return typed_out(pd.DataFrame(), schema)
    d = np.abs(np.cumsum(p) / float(n_pos) - np.cumsum(q) / float(n_neg))
    i = int(np.argmax(d))  # first max = lowest score
    res = pd.DataFrame([{
        "n_pos": np.int64(n_pos), "n_neg": np.int64(n_neg),
        "ks_stat": round_away(np.float64(d[i]), 6) + 0.0,
        "ks_score": np.float64(m.score.to_numpy(np.float64)[i]),
    }])
    return typed_out(res, schema)


QUALITY_CLASSIFIER_KS_SQL = """
WITH t AS (
  SELECT doc_id,
         COALESCE(text, '') AS txt,
         string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, w -> w IN
             ('the','a','of','and','to','in','is','that','it','for')))
             AS DOUBLE) AS n_stop,
         CAST(length(txt) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM t
), s AS (
  SELECT ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.45 * ln(n_tok + 1.0)
               + 6.0 * (n_stop / n_tok)
               + 1.5 * (n_alpha / (n_chars + 1.0))
               + 0.05 * (n_chars / n_tok)))), 6) AS score,
         (doc_id % 10 < 7) AS truth
  FROM f
), g AS (
  SELECT score,
         CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(CASE WHEN NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS q
  FROM s GROUP BY 1
), tot AS (
  SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(q) AS BIGINT) AS nq
  FROM g
), w AS (
  SELECT score,
         ABS(SUM(p) OVER (ORDER BY score) / CAST(tot.np AS DOUBLE)
             - SUM(q) OVER (ORDER BY score) / CAST(tot.nq AS DOUBLE))
             AS d,
         tot.np, tot.nq
  FROM g CROSS JOIN tot
  WHERE tot.np > 0 AND tot.nq > 0
)
SELECT np AS n_pos, nq AS n_neg,
       ROUND(d, 6) AS ks_stat,
       score AS ks_score
FROM w ORDER BY d DESC, score LIMIT 1
"""


def corpus_token_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of the corpus token-frequency distribution —
    the vocabulary-concentration number (0 = every token equally
    common, ->1 = a few tokens dominate) that complements the Zipf
    slope (a FIT, assumes power law) and the token entropy (in nats,
    scale-coupled): Gini is unit-free and exact, the one to trend
    across corpus snapshots when deciding if dedup/boilerplate removal
    actually diversified the text.

    Plan: the same token-hash-bucketed count exchange as
    ``token_topk``; the merged (token, count) table is VOCABULARY-
    bounded, sorts once ascending (count, token), and the Gini sum
    stays INTEGER until the single final division — bit-exact parity
    with the oracle's rank formula by construction."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.list_flatten(
            pc.split_pattern(pc.coalesce(t.column("text"), ""), " "))
        vc = toks.value_counts()
        return pd.DataFrame({
            "token": vc.field("values").to_pandas().to_numpy(object),
            "n": vc.field("counts").to_numpy(
                zero_copy_only=False).astype(np.int64),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(n=("n", "sum"))

    out = bucketed_combine(ds, "token", partial, combine,
                           partial_format="pyarrow").to_pandas()
    schema = {"vocab_size": "int64", "total_tokens": "int64",
              "gini": "float64", "top_share": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    m = (out.groupby("token", as_index=False).agg(n=("n", "sum"))
         .sort_values(["n", "token"], kind="mergesort"))
    c = m.n.to_numpy(np.int64)
    v = len(c)
    t = int(c.sum())
    if t == 0:
        return typed_out(pd.DataFrame(), schema)
    rn = np.arange(1, v + 1, dtype=np.int64)
    num = int(np.sum((2 * rn - v - 1) * c))
    res = pd.DataFrame([{
        "vocab_size": np.int64(v), "total_tokens": np.int64(t),
        "gini": round_away(np.float64(num / (float(v) * t)), 6) + 0.0,
        "top_share": round_away(np.float64(int(c.max()) / float(t)), 6)
            + 0.0,
    }])
    return typed_out(res, schema)


CORPUS_TOKEN_GINI_SQL = """
WITH c AS (
  SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok
    FROM documents
  )
  GROUP BY tok
), r AS (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n, token) AS rn,
         COUNT(*) OVER () AS v,
         SUM(n) OVER () AS t
  FROM c
)
SELECT CAST(MAX(v) AS BIGINT) AS vocab_size,
       CAST(MAX(t) AS BIGINT) AS total_tokens,
       ROUND(SUM((2 * rn - v - 1) * n)
             / (CAST(MAX(v) AS DOUBLE) * MAX(t)), 6) AS gini,
       ROUND(CAST(MAX(n) AS DOUBLE) / MAX(t), 6) AS top_share
FROM r HAVING COUNT(*) > 0 AND MAX(t) > 0
"""


def token_burstiness(sf_dir: str) -> pd.DataFrame:
    """Church-Gale burstiness audit per token: corpus frequency cf,
    document frequency df, mean count when present (cf/df) and the
    Fisher dispersion index var/mean over ALL docs (zeros included).
    Function words sit near dispersion 1 (Poisson); topical/boilerplate
    tokens burst (>>1) — the statistic that separates "frequent because
    everywhere" from "frequent because duplicated", which idf alone
    cannot (both get the same df).

    Plan: per-batch (token, sum c, sum c^2, df) partials — already
    vocabulary-bounded per batch because the (doc, token) counts
    collapse before leaving it — then the token-bucketed combine sums
    integers; N comes from one metadata-only count. All moments stay
    INTEGER until the final divisions, written as the oracle's literal
    expressions."""
    from ..functions.shuffle import bucketed_combine

    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        d = pd.DataFrame({
            "d": np.repeat(np.arange(len(lens), dtype=np.int64), lens),
            "token": flat.to_pandas().to_numpy(object),
        })
        c = d.groupby(["d", "token"], sort=False, as_index=False).size()
        cc = c["size"].to_numpy(np.int64)
        g = pd.DataFrame({"token": c.token.to_numpy(object),
                          "cf": cc, "s2": cc * cc,
                          "df": np.ones(len(cc), np.int64)})
        return g.groupby("token", as_index=False).agg(
            cf=("cf", "sum"), s2=("s2", "sum"), df=("df", "sum"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("token", as_index=False).agg(
            cf=("cf", "sum"), s2=("s2", "sum"), df=("df", "sum"))
        nn = float(n_docs)
        cf = m.cf.to_numpy(np.int64)
        s2 = m.s2.to_numpy(np.int64)
        mu = cf / nn
        disp = (s2 / nn - mu * mu) / mu
        return pd.DataFrame({
            "token": m.token.to_numpy(object),
            "cf": cf, "df": m["df"].to_numpy(np.int64),
            "dispersion": round_away(disp, 6) + 0.0,
            "mean_when_present": round_away(
                cf / m["df"].to_numpy(np.int64).astype(np.float64), 6)
                + 0.0,
        })

    out = bucketed_combine(ds, "token", partial, combine,
                           partial_format="pyarrow").to_pandas()
    schema = {"token": "object", "cf": "int64", "df": "int64",
              "dispersion": "float64", "mean_when_present": "float64"}
    return typed_out(out, schema, sort_by="token")


TOKEN_BURSTINESS_SQL = """
WITH docs AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
  FROM documents
), n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM docs
), tc AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
  GROUP BY doc_id, tok
), agg AS (
  SELECT tok AS token,
         CAST(SUM(c) AS BIGINT) AS cf,
         CAST(SUM(c * c) AS BIGINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM tc GROUP BY tok
)
SELECT token, cf, df,
       ROUND((s2 / nn - (cf / nn) * (cf / nn)) / (cf / nn), 6)
           AS dispersion,
       ROUND(CAST(cf AS DOUBLE) / df, 6) AS mean_when_present
FROM agg, n
ORDER BY token
"""


def doc_length_ks_pairs_bh(sf_dir: str) -> pd.DataFrame:
    """All pairwise two-sample KS tests across languages WITH
    Benjamini-Hochberg FDR control — the multiple-testing layer every
    corpus-audit dashboard needs and no single-test operator provides:
    at 10+ simultaneous pair tests, raw p<0.05 readings are expected
    false alarms; the BH q-value is the number a rebalance decision can
    actually gate on. p comes from the asymptotic Kolmogorov series
    2*sum_k (-1)^(k-1) exp(-2 k^2 lambda^2) (k<=100, both sides use the
    same truncation) with Stephens' small-sample lambda correction.

    Plan: the doc_length_ks_by_lang count fold verbatim (lang x length
    domain bounded); D, p, and the BH suffix-min all happen on the
    pair-bounded driver frame in the oracle's exact expression order."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.dropna(subset=["lang"]).groupby(
            ["lang", "n_chars"], as_index=False).agg(n=("n_chars", "size"))
        return g.rename(columns={"n_chars": "x"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "x"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lang_a": "object", "lang_b": "object", "ks_stat": "float64",
              "p_value": "float64", "q_value": "float64"}
    if counts.empty or counts.lang.nunique() < 2:
        return typed_out(pd.DataFrame(), schema)
    langs = np.sort(counts.lang.unique())
    grid = np.sort(counts.x.unique())
    mat = np.zeros((len(langs), len(grid)), dtype=np.int64)
    li = pd.Series(range(len(langs)), index=langs)
    gi = pd.Series(range(len(grid)), index=grid)
    mat[li.loc[counts.lang].to_numpy(), gi.loc[counts.x].to_numpy()] = (
        counts.n.to_numpy(np.int64))
    tot = mat.sum(axis=1)
    cum = np.cumsum(mat, axis=1).astype(np.float64)
    ecdf = cum / tot[:, None].astype(np.float64)
    kk = np.arange(1, 101, dtype=np.float64)
    sgn = np.where(np.arange(1, 101) % 2 == 1, 1.0, -1.0)
    rows = []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            d = float(np.max(np.abs(ecdf[i] - ecdf[j])))
            ne = (int(tot[i]) * int(tot[j])) / float(tot[i] + tot[j])
            lam = (np.sqrt(ne) + 0.12 + 0.11 / np.sqrt(ne)) * d
            p = 2.0 * float(np.sum(sgn * np.exp(-2.0 * kk * kk
                                                * lam * lam)))
            p = min(1.0, max(0.0, p))
            rows.append((langs[i], langs[j], d, p))
    out = pd.DataFrame(rows, columns=["lang_a", "lang_b", "d", "p"])
    out = out.sort_values(["p", "lang_a", "lang_b"],
                          kind="mergesort").reset_index(drop=True)
    m = float(len(out))
    vals = out.p.to_numpy(np.float64) * m / np.arange(1, len(out) + 1,
                                                      dtype=np.float64)
    q = np.minimum(np.minimum.accumulate(vals[::-1])[::-1], 1.0)
    res = pd.DataFrame({
        "lang_a": out.lang_a.to_numpy(object),
        "lang_b": out.lang_b.to_numpy(object),
        "ks_stat": round_away(out.d.to_numpy(np.float64), 6) + 0.0,
        "p_value": round_away(out.p.to_numpy(np.float64), 6) + 0.0,
        "q_value": round_away(q, 6) + 0.0,
    })
    return typed_out(res, schema, sort_by=["lang_a", "lang_b"])


DOC_LENGTH_KS_BH_SQL = """
WITH counts AS (
  SELECT lang, n_chars AS x, COUNT(*) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
),
langs AS (SELECT DISTINCT lang FROM counts),
grid AS (SELECT DISTINCT x FROM counts),
lg AS (SELECT l.lang, g.x FROM langs l CROSS JOIN grid g),
cum AS (
  SELECT lg.lang, lg.x,
         CAST(SUM(COALESCE(c.n, 0))
              OVER (PARTITION BY lg.lang ORDER BY lg.x) AS DOUBLE)
           / SUM(COALESCE(c.n, 0)) OVER (PARTITION BY lg.lang) AS f,
         SUM(COALESCE(c.n, 0)) OVER (PARTITION BY lg.lang) AS nt
  FROM lg LEFT JOIN counts c ON c.lang = lg.lang AND c.x = lg.x
),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         MAX(ABS(a.f - b.f)) AS d,
         (MAX(a.nt) * MAX(b.nt)) / CAST(MAX(a.nt) + MAX(b.nt) AS DOUBLE)
             AS ne
  FROM cum a JOIN cum b ON b.x = a.x AND a.lang < b.lang
  GROUP BY 1, 2
),
lamb AS (
  SELECT lang_a, lang_b, d,
         (SQRT(ne) + 0.12 + 0.11 / SQRT(ne)) * d AS lam
  FROM pairs
),
pv AS (
  SELECT lang_a, lang_b, d,
         LEAST(1.0, GREATEST(0.0, 2.0 * (
             SELECT SUM(CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
                        * EXP(-2.0 * k * k * lamb.lam * lamb.lam))
             FROM (SELECT UNNEST(range(1, 101)) AS k)))) AS p
  FROM lamb
),
rk AS (
  SELECT lang_a, lang_b, d, p,
         ROW_NUMBER() OVER (ORDER BY p, lang_a, lang_b) AS i,
         COUNT(*) OVER () AS m
  FROM pv
),
bh AS (
  SELECT lang_a, lang_b, d, p,
         LEAST(1.0, MIN(p * m / i)
             OVER (ORDER BY i DESC ROWS UNBOUNDED PRECEDING)) AS q
  FROM rk
)
SELECT lang_a, lang_b,
       ROUND(d, 6) AS ks_stat,
       ROUND(p, 6) AS p_value,
       ROUND(q, 6) AS q_value
FROM bh ORDER BY lang_a, lang_b
"""


def lang_length_shrinkage(sf_dir: str) -> pd.DataFrame:
    """Empirical-Bayes (James-Stein) shrinkage of per-language mean
    document length — the partial-pooling family: a 60-doc language's
    raw mean is mostly noise, a 20k-doc one's is solid, and the
    shrinkage weight w = tau^2/(tau^2 + sigma^2/n) encodes exactly
    that, pulling small groups toward the pooled mean (and pulling
    EVERYTHING to the pool when the between-group moment estimator
    says the apparent spread is pure sampling noise — the tau^2 = 0
    corner is the estimator working, exercised by the sf0.001 corpus).
    This is what a per-key dashboard should plot instead of raw group
    means, and the method-of-moments tau^2 makes it closed-form.

    Plan: one (lang, n, sum x, sum x^2) moment fold (lang-bounded);
    grand mean, pooled within-variance, and the between-group moment
    estimator are driver flops in the oracle's literal expression
    order."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df.n_chars.to_numpy(np.int64)
        g = pd.DataFrame({"lang": df.lang,
                          "n": np.ones(len(df), np.int64),
                          "sx": x, "sxx": x * x})
        return g.groupby("lang", as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxx", alias_name="sxx"))
        .to_pandas()
    )
    schema = {"lang": "object", "n_docs": "int64", "raw_mean": "float64",
              "shrink_weight": "float64", "shrunk_mean": "float64"}
    k = len(out)
    nn = int(out.n.sum()) if k else 0
    if k < 2 or nn <= k:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("lang", kind="mergesort")
    n = out.n.to_numpy(np.int64).astype(np.float64)
    sx = out.sx.to_numpy(np.int64).astype(np.float64)
    sxx = out.sxx.to_numpy(np.int64).astype(np.float64)
    xbar = sx / n
    sigma2 = float(np.sum(sxx - sx * sx / n)) / (nn - k)
    gbar = float(np.sum(xbar)) / k
    s_between = float(np.sum((xbar - gbar) * (xbar - gbar))) / (k - 1)
    tau2 = max(0.0, s_between - sigma2 * (float(np.sum(1.0 / n)) / k))
    w = tau2 / (tau2 + sigma2 / n)
    res = pd.DataFrame({
        "lang": out.lang.to_numpy(object),
        "n_docs": out.n.to_numpy(np.int64),
        "raw_mean": round_away(xbar, 6) + 0.0,
        "shrink_weight": round_away(w, 6) + 0.0,
        "shrunk_mean": round_away(w * xbar + (1.0 - w) * gbar, 6) + 0.0,
    })
    return typed_out(res, schema, sort_by="lang")


LANG_LENGTH_SHRINKAGE_SQL = """
WITH g AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(n_chars) AS DOUBLE) AS sx,
         CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sxx
  FROM documents GROUP BY 1
), dims AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n) AS nn,
         SUM(sxx - sx * sx / n) / (SUM(n) - COUNT(*)) AS sigma2,
         SUM(sx / n) / COUNT(*) AS gbar,
         SUM(1.0 / n) / COUNT(*) AS mharm
  FROM g HAVING COUNT(*) >= 2 AND SUM(n) > COUNT(*)
), tau AS (
  SELECT k, sigma2, gbar,
         GREATEST(0.0,
             (SELECT SUM((sx / n - dims.gbar) * (sx / n - dims.gbar))
              FROM g) / (k - 1)
             - sigma2 * mharm) AS tau2
  FROM dims
)
SELECT g.lang,
       CAST(g.n AS BIGINT) AS n_docs,
       ROUND(g.sx / g.n, 6) AS raw_mean,
       ROUND(tau.tau2 / (tau.tau2 + tau.sigma2 / g.n), 6)
           AS shrink_weight,
       ROUND((tau.tau2 / (tau.tau2 + tau.sigma2 / g.n)) * (g.sx / g.n)
             + (1.0 - tau.tau2 / (tau.tau2 + tau.sigma2 / g.n))
               * tau.gbar, 6) AS shrunk_mean
FROM g, tau ORDER BY g.lang
"""


def doc_length_ad_ksample(sf_dir: str) -> pd.DataFrame:
    """k-sample Anderson-Darling test (Scholz-Stephens 1987, midrank
    ties version — scipy's anderson_ksamp) on document length across
    languages: the TAIL-SENSITIVE member of the test family. KS weights
    every ECDF gap equally, so two corpora that differ only in their
    long-document tails look identical to it; AD divides by
    B(N-B) and blows the tails up exactly where length-filter policy
    decisions live. Reports A2 and the standardized T_k whose null
    variance is the published (a N^3 + b N^2 + c N + d) polynomial.

    Plan: the KS/MW (lang, length) count-matrix fold; every per-sample
    inner sum is one vectorized pass over the pooled grid, and the
    O(N^2) double-harmonic constant g collapses to one O(N) cumsum via
    g = sum_i (H_{N-1} - H_i)/(N - i). Nothing scales with documents."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.dropna(subset=["lang"]).groupby(
            ["lang", "n_chars"], as_index=False).agg(n=("n_chars", "size"))
        return g.rename(columns={"n_chars": "x"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "x"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"n_total": "int64", "k_samples": "int64",
              "a2_stat": "float64", "t_stat": "float64"}
    if counts.empty or counts.lang.nunique() < 2:
        return typed_out(pd.DataFrame(), schema)
    langs = np.sort(counts.lang.unique())
    grid = np.sort(counts.x.unique())
    if len(grid) < 2:
        return typed_out(pd.DataFrame(), schema)
    mat = np.zeros((len(langs), len(grid)), dtype=np.float64)
    li = pd.Series(range(len(langs)), index=langs)
    gi = pd.Series(range(len(grid)), index=grid)
    mat[li.loc[counts.lang].to_numpy(), gi.loc[counts.x].to_numpy()] = (
        counts.n.to_numpy(np.int64))
    h = mat.sum(axis=0)                       # pooled count per value
    nj = mat.sum(axis=1)                      # per-sample sizes
    nn = float(h.sum())
    k = float(len(langs))
    bb = np.cumsum(h) - h / 2.0               # midrank pooled cum
    mm = np.cumsum(mat, axis=1) - mat / 2.0   # midrank per-sample cum
    denom = bb * (nn - bb) - nn * h / 4.0
    a2 = 0.0
    for j in range(len(langs)):
        inner = (h / nn) * (nn * mm[j] - bb * nj[j]) ** 2 / denom
        a2 += float(inner.sum()) / nj[j]
    a2 *= (nn - 1.0) / nn
    # null moments (Scholz-Stephens eq. 7)
    ni = int(nn)
    inv = 1.0 / np.arange(1, ni, dtype=np.float64)       # 1/1..1/(N-1)
    hh = float(inv.sum())
    hcum = np.cumsum(inv)                                 # H_1..H_{N-1}
    i_ = np.arange(1, ni - 1, dtype=np.float64)           # i = 1..N-2
    g = float(np.sum((hcum[-1] - hcum[: ni - 2]) / (nn - i_)))
    hs = float(np.sum(1.0 / nj))
    a = (4.0 * g - 6.0) * (k - 1.0) + (10.0 - 6.0 * g) * hs
    b = ((2.0 * g - 4.0) * k * k + 8.0 * hh * k
         + (2.0 * g - 14.0 * hh - 4.0) * hs - 8.0 * hh + 4.0 * g - 6.0)
    c = ((6.0 * hh + 2.0 * g - 2.0) * k * k
         + (4.0 * hh - 4.0 * g + 6.0) * k + (2.0 * hh - 6.0) * hs
         + 4.0 * hh)
    d = (2.0 * hh + 6.0) * k * k - 4.0 * hh * k
    var = ((a * nn ** 3 + b * nn ** 2 + c * nn + d)
           / ((nn - 1.0) * (nn - 2.0) * (nn - 3.0)))
    if var <= 0:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame([{
        "n_total": np.int64(nn), "k_samples": np.int64(k),
        "a2_stat": round_away(np.float64(a2), 6) + 0.0,
        "t_stat": round_away(np.float64(
            (a2 - (k - 1.0)) / np.sqrt(var)), 6) + 0.0,
    }])
    return typed_out(res, schema)


DOC_LENGTH_AD_KSAMPLE_SQL = """
WITH counts AS (
  SELECT lang, n_chars AS x, CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
),
langs AS (SELECT DISTINCT lang FROM counts),
grid AS (SELECT DISTINCT x FROM counts),
lg AS (SELECT l.lang, g.x FROM langs l CROSS JOIN grid g),
cells AS (
  SELECT lg.lang, lg.x, COALESCE(c.n, 0) AS n
  FROM lg LEFT JOIN counts c ON c.lang = lg.lang AND c.x = lg.x
),
pool AS (
  SELECT x, SUM(n) AS h FROM cells GROUP BY x
),
pcum AS (
  SELECT x, h, SUM(h) OVER (ORDER BY x) - h / 2.0 AS bb,
         SUM(h) OVER () AS nn
  FROM pool
),
scum AS (
  SELECT lang, x, n,
         SUM(n) OVER (PARTITION BY lang ORDER BY x) - n / 2.0 AS mm,
         SUM(n) OVER (PARTITION BY lang) AS nj
  FROM cells
),
inner_sum AS (
  SELECT s.lang, MAX(s.nj) AS nj,
         SUM((p.h / p.nn) * (p.nn * s.mm - p.bb * s.nj)
             * (p.nn * s.mm - p.bb * s.nj)
             / (p.bb * (p.nn - p.bb) - p.nn * p.h / 4.0)) AS isum
  FROM scum s JOIN pcum p ON p.x = s.x
  GROUP BY s.lang
),
a2 AS (
  SELECT SUM(isum / nj) * (MAX(p.nn) - 1.0) / MAX(p.nn) AS a2,
         MAX(p.nn) AS nn,
         CAST(COUNT(*) AS DOUBLE) AS k,
         SUM(1.0 / nj) AS hs
  FROM inner_sum, (SELECT MAX(nn) AS nn FROM pcum) p
  HAVING COUNT(*) >= 2 AND (SELECT COUNT(*) FROM grid) >= 2
),
harm AS (
  SELECT SUM(1.0 / i) AS hh
  FROM (SELECT UNNEST(range(1, CAST((SELECT nn FROM a2) AS BIGINT))) AS i)
),
gsum AS (
  SELECT SUM((hl - hc) / (nn - i)) AS g
  FROM (
    SELECT CAST(t.i AS DOUBLE) AS i,
           SUM(1.0 / t.i) OVER (ORDER BY t.i) AS hc,
           (SELECT SUM(1.0 / u.i) FROM
              (SELECT UNNEST(range(1,
                   CAST((SELECT nn FROM a2) AS BIGINT))) AS i) u) AS hl,
           (SELECT nn FROM a2) AS nn
    FROM (SELECT UNNEST(range(1, CAST((SELECT nn FROM a2) AS BIGINT))) AS i) t
  ) WHERE i <= nn - 2.0
),
std AS (
  SELECT a2.a2, a2.nn, a2.k,
         ((4.0 * g.g - 6.0) * (a2.k - 1.0)
          + (10.0 - 6.0 * g.g) * a2.hs) * a2.nn * a2.nn * a2.nn
         + ((2.0 * g.g - 4.0) * a2.k * a2.k + 8.0 * h.hh * a2.k
            + (2.0 * g.g - 14.0 * h.hh - 4.0) * a2.hs - 8.0 * h.hh
            + 4.0 * g.g - 6.0) * a2.nn * a2.nn
         + ((6.0 * h.hh + 2.0 * g.g - 2.0) * a2.k * a2.k
            + (4.0 * h.hh - 4.0 * g.g + 6.0) * a2.k
            + (2.0 * h.hh - 6.0) * a2.hs + 4.0 * h.hh) * a2.nn
         + ((2.0 * h.hh + 6.0) * a2.k * a2.k - 4.0 * h.hh * a2.k) AS num,
         (a2.nn - 1.0) * (a2.nn - 2.0) * (a2.nn - 3.0) AS den
  FROM a2, harm h, gsum g
)
SELECT CAST(nn AS BIGINT) AS n_total, CAST(k AS BIGINT) AS k_samples,
       ROUND(a2, 6) AS a2_stat,
       ROUND((a2 - (k - 1.0)) / SQRT(num / den), 6) AS t_stat
FROM std WHERE num / den > 0
"""


def doc_vocab_partial_corr(sf_dir: str) -> pd.DataFrame:
    """Partial correlation of per-document DISTINCT tokens and
    character length, CONTROLLING for total token count — the
    conditional-dependence member of the correlation family, and a
    live deconfounding demo on this corpus: raw r(vocab, chars) ~ 0.91
    is pure length confounding and collapses to ~0.04 once token count
    is partialled out (r_xy.z = (r_xy - r_xz r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2))). The question it answers for curation:
    does vocabulary richness carry ANY signal beyond length, or is a
    richness filter just a length filter in disguise?

    Plan: one batch pass derives (x, y, z) per doc from zero-copy Arrow
    kernels, folds the full 3-variable second-moment vector, and the
    driver evaluates the closed forms — one row on the wire per
    batch."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "n_chars"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        z = lens.astype(np.float64)
        # distinct tokens per doc, token_stats_batch style: dictionary
        # codes packed with the doc index -> one np.unique, no row loop
        codes = pc.list_flatten(toks).dictionary_encode().combine_chunks()
        code_np = codes.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        packed = np.unique((doc_idx << 32) | code_np)
        xx = np.bincount(packed >> 32,
                         minlength=len(lens)).astype(np.float64)
        y = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pd.DataFrame([{
            "g": np.int64(0), "n": np.int64(len(y)),
            "sx": float(xx.sum()), "sy": float(y.sum()),
            "sz": float(z.sum()),
            "sxx": float((xx * xx).sum()), "syy": float((y * y).sum()),
            "szz": float((z * z).sum()),
            "sxy": float((xx * y).sum()), "sxz": float((xx * z).sum()),
            "syz": float((y * z).sum()),
        }])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(*[Sum(c, alias_name=c) for c in
                     ["n", "sx", "sy", "sz", "sxx", "syy", "szz",
                      "sxy", "sxz", "syz"]])
        .to_pandas()
    )
    schema = {"n_docs": "int64", "r_vocab_chars": "float64",
              "r_partial_given_tokens": "float64"}
    if agg.empty or int(agg.n[0]) < 3:
        return typed_out(pd.DataFrame(), schema)
    n = float(agg.n[0])
    a = {c: float(agg[c][0]) for c in agg.columns}

    def corr(sa, sb, saa, sbb, sab):
        return ((n * sab - sa * sb)
                / np.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)))

    rxy = corr(a["sx"], a["sy"], a["sxx"], a["syy"], a["sxy"])
    rxz = corr(a["sx"], a["sz"], a["sxx"], a["szz"], a["sxz"])
    ryz = corr(a["sy"], a["sz"], a["syy"], a["szz"], a["syz"])
    den = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    if den <= 0:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame([{
        "n_docs": np.int64(n),
        "r_vocab_chars": round_away(np.float64(rxy), 4) + 0.0,
        "r_partial_given_tokens": round_away(np.float64(
            (rxy - rxz * ryz) / np.sqrt(den)), 4) + 0.0,
    }])
    return typed_out(res, schema)


DOC_VOCAB_PARTIAL_CORR_SQL = """
WITH v AS (
  SELECT CAST(len(list_distinct(
             string_split(COALESCE(text, ''), ' '))) AS DOUBLE) AS x,
         CAST(n_chars AS DOUBLE) AS y,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS DOUBLE) AS z
  FROM documents
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
         SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz
  FROM v HAVING COUNT(*) >= 3
), r AS (
  SELECT n,
         (n * sxy - sx * sy)
           / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
         (n * sxz - sx * sz)
           / SQRT((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
         (n * syz - sy * sz)
           / SQRT((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
  FROM m
)
SELECT CAST(n AS BIGINT) AS n_docs,
       ROUND(rxy, 4) AS r_vocab_chars,
       ROUND((rxy - rxz * ryz)
             / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 4)
           AS r_partial_given_tokens
FROM r WHERE (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0
"""


# ---------------------------------------------------------------------------
# doc_vocab_cmh: Cochran-Mantel-Haenszel stratified association
# ---------------------------------------------------------------------------

def doc_vocab_cmh(sf_dir: str) -> pd.DataFrame:
    """Cochran-Mantel-Haenszel test of the (long doc) x (rich vocab)
    association STRATIFIED by language, plus the Mantel-Haenszel common
    odds ratio — the categorical sibling of doc_vocab_partial_corr:
    chi2 independence asks the marginal question, CMH asks whether the
    association survives inside every language stratum (Simpson's-
    paradox-proof), and the MH odds ratio is its effect size. Exposure
    x = n_chars above the corpus mean, outcome y = distinct tokens
    above the corpus mean.

    Plan: pass 1 folds the two global means (exact integer sums);
    pass 2 folds the (lang, x, y, n) cell grid — 5x2x2 cells on the
    wire; the CMH sums are per-stratum closed forms on the driver,
    written as the oracle's literal expressions."""
    from ray.data.aggregate import Sum

    def doc_stats(t):
        import pyarrow.compute as pc

        toks = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64),
                            lens.astype(np.int64))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        codes = flat.dictionary_encode().combine_chunks()
        code_np = codes.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        packed = np.unique((doc_idx[keep] << 32) | code_np[keep])
        vocab = np.bincount(packed >> 32,
                            minlength=len(lens)).astype(np.int64)
        chars = t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return vocab, chars

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text", "n_chars"])

    def mean_partial(t) -> pd.DataFrame:
        vocab, chars = doc_stats(t)
        return pd.DataFrame([{
            "g": np.int64(0), "n": np.int64(len(chars)),
            "sc": np.int64(chars.sum()), "sv": np.int64(vocab.sum())}])

    m = (ds.map_batches(mean_partial, batch_format="pyarrow")
         .groupby("g")
         .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"),
                    Sum("sv", alias_name="sv"))
         .to_pandas())
    schema = {"n_strata": "int64", "n_docs": "int64",
              "cmh_num": "float64", "cmh_var": "float64",
              "cmh_chi2": "float64", "mh_odds_ratio": "float64"}
    if m.empty or int(m.n[0]) == 0:
        return typed_out(pd.DataFrame(), schema)
    nd = float(m.n[0])
    mx = float(m.sc[0]) / nd
    my = float(m.sv[0]) / nd

    def cell_partial(t) -> pd.DataFrame:
        vocab, chars = doc_stats(t)
        import pyarrow as pa
        langs = t.column("lang").to_pandas().fillna("")
        g = pd.DataFrame({
            "lang": langs,
            "x": (chars.astype(np.float64) > mx).astype(np.int64),
            "y": (vocab.astype(np.float64) > my).astype(np.int64),
            "one": np.ones(len(chars), np.int64)})
        return g.groupby(["lang", "x", "y"], as_index=False).agg(
            n=("one", "sum"))

    cells = (ds.map_batches(cell_partial, batch_format="pyarrow")
             .groupby(["lang", "x", "y"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    if cells.empty:
        return typed_out(pd.DataFrame(), schema)
    num = var = ra = rb = 0.0
    n_strata = 0
    for lang, g in cells.groupby("lang"):
        tab = np.zeros((2, 2), np.float64)
        tab[g.x.to_numpy(np.int64), g.y.to_numpy(np.int64)] = (
            g.n.to_numpy(np.int64))
        a, b = tab[1, 1], tab[1, 0]
        c, d = tab[0, 1], tab[0, 0]
        ni = a + b + c + d
        if ni <= 1:
            continue
        n_strata += 1
        num += a - (a + b) * (a + c) / ni
        var += ((a + b) * (c + d) * (a + c) * (b + d)
                / (ni * ni * (ni - 1.0)))
        ra += a * d / ni
        rb += b * c / ni
    if var <= 0 or rb <= 0:
        return typed_out(pd.DataFrame(), schema)
    res = pd.DataFrame([{
        "n_strata": np.int64(n_strata), "n_docs": np.int64(nd),
        "cmh_num": round_away(np.float64(num), 6) + 0.0,
        "cmh_var": round_away(np.float64(var), 6) + 0.0,
        "cmh_chi2": round_away(np.float64(num * num / var), 6) + 0.0,
        "mh_odds_ratio": round_away(np.float64(ra / rb), 6) + 0.0,
    }])
    return typed_out(res, schema)


DOC_VOCAB_CMH_SQL = """
WITH d AS (
  SELECT COALESCE(lang, '') AS lang, CAST(n_chars AS BIGINT) AS chars,
         CAST(len(list_distinct(list_filter(
             string_split(COALESCE(text, ''), ' '), t -> t <> '')))
             AS BIGINT) AS vocab
  FROM documents
), m AS (
  SELECT SUM(chars) / CAST(COUNT(*) AS DOUBLE) AS mx,
         SUM(vocab) / CAST(COUNT(*) AS DOUBLE) AS my,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM d HAVING COUNT(*) > 0
), cells AS (
  SELECT d.lang,
         CASE WHEN d.chars > m.mx THEN 1 ELSE 0 END AS x,
         CASE WHEN d.vocab > m.my THEN 1 ELSE 0 END AS y,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM d, m GROUP BY 1, 2, 3
), strata AS (
  SELECT lang,
         SUM(CASE WHEN x = 1 AND y = 1 THEN n ELSE 0 END) AS a,
         SUM(CASE WHEN x = 1 AND y = 0 THEN n ELSE 0 END) AS b,
         SUM(CASE WHEN x = 0 AND y = 1 THEN n ELSE 0 END) AS c,
         SUM(CASE WHEN x = 0 AND y = 0 THEN n ELSE 0 END) AS dd
  FROM cells GROUP BY 1
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         SUM(a - (a + b) * (a + c) / (a + b + c + dd)) AS num,
         SUM((a + b) * (c + dd) * (a + c) * (b + dd)
             / ((a + b + c + dd) * (a + b + c + dd)
                * (a + b + c + dd - 1.0))) AS var,
         SUM(a * dd / (a + b + c + dd)) AS ra,
         SUM(b * c / (a + b + c + dd)) AS rb
  FROM strata WHERE a + b + c + dd > 1
)
SELECT s.n_strata, m.nd AS n_docs,
       ROUND(s.num, 6) AS cmh_num, ROUND(s.var, 6) AS cmh_var,
       ROUND(s.num * s.num / s.var, 6) AS cmh_chi2,
       ROUND(s.ra / s.rb, 6) AS mh_odds_ratio
FROM s CROSS JOIN m
WHERE s.var > 0 AND s.rb > 0
"""


# ---------------------------------------------------------------------------
# doc_length_tukey_hsd: Tukey-Kramer post-hoc pairwise q statistics
# ---------------------------------------------------------------------------

def doc_length_tukey_hsd(sf_dir: str) -> pd.DataFrame:
    """Tukey-Kramer HSD q statistics for every language pair's mean doc
    length — the post-hoc step the ANOVA family stops short of:
    doc_length_anova_by_lang says "SOME language differs", the
    studentized-range q per pair (|m_i - m_j| / sqrt(MSW/2 (1/n_i +
    1/n_j))) says WHICH pairs drive it, with the pooled within-group
    variance and unequal-n Kramer correction.

    Plan: one (lang, n, sum, sumsq) moment fold — 5 cells on the wire;
    the 10 pairwise q's are driver flops mirroring the oracle's
    self-join expressions."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df.n_chars.to_numpy(np.float64)
        g = pd.DataFrame({"lang": df.lang.fillna(""), "n": 1,
                          "s": x, "ss": x * x})
        return g.groupby("lang", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"))

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("lang")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("ss", alias_name="ss"))
           .to_pandas())
    schema = {"lang_a": "object", "lang_b": "object",
              "mean_diff": "float64", "q_stat": "float64"}
    if out.empty or len(out) < 2:
        return typed_out(pd.DataFrame(), schema)
    out = out.sort_values("lang").reset_index(drop=True)
    n = out.n.to_numpy(np.float64)
    s = out.s.to_numpy(np.float64)
    ss = out.ss.to_numpy(np.float64)
    big_n, k = float(n.sum()), len(out)
    if big_n <= k:
        return typed_out(pd.DataFrame(), schema)
    msw = float((ss - s * s / n).sum()) / (big_n - k)
    if msw <= 0:
        return typed_out(pd.DataFrame(), schema)
    m = s / n
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            se = np.sqrt(msw / 2.0 * (1.0 / n[i] + 1.0 / n[j]))
            rows.append({
                "lang_a": out.lang[i], "lang_b": out.lang[j],
                "mean_diff": round_away(np.float64(m[i] - m[j]), 6) + 0.0,
                "q_stat": round_away(
                    np.float64(abs(m[i] - m[j]) / se), 6) + 0.0,
            })
    return typed_out(pd.DataFrame(rows), schema,
                     sort_by=["lang_a", "lang_b"])


DOC_LENGTH_TUKEY_HSD_SQL = """
WITH g AS (
  SELECT COALESCE(lang, '') AS lang, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(n_chars AS DOUBLE)) AS s,
         SUM(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS ss
  FROM documents GROUP BY 1
), w AS (
  SELECT SUM(ss - s * s / n) / (SUM(n) - COUNT(*)) AS msw
  FROM g HAVING SUM(n) > COUNT(*) AND COUNT(*) >= 2
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       ROUND(a.s / a.n - b.s / b.n, 6) AS mean_diff,
       ROUND(ABS(a.s / a.n - b.s / b.n)
             / SQRT(w.msw / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
FROM g a JOIN g b ON a.lang < b.lang
CROSS JOIN w
WHERE w.msw > 0
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# doc_size_cronbach: Cronbach's alpha over the doc-size item battery
# ---------------------------------------------------------------------------

def doc_size_cronbach(sf_dir: str) -> pd.DataFrame:
    """Cronbach's alpha internal-consistency coefficient over the
    four-item document-size battery (n_chars, token count, distinct
    tokens, max token length) — the psychometric reliability audit
    applied to a quality-score panel: alpha near 1 means the items
    measure ONE latent size construct (so a composite score is
    defensible), low alpha means the panel mixes constructs and a
    composite would be noise. alpha = k/(k-1) (1 - sum var_i /
    var_total), population variances.

    Plan: one Arrow-kernel batch pass folds per-item sums/sumsqs plus
    the composite's sumsq (11 doubles on the wire); alpha is a driver
    closed form identical to the oracle's expressions."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "n_chars"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        tok_len = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_docs = len(lens)
        x2 = np.bincount(doc_idx[keep], minlength=n_docs).astype(
            np.float64)                               # token count
        codes = flat.dictionary_encode().combine_chunks()
        code_np = codes.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        packed = np.unique((doc_idx[keep] << 32) | code_np[keep])
        x3 = np.bincount(packed >> 32, minlength=n_docs).astype(
            np.float64)                               # distinct tokens
        x4 = np.zeros(n_docs, np.float64)             # max token length
        if keep.any():
            di, tl = doc_idx[keep], tok_len[keep]
            np.maximum.at(x4, di, tl.astype(np.float64))
        x1 = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tot = x1 + x2 + x3 + x4
        return pd.DataFrame([{
            "g": np.int64(0), "n": np.int64(n_docs),
            "s1": x1.sum(), "q1": (x1 * x1).sum(),
            "s2": x2.sum(), "q2": (x2 * x2).sum(),
            "s3": x3.sum(), "q3": (x3 * x3).sum(),
            "s4": x4.sum(), "q4": (x4 * x4).sum(),
            "st": tot.sum(), "qt": (tot * tot).sum(),
        }])

    cols = ["n", "s1", "q1", "s2", "q2", "s3", "q3", "s4", "q4",
            "st", "qt"]
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("g")
           .aggregate(*[Sum(c, alias_name=c) for c in cols])
           .to_pandas())
    schema = {"n_docs": "int64", "k_items": "int64",
              "sum_item_var": "float64", "total_var": "float64",
              "cronbach_alpha": "float64"}
    if agg.empty or int(agg.n[0]) < 2:
        return typed_out(pd.DataFrame(), schema)
    nd = float(agg.n[0])
    iv = sum(float(agg[f"q{i}"][0]) / nd
             - (float(agg[f"s{i}"][0]) / nd) ** 2 for i in (1, 2, 3, 4))
    tv = float(agg.qt[0]) / nd - (float(agg.st[0]) / nd) ** 2
    if tv <= 0:
        return typed_out(pd.DataFrame(), schema)
    alpha = 4.0 / 3.0 * (1.0 - iv / tv)
    res = pd.DataFrame([{
        "n_docs": np.int64(nd), "k_items": np.int64(4),
        "sum_item_var": round_away(np.float64(iv), 6) + 0.0,
        "total_var": round_away(np.float64(tv), 6) + 0.0,
        "cronbach_alpha": round_away(np.float64(alpha), 6) + 0.0,
    }])
    return typed_out(res, schema)


DOC_SIZE_CRONBACH_SQL = """
WITH d AS (
  SELECT CAST(n_chars AS DOUBLE) AS x1,
         CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
                              t -> t <> '')) AS DOUBLE) AS x2,
         CAST(len(list_distinct(list_filter(
             string_split(COALESCE(text, ''), ' '),
             t -> t <> ''))) AS DOUBLE) AS x3,
         CAST(COALESCE(list_max(list_transform(list_filter(
             string_split(COALESCE(text, ''), ' '), t -> t <> ''),
             t -> length(t))), 0) AS DOUBLE) AS x4
  FROM documents
), s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x1) AS s1, SUM(x1 * x1) AS q1,
         SUM(x2) AS s2, SUM(x2 * x2) AS q2,
         SUM(x3) AS s3, SUM(x3 * x3) AS q3,
         SUM(x4) AS s4, SUM(x4 * x4) AS q4,
         SUM(x1 + x2 + x3 + x4) AS st,
         SUM((x1 + x2 + x3 + x4) * (x1 + x2 + x3 + x4)) AS qt
  FROM d HAVING COUNT(*) >= 2
), v AS (
  SELECT n,
         (q1 / n - (s1 / n) * (s1 / n)) + (q2 / n - (s2 / n) * (s2 / n))
         + (q3 / n - (s3 / n) * (s3 / n))
         + (q4 / n - (s4 / n) * (s4 / n)) AS iv,
         qt / n - (st / n) * (st / n) AS tv
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(4 AS BIGINT) AS k_items,
       ROUND(iv, 6) AS sum_item_var, ROUND(tv, 6) AS total_var,
       ROUND(4.0 / 3.0 * (1.0 - iv / tv), 6) AS cronbach_alpha
FROM v WHERE tv > 0
"""


# ---------------------------------------------------------------------------
# doc_syllable_complexity: readability battery per language
# ---------------------------------------------------------------------------

def doc_syllable_complexity(sf_dir: str) -> pd.DataFrame:
    """Readability battery per language from the vowel-group syllable
    heuristic — avg syllables/word, share of 3+-syllable "complex"
    words, and a Gunning-fog-style index with words-per-document as
    the sentence-length analog (this corpus carries no sentence
    punctuation; the doc is the utterance unit). The quality-scoring
    family measured SIZE (lengths, entropy, TTR); this is the first
    PRONOUNCEABILITY axis — the filter that separates prose-like pages
    from keyword-stuffed ones at crawl scale.

    Plan: one zero-copy Arrow pass — ``pc.count_substring_regex`` on
    the full text for syllables (vowel groups cannot span the space
    delimiter) and on the exploded tokens for the complex-word count —
    folded to (lang, n_docs, words, sylls, complex) partials; shares
    are driver divisions mirroring the oracle."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        text = pc.coalesce(t.column("text"), "")
        toks = pc.split_pattern(text, " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        n_docs = len(lens)
        words = np.bincount(doc_idx[keep], minlength=n_docs)
        sylls = pc.count_substring_regex(
            text, "[aeiouy]+").to_numpy(zero_copy_only=False).astype(
            np.int64)
        tok_sylls = pc.count_substring_regex(
            flat, "[aeiouy]+").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cx_mask = keep & (tok_sylls >= 3)
        cx = np.bincount(doc_idx[cx_mask], minlength=n_docs)
        g = pd.DataFrame({
            "lang": t.column("lang").to_pandas().fillna(""),
            "n_docs": np.ones(n_docs, np.int64),
            "w": words.astype(np.int64), "y": sylls,
            "c": cx.astype(np.int64)})
        return g.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), w=("w", "sum"), y=("y", "sum"),
            c=("c", "sum"))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("w", alias_name="w"), Sum("y", alias_name="y"),
                      Sum("c", alias_name="c"))
           .to_pandas())
    schema = {"lang": "object", "n_docs": "int64", "n_words": "int64",
              "syll_per_word": "float64", "pct_complex": "float64",
              "fog_index": "float64"}
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out = out[out.w > 0].reset_index(drop=True)
    nd = out.n_docs.to_numpy(np.float64)
    w = out.w.to_numpy(np.float64)
    y = out.y.to_numpy(np.float64)
    c = out.c.to_numpy(np.float64)
    res = pd.DataFrame({
        "lang": out.lang, "n_docs": out.n_docs.astype("int64"),
        "n_words": out.w.astype("int64"),
        "syll_per_word": round_away(y / w, 6) + 0.0,
        "pct_complex": round_away(100.0 * c / w, 6) + 0.0,
        "fog_index": round_away(0.4 * (w / nd + 100.0 * c / w), 6) + 0.0,
    })
    return typed_out(res, schema, sort_by="lang")


DOC_SYLLABLE_COMPLEXITY_SQL = """
WITH d AS (
  SELECT COALESCE(lang, '') AS lang,
         len(list_filter(string_split(COALESCE(text, ''), ' '),
                         t -> t <> '')) AS w,
         len(regexp_extract_all(COALESCE(text, ''), '[aeiouy]+')) AS y,
         len(list_filter(list_filter(string_split(COALESCE(text, ''),
                                                  ' '), t -> t <> ''),
             t -> len(regexp_extract_all(t, '[aeiouy]+')) >= 3)) AS c
  FROM documents
), g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS w, SUM(y) AS y, SUM(c) AS c
  FROM d GROUP BY 1 HAVING SUM(w) > 0
)
SELECT lang, n_docs, w AS n_words,
       ROUND(CAST(y AS DOUBLE) / w, 6) AS syll_per_word,
       ROUND(100.0 * CAST(c AS DOUBLE) / w, 6) AS pct_complex,
       ROUND(0.4 * (CAST(w AS DOUBLE) / n_docs
                    + 100.0 * CAST(c AS DOUBLE) / w), 6) AS fog_index
FROM g ORDER BY 1
"""


# ---------------------------------------------------------------------------
# token_branching_entropy: conditional next-token entropy per context
# ---------------------------------------------------------------------------

def token_branching_entropy(sf_dir: str) -> pd.DataFrame:
    """Branching (conditional next-token) entropy per context token —
    H(next | prev) and its perplexity: the unigram entropy family
    measures the MARGINAL distribution, PMI scores individual pairs;
    branching entropy is the quantity segmentation and
    predictability-based quality filters actually threshold (contexts
    whose continuation is near-deterministic mark templated/boilerplate
    text; high-entropy contexts mark free prose).

    Plan: per-batch (prev, next, n) bigram partials -> one bounded
    vocabulary-keyed exchange -> per-prev vectorized entropy inside
    ``map_groups`` (distributed in the context key, no driver loop
    over the vocabulary)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def bigrams(df: pd.DataFrame) -> pd.DataFrame:
        prevs, nexts = [], []
        for txt in df.text.fillna(""):
            toks = [t for t in txt.split(" ") if t]
            if len(toks) >= 2:
                prevs.extend(toks[:-1])
                nexts.extend(toks[1:])
        if not prevs:
            return pd.DataFrame({"prev": pd.Series(dtype=object),
                                 "next": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        g = pd.DataFrame({"prev": prevs, "next": nexts})
        g["n"] = np.int64(1)
        return g.groupby(["prev", "next"], as_index=False).agg(
            n=("n", "sum"))

    counts = (ds.map_batches(bigrams, batch_format="pandas")
              .groupby(["prev", "next"])
              .aggregate(Sum("n", alias_name="n")))

    def per_prev(g: pd.DataFrame) -> pd.DataFrame:
        n = g.n.to_numpy(np.float64)
        tot = n.sum()
        p = n / tot
        h = float(-(p * np.log(p)).sum())
        return pd.DataFrame([{
            "prev_token": g.prev.iloc[0], "n_pairs": np.int64(tot),
            "n_distinct_next": np.int64(len(g)),
            "branch_entropy": round_away(np.float64(h), 6) + 0.0,
            "perplexity": round_away(np.float64(np.exp(h)), 6) + 0.0,
        }])

    out = counts.groupby("prev").map_groups(
        per_prev, batch_format="pandas").to_pandas()
    schema = {"prev_token": "object", "n_pairs": "int64",
              "n_distinct_next": "int64", "branch_entropy": "float64",
              "perplexity": "float64"}
    return typed_out(out, schema, sort_by="prev_token")


TOKEN_BRANCHING_ENTROPY_SQL = """
WITH t AS (
  SELECT list_filter(string_split(COALESCE(text, ''), ' '),
                     x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT toks[i] AS prev, toks[i+1] AS next_tok
  FROM t, UNNEST(range(1, GREATEST(len(toks) - 1, 0) + 1)) AS u(i)
), c AS (
  SELECT prev, next_tok, CAST(COUNT(*) AS DOUBLE) AS n
  FROM bg GROUP BY 1, 2
), tot AS (
  SELECT prev, SUM(n) AS tn, CAST(COUNT(*) AS BIGINT) AS k FROM c
  GROUP BY 1
)
SELECT c.prev AS prev_token, CAST(tot.tn AS BIGINT) AS n_pairs,
       tot.k AS n_distinct_next,
       ROUND(SUM(-(c.n / tot.tn) * LN(c.n / tot.tn)), 6)
           AS branch_entropy,
       ROUND(EXP(SUM(-(c.n / tot.tn) * LN(c.n / tot.tn))), 6)
           AS perplexity
FROM c JOIN tot ON tot.prev = c.prev
GROUP BY 1, 2, 3 ORDER BY 1
"""


def doc_length_cvm_pairs(sf_dir: str) -> pd.DataFrame:
    """Two-sample Cramér-von Mises statistic between every pair of
    languages' document-length distributions — the INTEGRATED-difference
    member of the ECDF-test family this engine already carries (KS takes
    the sup of |F−G|, so one local gap dominates; Anderson-Darling
    tail-weights it; CvM integrates the SQUARED gap over the pooled
    sample, catching broad low-amplitude shifts KS under-weights —
    exactly the shape a slow length-filter drift produces).

    Tie convention (documented, mirrored by the oracle): T =
    n·m/(n+m)² · Σ_x w(x)·(F_n(x) − G_m(x))², summing over the pooled
    grid with multiplicity w(x) = pair-pooled count at x — the empirical-
    measure form of the Anderson (1962) statistic, well-defined on tied
    integer lengths.

    Plan: the doc_length_ks_by_lang count-matrix fold verbatim — partial
    (lang, length) histograms, one length-domain-bounded driver frame,
    cumsums and one vectorized weighted sum per pair. Nothing scales with
    the document count."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.dropna(subset=["lang"]).groupby(
            ["lang", "n_chars"], as_index=False).agg(n=("n_chars", "size"))
        return g.rename(columns={"n_chars": "x"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "x"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    schema = {"lang_a": "object", "lang_b": "object", "n_a": "int64",
              "n_b": "int64", "cvm_t": "float64"}
    if counts.empty:
        return typed_out(pd.DataFrame(), schema)
    langs = np.sort(counts.lang.unique())
    grid = np.sort(counts.x.unique())
    mat = np.zeros((len(langs), len(grid)), dtype=np.int64)
    li = pd.Series(range(len(langs)), index=langs)
    gi = pd.Series(range(len(grid)), index=grid)
    mat[li.loc[counts.lang].to_numpy(), gi.loc[counts.x].to_numpy()] = (
        counts.n.to_numpy(np.int64))
    cum = np.cumsum(mat, axis=1).astype(np.float64)
    ecdf = cum / cum[:, -1:]
    rows = []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            na, nb = float(cum[i, -1]), float(cum[j, -1])
            d = ecdf[i] - ecdf[j]
            s = float(np.sum(d * d * (mat[i] + mat[j])))
            t = s * na * nb / ((na + nb) * (na + nb))
            rows.append((langs[i], langs[j], np.int64(na), np.int64(nb), t))
    out = pd.DataFrame(rows, columns=["lang_a", "lang_b", "n_a", "n_b",
                                      "cvm_t"])
    out["cvm_t"] = round_away(out.cvm_t, 6)
    return typed_out(out, schema, sort_by=["lang_a", "lang_b"])


DOC_LENGTH_CVM_SQL = """
WITH counts AS (
  SELECT lang, n_chars AS x, COUNT(*) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
),
langs AS (SELECT DISTINCT lang FROM counts),
grid AS (SELECT DISTINCT x FROM counts),
lg AS (SELECT l.lang, g.x FROM langs l CROSS JOIN grid g),
cum AS (
  SELECT lg.lang, lg.x, COALESCE(c.n, 0) AS n,
         CAST(SUM(COALESCE(c.n, 0))
              OVER (PARTITION BY lg.lang ORDER BY lg.x) AS DOUBLE)
           / SUM(COALESCE(c.n, 0)) OVER (PARTITION BY lg.lang) AS f,
         CAST(SUM(COALESCE(c.n, 0))
              OVER (PARTITION BY lg.lang) AS DOUBLE) AS tot
  FROM lg LEFT JOIN counts c ON c.lang = lg.lang AND c.x = lg.x
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(MAX(a.tot) AS BIGINT) AS n_a,
       CAST(MAX(b.tot) AS BIGINT) AS n_b,
       ROUND(SUM((a.f - b.f) * (a.f - b.f) * (a.n + b.n))
             * MAX(a.tot) * MAX(b.tot)
             / ((MAX(a.tot) + MAX(b.tot)) * (MAX(a.tot) + MAX(b.tot))), 6)
           AS cvm_t
FROM cum a JOIN cum b ON b.x = a.x AND a.lang < b.lang
GROUP BY 1, 2
ORDER BY 1, 2
"""


# shared by doc_stopword_coverage and its SQL oracle so the two can never
# diverge on the list size (round-4 ADVICE: the SQL used to hardcode 10
# while the function took a parameter)
STOPWORD_TOPK = 10


def doc_stopword_coverage(sf_dir: str, topk: int = STOPWORD_TOPK) -> pd.DataFrame:
    """Per-document coverage by the language's CORPUS-DERIVED stopword
    list — the C4/Gopher stopword gate with the list learned from the
    data instead of hardcoded: pass 1 takes each language's ``topk`` most
    frequent tokens (count desc, token asc tiebreak — deterministic at
    the rank boundary); pass 2 scores every document by the fraction of
    its tokens on its own language's list. Natural text sits in a tight
    band; OCR noise falls below it, keyword-stuffed spam above — the gate
    needs exactly this distribution to place its thresholds.

    Plan: pass 1 is the (lang, token) count exchange, with the top-k
    CUT INSIDE each bucket's combine — a (lang, token) pair lives wholly
    in one bucket (bucketing hashes the token), so if a pair is in the
    global per-lang top-k it ranks <= topk inside its own bucket under
    the same (count desc, token asc) order; the union of per-bucket
    per-lang top-k therefore contains the global top-k EXACTLY. The
    driver receives at most num_buckets x langs x topk rows and takes
    the final head — nothing driver-side scales with the corpus
    vocabulary (round-4 ADVICE: the collapse used to happen after
    materializing the full vocab table). Pass 2 is one zero-copy
    streaming pass, np.isin per language slice against the tiny LUT."""
    from ..functions.shuffle import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def partial(t) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        lists = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        flat = pa.table({
            "lang": pc.take(t.column("lang"),
                            pc.list_parent_indices(lists)),
            "token": pc.list_flatten(lists),
        }).filter(pc.not_equal(pc.field("token"), ""))
        g = (flat.group_by(["lang", "token"])
             .aggregate([("token", "count")]).to_pandas()
             .rename(columns={"token_count": "n"}))
        g["n"] = g.n.astype("int64")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # sum this bucket's partials, then cut to per-lang top-k HERE —
        # the pair's full global count is in this bucket, so the cut is
        # exact and the driver exchange is bounded by buckets x langs x k
        g = g.groupby(["lang", "token"], as_index=False,
                      dropna=False).agg(n=("n", "sum"))
        g = g.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True], kind="stable")
        return g.groupby("lang", dropna=False).head(topk)

    counts = bucketed_combine(ds, "token", partial, combine,
                              num_buckets=16, coalesce_blocks=4,
                              partial_format="pyarrow").to_pandas()
    schema = {"doc_id": "int64", "lang": "object", "n_tokens": "int64",
              "n_stop": "int64", "stop_frac": "float64"}
    if counts.empty:
        return typed_out(pd.DataFrame(), schema)
    # final exact head over the bounded union (counts are already global
    # per pair — no re-sum needed, each pair appeared in exactly one bucket)
    counts = counts.sort_values(["lang", "n", "token"],
                                ascending=[True, False, True],
                                kind="stable")
    top = counts.groupby("lang", dropna=False).head(topk)
    lut = {lg: frozenset(g.token) for lg, g in top.groupby("lang",
                                                           dropna=False)}

    # per-lang sorted arrays for np.isin (the LUT is langs x topk — tiny,
    # shipped once per task in the closure)
    lut_arr = {lg: np.array(sorted(sw), dtype=object)
               for lg, sw in lut.items()}

    def score(t) -> pd.DataFrame:
        # fully vectorized: flatten tokens once, membership per language
        # slice, fold back per doc with bincount — no Python row loop on
        # the full-text scan
        import pyarrow.compute as pc

        lists = pc.split_pattern(pc.coalesce(t.column("text"), ""), " ")
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        toks = np.asarray(pc.list_flatten(lists).to_pandas(), dtype=object)
        langs = np.asarray(t.column("lang").to_pandas(), dtype=object)
        n = len(langs)
        nonempty = toks != ""
        n_tokens = np.bincount(par[nonempty], minlength=n).astype(np.int64)
        tok_lang = langs[par] if len(par) else np.array([], dtype=object)
        is_stop = np.zeros(len(toks), dtype=bool)
        for lg, arr in lut_arr.items():
            m = nonempty & (tok_lang == lg)
            if m.any():
                is_stop[m] = np.isin(toks[m], arr)
        n_stop = np.bincount(par[is_stop], minlength=n).astype(np.int64)
        out = pd.DataFrame({
            "doc_id": t.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "lang": langs, "n_tokens": n_tokens, "n_stop": n_stop,
        })
        return out[out.n_tokens > 0]

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:
        return typed_out(pd.DataFrame(), schema)
    out["stop_frac"] = round_away(
        out.n_stop.to_numpy(np.float64)
        / out.n_tokens.to_numpy(np.float64), 6)
    return typed_out(out, schema, sort_by="doc_id")


# f-string on STOPWORD_TOPK: the oracle's rank cut and the engine's
# default topk come from the same module constant
DOC_STOPWORD_COVERAGE_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), t AS (
  SELECT doc_id, lang, w FROM tok WHERE w <> ''
), c AS (
  SELECT lang, w, COUNT(*) AS n FROM t GROUP BY 1, 2
), top AS (
  SELECT lang, w FROM (
    SELECT lang, w,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, w ASC)
               AS rk
    FROM c
  ) WHERE rk <= {STOPWORD_TOPK}
)
SELECT t.doc_id, MAX(t.lang) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN top.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stop,
       ROUND(SUM(CASE WHEN top.w IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS stop_frac
FROM t LEFT JOIN top ON top.lang = t.lang AND top.w = t.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""
