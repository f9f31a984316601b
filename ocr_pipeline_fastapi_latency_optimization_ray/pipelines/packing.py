"""Sequence packing — the training-data step that concatenates documents
into fixed token-budget training sequences (every LLM data loader does
this; doing it *deterministically and distributed* requires a global
prefix sum over the document stream, i.e. a distributed SCAN, which Ray
Data has no built-in for).

``pack_sequences`` assigns every document a ``seq_id`` / ``seq_off`` under
contiguous greedy chunking in ``doc_id`` order:

    prefix(d)  = sum of n_tok over all docs with doc_id < d   (exclusive)
    seq_id(d)  = prefix(d) // budget
    seq_off(d) = prefix(d) %  budget

(A document longer than the remaining budget spills into the next
sequence — the standard "packed + split at boundary" layout; the split
point is derivable from ``seq_off`` so the assignment surface stays one
row per document.)

The scan is the textbook two-pass plan, expressed in Dataset primitives:

  pass 1 (range sums): one streaming ``map_batches`` emits per-batch
      partial sums keyed by ``range_id = doc_id // range_size``; a tiny
      groupby reduces them to one total per range; the driver computes the
      exclusive prefix over ranges (state = O(n_docs / range_size), NOT
      O(corpus) — at 10^12 docs pick range_size=10^6 and the offsets
      array is 8 MB) and broadcasts it once via ``ray.put``.
  pass 2 (local scan + offset): fixed-width ``(doc_id, n_tok, range_id)``
      rows are co-partitioned by range via ``bucketed_combine``; each
      bucket sorts its ranges by doc_id, cumsums within range, and adds
      the broadcast range offset. Text never enters the exchange.

Both passes stream; the only materialized state is the offsets array.
Token convention matches ``doc_token_stats`` (whitespace split of
COALESCE(text,''), so an empty/null doc counts 1 token == SQL
``len(string_split(...))``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..functions.frames import round_away, typed_out
from ..functions.shuffle import bucketed_combine

PACK_BUDGET = 2048
# docs per scan range. Small here so the multi-range scan path is exercised
# even at test scale (sf0.01 has 500 docs -> 8 ranges); at corpus scale raise
# it so the driver offsets array stays small (10^12 docs / 10^6 = 8 MB).
PACK_RANGE_SIZE = 64


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _tok_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tok, range_id) — fixed-width rows; the only thing that
    ever moves. n_tok = whitespace token count (doc_token_stats convention)."""
    n_tok = df["text"].fillna("").str.split(" ").str.len().astype("int64")
    ids = df["doc_id"].to_numpy(np.int64)
    return pd.DataFrame({
        "doc_id": ids,
        "n_tok": n_tok.to_numpy(np.int64),
        "range_id": ids // np.int64(PACK_RANGE_SIZE),
    })


def _packed_dataset(sf_dir: str, budget: int):
    """The scan as a streaming Dataset of (doc_id, n_tok, seq_id, seq_off),
    or None when the corpus is empty. Shared by ``pack_sequences`` (row
    surface) and ``pack_stats`` (aggregate surface)."""
    ds = _docs(sf_dir)

    # ---- pass 1: per-range token totals -> driver exclusive prefix ----
    def range_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _tok_batch(df)
        g = t.groupby("range_id", sort=False)["n_tok"].sum().reset_index()
        return g.rename(columns={"n_tok": "tok_sum"})

    parts = ds.map_batches(range_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return None
    totals = parts.groupby("range_id", sort=True)["tok_sum"].sum().sort_index()
    # dense offsets array indexed by range_id (ranges are contiguous small
    # ints by construction); exclusive prefix over ranges
    n_ranges = int(totals.index.max()) + 1
    sums = np.zeros(n_ranges, np.int64)
    sums[totals.index.to_numpy(np.int64)] = totals.to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offsets_ref = ray.put(offsets)  # broadcast once, read per reduce task

    # ---- pass 2: co-partition by range, local scan + broadcast offset ----
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)
        g = g.sort_values("doc_id", kind="stable")
        excl = (
            g.groupby("range_id", sort=False)["n_tok"].cumsum().to_numpy(np.int64)
            - g["n_tok"].to_numpy(np.int64)
        )
        prefix = off[g["range_id"].to_numpy(np.int64)] + excl
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tok": g["n_tok"].to_numpy(np.int64),
            "seq_id": prefix // np.int64(budget),
            "seq_off": prefix % np.int64(budget),
        })

    return bucketed_combine(
        ds, "range_id", _tok_batch, combine, num_buckets=16, coalesce_blocks=4
    )


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET) -> pd.DataFrame:
    """Deterministic sequence packing via distributed prefix sum (see
    module docstring). Output: one row per document with its packed
    position — ``seq_id`` (which training sequence it starts in) and
    ``seq_off`` (token offset within that sequence)."""
    packed = _packed_dataset(sf_dir, budget)
    out = pd.DataFrame() if packed is None else packed.to_pandas()
    return typed_out(out, {"doc_id": "int64", "n_tok": "int64",
                           "seq_id": "int64", "seq_off": "int64"},
                     sort_by="doc_id")


PACK_SEQUENCES_SQL = f"""
SELECT doc_id, n_tok,
       (prefix // {PACK_BUDGET})::BIGINT AS seq_id,
       (prefix % {PACK_BUDGET})::BIGINT AS seq_off
FROM (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM (
    SELECT doc_id,
           len(string_split(COALESCE(text, ''), ' '))::BIGINT AS n_tok
    FROM documents
  )
)
ORDER BY doc_id
"""


def pack_stats(sf_dir: str, budget: int = PACK_BUDGET) -> pd.DataFrame:
    """Packing-efficiency profile derived from the same scan: sequences
    produced, documents split across a sequence boundary
    (``seq_off + n_tok > budget``), total tokens — the numbers one checks
    before a training run (waste == split fraction under this layout).
    Computed as streaming partials over the scan output reduced to ONE
    row; the corpus-sized assignment never lands on the driver."""
    schema = {"n_docs": "int64", "n_seqs": "int64",
              "n_split_docs": "int64", "total_tokens": "int64"}
    packed = _packed_dataset(sf_dir, budget)
    if packed is None:
        # SQL aggregate w/o GROUP BY yields one row; COALESCE pins zeros
        return typed_out(pd.DataFrame({k: [0] for k in schema}), schema)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        split = (df["seq_off"].to_numpy(np.int64)
                 + df["n_tok"].to_numpy(np.int64)) > budget
        return pd.DataFrame({
            "n_docs": [np.int64(len(df))],
            "n_split_docs": [np.int64(split.sum())],
            "total_tokens": [df["n_tok"].to_numpy(np.int64).sum()],
        })

    p = packed.map_batches(partial, batch_format="pandas").to_pandas()
    total = int(p["total_tokens"].sum())
    out = pd.DataFrame({
        "n_docs": [int(p["n_docs"].sum())],
        "n_seqs": [(total + budget - 1) // budget],
        "n_split_docs": [int(p["n_split_docs"].sum())],
        "total_tokens": [total],
    })
    return typed_out(out, schema)


PACK_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(string_split(COALESCE(text, ''), ' '))::BIGINT AS n_tok
  FROM documents
), scanned AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM toks
)
SELECT COUNT(*)::BIGINT AS n_docs,
       COALESCE(CAST(CEIL(SUM(n_tok) / {PACK_BUDGET}.0) AS BIGINT), 0) AS n_seqs,
       COALESCE(SUM(CASE WHEN prefix % {PACK_BUDGET} + n_tok > {PACK_BUDGET}
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_split_docs,
       COALESCE(SUM(n_tok), 0)::BIGINT AS total_tokens
FROM scanned
"""


def _pack_tok_ds(tok_ds, budget: int):
    """The two-pass distributed scan over an already-tokenized Dataset of
    (doc_id, n_tok, range_id) fixed-width rows — shared by
    ``pack_sequences`` (raw corpus) and ``corpus_curate_pack`` (curated
    survivor set). Returns the packed Dataset or None when empty."""
    parts = tok_ds.map_batches(
        lambda df: (df.groupby("range_id", sort=False)["n_tok"].sum()
                    .reset_index().rename(columns={"n_tok": "tok_sum"})),
        batch_format="pandas",
    ).to_pandas()
    if parts.empty:
        return None
    totals = parts.groupby("range_id", sort=True)["tok_sum"].sum().sort_index()
    n_ranges = int(totals.index.max()) + 1
    sums = np.zeros(n_ranges, np.int64)
    sums[totals.index.to_numpy(np.int64)] = totals.to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offsets_ref = ray.put(offsets)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)
        g = g.sort_values("doc_id", kind="stable")
        excl = (
            g.groupby("range_id", sort=False)["n_tok"].cumsum()
            .to_numpy(np.int64) - g["n_tok"].to_numpy(np.int64)
        )
        prefix = off[g["range_id"].to_numpy(np.int64)] + excl
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tok": g["n_tok"].to_numpy(np.int64),
            "seq_id": prefix // np.int64(budget),
            "seq_off": prefix % np.int64(budget),
        })

    return bucketed_combine(tok_ds, "range_id", lambda df: df, combine,
                            num_buckets=16, coalesce_blocks=4)


def corpus_curate_pack(sf_dir: str, budget: int = PACK_BUDGET) -> pd.DataFrame:
    """END-TO-END curation composed with packing — the full "snapshot ->
    training sequences" pipeline a real data build runs: quality gates ->
    normalize -> exact dedup on normalized text keeping min doc_id
    (exactly ``corpus_build``'s semantics, pipelines/curation.py) -> then
    deterministic sequence packing of the SURVIVORS in doc_id order.
    Token counts are over the NORMALIZED text (the bytes a loader would
    actually pack).

    Plan: corpus_build's single dedup exchange emits fixed-width survivor
    rows already carrying ``n_tok`` — the keeper Dataset is materialized
    once (it feeds BOTH scan passes; without the materialize the range
    totals pass and the co-partition pass would each replay the dedup
    exchange), then the shared two-pass prefix-sum (:func:`_pack_tok_ds`)
    assigns (seq_id, seq_off). Text never enters any exchange."""
    from .curation import _FUNNEL_STOPWORDS, _normalize_texts
    from ..functions.hashing import md5_hex_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len()
        len_ok = (n_chars >= 100) & (n_chars <= 500)
        alpha = text.str.count(r"[A-Za-z]")
        alpha_ok = len_ok & (2 * alpha >= n_chars)
        ex = text.str.split(" ").explode()
        stop = ex.isin(_FUNNEL_STOPWORDS).groupby(ex.index).sum().reindex(
            df.index, fill_value=0)
        df = df[alpha_ok & (stop >= 1)]
        norm = _normalize_texts(df["text"].fillna("").tolist())
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "norm_md5": md5_hex_batch(norm),
            "n_tok": np.array([t.count(" ") + 1 for t in norm], np.int64),
        })
        return out.sort_values("doc_id", kind="stable").drop_duplicates(
            "norm_md5", keep="first")

    def keep_combine(g: pd.DataFrame) -> pd.DataFrame:
        k = g.sort_values("doc_id", kind="stable").drop_duplicates(
            "norm_md5", keep="first")
        ids = k["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_tok": k["n_tok"].to_numpy(np.int64),
            "range_id": ids // np.int64(PACK_RANGE_SIZE),
        })

    keepers = bucketed_combine(ds, "norm_md5", partial, keep_combine,
                               num_buckets=16, coalesce_blocks=4).materialize()
    packed = _pack_tok_ds(keepers, budget)
    out = pd.DataFrame() if packed is None else packed.to_pandas()
    return typed_out(out, {"doc_id": "int64", "n_tok": "int64",
                           "seq_id": "int64", "seq_off": "int64"},
                     sort_by="doc_id")


CORPUS_CURATE_PACK_SQL = rf"""
WITH f AS (
  SELECT doc_id,
         lower(trim(regexp_replace(nfc_normalize(COALESCE(text, '')),
                                   '\s+', ' ', 'g'))) AS norm
  FROM documents
  WHERE length(COALESCE(text, '')) BETWEEN 100 AND 500
    AND 2 * length(regexp_replace(COALESCE(text, ''), '[^A-Za-z]', '', 'g'))
        >= length(COALESCE(text, ''))
    AND len(list_filter(string_split(COALESCE(text, ''), ' '),
        w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) >= 1
), k AS (
  SELECT doc_id, norm,
         MIN(doc_id) OVER (PARTITION BY md5(norm)) AS keep
  FROM f
), s AS (
  SELECT doc_id,
         len(string_split(norm, ' '))::BIGINT AS n_tok
  FROM k WHERE doc_id = keep
)
SELECT doc_id, n_tok,
       (prefix // {PACK_BUDGET})::BIGINT AS seq_id,
       (prefix % {PACK_BUDGET})::BIGINT AS seq_off
FROM (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM s
)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# packing-efficiency curve across sequence-length budgets
# ---------------------------------------------------------------------------

PACK_CURVE_BUDGETS = (256, 512, 1024, 2048)


def pack_efficiency_curve(sf_dir: str,
                          budgets: tuple = PACK_CURVE_BUDGETS) -> pd.DataFrame:
    """``pack_stats`` swept across the max-sequence-length grid in ONE
    scan — the capacity-planning read before choosing a training context
    length: how many sequences each budget yields and what fraction of
    documents a boundary cuts through (cross-document attention
    contamination under this layout).

    The prefix sum is budget-independent, so the expensive part runs
    once: pass 1/2 are the same range-keyed distributed scan as
    ``pack_sequences``, but the reduce emits the RAW exclusive prefix;
    a final streaming pass scores all budgets against each row
    simultaneously and folds |budgets| integer partial rows. Nothing
    corpus-sized reaches the driver, and adding a budget adds one
    vectorized compare, not a rescan."""
    ds = _docs(sf_dir)

    def range_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _tok_batch(df)
        g = t.groupby("range_id", sort=False)["n_tok"].sum().reset_index()
        return g.rename(columns={"n_tok": "tok_sum"})

    schema = {"budget": "int64", "n_docs": "int64", "n_seqs": "int64",
              "n_split_docs": "int64", "split_frac": "float64"}
    parts = ds.map_batches(range_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return typed_out(pd.DataFrame(), schema)
    totals = parts.groupby("range_id", sort=True)["tok_sum"].sum().sort_index()
    n_ranges = int(totals.index.max()) + 1
    sums = np.zeros(n_ranges, np.int64)
    sums[totals.index.to_numpy(np.int64)] = totals.to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offsets_ref = ray.put(offsets)
    grid = np.asarray(sorted(budgets), dtype=np.int64)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)
        g = g.sort_values("doc_id", kind="stable")
        excl = (
            g.groupby("range_id", sort=False)["n_tok"].cumsum()
            .to_numpy(np.int64) - g["n_tok"].to_numpy(np.int64)
        )
        prefix = off[g["range_id"].to_numpy(np.int64)] + excl
        n_tok = g["n_tok"].to_numpy(np.int64)
        split = (prefix[None, :] % grid[:, None] + n_tok[None, :]
                 > grid[:, None]).sum(axis=1)
        return pd.DataFrame({"budget": grid,
                             "n_docs": np.int64(len(g)),
                             "n_split_docs": split.astype(np.int64),
                             "tokens": n_tok.sum()})

    p = bucketed_combine(ds, "range_id", _tok_batch, score,
                         num_buckets=16, coalesce_blocks=4).to_pandas()
    agg = p.groupby("budget", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_split_docs=("n_split_docs", "sum"),
        tokens=("tokens", "sum"))
    out = pd.DataFrame({
        "budget": agg.budget.to_numpy(np.int64),
        "n_docs": agg.n_docs.to_numpy(np.int64),
        "n_seqs": -(-agg.tokens.to_numpy(np.int64)
                    // agg.budget.to_numpy(np.int64)),
        "n_split_docs": agg.n_split_docs.to_numpy(np.int64),
        "split_frac": round_away(
            agg.n_split_docs.to_numpy(np.float64)
            / agg.n_docs.to_numpy(np.float64), 6),
    })
    return typed_out(out, schema, sort_by="budget")


PACK_EFFICIENCY_CURVE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(string_split(COALESCE(text, ''), ' '))::BIGINT AS n_tok
  FROM documents
), scanned AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM toks
), bs AS (SELECT UNNEST({list(PACK_CURVE_BUDGETS)}) AS budget)
SELECT CAST(budget AS BIGINT) AS budget,
       COUNT(*)::BIGINT AS n_docs,
       CAST(CEIL(SUM(n_tok) / (budget * 1.0)) AS BIGINT) AS n_seqs,
       SUM(CASE WHEN prefix % budget + n_tok > budget
                THEN 1 ELSE 0 END)::BIGINT AS n_split_docs,
       ROUND(SUM(CASE WHEN prefix % budget + n_tok > budget
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS split_frac
FROM scanned CROSS JOIN bs
GROUP BY budget ORDER BY budget
"""
