"""Distributed prefix-sum sequence packing (pipelines/packing.py): the
scan must be exact across block and range boundaries under arbitrary
partitioning — verified against a single-threaded numpy cumsum oracle on
a many-row-group input that forces multiple batches and ranges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.pipelines import packing


@pytest.fixture(scope="module")
def packing_sf(tmp_path_factory, ray_session):
    """1000 docs with varied token counts, written in 20 row groups so the
    read produces many blocks; doc_ids shuffled across row groups so block
    order != doc order (the scan must not rely on physical order)."""
    d = tmp_path_factory.mktemp("packing_sf")
    rng = np.random.RandomState(7)
    ids = rng.permutation(1000).astype(np.int64)
    texts = ["w " * rng.randint(0, 400) + "w" for _ in ids]  # 1..401 tokens
    tbl = pa.table({
        "doc_id": ids,
        "text": texts,
        "lang": ["en"] * len(ids),
        "source": ["src0"] * len(ids),
        "n_chars": [len(t) for t in texts],
    })
    pq.write_table(tbl, d / "documents.parquet", row_group_size=50)
    return str(d)


def _numpy_oracle(sf_dir: str, budget: int) -> pd.DataFrame:
    df = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    n_tok = df["text"].fillna("").str.split(" ").str.len().to_numpy(np.int64)
    prefix = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(np.int64),
        "n_tok": n_tok,
        "seq_id": prefix // budget,
        "seq_off": prefix % budget,
    })


def test_scan_exact_across_blocks_and_ranges(packing_sf):
    got = packing.pack_sequences(packing_sf, budget=512).reset_index(drop=True)
    want = _numpy_oracle(packing_sf, budget=512)
    # 1000 docs / PACK_RANGE_SIZE=64 -> 16 ranges; 20 row groups -> many blocks
    assert (got["doc_id"] // packing.PACK_RANGE_SIZE).nunique() > 4
    pd.testing.assert_frame_equal(got, want)


def test_pack_stats_consistent_with_assignment(packing_sf):
    budget = 512
    assign = packing.pack_sequences(packing_sf, budget=budget)
    stats = packing.pack_stats(packing_sf, budget=budget)
    total = int(assign["n_tok"].sum())
    assert int(stats.loc[0, "n_docs"]) == len(assign)
    assert int(stats.loc[0, "total_tokens"]) == total
    assert int(stats.loc[0, "n_seqs"]) == -(-total // budget)
    split = ((assign["seq_off"] + assign["n_tok"]) > budget).sum()
    assert int(stats.loc[0, "n_split_docs"]) == int(split)
    # sanity: a packing with per-doc spill must split at least one doc here
    assert int(split) > 0


def test_sequences_are_gapless(packing_sf):
    """Every sequence id in [0, n_seqs) is used and offsets within a
    sequence start where the previous doc ended (contiguity of the scan)."""
    budget = 512
    assign = packing.pack_sequences(packing_sf, budget=budget).sort_values("doc_id")
    prefix = assign["seq_id"].to_numpy() * budget + assign["seq_off"].to_numpy()
    n_tok = assign["n_tok"].to_numpy()
    assert prefix[0] == 0
    assert np.array_equal(prefix[1:], (prefix + n_tok)[:-1])
