"""Sharded streaming dedup index (state/dedup_index.py): correctness vs the
batch exact-dedup operator, shard routing, streaming semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_pipeline_fastapi_latency_optimization_ray.state.dedup_index import (
    StreamingDedupIndex,
    streaming_dedup_stats,
)


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("dup_corpus")
    texts = (["alpha beta gamma"] * 3 + ["delta epsilon"] * 2
             + [f"unique text {i}" for i in range(20)])
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_first_seen_mask_and_counts(ray_session):
    idx = StreamingDedupIndex(n_shards=4)
    h = np.array([10, 11, 10, 12, 11, 10], dtype=np.uint64)
    mask = idx.first_seen_mask(h)
    assert mask.tolist() == [True, True, False, True, False, False]
    # second wave: all already seen
    assert idx.first_seen_mask(h).tolist() == [False] * 6
    stats = idx.stats()
    assert dict(zip(stats.text_hash, stats.n_seen)) == {10: 6, 11: 4, 12: 2}


def test_streaming_matches_batch_dedup(ray_session, dup_corpus):
    from ocr_pipeline_fastapi_latency_optimization_ray.pipelines.dedup import (
        dedup_exact_groups,
    )

    stream = streaming_dedup_stats(dup_corpus)
    batch = dedup_exact_groups(dup_corpus)
    # same number of distinct contents, same multiplicity histogram
    assert len(stream) == len(batch) == 22
    assert sorted(stream.n_seen) == sorted(batch.n_dups)
    assert stream.n_seen.sum() == 25  # every row counted exactly once


def test_empty_input(ray_session):
    idx = StreamingDedupIndex(n_shards=2)
    assert idx.first_seen_mask(np.zeros(0, dtype=np.uint64)).tolist() == []
    assert len(idx.stats()) == 0


def test_replayed_batch_is_idempotent(ray_session):
    """A retried map_batches task re-sends the same (batch_key, hashes):
    the shards must replay the original mask and leave counts untouched
    (ADVICE r1: non-idempotent actor mutation breaks under task retry)."""
    idx = StreamingDedupIndex(n_shards=4)
    h = np.array([10, 11, 10, 12, 11, 10], dtype=np.uint64)
    m1 = idx.first_seen_mask(h, batch_key=b"batch-A")
    m2 = idx.first_seen_mask(h, batch_key=b"batch-A")  # retry replay
    assert m1.tolist() == m2.tolist() == [True, True, False, True, False, False]
    stats = idx.stats()
    # counts as if the batch ran ONCE
    assert dict(zip(stats.text_hash, stats.n_seen)) == {10: 3, 11: 2, 12: 1}
    # a genuinely new batch with the same content still counts
    m3 = idx.first_seen_mask(h, batch_key=b"batch-B")
    assert m3.tolist() == [False] * 6
    assert idx.stats().n_seen.sum() == 12
