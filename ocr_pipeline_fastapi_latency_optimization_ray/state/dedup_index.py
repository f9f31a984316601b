"""Sharded streaming dedup index — the one component built on raw Ray
actors.

Everything else in this engine is a Dataset transform; a *streaming* dedup
(decide "have I seen this content before?" while the stream is still
flowing, instead of a post-hoc groupby) genuinely needs a shared mutable
index, which the Dataset API cannot express. Per the design brief this is
the sanctioned raw-actor case.

Design for scale:
  - the index is SHARDED across ``n_shards`` actors by ``hash % n_shards``
    (a single index actor would serialize every batch in the pipeline);
  - each ``map_batches`` task partitions its batch's hashes by shard and
    issues ONE ``check_and_add`` call per shard (vectorized membership
    against a per-shard python set; one round trip per batch per shard, not
    per row);
  - actors hold only 8-byte hashes, never text: memory is O(distinct),
    independent of corpus bytes.

Determinism note: which duplicate is "first seen" depends on arrival order
(inherently racy under parallelism — same as any streaming dedup). The
deterministic surface is the distinct-hash set and per-hash counts, which
``streaming_dedup_stats`` exposes; first-seen doc ids are intentionally not
part of the comparable output (dedup_exact_groups gives the deterministic
smallest-id keeper semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


@ray.remote(num_cpus=0.25)
class DedupShard:
    """One shard of the distributed seen-set: uint64 content hashes ->
    occurrence counts.

    Mutating actor state from a ``map_batches`` UDF is only safe under Ray's
    task retry if the mutation is idempotent per logical batch (ADVICE r1):
    ``check_and_add`` therefore takes a deterministic ``batch_id`` and
    replays the cached first-seen mask for a batch it has already applied,
    leaving the counts untouched. Replay masks are stored bit-packed
    (1 bit/row — memory O(rows/shard/8), bounded like the index itself)."""

    def __init__(self):
        self.counts: dict[int, int] = {}
        self._applied: dict[str, tuple[bytes, int]] = {}

    def check_and_add(self, batch_id: str | None, hashes: list[int]) -> list[bool]:
        """For each hash (in order): True if first occurrence. Mutates the
        index; one call handles a whole batch-shard slice. A repeated
        ``batch_id`` (retried task) returns the original mask unchanged."""
        if batch_id is not None and batch_id in self._applied:
            packed, n = self._applied[batch_id]
            bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8),
                                 count=n)
            return bits.astype(bool).tolist()
        counts = self.counts
        out = []
        for h in hashes:
            seen = h in counts
            counts[h] = counts.get(h, 0) + 1
            out.append(not seen)
        if batch_id is not None:
            self._applied[batch_id] = (
                np.packbits(np.asarray(out, dtype=bool)).tobytes(), len(out)
            )
        return out

    def stats(self) -> tuple[list[int], list[int]]:
        keys = sorted(self.counts)
        return keys, [self.counts[k] for k in keys]

    def size(self) -> int:
        return len(self.counts)


class StreamingDedupIndex:
    """Handle owning the shard actors; create once per job, pass to the
    ``map_batches`` stage (the handle pickles; actors are shared)."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [DedupShard.remote() for _ in range(n_shards)]

    def first_seen_mask(self, hashes: np.ndarray,
                        batch_key: bytes | None = None) -> np.ndarray:
        """Vectorized routing: one RPC per shard per call, results scattered
        back to input order.

        ``batch_key``: stable identity of the LOGICAL batch (e.g. the
        doc_id bytes), so a retried task replays instead of double-counting.
        None disables replay protection (ad-hoc callers)."""
        import hashlib

        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        shard_of = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        mask = np.zeros(len(hashes), dtype=bool)
        futures, positions = [], []
        for s in range(self.n_shards):
            pos = np.nonzero(shard_of == s)[0]
            if len(pos):
                bid = None
                if batch_key is not None:
                    bid = hashlib.blake2b(
                        batch_key + b"|" + str(s).encode(), digest_size=16
                    ).hexdigest()
                futures.append(
                    self.shards[s].check_and_add.remote(
                        bid, [int(h) for h in hashes[pos]]
                    )
                )
                positions.append(pos)
        for pos, res in zip(positions, ray.get(futures)):
            mask[pos] = res
        return mask

    def stats(self) -> pd.DataFrame:
        parts = ray.get([s.stats.remote() for s in self.shards])
        ks = np.concatenate([np.array(k, dtype=np.uint64) for k, _ in parts]) \
            if any(k for k, _ in parts) else np.zeros(0, dtype=np.uint64)
        vs = np.concatenate([np.array(v, dtype=np.int64) for _, v in parts]) \
            if any(v for _, v in parts) else np.zeros(0, dtype=np.int64)
        df = pd.DataFrame({"text_hash": ks.astype(np.int64), "n_seen": vs})
        return df.sort_values("text_hash").reset_index(drop=True)


def streaming_dedup_stats(sf_dir: str, n_shards: int = 8) -> pd.DataFrame:
    """Stream the documents table through the shared index; return the
    deterministic surface: (text_hash, n_seen) per distinct content hash,
    sorted. The kept-row stream itself (first-seen docs) is consumed for its
    count only — which rows are "first" is arrival-order dependent."""
    from ..functions.hashing import fast_token_hash

    index = StreamingDedupIndex(n_shards)

    def dedup_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = fast_token_hash(list(df["text"].fillna("")))
        # batch identity = its doc ids: a retried task carries the same ids
        # and replays; distinct batches always differ in at least one id
        key = df["doc_id"].to_numpy(np.int64).tobytes()
        keep = index.first_seen_mask(h, batch_key=key)
        return df.loc[keep, ["doc_id"]]

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    kept = ds.map_batches(dedup_batch, batch_format="pandas").count()
    stats = index.stats()
    assert kept == len(stats)  # one kept row per distinct hash
    return stats
