"""BSP connected components over sharded edge actors.

The Dataset-API formulation of iterative label propagation
(pipelines/curation.py:dup_clusters round 1) re-shuffles the STATIC edge
set through ``bucketed_join`` every round — at k rounds the engine moves
the edges k times for data that never changes. This module is the
sanctioned raw-actor escape hatch (SURVEY.md §7 "raw Ray tasks/actors as a
last resort") for exactly that case: per-bucket ``EdgeShard`` actors load
their edges ONCE and keep them resident across rounds; each superstep
ships only (node, label) messages between shards, pre-split by destination
bucket so the driver shuttles object REFS, never rows.

Partitioning assumption (documented per the custom-operator rule): edges
are sharded by ``hash(src) % B`` and labels by ``hash(node) % B`` with the
SAME B and hash, so the labels a shard needs to send along its out-edges
are exactly its own bucket's labels — no cross-shard lookup. Symmetric
edges (both directions stored) make one-directional sends sufficient.

Fault posture: shard state is built by idempotent ``add`` calls keyed on a
content digest (a retried feeding task re-sends the same digest and is
dropped), mirroring state/dedup_index.py. A lost actor loses its bucket;
the caller restarts the computation — acceptable for an algorithm whose
total state is two fixed-width columns, tiny next to the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


@ray.remote
class EdgeShard:
    """Holds the symmetric edges whose src hashes into this bucket."""

    def __init__(self, n_buckets: int):
        self.n_buckets = n_buckets
        self._chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._applied: set[str] = set()
        self.src: np.ndarray | None = None
        self.dst: np.ndarray | None = None

    def add(self, batch_id: str, src: np.ndarray, dst: np.ndarray) -> int:
        if batch_id in self._applied:  # idempotent under task retry
            return 0
        self._applied.add(batch_id)
        self._chunks.append((np.asarray(src, np.int64), np.asarray(dst, np.int64)))
        return len(src)

    def seal(self) -> int:
        """Concatenate, dedupe and sort the resident edge set."""
        if self._chunks:
            src = np.concatenate([c[0] for c in self._chunks])
            dst = np.concatenate([c[1] for c in self._chunks])
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        both = np.stack([src, dst], axis=1)
        both = np.unique(both, axis=0)  # sorts by (src, dst): deterministic
        self.src, self.dst = both[:, 0].copy(), both[:, 1].copy()
        self._chunks.clear()
        self._applied.clear()
        return len(self.src)

    def init_labels(self) -> tuple[np.ndarray, np.ndarray]:
        """label0(node) = min(node, min out-neighbor) for this bucket's
        srcs — the fused init+first-step of hash-to-min."""
        if not len(self.src):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        nodes, idx = np.unique(self.src, return_index=True)
        # self.src sorted: per-src min dst = minimum over each run
        mins = np.minimum.reduceat(self.dst, idx)
        return nodes, np.minimum(nodes, mins)

    def send(self, nodes: np.ndarray, labels: np.ndarray) -> list:
        """One superstep: push this bucket's labels along its out-edges.
        Returns ``n_buckets`` (dst_nodes, labels) pairs, pre-split by the
        destination's label-shard bucket."""
        out: list = []
        if not len(self.src) or not len(nodes):
            e = np.empty(0, np.int64)
            return [(e, e)] * self.n_buckets
        pos = np.searchsorted(nodes, self.src)
        pos = np.clip(pos, 0, len(nodes) - 1)
        lab = np.where(nodes[pos] == self.src, labels[pos], self.src)
        b = (self.dst.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        db, dd, dl = b[order], self.dst[order], lab[order]
        bounds = np.searchsorted(db, np.arange(self.n_buckets + 1))
        for i in range(self.n_buckets):
            s, e = bounds[i], bounds[i + 1]
            out.append((dd[s:e], dl[s:e]))
        return out


@ray.remote
class LabelShard:
    """Current labels for the nodes hashing into this bucket."""

    def __init__(self):
        self.nodes = np.empty(0, np.int64)
        self.labels = np.empty(0, np.int64)

    def set_initial(self, parts: list) -> None:
        """Merge (nodes, labels) fragments (min per node)."""
        if parts:
            n = np.concatenate([p[0] for p in parts])
            l = np.concatenate([p[1] for p in parts])
            self.nodes, self.labels = _min_per_node(n, l)

    def update_min(self, parts: list) -> bool:
        """Apply incoming messages; returns True if any label decreased."""
        if not parts:
            return False
        n = np.concatenate([self.nodes] + [p[0] for p in parts])
        l = np.concatenate([self.labels] + [p[1] for p in parts])
        nodes, labels = _min_per_node(n, l)
        # restrict to known nodes: messages may address nodes first seen
        # here (every node appears as a src somewhere, so init covers all)
        changed = not (
            len(nodes) == len(self.nodes)
            and np.array_equal(nodes, self.nodes)
            and np.array_equal(labels, self.labels)
        )
        self.nodes, self.labels = nodes, labels
        return changed

    def get(self) -> tuple[np.ndarray, np.ndarray]:
        return self.nodes, self.labels

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame({"node": self.nodes, "label": self.labels})


def _min_per_node(nodes: np.ndarray, labels: np.ndarray):
    if not len(nodes):
        return nodes.astype(np.int64), labels.astype(np.int64)
    order = np.lexsort((labels, nodes))
    n, l = nodes[order], labels[order]
    first = np.concatenate(([True], n[1:] != n[:-1]))
    return n[first].copy(), l[first].copy()


def connected_components_bsp(
    edges_ds, n_buckets: int = 8, max_iters: int = 50
) -> "ray.data.Dataset":
    """Min-label connected components over a Ray dataset of directed star
    edges (columns ``a``, ``b``; symmetrized internally). Returns a Ray
    dataset of (node, label) with label = component minimum.

    Edges stream from the dataset into the shards once (hashed feed, no
    sort exchange); each superstep then moves only label messages.
    Converges in O(log n) supersteps on star-edge inputs."""
    import hashlib

    import ray.data

    shards = [EdgeShard.remote(n_buckets) for _ in range(n_buckets)]
    labels = [LabelShard.remote() for _ in range(n_buckets)]

    def feed(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"n": np.empty(0, np.int64)})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        src = np.concatenate([a, b])  # symmetric
        dst = np.concatenate([b, a])
        bucket = (src.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        digest = hashlib.blake2b(
            src.tobytes() + dst.tobytes(), digest_size=12
        ).hexdigest()
        refs = []
        for i in range(n_buckets):
            m = bucket == i
            if m.any():
                refs.append(shards[i].add.remote(f"{digest}:{i}", src[m], dst[m]))
        ray.get(refs)
        return pd.DataFrame({"n": np.array([len(src)], np.int64)})

    # drain the feed (count() consumes the stream; rows are just tallies)
    edges_ds.map_batches(feed, batch_format="pandas").count()
    ray.get([s.seal.remote() for s in shards])

    # init: per-shard (node, min(node, out-neighbors)); src-bucket == node-bucket
    inits = ray.get([s.init_labels.remote() for s in shards])
    ray.get([
        labels[i].set_initial.remote([inits[i]]) for i in range(n_buckets)
    ])

    converged = False
    for _ in range(max_iters):
        cur = [ray.get(labels[i].get.remote()) for i in range(n_buckets)]
        outs = ray.get([
            shards[i].send.remote(cur[i][0], cur[i][1])
            for i in range(n_buckets)
        ])
        changed = ray.get([
            labels[j].update_min.remote([outs[i][j] for i in range(n_buckets)])
            for j in range(n_buckets)
        ])
        if not any(changed):
            converged = True
            break
    if not converged:
        # Unconverged labels are silently WRONG (a component with
        # propagation diameter > max_iters keeps >1 label) — fail loudly
        # rather than hand back plausible-looking garbage.
        for a in (*shards, *labels):
            ray.kill(a)
        raise RuntimeError(
            f"connected_components_bsp did not converge in {max_iters} "
            "supersteps; raise max_iters (label propagation needs about "
            "log2(longest chain) rounds with min-label shortcutting)"
        )

    frames = ray.get([l.to_frame.remote() for l in labels])
    for s in shards:
        ray.kill(s)
    for l in labels:
        ray.kill(l)
    non_empty = [f for f in frames if len(f)]
    if not non_empty:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "label": pd.Series(dtype="int64")})
        )
    return ray.data.from_pandas(non_empty)
