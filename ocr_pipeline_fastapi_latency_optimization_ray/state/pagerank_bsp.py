"""BSP PageRank over sharded resident edges — the weighted-iteration
sibling of :mod:`state.cc_bsp` (same sanctioned raw-actor escape hatch for
iterative algorithms whose edge set is static: edges load into per-bucket
actors ONCE, each superstep ships only (node, partial-rank) messages).

Where connected components propagates a MIN (idempotent, order-free),
PageRank propagates a weighted SUM — the message plan therefore
pre-aggregates per destination inside the sending shard (one rank partial
per (shard, dst) pair, not one per edge) and the receiving shard folds the
B partials in FIXED shard order, so the float additions happen in a
deterministic order and repeated runs are bit-identical.

Partitioning assumption (custom-operator rule): symmetric edges sharded by
``hash(src) % B``, ranks by ``hash(node) % B`` with the same B and hash —
the ranks a shard needs are exactly its own bucket's. Every node of the
symmetrized graph appears as a src, so degrees and the node universe are
both shard-local facts.

Fault posture mirrors cc_bsp: idempotent digest-keyed feeding; a lost
actor loses its bucket and the caller restarts — state is two fixed-width
vectors per shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


@ray.remote
class PREdgeShard:
    """Symmetric edges whose src hashes into this bucket, plus per-src
    out-degree (computed at seal)."""

    def __init__(self, n_buckets: int):
        self.n_buckets = n_buckets
        self._chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._applied: set[str] = set()
        self.src = self.dst = None
        self.nodes = self.deg = None

    def add(self, batch_id: str, src: np.ndarray, dst: np.ndarray) -> int:
        if batch_id in self._applied:  # idempotent under task retry
            return 0
        self._applied.add(batch_id)
        self._chunks.append((np.asarray(src, np.int64),
                             np.asarray(dst, np.int64)))
        return len(src)

    def seal(self) -> int:
        if self._chunks:
            src = np.concatenate([c[0] for c in self._chunks])
            dst = np.concatenate([c[1] for c in self._chunks])
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        both = np.unique(np.stack([src, dst], axis=1), axis=0)
        self.src, self.dst = both[:, 0].copy(), both[:, 1].copy()
        self._chunks.clear()
        self._applied.clear()
        if len(self.src):
            self.nodes, idx = np.unique(self.src, return_index=True)
            self.deg = np.diff(np.concatenate((idx, [len(self.src)])))
        else:
            self.nodes = np.empty(0, np.int64)
            self.deg = np.empty(0, np.int64)
        return len(self.src)

    def node_universe(self) -> np.ndarray:
        return self.nodes

    def send(self, nodes: np.ndarray, ranks: np.ndarray) -> list:
        """One superstep: push rank/deg along out-edges, PRE-SUMMED per
        destination, split by the destination's rank-shard bucket."""
        if not len(self.src) or not len(nodes):
            e = np.empty(0, np.int64)
            f = np.empty(0, np.float64)
            return [(e, f)] * self.n_buckets
        # rank and degree of each edge's src (shard-local lookups)
        pos = np.searchsorted(nodes, self.src)
        pos = np.clip(pos, 0, len(nodes) - 1)
        r = np.where(nodes[pos] == self.src, ranks[pos], 0.0)
        dpos = np.searchsorted(self.nodes, self.src)
        w = r / self.deg[dpos]
        # pre-aggregate per destination (dst sorted within src-sorted
        # edges is NOT globally sorted: sort once, reduceat per run)
        order = np.argsort(self.dst, kind="stable")
        d_sorted, w_sorted = self.dst[order], w[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(d_sorted[1:] != d_sorted[:-1]) + 1))
        uniq_dst = d_sorted[starts]
        sums = np.add.reduceat(w_sorted, starts)
        b = (uniq_dst.astype(np.uint64)
             % np.uint64(self.n_buckets)).astype(np.int64)
        out = []
        for i in range(self.n_buckets):
            m = b == i
            out.append((uniq_dst[m], sums[m]))
        return out


@ray.remote
class RankShard:
    """Current ranks for the nodes hashing into this bucket."""

    def __init__(self):
        self.nodes = np.empty(0, np.int64)
        self.ranks = np.empty(0, np.float64)

    def set_initial(self, parts: list, n_total: int) -> None:
        if parts:
            nodes = np.unique(np.concatenate(parts))
            self.nodes = nodes
            self.ranks = np.full(len(nodes), 1.0 / n_total, np.float64)

    def update(self, parts: list, n_total: int, damping: float) -> None:
        """r(v) <- (1-d)/N + d * sum of incoming partials. Partials fold
        in FIXED shard order for deterministic float addition."""
        acc = np.zeros(len(self.nodes), np.float64)
        for dn, dw in parts:  # fixed order: sending-shard index
            if not len(dn):
                continue
            pos = np.searchsorted(self.nodes, dn)
            pos = np.clip(pos, 0, max(len(self.nodes) - 1, 0))
            m = len(self.nodes) > 0
            if m:
                hit = self.nodes[pos] == dn
                np.add.at(acc, pos[hit], dw[hit])
        self.ranks = (1.0 - damping) / n_total + damping * acc

    def get(self):
        return self.nodes, self.ranks

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame({"node": self.nodes, "rank": self.ranks})


def pagerank_bsp(edges_ds, n_buckets: int = 8, n_iters: int = 20,
                 damping: float = 0.85) -> pd.DataFrame:
    """PageRank over a Ray dataset of edges (columns ``a``, ``b``;
    symmetrized internally — the undirected-graph convention of the
    dup-cluster edge sets). Fixed ``n_iters`` power iterations
    (deterministic by construction; 20 rounds puts the residual below
    d^20 ≈ 0.04 of the initial gap, ample for ranking). Returns a pandas
    frame (node, rank) over the nodes that appear in at least one edge —
    the graph-node universe; rank sums to 1 over it."""
    import hashlib

    shards = [PREdgeShard.remote(n_buckets) for _ in range(n_buckets)]
    ranks = [RankShard.remote() for _ in range(n_buckets)]

    def feed(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"n": np.empty(0, np.int64)})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        bucket = (src.astype(np.uint64)
                  % np.uint64(n_buckets)).astype(np.int64)
        digest = hashlib.blake2b(
            src.tobytes() + dst.tobytes(), digest_size=12).hexdigest()
        refs = []
        for i in range(n_buckets):
            m = bucket == i
            if m.any():
                refs.append(shards[i].add.remote(f"{digest}:{i}",
                                                 src[m], dst[m]))
        ray.get(refs)
        return pd.DataFrame({"n": np.array([len(src)], np.int64)})

    edges_ds.map_batches(feed, batch_format="pandas").count()
    ray.get([s.seal.remote() for s in shards])

    universes = ray.get([s.node_universe.remote() for s in shards])
    n_total = int(sum(len(u) for u in universes))
    if n_total == 0:
        for a in (*shards, *ranks):
            ray.kill(a)
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="float64")})
    # node-bucket == src-bucket, so shard i's universe IS rank bucket i
    ray.get([ranks[i].set_initial.remote([universes[i]], n_total)
             for i in range(n_buckets)])

    for _ in range(n_iters):
        cur = ray.get([ranks[i].get.remote() for i in range(n_buckets)])
        outs = ray.get([
            shards[i].send.remote(cur[i][0], cur[i][1])
            for i in range(n_buckets)
        ])
        ray.get([
            ranks[j].update.remote([outs[i][j] for i in range(n_buckets)],
                                   n_total, damping)
            for j in range(n_buckets)
        ])

    frames = ray.get([r.to_frame.remote() for r in ranks])
    for a in (*shards, *ranks):
        ray.kill(a)
    out = pd.concat([f for f in frames if len(f)], ignore_index=True)
    return out.sort_values("node").reset_index(drop=True)
