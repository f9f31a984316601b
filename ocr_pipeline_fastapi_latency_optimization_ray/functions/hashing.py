"""Stable hashing primitives used across the engine.

All hashes are deterministic across processes and Python versions (no use of
built-in ``hash``, which is salted). They drive:
  - partition assignment (``stable_hash64(url) % P`` — resumable layout,
    SURVEY.md §4.3),
  - deterministic pseudo-confidence for HTML blocks (analog of the layout
    model's detection score, reference DLA.py:515 sort-by-score),
  - content hashes for exact dedup,
  - minhash / simhash token hashing.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1


def stable_hash64(s: str | bytes) -> int:
    """64-bit stable hash via blake2b (digest_size=8)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def stable_hash64_batch(values) -> np.ndarray:
    """Vector of 64-bit stable hashes (uint64) for an iterable of str/bytes."""
    out = np.empty(len(values), dtype=np.uint64)
    h = hashlib.blake2b
    for i, v in enumerate(values):
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif v is None:
            v = b""
        out[i] = int.from_bytes(h(v, digest_size=8).digest(), "big")
    return out


def md5_hex_batch(values) -> list[str]:
    """md5 hex digests — matches DuckDB's ``md5()`` for the dedup oracle."""
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out.append(hashlib.md5(v).hexdigest())
    return out


def pseudo_confidence(content: str) -> float:
    """Deterministic stand-in for a model detection score, in [0.5, 1.0).

    The reference sorts detections by model score descending (DLA.py:515) and
    that order drives placeholder/crop counters (DLA.py:605-616,
    ContentMasker.py:57-58). For the HTML branch there is no model, so the
    score is a stable function of the block content; any deterministic
    function preserves the reference's *structure* (counters follow
    score-descending order, not reading order).
    """
    return 0.5 + (stable_hash64(content) % 100_000) / 200_000.0


# ---------------------------------------------------------------------------
# MinHash / SimHash helpers (mergeable-sketch building blocks)
# ---------------------------------------------------------------------------

# Fixed seeded parameters for the minhash permutation family
# h_i(x) = (a_i * x + b_i) mod p  over the 61-bit Mersenne prime.
_MERSENNE61 = (1 << 61) - 1


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Minhash signature (uint64[num_perm]) of a set of 64-bit token hashes."""
    if token_hashes.size == 0:
        return np.full(a.shape[0], _MASK64, dtype=np.uint64)
    x = token_hashes.astype(np.object_)  # python ints: exact 128-bit products
    sigs = np.empty(a.shape[0], dtype=np.uint64)
    am = a.astype(np.object_)
    bm = b.astype(np.object_)
    for i in range(a.shape[0]):
        vals = (am[i] * x + bm[i]) % _MERSENNE61
        sigs[i] = int(min(vals))
    return sigs


def shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingles hashed to uint64. Lowercased, whitespace-tokenized."""
    toks = text.lower().split()
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return stable_hash64_batch(joined)


def simhash64(token_hashes: np.ndarray) -> int:
    """64-bit SimHash over pre-hashed tokens (unweighted)."""
    if token_hashes.size == 0:
        return 0
    bits = np.unpackbits(
        token_hashes.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    ).astype(np.int32)
    score = bits.sum(axis=0) * 2 - token_hashes.size
    out = 0
    for bit in (score > 0).astype(np.uint8):
        out = (out << 1) | int(bit)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
