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


def md5_hex_arrow(arr) -> list[str | None]:
    """md5 hex digests straight off an Arrow string/binary column.

    Hashes memoryview slices of the column's UTF-8 data buffer — no Python
    string boxing and no re-encode (Arrow strings already store UTF-8
    bytes, the exact input DuckDB's ``md5()`` hashes), so an Arrow-format
    dedup partial never converts the text column at all. NULL slots emit
    None (callers usually ``pc.coalesce`` to '' first)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        chunks = arr.chunks
    else:
        chunks = [arr]
    out: list[str | None] = []
    for ch in chunks:
        t = ch.type
        if pa.types.is_string(t) or pa.types.is_binary(t):
            odt = np.int32
        elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            odt = np.int64
        else:
            raise TypeError(f"md5_hex_arrow needs string/binary, got {t}")
        validity, offsets_buf, data_buf = ch.buffers()
        off = np.frombuffer(offsets_buf, dtype=odt, count=len(ch) + 1,
                            offset=ch.offset * np.dtype(odt).itemsize)
        data = memoryview(data_buf) if data_buf is not None else memoryview(b"")
        if validity is None or ch.null_count == 0:
            out.extend(
                hashlib.md5(data[off[i]:off[i + 1]]).hexdigest()
                for i in range(len(ch))
            )
        else:
            vb = np.frombuffer(validity, dtype=np.uint8)
            for i in range(len(ch)):
                j = i + ch.offset
                if (vb[j >> 3] >> (j & 7)) & 1:
                    out.append(hashlib.md5(data[off[i]:off[i + 1]]).hexdigest())
                else:
                    out.append(None)
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
# h_i(x) = a_i * x + b_i over uint64 with natural wraparound (multiply-shift
# family, a_i odd): fully vectorizable as one outer product per signature —
# no bigint arithmetic. Wraparound multiplication by an odd constant is a
# bijection on Z/2^64, so the family is a valid (deterministic) permutation
# family for MinHash.
_MERSENNE61 = (1 << 61) - 1


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)  # odd -> bijective modulo 2^64
    b = rng.randint(0, _MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Minhash signature (uint64[num_perm]) of a set of 64-bit token hashes.
    One (num_perm x n) wraparound outer product, min along tokens."""
    if token_hashes.size == 0:
        return np.full(a.shape[0], _MASK64, dtype=np.uint64)
    x = token_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * x[None, :] + b[:, None]
    return vals.min(axis=1)


def fast_token_hash(tokens) -> np.ndarray:
    """Vectorized (C-level) stable 64-bit hashes for a sequence of strings:
    pandas ``hash_array`` with its fixed default key — deterministic across
    processes and machines. Used on hot token paths (shingles, simhash);
    ``stable_hash64_batch`` (blake2b) remains the primitive for partition
    assignment and content identity.

    ``categorize`` produces IDENTICAL hash values (verified) but factorizes
    first, hashing each distinct string once — a measured ~17x win on large
    exploded token streams (natural text is Zipf-repetitive) and a loss on
    small or unique-heavy arrays, hence the size gate."""
    import pandas as pd

    arr = np.asarray(tokens, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(
        arr, categorize=arr.size >= 4096
    ).astype(np.uint64)


_SHINGLE_BASE = np.uint64(1099511628211)


def shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingles hashed to uint64: tokens hashed once (C-level), then
    each window combined with a positional polynomial (wraparound uint64) —
    no per-shingle string building or cryptographic hashing."""
    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    h = fast_token_hash(toks)
    if len(toks) < k:
        k = len(toks)
    powers = np.power(_SHINGLE_BASE, np.arange(k - 1, -1, -1, dtype=np.uint64))
    wins = np.lib.stride_tricks.sliding_window_view(h, k)
    with np.errstate(over="ignore"):
        return (wins * powers).sum(axis=1, dtype=np.uint64)


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
