"""Stable, documented hash functions.

The reference's ``HashVectorizer`` uses Rust's ``DefaultHasher``
(`src/feature_encoders/feature_extraction/hash_vectorizer.rs:36-41`), whose
output is explicitly unspecified across releases.  For deterministic goldens
and SQL-checkable oracles we standardize on an MD5-derived 60-bit hash that
DuckDB can reproduce exactly:

    python : int(md5(token.encode()).hexdigest()[:15], 16)
    duckdb : ('0x' || substr(md5(token), 1, 15))::BIGINT

(60 bits fits BIGINT; identical bit patterns on both sides.)
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["stable_hash60", "stable_hash60_array", "fast_hash64_array",
           "poly_hash64_array", "STABLE_HASH_SQL", "POLY_HASH_SQL"]

#: DuckDB expression template computing the same value as ``stable_hash60``.
STABLE_HASH_SQL = "(('0x' || substr(md5({col}), 1, 15))::BIGINT)"

# --- poly_hash64: vectorized AND SQL-reproducible ------------------------
#: seed = FNV-64 offset basis, base = 1000003 (CPython's string-hash base);
#: finalizer multiplies by 2^64/phi (odd) so a low-bit difference (last-char
#: edit) spreads into the high bits the bucket is drawn from.
_POLY_SEED = 14695981039346656037
_POLY_BASE = 1000003
_POLY_FIN = 0x9E3779B97F4A7C15  # 11400714819323198485
_POLY_FIN_HI = _POLY_FIN >> 32  # 2654435769
_POLY_FIN_LO = _POLY_FIN & 0xFFFFFFFF  # 2135587861

#: DuckDB expression template computing the same value as
#: ``poly_hash64_array`` for one VARCHAR ``{col}``: the codepoint polynomial
#: runs in HUGEINT (max intermediate < 2^85), the finalizer multiply is
#: split 32/32 so no intermediate exceeds 2^97 — both mod 2^64 at each step,
#: exactly the numpy uint64 wraparound.
POLY_HASH_SQL = (
    "((hp * 2135587861 + ((hp % 4294967296) * 2654435769 % 4294967296)"
    " * 4294967296) % 18446744073709551616)"
    .replace("hp", (
        "list_reduce(list_prepend(14695981039346656037::HUGEINT, "
        "list_transform(range(1, length({col})+1), "
        "i -> unicode(substr({col}, i, 1))::HUGEINT)), "
        "(a, c) -> (a * 1000003 + c) % 18446744073709551616::HUGEINT)"))
)


def poly_hash64_array(tokens) -> np.ndarray:
    """Vectorized 64-bit codepoint-polynomial hash → uint64 array.

    h = fold(seed, h*B + codepoint) mod 2^64, then one 64-bit odd-constant
    finalizer multiply — all in numpy uint64 wraparound, O(max_token_len)
    column passes over the whole batch (no per-string Python loop).  Unlike
    the polars/xxhash path it is BOTH fast and exactly reproducible in
    DuckDB (``POLY_HASH_SQL``), so feature-hashing built on it is
    oracle-checkable per bucket.  Draw buckets from the HIGH bits
    (``(h >> 32) % n``): the polynomial's low bits only mix ``B mod 2^k``.
    """
    if hasattr(tokens, "to_pylist"):
        tokens = tokens.to_pylist()
    arr = np.asarray(tokens, dtype="U")
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    maxlen = max(arr.dtype.itemsize // 4, 1)
    cp = arr.view(np.uint32).reshape(n, maxlen).astype(np.uint64)
    h = np.full(n, np.uint64(_POLY_SEED), dtype=np.uint64)
    B = np.uint64(_POLY_BASE)
    for j in range(maxlen):
        col = cp[:, j]
        mask = col != 0  # NUL never occurs in real tokens → padding sentinel
        if not mask.any():
            break
        h[mask] = h[mask] * B + col[mask]
    g = (h * np.uint64(_POLY_FIN_LO)
         + ((h & np.uint64(0xFFFFFFFF)) * np.uint64(_POLY_FIN_HI))
         * np.uint64(2 ** 32))
    return g


def stable_hash60(token: str) -> int:
    """60-bit stable hash of a UTF-8 string (first 15 hex chars of MD5)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)


def fast_hash64_array(tokens, seed: int = 42) -> np.ndarray:
    """Vectorized 64-bit string hash (polars/xxhash, ~100× faster than the
    MD5 loop) → uint64 array.

    Deterministic for a fixed polars build + seed — used where no SQL oracle
    must reproduce the hash (token-id derivation, minhash/simhash bases,
    fingerprints).  Falls back to the MD5 hash when polars is unavailable.
    ``tokens`` may be a pyarrow Array/ChunkedArray or a list of str.
    """
    try:
        import os

        # one rayon thread per worker: Ray already runs one task per CPU, a
        # full polars pool in every worker oversubscribes the node ~32×
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl
    except ImportError:  # pragma: no cover - polars is baked into the image
        toks = tokens.to_pylist() if hasattr(tokens, "to_pylist") else list(tokens)
        return stable_hash60_array(toks).astype(np.uint64)
    import pyarrow as pa

    if isinstance(tokens, (pa.Array, pa.ChunkedArray)):
        series = pl.from_arrow(tokens)
    else:
        series = pl.Series(list(tokens))
    return series.hash(seed=seed).to_numpy().astype(np.uint64)


def stable_hash60_array(tokens) -> np.ndarray:
    """Vectorized-ish stable hash over an iterable of strings → int64 array.

    MD5 has no numpy kernel; this is a tight C-backed loop via hashlib.  Used
    for token→bucket mapping where the token list per batch is modest; for
    giant vocabularies prefer hashing once at vocab build and broadcasting.
    """
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(t.encode("utf-8")).hexdigest()[:15], 16) for t in tokens),
        dtype=np.int64,
        count=len(tokens),
    )
