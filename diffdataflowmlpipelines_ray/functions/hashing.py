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
           "STABLE_HASH_SQL"]

#: DuckDB expression template computing the same value as ``stable_hash60``.
STABLE_HASH_SQL = "(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


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
