"""Shared helpers for sketch-based aggregates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_block(col) -> np.ndarray:
    """Arrow column → uint64 hashes (strings via fast xxhash, numerics via
    pandas' stable hasher)."""
    from ..functions.hashing import fast_hash64_array

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return fast_hash64_array(col)
    import pandas as pd

    return pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy()
