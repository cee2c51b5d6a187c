"""Arrow list<float64> vector helpers (zero-copy where possible).

The reference assembles feature vectors as growing ``Vec<f64>`` via
``vector_append`` (src/types/row_value.rs:53-75).  Here a feature vector is a
``list<float64>`` Arrow column; assembly is a single horizontal concat of the
per-column 2-D numpy blocks — replacing the reference's N−1 binary joins
(src/feature_encoders/multi_column_encoder.rs:26-36), which the paper calls
its main bottleneck.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["list_array_from_2d", "list_column_to_2d", "hstack_to_list_array",
           "half_away"]


def half_away(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero — DuckDB's ROUND semantics.  ``np.round``
    and ``np.rint`` are banker's (half-to-even), which lands on the other
    side of exact .5 boundaries (e.g. cents built from 2-decimal money)."""
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def list_array_from_2d(arr: np.ndarray) -> pa.ListArray:
    """(n, L) float array → list<float64> array of n rows, each length L."""
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    n, length = arr.shape
    offsets = pa.array(np.arange(0, (n + 1) * length, length, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(arr.reshape(-1)))


def list_column_to_2d(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """list<float> column with uniform lengths → (n, L) float64 ndarray.

    Raises if row lengths differ (vector columns in this engine are
    fixed-width per stage; the tfidf/onehot growth cases re-emit full
    columns with the new width).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    length = int(lengths[0]) if len(lengths) else 0
    if not np.all(lengths == length):
        raise ValueError("ragged vector column; expected uniform lengths")
    # flatten() of a (possibly sliced) ListArray yields exactly the values
    # spanned by this array's offsets, so a straight reshape is safe.
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return flat.reshape(n, length)


def hstack_to_list_array(blocks: list[np.ndarray]) -> pa.ListArray:
    """Horizontal concat of (n, L_i) blocks → list<float64> of width ΣL_i."""
    return list_array_from_2d(np.hstack(blocks))
