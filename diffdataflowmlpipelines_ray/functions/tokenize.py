r"""Tokenization utilities (vectorized over Arrow batches).

Reference tokenizer: split on any whitespace, drop empties
(`src/feature_encoders/feature_extraction/utils.rs:3-9`).  The Arrow kernel
``pc.split_pattern_regex(col, r"\s+")`` matches those semantics after
filtering empty strings (a leading separator yields one empty token).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["default_tokenizer", "tokenize_column", "flatten_tokens"]

_WS = re.compile(r"\s+")


def default_tokenizer(s: str) -> list[str]:
    """Whitespace split, empties dropped — utils.rs:3-9 (scalar form)."""
    return [t for t in _WS.split(s) if t]


def tokenize_column(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """string column → list<string> of whitespace tokens (vectorized).

    Empty tokens (from leading/trailing/multiple whitespace) are removed so the
    result matches ``default_tokenizer`` row-wise.
    """
    toks = pc.split_pattern_regex(col, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # drop empty strings: flatten, mask, rebuild offsets
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    # per-list counts of kept tokens
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    keep_np = keep.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(keep_np, dtype=np.int64)])
    counts = csum[offsets[1:]] - csum[offsets[:-1]]
    new_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    kept_flat = flat.filter(keep)
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), kept_flat)


def flatten_tokens(tokens: pa.ListArray, ids: pa.Array | np.ndarray) -> tuple[pa.Array, np.ndarray]:
    """(list<token> column, per-row ids) → (flat token array, repeated ids)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False)
    lengths = offsets[1:] - offsets[:-1]
    ids_np = ids if isinstance(ids, np.ndarray) else np.asarray(ids)
    return tokens.flatten(), np.repeat(ids_np, lengths)
