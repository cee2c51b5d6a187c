"""Mergeable sketches — approximate aggregates in the same partial/merge
shape as the exact monoids (per-block vectorized build, associative merge).

The reference has no sketches (SURVEY §2.6); at 10^12-sequence scale they are
how you answer "how many distinct tokens/documents" without a shuffle:
one sketch per block, a tree of register-wise maxima, one tiny object at the
driver.

- ``HyperLogLog`` — approximate distinct count, standard 2^p registers with
  the Flajolet–Martin bias-corrected estimator + linear counting for the
  small range.  Not invertible (sketches are semigroups, not groups):
  retraction is out of scope by construction.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HyperLogLog", "approx_distinct"]


class HyperLogLog:
    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # ------------------------------------------------------------------ build
    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        """Vectorized insert of pre-hashed 64-bit values (use
        ``functions.hashing.fast_hash64_array`` for strings)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = position of the leftmost 1 bit in the remaining 64-p bits + 1
        nbits = 64 - self.p
        ranks = np.ones(h.size, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        # vectorized leading-zero count via float log2 would lose precision;
        # loop over BITS (≤ 50 iterations of whole-array ops), not elements
        remaining = np.ones(h.size, dtype=bool)
        for r in range(1, nbits + 2):
            top = (cur & mask) != 0
            done = remaining & top
            ranks[done] = r
            remaining &= ~top
            if not remaining.any():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, ranks)
        return self

    # ------------------------------------------------------------------ merge
    def merge(self, other: "HyperLogLog") -> None:
        if other.p != self.p:
            raise ValueError("p mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)

    def merged(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        out.registers = self.registers.copy()
        out.merge(other)
        return out

    # --------------------------------------------------------------- estimate
    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return raw


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Two-phase approximate distinct over a Dataset column: one HLL per
    block (vectorized), register-max merge at the driver.  No shuffle."""
    import pickle

    import pyarrow as pa

    from ..functions.hashing import fast_hash64_array

    def per_block(tbl: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        colv = tbl[col]
        if pa.types.is_string(colv.type) or pa.types.is_large_string(colv.type):
            hashes = fast_hash64_array(colv.combine_chunks() if isinstance(
                colv, pa.ChunkedArray) else colv)
        else:
            import pandas as pd

            vals = colv.to_pandas()
            hashes = pd.util.hash_pandas_object(vals, index=False).to_numpy()
        hll.add_hashes(hashes)
        return pa.table({"sketch": pa.array([pickle.dumps(hll.registers)],
                                            type=pa.binary())})

    acc = HyperLogLog(p)
    for row in ds.map_batches(per_block, batch_format="pyarrow").take_all():
        other = HyperLogLog(p)
        other.registers = pickle.loads(row["sketch"])
        acc.merge(other)
    return acc.estimate()
