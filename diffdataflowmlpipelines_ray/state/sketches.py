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

__all__ = ["HyperLogLog", "approx_distinct", "HistogramSketch",
           "approx_quantiles", "heavy_hitters"]


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


class HistogramSketch:
    """Mergeable fixed-range histogram → approximate quantiles.

    Two-phase plan: a min/max pass fixes the range (reuse the MinMaxAgg
    partials), then per-block vectorized ``np.histogram`` counts merge by
    vector addition — the simplest exactly-mergeable quantile structure.
    Quantile error ≤ bin width (range / bins).
    """

    def __init__(self, lo: float, hi: float, bins: int = 4096):
        self.lo = float(lo)
        self.hi = float(hi)
        self.bins = int(bins)
        self.counts = np.zeros(self.bins, dtype=np.int64)
        self.n = 0

    def add(self, values: np.ndarray) -> "HistogramSketch":
        v = np.asarray(values, dtype=np.float64)
        if v.size:
            c, _ = np.histogram(v, bins=self.bins, range=(self.lo, self.hi))
            self.counts += c
            self.n += v.size
        return self

    def merge(self, other: "HistogramSketch") -> None:
        assert (self.lo, self.hi, self.bins) == (other.lo, other.hi, other.bins)
        self.counts += other.counts
        self.n += other.n

    def quantile(self, q: float) -> float:
        if self.n == 0:
            raise ValueError("empty sketch")
        target = q * self.n
        cum = np.cumsum(self.counts)
        i = int(np.searchsorted(cum, target))
        i = min(i, self.bins - 1)
        width = (self.hi - self.lo) / self.bins
        # linear interpolation within the bin
        prev = cum[i - 1] if i > 0 else 0
        inbin = self.counts[i]
        frac = (target - prev) / inbin if inbin else 0.0
        return self.lo + (i + frac) * width


def approx_quantiles(ds, col: str, qs, bins: int = 4096) -> list[float]:
    """Two-pass approximate quantiles: min/max partials → histogram partials
    → merged sketch.  Error ≤ (max−min)/bins; no sort, no shuffle."""
    import pickle

    import pyarrow as pa

    from .aggregates import MinMaxAgg, merge_all

    def mm_block(tbl: pa.Table) -> pa.Table:
        acc = MinMaxAgg.from_numpy(
            tbl[col].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table({"p": pa.array([pickle.dumps(acc)], type=pa.binary())})

    parts = [pickle.loads(r["p"]) for r in
             ds.map_batches(mm_block, batch_format="pyarrow").take_all()]
    lo, rng_ = merge_all(parts).get()
    hi = lo + rng_ if rng_ > 0 else lo + 1.0

    def hist_block(tbl: pa.Table) -> pa.Table:
        sk = HistogramSketch(lo, hi, bins)
        sk.add(tbl[col].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"p": pa.array([pickle.dumps((sk.counts, sk.n))],
                                       type=pa.binary())})

    acc = HistogramSketch(lo, hi, bins)
    for r in ds.map_batches(hist_block, batch_format="pyarrow").take_all():
        counts, n = pickle.loads(r["p"])
        acc.counts += counts
        acc.n += n
    return [acc.quantile(float(q)) for q in qs]


def heavy_hitters(ds, col: str, k: int, m: int | None = None):
    """PROVABLY-exact top-k frequent values with NO shuffle: per-block
    top-``m`` candidate summaries (one pass) + an exact recount of the
    potential winners (second pass) + a proof check.

    A value dropped from EVERY block's top-m has total count ≤ U = Σ per-
    block smallest-kept counts; if the k-th recounted candidate's exact
    count ≥ U, no non-candidate can displace it and the result equals the
    exact top-k (the bucketed-shuffle ``token_freq_topk`` path computes the
    same answer WITH a shuffle).  Raises when not provable — raise ``m``.
    Driver holds O(blocks × m) candidate partials; corpus values never
    move.  Returns pandas (col, cnt) sorted (cnt DESC, value ASC)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    m = m or max(8 * k, 256)

    def top_block(tbl: pa.Table) -> pa.Table:
        arr = tbl[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # nulls are excluded from the count (SQL COUNT(col) semantics); a
        # null-valued count row would otherwise be mistaken for the bound
        # sentinel and corrupt both U and the candidate set
        arr = arr.drop_null()
        vc = pc.value_counts(arr)
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(-cnts, kind="stable")[:m]
        # dropped values (if any) each have count ≤ the smallest KEPT count
        bound = int(cnts[order[-1]]) if len(cnts) > m else 0
        # the block's bound rides in an explicit flag column, not a null
        # value sentinel
        return pa.table({
            "v": pa.array([vals[i] for i in order] + [None]),
            "c": pa.array(np.append(cnts[order], bound)),
            "is_bound": pa.array([False] * len(order) + [True]),
        })

    lower: dict = {}
    U = 0
    for r in ds.map_batches(top_block, batch_format="pyarrow").take_all():
        if r["is_bound"]:
            U += int(r["c"])
        else:
            lower[r["v"]] = lower.get(r["v"], 0) + int(r["c"])
    if not lower:
        return pd.DataFrame({col: [], "cnt": []})
    low_sorted = sorted(lower.items(), key=lambda kv: (-kv[1], kv[0]))
    kth_lower = low_sorted[min(k, len(low_sorted)) - 1][1]
    # only candidates that could still reach the top-k need the exact pass
    cand_ref = ray.put({v for v, c in lower.items() if c + U >= kth_lower})

    def recount(tbl: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        arr = tbl[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = pc.value_counts(arr)
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = [i for i, v in enumerate(vals) if v in cset]
        return pa.table({"v": pa.array([vals[i] for i in keep]),
                         "c": pa.array(cnts[keep])})

    exact: dict = {}
    for r in ds.map_batches(recount, batch_format="pyarrow").take_all():
        exact[r["v"]] = exact.get(r["v"], 0) + int(r["c"])
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    # strict >: a dropped value with count == U could TIE the k-th candidate
    # and win the (cnt DESC, value ASC) tie-break; U == 0 means nothing was
    # ever dropped, so the candidate set is complete regardless
    if len(top) >= k and U > 0 and top[-1][1] <= U:
        raise RuntimeError(
            f"heavy_hitters not provably exact: kth count {top[-1][1]} <= "
            f"dropped-mass bound {U}; raise m (currently {m})")
    return pd.DataFrame({col: [v for v, _ in top],
                         "cnt": np.array([c for _, c in top], dtype=np.int64)})
