"""Distributed isotonic regression — monotone calibration (the
classifier-calibration / dose-response primitive): fit the non-decreasing
step function minimizing Σ w·(y − ŷ)² via Pool-Adjacent-Violators.

PAVA pools are MERGEABLE: a pool is (Σwy, Σw) and two adjacent pools
violate monotonicity iff mean₁ > mean₂ — checked EXACTLY by integer
cross-multiplication when y is integer cents (``swy₁·w₂ > swy₂·w₁`` in
Python big ints), so the fit is bit-deterministic at any partitioning.

Plan: ONE range-partitioned sort by x, each block runs the linear-time
stack PAVA over its own rows and emits its pool list — O(pools) ≪ rows
(violations collapse); the driver concatenates the block pool lists in
x order and runs the SAME stack PAVA over pools, merging across block
boundaries.  Driver work is O(Σ block pools) — the documented tier bound
(the skyline-merge contract); a rows-scale pool list means the data was
globally anti-monotone, in which case the answer itself is tiny (one
pool) after one more merge level.

No SQL twin exists (the merge recursion isn't expressible) — the gate is
rows-only; exactness is pinned by pytest against an independent
reference and the pool invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["isotonic_fit"]


def _pava(x_lo: np.ndarray, x_hi: np.ndarray, swy: np.ndarray,
          sw: np.ndarray) -> list[tuple]:
    """Stack PAVA over (already x-sorted) pools; exact integer mean
    comparisons via cross-multiplication in Python ints."""
    out: list[list] = []
    for i in range(len(swy)):
        cur = [int(x_lo[i]), int(x_hi[i]), int(swy[i]), int(sw[i])]
        while out and out[-1][2] * cur[3] > cur[2] * out[-1][3]:
            prev = out.pop()
            cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        out.append(cur)
    return [tuple(p) for p in out]


def isotonic_fit(ds, x_col: str, y_cents_col: str,
                 w_col: str | None = None) -> pd.DataFrame:
    """→ pandas DataFrame (x_lo, x_hi, sum_cents, weight, mean) — the
    fitted monotone step function's pools, x in integer units (caller
    quantizes), y in integer cents, optional integer weights.

    Correctness shape: equal-x rows MUST collapse to one weighted point
    BEFORE any pooling decision (sklearn's tie handling — and the reason
    there's a pre-aggregation exchange: a distinct x split across two
    sort blocks would let a block pool against PARTIAL x weight, a
    decision the global fit might not make).  After that, in-block stack
    PAVA pools are subsets of the global solution's level sets (the
    pooling lemma: adjacent violators always merge in the optimum), so
    the driver's PAVA over the O(Σ block pools) summaries completes the
    exact global fit."""
    def pre(tbl: pa.Table) -> pa.Table:
        x = tbl[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = tbl[y_cents_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        w = (tbl[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
             if w_col else np.ones(len(x), dtype=np.int64))
        g = (pd.DataFrame({"x": x, "wy": y * w, "w": w})
             .groupby("x", as_index=False).sum())
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    # one distinct-x point per row, then range-partitioned order
    agg = (ds.map_batches(pre, batch_format="pyarrow")
           .groupby("x").sum(["wy", "w"])
           .map_batches(lambda t: t.rename_columns(["x", "wy", "w"]),
                        batch_format="pyarrow"))
    S = agg.sort("x").materialize()

    def block_pava(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"x_lo": pa.array([], type=pa.int64()),
                          "x_hi": pa.array([], type=pa.int64()),
                          "swy": pa.array([], type=pa.int64()),
                          "sw": pa.array([], type=pa.int64())})
        if "x" not in tbl.column_names or tbl.num_rows == 0:
            return empty
        xs = tbl["x"].to_numpy(zero_copy_only=False)
        pools = _pava(xs, xs,
                      tbl["wy"].to_numpy(zero_copy_only=False),
                      tbl["w"].to_numpy(zero_copy_only=False))
        lo, hi, swy, sw = zip(*pools)
        return pa.table({"x_lo": pa.array(lo, type=pa.int64()),
                         "x_hi": pa.array(hi, type=pa.int64()),
                         "swy": pa.array(swy, type=pa.int64()),
                         "sw": pa.array(sw, type=pa.int64())})

    parts = []
    for b in (S.map_batches(block_pava, batch_size=None,
                            batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        if b.num_rows:
            parts.append(b.to_pandas())
    if not parts:
        return pd.DataFrame({"x_lo": [], "x_hi": [], "sum_cents": [],
                             "weight": [], "mean": []})
    pdf = (pd.concat(parts, ignore_index=True)
           .sort_values(["x_lo", "x_hi"]).reset_index(drop=True))
    pools = _pava(pdf["x_lo"].to_numpy(), pdf["x_hi"].to_numpy(),
                  pdf["swy"].to_numpy(), pdf["sw"].to_numpy())
    lo, hi, swy, sw = zip(*pools)
    out = pd.DataFrame({"x_lo": lo, "x_hi": hi, "sum_cents": swy,
                        "weight": sw}).astype(np.int64)
    out["mean"] = out["sum_cents"] / out["weight"]  # IEEE, reported
    return out
