r"""Survival analysis at scale: the Kaplan–Meier product-limit estimator.

KM is the canonical time-to-event curve (churn, hardware failure, job
completion): with ``d_t`` observed events and ``n_t`` subjects still at
risk at time ``t``,

    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

The whole computation reduces to integer count algebra plus one log:

1. durations quantize to int64 micro-units (half-away — collisions merge
   onto one grid point, which IS the estimator's event-time grid);
2. per-time (events, total) counts: block-local pre-aggregation, one
   narrow ``groupby(t)`` exchange of count rows;
3. the risk set ``n_t`` = suffix count = total − exclusive prefix sum of
   counts under the time order — the distributed scan
   (``ordered_prefix_sum``, integer-only by contract);
4. each event time contributes ``ln((n_t − d_t)/n_t)`` — the IEEE
   division of two exact int64s then the same libm log on both twins —
   half-away-rounded to int64 micro-nats;
5. ``ln S(t)`` is the running prefix sum of those int64 terms — exact at
   any split, so the gate is bit-equal (exp() is left to the consumer,
   the ``bigram_logprob_scores`` convention).

Returns one row per event-time grid point that had ≥1 observed event:
``(t_micro, n_risk, d, km_log_micro)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.vectors import half_away

__all__ = ["kaplan_meier", "nelson_aalen"]


def kaplan_meier(ds, time_col: str, event_col: str):
    """``event_col``: 1/True = observed event, 0/False = right-censored.
    → pandas DataFrame (t_micro, n_risk, d, km_log_micro)."""
    from .relational import ordered_prefix_sum

    def part(tbl: pa.Table) -> pa.Table:
        t = half_away(tbl[time_col].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * 1e6).astype(np.int64)
        ev = tbl[event_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pdf = (pd.DataFrame({"t_micro": t, "d": ev})
               .groupby("t_micro", as_index=False)
               .agg(d=("d", "sum"), c=("d", "size")))
        return pa.Table.from_pandas(
            pdf.astype({"d": np.int64, "c": np.int64}),
            preserve_index=False)

    per_t = (ds.map_batches(part, batch_format="pyarrow")
             .groupby("t_micro").sum(["d", "c"])
             .map_batches(lambda t: t.rename_columns(
                 ["t_micro", "d", "c"]), batch_format="pyarrow")
             .materialize())

    # n_risk = total − (count of strictly earlier durations): the
    # distributed exclusive scan over the unique time grid
    with_prefix = ordered_prefix_sum(per_t, "t_micro", "c",
                                     out_col="before",
                                     exclusive=True).materialize()

    total = 0
    for r in with_prefix.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(t["c"].to_numpy(zero_copy_only=False).sum())
                 if "c" in t.column_names else 0], type=pa.int64())}),
            batch_format="pyarrow").take_all():
        total += int(r["n"])

    def term(tbl: pa.Table) -> pa.Table:
        if "d" not in tbl.column_names:  # zero-column empty block
            return pa.table({"t_micro": pa.array([], type=pa.int64()),
                             "n_risk": pa.array([], type=pa.int64()),
                             "d": pa.array([], type=pa.int64()),
                             "term_micro": pa.array([],
                                                    type=pa.int64())})
        d = tbl["d"].to_numpy(zero_copy_only=False)
        before = tbl["before"].to_numpy(zero_copy_only=False)
        n = total - before
        # event times only; the grid point where the curve hits exactly
        # zero (n == d) is excluded — ln S = −∞ there (documented: the
        # standard log-scale presentation stops at the last survivor)
        keep = (d > 0) & (n > d)
        d, n = d[keep], n[keep]
        # the identical IEEE (n-d)/n then the same libm log on both twins
        tm = half_away(np.log(
            (n - d).astype(np.float64) / n.astype(np.float64)) * 1e6
        ).astype(np.int64)
        return pa.table({
            "t_micro": pa.array(
                tbl["t_micro"].to_numpy(zero_copy_only=False)[keep]),
            "n_risk": pa.array(n.astype(np.int64)),
            "d": pa.array(d.astype(np.int64)),
            "term_micro": pa.array(tm),
        })

    ev = with_prefix.map_batches(term, batch_format="pyarrow")
    # ln S(t): the inclusive int64 scan of the per-event-time terms —
    # exact at any split (the second distributed prefix sum)
    out = ordered_prefix_sum(ev, "t_micro", "term_micro",
                             out_col="km_log_micro",
                             exclusive=False).to_pandas()
    if out.shape[1] == 0:  # empty domain: typed zero-row (tiny_sweep)
        out = pd.DataFrame(columns=["t_micro", "n_risk", "d",
                                    "km_log_micro"])
    out = out.sort_values("t_micro").reset_index(drop=True)
    return (out[["t_micro", "n_risk", "d", "km_log_micro"]]
            .astype(np.int64))


def nelson_aalen(ds, time_col: str, event_col: str):
    """Nelson–Aalen cumulative hazard — KM's additive sibling and the
    preferred estimator when hazards (not survival) are the report:

        H(t) = Σ_{t_i ≤ t} d_i / n_i

    Identical plan to `kaplan_meier` (block-local per-time counts, one
    narrow ``groupby(t)`` exchange, the distributed exclusive scan for
    the risk set) but with NO libm anywhere: each event time
    contributes the exact integer ``(10⁶·d_i) // n_i`` micro-hazard
    (operands positive, so floor-div equals the twin's truncating //)
    and ``H`` is the inclusive int64 scan of those terms — bit-exact
    at any split.  Unlike KM's log form, the ``n == d`` grid point is
    kept (the hazard term is finite there).  → pandas frame
    ``(t_micro, n_risk, d, na_micro)`` over event times."""
    from .relational import ordered_prefix_sum

    def part(tbl: pa.Table) -> pa.Table:
        t = half_away(tbl[time_col].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * 1e6).astype(np.int64)
        ev = tbl[event_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pdf = (pd.DataFrame({"t_micro": t, "d": ev})
               .groupby("t_micro", as_index=False)
               .agg(d=("d", "sum"), c=("d", "size")))
        return pa.Table.from_pandas(
            pdf.astype({"d": np.int64, "c": np.int64}),
            preserve_index=False)

    per_t = (ds.map_batches(part, batch_format="pyarrow")
             .groupby("t_micro").sum(["d", "c"])
             .map_batches(lambda t: t.rename_columns(
                 ["t_micro", "d", "c"]), batch_format="pyarrow")
             .materialize())
    with_prefix = ordered_prefix_sum(per_t, "t_micro", "c",
                                     out_col="before",
                                     exclusive=True).materialize()
    total = 0
    for r in with_prefix.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(t["c"].to_numpy(zero_copy_only=False).sum())
                 if "c" in t.column_names else 0], type=pa.int64())}),
            batch_format="pyarrow").take_all():
        total += int(r["n"])

    def term(tbl: pa.Table) -> pa.Table:
        if "d" not in tbl.column_names:
            return pa.table({"t_micro": pa.array([], type=pa.int64()),
                             "n_risk": pa.array([], type=pa.int64()),
                             "d": pa.array([], type=pa.int64()),
                             "term_micro": pa.array([],
                                                    type=pa.int64())})
        d = tbl["d"].to_numpy(zero_copy_only=False)
        before = tbl["before"].to_numpy(zero_copy_only=False)
        n = total - before
        keep = d > 0
        d, n = d[keep], n[keep]
        tm = 1_000_000 * d // n
        return pa.table({
            "t_micro": pa.array(
                tbl["t_micro"].to_numpy(zero_copy_only=False)[keep]),
            "n_risk": pa.array(n.astype(np.int64)),
            "d": pa.array(d.astype(np.int64)),
            "term_micro": pa.array(tm.astype(np.int64)),
        })

    ev = with_prefix.map_batches(term, batch_format="pyarrow")
    out = ordered_prefix_sum(ev, "t_micro", "term_micro",
                             out_col="na_micro",
                             exclusive=False).to_pandas()
    if out.shape[1] == 0:  # empty domain: typed zero-row (tiny_sweep)
        out = pd.DataFrame(columns=["t_micro", "n_risk", "d", "na_micro"])
    out = out.sort_values("t_micro").reset_index(drop=True)
    return (out[["t_micro", "n_risk", "d", "na_micro"]]
            .astype(np.int64))
