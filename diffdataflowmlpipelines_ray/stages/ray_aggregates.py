"""The engine's accumulators as native Ray Data ``AggregateFn``s.

Lets users write idiomatic ``ds.groupby(key).aggregate(ChanMeanVar("x"))``
and get the same invertible monoid algebra the engine uses internally —
per-block vectorized accumulation, associative merge inside Ray's hash
aggregation, tiny finalized outputs.

(The engine's own fits use ``fit_partials`` — one partial per block with a
deterministic driver merge — because bitwise reproducibility at any
parallelism matters there; these wrappers trade that for drop-in Ray API
compatibility on grouped analytics.)
"""

from __future__ import annotations

import numpy as np
from ray.data.aggregate import AggregateFn

from ..state.aggregates import MeanVarAgg, MinMaxAgg
from .sketches_bridge import _hash_block

__all__ = ["ChanMeanVar", "MinMaxRange", "ApproxDistinct", "GroupedCorr"]


class ChanMeanVar(AggregateFn):
    """(mean, var_pop) per group via Chan's parallel merge."""

    def __init__(self, on: str, alias_name: str | None = None):
        def accumulate_block(acc: MeanVarAgg, block) -> MeanVarAgg:
            vals = block[on].to_numpy(zero_copy_only=False).astype(np.float64)
            return acc.merged(MeanVarAgg.from_numpy(vals))

        super().__init__(
            init=lambda k: MeanVarAgg(),
            merge=lambda a, b: a.merged(b),
            accumulate_block=accumulate_block,
            finalize=lambda a: dict(zip(("mean", "var"), a.get())),
            name=alias_name or f"meanvar({on})",
        )


class MinMaxRange(AggregateFn):
    """(min, range) per group — invertible value-count state."""

    def __init__(self, on: str, alias_name: str | None = None):
        def accumulate_block(acc: MinMaxAgg, block) -> MinMaxAgg:
            vals = block[on].to_numpy(zero_copy_only=False).astype(np.float64)
            return acc.merged(MinMaxAgg.from_numpy(vals))

        super().__init__(
            init=lambda k: MinMaxAgg(),
            merge=lambda a, b: a.merged(b),
            accumulate_block=accumulate_block,
            finalize=lambda a: dict(zip(("min", "range"), a.get())),
            name=alias_name or f"minmax({on})",
        )


class ApproxDistinct(AggregateFn):
    """HyperLogLog distinct estimate per group (sketch merge, no shuffle of
    values — only registers move)."""

    def __init__(self, on: str, p: int = 12, alias_name: str | None = None):
        from ..state.sketches import HyperLogLog

        def accumulate_block(acc: HyperLogLog, block) -> HyperLogLog:
            return acc.add_hashes(_hash_block(block[on]))

        super().__init__(
            init=lambda k: HyperLogLog(p),
            merge=lambda a, b: a.merged(b),
            accumulate_block=accumulate_block,
            finalize=lambda a: float(a.estimate()),
            name=alias_name or f"approx_distinct({on})",
        )


class GroupedMoments(AggregateFn):
    """Per-group order-4 moment statistics — mean, population variance,
    bias-corrected sample skewness and excess kurtosis (DuckDB
    skewness()/kurtosis() estimators) — from ONE exactly-invertible
    power-sum ``MomentsAgg`` accumulator per group (merge = vector add)."""

    def __init__(self, on: str, alias_name: str | None = None):
        from ..state.aggregates import MomentsAgg

        def accumulate_block(acc: MomentsAgg, block) -> MomentsAgg:
            v = block[on].to_numpy(zero_copy_only=False).astype(np.float64)
            return acc.merged(MomentsAgg.from_numpy(v))

        super().__init__(
            init=lambda k: MomentsAgg(),
            merge=lambda a, b: a.merged(b),
            accumulate_block=accumulate_block,
            finalize=lambda a: a.get(),
            name=alias_name or f"moments({on})",
        )


class GroupedCorr(AggregateFn):
    """Per-group bivariate statistics — population covariance, Pearson
    correlation, least-squares slope — from ONE ``CoMomentAgg`` accumulator
    (bivariate Chan merge; no second pass, no per-group row materialization)."""

    def __init__(self, x: str, y: str, alias_name: str | None = None):
        from ..state.aggregates import CoMomentAgg

        def accumulate_block(acc: CoMomentAgg, block) -> CoMomentAgg:
            xs = block[x].to_numpy(zero_copy_only=False).astype(np.float64)
            ys = block[y].to_numpy(zero_copy_only=False).astype(np.float64)
            return acc.merged(CoMomentAgg.from_numpy(xs, ys))

        super().__init__(
            init=lambda k: CoMomentAgg(),
            merge=lambda a, b: a.merged(b),
            accumulate_block=accumulate_block,
            finalize=lambda a: a.get(),
            name=alias_name or f"corr({x},{y})",
        )
