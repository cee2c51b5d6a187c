"""Unit tests for the monoid algebra, mirroring the reference's Rust algebra.

Reference goldens ported from:
- standard_scaler.rs:123-166  (values 0..9 → mean 4.5, pop var 8.25)
- minmax_scaler.rs:169-213    (i%5 → min 0, range 4)
- integer_assignment_aggregate.rs (slot stability, free list, len policy)
- tfidf_transformer.rs:90-173 (element-wise freq merge, resize, negate)
"""

import math
import random

import numpy as np
import pytest

from diffdataflowmlpipelines_ray.state.aggregates import (
    DocumentFrequencyAgg,
    MeanVarAgg,
    MinMaxAgg,
    PositionAssignmentAgg,
    SumCountAgg,
    merge_all,
    round_to_decimal,
    rust_round,
)


def test_rust_round_half_away_from_zero():
    assert rust_round(4.5) == 5  # Python round() would give 4
    assert rust_round(-4.5) == -5
    assert rust_round(2.4) == 2
    assert round_to_decimal(123.456, -1) == pytest.approx(123.5)
    assert round_to_decimal(123.456, 1) == pytest.approx(120.0)


class TestMeanVar:
    def test_golden_0_to_9(self):
        agg = MeanVarAgg.from_numpy(np.arange(10))
        mean, var = agg.get()
        assert mean == pytest.approx(4.5)
        assert var == pytest.approx(8.25)  # population variance, not sample

    def test_merge_equals_single_pass(self):
        rng = np.random.default_rng(7)
        xs = rng.normal(3.0, 2.0, size=1000)
        whole = MeanVarAgg.from_numpy(xs)
        parts = [MeanVarAgg.from_numpy(xs[i : i + 100]) for i in range(0, 1000, 100)]
        merged = merge_all(parts)
        m1, v1 = whole.get()
        m2, v2 = merged.get()
        assert m1 == pytest.approx(m2)
        assert v1 == pytest.approx(v2)

    def test_per_row_algebra_matches_batch(self):
        # from_numpy (vectorized) must equal folding per-row VarianceAggregate::new
        xs = [1.0, 5.0, 5.0, -2.0]
        acc = MeanVarAgg()
        for x in xs:
            acc.merge(MeanVarAgg.of(x, 1))
        batch = MeanVarAgg.from_numpy(np.array(xs))
        assert acc.get()[0] == pytest.approx(batch.get()[0])
        assert acc.get()[1] == pytest.approx(batch.get()[1])

    def test_retraction_restores_state(self):
        xs = np.arange(10).astype(float)
        extra = np.array([100.0, -3.0])
        acc = MeanVarAgg.from_numpy(xs)
        add = MeanVarAgg.from_numpy(extra)
        acc.merge(add)
        acc.merge(add.negated())
        m, v = acc.get()
        assert m == pytest.approx(4.5)
        assert v == pytest.approx(8.25)
        assert acc.count == 10

    def test_weighted_diffs(self):
        xs = np.array([1.0, 2.0, 3.0, 2.0])
        w = np.array([1, 1, 1, -1])  # insert 1,2,3 and retract a 2
        agg = MeanVarAgg.from_numpy(xs, w)
        ref = MeanVarAgg.from_numpy(np.array([1.0, 3.0]))
        # retraction of one of two 2s: net = {1,2,3} minus {2} = {1,3}
        net = MeanVarAgg.from_numpy(np.array([1.0, 2.0, 3.0]))
        net.merge(MeanVarAgg.of(2.0, 1).negated())
        assert agg.count == 2
        assert agg.get()[0] == pytest.approx(net.get()[0]) == pytest.approx(ref.get()[0])
        assert agg.get()[1] == pytest.approx(ref.get()[1])


class TestMinMax:
    def test_golden_mod5(self):
        xs = np.array([i % 5 for i in range(10)], dtype=float)
        mn, rng_ = MinMaxAgg.from_numpy(xs).get()
        assert (mn, rng_) == (0.0, 4.0)

    def test_retraction_exposes_next_extreme(self):
        agg = MinMaxAgg.from_numpy(np.array([1.0, 5.0, 9.0]))
        agg.merge(MinMaxAgg.of(9.0, -1))  # retract current max
        mn, rng_ = agg.get()
        assert (mn, mn + rng_) == (1.0, 5.0)

    def test_merge_commutes(self):
        a = MinMaxAgg.from_numpy(np.array([3.0, 3.0, 7.0, 7.0]))
        b = MinMaxAgg.from_numpy(np.array([1.0, 7.0]), np.array([1, -1]))
        ab = a.merged(b)
        ba = b.merged(a)
        assert ab.counts == ba.counts
        assert ab.get() == (1.0, 6.0)  # one 7 retracted, one survives

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            MinMaxAgg().get()


class TestPositionAssignment:
    def test_stable_slots_first_seen(self):
        agg = PositionAssignmentAgg()
        for v in ["b", "a", "c"]:
            agg.merge(PositionAssignmentAgg.of_value(v, 1))
        m, ln = agg.get_map_and_len()
        assert m == {"b": 0, "a": 1, "c": 2}
        assert ln >= 3

    def test_len_growth_x15_rust_rounding(self):
        # len sequence from 1 with ×1.5 Rust rounding: 1,2,3,5(round(4.5)),8,...
        agg = PositionAssignmentAgg()
        lens = []
        for i in range(6):
            agg.merge(PositionAssignmentAgg.of_value(f"v{i}", 1))
            lens.append(agg.len)
        assert lens == [1, 2, 3, 5, 5, 8]

    def test_free_list_reuse(self):
        agg = PositionAssignmentAgg()
        for v in ["a", "b", "c"]:
            agg.merge(PositionAssignmentAgg.of_value(v, 1))
        agg.merge(PositionAssignmentAgg.of_value("b", 1).negated())
        m, _ = agg.get_map_and_len()
        assert "b" not in m  # retracted value is not live
        agg.merge(PositionAssignmentAgg.of_value("d", 1))
        m, _ = agg.get_map_and_len()
        assert m["d"] == 1  # reused b's freed slot (LIFO)

    def test_retraction_roundtrip(self):
        ins = [PositionAssignmentAgg.of_value(v, 1) for v in ["x", "y", "z"]]
        agg = PositionAssignmentAgg()
        for p in ins:
            agg.merge(p)
        before = agg.get_map_and_len()[0]
        extra = PositionAssignmentAgg.of_value("w", 1)
        agg.merge(extra)
        agg.merge(extra.negated())
        after = agg.get_map_and_len()[0]
        assert before == after

    def test_tokens_vec(self):
        agg = PositionAssignmentAgg.of_tokens(["t1", "t2", "t1"], 1)
        m, _ = agg.get_map_and_len()
        assert set(m) == {"t1", "t2"}

    def test_batch_sorted_order_deterministic(self):
        vals = ["pear", "apple", "fig", "apple"]
        a = PositionAssignmentAgg.from_sorted_values(vals)
        b = PositionAssignmentAgg.from_sorted_values(reversed(vals))
        assert a.get_map_and_len() == b.get_map_and_len()
        assert a.get_map_and_len()[0] == {"apple": 0, "fig": 1, "pear": 2}


class TestDocumentFrequency:
    def test_merge_resizes(self):
        a = DocumentFrequencyAgg.of([1, 0, 1], 1)
        b = DocumentFrequencyAgg.of([0, 1, 1, 1], 1)
        a.merge(b)
        assert a.get_frequencies().tolist() == [1, 1, 2, 1]
        assert a.count == 2

    def test_negate_retraction(self):
        a = DocumentFrequencyAgg.of([1, 0], 1)
        b = DocumentFrequencyAgg.of([1, 1], 1)
        a.merge(b)
        a.merge(b.negated())
        assert a.get_frequencies().tolist() == [1, 0]
        assert a.count == 1

    def test_rounding(self):
        a = DocumentFrequencyAgg.of([104, 96], 1, round_to=1)
        assert a.get_frequencies().tolist() == [100, 100]


class TestSumCount:
    def test_weighted_and_extremes(self):
        xs = np.array([1.0, 2.0, 10.0])
        agg = SumCountAgg.from_numpy(xs, track_extremes=True)
        agg.merge(SumCountAgg.from_numpy(np.array([10.0]), np.array([-1]), track_extremes=True))
        assert agg.s == pytest.approx(3.0)
        assert agg.count == 2
        assert agg.min_max() == (1.0, 2.0)
        assert agg.mean == pytest.approx(1.5)


def test_epoch_split_equivalence_property():
    """Defining monoid property: any epoch split folds to the batch result."""
    rng = random.Random(42)
    xs = [rng.uniform(-10, 10) for _ in range(500)]
    batch = MeanVarAgg.from_numpy(np.array(xs))
    # random split into epochs
    idx = sorted(rng.sample(range(1, 500), 7))
    bounds = [0, *idx, 500]
    acc = MeanVarAgg()
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        acc.merge(MeanVarAgg.from_numpy(np.array(xs[lo:hi])))
    assert acc.get()[0] == pytest.approx(batch.get()[0])
    assert acc.get()[1] == pytest.approx(batch.get()[1])


class TestCoMoment:
    def _xy(self, n=400, seed=7):
        rng = np.random.default_rng(seed)
        x = rng.normal(5, 2, n)
        y = 3 * x + rng.normal(0, 1, n)
        return x, y

    def test_matches_numpy(self):
        from diffdataflowmlpipelines_ray.state.aggregates import CoMomentAgg

        x, y = self._xy()
        g = CoMomentAgg.from_numpy(x, y).get()
        assert g["covar"] == pytest.approx(np.cov(x, y, bias=True)[0, 1])
        assert g["corr"] == pytest.approx(np.corrcoef(x, y)[0, 1])
        slope, intercept = np.polyfit(x, y, 1)
        assert g["slope"] == pytest.approx(slope)
        assert g["intercept"] == pytest.approx(intercept)

    def test_split_merge_equivalence(self):
        from diffdataflowmlpipelines_ray.state.aggregates import CoMomentAgg

        x, y = self._xy()
        batch = CoMomentAgg.from_numpy(x, y)
        acc = CoMomentAgg()
        rng = random.Random(3)
        bounds = [0, *sorted(rng.sample(range(1, len(x)), 9)), len(x)]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            acc.merge(CoMomentAgg.from_numpy(x[lo:hi], y[lo:hi]))
        for k in ("covar", "corr", "slope", "n"):
            assert acc.get()[k] == pytest.approx(batch.get()[k])

    def test_retraction_restores_state(self):
        from diffdataflowmlpipelines_ray.state.aggregates import CoMomentAgg

        x, y = self._xy()
        full = CoMomentAgg.from_numpy(x, y)
        tail = CoMomentAgg.from_numpy(x[250:], y[250:])
        tail.negate()
        full.merge(tail)
        head = CoMomentAgg.from_numpy(x[:250], y[:250])
        for k in ("covar", "corr", "slope"):
            assert full.get()[k] == pytest.approx(head.get()[k])
        assert full.count == 250

    def test_weighted_diffs(self):
        from diffdataflowmlpipelines_ray.state.aggregates import CoMomentAgg

        x, y = self._xy(50)
        w = np.ones(50, dtype=np.int64)
        w[40:] = -1  # retract the last ten inside the same block
        blk = CoMomentAgg.from_numpy(x, y, weights=w)
        expect = CoMomentAgg.from_numpy(x[:40], y[:40])
        neg = CoMomentAgg.from_numpy(x[40:], y[40:])
        neg.negate()
        expect2 = expect.merged(neg)
        # weighted single-block == merge of signed partials
        for k in ("covar", "corr", "slope"):
            assert blk.get()[k] == pytest.approx(expect2.get()[k])
        assert blk.count == 30


class TestMoments:
    def _x(self, n=1000, seed=11):
        return np.random.default_rng(seed).gamma(2.0, 3.0, n)

    def test_matches_duckdb_estimators(self):
        import duckdb

        from diffdataflowmlpipelines_ray.state.aggregates import MomentsAgg

        x = self._x()
        g = MomentsAgg.from_numpy(x).get()
        sk, ku, mn, vp = duckdb.sql(
            "SELECT skewness(c), kurtosis(c), avg(c), var_pop(c) "
            "FROM (SELECT unnest(?::DOUBLE[]) AS c)", params=[list(x)]
        ).fetchone()
        assert g["mean"] == pytest.approx(mn, abs=1e-10)
        assert g["var_pop"] == pytest.approx(vp, abs=1e-8)
        assert g["skew"] == pytest.approx(sk, abs=1e-10)
        assert g["kurt"] == pytest.approx(ku, abs=1e-9)

    def test_split_merge_equivalence(self):
        from diffdataflowmlpipelines_ray.state.aggregates import MomentsAgg

        x = self._x()
        batch = MomentsAgg.from_numpy(x)
        acc = MomentsAgg()
        rng = random.Random(5)
        bounds = [0, *sorted(rng.sample(range(1, len(x)), 9)), len(x)]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            acc.merge(MomentsAgg.from_numpy(x[lo:hi]))
        for k in ("mean", "var_pop", "skew", "kurt", "n"):
            assert acc.get()[k] == pytest.approx(batch.get()[k])

    def test_retraction_is_exact(self):
        from diffdataflowmlpipelines_ray.state.aggregates import MomentsAgg

        x = self._x()
        full = MomentsAgg.from_numpy(x)
        tail = MomentsAgg.from_numpy(x[600:])
        tail.negate()
        full.merge(tail)
        head = MomentsAgg.from_numpy(x[:600])
        # power sums subtract exactly — componentwise float equality,
        # stronger than the approx guarantee Chan-style inverses give
        for k in ("count", "s1", "s2", "s3", "s4"):
            assert getattr(full, k) == pytest.approx(getattr(head, k),
                                                     rel=1e-12)
        for k in ("mean", "var_pop", "skew", "kurt"):
            assert full.get()[k] == pytest.approx(head.get()[k])

    def test_weighted_diffs_and_small_group_nans(self):
        from diffdataflowmlpipelines_ray.state.aggregates import MomentsAgg

        x = self._x(50)
        w = np.ones(50, dtype=np.int64)
        w[40:] = -1
        blk = MomentsAgg.from_numpy(x, weights=w)
        expect = MomentsAgg.from_numpy(x[:40]).merged(
            MomentsAgg.from_numpy(x[40:]).negated())
        for k in ("mean", "var_pop", "skew", "kurt"):
            assert blk.get()[k] == pytest.approx(expect.get()[k])
        assert blk.count == 30
        # DuckDB returns NULL below n=3 (skew) / n=4 (kurt); we emit NaN
        g2 = MomentsAgg.from_numpy(x[:2]).get()
        assert math.isnan(g2["skew"]) and math.isnan(g2["kurt"])
        g3 = MomentsAgg.from_numpy(x[:3]).get()
        assert not math.isnan(g3["skew"]) and math.isnan(g3["kurt"])


class TestLastValue:
    def test_semilattice_properties(self):
        from diffdataflowmlpipelines_ray.state.aggregates import LastValueAgg

        a = LastValueAgg((1.0, ("x",)), ("x",))
        b = LastValueAgg((2.0, ("y",)), ("y",))
        c = LastValueAgg((2.0, ("z",)), ("z",))  # equal time, tiebreak wins
        assert a.merged(b) == b.merged(a)            # commutative
        assert b.merged(b) == b                      # idempotent
        assert a.merged(b).merged(c) == a.merged(b.merged(c))  # associative
        assert b.merged(c).value == ("z",)           # deterministic tiebreak
        assert LastValueAgg().merged(a).value == ("x",)
        assert LastValueAgg().is_identity() and not a.is_identity()

    def test_negate_unsupported(self):
        from diffdataflowmlpipelines_ray.state.aggregates import LastValueAgg

        with pytest.raises(NotImplementedError):
            LastValueAgg((0.0, ()), ()).negate()
