"""Hypothesis properties for the streaming algebra added in round 2:
session-interval merge invariance, pattern sweep vs brute force, window
assignment coverage.  Pure functions — no Ray session needed."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from diffdataflowmlpipelines_ray.streaming.engine import WindowSpec
from diffdataflowmlpipelines_ray.streaming.state_store import StateShard

ts_floats = st.floats(min_value=0.0, max_value=1000.0, allow_nan=False,
                      allow_infinity=False)


class TestSessionAlgebra:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(ts_floats, ts_floats), min_size=1,
                    max_size=40),
           st.integers(0, 2**31 - 1))
    def test_split_order_invariance(self, points, seed):
        """build_sessions(all) == merge of build_sessions over ANY split —
        the associativity the distributed per-block compression relies on."""
        gap = 10.0
        whole = StateShard.build_sessions(points, gap)
        rng = np.random.default_rng(seed)
        k = int(rng.integers(1, 5))
        parts = [[] for _ in range(k)]
        for p in points:
            parts[int(rng.integers(0, k))].append(p)
        merged = []
        for part in parts:
            merged = StateShard.merge_session_lists(
                merged, StateShard.build_sessions(part, gap))
        assert len(merged) == len(whole)
        for a, b in zip(merged, whole):
            assert a[0] == pytest.approx(b[0])
            assert a[1] == pytest.approx(b[1])
            assert a[2][0] == pytest.approx(b[2][0])  # sum
            assert a[2][1] == b[2][1]  # count


class TestPatternSweepProperty:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(ts_floats, st.sampled_from("abx")),
                    min_size=0, max_size=25))
    def test_sweep_equals_bruteforce(self, events):
        import pickle

        shard = StateShard(0, 1)
        key = pickle.dumps(("k",), protocol=pickle.HIGHEST_PROTOCOL)
        payload = pickle.dumps([(key, events)],
                               protocol=pickle.HIGHEST_PROTOCOL)
        shard.apply_pattern_points("p", 0, payload)
        within = 50.0
        out = pickle.loads(
            shard.sweep_pattern_matches("p", float("inf"), ["a", "b"],
                                        within))
        got = sorted(chain for _, chain in out)
        evs = sorted(events)
        exp = sorted(
            (ta, tb)
            for i, (ta, ca) in enumerate(evs) if ca == "a"
            for (tb, cb) in evs[i + 1:]
            if cb == "b" and tb > ta and tb <= ta + within
        )
        assert [tuple(c) for c in got] == [tuple(e) for e in exp]

    def test_sweep_respects_watermark_and_drops_state(self):
        import pickle

        shard = StateShard(0, 1)
        key = pickle.dumps(("k",), protocol=pickle.HIGHEST_PROTOCOL)
        events = [(1.0, "a"), (2.0, "b"), (90.0, "a"), (95.0, "b")]
        shard.apply_pattern_points("p", 0, pickle.dumps(
            [(key, events)], protocol=pickle.HIGHEST_PROTOCOL))
        # wm=60, within=10 → start 1.0 final (1+10 ≤ 60); start 90 not
        out = pickle.loads(shard.sweep_pattern_matches("p", 60.0,
                                                       ["a", "b"], 10.0))
        assert [tuple(c) for _, c in out] == [(1.0, 2.0)]
        # swept events ≤ 50 dropped; later sweep emits only the second chain
        out2 = pickle.loads(shard.sweep_pattern_matches("p", float("inf"),
                                                        ["a", "b"], 10.0))
        assert [tuple(c) for _, c in out2] == [(90.0, 95.0)]


class TestWindowAssignProperty:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(ts_floats, min_size=1, max_size=50))
    def test_sliding_assignment_exact_cover(self, ts):
        spec = WindowSpec.sliding(30.0, 10.0)
        arr = np.asarray(ts)
        idx, ws, we = spec.assign(arr)
        # every (row, window) pair satisfies containment
        assert ((arr[idx] >= ws) & (arr[idx] < we)).all()
        # and the count per row equals the number of covering windows
        for i, t in enumerate(arr):
            n_windows = sum(
                1 for j in range(4)
                if (np.floor(t / 10.0) - j) * 10.0 + 30.0 > t >= (
                    np.floor(t / 10.0) - j) * 10.0
            )
            assert (idx == i).sum() == n_windows
