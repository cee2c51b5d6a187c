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


class TestThresholdProperty:
    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.lists(st.tuples(st.integers(0, 5),
                                       st.sampled_from([1, -1])),
                             min_size=0, max_size=15),
                    min_size=1, max_size=6))
    def test_changelog_sum_equals_threshold_of_net(self, epochs):
        """For ANY delta stream (including nets that go negative), the
        threshold changelog's running sum per key equals f(net count)
        after every epoch — the semantic contract of DD's threshold."""
        import pickle

        import pyarrow as pa

        from diffdataflowmlpipelines_ray.streaming.engine import (
            KeyedAggregation)

        op = KeyedAggregation(name="d", input="chg", key_cols=["v"],
                              aggs=(), weight_col="diff",
                              emit_changelog=True,
                              threshold_fn=lambda m: int(m > 0))
        shard = StateShard(0, 1)
        net: dict[int, int] = {}
        running: dict[int, int] = {}
        for e, rows in enumerate(epochs):
            if rows:
                v, d = zip(*rows)
                tbl = pa.table({"v": pa.array(v, type=pa.int64()),
                                "diff": pa.array(d, type=pa.int64())})
                partials, _ = op.partial_batch(tbl, float("-inf"))
            else:
                partials = {}
            payload = pickle.dumps(sorted(partials.items()),
                                   protocol=pickle.HIGHEST_PROTOCOL)
            pairs = pickle.loads(
                shard.apply_delta_changelog("d", e, payload))
            out = op.changelog_to_table(pairs, e)
            for kb, diff in zip(out["v"].to_pylist(),
                                out["diff"].to_pylist()):
                running[kb] = running.get(kb, 0) + diff
            for k, d2 in rows:
                net[k] = net.get(k, 0) + d2
            for k in set(net) | set(running):
                assert running.get(k, 0) == int(net.get(k, 0) > 0), (
                    e, k, net, running)


class TestConsolidationProperty:
    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.lists(st.tuples(st.integers(0, 4),
                                       st.sampled_from([1, 1, -1])),
                             min_size=0, max_size=10),
                    min_size=2, max_size=5),
           st.integers(0, 10))
    def test_any_cut_preserves_running_sum(self, epochs, cut_seed):
        """consolidate(upto_epoch=ANY cut) leaves the sink's running sum
        (net diff per key) bit-identical — the consumer-facing contract."""
        import shutil
        import tempfile

        import pandas as pd
        import pyarrow as pa

        from diffdataflowmlpipelines_ray.streaming.sink import (
            ExactlyOnceParquetSink)

        root = tempfile.mkdtemp(prefix="consol-prop-", dir="/tmp")
        try:
            sink = ExactlyOnceParquetSink(root, fsync=False)
            for e, rows in enumerate(epochs):
                k = [r[0] for r in rows]
                d = [r[1] for r in rows]
                sink.commit_tables(e, [pa.table({
                    "k": pa.array(k, type=pa.int64()),
                    "diff": pa.array(d, type=pa.int64()),
                    "epoch": pa.array([e] * len(rows), type=pa.int64())})])
            before = sink.read_committed_table().to_pandas()
            net_b = before.groupby("k")["diff"].sum()
            net_b = net_b[net_b != 0].to_dict()
            cut = cut_seed % len(epochs)
            sink.consolidate(upto_epoch=cut)
            after = sink.read_committed_table().to_pandas()
            net_a = after.groupby("k")["diff"].sum() if len(after) else \
                pd.Series(dtype="int64")
            net_a = net_a[net_a != 0].to_dict()
            assert net_a == net_b
            assert sink.verify()
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestSessionEarlyFiringProperty:
    """For ANY insert stream split across epochs, the early changelog's
    running sum per key equals gap-sessionization over the points seen so
    far, after EVERY epoch; closing retracts everything to net zero and
    the final emission is exactly the full sessionization.  (Values are
    1.0 so session sums are small integers — float-exact, order-free.)"""

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 3), ts_floats,
                              st.integers(0, 3)),
                    min_size=1, max_size=50))
    def test_running_sum_tracks_open_sessions(self, rows):
        import pickle as p
        from collections import Counter

        gap = 25.0
        shard = StateShard(0, 1)
        seen: dict = {}
        net: Counter = Counter()
        for e in range(4):
            per_key: dict = {}
            for k, ts, ea in rows:
                if ea == e:
                    kb = p.dumps((k,), protocol=p.HIGHEST_PROTOCOL)
                    per_key.setdefault(kb, []).append((ts, 1.0))
            payload = p.dumps(sorted(per_key.items()),
                              protocol=p.HIGHEST_PROTOCOL)
            shard.apply_session_points("s", e, payload, gap)
            for kb, pts in per_key.items():
                seen.setdefault(kb, []).extend(pts)
            for kb, d, sess in p.loads(
                    shard.emit_early_sessions("s", gap, False)):
                net[(kb, sess)] += d
            for kb, pts in seen.items():
                want = Counter(
                    (kb, StateShard._session_tuple(s))
                    for s in StateShard.build_sessions(pts, gap))
                got = Counter({kk: v for kk, v in net.items()
                               if kk[0] == kb and v != 0})
                assert got == want
        emitted, rets = p.loads(
            shard.sweep_closed_sessions("s", float("inf"), gap, True))
        for kb, d, sess in rets:
            net[(kb, sess)] += d
        assert all(v == 0 for v in net.values())
        want_final = sorted(
            (kb, StateShard._session_tuple(s))
            for kb, pts in seen.items()
            for s in StateShard.build_sessions(pts, gap))
        got_final = sorted((kb, StateShard._session_tuple(s))
                           for kb, s in emitted)
        assert got_final == want_final

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(ts_floats, st.booleans()), min_size=1,
                    max_size=30))
    def test_retractable_split_running_sum(self, rows):
        """Insert everything, then retract a marked subset: the early
        changelog's running sum equals sessionization over the LIVE
        multiset — including bridge deletions that split sessions."""
        import pickle as p
        from collections import Counter

        gap = 20.0
        shard = StateShard(0, 1)
        kb = p.dumps((1,), protocol=p.HIGHEST_PROTOCOL)
        net: Counter = Counter()

        def apply(epoch, pts):
            payload = p.dumps([(kb, pts)], protocol=p.HIGHEST_PROTOCOL)
            shard.apply_session_point_deltas("s", epoch, payload)
            for _, d, sess in p.loads(
                    shard.emit_early_sessions("s", gap, True)):
                net[sess] += d

        apply(0, [(ts, 1.0, 1) for ts, _ in rows])
        apply(1, [(ts, 1.0, -1) for ts, rm in rows if rm])
        live = [(ts, 1.0) for ts, rm in rows if not rm]
        want = Counter(StateShard._session_tuple(s)
                       for s in StateShard.build_sessions(live, gap))
        got = Counter({s: v for s, v in net.items() if v != 0})
        assert got == want


class TestRescaleAlgebra:
    """rescale_blobs (savepoint rescale) as a pure function: for ANY
    weighted keyed delta stream split across epochs and ANY shard move
    n0→n1 (up, down, identity), rescaling mid-stream preserves the exact
    final state a single-shard reference accumulates."""

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 30),                # key
                           st.floats(-50, 50, allow_nan=False),
                           st.integers(-3, 3)),               # weight
                 min_size=1, max_size=120),
        st.integers(1, 6),
        st.integers(1, 6),
        st.integers(0, 2**31 - 1),
    )
    def test_keyed_state_rescale_roundtrip(self, rows, n0, n1, seed):
        import pickle

        from diffdataflowmlpipelines_ray.state.aggregates import SumCountAgg
        from diffdataflowmlpipelines_ray.streaming.state_store import (
            rescale_blobs, shard_of)

        rng = np.random.default_rng(seed)
        cut = int(rng.integers(0, len(rows) + 1))   # the "crash point"
        halves = [rows[:cut], rows[cut:]]

        def partials(batch):
            out = {}
            for k, v, w in batch:
                kb = pickle.dumps((k,), protocol=pickle.HIGHEST_PROTOCOL)
                acc = out.setdefault(kb, SumCountAgg())
                add = SumCountAgg(s=v * w, count=w)
                acc.merge(add)
            return out

        def apply_to(shards, n, batch, epoch):
            by = {}
            for kb, acc in partials(batch).items():
                by.setdefault(shard_of(kb, n), []).append((kb, acc))
            for sid, items in by.items():
                shards[sid].apply_delta(
                    "t", epoch, pickle.dumps(sorted(items)))

        # phase 1 at n0 shards
        s0 = [StateShard(i, n0) for i in range(n0)]
        apply_to(s0, n0, halves[0], 0)
        blobs = {i: sh.dump() for i, sh in enumerate(s0)}
        # rescale to n1, continue
        s1 = [StateShard(i, n1) for i in range(n1)]
        for sid, blob in rescale_blobs(blobs, n1).items():
            s1[sid].load(blob)
        apply_to(s1, n1, halves[1], 1)
        got = {}
        for sh in s1:
            for kb, acc in pickle.loads(sh.collect("t")):
                assert kb not in got, "key on two shards after rescale"
                got[kb] = (acc.s, acc.count)
        # reference: single shard, no rescale
        ref_sh = StateShard(0, 1)
        apply_to([ref_sh], 1, halves[0], 0)
        apply_to([ref_sh], 1, halves[1], 1)
        ref = {kb: (acc.s, acc.count)
               for kb, acc in pickle.loads(ref_sh.collect("t"))}
        assert set(got) == set(ref)
        for kb in ref:
            assert got[kb][1] == ref[kb][1]
            assert got[kb][0] == pytest.approx(ref[kb][0])
        # routing invariant: every key sits where shard_of(·, n1) says
        for i, sh in enumerate(s1):
            for kb, _ in pickle.loads(sh.collect("t")):
                assert shard_of(kb, n1) == i


class TestAsofAlgebra:
    """AsofStreamJoin shard algebra: for ANY epoch split of any insert
    stream plus any trailing retraction subset, the accumulated ±diff
    multiset equals the batch ASOF JOIN of the NET inputs."""

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def test_accumulated_equals_net_merge_asof(self, data):
        import pandas as pd
        import pickle

        n_l = data.draw(st.integers(1, 25))
        n_r = data.draw(st.integers(0, 20))
        lk = data.draw(st.lists(st.integers(0, 2), min_size=n_l,
                                max_size=n_l))
        lts = data.draw(st.lists(
            st.floats(0, 100, allow_nan=False), min_size=n_l,
            max_size=n_l))
        rk = data.draw(st.lists(st.integers(0, 2), min_size=n_r,
                                max_size=n_r))
        rts_pool = data.draw(st.lists(
            st.integers(0, 4000), min_size=n_r, max_size=n_r,
            unique=True))
        L = pd.DataFrame({"k": lk, "lid": np.arange(n_l),
                          "__ts_left": lts})
        R = pd.DataFrame({"k": rk, "rid": np.arange(n_r) + 1000,
                          "__ts_right": [t / 40.0 for t in rts_pool]})
        R = R.drop_duplicates(subset=["k", "__ts_right"])
        shard = StateShard(0, 1)
        pickleit = lambda p: pickle.dumps(p)  # noqa: E731
        n_ep = data.draw(st.integers(1, 4))
        lsplit = data.draw(st.lists(st.integers(0, n_ep - 1),
                                    min_size=len(L), max_size=len(L)))
        rsplit = data.draw(st.lists(st.integers(0, n_ep - 1),
                                    min_size=len(R), max_size=len(R)))
        outs = []
        for e in range(n_ep):
            payload = {"key": ["k"], "out_names": ["k", "lid", "rid"],
                       "right_cols": ["rid"]}
            le = L[np.array(lsplit) == e] if len(L) else L
            re_ = R[np.array(rsplit) == e] if len(R) else R
            if len(le):
                payload["left"] = le.reset_index(drop=True)
            if len(re_):
                payload["right"] = re_.reset_index(drop=True)
            blob = shard.asof_insert_probe("aj", e, pickleit(payload))
            r = pickle.loads(blob)
            if r is not None and len(r):
                outs.append(r)
        # trailing retractions of random subsets of both sides
        lrm = data.draw(st.lists(st.booleans(), min_size=len(L),
                                 max_size=len(L)))
        rrm = data.draw(st.lists(st.booleans(), min_size=len(R),
                                 max_size=len(R)))
        lr = L[np.array(lrm, dtype=bool)] if len(L) else L
        rr = R[np.array(rrm, dtype=bool)] if len(R) else R
        payload = {"key": ["k"], "out_names": ["k", "lid", "rid"],
                   "right_cols": ["rid"]}
        if len(lr):
            payload["left"] = lr.assign(__diff_left=-1).reset_index(
                drop=True)
        if len(rr):
            payload["right"] = rr.assign(__diff_right=-1).reset_index(
                drop=True)
        if len(lr) or len(rr):
            blob = shard.asof_insert_probe("aj", n_ep, pickleit(payload))
            r = pickle.loads(blob)
            if r is not None and len(r):
                outs.append(r)
        acc = (pd.concat(outs, ignore_index=True)
               .groupby(["k", "lid", "rid"])["diff"].sum()
               if outs else pd.Series(dtype=np.int64))
        acc = acc[acc != 0]
        Ln = L[~np.array(lrm, dtype=bool)] if len(L) else L
        Rn = R[~np.array(rrm, dtype=bool)] if len(R) else R
        if len(Ln) and len(Rn):
            exp = pd.merge_asof(
                Ln.sort_values("__ts_left"), Rn.sort_values("__ts_right"),
                left_on="__ts_left", right_on="__ts_right", by="k")
            exp = exp[exp["__ts_right"].notna()]
        else:
            exp = pd.DataFrame({"k": [], "lid": [], "rid": []})
        exp_set = {(int(r.k), int(r.lid), int(r.rid))
                   for r in exp.itertuples()}
        got_set = set(acc.index.tolist())
        assert got_set == exp_set
        assert (acc == 1).all()
