"""IncrementalEncoderSession + flagship pipeline tests."""

import numpy as np
import pyarrow as pa
import pytest

from diffdataflowmlpipelines_ray.pipelines.flagship import (
    run_flagship,
    token_features_table,
)
from diffdataflowmlpipelines_ray.sources.tokenized import (
    derive_tokenized,
    epoch_tables,
    tokenized_dataset,
)
from diffdataflowmlpipelines_ray.stages.encoders import OneHotEncoder, StandardScaler
from diffdataflowmlpipelines_ray.streaming.encoders import IncrementalEncoderSession

SF = "/root/testdata/sf0.001"


class TestTokenizedSource:
    def test_derive_deterministic_schema(self, ray_session):
        import pyarrow.parquet as pq

        docs = pq.read_table(f"{SF}/documents.parquet")
        t1 = derive_tokenized(docs)
        t2 = derive_tokenized(docs)
        assert t1.schema.field("tokens").type == pa.list_(pa.int32())
        assert t1.schema.field("doc_id").type == pa.string()
        assert t1["tokens"].to_pylist() == t2["tokens"].to_pylist()  # token-array equality
        assert t1["n_tok"].to_pylist() == [len(x) for x in t1["tokens"].to_pylist()]

    def test_dataset_source(self, ray_session):
        ds = tokenized_dataset(SF)
        assert ds.count() == 500


class TestIncrementalEncoderSession:
    def test_epochs_converge_to_batch(self, ray_session, tmp_path):
        """Final-state refresh == single-batch fit_transform (DD convergence)."""
        n = 60
        tbl = pa.table(
            {
                "row_id": list(range(n)),
                "x": [float(i % 13) for i in range(n)],
                "cat": [str(i % 4) for i in range(n)],
            }
        )
        sess = IncrementalEncoderSession(
            [("x", StandardScaler()), ("cat", OneHotEncoder())],
            tmp_path / "inc", num_shards=2, keep_input=True,
        )
        for e, part in enumerate(epoch_tables(tbl, 4)):
            sess.process_epoch(e, part)
        got = sess.refresh().sort_by("row_id")
        sess.close()

        from diffdataflowmlpipelines_ray.stages.multi_column import MultiColumnEncoder
        import ray.data as rd

        mce = MultiColumnEncoder([("x", StandardScaler()), ("cat", OneHotEncoder())])
        mce.fit(rd.from_arrow(tbl))
        exp = mce.transform_table(tbl, "features")
        np.testing.assert_allclose(
            np.array(got["features"].to_pylist()),
            np.array(exp["features"].to_pylist()),
        )

    def test_epoch_outputs_use_running_state(self, ray_session, tmp_path):
        # epoch 0 output is encoded with epoch-0 stats (incl. that epoch),
        # like DD's same-timestamp join
        t0 = pa.table({"row_id": [0, 1], "x": [0.0, 10.0]})
        t1 = pa.table({"row_id": [2], "x": [100.0]})
        sess = IncrementalEncoderSession(
            [("x", StandardScaler())], tmp_path / "run", num_shards=1, keep_input=True
        )
        out0 = sess.process_epoch(0, t0)
        # epoch 0: mean 5, var 25 → (0-5)/25, (10-5)/25
        assert [v[0] for v in out0["features"].to_pylist()] == pytest.approx([-0.2, 0.2])
        out1 = sess.process_epoch(1, t1)
        # epoch 1 state: all three rows
        import numpy as np

        xs = np.array([0.0, 10.0, 100.0])
        m, v = xs.mean(), xs.var()
        assert out1["features"].to_pylist()[0][0] == pytest.approx((100.0 - m) / v)
        sess.close()

    def test_resume_skips_committed(self, ray_session, tmp_path):
        tbl = pa.table({"row_id": list(range(20)), "x": [float(i) for i in range(20)]})
        parts = epoch_tables(tbl, 4)
        s1 = IncrementalEncoderSession([("x", StandardScaler())], tmp_path / "r",
                                       num_shards=1)
        s1.process_epoch(0, parts[0])
        s1.process_epoch(1, parts[1])
        s1.close()  # "crash" after epoch 1 (checkpoint_every=1 → state at 1)
        s2 = IncrementalEncoderSession([("x", StandardScaler())], tmp_path / "r",
                                       num_shards=1)
        start = s2.resume()
        assert start == 2
        for e in range(start, 4):
            s2.process_epoch(e, parts[e])
        # final state must equal batch over all 20 rows
        assert s2.mce.config[0][1].mean_ == pytest.approx(9.5)
        assert s2.sink.committed_epochs() == [0, 1, 2, 3]
        s2.close()


class TestFlagship:
    def test_token_features(self, ray_session):
        tbl = pa.table(
            {"doc_id": ["a", "b"], "tokens": [[1, 2, 2], []],
             "n_tok": pa.array([3, 0], type=pa.int32()), "source": ["w", "w"]}
        )
        out = token_features_table(tbl, n_buckets=8)
        v = out["tok_buckets"].to_pylist()
        assert v[0][1] == 1.0 and v[0][2] == 2.0 and sum(v[0]) == 3.0
        assert sum(v[1]) == 0.0
        # fingerprint: deterministic, order-sensitive
        tbl2 = pa.table(
            {"doc_id": ["a"], "tokens": [[2, 1, 2]],
             "n_tok": pa.array([3], type=pa.int32()), "source": ["w"]}
        )
        fp2 = token_features_table(tbl2, 8)["fingerprint"].to_pylist()[0]
        assert fp2 != out["fingerprint"].to_pylist()[0]

    def test_flagship_end_to_end_sf0001(self, ray_session, tmp_path):
        res = run_flagship(SF, tmp_path / "flag", n_epochs=3, num_shards=2)
        assert res["sequences"] == 500
        assert res["output_rows"] == 500
        assert res["tokens"] > 0
        assert res["committed_epochs"] == [0, 1, 2]
        # windowed per-source aggregate: n_epochs x #sources rows committed
        import pyarrow.parquet as pq
        srcs = len(set(pq.read_table(f"{SF}/documents.parquet")["source"].to_pylist()))
        assert res["window_rows"] == 3 * srcs


class TestSessionExtras:
    def test_retraction_through_session(self, ray_session, tmp_path):
        import numpy as np

        tbl = pa.table({"row_id": [0, 1, 2], "x": [0.0, 10.0, 1000.0],
                        "diff": [1, 1, 1]})
        sess = IncrementalEncoderSession(
            [("x", StandardScaler())], tmp_path / "retr", num_shards=1,
            weight_col="diff",
        )
        sess.process_epoch(0, tbl)
        # retract the outlier in epoch 1
        sess.process_epoch(1, pa.table({"row_id": [2], "x": [1000.0],
                                        "diff": [-1]}))
        enc = sess.mce.config[0][1]
        assert enc.mean_ == pytest.approx(5.0)  # mean of {0, 10}
        assert enc.scale_ == pytest.approx(25.0)
        sess.close()

    def test_inspect_meta_fires_on_change(self, ray_session, tmp_path):
        seen = []
        sess = IncrementalEncoderSession(
            [("x", StandardScaler())], tmp_path / "insp", num_shards=1
        )
        sess.inspect_meta = lambda epoch, i, col, st: seen.append((epoch, col))
        sess.process_epoch(0, pa.table({"row_id": [0, 1], "x": [0.0, 2.0]}))
        sess.process_epoch(1, pa.table({"row_id": [2], "x": [4.0]}))
        # same stats again → no meta change → no new inspect call
        sess.process_epoch(2, pa.table({"row_id": [3], "x": [2.0]}))
        sess.close()
        assert seen[0] == (0, "x")
        assert (1, "x") in seen
        assert len(seen) >= 2

    def test_corrections_converge_to_recompute(self, ray_session, tmp_path):
        """DD delta-output semantics: base epoch outputs ⊕ correction deltas
        == full recompute under the final state (multiset equality)."""
        import pandas as pd

        tbl = pa.table({"row_id": list(range(12)),
                        "x": [float(i * i % 7) for i in range(12)]})
        parts = epoch_tables(tbl, 3)
        sess = IncrementalEncoderSession(
            [("x", StandardScaler())], tmp_path / "corr", num_shards=1,
            keep_input=True,
        )
        sess.emit_corrections = True
        for e, part in enumerate(parts):
            sess.process_epoch(e, part)
        base = sess.sink.read_committed_table().to_pandas()
        corr = sess.corrections_sink.read_committed_table().to_pandas()
        final = sess.refresh().to_pandas()
        sess.close()
        assert len(corr) > 0  # meta changed every epoch (no rounding)

        def canon(df, diff_col=None):
            out = pd.DataFrame({
                "row_id": df["row_id"],
                "feat": df["features"].map(lambda v: tuple(np.round(v, 12))),
                "diff": df[diff_col] if diff_col else 1,
            })
            return out

        applied = pd.concat([canon(base), canon(corr, "diff")], ignore_index=True)
        net = applied.groupby(["row_id", "feat"])["diff"].sum()
        net = net[net != 0]
        expect = canon(final).groupby(["row_id", "feat"])["diff"].sum()
        pd.testing.assert_series_equal(
            net.sort_index(), expect.sort_index(), check_names=False
        )


class TestCrashMatrix:
    @pytest.mark.parametrize("crash_after", [0, 1, 2])
    def test_resume_from_every_epoch_boundary(self, ray_session, tmp_path,
                                              crash_after):
        """Kill after each epoch boundary; resumed run's final state and
        committed outputs must equal the clean run's exactly."""
        tbl = pa.table({"row_id": list(range(24)),
                        "x": [float(i * 7 % 11) for i in range(24)]})
        parts = epoch_tables(tbl, 4)
        root = tmp_path / f"cm{crash_after}"

        s1 = IncrementalEncoderSession([("x", StandardScaler())], root,
                                       num_shards=2)
        for e in range(crash_after + 1):
            s1.process_epoch(e, parts[e])
        s1.close()  # crash

        s2 = IncrementalEncoderSession([("x", StandardScaler())], root,
                                       num_shards=2)
        start = s2.resume()
        assert start == crash_after + 1
        for e in range(start, 4):
            s2.process_epoch(e, parts[e])
        assert s2.sink.committed_epochs() == [0, 1, 2, 3]
        # final state equals batch fit over all rows
        import ray.data as rd

        ref = StandardScaler().fit(rd.from_arrow(tbl), "x")
        assert s2.mce.config[0][1].mean_ == pytest.approx(ref.mean_)
        assert s2.mce.config[0][1].scale_ == pytest.approx(ref.scale_)
        s2.close()


class TestStreamingSlotSemantics:
    def test_new_category_gets_next_slot_prior_slots_stable(self, ray_session,
                                                            tmp_path):
        """Streaming OneHot: epoch boundaries never reshuffle existing slots;
        new categories append (integer_assignment_aggregate.rs:43-50)."""
        sess = IncrementalEncoderSession([("cat", OneHotEncoder())],
                                         tmp_path / "slots", num_shards=1)
        sess.process_epoch(0, pa.table({"row_id": [0, 1], "cat": ["a", "b"]}))
        m0, _ = sess.mce.config[0][1].acc_.get_map_and_len()
        sess.process_epoch(1, pa.table({"row_id": [2], "cat": ["c"]}))
        m1, _ = sess.mce.config[0][1].acc_.get_map_and_len()
        assert {k: m1[k] for k in m0} == m0  # prior slots unchanged
        assert m1["c"] == max(m0.values()) + 1
        sess.close()

    def test_freed_slot_reused_after_retraction(self, ray_session, tmp_path):
        sess = IncrementalEncoderSession([("cat", OneHotEncoder())],
                                         tmp_path / "free", num_shards=1,
                                         weight_col="diff")
        sess.process_epoch(0, pa.table({"row_id": [0, 1, 2],
                                        "cat": ["a", "b", "c"],
                                        "diff": [1, 1, 1]}))
        sess.process_epoch(1, pa.table({"row_id": [1], "cat": ["b"],
                                        "diff": [-1]}))
        m1, _ = sess.mce.config[0][1].acc_.get_map_and_len()
        assert "b" not in m1
        sess.process_epoch(2, pa.table({"row_id": [3], "cat": ["d"],
                                        "diff": [1]}))
        m2, _ = sess.mce.config[0][1].acc_.get_map_and_len()
        assert m2["d"] == 1  # b's freed slot reused (LIFO free list)
        sess.close()

    def test_count_vectorizer_streaming_retraction(self, ray_session, tmp_path):
        from diffdataflowmlpipelines_ray.stages.encoders import CountVectorizer

        sess = IncrementalEncoderSession([("text", CountVectorizer())],
                                         tmp_path / "cvr", num_shards=1,
                                         weight_col="diff")
        sess.process_epoch(0, pa.table({"row_id": [0, 1],
                                        "text": ["aa bb", "bb cc"],
                                        "diff": [1, 1]}))
        v0, _ = sess.mce.config[0][1].acc_.get_map_and_len()
        assert set(v0) == {"aa", "bb", "cc"}
        # retract the only doc containing 'aa'
        sess.process_epoch(1, pa.table({"row_id": [0], "text": ["aa bb"],
                                        "diff": [-1]}))
        v1, _ = sess.mce.config[0][1].acc_.get_map_and_len()
        assert "aa" not in v1 and "bb" in v1 and "cc" in v1
        sess.close()

    def test_empty_epoch_is_harmless(self, ray_session, tmp_path):
        sess = IncrementalEncoderSession([("x", StandardScaler())],
                                         tmp_path / "empty", num_shards=1)
        sess.process_epoch(0, pa.table({"row_id": [0, 1], "x": [1.0, 3.0]}))
        empty = pa.table({"row_id": pa.array([], type=pa.int64()),
                          "x": pa.array([], type=pa.float64())})
        sess.process_epoch(1, empty)  # must not crash or disturb state
        assert sess.mce.config[0][1].mean_ == pytest.approx(2.0)
        assert sess.sink.committed_epochs() == [0, 1]
        sess.close()


class TestPreTransformInFit:
    """pre_transform_in_fit=True: a stateful encoder fits on a column the
    pre_transform DERIVES (TF-IDF over a vectorizer's output) — retraction
    rows re-derive the identical vector so the negative partial cancels the
    original DF contribution exactly."""

    def _mk(self, tmp_path, name, num_shards=1):
        from diffdataflowmlpipelines_ray.stages.encoders import (
            CountVectorizer, TfidfTransformer)
        from diffdataflowmlpipelines_ray.state.aggregates import (
            PositionAssignmentAgg)

        cv = CountVectorizer().load_accumulator(
            PositionAssignmentAgg.from_sorted_values({"aa", "bb", "cc", "dd"}))
        sess = IncrementalEncoderSession(
            [("vec", TfidfTransformer(reference_compat=False))],
            tmp_path / name, num_shards=num_shards, weight_col="diff",
            pre_transform=lambda t: cv.transform_table(t, "text", "vec"),
            pre_transform_in_fit=True)
        return cv, sess

    def test_retraction_cancels_df_exactly(self, ray_session, tmp_path):
        from diffdataflowmlpipelines_ray.stages.encoders import TfidfTransformer

        cv, sess = self._mk(tmp_path, "tf1")
        docs = ["aa bb", "bb cc", "aa aa cc", "dd"]
        sess.process_epoch(0, pa.table({
            "row_id": list(range(4)), "text": docs, "diff": [1] * 4}))
        # retract doc 0 and doc 3
        sess.process_epoch(1, pa.table({
            "row_id": [0, 3], "text": ["aa bb", "dd"], "diff": [-1, -1]}))
        tf = sess.mce.config[0][1]
        # live corpus: {"bb cc", "aa aa cc"} → df: aa=1 bb=1 cc=2 dd=0
        assert tf.n_docs_ == 2
        # width is the slot-map CAPACITY (×1.5 growth); slots 0-3 are the vocab
        np.testing.assert_array_equal(tf.freq_[:4], [1, 1, 2, 0])
        assert not tf.freq_[4:].any()
        # batch fit over the live docs only must be bit-identical
        batch = TfidfTransformer(reference_compat=False)
        live = cv.transform_table(
            pa.table({"text": ["bb cc", "aa aa cc"]}), "text", "vec")
        batch.load_accumulator(batch.make_partial(live, "vec"))
        np.testing.assert_array_equal(tf.freq_, batch.freq_)
        assert tf.n_docs_ == batch.n_docs_
        sess.close()

    def test_dataset_epoch_applies_pre_in_fit(self, ray_session, tmp_path):
        import ray.data as rd

        cv, sess = self._mk(tmp_path, "tf2", num_shards=2)
        tbl = pa.table({
            "row_id": list(range(6)),
            "text": ["aa bb", "bb cc", "cc", "aa", "dd dd", "bb"],
            "diff": [1, 1, 1, 1, 1, 1],
        })
        sess.process_epoch(0, rd.from_arrow(tbl))
        tf = sess.mce.config[0][1]
        assert tf.n_docs_ == 6
        np.testing.assert_array_equal(tf.freq_[:4], [2, 3, 2, 1])
        assert not tf.freq_[4:].any()
        sess.close()

    def test_default_fit_skips_pre(self, ray_session, tmp_path):
        """pre_transform_in_fit defaults False: fit sees raw columns only
        (the flagship path — derivation cost is paid once, in encode)."""
        sess = IncrementalEncoderSession(
            [("x", StandardScaler())], tmp_path / "tf3", num_shards=1,
            pre_transform=lambda t: t.append_column(
                "derived", pa.array([0.0] * len(t))))
        sess.process_epoch(0, pa.table({"row_id": [0, 1], "x": [1.0, 3.0]}))
        assert sess.mce.config[0][1].mean_ == pytest.approx(2.0)
        sess.close()
