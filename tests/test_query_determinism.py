"""Rows-only queries must be bit-deterministic across runs: the driver
records row counts/hashes once, the judge may re-run — any nondeterminism
(unordered dict iteration, unseeded hashes, union-order-dependent labels)
would silently break comparisons."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def canon(res) -> pd.DataFrame:
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    df = res[sorted(res.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", [
    "dedup_minhash", "dedup_simhash", "fingerprint", "lang_id",
    "ngram_jaccard", "ann_ivf", "token_freq_topk",
    "image_decode", "audio_decode", "video_frames",
    "bpe_train", "bpe_encode", "als_factors", "isotonic",
])
def test_rows_only_queries_deterministic(ray_session, name):
    from diffdataflowmlpipelines_ray.pipelines.queries import QUERIES

    a = canon(QUERIES[name](SF))
    b = canon(QUERIES[name](SF))
    pd.testing.assert_frame_equal(a, b)


def test_late_within_lateness_still_counts(ray_session, tmp_path):
    """allowed_lateness grace period: a row arriving after the watermark
    passed its window end — but within lateness — is still aggregated."""
    import pyarrow as pa

    from diffdataflowmlpipelines_ray.streaming.engine import (
        KeyedAggregation,
        StreamSession,
        WindowSpec,
    )

    sess = StreamSession(tmp_path / "late", num_shards=1)
    sess.add(KeyedAggregation(name="w", input="e", key_cols=["u"],
                              value_col="v", ts_col="ts", aggs=("count",),
                              window=WindowSpec.tumbling(10.0,
                                                         allowed_lateness=50.0)))
    sess.process_epoch(0, {"e": pa.table({"u": [1], "ts": [5.0], "v": [1.0]})},
                       watermark=20.0)  # wm past window [0,10) end, within lateness
    sess.process_epoch(1, {"e": pa.table({"u": [1], "ts": [7.0], "v": [1.0]})},
                       watermark=30.0)  # late row, still inside the grace period
    sess.close()
    out = sess.sinks["w"].read_committed_table().to_pandas()
    win0 = out[out["window_start"] == 0.0]
    assert sess.metrics["late_dropped"] == 0
    assert win0["count"].sum() == 2  # both rows landed in [0,10)


def test_trimmed_mean_tiers_equal(ray_session, monkeypatch):
    """The driver-merge and exchange (groupby + distributed scan) tiers
    of trimmed_mean must agree exactly — same multiset formulas, so the
    tier switch can never change the answer."""
    import diffdataflowmlpipelines_ray.pipelines.queries as Q

    a = Q.q_trimmed_mean(SF)
    monkeypatch.setattr(Q, "_TRIM_DRIVER_MAX_ROWS", 0)
    b = Q.q_trimmed_mean(SF)
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_island_queries_partition_invariant(ray_session):
    """user_streaks / interval_merge / scd2_build are bit-identical when
    the input is fanned to a different block count — the hash(user)
    bucket shuffle makes the in-bucket vectorized shifts see each user's
    complete history regardless of the read partitioning."""
    import ray.data as rd

    import diffdataflowmlpipelines_ray.pipelines.queries as Q

    for fn in (Q.q_user_streaks, Q.q_interval_merge, Q.q_scd2_build):
        a = canon(fn(SF))
        orig = Q._read

        def fanned(sf_dir, table, columns=None, blocks=None):
            return orig(sf_dir, table, columns, blocks=7)

        Q._read = fanned
        try:
            b = canon(fn(SF))
        finally:
            Q._read = orig
        pd.testing.assert_frame_equal(a, b)
