"""Corpus-cleaning operators: line dedup, decontamination, regex masking,
sessionization, exact distinct-per-group."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from diffdataflowmlpipelines_ray.stages.relational import (
    distinct_count_per_group,
    sessionize,
)
from diffdataflowmlpipelines_ray.stages.text_clean import (
    contamination_set,
    explode_lines,
    flag_contaminated,
    mask_pattern,
    remove_frequent_lines,
    rewrap_words,
)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


class TestLines:
    def test_explode_lines(self, ray_session):
        ds = _docs([(1, "a\nb\nc"), (2, "x"), (3, "")])
        df = explode_lines(ds).to_pandas().sort_values(
            ["doc_id", "ln"]).reset_index(drop=True)
        assert list(df.itertuples(index=False, name=None)) == [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "x"), (3, 1, "")]

    def test_rewrap_words(self, ray_session):
        ds = _docs([(1, "a b c d e"), (2, "x y z")])
        df = rewrap_words(ds, words_per_line=3).to_pandas().sort_values(
            ["doc_id", "ln"]).reset_index(drop=True)
        assert list(df.itertuples(index=False, name=None)) == [
            (1, 1, "a b c"), (1, 2, "d e"), (2, 1, "x y z")]

    def test_remove_frequent_lines(self, ray_session):
        # "cookie banner" appears in 3 docs → dropped at min_count=3;
        # "rare" appears twice → kept
        ds = _docs([(1, "cookie banner\nbody one\nrare"),
                    (2, "cookie banner\nbody two\nrare"),
                    (3, "cookie banner\nbody three")])
        lines = explode_lines(ds).materialize()
        kept = remove_frequent_lines(lines, min_count=3).to_pandas()
        assert "cookie banner" not in set(kept["line"])
        assert (kept["line"] == "rare").sum() == 2
        assert len(kept) == 5

    def test_remove_frequent_counts_occurrences_not_docs(self, ray_session):
        # the same line twice in ONE doc counts twice
        ds = _docs([(1, "dup\ndup"), (2, "dup\nother")])
        lines = explode_lines(ds).materialize()
        kept = remove_frequent_lines(lines, min_count=3).to_pandas()
        assert set(kept["line"]) == {"other"}


class TestDecontaminate:
    def test_planted_overlap(self, ray_session):
        secret = "alpha beta gamma delta epsilon"  # the 5-gram to leak
        ds = _docs([
            (0, f"test doc with {secret} inside"),        # held-out
            (1, f"corpus doc leaking {secret} verbatim"),  # contaminated
            (2, "clean corpus doc nothing shared here at all"),
            (3, "short"),                                  # < n words
        ])
        test_ds = ds.filter(lambda r: r["doc_id"] == 0)
        ref = ray.put(contamination_set(test_ds, n=5))
        out = flag_contaminated(ds, ref, n=5).to_pandas().set_index("doc_id")
        assert bool(out.loc[0, "contaminated"])   # self-overlap
        assert bool(out.loc[1, "contaminated"])
        assert not bool(out.loc[2, "contaminated"])
        assert not bool(out.loc[3, "contaminated"])

    def test_ngrams_do_not_span_documents(self, ray_session):
        # doc1 ends with the first 4 words, doc2 starts with the last —
        # the would-be spanning 5-gram must NOT register
        ds = _docs([(1, "p q alpha beta gamma delta"),
                    (2, "epsilon r s t u")])
        test = _docs([(9, "alpha beta gamma delta epsilon")])
        ref = ray.put(contamination_set(test, n=5))
        out = flag_contaminated(ds, ref, n=5).to_pandas()
        assert not out["contaminated"].any()

    def test_empty_contamination_set(self, ray_session):
        ds = _docs([(1, "some words here worth checking")])
        ref = ray.put(np.empty(0, dtype=np.uint64))
        out = flag_contaminated(ds, ref, n=5).to_pandas()
        assert not out["contaminated"].any()


class TestMask:
    def test_mask_pattern(self, ray_session):
        ds = _docs([(1, "email me at bob@x.com or alice@y.org today")])
        out = mask_pattern(
            ds, "text", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "<EMAIL>", "masked").to_pandas()
        assert out.loc[0, "masked"] == "email me at <EMAIL> or <EMAIL> today"
        assert out.loc[0, "text"].startswith("email me at bob@")  # untouched

    def test_mask_in_place(self, ray_session):
        ds = _docs([(1, "id 1234567 end")])
        out = mask_pattern(ds, "text", r"\d{5,}", "<NUM>").to_pandas()
        assert out.loc[0, "text"] == "id <NUM> end"


class TestSessionize:
    def test_gap_boundary_exact(self, ray_session):
        # gaps of exactly 1800 s stay in-session (strict >), 1800.000001 splits
        base = pd.Timestamp("2024-01-01")
        ts = [base,
              base + pd.Timedelta(seconds=1800),            # same session
              base + pd.Timedelta(seconds=3600, microseconds=1),  # splits
              base + pd.Timedelta(seconds=3700)]
        ds = rd.from_arrow(pa.table({
            "u": pa.array([7, 7, 7, 7], type=pa.int64()),
            "eid": pa.array([0, 1, 2, 3], type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }))
        df = sessionize(ds, ["u"], "ts", gap=1800.0, order_cols=["eid"]
                        ).to_pandas().sort_values("eid")
        assert list(df["session_no"]) == [1, 1, 2, 2]

    def test_multi_key_numbering(self, ray_session):
        ds = rd.from_arrow(pa.table({
            "u": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "eid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "ts": pa.array([0.0, 10.0, 5000.0, 0.0, 9000.0]),
        }))
        df = sessionize(ds, ["u"], "ts", gap=1800.0, order_cols=["eid"]
                        ).to_pandas().sort_values("eid")
        assert list(df["session_no"]) == [1, 1, 2, 1, 2]

    def test_matches_pandas_reference(self, ray_session):
        rng = np.random.default_rng(3)
        n = 3000
        pdf = pd.DataFrame({
            "u": rng.integers(0, 40, n),
            "eid": np.arange(n),
            "ts": rng.uniform(0, 500_000, n),
        })
        got = sessionize(rd.from_pandas(pdf), ["u"], "ts", gap=1800.0,
                         order_cols=["eid"], buckets=8).to_pandas()
        ref = pdf.sort_values(["u", "ts", "eid"]).copy()
        new = (ref.groupby("u")["ts"].diff() > 1800.0) | \
            ref.groupby("u")["ts"].diff().isna()
        ref["session_no"] = new.astype(np.int64).groupby(ref["u"]).cumsum()
        merged = got.merge(ref[["eid", "session_no"]], on="eid",
                           suffixes=("", "_ref"))
        assert (merged["session_no"] == merged["session_no_ref"]).all()


class TestDistinctPerGroup:
    def test_matches_pandas(self, ray_session):
        rng = np.random.default_rng(11)
        pdf = pd.DataFrame({"g": rng.integers(0, 20, 5000),
                            "v": rng.integers(0, 400, 5000)})
        got = distinct_count_per_group(rd.from_pandas(pdf), ["g"], "v",
                                       buckets=16)
        ref = (pdf.groupby("g")["v"].nunique().reset_index()
               .rename(columns={"v": "n_distinct"}))
        merged = got.merge(ref, on="g", suffixes=("", "_ref"))
        assert len(merged) == len(ref)
        assert (merged["n_distinct"] == merged["n_distinct_ref"]).all()


class TestAnalytics:
    def test_grouped_quantiles_match_pandas(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import (
            grouped_quantiles,
        )
        rng = np.random.default_rng(5)
        pdf = pd.DataFrame({"g": rng.integers(0, 6, 4000),
                            "v": rng.uniform(0, 100, 4000)})
        got = grouped_quantiles(rd.from_pandas(pdf), ["g"], "v",
                                qs=(0.25, 0.5), buckets=8)
        ref = pdf.groupby("g")["v"].quantile([0.25, 0.5]).unstack()
        for _, r in got.iterrows():
            assert r["q0_25"] == pytest.approx(ref.loc[r["g"], 0.25])
            assert r["q0_5"] == pytest.approx(ref.loc[r["g"], 0.5])

    def test_running_total_exact_cents(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import (
            running_total,
        )
        pdf = pd.DataFrame({
            "u": [1, 1, 1, 2], "eid": [0, 1, 2, 3],
            "ts": [0.0, 1.0, 2.0, 0.0],
            "value": [0.1, 0.2, 0.3, 5.05],
        })
        got = (running_total(rd.from_pandas(pdf), ["u"], "ts", "value",
                             order_cols=["eid"], buckets=4)
               .to_pandas().sort_values("eid"))
        # float 0.1+0.2 != 0.3 — cents accumulation must be exact
        assert list(got["running"]) == [0.1, 0.3, 0.6, 5.05]

    def test_latest_per_key(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import (
            latest_per_key,
        )
        rng = np.random.default_rng(9)
        n = 2000
        pdf = pd.DataFrame({
            "u": rng.integers(0, 30, n), "eid": np.arange(n),
            "ts": rng.uniform(0, 1000, n),
            "val": rng.uniform(0, 10, n),
        })
        got = latest_per_key(rd.from_pandas(pdf), ["u"], "ts",
                             order_cols=["eid"])
        ref = (pdf.sort_values(["ts", "eid"]).groupby("u", as_index=False)
               .tail(1).sort_values("u").reset_index(drop=True))
        assert list(got["eid"]) == list(ref["eid"])


class TestExactGlobalQuantiles:
    def test_matches_numpy(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import (
            exact_global_quantiles,
        )
        rng = np.random.default_rng(0)
        for data in (rng.uniform(0, 1000, 50_000),
                     np.repeat([5.0, 7.0], [30_000, 20_000]),  # heavy dups
                     rng.normal(0, 1, 30_001)):
            ds = rd.from_pandas(pd.DataFrame({"x": data})).repartition(8)
            got = exact_global_quantiles(ds, "x", qs=(0.25, 0.5, 0.9),
                                         cap=2000)
            ref = np.quantile(data, [0.25, 0.5, 0.9], method="linear")
            for q, r in zip((0.25, 0.5, 0.9), ref):
                assert got[q] == pytest.approx(r, abs=1e-9)

    def test_small_input_single_fetch(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import (
            exact_global_quantiles,
        )
        data = np.array([3.0, 1.0, 2.0, 4.0])
        ds = rd.from_pandas(pd.DataFrame({"x": data}))
        got = exact_global_quantiles(ds, "x", qs=(0.5,))
        assert got[0.5] == pytest.approx(2.5)


class TestHeavyHitters:
    def test_exact_on_zipf(self, ray_session):
        from diffdataflowmlpipelines_ray.state.sketches import heavy_hitters
        rng = np.random.default_rng(1)
        vals = np.minimum(rng.zipf(1.5, 30_000), 5000).astype(str)
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
        got = heavy_hitters(ds, "v", k=10, m=64)
        ref = (pd.Series(vals).value_counts().reset_index())
        ref.columns = ["v", "cnt"]
        ref = ref.sort_values(["cnt", "v"],
                              ascending=[False, True]).head(10)
        assert list(got["v"]) == list(ref["v"])
        assert list(got["cnt"]) == list(ref["cnt"])

    def test_raises_when_unprovable(self, ray_session):
        from diffdataflowmlpipelines_ray.state.sketches import heavy_hitters
        # near-uniform over many values with tiny m: dropped mass swamps
        # the k-th count → must refuse rather than return a guess
        rng = np.random.default_rng(2)
        vals = rng.integers(0, 5000, 20_000).astype(str)
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
        with pytest.raises(RuntimeError, match="not provably exact"):
            heavy_hitters(ds, "v", k=5, m=8)


class TestFrequentLinePaths:
    def test_driver_and_shuffle_merge_agree(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_clean import (
            frequent_line_hashes,
        )
        rng = np.random.default_rng(6)
        lines = [f"line {i % 50}" for i in rng.integers(0, 200, 3000)]
        ds = rd.from_pandas(pd.DataFrame({"line": lines})).repartition(6)
        fast = frequent_line_hashes(ds, min_count=5)
        slow = frequent_line_hashes(ds, min_count=5, driver_merge_limit=0)
        assert np.array_equal(fast, slow)
        assert len(fast) > 0


class TestDupSpans:
    def _ds(self, texts):
        return rd.from_pandas(pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts})).repartition(3)

    def test_planted_cross_doc_span(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_clean import dup_span_stats

        span = "alpha beta gamma delta"          # 4 words, k=4 → 1 window
        texts = [f"one two {span} three four",   # window at pos 3
                 f"{span} five six seven eight", # window at pos 1
                 "no duplicated material here at all"]
        out = (dup_span_stats(self._ds(texts), k=4).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        # doc 0: 8 words, 5 windows; only the planted one (pos 3) is dup;
        # coverage = 4 words
        assert out.loc[0, ["n_words", "n_windows", "n_dup_windows",
                           "n_dup_words"]].tolist() == [8, 5, 1, 4]
        assert out.loc[1, ["n_dup_windows", "n_dup_words"]].tolist() == [1, 4]
        assert out.loc[2, ["n_dup_windows", "n_dup_words"]].tolist() == [0, 0]

    def test_within_doc_repeat_and_interval_union(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_clean import dup_span_stats

        # "a b c a b c a b c" with k=3: windows (a b c) at 1,4,7 (dup ×3),
        # (b c a) at 2,5 (dup ×2), (c a b) at 3,6 (dup ×2) → ALL 7 windows
        # duplicated, coverage = the whole 9 words (overlapping union)
        out = dup_span_stats(self._ds(["a b c a b c a b c"]),
                             k=3).to_pandas()
        assert out.iloc[0][["n_words", "n_windows", "n_dup_windows",
                            "n_dup_words"]].tolist() == [9, 7, 7, 9]

    def test_short_doc_contributes_nothing(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_clean import dup_span_stats

        out = (dup_span_stats(self._ds(["one two", "one two"]), k=4)
               .to_pandas().sort_values("doc_id"))
        assert (out["n_windows"] == 0).all()
        assert (out["n_dup_windows"] == 0).all()

    def test_broadcast_and_semijoin_paths_agree(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_clean import dup_span_stats

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
                 for _ in range(60)]
        texts += texts[:10]  # guarantee full-doc duplicates
        a = (dup_span_stats(self._ds(texts), k=5).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (dup_span_stats(self._ds(texts), k=5, broadcast_limit=0)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert a["n_dup_windows"].sum() > 0


class TestChunkTokens:
    def _run(self, texts, ids, size, stride, parts):
        import ray.data as rd

        from diffdataflowmlpipelines_ray.stages.text_clean import (
            chunk_tokens,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts)})).repartition(parts)
        out = chunk_tokens(ds, size=size, stride=stride).to_pandas()
        return sorted((int(r.doc_id), int(r.chunk_id), int(r.n_tokens),
                       r.chunk) for r in out.itertuples())

    def _brute(self, texts, ids, size, stride):
        out = []
        for did, t in zip(ids, texts):
            tk = t.split()
            i = 0
            while i * stride < len(tk):
                w = tk[i * stride:i * stride + size]
                out.append((did, i, len(w), " ".join(w)))
                i += 1
        return sorted(out)

    def test_matches_brute_force(self, ray_session):
        texts = ["a b c d e f g", "x y", "", "one",
                 " ".join(f"t{i}" for i in range(25))]
        ids = [3, 1, 7, 2, 5]
        for size, stride in [(4, 3), (5, 5), (3, 1)]:
            want = self._brute(texts, ids, size, stride)
            assert self._run(texts, ids, size, stride, 1) == want
            assert self._run(texts, ids, size, stride, 4) == want

    def test_overlap_consistency(self, ray_session):
        # consecutive chunks share exactly size - stride tokens
        got = self._run([" ".join(f"w{i}" for i in range(10))], [0], 4, 2, 1)
        chunks = [g[3].split() for g in got]
        for a, b in zip(chunks, chunks[1:]):
            assert a[2:] == b[:len(a) - 2]

    def test_invalid_stride_raises(self, ray_session):
        import ray.data as rd

        from diffdataflowmlpipelines_ray.stages.text_clean import (
            chunk_tokens,
        )

        ds = rd.from_items([{"doc_id": 0, "text": "a"}])
        with pytest.raises(ValueError):
            chunk_tokens(ds, size=4, stride=5)
        with pytest.raises(ValueError):
            chunk_tokens(ds, size=4, stride=0)


class TestMixtureSample:
    def _run(self, ids, groups, parts):
        import ray.data as rd

        from diffdataflowmlpipelines_ray.stages.text_clean import (
            mixture_sample,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(groups)})).repartition(parts)
        out = mixture_sample(ds).to_pandas()
        return sorted(out["doc_id"].tolist())

    def test_partition_invariant_and_matches_brute(self, ray_session):
        from diffdataflowmlpipelines_ray.functions.hashing import (
            stable_hash60,
        )

        rng = np.random.default_rng(9)
        groups = (["big"] * 400 + ["mid"] * 100 + ["small"] * 25)
        rng.shuffle(groups)
        ids = list(range(len(groups)))
        n = {g: groups.count(g) for g in set(groups)}
        t_cap = min(np.sqrt(np.float64(c)) for c in n.values())
        want = sorted(
            i for i, g in zip(ids, groups)
            if (stable_hash60(str(i)) % 1_000_000)
            < (np.sqrt(np.float64(n[g])) * t_cap) / np.float64(n[g])
            * 1_000_000)
        assert self._run(ids, groups, 1) == want
        assert self._run(ids, groups, 5) == want

    def test_sqrt_proportions(self, ray_session):
        # expected survivors ∝ sqrt(n_s): big keeps ~sqrt(400*25)=100,
        # small keeps all 25 (threshold = 1e6 exactly? sqrt(25)*5/25*1e6
        # = 1e6 — hash < 1e6 always true), mid ~sqrt(100*25)=50
        groups = ["big"] * 400 + ["mid"] * 100 + ["small"] * 25
        ids = list(range(len(groups)))
        kept = self._run(ids, groups, 3)
        by = {"big": 0, "mid": 0, "small": 0}
        for i in kept:
            by[groups[i]] += 1
        assert by["small"] == 25           # smallest source keeps all
        assert 70 <= by["big"] <= 130      # binomial around 100
        assert 30 <= by["mid"] <= 70       # binomial around 50


class TestHashSplit:
    def test_partition_invariant_exhaustive_and_disjoint(self, ray_session):
        import ray.data as rd

        from diffdataflowmlpipelines_ray.stages.text_clean import hash_split

        ids = list(range(300))
        mk = lambda p: rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64())})).repartition(p)
        a = hash_split(mk(1)).to_pandas().sort_values("doc_id")
        b = hash_split(mk(5)).to_pandas().sort_values("doc_id")
        assert a["split"].tolist() == b["split"].tolist()
        assert set(a["split"]) <= {"train", "test", "val"}
        frac = a["split"].value_counts(normalize=True)
        assert 0.7 < frac["train"] < 0.9  # binomial around 0.8

    def test_custom_fractions_and_validation(self, ray_session):
        import ray.data as rd

        from diffdataflowmlpipelines_ray.stages.text_clean import hash_split

        ds = rd.from_arrow(pa.table({"doc_id": pa.array(
            range(100), type=pa.int64())}))
        out = hash_split(ds, {"a": 0.5, "b": 0.5}).to_pandas()
        assert set(out["split"]) <= {"a", "b"}
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(ds, {"a": 0.5, "b": 0.4})


class TestWeightedSample:
    def _run(self, ids, w, k, parts, seed=0):
        import ray.data as rd

        from diffdataflowmlpipelines_ray.stages.text_clean import (
            weighted_sample,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "w": pa.array(w, type=pa.int64())})).repartition(parts)
        return weighted_sample(ds, "w", k, seed=seed).tolist()

    def test_partition_invariant_and_matches_brute(self, ray_session):
        from diffdataflowmlpipelines_ray.functions.hashing import (
            stable_hash60,
        )

        ids = list(range(200))
        w = [(i % 7) * 10 + 1 for i in ids]
        def key(i, wi):
            u = (stable_hash60(f"0:{i}") % 1_000_000 + 1.0) / 1_000_001.0
            return np.power(u, 1.0 / np.float64(wi))
        want = sorted(sorted(ids, key=lambda i: (-key(i, w[i]), i))[:50])
        assert self._run(ids, w, 50, 1) == want
        assert self._run(ids, w, 50, 6) == want

    def test_weight_bias(self, ray_session):
        # half the corpus has 50x the weight: it must dominate the sample
        ids = list(range(1000))
        w = [50 if i < 500 else 1 for i in ids]
        got = self._run(ids, w, 100, 4)
        heavy = sum(1 for i in got if i < 500)
        assert heavy >= 85

    def test_invalid_weight_raises(self, ray_session):
        with pytest.raises(Exception):
            self._run([1, 2], [0, 5], 1, 1)
