"""Fuzzy join: batched Levenshtein vs DuckDB, end-to-end exactness vs a
brute-force cross join, and the degenerate-gram-set recall guard."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diffdataflowmlpipelines_ray.stages.fuzzy import (
    fuzzy_join,
    levenshtein_batch,
)


class TestLevenshteinBatch:
    def test_matches_duckdb_random(self):
        rng = np.random.default_rng(0)
        alpha = list("abcde")
        A = ["".join(rng.choice(alpha, rng.integers(0, 12)))
             for _ in range(500)]
        B = ["".join(rng.choice(alpha, rng.integers(0, 12)))
             for _ in range(500)]
        got = levenshtein_batch(A, B)
        df = pd.DataFrame({"a": A, "b": B})
        con = duckdb.connect()
        want = (con.sql("SELECT levenshtein(a,b) AS d FROM df").df()["d"]
                .to_numpy())
        assert np.array_equal(got, want)

    def test_empty_and_unicode(self):
        assert levenshtein_batch(["", "abc", "héllo"],
                                 ["xy", "", "hello"]).tolist() == [2, 3, 1]


class TestFuzzyJoin:
    @pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
    def test_exact_vs_brute_force(self, ray_session, strategy):
        rng = np.random.default_rng(7)
        alpha = list("abcde")
        L = pd.DataFrame({
            "lid": np.arange(250, dtype=np.int64),
            "nm": ["".join(rng.choice(alpha, rng.integers(0, 10)))
                   for _ in range(250)]})
        R = pd.DataFrame({
            "rid": np.arange(200, dtype=np.int64),
            "nm2": ["".join(rng.choice(alpha, rng.integers(0, 10)))
                    for _ in range(200)]})
        out = (fuzzy_join(rd.from_pandas(L).repartition(3),
                          rd.from_pandas(R).repartition(4),
                          "nm", "nm2", "lid", "rid", max_dist=2,
                          strategy=strategy)
               .to_pandas().sort_values(["lid", "rid"])
               .reset_index(drop=True)[["lid", "rid", "dist"]])
        con = duckdb.connect()
        want = (con.sql(
            "SELECT lid, rid, levenshtein(nm, nm2)::BIGINT AS dist "
            "FROM L, R WHERE levenshtein(nm, nm2) <= 2").df()
            .sort_values(["lid", "rid"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(out.astype("int64"),
                                      want.astype("int64"))
        assert len(out) > 0

    def test_degenerate_gram_sets_still_found(self, ray_session):
        # "aa" vs "bb": gram sets {aa} and {bb} share nothing — only the
        # sentinel blocking can recall this distance-2 pair
        L = pd.DataFrame({"lid": np.array([0, 1], dtype=np.int64),
                          "nm": ["aa", "zzzzzzzz"]})
        R = pd.DataFrame({"rid": np.array([0, 1], dtype=np.int64),
                          "nm2": ["bb", ""]})
        out = (fuzzy_join(rd.from_pandas(L), rd.from_pandas(R),
                          "nm", "nm2", "lid", "rid", max_dist=2,
                          strategy="shuffle")
               .to_pandas().sort_values(["lid", "rid"])
               .reset_index(drop=True))
        # (aa,bb)=2 and (aa,"")=2 match; zzzzzzzz matches nothing
        assert out[["lid", "rid", "dist"]].values.tolist() == [
            [0, 0, 2], [0, 1, 2]]


def test_hot_gram_salting_preserves_result(ray_session):
    """A corpus where every string shares one scorching-hot gram must salt
    (expected pairs ≫ _FUZZY_SALT_TARGET triggers the subgroup split) and
    still return the exact brute-force pair set."""
    import ray.data as rd

    import diffdataflowmlpipelines_ray.stages.fuzzy as fz

    old = fz._FUZZY_SALT_TARGET
    fz._FUZZY_SALT_TARGET = 50     # force salting at toy scale
    try:
        names = [f"ZZ-{i:03d}" for i in range(60)]   # all share 'ZZ'/'Z-'
        lt = rd.from_items([{"k": i, "s": s}
                            for i, s in enumerate(names)]).repartition(3)
        rt = rd.from_items([{"k": 1000 + i, "s": s[:5] + "X"}
                            for i, s in enumerate(names)]).repartition(2)
        got = sorted(
            (int(r["lid"]), int(r["rid"]), int(r["dist"]))
            for r in fz.fuzzy_join(lt, rt, "s", "s", "k", "k",
                                   max_dist=2,
                                   strategy="shuffle").take_all())
        want = []
        for i, a in enumerate(names):
            for j, b in enumerate(n[:5] + "X" for n in names):
                d = fz.levenshtein_batch([a], [b])[0]
                if d <= 2:
                    want.append((i, 1000 + j, int(d)))
        assert got == sorted(want)
    finally:
        fz._FUZZY_SALT_TARGET = old
