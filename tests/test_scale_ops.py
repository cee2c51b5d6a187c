"""Dedup family, ANN, text analysis, multimodal plumbing tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from diffdataflowmlpipelines_ray.stages.dedup import (
    MinHashParams,
    embedding_dedup_pairs,
    exact_dedup,
    minhash_dedup_groups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dedup_groups,
    union_find_components,
)
from diffdataflowmlpipelines_ray.stages.multimodal import (
    DecodeImage,
    SampleFrames,
    decode_image_features,
)
from diffdataflowmlpipelines_ray.stages.similarity import brute_force_topk, ivf_topk
from diffdataflowmlpipelines_ray.stages.text_stats import (
    LangId,
    add_lang_id,
    add_text_stats,
)

SF = "/root/testdata/sf0.001"


def docs_ds(rows):
    return rd.from_arrow(pa.table(rows)).repartition(2)


class TestExactDedup:
    def test_keeps_min_id(self, ray_session):
        ds = docs_ds({
            "doc_id": [5, 3, 1, 2, 4],
            "text": ["aa", "bb", "aa", "cc", "bb"],
        })
        out = exact_dedup(ds, "text", "doc_id").take_all()
        got = sorted((r["text"], r["doc_id"]) for r in out)
        assert got == [("aa", 1), ("bb", 3), ("cc", 2)]


class TestMinHash:
    def test_identical_docs_same_signature(self, ray_session):
        t = pa.table({"doc_id": [1, 2], "text": ["a b c d e f", "a b c d e f"]})
        sig = minhash_signatures(t, "text", MinHashParams())
        s = sig["sig"].to_pylist()
        assert s[0] == s[1]

    def test_near_dups_grouped(self, ray_session):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        other = "completely different content about spark streams and arrow batches ok"
        ds = docs_ds({"doc_id": [1, 2, 3], "text": [base, near, other]})
        groups = minhash_dedup_groups(ds, threshold=0.5)
        g = dict(zip(groups["doc_id"].to_pylist(), groups["group_id"].to_pylist()))
        assert g.get(1) == g.get(2)
        assert 3 not in g  # unique doc not in any dup group

    def test_union_find(self):
        comp = union_find_components([(1, 2), (2, 3), (10, 11)])
        assert comp[1] == comp[2] == comp[3]
        assert comp[10] == comp[11]
        assert comp[1] != comp[10]


class TestSimHash:
    def test_exact_dups_and_near(self, ray_session):
        a = "one two three four five six seven eight nine ten"
        ds = docs_ds({"doc_id": [1, 2, 3], "text": [a, a, "unrelated words here entirely"]})
        groups = simhash_dedup_groups(ds, max_hamming=3)
        g = dict(zip(groups["doc_id"].to_pylist(), groups["group_id"].to_pylist()))
        assert g.get(1) == g.get(2)
        assert 3 not in g


class TestNgramJaccard:
    def test_exact_scores(self, ray_session):
        ds = docs_ds({"doc_id": [1, 2], "text": ["a b c d", "a b c e"]})
        pairs = pa.table({"id_lo": [1], "id_hi": [2]})
        out = ngram_jaccard_pairs(ds, pairs, n=3)
        # 3-grams: {abc,bcd} vs {abc,bce} → 1/3
        assert out["jaccard"].to_pylist()[0] == pytest.approx(1 / 3)


class TestEmbeddingDedup:
    def test_near_identical_vectors(self, ray_session):
        rng = np.random.default_rng(0)
        v = rng.normal(size=16)
        near = v + rng.normal(scale=0.001, size=16)
        far = rng.normal(size=16)
        ds = docs_ds({"vec_id": [1, 2, 3],
                      "embedding": [v.tolist(), near.tolist(), far.tolist()]})
        pairs = embedding_dedup_pairs(ds, threshold=0.99)
        assert (1, 2) in set(zip(pairs["id_lo"].to_pylist(), pairs["id_hi"].to_pylist()))


class TestSimilarity:
    def test_brute_force_matches_numpy(self, ray_session):
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        ds = rd.from_arrow(tbl).repartition(3)
        mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        ids = np.array(tbl["vec_id"].to_pylist())
        q = mat[:3]
        out = brute_force_topk(ds, q, k=5, query_ids=ids[:3]).to_pandas()
        # reference: plain numpy
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mn @ qn.T
        for c, qid in enumerate(ids[:3]):
            col = sims[:, c]
            order = np.lexsort((ids, -col))
            expect = [ids[i] for i in order if ids[i] != qid][:5]
            got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
            assert got == expect

    def test_ivf_recall_reasonable(self, ray_session):
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        ds = rd.from_arrow(tbl).repartition(3)
        mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        ids = np.array(tbl["vec_id"].to_pylist())
        q = mat[:5]
        exact = brute_force_topk(ds, q, k=5, query_ids=ids[:5]).to_pandas()
        approx = ivf_topk(ds, q, k=5, n_clusters=8, nprobe=4,
                          query_ids=ids[:5]).to_pandas()
        # recall@5 over 5 queries ≥ 0.5 (probing half the lists)
        hits = 0
        for qid in ids[:5]:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
        assert hits / 25 >= 0.5


class TestProductQuantization:
    def _load(self):
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        ds = rd.from_arrow(tbl).repartition(3)
        mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        ids = np.array(tbl["vec_id"].to_pylist())
        return ds, mat, ids

    def test_refined_recall_bound(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.similarity import pq_topk

        ds, mat, ids = self._load()
        exact = brute_force_topk(ds, mat[:8], k=10,
                                 query_ids=ids[:8]).to_pandas()
        approx = pq_topk(ds, mat[:8], k=10, m=16, n_codes=64, refine=4,
                         query_ids=ids[:8]).to_pandas()
        hits = sum(
            len(set(exact[exact["query_id"] == q]["vec_id"])
                & set(approx[approx["query_id"] == q]["vec_id"]))
            for q in ids[:8])
        assert hits / 80 >= 0.9  # seeded → deterministic (observed 0.95)

    def test_partitioning_invariant(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.similarity import pq_topk

        ds, mat, ids = self._load()
        a = pq_topk(ds.repartition(2), mat[:6], k=8, m=16, n_codes=64,
                    refine=3, query_ids=ids[:6]).to_pandas()
        b = pq_topk(ds.repartition(8), mat[:6], k=8, m=16, n_codes=64,
                    refine=3, query_ids=ids[:6]).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_full_refine_equals_brute_force(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.similarity import pq_topk

        ds, mat, ids = self._load()
        n = len(ids)
        exact = brute_force_topk(ds, mat[:4], k=5,
                                 query_ids=ids[:4]).to_pandas()
        full = pq_topk(ds, mat[:4], k=5, m=16, n_codes=64,
                       refine=n // 5 + 1, query_ids=ids[:4]).to_pandas()
        pd.testing.assert_frame_equal(
            exact[["query_id", "vec_id", "rank"]].reset_index(drop=True),
            full[["query_id", "vec_id", "rank"]].reset_index(drop=True))

    def test_memorizing_codebook_is_exact_adc(self, ray_session):
        # n distinct vectors ≤ n_codes: seeded init picks every point as
        # its own centroid and Lloyd's is a fixed point → ADC scores ARE
        # the exact dot products, so even refine=0 equals brute force
        from diffdataflowmlpipelines_ray.stages.similarity import pq_topk

        rng = np.random.default_rng(5)
        mat = rng.normal(size=(24, 16))
        tbl = pa.table({
            "vec_id": pa.array(np.arange(24, dtype=np.int64)),
            "embedding": pa.array(list(mat.astype(np.float32)),
                                  type=pa.list_(pa.float32()))})
        ds = rd.from_arrow(tbl).repartition(2)
        q = mat[:3].astype(np.float64)
        exact = brute_force_topk(ds, q, k=4,
                                 query_ids=np.arange(3)).to_pandas()
        adc = pq_topk(ds, q, k=4, m=4, n_codes=24, refine=0,
                      sample_size=10_000,
                      query_ids=np.arange(3)).to_pandas()
        pd.testing.assert_frame_equal(
            exact[["query_id", "vec_id", "rank"]].reset_index(drop=True),
            adc[["query_id", "vec_id", "rank"]].reset_index(drop=True))


class TestTextStats:
    def test_counts_match_python(self, ray_session):
        ds = docs_ds({"doc_id": [1, 2],
                      "text": ["The quick  brown fox 42", "a"]})
        out = {r["doc_id"]: r for r in add_text_stats(ds).take_all()}
        assert out[1]["n_tokens"] == 5
        assert out[1]["n_chars_calc"] == len("The quick  brown fox 42")
        assert out[1]["digit_ratio"] == pytest.approx(2 / 23)
        assert out[2]["n_tokens"] == 1
        assert 0.0 <= out[1]["quality_score"] <= 1.0

    def test_lang_id(self, ray_session):
        ds = docs_ds({"doc_id": [1, 2, 3],
                      "text": ["the cat and the dog is happy that it",
                               "der hund und die katze ist nicht da",
                               "这是中文文本"]})
        out = {r["doc_id"]: r["lang_pred"] for r in add_lang_id(ds).take_all()}
        assert out[1] == "en"
        assert out[2] == "de"
        assert out[3] == "zh"


class TestMultimodal:
    def test_decode_stub_deterministic(self, ray_session):
        payloads = [b"img-bytes-1", b"img-bytes-2"]
        ds = docs_ds({"media_id": ["a", "b"], "payload": payloads,
                      "media_type": ["image/png", "image/png"]})
        out = decode_image_features(ds, dim=8).take_all()
        feats = {r["media_id"]: r["features"] for r in out}
        again = decode_image_features(ds, dim=8).take_all()
        feats2 = {r["media_id"]: r["features"] for r in again}
        assert feats == feats2  # deterministic fake decode
        assert len(feats["a"]) == 8 and feats["a"] != feats["b"]

    def test_real_decode_raises(self):
        dec = DecodeImage(fake=False)
        with pytest.raises(NotImplementedError):
            dec(pa.table({"payload": [b"x"]}))

    def test_frame_sampler_expands(self, ray_session):
        t = pa.table({"media_id": ["v1"], "payload": [b"vid"],
                      "media_type": ["video/mp4"]})
        out = SampleFrames(n_frames=3)(t)
        assert out.num_rows == 3
        assert out["frame_no"].to_pylist() == [0, 1, 2]


class TestRound2ScalePaths:
    """VERDICT r1 'done' criteria for the distributed scale fixes."""

    def test_minhash_replicated_corpus_matches_bruteforce(self, ray_session):
        # replicate ≥ 10 templates into a 240-doc corpus; the distributed
        # pairs⋈signatures verify must reproduce a brute-force group check
        templates = [
            "the quick brown fox jumps over the lazy dog number %d edition",
            "streaming engines shuffle arrow batches with backpressure %d ok",
            "completely unrelated text about cooking pasta and sauce %d yum",
        ]
        ids, texts = [], []
        k = 0
        for rep in range(80):
            for t in templates:
                ids.append(k)
                # same text per template (suffix varies only every 40 reps →
                # big exact-dup groups exercise the hot-bucket star path)
                texts.append(t % (rep // 40))
                k += 1
        ds = docs_ds({"doc_id": ids, "text": texts})
        groups = minhash_dedup_groups(ds, threshold=0.9)
        g = dict(zip(groups["doc_id"].to_pylist(),
                     groups["group_id"].to_pylist()))
        # every doc belongs to a group (all texts replicated ≥ 40×)
        assert len(g) == len(ids)
        # docs with identical text share a group labelled by the min id
        by_text: dict = {}
        for i, t in zip(ids, texts):
            by_text.setdefault(t, []).append(i)
        for t, members in by_text.items():
            labels = {g[m] for m in members}
            assert len(labels) == 1, f"split group for {t!r}"
            assert min(members) in members

    def test_exact_dedup_ids_matches_full(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.dedup import exact_dedup_ids

        ds = docs_ds({
            "doc_id": [9, 7, 5, 3, 1],
            "text": ["x", "y", "x", "z", "y"],
        })
        ids = sorted(r["doc_id"] for r in exact_dedup_ids(ds).take_all())
        assert ids == [1, 3, 5]

    def test_star_cap_suppresses_pair_explosion(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.dedup import (
            STAR_PAIR_CAP,
            _pairs_from_collision_groups,
        )
        import pandas as pd

        n = STAR_PAIR_CAP * 4
        dup = pd.DataFrame({
            "band": [0] * n, "band_hash": [1] * n,
            "doc_id": np.arange(n)[::-1],
        })
        pairs = _pairs_from_collision_groups(dup, ["band", "band_hash"],
                                             "doc_id")
        # star pairs only: n−1 rows, all anchored at the group min
        assert len(pairs) == n - 1
        assert (pairs["id_lo"] == 0).all()


class TestMinhashStarCapThreading:
    """ADVICE r4 (medium): minhash_dedup_groups_exact must enumerate FULL
    band buckets (star_cap=None) like its SQL twin; the capped path is the
    production skew guard only."""

    def test_uncapped_candidates_are_complete(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.dedup import (
            STAR_PAIR_CAP,
            minhash_lsh_candidates,
        )

        n = STAR_PAIR_CAP + 16  # one hot bucket: identical texts collide
        ds = docs_ds({"doc_id": list(range(n)),
                      "text": ["common boilerplate tokens here"] * n})
        capped, _ = minhash_lsh_candidates(ds)
        uncapped, _ = minhash_lsh_candidates(ds, star_cap=None)

        def pairset(p):
            return {(r["id_lo"], r["id_hi"]) for r in p.take_all()}

        c, u = pairset(capped), pairset(uncapped)
        # capped: star pairs to the min id only; uncapped: every C(n,2)
        assert c == {(0, i) for i in range(1, n)}
        assert u == {(i, j) for i in range(n) for j in range(i + 1, n)}

    def test_exact_groups_match_brute_force_with_hot_buckets(
            self, ray_session):
        """Sliding-window corpus: every doc shares most shingles (hot
        band buckets form), adjacent windows are true J>=0.9 pairs, far
        windows are not — a star-capped hub would drop mid-chain pairs;
        uncapped grouping must equal the brute-force transitive closure
        of exact word-3-gram Jaccard >= 0.9."""
        from diffdataflowmlpipelines_ray.stages.dedup import (
            minhash_dedup_groups_exact,
            ngram_set,
            union_find_components,
        )

        base = [f"w{i}" for i in range(190)]
        texts = [" ".join(base[i:i + 100]) for i in range(80)]
        ids = list(range(80))
        ds = docs_ds({"doc_id": ids, "text": texts})
        groups = minhash_dedup_groups_exact(ds, threshold=0.9)
        got = dict(zip(groups["doc_id"].to_pylist(),
                       groups["group_id"].to_pylist()))

        grams = [ngram_set(t, 3) for t in texts]
        truth_pairs = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(grams[i] & grams[j])
                union = len(grams[i] | grams[j])
                if union and inter / union >= 0.9:
                    truth_pairs.append((ids[i], ids[j]))
        want = union_find_components(truth_pairs)
        # same membership, same min-id component labels
        assert got == {k: v for k, v in want.items()}


class TestOracleExactDedupGates:
    """The r4 oracle-exact contracts behind the dedup_minhash /
    dedup_simhash gate queries."""

    def test_minhash_exact_verify_thresholds(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.dedup import (
            minhash_dedup_groups_exact,
        )

        long_a = " ".join(f"tok{i}" for i in range(40))
        long_b = " ".join(f"tok{i}" for i in range(1, 40))  # drop first
        short_a = "alpha beta gamma delta"
        short_b = "beta gamma delta"  # J = 1/3 on 3-grams — below 0.9
        ds = docs_ds({
            "doc_id": [1, 2, 3, 4, 5],
            "text": [long_a, long_b, short_a, short_b,
                     "totally different filler words here"],
        })
        groups = minhash_dedup_groups_exact(ds, threshold=0.9)
        g = dict(zip(groups["doc_id"].to_pylist(),
                     groups["group_id"].to_pylist()))
        # long pair: 37 shared of 38∪38 grams → J ≈ 0.95 ≥ 0.9 → grouped
        assert g.get(1) == g.get(2) == 1
        # short pair and the unrelated doc never appear in any group
        assert 3 not in g and 4 not in g and 5 not in g

    def test_simhash_uncapped_exactness(self, ray_session):
        """star_cap=None must test every in-bucket pair — the capped path
        misses (a, b) pairs whose bucket hub is far from both (the bug
        the r4 gate upgrade surfaced)."""
        from diffdataflowmlpipelines_ray.stages.dedup import (
            simhash_column,
            simhash_dedup_groups,
        )
        import itertools

        import pyarrow as pa

        # corpus with exact-dup clusters: uncapped groups == brute force
        words = ["aa", "bb", "cc", "dd", "ee", "ff"]
        ids, texts = [], []
        k = 0
        for combo in itertools.combinations(words, 3):
            for _ in range(2):  # each text twice → hamming-0 pairs
                ids.append(k)
                texts.append(" ".join(combo))
                k += 1
        ds = docs_ds({"doc_id": ids, "text": texts})
        groups = simhash_dedup_groups(ds, max_hamming=3, hasher="poly",
                                      star_cap=None)
        g = dict(zip(groups["doc_id"].to_pylist(),
                     groups["group_id"].to_pylist()))
        # brute force over the poly simhash codes
        tbl = pa.table({"doc_id": ids, "text": texts})
        codes = simhash_column(tbl, "text", hasher="poly")
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(codes[i]) ^ int(codes[j])).count("1")
                if ham <= 3:
                    assert g.get(ids[i]) == g.get(ids[j]) is not None, \
                        f"missed pair ({ids[i]},{ids[j]}) hamming={ham}"

    def test_gate_queries_group_planted_copies(self, ray_session):
        """Every planted copy (id ≥ 10M) groups with its original in the
        simhash gate (exact copies — guaranteed); minhash gate groups the
        long-doc plants whose first-token drop keeps J ≥ 0.9."""
        from diffdataflowmlpipelines_ray.pipelines.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        sim = QUERIES["dedup_simhash"](sf)
        g = dict(zip(sim["doc_id"], sim["group_id"]))
        planted = [d for d in g if d >= 10_000_000]
        assert planted, "fixture must plant copies"
        for d in planted:
            assert g.get(d - 10_000_000) == g[d]

        mh = QUERIES["dedup_minhash"](sf)
        gm = dict(zip(mh["doc_id"], mh["group_id"]))
        paired = [d for d in gm
                  if d >= 10_000_000 and gm.get(d - 10_000_000) == gm[d]]
        assert paired, "long-doc plants must group with their originals"


class TestHashJoinSemiAnti:
    def test_semi_and_anti_partition(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import hash_join

        left = docs_ds({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
        right = docs_ds({"k2": [2, 4, 4, 9]})
        semi = sorted(r["k"] for r in
                      hash_join(left, right, ["k"], ["k2"], how="semi")
                      .take_all())
        anti = sorted(r["k"] for r in
                      hash_join(left, right, ["k"], ["k2"], how="anti")
                      .take_all())
        assert semi == [2, 4]
        assert anti == [1, 3]

    def test_semi_same_key_name(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.relational import hash_join

        left = docs_ds({"doc_id": [1, 2, 3]})
        right = docs_ds({"doc_id": [2]})
        out = hash_join(left, right, ["doc_id"], ["doc_id"], how="semi")
        assert [r["doc_id"] for r in out.take_all()] == [2]


class TestDistributedConnectedComponents:
    def test_matches_driver_version_on_chain(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.iterate import (
            connected_components,
            connected_components_ds,
        )

        n = 120
        edges = pa.table({"id_lo": list(range(n - 1)),
                          "id_hi": list(range(1, n))})
        a = connected_components(edges).to_pandas()
        b = connected_components_ds(edges, buckets=8).to_pandas()
        assert a.equals(b)
        assert (b["component"] == 0).all()

    def test_multi_component_dataset_input(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.iterate import (
            connected_components_ds,
        )

        ds = docs_ds({"id_lo": [5, 6, 30, 31], "id_hi": [6, 7, 31, 32]})
        out = connected_components_ds(ds, buckets=4).to_pandas().set_index("id")
        assert out.loc[7, "component"] == 5
        assert out.loc[32, "component"] == 30


class TestRealPpmDecode:
    @staticmethod
    def _ppm(w, h, seed=0):
        rng = np.random.default_rng(seed)
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        header = f"P6\n# test image\n{w} {h}\n255\n".encode()
        return header + pix.tobytes(), pix

    def test_decode_roundtrip(self):
        from diffdataflowmlpipelines_ray.stages.multimodal import decode_ppm

        payload, pix = self._ppm(7, 5, seed=3)
        out = decode_ppm(payload)
        assert out.shape == (5, 7, 3)
        assert (out == pix).all()

    def test_pgm_gray(self):
        from diffdataflowmlpipelines_ray.stages.multimodal import decode_ppm

        pix = np.arange(12, dtype=np.uint8).reshape(3, 4)
        payload = b"P5\n4 3\n255\n" + pix.tobytes()
        out = decode_ppm(payload)
        assert out.shape == (3, 4)
        assert (out == pix).all()

    def test_real_decode_pipeline(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_image_features,
        )

        payloads, pixes = zip(*[self._ppm(8, 6, seed=i) for i in range(5)])
        ds = docs_ds({
            "media_id": [f"m{i}" for i in range(5)],
            "payload": list(payloads),
        })
        out = decode_image_features(ds, dim=16, fake=False).take_all()
        assert len(out) == 5
        by_id = {r["media_id"]: np.asarray(r["features"]) for r in out}
        # feature[0..2] are the channel means of the REAL pixels
        for i in range(5):
            expect = pixes[i].reshape(-1, 3).mean(axis=0) / 255.0
            np.testing.assert_allclose(by_id[f"m{i}"][:3], expect, rtol=1e-6)

    def test_compressed_formats_still_raise(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import DecodeImage

        dec = DecodeImage(fake=False)
        with pytest.raises(NotImplementedError):
            dec._decode(b"\x89PNG\r\n....")


class TestRealPngDecode:
    """Pure stdlib+numpy PNG codec (multimodal.decode_png/encode_png):
    every spec filter type and mainline color type round-trips, the real
    DecodeImage/ResizeImage paths consume PNG payloads, and the unsupported
    variants stay explicit errors (the library integration point)."""

    @staticmethod
    def _img(h, w, c, seed=0):
        rng = np.random.default_rng(seed)
        shape = (h, w) if c == 1 else (h, w, c)
        return rng.integers(0, 256, shape, dtype=np.uint8)

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_rgb_roundtrip_every_filter(self, filter_type):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_png,
            encode_png,
        )

        pix = self._img(9, 7, 3, seed=filter_type)
        out = decode_png(encode_png(pix, filter_type=filter_type))
        assert out.shape == (9, 7, 3)
        assert (out == pix).all()

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_color_types_roundtrip(self, channels):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_png,
            encode_png,
        )

        pix = self._img(5, 6, channels, seed=channels)
        # Paeth stresses left/up/up-left reconstruction on every color type
        out = decode_png(encode_png(pix, filter_type=4))
        assert out.shape == pix.shape
        assert (out == pix).all()

    def test_palette_decode(self):
        import struct
        import zlib

        from diffdataflowmlpipelines_ray.stages.multimodal import decode_png

        palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                           dtype=np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)
                                  & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"PLTE", palette.tobytes())
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
        out = decode_png(payload)
        assert out.shape == (2, 3, 3)
        assert (out == palette[idx]).all()

    def test_real_decode_pipeline_png(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_image_features,
            encode_png,
        )

        pixes = [self._img(8, 6, 3, seed=10 + i) for i in range(4)]
        ds = docs_ds({
            "media_id": [f"p{i}" for i in range(4)],
            "payload": [encode_png(p, filter_type=i % 5)
                        for i, p in enumerate(pixes)],
        })
        out = decode_image_features(ds, dim=16, fake=False).take_all()
        by_id = {r["media_id"]: np.asarray(r["features"]) for r in out}
        for i in range(4):
            expect = pixes[i].reshape(-1, 3).mean(axis=0) / 255.0
            np.testing.assert_allclose(by_id[f"p{i}"][:3], expect, rtol=1e-6)

    def test_png_resize(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            ResizeImage,
            decode_png,
            encode_png,
        )

        pix = self._img(10, 6, 3, seed=20)
        tbl = pa.table({"media_id": ["a"],
                        "payload": [encode_png(pix, filter_type=2)]})
        out = ResizeImage(3, 5)(tbl)
        img = decode_png(out["payload"].to_pylist()[0])
        assert img.shape == (5, 3, 3)
        assert (img[0, 0] == pix[0, 0]).all()

    def test_unsupported_variants_raise(self):
        import struct
        import zlib

        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_png,
            encode_png,
        )

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)
                                  & 0xFFFFFFFF))

        sig = b"\x89PNG\r\n\x1a\n"
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"JFIF....")
        # 16-bit depth → explicit integration point
        ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        p16 = (sig + chunk(b"IHDR", ihdr16)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(p16)
        # interlaced → explicit integration point
        ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
        p_i = (sig + chunk(b"IHDR", ihdr_i)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(p_i)
        # truncated chunk payload: cut inside the IDAT data region
        good = encode_png(self._img(3, 3, 3, seed=1))
        with pytest.raises(ValueError, match="truncated"):
            decode_png(good[:good.index(b"IDAT") + 6])
        # truncated JPEG now reaches the real baseline decoder and raises
        # there; genuinely-unknown formats still hit the integration point
        with pytest.raises(ValueError):
            DecodeImage(fake=False)._decode(b"\xff\xd8\xff\xe0JFIF")
        with pytest.raises(NotImplementedError):
            DecodeImage(fake=False)._decode(b"GIF89a....")


# 16×16 RGB baseline JPEG from CPython's own test suite
# (Lib/test/imghdrdata/python.jpg, PSF-licensed public test data) — an
# INDEPENDENTLY-ENCODED file with real Annex-K quant/Huffman tables, so the
# decoder is checked against the spec, not just against our own encoder.
_REAL_JPEG_B64 = (
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)


class TestRealJpegDecode:
    """Pure stdlib+numpy baseline JPEG codec (`stages/jpeg.py`): round-trips
    against our own spec-compliant encoder across gray/RGB, every chroma
    subsampling mode, lossy quant steps and restart intervals; decodes an
    independently-encoded real-world file (CPython test fixture, standard
    Annex-K tables); feeds the real DecodeImage/ResizeImage Dataset paths;
    and keeps non-baseline variants explicit errors."""

    @staticmethod
    def _img(h, w, c, seed=0):
        rng = np.random.default_rng(seed)
        shape = (h, w) if c == 1 else (h, w, c)
        return rng.integers(0, 256, shape, dtype=np.uint8)

    def test_gray_constant_exact(self):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((16, 24), 97, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (16, 24)
        assert (out == img).all()  # DC-only block is bit-exact at step 0

    def test_gray_random_near_lossless(self):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._img(21, 35, 1, seed=1)  # non-multiple-of-8 dims
        out = decode_jpeg(encode_jpeg(img, quality_step=0))
        assert out.shape == img.shape
        # quant step 0: error only from rounding DCT coefficients
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    @pytest.mark.parametrize("subsample", ["444", "422", "420"])
    def test_rgb_subsampling_roundtrip(self, subsample):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        # smooth image: chroma subsampling loses little, so the round trip
        # must stay tight in every mode (444 bound is color-rounding only)
        y, x = np.mgrid[0:26, 0:42]
        img = np.stack([(x * 3) % 256, (y * 2) % 256, (x + y) % 256],
                       axis=2).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, subsample=subsample))
        assert out.shape == img.shape
        bound = 2 if subsample == "444" else 16
        assert np.abs(out.astype(int) - img.astype(int)).max() <= bound

    def test_restart_interval_stream(self):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._img(40, 40, 1, seed=2)
        payload = encode_jpeg(img, restart_interval=3)
        assert b"\xff\xdd" in payload          # DRI emitted
        assert payload.count(b"\xff\xd0") >= 1  # RST0 present
        out = decode_jpeg(payload)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_lossy_quality_step_sane(self):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._img(32, 32, 3, seed=3)
        exact = encode_jpeg(img, quality_step=0)
        lossy = encode_jpeg(img, quality_step=6)
        assert len(lossy) < len(exact)  # harder quantization compresses
        out = decode_jpeg(lossy)
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 40  # lossy but recognizable, not garbage

    def test_real_world_fixture_decodes(self):
        import base64

        from diffdataflowmlpipelines_ray.stages.jpeg import decode_jpeg

        img = decode_jpeg(base64.b64decode(_REAL_JPEG_B64))
        assert img.shape == (16, 16, 3)
        # regression-pin the decoded stats (real 4:2:0 file, Annex-K tables)
        means = img.reshape(-1, 3).mean(axis=0)
        np.testing.assert_allclose(means, [97.89, 102.29, 76.36], atol=0.5)

    def test_real_decode_pipeline_jpeg(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_image_features,
        )

        pixes = [self._img(8, 8, 3, seed=30 + i) for i in range(3)]
        payloads = [encode_jpeg(p) for p in pixes]
        ds = docs_ds({
            "media_id": [f"j{i}" for i in range(3)],
            "payload": payloads,
        })
        out = decode_image_features(ds, dim=16, fake=False).take_all()
        by_id = {r["media_id"]: np.asarray(r["features"]) for r in out}
        for i in range(3):
            # features are the means of the DECODED pixels (lossy ±2/px)
            expect = decode_jpeg(payloads[i]).reshape(-1, 3).mean(axis=0) / 255
            np.testing.assert_allclose(by_id[f"j{i}"][:3], expect, rtol=1e-6)

    def test_jpeg_resize(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            ResizeImage,
            resize_nearest,
        )

        pix = self._img(12, 8, 3, seed=40)
        tbl = pa.table({"media_id": ["a"], "payload": [encode_jpeg(pix)]})
        out = ResizeImage(4, 6)(tbl)
        img = decode_jpeg(out["payload"].to_pylist()[0])
        assert img.shape == (6, 4, 3)
        expect = resize_nearest(decode_jpeg(encode_jpeg(pix)), 4, 6)
        # two lossy passes: decoded resize stays within a small bound
        assert np.abs(img.astype(int) - expect.astype(int)).max() <= 4

    def test_non_baseline_variants_raise(self):
        import struct

        from diffdataflowmlpipelines_ray.stages.jpeg import decode_jpeg

        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")
        # progressive (SOF2) → explicit library integration point
        sof2 = struct.pack(">BBHBHHB", 0xFF, 0xC2, 11, 8, 4, 4, 1) \
            + bytes([1, 0x11, 0])
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")
        # truncated scan: cut a valid stream mid-segment
        from diffdataflowmlpipelines_ray.stages.jpeg import encode_jpeg

        good = encode_jpeg(self._img(8, 8, 1, seed=5))
        with pytest.raises(ValueError):
            decode_jpeg(good[:20])


class TestRealResize:
    def test_ppm_resize_roundtrip(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            MEDIA_BATCH_SIZE,
            ResizeImage,
            decode_ppm,
        )

        rng = np.random.default_rng(5)
        pix = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
        payload = b"P6\n6 10\n255\n" + pix.tobytes()
        ds = docs_ds({"media_id": ["a"], "payload": [payload]})
        out = ds.map_batches(
            ResizeImage, fn_constructor_kwargs={"width": 3, "height": 5},
            batch_size=MEDIA_BATCH_SIZE, batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        img = decode_ppm(out[0]["payload"])
        assert img.shape == (5, 3, 3)
        # nearest-neighbor: top-left pixel preserved
        assert (img[0, 0] == pix[0, 0]).all()
        assert out[0]["width"] == 3 and out[0]["height"] == 5

    def test_non_decodable_passthrough(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import ResizeImage

        r = ResizeImage(4, 4)
        import pyarrow as pa

        tbl = pa.table({"media_id": ["x"], "payload": [b"\x89PNGxxxx"]})
        out = r(tbl)
        assert out["payload"].to_pylist() == [b"\x89PNGxxxx"]
        assert out["width"].to_pylist() == [4]


class TestPlantedEmbeddingDedup:
    def test_gate_query_recovers_exactly_the_planted_pairs(self, ray_session):
        """The dedup_embedding gate query plants a ×1.5-scaled, 1e-3-jittered
        copy of every 25th fixture vector; recovery must be exact — each
        planted (id, id+10M) pair found, nothing else at threshold 0.95."""
        from diffdataflowmlpipelines_ray.pipelines.queries import (
            q_dedup_embedding,
        )
        import pyarrow.parquet as pq

        out = q_dedup_embedding(SF)
        ids = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["vec_id"])["vec_id"].to_numpy()
        planted = sorted(int(i) for i in ids if i % 25 == 0)
        assert list(out["id_lo"]) == planted
        assert list(out["id_hi"]) == [i + 10_000_000 for i in planted]
        assert (out["cosine"] > 0.999).all()


class TestAudioDecode:
    def test_wav_roundtrip_and_analytic_features(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            audio_features,
            decode_wav,
            encode_wav,
        )

        rate = 8000
        t = np.arange(1600) / rate
        x = 0.4 * np.sin(2 * np.pi * 500.0 * t)
        samples, r = decode_wav(encode_wav(x, rate))
        assert r == rate
        assert np.abs(samples - x).max() < 1e-4  # 16-bit quantization bound
        f = audio_features(samples, r)
        assert f["duration_ms"] == 200
        assert f["rms"] == pytest.approx(0.4 / np.sqrt(2), rel=1e-3)
        assert f["dom_freq"] == pytest.approx(500.0, abs=5.0)
        assert f["peak"] == pytest.approx(0.4, rel=1e-3)

    def test_unsupported_formats(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            DecodeAudio,
            decode_wav,
        )

        with pytest.raises(ValueError):
            decode_wav(b"ID3\x04mp3-ish bytes")
        with pytest.raises(NotImplementedError):
            DecodeAudio(fake=False)._one(b"ID3\x04mp3-ish bytes")

    def test_actor_pool_stage_over_dataset(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_audio_features,
            encode_wav,
        )

        rate = 4000
        t = np.arange(400) / rate
        rows = {"media_id": [str(i) for i in range(6)],
                "payload": [encode_wav(0.3 * np.sin(2 * np.pi * (100 + 100 * i) * t), rate)
                            for i in range(6)]}
        out = decode_audio_features(
            rd.from_arrow(pa.table({"media_id": rows["media_id"],
                                    "payload": pa.array(rows["payload"], type=pa.binary())})),
            fake=False,
        ).to_pandas().sort_values("media_id").reset_index(drop=True)
        assert list(out.columns) == ["media_id", "sample_rate", "duration_ms",
                                     "rms", "zcr", "peak", "dom_freq"]
        assert (out["sample_rate"] == rate).all()
        assert (out["duration_ms"] == 100).all()
        expected = np.array([100 + 100 * int(m) for m in out["media_id"]])
        assert np.allclose(out["dom_freq"], expected, atol=10.0)


class TestKMeans:
    def _blobs(self, n_per=60, seed=5):
        rng = np.random.default_rng(seed)
        centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 8.0]])
        pts = np.concatenate(
            [c + rng.normal(0, 0.5, (n_per, 2)) for c in centers])
        labels = np.repeat(np.arange(3), n_per)
        return pts, labels

    def _ds(self, pts, blocks=4):
        from diffdataflowmlpipelines_ray.functions.vectors import (
            list_array_from_2d,
        )

        tbl = pa.table({"vec_id": pa.array(np.arange(len(pts)), type=pa.int64()),
                        "embedding": list_array_from_2d(pts)})
        return rd.from_arrow(tbl).repartition(blocks)

    def test_recovers_separated_blobs(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.clustering import (
            kmeans_assign,
            kmeans_fit,
        )

        pts, labels = self._blobs()
        fit = kmeans_fit(self._ds(pts), n_clusters=3, max_iters=30)
        assert sorted(fit["sizes"].tolist()) == [60, 60, 60]
        out = kmeans_assign(self._ds(pts), fit["centroids"]).to_pandas()
        out = out.sort_values("vec_id").reset_index(drop=True)
        # each true blob maps to exactly one cluster id
        for b in range(3):
            assert out.loc[labels == b, "cluster"].nunique() == 1
        # inertia ≈ n · trace(cov) for tight blobs: well under a loose bound
        assert fit["inertia"] < 180 * 2 * 0.5**2 * 3

    def test_parallelism_invariant_fit(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.clustering import kmeans_fit

        pts, _ = self._blobs()
        f2 = kmeans_fit(self._ds(pts, blocks=2), n_clusters=3)
        f8 = kmeans_fit(self._ds(pts, blocks=8), n_clusters=3)
        a = f2["centroids"][np.lexsort(f2["centroids"].T)]
        b = f8["centroids"][np.lexsort(f8["centroids"].T)]
        assert np.allclose(a, b, atol=1e-8)
        assert f2["iters"] == f8["iters"]


class TestPageRank:
    EDGES = pa.table({"id_lo": pa.array([0, 0, 1, 2, 3, 1], type=pa.int64()),
                      "id_hi": pa.array([1, 2, 2, 0, 2, 4], type=pa.int64())})

    def test_driver_matches_power_iteration(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.iterate import pagerank

        out = pagerank(self.EDGES, iters=50)
        ranks = dict(zip(out["id"].to_pylist(), out["rank"].to_pylist()))
        assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
        # hub 0 and sink-heavy 2 dominate; source 3 is weakest
        assert ranks[0] > ranks[1] > ranks[3]
        assert ranks[2] > ranks[4] > ranks[3]
        # hand-rolled dense power iteration (same rule) agrees
        ids = [0, 1, 2, 3, 4]
        deg = {0: 2, 1: 2, 2: 1, 3: 1}
        import numpy as _np
        r = {v: 0.2 for v in ids}
        for _ in range(50):
            dang = sum(r[v] for v in ids if v not in deg)
            nr = {v: 0.15 / 5 + 0.85 * dang / 5 for v in ids}
            for a, b in zip(self.EDGES["id_lo"].to_pylist(),
                            self.EDGES["id_hi"].to_pylist()):
                nr[b] += 0.85 * r[a] / deg[a]
            r = nr
        for v in ids:
            assert ranks[v] == pytest.approx(r[v], abs=1e-12)

    def test_ds_variant_matches_driver(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.iterate import (
            pagerank,
            pagerank_ds,
        )

        a = pagerank(self.EDGES, iters=3)
        b = pagerank_ds(self.EDGES, iters=3, buckets=4)
        da = dict(zip(a["id"].to_pylist(), a["rank"].to_pylist()))
        db = dict(zip(b["id"].to_pylist(), b["rank"].to_pylist()))
        assert set(da) == set(db)
        for k in da:
            assert da[k] == pytest.approx(db[k], abs=1e-12)


class TestLinalg:
    """Distributed moments → PCA / OLS vs exact numpy on the full matrix."""

    @staticmethod
    def _mat(n=400, d=5, seed=7):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(n, d))
        base[:, 2] = 2.5 * base[:, 0] - base[:, 1] + 0.1 * base[:, 2]
        return base

    def _ds(self, mat, blocks):
        return rd.from_arrow(pa.table({
            "row_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            **{f"c{j}": pa.array(mat[:, j]) for j in range(mat.shape[1])},
        })).repartition(blocks)

    def test_moments_match_numpy_any_partitioning(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import column_moments
        mat = self._mat()
        cols = [f"c{j}" for j in range(mat.shape[1])]
        ref_cov = np.cov(mat, rowvar=False, ddof=0)
        for blocks in (1, 3, 11):
            m = column_moments(self._ds(mat, blocks), cols)
            assert m.n == len(mat)
            np.testing.assert_allclose(m.mean, mat.mean(axis=0),
                                       rtol=0, atol=1e-12)
            np.testing.assert_allclose(m.cov(), ref_cov, rtol=1e-12)

    def test_pca_matches_full_eigh(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import (
            column_moments, pca_fit)
        mat = self._mat()
        cols = [f"c{j}" for j in range(mat.shape[1])]
        model = pca_fit(column_moments(self._ds(mat, 4), cols))
        vals, vecs = np.linalg.eigh(np.cov(mat, rowvar=False, ddof=1))
        order = np.argsort(vals)[::-1]
        np.testing.assert_allclose(model["explained_variance"], vals[order],
                                   rtol=1e-9)
        for k, comp in enumerate(model["components"]):
            ref = vecs[:, order[k]]
            # direction equal up to the documented sign convention
            assert (np.allclose(comp, ref, atol=1e-9)
                    or np.allclose(comp, -ref, atol=1e-9))
            assert comp[np.abs(comp).argmax()] > 0

    def test_pca_transform_variance_identity(self, ray_session):
        from diffdataflowmlpipelines_ray.functions.vectors import (
            list_column_to_2d)
        from diffdataflowmlpipelines_ray.stages.linalg import (
            pca_fit, pca_transform, vector_moments)
        mat = self._mat(d=6)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(list(mat)),
        })).repartition(3)
        model = pca_fit(vector_moments(ds, "embedding"), n_components=3)
        tbl = pa.concat_tables(list(
            pca_transform(ds, model, "embedding").iter_batches(
                batch_format="pyarrow")))
        proj = list_column_to_2d(tbl["pc"])
        # projected per-component variance == eigenvalue (ddof=1)
        np.testing.assert_allclose(
            (proj * proj).sum(axis=0) / (len(mat) - 1),
            model["explained_variance"], rtol=1e-9)

    def test_linreg_matches_lstsq(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import (
            column_moments, linreg_fit)
        mat = self._mat()
        cols = [f"c{j}" for j in range(mat.shape[1])]
        fit = linreg_fit(column_moments(self._ds(mat, 5), cols),
                         x_idx=[0, 1, 3], y_idx=2)
        X = np.column_stack([mat[:, [0, 1, 3]], np.ones(len(mat))])
        beta, *_ = np.linalg.lstsq(X, mat[:, 2], rcond=None)
        np.testing.assert_allclose(fit["coef"], beta[:3], rtol=1e-8)
        assert abs(fit["intercept"] - beta[3]) < 1e-8
        resid = X @ beta - mat[:, 2]
        r2_ref = 1.0 - (resid @ resid) / ((mat[:, 2] - mat[:, 2].mean()) ** 2).sum()
        assert abs(fit["r2"] - r2_ref) < 1e-9


class TestLogReg:
    @staticmethod
    def _reference_irls(X, y, max_iters, ridge=1e-6, tol=1e-8):
        """Single-machine IRLS — the exact algorithm logreg_fit distributes."""
        Xb = np.column_stack([X, np.ones(len(X))])
        beta = np.zeros(Xb.shape[1])
        for _ in range(max_iters):
            z = Xb @ beta
            # same safe sigmoid as the engine
            p = np.empty_like(z)
            pos = z >= 0
            p[pos] = 1 / (1 + np.exp(-z[pos]))
            ez = np.exp(z[~pos])
            p[~pos] = ez / (1 + ez)
            g = Xb.T @ (y - p)
            w = p * (1 - p)
            H = (Xb * w[:, None]).T @ Xb
            step = np.linalg.solve(H + ridge * np.eye(len(beta)), g)
            beta = beta + step
            if np.abs(step).max() < tol:
                break
        return beta

    def _ds(self, X, y, blocks):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.array(list(X.astype(np.float64))),
            "label": pa.array(y.astype(np.int32)),
        })).repartition(blocks)

    def test_matches_single_machine_irls(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import logreg_fit
        rng = np.random.default_rng(11)
        X = rng.normal(size=(300, 6))
        y = (X[:, 0] + 0.5 * X[:, 3] + 0.2 * rng.normal(size=300) > 0
             ).astype(np.int64)

        def label(tbl):   # local closure: cloudpickled by value
            return (tbl["label"].to_numpy(zero_copy_only=False) >= 1
                    ).astype(np.float64)

        fit = logreg_fit(self._ds(X, y, 4), "embedding", label,
                         max_iters=8)
        ref = self._reference_irls(X, y.astype(np.float64), max_iters=8)
        np.testing.assert_allclose(fit["coef"], ref[:-1], rtol=1e-7)
        assert abs(fit["intercept"] - ref[-1]) < 1e-7
        assert fit["n"] == 300

    def test_partitioning_invariant_and_separable(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import (
            logreg_fit, logreg_predict)
        rng = np.random.default_rng(3)
        X = rng.normal(size=(240, 4))
        y = (X[:, 1] > 0).astype(np.int64)   # separable on one axis

        def label(tbl):   # local closure: cloudpickled by value
            return (tbl["label"].to_numpy(zero_copy_only=False) >= 1
                    ).astype(np.float64)

        fits = [logreg_fit(self._ds(X, y, b), "embedding", label,
                           max_iters=6) for b in (2, 7)]
        np.testing.assert_allclose(fits[0]["coef"], fits[1]["coef"],
                                   rtol=1e-9)
        assert fits[0]["train_accuracy"] >= 0.99
        scored = pa.concat_tables(list(
            logreg_predict(self._ds(X, y, 3), fits[0],
                           "embedding").iter_batches(
                batch_format="pyarrow")))
        s = scored.sort_by("vec_id")["score"].to_numpy(zero_copy_only=False)
        assert (((s >= 0.5) == (y >= 1)).mean()) >= 0.99


class TestPairVerifyExchangeTier:
    """The fully-distributed (no-driver-pair-structure) verify tier never
    triggers at test scale (pairs ≤ _PAIR_BROADCAST_MAX) — force it by
    patching the tier constant to 0 and assert exact equality with the
    broadcast tier on a corpus with planted near-dups and cross-band
    duplicate candidates."""

    def _corpus(self, n=60):
        rng = np.random.default_rng(7)
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
                 "theta", "iota", "kappa"]
        texts, ids = [], []
        for i in range(n):
            toks = list(rng.choice(words, size=20))
            texts.append(" ".join(toks))
            ids.append(i)
            if i % 5 == 0:  # planted near-dup: one token changed
                toks2 = list(toks)
                toks2[3] = "variant"
                texts.append(" ".join(toks2))
                ids.append(i + 1000)
        return docs_ds({"doc_id": ids, "text": texts}).repartition(6)

    def test_exchange_equals_broadcast(self, ray_session, monkeypatch):
        from diffdataflowmlpipelines_ray.stages import dedup as D

        ds = self._corpus()
        broadcast = D.minhash_dedup_groups(ds, threshold=0.5)
        monkeypatch.setattr(D, "_PAIR_BROADCAST_MAX", 0)
        exchange = D.minhash_dedup_groups(self._corpus(), threshold=0.5)
        b = sorted(zip(broadcast["doc_id"].to_pylist(),
                       broadcast["group_id"].to_pylist()))
        e = sorted(zip(exchange["doc_id"].to_pylist(),
                       exchange["group_id"].to_pylist()))
        assert b == e
        assert len(b) > 0  # planted dups actually found

    def test_exchange_scores_equal_broadcast(self, ray_session, monkeypatch):
        from diffdataflowmlpipelines_ray.stages import dedup as D

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 16))
        vecs[20:] = vecs[:20] + rng.normal(scale=1e-3, size=(20, 16))
        ids = list(range(40))
        ds = docs_ds({"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
                     ).repartition(4)
        broadcast = D.embedding_dedup_pairs(ds, threshold=0.99)
        monkeypatch.setattr(D, "_PAIR_BROADCAST_MAX", 0)
        exchange = D.embedding_dedup_pairs(ds, threshold=0.99)
        b = sorted(zip(broadcast["id_lo"].to_pylist(),
                       broadcast["id_hi"].to_pylist(),
                       np.round(broadcast["cosine"].to_pylist(), 12)))
        e = sorted(zip(exchange["id_lo"].to_pylist(),
                       exchange["id_hi"].to_pylist(),
                       np.round(exchange["cosine"].to_pylist(), 12)))
        assert b == e
        assert len(b) >= 20  # every planted near-identical pair verified

    def test_exchange_hard_cap_logged(self, ray_session, monkeypatch, caplog):
        import logging

        from diffdataflowmlpipelines_ray.stages import dedup as D

        # 10 candidate pairs, cap 2 per bucket → dropped pairs, logged
        pairs = pa.table({"id_lo": list(range(10)),
                          "id_hi": [i + 100 for i in range(10)]})
        sig = docs_ds({"doc_id": list(range(10)) + [i + 100 for i in range(10)],
                       "text": ["same text here"] * 20})
        monkeypatch.setattr(D, "_PAIR_BROADCAST_MAX", 0)

        def always_ok(sa, sb):
            return np.ones(len(sa), dtype=bool)

        out = D._distributed_pair_verify(
            pairs, sig, "doc_id", always_ok, sig_col="text",
            buckets=1, max_pairs_per_bucket=2).to_pandas()
        assert len(out) == 2  # deterministic sorted survivors


class TestVideoAvi:
    """MJPEG/AVI container (stages/avi.py): real RIFF mux/demux feeding the
    real JPEG decode path through SampleFrames."""

    def _frames(self, n, h=16, w=24, seed=3):
        rng = np.random.default_rng(seed)
        return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(n)]

    def test_mux_demux_roundtrip_bytes(self):
        from diffdataflowmlpipelines_ray.stages.avi import (demux_avi,
                                                            encode_avi_mjpeg)
        from diffdataflowmlpipelines_ray.stages.jpeg import encode_jpeg

        frames = self._frames(7)
        avi = encode_avi_mjpeg(frames, fps=12.5)
        info, out = demux_avi(avi)
        assert (info.width, info.height) == (24, 16)
        assert info.n_frames == 7 and info.codec == "MJPG"
        assert abs(info.fps - 12.5) < 1e-12
        # the demuxed chunks ARE the encoder's JPEG payloads, byte-exact —
        # word-aligned padding must never leak into a frame
        for f, p in zip(frames, out):
            assert p == encode_jpeg(f)

    def test_odd_length_chunk_alignment(self):
        """Frames whose JPEG payload has odd length force the RIFF padding
        path; every following frame must still demux byte-exact."""
        from diffdataflowmlpipelines_ray.stages.avi import (demux_avi,
                                                            encode_avi_mjpeg)
        from diffdataflowmlpipelines_ray.stages.jpeg import encode_jpeg

        for seed in range(8):
            frames = self._frames(4, h=8, w=8, seed=seed)
            payloads = [encode_jpeg(f) for f in frames]
            if not any(len(p) & 1 for p in payloads):
                continue
            _, out = demux_avi(encode_avi_mjpeg(frames))
            assert out == payloads
            break
        else:  # pragma: no cover - seeds above always produce one odd
            pytest.fail("no odd-length JPEG payload among seeds")

    def test_uniform_and_stride_sampling(self):
        from diffdataflowmlpipelines_ray.stages.avi import encode_avi_mjpeg

        avi = encode_avi_mjpeg(self._frames(9, h=8, w=8), fps=10.0)
        t = pa.table({"media_id": ["v"], "payload": [avi]})
        uni = SampleFrames(n_frames=3)(t)
        assert uni["frame_no"].to_pylist() == [0, 4, 8]
        assert uni["ts_ms"].to_pylist() == [0, 400, 800]
        stride = SampleFrames(mode="stride", stride=4)(t)
        assert stride["frame_no"].to_pylist() == [0, 4, 8]
        few = SampleFrames(n_frames=100)(t)  # clamp to available
        assert few["frame_no"].to_pylist() == list(range(9))

    def test_dataset_path_mixed_corpus(self, ray_session):
        """AVI rows demux + decode for real; a non-AVI video expands to
        metadata-only rows with a nulled payload — one schema, no crash."""
        from diffdataflowmlpipelines_ray.stages.avi import encode_avi_mjpeg
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            MEDIA_BATCH_SIZE,
        )

        avi = encode_avi_mjpeg(self._frames(5, h=8, w=8), fps=5.0)
        ds = docs_ds({"media_id": ["a", "b"],
                      "payload": [avi, b"\x1aE\xdf\xa3webm-no-pure-path"],
                      "media_type": ["video/avi", "video/webm"]})
        sampled = ds.map_batches(
            SampleFrames, fn_constructor_kwargs={"n_frames": 2},
            batch_size=MEDIA_BATCH_SIZE, batch_format="pyarrow",
            concurrency=1)
        rows = sorted(sampled.take_all(),
                      key=lambda r: (r["media_id"], r["frame_no"]))
        assert [(r["media_id"], r["frame_no"]) for r in rows] == \
            [("a", 0), ("a", 4), ("b", 0), ("b", 1)]
        a_rows = [r for r in rows if r["media_id"] == "a"]
        assert all(r["payload"].startswith(b"\xff\xd8") for r in a_rows)
        assert all(r["payload"] is None
                   for r in rows if r["media_id"] == "b")
        # sampled JPEG frames decode through the real image stage
        real = pa.table({
            "media_id": [r["media_id"] for r in a_rows],
            "payload": [r["payload"] for r in a_rows]})
        out = DecodeImage(dim=8, fake=False)(real)
        assert out["features"].to_pylist()[0] is not None

    def test_resize_video(self, ray_session):
        """ResizeImage resizes MJPEG/AVI frame-by-frame and re-muxes at the
        source fps."""
        from diffdataflowmlpipelines_ray.stages.avi import (demux_avi,
                                                            encode_avi_mjpeg)
        from diffdataflowmlpipelines_ray.stages.jpeg import decode_jpeg
        from diffdataflowmlpipelines_ray.stages.multimodal import ResizeImage

        avi = encode_avi_mjpeg(self._frames(3, h=16, w=16), fps=25.0)
        out = ResizeImage(8, 8)(pa.table(
            {"media_id": ["v"], "payload": [avi]}))
        info, frames = demux_avi(out["payload"].to_pylist()[0])
        assert (info.width, info.height, info.n_frames) == (8, 8, 3)
        assert abs(info.fps - 25.0) < 1e-9
        assert all(decode_jpeg(f).shape == (8, 8, 3) for f in frames)
        assert out["width"].to_pylist() == [8]

    def test_errors(self):
        from diffdataflowmlpipelines_ray.stages.avi import (demux_avi,
                                                            encode_avi_mjpeg)

        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            demux_avi(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(ValueError, match="at least one frame"):
            encode_avi_mjpeg([], fps=10)
        with pytest.raises(ValueError, match="share one"):
            encode_avi_mjpeg(self._frames(1, 8, 8)
                             + self._frames(1, 16, 16), fps=10)
        avi = bytearray(encode_avi_mjpeg(self._frames(2, h=8, w=8)))
        i = avi.find(b"MJPG", avi.find(b"strh"))  # strh handler fourcc
        avi[i:i + 4] = b"H264"
        with pytest.raises(NotImplementedError, match="PyAV/ffmpeg"):
            demux_avi(bytes(avi))
        with pytest.raises(ValueError, match="truncated"):
            demux_avi(bytes(encode_avi_mjpeg(self._frames(2, h=8, w=8)))[:60])


class TestImaAdpcm:
    """IMA ADPCM (WAV format 0x11): the real compressed-audio decode path.
    The block-vectorized decoder is pinned against an independent scalar
    spec implementation; the encoder is the fixture generator (same
    strategy as encode_png/encode_jpeg)."""

    _STEPS = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767]
    _ITAB = [-1, -1, -1, -1, 2, 4, 6, 8] * 2

    def _scalar_decode(self, data: bytes, ba: int):
        out = []
        for b in range(len(data) // ba):
            blk = data[b * ba:(b + 1) * ba]
            pred = int.from_bytes(blk[0:2], "little", signed=True)
            idx = min(88, blk[2])
            out.append(pred)
            for byte in blk[4:]:
                for nib in (byte & 0xF, byte >> 4):
                    step = self._STEPS[idx]
                    d = step >> 3
                    if nib & 1:
                        d += step >> 2
                    if nib & 2:
                        d += step >> 1
                    if nib & 4:
                        d += step
                    pred = pred - d if nib & 8 else pred + d
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + self._ITAB[nib]))
                    out.append(pred)
        return np.array(out, dtype=np.int16)

    def _data_chunk(self, wav: bytes) -> bytes:
        pos = 12
        while pos + 8 <= len(wav):
            cid = wav[pos:pos + 4]
            size = int.from_bytes(wav[pos + 4:pos + 8], "little")
            if cid == b"data":
                return wav[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
        raise AssertionError("no data chunk")

    def test_vectorized_equals_scalar_reference(self):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            _decode_ima_adpcm, encode_wav_ima_adpcm)

        rng = np.random.default_rng(5)
        # rough noisy speech-like signal exercises every nibble value
        x = np.clip(np.cumsum(rng.normal(0, 0.02, 3000)), -1, 1)
        data = self._data_chunk(encode_wav_ima_adpcm(x, 8000))
        assert np.array_equal(_decode_ima_adpcm(data, 256),
                              self._scalar_decode(data, 256))

    def test_roundtrip_quality_and_fact_trim(self):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_wav, encode_wav_ima_adpcm)

        rate = 8000
        t = np.arange(4001) / rate  # NOT a block multiple → fact trims pad
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        y, r = decode_wav(encode_wav_ima_adpcm(x, rate))
        assert r == rate and y.size == x.size
        rel = np.sqrt(((y - x) ** 2).mean()) / np.sqrt((x ** 2).mean())
        assert rel < 0.05  # ~30 dB SNR from the 4-bit codec

    def test_stage_decodes_adpcm_features(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            DecodeAudio, encode_wav_ima_adpcm)

        rate = 8000
        t = np.arange(1600) / rate
        wav = encode_wav_ima_adpcm(0.4 * np.sin(2 * np.pi * 500 * t), rate)
        out = DecodeAudio(fake=False)(pa.table({"payload": [wav]}))
        assert out["sample_rate"].to_pylist() == [rate]
        assert out["duration_ms"].to_pylist() == [200]
        assert abs(out["dom_freq"].to_pylist()[0] - 500.0) < 6.0
        assert abs(out["rms"].to_pylist()[0] - 0.4 / np.sqrt(2)) < 0.01

    def test_stereo_adpcm_raises(self):
        from diffdataflowmlpipelines_ray.stages.multimodal import (
            decode_wav, encode_wav_ima_adpcm)

        wav = bytearray(encode_wav_ima_adpcm(np.zeros(100), 8000))
        i = wav.find(b"fmt ") + 8
        wav[i + 2:i + 4] = (2).to_bytes(2, "little")  # nChannels = 2
        with pytest.raises(ValueError, match="mono"):
            decode_wav(bytes(wav))


class TestVideoMp4:
    """Photo-JPEG MP4 (stages/mp4.py): the ISO-BMFF container path."""

    def _frames(self, n, h=16, w=24, seed=9):
        rng = np.random.default_rng(seed)
        return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(n)]

    def test_mux_demux_roundtrip(self):
        from diffdataflowmlpipelines_ray.stages.jpeg import encode_jpeg
        from diffdataflowmlpipelines_ray.stages.mp4 import (demux_mp4,
                                                            encode_mp4_mjpeg)

        frames = self._frames(6)
        info, out = demux_mp4(encode_mp4_mjpeg(frames, fps=30.0))
        assert (info.width, info.height, info.n_frames) == (24, 16, 6)
        assert abs(info.fps - 30.0) < 0.02 and info.codec == "jpeg"
        assert out == [encode_jpeg(f) for f in frames]

    def test_sample_and_resize_stages(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.jpeg import decode_jpeg
        from diffdataflowmlpipelines_ray.stages.mp4 import (demux_mp4,
                                                            encode_mp4_mjpeg)
        from diffdataflowmlpipelines_ray.stages.multimodal import ResizeImage

        mp4 = encode_mp4_mjpeg(self._frames(9, h=8, w=8), fps=20.0)
        t = pa.table({"media_id": ["v"], "payload": [mp4]})
        out = SampleFrames(n_frames=3)(t)
        assert out["frame_no"].to_pylist() == [0, 4, 8]
        assert out["ts_ms"].to_pylist() == [0, 200, 400]
        assert all(p.startswith(b"\xff\xd8")
                   for p in out["payload"].to_pylist())
        rz = ResizeImage(4, 4)(t)
        info, frames = demux_mp4(rz["payload"].to_pylist()[0])
        assert (info.width, info.height, info.n_frames) == (4, 4, 9)
        assert all(decode_jpeg(f).shape == (4, 4, 3) for f in frames)

    def test_codec_and_container_gates(self):
        from diffdataflowmlpipelines_ray.stages.mp4 import (demux_mp4,
                                                            encode_mp4_mjpeg)

        mp4 = encode_mp4_mjpeg(self._frames(2, h=8, w=8))
        with pytest.raises(NotImplementedError, match="PyAV/ffmpeg"):
            demux_mp4(mp4.replace(b"jpeg", b"avc1", 1))
        with pytest.raises(ValueError, match="not an ISO-BMFF"):
            demux_mp4(b"\x1aE\xdf\xa3webm-like")
        with pytest.raises(ValueError, match="truncated"):
            demux_mp4(mp4[:-20])


class TestFlac:
    """FLAC (stages/flac.py): the lossless codec — round trips must be
    BIT-EXACT vs the quantized int16 signal, a stronger gate than the
    lossy codecs' SNR bounds."""

    def _sig(self, n=9001, seed=0):
        rate = 8000
        t = np.arange(n) / rate
        x = 0.4 * np.sin(2 * np.pi * 440 * t) \
            + 0.05 * np.random.default_rng(seed).normal(size=n)
        return np.clip(x, -1, 1), rate

    @staticmethod
    def _q(x):
        return np.clip(np.rint(np.asarray(x) * 32767), -32768, 32767)

    def test_fixed_predictors_lossless_mono_stereo(self):
        from diffdataflowmlpipelines_ray.stages.flac import (decode_flac,
                                                             encode_flac)

        x, rate = self._sig()  # multi-frame (block 4096), odd tail
        y, r = decode_flac(encode_flac(x, rate))
        assert r == rate and y.size == x.size
        assert np.array_equal(np.rint(y * 32768), self._q(x))
        st = np.stack([x, np.roll(x, 100)], axis=1)
        y2, _ = decode_flac(encode_flac(st, rate))
        assert y2.shape == st.shape
        assert np.array_equal(np.rint(y2 * 32768), self._q(st))

    def test_lpc_subframes_lossless_every_order_band(self):
        """Quantized-LPC subframes: coefficient quality only affects size,
        the integer recursion must invert bit-exactly at any order."""
        from diffdataflowmlpipelines_ray.stages.flac import (decode_flac,
                                                             encode_flac)

        x, rate = self._sig(n=5000, seed=3)
        sizes = []
        for order in (1, 2, 4, 8, 12, 32):
            flac = encode_flac(x, rate, lpc_order=order)
            y, _ = decode_flac(flac)
            assert np.array_equal(np.rint(y * 32768), self._q(x)), order
            sizes.append(len(flac))
        # higher order predicts the sine better → smaller streams
        assert sizes[-2] < sizes[0]

    def test_constant_ramp_and_tiny_blocks(self):
        from diffdataflowmlpipelines_ray.stages.flac import (decode_flac,
                                                             encode_flac)

        for sig in (np.zeros(5000), np.full(300, 0.5),
                    np.linspace(-1, 1, 777)):
            y, _ = decode_flac(encode_flac(sig, 8000, block_size=256))
            assert np.array_equal(np.rint(y * 32768), self._q(sig))

    def test_stage_decodes_flac_features(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.flac import encode_flac
        from diffdataflowmlpipelines_ray.stages.multimodal import DecodeAudio

        rate = 8000
        t = np.arange(1600) / rate
        flac = encode_flac(0.4 * np.sin(2 * np.pi * 500 * t), rate)
        out = DecodeAudio(fake=False)(pa.table({"payload": [flac]}))
        assert out["sample_rate"].to_pylist() == [rate]
        assert out["duration_ms"].to_pylist() == [200]
        assert abs(out["dom_freq"].to_pylist()[0] - 500.0) < 6.0
        # lossless → rms is EXACTLY the quantized sine's rms
        x = np.rint(0.4 * np.sin(2 * np.pi * 500 * t) * 32767) / 32768.0
        assert abs(out["rms"].to_pylist()[0]
                   - float(np.sqrt((x * x).mean()))) < 1e-12

    def test_errors(self):
        from diffdataflowmlpipelines_ray.stages.flac import (decode_flac,
                                                             encode_flac)

        with pytest.raises(ValueError, match="not a FLAC"):
            decode_flac(b"RIFFxxxxWAVE")
        with pytest.raises(ValueError, match="at least one sample"):
            encode_flac(np.zeros(0), 8000)
        with pytest.raises(ValueError, match="mono/stereo"):
            encode_flac(np.zeros((10, 3)), 8000)

    def _handcraft(self, subframe_bits, n_samples, bps=16):
        """Minimal 1-frame mono FLAC around handcrafted subframe bits —
        exercises decoder paths the encoder never emits."""
        import struct

        from diffdataflowmlpipelines_ray.stages import flac as F

        w = F._BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 2)
        w.write(0b0110, 4)      # 8-bit blocksize-1 follows
        w.write(0b0000, 4)      # rate from STREAMINFO
        w.write(0, 4)           # mono
        w.write(0b100, 3)       # 16 bit
        w.write(0, 1)
        w.write(0, 8)           # frame number 0 (UTF-8)
        w.write(n_samples - 1, 8)
        header = w.getvalue()
        header += bytes([F._crc8(header)])
        body = F._BitWriter()
        subframe_bits(body)
        body.align()
        frame = header + body.getvalue()
        frame += struct.pack(">H", F._crc16(frame))
        si_bits = (8000 << 44) | (0 << 41) | ((bps - 1) << 36) | n_samples
        streaminfo = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
                      + si_bits.to_bytes(8, "big") + bytes(16))
        meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        return b"fLaC" + meta + frame

    def test_wasted_bits_decode(self):
        """CONSTANT subframe with 2 wasted bits: value 5 at eff=14 bits
        must decode as 5<<2 = 20 for every sample."""
        from diffdataflowmlpipelines_ray.stages.flac import decode_flac

        def sub(w):
            w.write(0, 1)
            w.write(0, 6)        # CONSTANT
            w.write(1, 1)        # wasted flag
            w.write(0b01, 2)     # unary 1 → wasted = 2
            w.write_signed(5, 14)

        y, rate = decode_flac(self._handcraft(sub, 4))
        assert rate == 8000
        assert np.array_equal(np.rint(y * 32768), np.full(4, 20))

    def test_escape_residual_decode(self):
        """FIXED order 0 with the Rice ESCAPE partition (raw 6-bit
        residuals) must decode verbatim."""
        from diffdataflowmlpipelines_ray.stages.flac import decode_flac

        vals = [-3, 5, 0, -32]

        def sub(w):
            w.write(0, 1)
            w.write(8, 6)        # FIXED order 0
            w.write(0, 1)
            w.write(0, 2)        # method 0 (4-bit params)
            w.write(0, 4)        # partition order 0
            w.write(0b1111, 4)   # ESCAPE
            w.write(6, 5)        # raw bit length
            for v in vals:
                w.write_signed(v, 6)

        y, _ = decode_flac(self._handcraft(sub, 4))
        assert np.array_equal(np.rint(y * 32768), np.array(vals))


class TestBm25:
    K1, B = 1.2, 0.75

    def _brute(self, texts, ids, queries, k):
        """Independent scalar BM25 reference (same Lucene idf variant)."""
        import math

        toks = [t.split() for t in texts]
        n = len(texts)
        avgdl = sum(len(t) for t in toks) / n
        out = []
        for qid, terms in sorted(queries.items()):
            scored = []
            for did, tk in zip(ids, toks):
                s = 0.0
                hit = False
                for term in set(terms):
                    tf = tk.count(term)
                    if tf == 0:
                        continue
                    hit = True
                    df = sum(1 for t2 in toks if term in t2)
                    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                    s += idf * tf * (self.K1 + 1) / (
                        tf + self.K1 * (1 - self.B + self.B * len(tk) / avgdl))
                if hit:
                    scored.append((round(s, 6), did))
            scored.sort(key=lambda p: (-p[0], p[1]))
            for r, (s, did) in enumerate(scored[:k], 1):
                out.append((qid, did, s, r))
        return out

    def _run(self, texts, ids, queries, k, parts):
        from diffdataflowmlpipelines_ray.stages.retrieval import bm25_topk

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts)})).repartition(parts)
        got = bm25_topk(ds, queries, k=k)
        return [(int(r.query_id), int(r.doc_id), float(r.score), int(r.rank))
                for r in got.itertuples()]

    def test_matches_reference_any_partitioning(self, ray_session):
        texts = ["hash join hash", "join filter scan", "", "sort merge",
                 "hash hash hash join", "filter filter", "scan",
                 "merge sort order hash", "the quick brown fox"]
        ids = [3, 1, 4, 1 + 10, 5, 9, 2, 6, 8]
        queries = {0: ["hash", "join"], 1: ["filter", "scan"],
                   2: ["sort", "merge", "order"]}
        want = self._brute(texts, ids, queries, 4)
        assert self._run(texts, ids, queries, 4, 1) == want
        assert self._run(texts, ids, queries, 4, 5) == want

    def test_no_matching_docs_empty(self, ray_session):
        got = self._run(["aa bb", "cc"], [1, 2], {7: ["zz"]}, 3, 2)
        assert got == []

    def test_tie_break_by_doc_id(self, ray_session):
        # identical docs → identical scores; winners must be ascending ids
        got = self._run(["x y", "x y", "x y"], [30, 10, 20],
                        {0: ["x"]}, 2, 3)
        assert [(d, r) for _, d, _, r in got] == [(10, 1), (20, 2)]

    def test_duplicate_query_terms_count_once(self, ray_session):
        a = self._run(["x x y", "y"], [1, 2], {0: ["x", "x", "y"]}, 2, 1)
        b = self._run(["x x y", "y"], [1, 2], {0: ["x", "y"]}, 2, 1)
        assert a == b


class TestDsir:
    def _brute(self, texts, langs, ids, m=64):
        """Independent scalar DSIR reference."""
        import math

        from diffdataflowmlpipelines_ray.functions.hashing import stable_hash60

        feats = []
        for t in texts:
            tk = t.split()
            fs = list(tk) + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
            feats.append([stable_hash60(f) % m for f in fs])
        raw = [0] * m
        tgt = [0] * m
        for fs, lg in zip(feats, langs):
            for b in fs:
                raw[b] += 1
                if lg == "en":
                    tgt[b] += 1
        T, R = sum(tgt), sum(raw)
        ratio = [round(abs(x)) * (1 if x >= 0 else -1) if abs(
            x - int(x)) != 0.5 else int(math.copysign(math.ceil(abs(x)), x))
            for x in ((math.log((tc + 1) / (T + m))
                       - math.log((rc + 1) / (R + m))) * 1e6
                      for tc, rc in zip(tgt, raw))]
        out = []
        for did, fs in zip(ids, feats):
            if fs:
                out.append((did, len(fs), sum(ratio[b] for b in fs)))
        return sorted(out)

    def _run(self, texts, langs, ids, parts, m=64):
        from diffdataflowmlpipelines_ray.stages.dsir import dsir_weights

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs)})).repartition(parts)
        got = dsir_weights(ds, "lang", "en", m=m)
        return [(int(r.doc_id), int(r.n_feats), int(r.weight_micro))
                for r in got.itertuples()]

    def test_matches_reference_any_partitioning(self, ray_session):
        texts = ["alpha beta alpha", "omega psi", "", "alpha omega beta",
                 "beta beta beta gamma", "psi psi omega alpha"]
        langs = ["en", "de", "en", "en", "de", "fr"]
        ids = [4, 1, 9, 2, 7, 5]
        want = self._brute(texts, langs, ids)
        assert self._run(texts, langs, ids, 1) == want
        assert self._run(texts, langs, ids, 5) == want

    def test_target_like_doc_scores_higher(self, ray_session):
        # target docs say alpha, non-target say omega; a fresh alpha doc
        # must outweigh a fresh omega doc
        texts = (["alpha alpha"] * 5 + ["omega omega"] * 5
                 + ["alpha", "omega"])
        langs = ["en"] * 5 + ["de"] * 5 + ["de", "en"]
        ids = list(range(12))
        got = dict((d, w) for d, _, w in self._run(texts, langs, ids, 3))
        assert got[10] > got[11]  # "alpha" doc > "omega" doc

    def test_empty_docs_absent(self, ray_session):
        got = self._run(["", "x y"], ["en", "en"], [1, 2], 2)
        assert [d for d, _, _ in got] == [2]


class TestHistTree:
    def _brute(self, X, y, depth, bins):
        """Independent single-machine reference (plain loops)."""
        import math

        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        F = X.shape[1]
        lo, hi = X.min(axis=0), X.max(axis=0)
        w = (hi - lo) / bins
        binm = np.zeros(X.shape, dtype=np.int64)
        for j in range(F):
            if w[j] != 0:
                binm[:, j] = np.clip(
                    np.floor((X[:, j] - lo[j]) / w[j]), 0, bins - 1)
        splits, pop = {}, {}
        node = np.zeros(len(y), dtype=np.int64)
        pop[0] = (len(y), int(y.sum()))
        for level in range(depth):
            live = [0] if level == 0 else [
                c for nid in splits
                if int(math.log2(nid + 1)) == level - 1
                for c in (2 * nid + 1, 2 * nid + 2)]
            for nid in sorted(live):
                on = node == nid
                n_tot, s_tot = int(on.sum()), int(y[on].sum())
                if n_tot < 2:
                    continue
                best, arg = -math.inf, None
                for f in range(F):
                    for b in range(bins):
                        left = on & (binm[:, f] <= b)
                        nl, sl = int(left.sum()), int(y[left].sum())
                        nr, sr = n_tot - nl, s_tot - sl
                        if nl == 0 or nr == 0:
                            continue
                        sc = (float(sl) * sl) / nl + (float(sr) * sr) / nr
                        if sc > best:
                            best, arg = sc, (f, b)
                if arg is None:
                    continue
                f, b = arg
                splits[nid] = arg
                left = on & (binm[:, f] <= b)
                pop[2 * nid + 1] = (int(left.sum()), int(y[left].sum()))
                pop[2 * nid + 2] = (n_tot - pop[2 * nid + 1][0],
                                    s_tot - pop[2 * nid + 1][1])
                node[left] = 2 * nid + 1
                node[on & ~left] = 2 * nid + 2
        rows = []
        for nid in sorted(pop):
            n, s = pop[nid]
            if nid in splits:
                rows.append((nid, "split", *splits[nid], n, s, s / n))
            else:
                rows.append((nid, "leaf", -1, -1, n, s,
                             s / n if n else float("nan")))
        return rows

    def _run(self, X, y, depth, bins, parts):
        from diffdataflowmlpipelines_ray.stages.tree import hist_tree

        X = np.asarray(X, dtype=np.float64)
        cols = {f"f{j}": pa.array(X[:, j]) for j in range(X.shape[1])}
        cols["y"] = pa.array(np.asarray(y, dtype=np.int64))
        ds = rd.from_arrow(pa.table(cols)).repartition(parts)
        out = hist_tree(ds, [f"f{j}" for j in range(X.shape[1])], "y",
                        depth=depth, bins=bins)
        return [(int(r.node), r.kind, int(r.feature_idx), int(r.bin),
                 int(r.n), int(r.label_sum), float(r.pred))
                for r in out.itertuples()]

    def test_matches_reference_any_partitioning(self, ray_session):
        rng = np.random.default_rng(7)
        X = rng.uniform(0, 10, size=(300, 3))
        y = (X[:, 0] > 5).astype(np.int64) * 3 + (X[:, 2] > 2) * 2
        want = self._brute(X, y, 2, 8)
        assert self._run(X, y, 2, 8, 1) == want
        assert self._run(X, y, 2, 8, 7) == want

    def test_depth3_matches_reference(self, ray_session):
        rng = np.random.default_rng(11)
        X = rng.uniform(-5, 5, size=(400, 2))
        y = rng.integers(0, 20, size=400)
        assert self._run(X, y, 3, 4, 5) == self._brute(X, y, 3, 4)

    def test_pure_split_recovers_step(self, ray_session):
        # y jumps at x=0: the root split must land at the boundary bin
        X = np.linspace(-8, 8, 64).reshape(-1, 1)
        y = (X[:, 0] >= 0).astype(np.int64) * 10
        got = self._run(X, y, 1, 8, 2)
        root = got[0]
        assert root[1] == "split" and root[2] == 0 and root[3] == 3
        leaves = {g[0]: g for g in got[1:]}
        assert leaves[1][5] == 0 and leaves[2][5] == 320  # pure leaves

    def test_constant_features_leaf(self, ray_session):
        got = self._run(np.ones((10, 2)), np.arange(10), 2, 8, 2)
        assert got == [(0, "leaf", -1, -1, 10, 45, 4.5)]


class TestHistBoost:
    def _ds(self, X, y, parts):
        X = np.asarray(X, dtype=np.float64)
        cols = {f"f{j}": pa.array(X[:, j]) for j in range(X.shape[1])}
        cols["y"] = pa.array(np.asarray(y, dtype=np.int64))
        return rd.from_arrow(pa.table(cols)).repartition(parts)

    def _brute(self, X, y, rounds, depth, bins, scale=1_000_000):
        """Independent reference: reuse TestHistTree's looped fitter on
        explicit integer residuals with Python floor-div leaf values."""
        import math

        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        lo, hi = X.min(axis=0), X.max(axis=0)
        w = (hi - lo) / bins
        binm = np.zeros(X.shape, dtype=np.int64)
        for j in range(X.shape[1]):
            if w[j] != 0:
                binm[:, j] = np.clip(
                    np.floor((X[:, j] - lo[j]) / w[j]), 0, bins - 1)
        r = y * scale
        hist = []
        for t in range(rounds):
            node = np.zeros(len(y), dtype=np.int64)
            for level in range(depth):
                for nid in sorted(set(node)):
                    on = node == nid
                    n_tot, s_tot = int(on.sum()), int(r[on].sum())
                    if n_tot < 2:
                        continue
                    best, arg = -math.inf, None
                    for f in range(X.shape[1]):
                        for b in range(bins):
                            left = on & (binm[:, f] <= b)
                            nl, sl = int(left.sum()), int(r[left].sum())
                            if nl == 0 or nl == n_tot:
                                continue
                            sr, nr = s_tot - sl, n_tot - nl
                            sc = (float(sl) * sl) / nl \
                                + (float(sr) * sr) / nr
                            if sc > best:
                                best, arg = sc, (f, b)
                    if arg is None:
                        continue
                    f, b = arg
                    left = on & (binm[:, f] <= b)
                    node[left] = 2 * nid + 1
                    node[on & ~left] = 2 * nid + 2
            upd = np.zeros(len(y), dtype=np.int64)
            for nid in sorted(set(node)):
                on = node == nid
                upd[on] = int(r[on].sum()) // (2 * int(on.sum()))
            r = r - upd
            hist.append((t, len(y), int(np.abs(r).sum())))
        return hist

    def test_matches_reference_any_partitioning(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.tree import hist_boost

        rng = np.random.default_rng(3)
        X = rng.uniform(0, 4, size=(200, 2))
        y = (X[:, 0] * 2 + X[:, 1]).astype(np.int64)
        want = self._brute(X, y, 3, 2, 4)
        for parts in (1, 6):
            _, hist = hist_boost(self._ds(X, y, parts), ["f0", "f1"],
                                 "y", rounds=3, depth=2, bins=4)
            got = [(int(r.round), int(r.n), int(r.sae_micro))
                   for r in hist.itertuples()]
            assert got == want

    def test_error_decreases(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.tree import hist_boost

        rng = np.random.default_rng(5)
        X = rng.uniform(0, 8, size=(300, 2))
        y = (X[:, 0] > 4).astype(np.int64) * 7 + (X[:, 1] > 2) * 2
        _, hist = hist_boost(self._ds(X, y, 4), ["f0", "f1"], "y",
                             rounds=4, depth=2, bins=8)
        sae = hist["sae_micro"].tolist()
        assert sae == sorted(sae, reverse=True) and sae[-1] < sae[0]

    def test_learnable_signal_fits_exactly(self, ray_session):
        # a bin-aligned step target is exactly representable by one tree;
        # with lr=1/2 the residual halves (floor) each round
        from diffdataflowmlpipelines_ray.stages.tree import hist_boost

        X = np.repeat([1.0, 9.0], 32).reshape(-1, 1)
        y = np.repeat([0, 8], 32)
        _, hist = hist_boost(self._ds(X, y, 2), ["f0"], "y",
                             rounds=3, depth=1, bins=2)
        # residual on the high half: 8e6 -> 4e6 -> 2e6 -> 1e6
        assert hist["sae_micro"].tolist() == [4_000_000 * 32,
                                              2_000_000 * 32,
                                              1_000_000 * 32]


class TestVocabGrowth:
    def test_matches_brute_force(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_stats import (
            vocab_growth,
        )

        texts = ["a b c", "a b", "d e f g", "", "a h", "i j k l m",
                 "a a a", "n", "b d", "o p"]
        ids = list(range(10))
        for parts in (1, 4):
            ds = rd.from_arrow(pa.table({
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts)})).repartition(parts)
            out = vocab_growth(ds, n_checkpoints=5)
            got = [(int(r.checkpoint), int(r.n_tokens), int(r.vocab))
                   for r in out.itertuples()]
            want = []
            for i in range(5):
                k = (i + 1) * 2 - 1
                pre = [t for d, t in zip(ids, texts) if d <= k]
                toks = [w for t in pre for w in t.split()]
                want.append((k, len(toks), len(set(toks))))
            assert got == want

    def test_monotone(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.text_stats import (
            vocab_growth,
        )

        rng = np.random.default_rng(2)
        texts = [" ".join(f"w{rng.integers(0, 50)}" for _ in range(20))
                 for _ in range(40)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": pa.array(texts)})).repartition(3)
        out = vocab_growth(ds, n_checkpoints=4)
        assert out["vocab"].is_monotonic_increasing
        assert out["n_tokens"].is_monotonic_increasing


class TestAls:
    def _ratings(self, n_u=12, n_i=8, parts=3):
        # exactly rank-1: r(u, i) = a_u * b_i
        a = np.linspace(0.5, 2.0, n_u)
        b = np.linspace(1.0, 3.0, n_i)
        u, i = np.meshgrid(np.arange(n_u), np.arange(n_i), indexing="ij")
        return rd.from_arrow(pa.table({
            "user": pa.array(u.ravel().astype(np.int64)),
            "item": pa.array(i.ravel().astype(np.int64)),
            "rating": pa.array((a[u] * b[i]).ravel()),
        })).repartition(parts)

    def test_partition_invariant(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import als_factorize

        u1, v1, r1 = als_factorize(self._ratings(parts=1), k=4, rounds=2)
        u4, v4, r4 = als_factorize(self._ratings(parts=4), k=4, rounds=2)
        pd.testing.assert_frame_equal(u1, u4)
        pd.testing.assert_frame_equal(v1, v4)
        assert r1 == r4

    def test_rank1_recovery(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import als_factorize

        _, _, rmse = als_factorize(self._ratings(), k=4, rounds=4,
                                   lam=1e-6)
        assert rmse < 1e-3  # exactly-rank-1 data fits to noise level

    def test_factor_shapes_and_ids(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.linalg import als_factorize

        U, V, _ = als_factorize(self._ratings(), k=3, rounds=1)
        assert U["user"].tolist() == list(range(12))
        assert V["item"].tolist() == list(range(8))
        assert list(U.columns) == ["user", "f0", "f1", "f2"]
        assert list(V.columns) == ["item", "f0", "f1", "f2"]

    def test_tiers_bit_equal(self, ray_session):
        # broadcast tier (default) vs join-exchange tier (broadcast_max=0)
        from diffdataflowmlpipelines_ray.stages.linalg import als_factorize

        ub, vb, rb = als_factorize(self._ratings(parts=3), k=3, rounds=2)
        ue, ve, re_ = als_factorize(self._ratings(parts=3), k=3, rounds=2,
                                    broadcast_max=0)
        pd.testing.assert_frame_equal(ub, ue)
        pd.testing.assert_frame_equal(vb, ve)
        assert abs(rb - re_) < 1e-12


class TestProfile:
    def test_matches_pandas_reference(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.profile import (
            profile_columns,
        )

        tbl = pa.table({
            "a": pa.array([1, 2, 2, None, 5], type=pa.int64()),
            "s": pa.array(["x", None, "x", "y", "z"]),
            "f": pa.array([1.5, np.nan, 2.5, 2.5, -1.0]),
        })
        for parts in (1, 3):
            ds = rd.from_arrow(tbl).repartition(parts)
            out = profile_columns(ds, ["a", "s", "f"],
                                  numeric_cols=["a", "f"])
            got = {r.column: (int(r.n), int(r.n_null), int(r.n_distinct),
                              r.min_num, r.max_num)
                   for r in out.itertuples()}
            assert got["a"][:3] == (5, 1, 3)
            assert got["a"][3:] == (1.0, 5.0)
            assert got["s"][:3] == (5, 1, 3)
            assert np.isnan(got["s"][3]) and np.isnan(got["s"][4])
            # NaN floats: arrow null_count treats NaN as a VALUE — n_null
            # stays 0 but min/max must skip it
            assert got["f"][0] == 5 and got["f"][1] == 0
            assert got["f"][3] == -1.0 and got["f"][4] == 2.5

    def test_psi_drift_detection(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.profile import psi

        rng = np.random.default_rng(6)
        ref = rd.from_arrow(pa.table({
            "v": pa.array(rng.normal(0, 1, 3000))})).repartition(3)
        same = rd.from_arrow(pa.table({
            "v": pa.array(rng.normal(0, 1, 3000))})).repartition(2)
        shifted = rd.from_arrow(pa.table({
            "v": pa.array(rng.normal(2.0, 1, 3000))})).repartition(2)
        lo = psi(ref, same, "v")
        hi = psi(ref, shifted, "v")
        # identical-distribution PSI ≈ 0 (< 0.1 rule of thumb); a 2σ
        # shift is a major-drift signal (> 0.25)
        assert lo["psi_micro"].iloc[0] < 100_000
        assert hi["psi_micro"].iloc[0] > 250_000
        assert (lo["n_ref"].sum() == 3000 and lo["n_new"].sum() == 3000)

    def test_psi_identical_counts_zero(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.profile import psi

        t = pa.table({"v": pa.array(np.linspace(0, 9, 100))})
        ds1 = rd.from_arrow(t).repartition(2)
        ds2 = rd.from_arrow(t).repartition(5)
        out = psi(ds1, ds2, "v", bins=5)
        assert (out["term_micro"] == 0).all()
        assert out["psi_micro"].iloc[0] == 0


class TestValidate:
    def test_all_rule_kinds(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.validate import validate

        tbl = pa.table({
            "k": pa.array([1, 2, 2, 3, None], type=pa.int64()),
            "v": pa.array([5.0, -1.0, 10.0, 99.0, 50.0]),
            "s": pa.array(["ok", "ok", "BAD", None, "fine"]),
        })
        for parts in (1, 3):
            ds = rd.from_arrow(tbl).repartition(parts)
            out = validate(ds, [
                ("not_null", "k"),
                ("unique", "k"),
                ("in_range", "v", 0.0, 50.0),
                ("accepted_values", "s", ["ok", "fine"]),
                ("matches", "s", "[a-z]+"),
            ]).set_index("rule_id")
            assert out.loc[0, "violations"] == 1          # one null k
            assert out.loc[1, "violations"] == 1          # dup k=2
            assert out.loc[2, "violations"] == 2          # -1, 99
            assert out.loc[3, "violations"] == 1          # BAD
            assert out.loc[4, "violations"] == 1          # BAD (upper)
            assert not out["ok"].any()

    def test_clean_data_passes(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.validate import validate

        ds = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3], type=pa.int64())})).repartition(2)
        out = validate(ds, [("not_null", "k"), ("unique", "k"),
                            ("in_range", "k", 0, 10)])
        assert out["ok"].all() and (out["violations"] == 0).all()

    def test_unknown_rule_raises(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.validate import validate

        ds = rd.from_arrow(pa.table({"k": pa.array([1])}))
        with pytest.raises(Exception):
            validate(ds, [("bogus", "k")])


class TestKaplanMeier:
    def test_matches_hand_computed(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.survival import (
            kaplan_meier,
        )

        # durations 1,2,2,3,4,5; events at 1,2,2,4; censored at 3,5
        durs = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0]
        evs = [1, 1, 1, 0, 1, 0]
        import math

        def ha(x):
            return int(math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1))

        # hand KM: t=1 n=6 d=1; t=2 n=5 d=2; t=4 n=2 d=1
        want_terms = [(1_000_000, 6, 1, ha(math.log(5 / 6) * 1e6))]
        t2 = ha(math.log(3 / 5) * 1e6)
        t4 = ha(math.log(1 / 2) * 1e6)
        want = [(1_000_000, 6, 1, want_terms[0][3]),
                (2_000_000, 5, 2, want_terms[0][3] + t2),
                (4_000_000, 2, 1, want_terms[0][3] + t2 + t4)]
        for parts in (1, 3):
            ds = rd.from_arrow(pa.table({
                "dur": pa.array(durs),
                "ev": pa.array(evs, type=pa.int64())})).repartition(parts)
            out = kaplan_meier(ds, "dur", "ev")
            got = [tuple(int(x) for x in r)
                   for r in out.itertuples(index=False)]
            assert got == want

    def test_all_die_at_end_excluded(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.survival import (
            kaplan_meier,
        )

        ds = rd.from_arrow(pa.table({
            "dur": pa.array([1.0, 2.0, 2.0]),
            "ev": pa.array([1, 1, 1], type=pa.int64())}))
        out = kaplan_meier(ds, "dur", "ev")
        # t=2 kills the last survivors (n == d) → excluded
        assert out["t_micro"].tolist() == [1_000_000]


class TestGini:
    def _run(self, cents, parts):
        from diffdataflowmlpipelines_ray.stages.profile import gini_cents

        ds = rd.from_arrow(pa.table({
            "id": pa.array(range(len(cents)), type=pa.int64()),
            "cents": pa.array(cents, type=pa.int64())})).repartition(parts)
        out = gini_cents(ds, "cents", "id")
        return int(out["gini_micro"].iloc[0])

    def test_uniform_is_zero(self, ray_session):
        assert self._run([500] * 100, 3) == 0

    def test_total_concentration_near_one(self, ray_session):
        # one holder owns everything: G = (n-1)/n = 0.99
        g = self._run([0] * 99 + [10_000], 4)
        assert g == 990_000

    def test_matches_brute_force_and_partitioning(self, ray_session):
        rng = np.random.default_rng(8)
        cents = rng.integers(0, 100_000, 500).tolist()
        x = np.sort(np.array(cents, dtype=np.int64))
        n = len(x)
        srx = int((np.arange(1, n + 1) * x).sum())
        want = (2.0 * srx) / (float(n) * int(x.sum())) - (n + 1.0) / n
        import math
        want_micro = int(math.floor(abs(want * 1e6) + 0.5)
                         * (1 if want >= 0 else -1))
        assert self._run(cents, 1) == want_micro
        assert self._run(cents, 5) == want_micro


class TestIsotonic:
    def _ref(self, x, y, w=None):
        """Independent O(n log n) reference: aggregate ties, stack PAVA
        with Fraction-exact means."""
        from fractions import Fraction

        import collections
        agg = collections.defaultdict(lambda: [0, 0])
        w = w or [1] * len(x)
        for xi, yi, wi in zip(x, y, w):
            agg[xi][0] += yi * wi
            agg[xi][1] += wi
        out = []
        for xi in sorted(agg):
            cur = [xi, xi, agg[xi][0], agg[xi][1]]
            while out and Fraction(out[-1][2], out[-1][3]) > Fraction(
                    cur[2], cur[3]):
                p = out.pop()
                cur = [p[0], cur[1], p[2] + cur[2], p[3] + cur[3]]
            out.append(cur)
        return [tuple(p) for p in out]

    def _run(self, x, y, parts, w=None):
        from diffdataflowmlpipelines_ray.stages.isotonic import (
            isotonic_fit,
        )

        cols = {"x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64())}
        if w:
            cols["w"] = pa.array(w, type=pa.int64())
        ds = rd.from_arrow(pa.table(cols)).repartition(parts)
        out = isotonic_fit(ds, "x", "y", "w" if w else None)
        return [(int(r.x_lo), int(r.x_hi), int(r.sum_cents),
                 int(r.weight)) for r in out.itertuples()]

    def test_matches_reference_any_partitioning(self, ray_session):
        rng = np.random.default_rng(12)
        x = rng.integers(0, 50, 400).tolist()
        y = (np.array(x) * 3 + rng.integers(-40, 40, 400)).tolist()
        want = self._ref(x, y)
        assert self._run(x, y, 1) == want
        assert self._run(x, y, 6) == want

    def test_monotone_and_weighted(self, ray_session):
        rng = np.random.default_rng(3)
        x = rng.integers(0, 30, 200).tolist()
        y = rng.integers(0, 100, 200).tolist()
        w = rng.integers(1, 5, 200).tolist()
        got = self._run(x, y, 4, w)
        assert got == self._ref(x, y, w)
        means = [s / ww for _, _, s, ww in got]
        assert all(a <= b + 1e-12 for a, b in zip(means, means[1:]))

    def test_already_monotone_untouched(self, ray_session):
        x = list(range(20))
        y = [i * 10 for i in x]
        got = self._run(x, y, 3)
        assert len(got) == 20  # nothing pools


class TestAucExact:
    def _run(self, scores, labels, parts):
        from diffdataflowmlpipelines_ray.stages.profile import auc_exact

        ds = rd.from_arrow(pa.table({
            "score": pa.array(scores, type=pa.float64()),
            "y": pa.array(labels, type=pa.int64())})).repartition(parts)
        out = auc_exact(ds, "score", "y")
        return (int(out["u2"].iloc[0]), int(out["auc_micro"].iloc[0]))

    def test_perfect_and_inverted(self, ray_session):
        s = [float(i) for i in range(20)]
        y = [0] * 10 + [1] * 10
        assert self._run(s, y, 3)[1] == 1_000_000
        assert self._run(s, y[::-1], 3)[1] == 0

    def test_ties_half_credit(self, ray_session):
        # all scores equal: AUC must be exactly 1/2
        assert self._run([5.0] * 40, [0, 1] * 20, 4)[1] == 500_000

    def test_matches_pair_counting(self, ray_session):
        rng = np.random.default_rng(21)
        s = np.round(rng.uniform(0, 1, 300), 3)
        y = (s + rng.normal(0, 0.3, 300) > 0.5).astype(np.int64)
        pos = s[y == 1]
        neg = s[y == 0]
        u2 = int(2 * (pos[:, None] > neg[None, :]).sum()
                 + (pos[:, None] == neg[None, :]).sum())
        got1 = self._run(s.tolist(), y.tolist(), 1)
        got5 = self._run(s.tolist(), y.tolist(), 5)
        assert got1[0] == got5[0] == u2


class TestGmm1d:
    def test_recovers_planted_mixture(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.clustering import (
            gmm1d_fit,
        )

        rng = np.random.default_rng(14)
        x = np.concatenate([rng.normal(-5, 0.7, 3000),
                            rng.normal(5, 1.0, 1000)])
        ds = rd.from_arrow(pa.table({"v": pa.array(x)})).repartition(4)
        params, lls = gmm1d_fit(ds, "v", k=2, iters=8)
        p = params.sort_values("mean").reset_index(drop=True)
        assert abs(p.loc[0, "mean"] - (-5)) < 0.15
        assert abs(p.loc[1, "mean"] - 5) < 0.3
        assert abs(p.loc[0, "weight"] - 0.75) < 0.03
        # EM guarantee: monotone non-decreasing log-likelihood
        assert all(a <= b + 1e-6 for a, b in zip(lls, lls[1:]))

    def test_deterministic_per_partitioning(self, ray_session):
        from diffdataflowmlpipelines_ray.stages.clustering import (
            gmm1d_fit,
        )

        rng = np.random.default_rng(15)
        x = rng.normal(0, 2, 500)
        mk = lambda: rd.from_arrow(pa.table({"v": pa.array(x)})
                                   ).repartition(3)
        a, _ = gmm1d_fit(mk(), "v", k=3, iters=3)
        b, _ = gmm1d_fit(mk(), "v", k=3, iters=3)
        pd.testing.assert_frame_equal(a, b)

    def test_apply_consistent_with_history(self, ray_session):
        # sum |y*scale - pred| from apply == the final round's sae_micro
        from diffdataflowmlpipelines_ray.stages.tree import (
            hist_boost,
            hist_boost_apply,
        )

        rng = np.random.default_rng(19)
        X = rng.uniform(0, 6, size=(250, 2))
        y = (X[:, 0] + 2 * X[:, 1]).astype(np.int64)
        ds = rd.from_arrow(pa.table({
            "f0": pa.array(X[:, 0]), "f1": pa.array(X[:, 1]),
            "y": pa.array(y)})).repartition(3)
        model, hist = hist_boost(ds, ["f0", "f1"], "y", rounds=2,
                                 depth=2, bins=6)
        out = hist_boost_apply(ds, model, ["f0", "f1"],
                               ["y"]).to_pandas()
        sae = int(np.abs(out["y"].to_numpy(dtype=np.int64) * 1_000_000
                         - out["pred_micro"].to_numpy()).sum())
        assert sae == int(hist["sae_micro"].iloc[-1])


class TestZoneMapScan:
    def _fixture(self, tmp_path):
        import pyarrow.parquet as pq

        # 10 row groups of 100 rows, key strictly increasing -> exact
        # zone boundaries; values carry a derived payload column
        k = np.arange(1000, dtype=np.int64)
        t = pa.table({"k": pa.array(k), "v": pa.array(k * 7 % 101)})
        path = str(tmp_path / "zones.parquet")
        pq.write_table(t, path, row_group_size=100)
        return path

    def test_prune_counts_and_exactness(self, ray_session, tmp_path):
        from diffdataflowmlpipelines_ray.stages.zonemap import (
            zone_pruned_scan,
        )

        path = self._fixture(tmp_path)
        # [250, 449] touches exactly row groups 2, 3 and 4
        ds, stats = zone_pruned_scan(path, "k", 250, 449, columns=["v"])
        assert stats.row_groups_total == 10
        assert stats.row_groups_read == 3
        assert stats.rows_skipped_bound == 700
        out = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        k = np.arange(250, 450, dtype=np.int64)
        want = pd.DataFrame({"v": k * 7 % 101, "k": k})[["v", "k"]]
        pd.testing.assert_frame_equal(
            out[["v", "k"]].astype(np.int64), want)

    def test_fully_pruned_is_empty_with_schema(self, ray_session,
                                               tmp_path):
        from diffdataflowmlpipelines_ray.stages.zonemap import (
            zone_pruned_scan,
        )

        path = self._fixture(tmp_path)
        ds, stats = zone_pruned_scan(path, "k", 5000, 6000)
        assert stats.row_groups_read == 0
        assert ds.count() == 0
        assert set(ds.schema().names) == {"k", "v"}

    def test_residual_filter_inside_partial_groups(self, ray_session,
                                                   tmp_path):
        from diffdataflowmlpipelines_ray.stages.zonemap import (
            zone_pruned_scan,
        )

        path = self._fixture(tmp_path)
        # [150, 160] lives inside row group 1: zone keeps the group,
        # the residual filter must cut it to exactly 11 rows
        ds, stats = zone_pruned_scan(path, "k", 150, 160)
        assert stats.row_groups_read == 1
        assert ds.count() == 11
