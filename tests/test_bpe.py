"""BPE tokenizer: incremental trainer vs an independent from-scratch
reference, lossless round trips, partition invariance, the actor stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from diffdataflowmlpipelines_ray.stages.bpe import (
    BpeModel,
    EncodeBpe,
    _pretokenize,
    learn_bpe,
    train_bpe_from_histogram,
    word_histogram,
)


def _naive_train(hist: dict, num_merges: int) -> list:
    """Independent reference: recount EVERY pair from scratch each
    iteration (O(V·L) per merge), same deterministic tie-break."""
    from collections import Counter

    words = {i: (list(w.encode("utf-8")), n)
             for i, (w, n) in enumerate(hist.items()) if n > 0}
    merges = []
    for m in range(num_merges):
        pc_ = Counter()
        for seq, n in words.values():
            for p in zip(seq, seq[1:]):
                pc_[p] += n
        if not pc_:
            break
        (a, b), cnt = max(pc_.items(),
                          key=lambda kv: (kv[1], (-kv[0][0], -kv[0][1])))
        if cnt < 2:
            break
        new_id = 256 + len(merges)
        merges.append((a, b))
        for i, (seq, n) in list(words.items()):
            j, out = 0, []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(new_id)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            words[i] = (out, n)
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the dog ate the bone, then the dog slept",
    "low lower lowest, new newer newest",
    "aaaa aaaa aa baaab",
    "mixed  UP   spacing\tand\nnewlines here",
    "répétition répétition déjà vu",
]


class TestTrainer:
    def test_incremental_equals_naive_reference(self):
        from collections import Counter

        hist = Counter()
        for t in CORPUS:
            hist.update(_pretokenize(t))
        got = train_bpe_from_histogram(hist, 60)
        want = _naive_train(dict(hist), 60)
        assert got == want
        assert len(got) > 10  # the corpus genuinely trains

    def test_planted_dominant_pair_is_first_merge(self):
        hist = {"zq": 50, "ab": 3, "cd": 2}
        merges = train_bpe_from_histogram(hist, 1)
        assert merges == [(ord("z"), ord("q"))]

    def test_stops_when_no_pair_repeats(self):
        # every pair occurs once → nothing to merge
        assert train_bpe_from_histogram({"ab": 1, "cd": 1}, 10) == []

    def test_overlapping_occurrences_merge_left_to_right(self):
        # "aaa"×5: first merge (a,a) consumes positions 0-1, leaving
        # [new, a]; the reference encoder must agree
        merges = train_bpe_from_histogram({"aaa": 5}, 2)
        assert merges[0] == (97, 97)
        m = BpeModel(merges)
        assert m.decode(m.encode_word("aaa")) == "aaa"

    @given(st.lists(st.text(
        alphabet=st.characters(codec="utf-8"), min_size=0, max_size=40),
        min_size=1, max_size=12),
        st.integers(min_value=0, max_value=64))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_lossless_any_text(self, texts, nm):
        from collections import Counter

        hist = Counter()
        for t in texts:
            hist.update(_pretokenize(t))
        model = BpeModel(train_bpe_from_histogram(hist, nm))
        for t in texts:
            assert model.decode(model.encode(t)) == t

    def test_more_merges_never_more_tokens(self):
        from collections import Counter

        hist = Counter()
        for t in CORPUS:
            hist.update(_pretokenize(t))
        prev = None
        for nm in (0, 8, 32, 96):
            model = BpeModel(train_bpe_from_histogram(hist, nm))
            n = sum(len(model.encode(t)) for t in CORPUS)
            if prev is not None:
                assert n <= prev
            prev = n


class TestDistributed:
    def _docs(self, nblocks):
        tbl = pa.table({"text": pa.array(CORPUS * 10)})
        return rd.from_arrow(tbl).repartition(nblocks)

    def test_histogram_matches_counter(self, ray_session):
        from collections import Counter

        want = Counter()
        for t in CORPUS * 10:
            want.update(_pretokenize(t))
        rows = word_histogram(self._docs(7), "text").take_all()
        got = {r["word"]: r["sum(n)"] for r in rows}
        assert got == dict(want)

    def test_partition_invariant_merges(self, ray_session):
        m1 = learn_bpe(self._docs(1), "text", num_merges=40).merges
        m8 = learn_bpe(self._docs(8), "text", num_merges=40).merges
        assert m1 == m8

    def test_min_count_and_max_types_bound_state(self, ray_session):
        full = learn_bpe(self._docs(4), "text", num_merges=20)
        capped = learn_bpe(self._docs(4), "text", num_merges=20,
                           min_count=5, max_types=10)
        assert len(capped.merges) <= len(full.merges)
        # capped model still encodes losslessly (merges are optional)
        for t in CORPUS:
            assert capped.decode(capped.encode(t)) == t

    def test_encode_stage_matches_driver_model(self, ray_session):
        import ray

        model = learn_bpe(self._docs(4), "text", num_merges=50)
        ref = ray.put(model.merges)
        out = (self._docs(4)
               .map_batches(EncodeBpe, fn_constructor_args=(ref, "text"),
                            concurrency=2, batch_format="pyarrow")
               .to_pandas())
        for _, row in out.iterrows():
            want = model.encode(row["text"])
            assert list(row["token_ids"]) == want
            assert row["n_bpe_tokens"] == len(want)
