"""n-gram LM stages (stages/lm.py): bigram perplexity + naive Bayes.

Both ops gate against exact pure-Python references (Counter arithmetic in
integer micro-nats — the same rounding contract as the SQL twins), at more
than one partitioning so the distributed plans are proven
partition-invariant.
"""

import math
from collections import Counter

import pandas as pd
import pytest

import ray


def _half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1))


_DOCS = pd.DataFrame({
    "doc_id": range(10),
    "text": ["the cat sat on the mat", "the dog sat", "a", "",
             "cat cat cat", "the the the the", "dog ate the cat",
             "on a mat sat a cat", "zz yy zz yy zz", "single"],
    "lang": ["en", "en", "fr", "fr", "en", "fr", "en", "en", "zz", "zz"],
})


def _ref_perplexity(docs: pd.DataFrame) -> dict:
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    vocab = {t for v in toks.values() for t in v}
    bg = Counter((a, b) for v in toks.values() for a, b in zip(v, v[1:]))
    ctx = Counter()
    for (a, _), c in bg.items():
        ctx[a] += c
    out = {}
    for d, v in toks.items():
        if len(v) < 2:
            continue
        tot = sum(_half_away(math.log((bg[(a, b)] + 1)
                                      / (ctx[a] + len(vocab))) * 1e6)
                  for a, b in zip(v, v[1:]))
        out[d] = (len(v) - 1, tot)
    return out


def _ref_naive_bayes(docs: pd.DataFrame) -> dict:
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    vocab = {t for v in toks.values() for t in v}
    cls = sorted(set(docs["lang"]))
    ndocs = Counter(docs["lang"])
    ccnt = {c: Counter() for c in cls}
    for r in docs.itertuples():
        ccnt[r.lang].update(r.text.split())
    tot = {c: sum(ccnt[c].values()) for c in cls}
    prior = {c: _half_away(math.log(ndocs[c] / len(docs)) * 1e6) for c in cls}
    out = {}
    for d, v in toks.items():
        if not v:
            continue
        best, bs = None, None
        for c in cls:                    # ascending: strict > keeps smallest on tie
            s = prior[c] + sum(
                _half_away(math.log((ccnt[c][t] + 1)
                                    / (tot[c] + len(vocab))) * 1e6) for t in v)
            if bs is None or s > bs:
                bs, best = s, c
        out[d] = best
    return out


@pytest.mark.parametrize("blocks", [1, 4])
@pytest.mark.parametrize("bmax", [500_000, 0])   # broadcast vs exchange tier
def test_bigram_scores_match_reference(ray_session, blocks, bmax):
    from diffdataflowmlpipelines_ray.stages.lm import bigram_logprob_scores

    ds = ray.data.from_pandas(_DOCS).repartition(blocks)
    got = bigram_logprob_scores(ds, broadcast_max=bmax).to_pandas()
    gotd = {int(r.doc_id): (int(r.n_bigrams), int(r.nats_micro))
            for r in got.itertuples()}
    assert gotd == _ref_perplexity(_DOCS)
    # docs with < 2 tokens ("a", "", "single") emit nothing
    assert {2, 3, 9}.isdisjoint(gotd)


@pytest.mark.parametrize("blocks", [1, 4])
@pytest.mark.parametrize("bmax", [500_000, 0])   # broadcast vs exchange tier
def test_naive_bayes_matches_reference(ray_session, blocks, bmax):
    from diffdataflowmlpipelines_ray.stages.lm import naive_bayes_predict

    ds = ray.data.from_pandas(_DOCS).repartition(blocks)
    got = naive_bayes_predict(ds, broadcast_max=bmax).to_pandas()
    gotd = {int(r.doc_id): r.pred for r in got.itertuples()}
    assert gotd == _ref_naive_bayes(_DOCS)
    assert 3 not in gotd                     # empty doc has no features


def test_naive_bayes_tie_breaks_to_smallest_class(ray_session):
    # two classes with IDENTICAL token statistics → every score ties →
    # the lexicographically smallest class must win deterministically
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["x y", "x y", "x y"],
        "lang": ["b", "a", "c"],         # 1 doc each, same tokens
    })
    from diffdataflowmlpipelines_ray.stages.lm import naive_bayes_predict

    got = naive_bayes_predict(ray.data.from_pandas(docs)).to_pandas()
    assert set(got["pred"]) == {"a"}
    assert _ref_naive_bayes(docs) == {i: "a" for i in range(3)}


# ---------------------------------------------------------------- PMI

def _ref_pmi(docs: pd.DataFrame, min_count: int, k: int) -> pd.DataFrame:
    """Counter-arithmetic PMI reference, same micro-nat rounding."""
    bg, uni = Counter(), Counter()
    for t in docs["text"]:
        toks = t.split()
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    n, u = sum(bg.values()), sum(uni.values())
    rows = []
    for (w1, w2), c in bg.items():
        if c < min_count:
            continue
        pmi = (_half_away(math.log(c) * 1e6)
               - _half_away(math.log(n) * 1e6)
               - (_half_away(math.log(uni[w1]) * 1e6)
                  - _half_away(math.log(u) * 1e6))
               - (_half_away(math.log(uni[w2]) * 1e6)
                  - _half_away(math.log(u) * 1e6)))
        rows.append((w1, w2, c, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return pd.DataFrame(rows[:k], columns=["w1", "w2", "pair_count",
                                           "pmi_micro"])


_PMI_DOCS = pd.DataFrame({
    "doc_id": range(8),
    "text": ["new york new york city", "new york is big",
             "san francisco and new york", "san francisco fog",
             "the cat sat on the mat", "the dog sat on the rug",
             "a b a b a b a b", "new york san francisco"],
})


@pytest.mark.parametrize("blocks,bmax", [(1, 500_000), (7, 500_000),
                                         (7, 0)])
def test_pmi_collocations_match_reference(ray_session, blocks, bmax):
    """Both tiers (broadcast / sharded-join), several partitionings."""
    from diffdataflowmlpipelines_ray.stages.lm import pmi_collocations

    ds = ray.data.from_pandas(_PMI_DOCS).repartition(blocks)
    got = pmi_collocations(ds, min_count=2, k=5,
                           broadcast_max=bmax).to_pandas()
    want = _ref_pmi(_PMI_DOCS, min_count=2, k=5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"pair_count": "int64",
                                           "pmi_micro": "int64"}),
        want.astype({"pair_count": "int64", "pmi_micro": "int64"}))


def test_pmi_min_count_filters_hapax(ray_session):
    from diffdataflowmlpipelines_ray.stages.lm import pmi_collocations

    ds = ray.data.from_pandas(_PMI_DOCS)
    got = pmi_collocations(ds, min_count=3, k=50).to_pandas()
    assert (got["pair_count"] >= 3).all()
    # ("a","b") occurs 4x — must survive; hapax pairs must not
    assert (("a", "b") in set(zip(got["w1"], got["w2"])))
    assert (("is", "big") not in set(zip(got["w1"], got["w2"])))


def _ref_kneser_ney(docs: pd.DataFrame) -> dict:
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    bg = Counter((a, b) for v in toks.values() for a, b in zip(v, v[1:]))
    ctx, n1f, n1b = Counter(), Counter(), Counter()
    for (a, b), c in bg.items():
        ctx[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nt = len(bg)
    out = {}
    for d, v in toks.items():
        if len(v) < 2:
            continue
        tot = 0
        for a, b in zip(v, v[1:]):
            num = (4 * bg[(a, b)] - 3) * nt + 3 * n1f[a] * n1b[b]
            den = 4 * ctx[a] * nt
            tot += _half_away(math.log(num / den) * 1e6)
        out[d] = (len(v) - 1, tot)
    return out


@pytest.mark.parametrize("blocks", [1, 4])
@pytest.mark.parametrize("bmax", [500_000, 0])   # broadcast vs exchange tier
def test_kneser_ney_matches_reference(ray_session, blocks, bmax):
    from diffdataflowmlpipelines_ray.stages.lm import kn_logprob_scores

    ds = ray.data.from_pandas(_DOCS).repartition(blocks)
    got = kn_logprob_scores(ds, broadcast_max=bmax).to_pandas()
    gotd = {int(r.doc_id): (int(r.n_bigrams), int(r.nats_micro))
            for r in got.itertuples()}
    assert gotd == _ref_kneser_ney(_DOCS)
    assert {2, 3, 9}.isdisjoint(gotd)


def test_kneser_ney_seen_bigram_likelier_than_continuation(ray_session):
    """A corpus where 'x y' is frequent: P_KN(y|x) must exceed the pure
    continuation weight of an equally-frequent but never-after-x token."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["x y x y x y", "z w z w", "x y"],
    })
    from diffdataflowmlpipelines_ray.stages.lm import kn_logprob_scores

    got = kn_logprob_scores(ray.data.from_pandas(docs).repartition(2)
                            ).to_pandas()
    ref = _ref_kneser_ney(docs)
    gotd = {int(r.doc_id): (int(r.n_bigrams), int(r.nats_micro))
            for r in got.itertuples()}
    assert gotd == ref
    # doc 2 = one 'x y' bigram: its per-bigram score must beat doc 1's
    # average (z/w less attested), sanity on the smoothing direction
    assert gotd[2][1] > gotd[1][1] // gotd[1][0]
