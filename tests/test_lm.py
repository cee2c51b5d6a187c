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
