r"""Statistical n-gram language-model stages over token streams.

The two classic corpus-model ops a web-scale training-data pipeline runs
that nothing else in this engine covered:

- :func:`bigram_logprob_scores` — per-document cross-entropy under an
  add-one-smoothed bigram LM trained on the corpus itself (the
  CCNet / Gopher-style "perplexity filter": documents whose text is
  improbable under a reference LM are boilerplate, gibberish or wrong
  language).  The reference engine tops out at bag-of-words features
  (count_vectorizer.rs, tfidf.rs); this is the sequential-model step above
  them.
- :func:`naive_bayes_predict` — multinomial naive Bayes fit + predict in
  one distributed plan (the `lang` label of the documents table is the
  class), i.e. supervised text classification with the same count
  machinery.

Design for 100 TB
-----------------
The model is NEVER broadcast and NEVER driver-resident.  Both ops are pure
count algebra, so the whole plan is narrow-row exchanges:

1. one tokenize pass per document block emits block-locally pre-aggregated
   ``(doc_id, w1, w2, k)`` bigram-count rows (a document lives in one row,
   so its bigram multiset never crosses blocks);
2. the global bigram table ``(w1, w2, c)`` and context table ``(w1, cw)``
   are tiny groupby-sums OVER THE PRE-AGGREGATED rows — the only wide
   exchanges, both vocabulary-bounded, never text-bounded;
3. scoring joins the doc-bigram rows back to the count tables with the
   partitioned :func:`~..stages.relational.hash_join` (model stays
   sharded), computes the smoothed log-probability vectorized, and
   finishes with one ``groupby(doc_id).sum`` — so a hot bigram ("of the")
   is one row in the count table joined by hash bucket, not a broadcast
   hot key.

Exactness across the oracle boundary
------------------------------------
Log-probabilities are irrational; summing them in float is
addition-order-dependent and a distributed sum has no defined order.  So
every ln() term is rounded half-away-from-zero to 6 decimals and carried
as INTEGER micro-nats (int64); per-document totals are then exact integer
sums, bit-equal no matter how blocks split, and bit-equal to the DuckDB
twin that applies the same ROUND(LN(...)*1e6).  The only residual risk is
a 1-ulp libm disagreement landing exactly on a .5 micro-nat boundary
(probability ~1e-9 per term; the corpus gates at ~3e4 terms).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import tokenize_column
from ..functions.vectors import half_away

__all__ = ["doc_bigram_counts", "bigram_logprob_scores",
           "doc_token_counts", "naive_bayes_predict"]


def _micronats(p: np.ndarray) -> np.ndarray:
    """ln(p) rounded half-away to 6 dp, carried as exact int64 micro-nats."""
    return half_away(np.log(p) * 1e6).astype(np.int64)


def doc_bigram_counts(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of documents → Dataset of ``(doc_id, w1, w2, k)`` rows.

    Whitespace tokenization (the reference tokenizer, utils.rs:3-9 — same
    as the SQL twin's ``string_split_regex``); consecutive token pairs
    within each document, pre-aggregated per (doc, pair) inside the block
    so repeated bigrams shuffle as one weighted row.  Documents with < 2
    tokens emit nothing.
    """

    def explode(tbl: pa.Table) -> pa.Table:
        toks = tokenize_column(tbl[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        ids = np.repeat(tbl[id_col].to_numpy(zero_copy_only=False), lens)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "w1": pa.array([], type=pa.string()),
                             "w2": pa.array([], type=pa.string()),
                             "k": pa.array([], type=pa.int64())})
        same = ids[:-1] == ids[1:]          # pair stays inside its document
        pdf = pd.DataFrame({"doc_id": ids[:-1][same],
                            "w1": flat[:-1][same],
                            "w2": flat[1:][same]})
        out = (pdf.groupby(["doc_id", "w1", "w2"], as_index=False)
               .size().rename(columns={"size": "k"}))
        out["k"] = out["k"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs.map_batches(explode, batch_format="pyarrow")


def _vocab_size(docs, text_col: str = "text") -> int:
    """Exact distinct-token count: block-unique partials → one groupby."""

    def block_unique(tbl: pa.Table) -> pa.Table:
        toks = tokenize_column(tbl[text_col])
        u = np.unique(toks.flatten().to_numpy(zero_copy_only=False))
        return pa.table({"tok": pa.array(u)})

    return (docs.map_batches(block_unique, batch_format="pyarrow")
            .groupby("tok").count().count())


def bigram_logprob_scores(docs, id_col: str = "doc_id",
                          text_col: str = "text", buckets: int = 16):
    """Per-document add-one-smoothed bigram log-probability.

    Returns a Dataset of ``(doc_id, n_bigrams, nats_micro)``:
    ``nats_micro`` is the exact int64 sum over the document's bigram
    occurrences of ``round(ln((c(w1,w2)+1) / (c(w1,·)+V)) * 1e6)`` — i.e.
    total micro-nats of surprise; perplexity is
    ``exp(-nats_micro / 1e6 / n_bigrams)``, left to the consumer because
    exp() would re-introduce float drift into the gate.
    """
    from .relational import hash_join

    db = doc_bigram_counts(docs, id_col, text_col).materialize()
    vocab = _vocab_size(docs, text_col)

    cnt = db.groupby(["w1", "w2"]).sum("k").map_batches(
        lambda t: t.rename_columns(["bw1", "bw2", "c"]), batch_format="pyarrow")
    ctx = cnt.groupby("bw1").sum("c").map_batches(
        lambda t: t.rename_columns(["w1c", "cw"]), batch_format="pyarrow")

    j1 = hash_join(db, cnt, ["w1", "w2"], ["bw1", "bw2"],
                   buckets=buckets).map_batches(
        lambda t: t.select(["doc_id", "w1", "k", "c"]),
        batch_format="pyarrow")
    j2 = hash_join(j1, ctx, ["w1"], ["w1c"], buckets=buckets)

    v = float(vocab)

    def term(tbl: pa.Table) -> pa.Table:
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        cw = tbl["cw"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = tbl["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = _micronats((c + 1.0) / (cw + v))
        return pa.table({"doc_id": tbl["doc_id"],
                         "n_bigrams": pa.array(k),
                         "nats_micro": pa.array(k * mn)})

    return (j2.map_batches(term, batch_format="pyarrow")
            .groupby("doc_id").sum(["n_bigrams", "nats_micro"])
            .map_batches(lambda t: t.rename_columns(
                ["doc_id", "n_bigrams", "nats_micro"]),
                batch_format="pyarrow"))


def doc_token_counts(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of documents → ``(doc_id, tok, k)`` rows, block-pre-agg'd."""

    def explode(tbl: pa.Table) -> pa.Table:
        toks = tokenize_column(tbl[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        ids = np.repeat(tbl[id_col].to_numpy(zero_copy_only=False), lens)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        pdf = pd.DataFrame({"doc_id": ids, "tok": flat})
        out = (pdf.groupby(["doc_id", "tok"], as_index=False)
               .size().rename(columns={"size": "k"}))
        out["k"] = out["k"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs.map_batches(explode, batch_format="pyarrow")


def naive_bayes_predict(docs, label_col: str = "lang",
                        id_col: str = "doc_id", text_col: str = "text",
                        buckets: int = 16):
    """Multinomial naive Bayes, fit and predicted on the corpus itself.

    Class = ``label_col``; features = whitespace token counts; add-one
    smoothing over the global vocabulary.  Returns a Dataset of
    ``(doc_id, pred)`` — the argmax class of

        ln P(class) + Σ_tokens k · ln((c(class,tok)+1) / (N_class+V))

    in exact integer micro-nats (ties broken by the lexicographically
    smallest class, so the result is deterministic and matches the SQL
    twin bit-for-bit).

    Distributed plan: per-class token counts are ONE groupby over the
    block-pre-aggregated (doc, tok, k) rows pivoted wide (one row per
    token, one int64 column per class) — vocabulary-bounded, sharded,
    joined back to the doc-token rows by hash bucket.  Class priors /
    totals are a handful of scalars (one per class), the only
    driver-resident state.
    """
    from .relational import hash_join

    dt = doc_token_counts(docs, id_col, text_col).materialize()

    # (doc_id, label) — one row per doc; labels per doc are unique by schema
    lab = docs.map_batches(
        lambda t: t.select([id_col, label_col]).rename_columns(
            ["ldoc", label_col]), batch_format="pyarrow")

    # attach labels to token rows (partitioned join on doc_id)
    dtl = hash_join(dt, lab, [id_col], ["ldoc"], buckets=buckets)

    # per (class, token) counts, pivoted wide by class
    classes = sorted(r[label_col] for r in
                     docs.groupby(label_col).count().take_all())

    def pivot_block(tbl: pa.Table) -> pa.Table:
        pdf = tbl.to_pandas()
        g = (pdf.groupby(["tok", label_col], as_index=False)["k"].sum()
             .pivot(index="tok", columns=label_col, values="k"))
        out = {"tok": g.index.to_numpy()}
        for c in classes:
            col = (g[c].fillna(0).to_numpy(dtype=np.int64)
                   if c in g.columns else np.zeros(len(g), dtype=np.int64))
            out[f"c_{c}"] = col
        return pa.table(out)

    wide = (dtl.map_batches(pivot_block, batch_format="pyarrow")
            .groupby("tok").sum([f"c_{c}" for c in classes])
            .map_batches(lambda t: t.rename_columns(
                ["wtok"] + [f"c_{c}" for c in classes]),
                batch_format="pyarrow").materialize())

    # per-class token totals + doc counts: one tiny aggregate each
    totals = {c: 0 for c in classes}
    for row in (wide.map_batches(
            lambda t: pa.table({f"c_{c}": [pc.sum(t[f"c_{c}"]).as_py() or 0]
                                for c in classes}), batch_format="pyarrow")
            .take_all()):
        for c in classes:
            totals[c] += row[f"c_{c}"]
    ndocs = {r[label_col]: r["count()"] for r in
             docs.groupby(label_col).count().take_all()}
    n_total = sum(ndocs.values())
    vocab = wide.count()
    v = float(vocab)

    prior_mn = {c: int(_micronats(np.array([ndocs[c] / n_total]))[0])
                for c in classes}

    # score: join doc-token rows to the wide count table, per-class terms
    j = hash_join(dt, wide, ["tok"], ["wtok"], buckets=buckets)

    tot = {c: float(totals[c]) for c in classes}

    def score(tbl: pa.Table) -> pa.Table:
        k = tbl["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"doc_id": tbl["doc_id"]}
        for c in classes:
            cc = tbl[f"c_{c}"].to_numpy(zero_copy_only=False).astype(np.float64)
            cols[f"s_{c}"] = pa.array(k * _micronats((cc + 1.0) / (tot[c] + v)))
        return pa.table(cols)

    scored = (j.map_batches(score, batch_format="pyarrow")
              .groupby("doc_id").sum([f"s_{c}" for c in classes])
              .map_batches(lambda t: t.rename_columns(
                  ["doc_id"] + [f"s_{c}" for c in classes]),
                  batch_format="pyarrow"))

    def argmax(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        best = np.full(n, "", dtype=object)
        best_s = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        for c in classes:                       # classes ascending: ties → smallest
            s = (tbl[f"s_{c}"].to_numpy(zero_copy_only=False)
                 + prior_mn[c])
            better = s > best_s
            best_s = np.where(better, s, best_s)
            best[better] = c
        return pa.table({"doc_id": tbl["doc_id"],
                         "pred": pa.array(best.tolist(), type=pa.string())})

    return scored.map_batches(argmax, batch_format="pyarrow")
