r"""Ranked text retrieval: distributed BM25 top-k.

``bm25_topk`` scores every document against a small set of term queries
under Okapi BM25 (Robertson & Zaragoza 2009; the Lucene idf variant
``ln((N − df + 0.5)/(df + 0.5) + 1)``, which is ≥ 0 for any df) and
returns each query's top-k ``(doc_id, score, rank)``.

100-TB plan — the whole operator is two map-only passes plus one tiny
exchange; document text NEVER leaves its block:

1. **Corpus-stats pass** (``map_batches``, no shuffle): each block emits ONE
   narrow summary row — its document count, total token count, and the
   per-query-term document frequencies (bounded by the query vocabulary,
   not the corpus vocabulary).  The driver folds O(blocks) rows into
   ``N``, ``avgdl`` and the idf table: O(query terms) scalars.
2. **Scoring pass** (``map_batches``): the idf/avgdl table is broadcast
   once (``ray.put``); each block recomputes its term frequencies against
   the query vocabulary (one C-speed pandas merge), sums the per-term BM25
   contributions per (query, doc), rounds to 6 dp (both twins round BEFORE
   ranking so float libm drift cannot flip rank order), and pre-selects
   its LOCAL top-k per query — any global winner is a block winner under
   the same ``(score DESC, doc_id)`` total order, so correctness is exact.
3. **Merge**: one ``groupby(query_id)`` over ≤ blocks × queries × k narrow
   candidate rows picks the global top-k.  Payload text never moves; the
   exchange volume is independent of corpus size per block.

Documents containing NO query term never emit a candidate (score would be
0 under the ≥0 idf variant) — mirroring the SQL twin's inner join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.tokenize import tokenize_column

__all__ = ["bm25_topk"]


def bm25_topk(ds, queries: dict[int, list[str]], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """BM25 top-k per query → (query_id, doc_id, score, rank).

    ``queries``: {query_id: [term, ...]} — duplicate terms in one query
    contribute once (set semantics, matching the SQL twin's join on the
    distinct (query_id, term) pairs).
    """
    qpairs = sorted({(int(qid), t) for qid, terms in queries.items()
                     for t in terms})
    qvocab = sorted({t for _, t in qpairs})
    ds = ds.materialize()  # two passes over the same blocks

    # ---- pass 1: per-block (n_docs, sum_dl, df over the query vocabulary)
    def stats_part(tbl: pa.Table) -> pa.Table:
        import pickle

        toks = tokenize_column(tbl[text_col])
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        ids = np.repeat(np.arange(tbl.num_rows), lens)
        pdf = pd.DataFrame({"d": ids, "term": toks.flatten().to_pandas()})
        pdf = pdf[pdf["term"].isin(qvocab)]
        dfc = pdf.drop_duplicates().groupby("term").size().to_dict()
        return pa.table({
            "n": pa.array([tbl.num_rows], type=pa.int64()),
            "sum_dl": pa.array([int(lens.sum())], type=pa.int64()),
            "df": pa.array([pickle.dumps(dfc)], type=pa.binary()),
        })

    import pickle

    n_docs, sum_dl = 0, 0
    df: dict[str, int] = {}
    for row in ds.map_batches(stats_part, batch_format="pyarrow").take_all():
        n_docs += int(row["n"])
        sum_dl += int(row["sum_dl"])
        for t, c in pickle.loads(row["df"]).items():
            df[t] = df.get(t, 0) + int(c)
    avgdl = sum_dl / n_docs if n_docs else 1.0
    idf = {t: float(np.log((n_docs - c + 0.5) / (c + 0.5) + 1.0))
           for t, c in df.items()}
    # (term → rows of (query_id, idf)) as a merge table
    qtab = pd.DataFrame(
        [(qid, t, idf[t]) for qid, t in qpairs if t in idf],
        columns=["query_id", "term", "idf"])
    ref = ray.put((qtab, avgdl))

    # ---- pass 2: block-local scoring + per-query local top-k
    def score_part(tbl: pa.Table) -> pa.Table:
        qt, ad = ray.get(ref)
        toks = tokenize_column(tbl[text_col])
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        pdf = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "dl": np.repeat(lens.astype(np.float64), lens),
            "term": toks.flatten().to_pandas(),
        })
        pdf = pdf[pdf["term"].isin(qt["term"].to_numpy())]
        if not len(pdf):
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        tf = (pdf.groupby(["doc_id", "term"], as_index=False)
              .agg(tf=("term", "size"), dl=("dl", "first")))
        m = tf.merge(qt, on="term")
        tfv = m["tf"].to_numpy(dtype=np.float64)
        dlv = m["dl"].to_numpy(dtype=np.float64)
        m["c"] = m["idf"].to_numpy() * (
            tfv * (k1 + 1.0) / (tfv + k1 * (1.0 - b + b * dlv / ad)))
        sc = m.groupby(["query_id", "doc_id"], as_index=False)["c"].sum()
        sc["score"] = np.round(sc.pop("c").to_numpy(), 6)
        sc = sc.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True])
        sc = sc.groupby("query_id").head(k)
        return pa.Table.from_pandas(
            sc.astype({"query_id": np.int64, "doc_id": np.int64}),
            preserve_index=False)

    def final_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k)
        pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
        return pdf

    out = (ds.map_batches(score_part, batch_format="pyarrow")
           .groupby("query_id")
           .map_groups(final_topk, batch_format="pandas")
           .to_pandas())
    if not len(out):
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64),
                             "rank": pd.Series([], dtype=np.int64)})
    return (out[["query_id", "doc_id", "score", "rank"]]
            .astype({"query_id": np.int64, "doc_id": np.int64,
                     "rank": np.int64})
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
