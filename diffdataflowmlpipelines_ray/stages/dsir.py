r"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

The pretraining-data-selection primitive: score every raw document by the
log-likelihood ratio of a TARGET-domain bag-of-hashed-n-grams model over
the RAW-corpus model, so a top-k / thresholded selection pulls the raw
corpus toward the target distribution.  Features are unigrams ∪ space-
joined bigrams hashed into ``m`` buckets with the repo's oracle-stable
60-bit MD5 hash (``functions/hashing.stable_hash60``), and both bucket
distributions use add-one smoothing:

    p_b = (target_count_b + 1) / (target_total + m)
    q_b = (raw_count_b    + 1) / (raw_total    + m)
    weight(doc) = Σ_features  ln p_{b(f)} − ln q_{b(f)}

Every per-bucket ln-ratio is half-away-rounded to int64 MICRO-NATS before
the per-document sum, so the distributed integer sums are bit-equal to
the DuckDB twin regardless of block splits (the same determinism contract
as ``stages/lm.py``).

100-TB plan — two map-only passes, no shuffle at any corpus size:

1. **Fit pass**: each block emits ONE row holding its (m,)-vector of raw
   bucket counts and its (m,)-vector of target-subset bucket counts —
   O(blocks × m) integers to the driver, independent of corpus size.
   The driver folds them and builds the m-entry micro-nat ratio table.
2. **Score pass**: the ratio table is broadcast once (``ray.put``); each
   document re-hashes its own features IN ITS OWN BLOCK (a document is
   one row — its feature multiset never crosses blocks) and the weight
   is one ``np.bincount`` over doc positions.  Documents with zero
   features (empty text) emit nothing, mirroring the SQL twin's join.

Selection on top of the weights is a narrow (doc_id, weight) top-k —
compose with the existing per-block-pre-top-k machinery when k ≪ corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.hashing import stable_hash60_array
from ..functions.tokenize import tokenize_column
from ..functions.vectors import half_away

__all__ = ["dsir_weights"]


def _doc_features(tbl: pa.Table, text_col: str, m: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Block-local (doc_position, bucket) pairs for unigram ∪ bigram
    features; bigrams join with one space (the md5-able SQL form)."""
    toks = tokenize_column(tbl[text_col])
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    flat = toks.flatten().to_pandas().to_numpy(dtype=object)
    didx = np.repeat(np.arange(tbl.num_rows), lens)
    if len(flat) > 1:
        same = didx[1:] == didx[:-1]
        bigr = (pd.Series(flat[:-1][same]) + " "
                + pd.Series(flat[1:][same])).to_numpy(dtype=object)
        feats = np.concatenate([flat, bigr])
        fdoc = np.concatenate([didx, didx[:-1][same]])
    else:
        feats, fdoc = flat, didx
    if not len(feats):
        return fdoc.astype(np.int64), np.zeros(0, dtype=np.int64)
    buckets = stable_hash60_array(feats) % m
    return fdoc.astype(np.int64), buckets


def dsir_weights(ds, target_col: str, target_value,
                 m: int = 256, id_col: str = "doc_id",
                 text_col: str = "text") -> pd.DataFrame:
    """Per-document DSIR importance weight → (doc_id, n_feats,
    weight_micro), sorted by doc_id; docs with no features are absent.

    ``target_col == target_value`` rows define the target domain; the raw
    model is the WHOLE input (target included, as in the paper's
    raw-vs-target formulation).
    """
    ds = ds.materialize()  # two passes over the same blocks

    def fit_part(tbl: pa.Table) -> pa.Table:
        fdoc, buckets = _doc_features(tbl, text_col, m)
        raw = np.bincount(buckets, minlength=m).astype(np.int64)
        is_tgt = (tbl[target_col].to_numpy(zero_copy_only=False)
                  == target_value)
        tgt = np.bincount(buckets[is_tgt[fdoc]],
                          minlength=m).astype(np.int64)
        return pa.table({"raw": pa.array([raw.tobytes()]),
                         "tgt": pa.array([tgt.tobytes()])})

    raw_c = np.zeros(m, dtype=np.int64)
    tgt_c = np.zeros(m, dtype=np.int64)
    for row in ds.map_batches(fit_part, batch_format="pyarrow").take_all():
        raw_c += np.frombuffer(row["raw"], dtype=np.int64)
        tgt_c += np.frombuffer(row["tgt"], dtype=np.int64)
    T, R = float(tgt_c.sum()), float(raw_c.sum())
    ratio_micro = half_away(
        (np.log((tgt_c + 1.0) / (T + m)) - np.log((raw_c + 1.0) / (R + m)))
        * 1e6).astype(np.int64)
    ref = ray.put(ratio_micro)

    def score_part(tbl: pa.Table) -> pa.Table:
        rm = ray.get(ref)
        fdoc, buckets = _doc_features(tbl, text_col, m)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        w = np.bincount(fdoc, weights=rm[buckets].astype(np.float64),
                        minlength=tbl.num_rows)
        nf = np.bincount(fdoc, minlength=tbl.num_rows)
        keep = nf > 0
        return pa.table({
            "doc_id": pa.array(ids[keep].astype(np.int64)),
            "n_feats": pa.array(nf[keep].astype(np.int64)),
            # int64-valued by construction (sum of int64 micro-nats);
            # float64 bincount is exact while |sum| < 2^53 — each doc sums
            # n_feats terms of |ratio| ≤ ~20e6 micro-nats, far below it
            "weight_micro": pa.array(w[keep].astype(np.int64)),
        })

    out = (ds.map_batches(score_part, batch_format="pyarrow").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return out.astype({"doc_id": np.int64, "n_feats": np.int64,
                       "weight_micro": np.int64})
