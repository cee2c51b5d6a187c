r"""Distributed histogram-based regression tree — the GBDT building block.

``hist_tree`` fits a depth-``d`` binary regression tree with the classic
histogram split-finding plan (the LightGBM/XGBoost ``hist`` method): each
feature is binned into ``B`` equal-width bins between its global min/max,
candidate splits are bin boundaries, and the split score is the standard
variance-reduction surrogate

    score(split) = s_l²/n_l + s_r²/n_r        (maximised)

over exact integer label sums, with deterministic ``(feature, bin)``
tie-breaking.

Determinism contract (how the DuckDB twin stays bit-equal): labels are
integer-valued, so every histogram count/sum is an exact int64 at any
block split; the score is evaluated in BOTH twins as the identical IEEE
expression ``(s_l*s_l)/n_l + (s_r*s_r)/n_r`` on those exact integers
(same operand order, correctly-rounded * and /), so even float scores are
bitwise identical and the argmax cannot diverge.  Bin assignment is the
identical ``clip(floor((x − min)/w), 0, B−1)`` double expression in both.
Label-sum magnitude must satisfy ``(Σ|label|)² < 2⁵³`` for the float
score to stay exact — callers pick small integer label units (the gate
uses discount percentage points, bound ~4e13 ≪ 9e15).

100-TB plan — ``1 + depth`` map-only passes, no shuffle at any size:

1. **Min/max pass**: per-block per-feature (min, max) partials fold to
   2·F driver scalars.
2. **Per-level histogram pass**: the current split list is broadcast
   once; each block walks its OWN rows down the partial tree (vectorised
   — one comparison per tree level), then emits ONE row holding its
   ``nodes × features × bins`` count/sum vectors (``np.bincount`` on a
   flattened index).  The driver folds O(blocks) such rows — traffic is
   corpus-size independent — scores all candidates, and appends the
   level's splits.  Leaf populations come free from the last level's
   chosen-split partial sums, so no extra pass is needed.

A node becomes a leaf early when no candidate leaves both sides
non-empty; its children inherit nothing (the node list stays sparse).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["hist_tree", "hist_boost", "hist_boost_apply"]


def _bin_matrix(tbl: pa.Table, features: list[str], fmin: np.ndarray,
                w: np.ndarray, bins: int) -> np.ndarray:
    """(n, F) bin indices — the identical double expression as the SQL
    twin: LEAST(GREATEST(floor((x - fmin)/w), 0), B-1)."""
    n = tbl.num_rows
    out = np.zeros((n, len(features)), dtype=np.int64)
    for j, f in enumerate(features):
        x = tbl[f].to_numpy(zero_copy_only=False).astype(np.float64)
        if w[j] == 0.0:  # constant feature: all one bin, never splittable
            continue
        b = np.floor((x - fmin[j]) / w[j])
        out[:, j] = np.clip(b, 0, bins - 1).astype(np.int64)
    return out


def _node_of(binm: np.ndarray, splits: dict[int, tuple[int, int]],
             level: int) -> np.ndarray:
    """Walk rows down the partial tree: node id after ``level`` levels.
    ``splits[node] = (feature_idx, bin)`` — go left iff bin ≤ split bin;
    a node absent from ``splits`` is a leaf (rows stay put)."""
    node = np.zeros(binm.shape[0], dtype=np.int64)
    for _ in range(level):
        nxt = node.copy()
        for nid, (fj, b) in splits.items():
            on = node == nid
            if not on.any():
                continue
            left = binm[on, fj] <= b
            nxt[on] = np.where(left, 2 * nid + 1, 2 * nid + 2)
        node = nxt
    return node


def _global_minmax(ds, features: list[str], bins: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature (fmin, bin width) from one partials pass."""
    def minmax_part(tbl: pa.Table) -> pa.Table:
        lo, hi = [], []
        for f in features:
            x = tbl[f].to_numpy(zero_copy_only=False).astype(np.float64)
            lo.append(float(x.min()) if len(x) else math.inf)
            hi.append(float(x.max()) if len(x) else -math.inf)
        return pa.table({"lo": pa.array([np.array(lo).tobytes()]),
                         "hi": pa.array([np.array(hi).tobytes()])})

    F = len(features)
    fmin = np.full(F, math.inf)
    fmax = np.full(F, -math.inf)
    for row in ds.map_batches(minmax_part, batch_format="pyarrow").take_all():
        fmin = np.minimum(fmin, np.frombuffer(row["lo"]))
        fmax = np.maximum(fmax, np.frombuffer(row["hi"]))
    # the same double division the SQL twin does
    return fmin, (fmax - fmin) / bins


def _fit_levels(ds, features: list[str], label_fn, depth: int, bins: int,
                fmin: np.ndarray, w: np.ndarray
                ) -> tuple[dict[int, tuple[int, int]],
                           dict[int, tuple[int, int]]]:
    """The per-level histogram loop shared by ``hist_tree`` (raw label
    column) and ``hist_boost`` (residual labels).  ``label_fn(tbl, binm)``
    returns the block's int64 labels; (splits, pop) come back exactly as
    documented on ``hist_tree``."""
    F, B = len(features), bins
    splits: dict[int, tuple[int, int]] = {}
    # node → (n, label_sum); root's filled from the level-0 histogram
    pop: dict[int, tuple[int, int]] = {}

    for level in range(depth):
        live = ([0] if level == 0 else
                [c for nid in splits if _depth_of(nid) == level - 1
                 for c in (2 * nid + 1, 2 * nid + 2)])
        if not live:
            break
        node_slot = {nid: i for i, nid in enumerate(sorted(live))}
        ref = ray.put((dict(splits), node_slot, fmin.copy(), w.copy()))
        size = len(live) * F * B

        def hist_part(tbl: pa.Table, _level=level, _size=size) -> pa.Table:
            sp, slots, lo, wd = ray.get(ref)
            binm = _bin_matrix(tbl, features, lo, wd, B)
            node = _node_of(binm, sp, _level)
            lab = label_fn(tbl, binm)
            slot = np.full(len(node), -1, dtype=np.int64)
            for nid, i in slots.items():
                slot[node == nid] = i
            on = slot >= 0
            idx = ((slot[on] * F)[:, None] + np.arange(F)[None, :]) * B \
                + binm[on]
            cnt = np.bincount(idx.ravel(), minlength=_size)
            s = np.bincount(idx.ravel(),
                            weights=np.repeat(lab[on], F).astype(np.float64),
                            minlength=_size)
            return pa.table({"cnt": pa.array([cnt.astype(np.int64)
                                              .tobytes()]),
                             "s": pa.array([s.astype(np.int64).tobytes()])})

        cnt = np.zeros(size, dtype=np.int64)
        s = np.zeros(size, dtype=np.int64)
        for row in ds.map_batches(hist_part,
                                  batch_format="pyarrow").take_all():
            cnt += np.frombuffer(row["cnt"], dtype=np.int64)
            s += np.frombuffer(row["s"], dtype=np.int64)

        for nid in sorted(live):
            i = node_slot[nid]
            h_c = cnt[i * F * B:(i + 1) * F * B].reshape(F, B)
            h_s = s[i * F * B:(i + 1) * F * B].reshape(F, B)
            n_tot, s_tot = int(h_c[0].sum()), int(h_s[0].sum())
            if nid == 0:
                pop[0] = (n_tot, s_tot)
            if n_tot < 2:
                continue  # leaf: nothing to split
            nl = np.cumsum(h_c, axis=1)  # (F, B) left counts at bin ≤ b
            sl = np.cumsum(h_s, axis=1)
            nr, sr = n_tot - nl, s_tot - sl
            valid = (nl > 0) & (nr > 0)
            if not valid.any():
                continue
            # the EXACT IEEE expression of the SQL twin, elementwise
            with np.errstate(divide="ignore", invalid="ignore"):
                score = (sl.astype(np.float64) * sl) / nl \
                    + (sr.astype(np.float64) * sr) / nr
            score[~valid] = -math.inf
            flat = int(np.argmax(score))  # first max = smallest (f, bin)
            fj, b = divmod(flat, B)
            splits[nid] = (fj, b)
            pop[2 * nid + 1] = (int(nl[fj, b]), int(sl[fj, b]))
            pop[2 * nid + 2] = (int(nr[fj, b]), int(sr[fj, b]))

    return splits, pop


def hist_tree(ds, features: list[str], label_col: str,
              depth: int = 2, bins: int = 8) -> pd.DataFrame:
    """Fit the tree; returns one row per materialised node:
    (node, kind, feature_idx, bin, n, label_sum, pred) — ``kind`` is
    'split' or 'leaf', feature_idx/bin are −1 for leaves, ``pred`` is the
    IEEE division label_sum/n.  Node ids: root 0, children of i are
    2i+1 / 2i+2."""
    ds = ds.materialize()
    fmin, w = _global_minmax(ds, features, bins)

    def label_fn(tbl: pa.Table, _binm) -> np.ndarray:
        return tbl[label_col].to_numpy(zero_copy_only=False).astype(
            np.int64)

    splits, pop = _fit_levels(ds, features, label_fn, depth, bins, fmin, w)

    rows = []
    for nid in sorted(pop):
        n_tot, s_tot = pop[nid]
        if nid in splits:
            fj, b = splits[nid]
            rows.append((nid, "split", fj, b, n_tot, s_tot,
                         s_tot / n_tot))
        else:
            rows.append((nid, "leaf", -1, -1, n_tot, s_tot,
                         s_tot / n_tot if n_tot else float("nan")))
    return pd.DataFrame(rows, columns=["node", "kind", "feature_idx",
                                       "bin", "n", "label_sum", "pred"]
                        ).astype({"node": np.int64, "feature_idx": np.int64,
                                  "bin": np.int64, "n": np.int64,
                                  "label_sum": np.int64})


def _predict_micro(binm: np.ndarray,
                   trees: list[tuple[dict, dict, int]]) -> np.ndarray:
    """Σ over trees of the leaf value each row lands in (int64 micro)."""
    out = np.zeros(binm.shape[0], dtype=np.int64)
    for splits, leaf_vals, depth in trees:
        node = _node_of(binm, splits, depth)
        for nid, v in leaf_vals.items():
            out[node == nid] += v
    return out


def hist_boost(ds, features: list[str], label_col: str, rounds: int = 3,
               depth: int = 2, bins: int = 8, lr_num: int = 1,
               lr_den: int = 2, scale: int = 1_000_000
               ) -> tuple[list[tuple[dict, dict, int]], pd.DataFrame]:
    """Gradient-boosted ensemble of histogram trees (squared loss).

    Labels scale to int64 micro-units (``y·scale``); each round fits
    ``_fit_levels`` on the EXACT integer residuals ``y·scale − F(x)`` and
    sets leaf values by the rational learning rate
    ``v = (s·lr_num) // (n·lr_den)`` (Python big-int floor division) — so
    every residual, split decision and leaf value is integer-exact and
    partition-invariant at any block split, the same determinism contract
    as ``hist_tree`` without its ``(Σ|label|)² < 2⁵³`` caveat (scores are
    driver-computed floats from exact int sums, bitwise reproducible).

    Per round: ``depth`` histogram passes + one metric pass, all map-only
    with O(blocks) driver rows.  Returns ``(model, history)``: ``model``
    is the dict ``{"trees", "fmin", "w", "scale", "bins"}`` consumed by
    :func:`hist_boost_apply`; ``history`` has one row per round:
    (round, n, sae_micro) — the sum of absolute residuals AFTER the
    round's update."""
    ds = ds.materialize()
    fmin, w = _global_minmax(ds, features, bins)
    trees: list[tuple[dict, dict, int]] = []
    hist_rows = []

    for t in range(rounds):
        ref = ray.put(list(trees))

        def label_fn(tbl: pa.Table, binm, _r=ref) -> np.ndarray:
            y = tbl[label_col].to_numpy(zero_copy_only=False).astype(
                np.int64) * scale
            return y - _predict_micro(binm, ray.get(_r))

        splits, pop = _fit_levels(ds, features, label_fn, depth, bins,
                                  fmin, w)
        leaf_vals = {nid: (s * lr_num) // (n * lr_den)
                     for nid, (n, s) in pop.items()
                     if nid not in splits and n > 0}
        trees.append((splits, leaf_vals, depth))

        ref2 = ray.put(list(trees))

        def metric_part(tbl: pa.Table, _r=ref2) -> pa.Table:
            binm = _bin_matrix(tbl, features, fmin, w, bins)
            y = tbl[label_col].to_numpy(zero_copy_only=False).astype(
                np.int64) * scale
            resid = y - _predict_micro(binm, ray.get(_r))
            return pa.table({"n": pa.array([tbl.num_rows],
                                           type=pa.int64()),
                             "sae": pa.array([int(np.abs(resid).sum())],
                                             type=pa.int64())})

        n_tot, sae = 0, 0
        for row in ds.map_batches(metric_part,
                                  batch_format="pyarrow").take_all():
            n_tot += int(row["n"])
            sae += int(row["sae"])
        hist_rows.append((t, n_tot, sae))

    history = pd.DataFrame(hist_rows, columns=["round", "n", "sae_micro"]
                           ).astype(np.int64)
    model = {"trees": trees, "fmin": fmin, "w": w, "scale": scale,
             "bins": bins}
    return model, history


def hist_boost_apply(ds, model: dict, features: list[str],
                     id_cols: list[str]):
    """Score every row with a fitted :func:`hist_boost` ensemble →
    Dataset of ``(*id_cols, pred_micro)``.  Map-only: the model (a few
    KB of splits and int64 leaf values) broadcasts once; each block bins
    its own rows and walks them down every tree — predictions are exact
    int64 sums of leaf values, so the output is bit-equal to the SQL
    twin that rebuilds the ensemble (``pred = y·scale − r_T``)."""
    import ray

    ref = ray.put((model["trees"], model["fmin"], model["w"],
                   model["bins"]))

    def score(tbl: pa.Table) -> pa.Table:
        trees, fmin, w, bins = ray.get(ref)
        binm = _bin_matrix(tbl, features, fmin, w, bins)
        pred = _predict_micro(binm, trees)
        cols = {c: tbl[c] for c in id_cols}
        cols["pred_micro"] = pa.array(pred)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def _depth_of(nid: int) -> int:
    d = 0
    while nid:
        nid = (nid - 1) // 2
        d += 1
    return d
