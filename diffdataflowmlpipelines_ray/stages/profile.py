"""Dataset profiling — the distributed ``ANALYZE TABLE`` primitive every
ingestion pipeline runs before training: per-column row/null counts, EXACT
distinct cardinality, and numeric min/max, as one tidy stats table.

100-TB plan: counts and min/max fold from one map pass of O(blocks)
partial rows.  Distinct counts are EXACT (not sketched): per block each
column's values pre-dedup with ``np.unique``, then one narrow
``groupby(value)`` exchange per profiled column counts survivors — a
value leaves its block once regardless of frequency, so the exchange is
bounded by Σ per-block cardinality (the HLL sketch in
``state/sketches.py`` is the approximate tier when even that is too
much; this operator is the exact twin the gate can oracle)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.vectors import half_away

__all__ = ["profile_columns", "psi", "gini_cents", "auc_exact"]


def profile_columns(ds, columns: list[str],
                    numeric_cols: list[str]) -> "object":
    """→ pandas DataFrame (column, n, n_null, n_distinct, min_num,
    max_num); min/max only for ``numeric_cols`` (NaN elsewhere), computed
    as float64.  Distinct counts include nulls as SQL ``COUNT(DISTINCT)``
    does NOT — nulls are excluded there, and here."""
    import pandas as pd

    ds = ds.materialize()

    def part(tbl: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = tbl[c]
            n = len(col)
            n_null = col.null_count
            if c in numeric_cols and n > n_null:
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                v = v[~np.isnan(v)]
                mn, mx = (float(v.min()), float(v.max())) if len(v) else (
                    math.inf, -math.inf)
            else:
                mn, mx = math.inf, -math.inf
            rows.append((c, n, n_null, mn, mx))
        col_, n_, nn_, mn_, mx_ = zip(*rows)
        return pa.table({"column": pa.array(col_),
                         "n": pa.array(n_, type=pa.int64()),
                         "n_null": pa.array(nn_, type=pa.int64()),
                         "mn": pa.array(mn_), "mx": pa.array(mx_)})

    agg: dict = {c: [0, 0, math.inf, -math.inf] for c in columns}
    for r in ds.map_batches(part, batch_format="pyarrow").take_all():
        a = agg[r["column"]]
        a[0] += int(r["n"])
        a[1] += int(r["n_null"])
        a[2] = min(a[2], float(r["mn"]))
        a[3] = max(a[3], float(r["mx"]))

    def distinct_count(c: str) -> int:
        def uniq(tbl: pa.Table) -> pa.Table:
            col = tbl[c].drop_null()
            return pa.table({"v": pc.unique(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col)})

        return (ds.map_batches(uniq, batch_format="pyarrow")
                .groupby("v").count().count())

    out = []
    for c in columns:
        n, n_null, mn, mx = agg[c]
        isnum = c in numeric_cols
        out.append((c, n, n_null, distinct_count(c),
                    mn if isnum and mn != math.inf else float("nan"),
                    mx if isnum and mx != -math.inf else float("nan")))
    return pd.DataFrame(out, columns=["column", "n", "n_null",
                                      "n_distinct", "min_num", "max_num"]
                        ).astype({"n": np.int64, "n_null": np.int64,
                                  "n_distinct": np.int64})


def psi(ds_ref, ds_new, col: str, bins: int = 10):
    """Population Stability Index — the model-monitoring drift score
    between a reference and a new sample of one numeric column:

        PSI = Σ_bins (p_ref_i − p_new_i) · ln(p_ref_i / p_new_i)

    Equal-width bins span the REFERENCE min/max (values outside clamp to
    the edge bins, the standard convention), and both distributions use
    add-one smoothing so empty bins stay finite.  Returns a pandas
    DataFrame of per-bin rows (bin, n_ref, n_new, term) plus the total in
    every row (psi) — all counts exact int64, every float the identical
    IEEE expression on those ints in both twins (same determinism
    contract as `repetition_filter`), so the gate is bit-exact.

    Plan: ONE map pass per side emitting a (bins,)-histogram per block —
    O(blocks × bins) ints to the driver, zero shuffles at any size."""
    import pandas as pd

    ds_ref = ds_ref.materialize()  # feeds both the min/max and hist pass
    lohi = [math.inf, -math.inf]
    for r in ds_ref.map_batches(
            lambda t: pa.table({
                "lo": pa.array([float(np.nanmin(
                    t[col].to_numpy(zero_copy_only=False)))
                    if t.num_rows else math.inf]),
                "hi": pa.array([float(np.nanmax(
                    t[col].to_numpy(zero_copy_only=False)))
                    if t.num_rows else -math.inf])}),
            batch_format="pyarrow").take_all():
        lohi[0] = min(lohi[0], float(r["lo"]))
        lohi[1] = max(lohi[1], float(r["hi"]))
    lo, hi = lohi
    w = (hi - lo) / bins  # the same double division as the SQL twin

    def hist(ds):
        def part(tbl: pa.Table) -> pa.Table:
            if col not in tbl.column_names:  # columnless empty block
                return pa.table({"h": pa.array(
                    [np.zeros(bins, dtype=np.int64).tobytes()])})
            v = tbl[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            b = (np.clip(np.floor((v - lo) / w), 0, bins - 1).astype(
                np.int64) if np.isfinite(w) and w != 0.0
                else np.zeros(len(v), np.int64))
            return pa.table({"h": pa.array(
                [np.bincount(b, minlength=bins).astype(np.int64)
                 .tobytes()])})

        out = np.zeros(bins, dtype=np.int64)
        for r in ds.map_batches(part, batch_format="pyarrow").take_all():
            out += np.frombuffer(r["h"], dtype=np.int64)
        return out

    ca, cb = hist(ds_ref), hist(ds_new)
    na, nb = int(ca.sum()), int(cb.sum())
    pa_ = (ca + 1.0) / (na + bins)
    pb_ = (cb + 1.0) / (nb + bins)
    term = (pa_ - pb_) * np.log(pa_ / pb_)
    tm = half_away(term * 1e6).astype(np.int64)
    # the total is the SUM OF THE ROUNDED per-bin micro terms — an exact
    # int64 sum, so the twin's SQL SUM is order-free and bit-equal
    return pd.DataFrame({
        "bin": np.arange(bins, dtype=np.int64),
        "n_ref": ca, "n_new": cb,
        "term_micro": tm,
        "psi_micro": np.full(bins, int(tm.sum()), dtype=np.int64),
    })


def gini_cents(ds, value_col: str, id_col: str):
    """Exact Gini coefficient of a non-negative integer-cents column —
    the inequality measure of spend/usage concentration:

        G = (2·Σ_i i·x_(i)) / (n·Σx) − (n+1)/n

    with x_(i) the i-th smallest value (ties broken by id so the rank
    assignment — and therefore Σ i·x — is partition-invariant and equal
    to the SQL ROW_NUMBER twin).  Every accumulation is int64
    (Σ i·x ≤ n²·max_cents — caller keeps n·max within 9·10¹⁸), so the
    only floats are the two final IEEE divisions, identical in both
    twins; the result is returned in exact integer pieces plus the
    derived double.

    Plan: ONE range-partitioned sort + the two-pass rank scan
    (`ordered_prefix_sum` machinery inline: per-block (count, Σx, Σ
    local-rank·x) partials, driver folds O(blocks) rows and adds each
    block's offset × block-Σx — the rank product telescopes, so no
    second pass is needed)."""
    import pandas as pd

    S = ds.sort([value_col, id_col]).materialize()

    def part(tbl: pa.Table) -> pa.Table:
        if value_col not in tbl.column_names or tbl.num_rows == 0:
            return pa.table({"first_v": pa.array([], type=pa.int64()),
                             "first_i": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "sx": pa.array([], type=pa.int64()),
                             "srx": pa.array([], type=pa.int64())})
        x = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (x < 0).any():
            raise ValueError("gini needs non-negative values")
        # local 1-based ranks; global rank = block offset + local
        r = np.arange(1, len(x) + 1, dtype=np.int64)
        return pa.table({
            "first_v": pa.array([int(x[0])]),
            "first_i": pa.array([int(tbl[id_col][0].as_py())]),
            "n": pa.array([len(x)]),
            "sx": pa.array([int(x.sum())]),
            "srx": pa.array([int((r * x).sum())]),
        })

    mt = (pa.concat_tables(list(
        S.map_batches(part, batch_size=None, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))).to_pandas()
        .sort_values(["first_v", "first_i"]).reset_index(drop=True))
    n_tot = int(mt["n"].sum())
    sx = int(mt["sx"].sum())
    offs = np.concatenate([[0], np.cumsum(mt["n"].to_numpy())[:-1]])
    # Σ (off + local_rank)·x = Σ srx + off·block_sx, exact ints
    srx = int((mt["srx"].to_numpy()
               + offs * mt["sx"].to_numpy()).sum())
    if n_tot == 0 or sx == 0:
        return pd.DataFrame({"n": [n_tot], "sum_cents": [sx],
                             "rank_weighted_cents": [srx],
                             "gini_micro": [np.int64(0)]})
    g = (2.0 * srx) / (float(n_tot) * sx) - (n_tot + 1.0) / n_tot
    return pd.DataFrame({
        "n": pd.Series([n_tot], dtype=np.int64),
        "sum_cents": pd.Series([sx], dtype=np.int64),
        "rank_weighted_cents": pd.Series([srx], dtype=np.int64),
        "gini_micro": pd.Series([int(half_away(
            np.array([g * 1e6]))[0])], dtype=np.int64),
    })


def auc_exact(ds, score_col: str, label_col: str, scale: int = 1_000_000):
    """EXACT ROC AUC at any scale — the Mann–Whitney formulation over the
    distinct-score grid, all integer until one final IEEE division:

        2·U = Σ_v  pos(v) · (2·neg_below(v) + neg(v))
        AUC = 2U / (2·n_pos·n_neg)

    (ties contribute the standard half credit — that's the ``+ neg(v)``
    term).  Scores quantize half-away to ``scale`` micro-units; per-value
    (pos, neg) counts ride one narrow pre-aggregated groupby, and
    ``neg_below`` is the distributed exclusive scan over the score order
    (``ordered_prefix_sum``).  Σ accumulates as exact int64 partials per
    block.  Returns (n_pos, n_neg, u2, auc_micro)."""
    import pandas as pd

    from .relational import ordered_prefix_sum

    def part(tbl: pa.Table) -> pa.Table:
        s = half_away(tbl[score_col].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * scale).astype(np.int64)
        y = tbl[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pdf = (pd.DataFrame({"s": s, "pos": y, "neg": 1 - y})
               .groupby("s", as_index=False).sum())
        return pa.Table.from_pandas(pdf.astype(np.int64),
                                    preserve_index=False)

    per_v = (ds.map_batches(part, batch_format="pyarrow")
             .groupby("s").sum(["pos", "neg"])
             .map_batches(lambda t: t.rename_columns(["s", "pos", "neg"]),
                          batch_format="pyarrow").materialize())

    with_below = ordered_prefix_sum(per_v, "s", "neg",
                                    out_col="neg_below", exclusive=True)

    def fold(tbl: pa.Table) -> pa.Table:
        if "pos" not in tbl.column_names:
            z = pa.array([0], type=pa.int64())
            return pa.table({"u2": z, "np_": z, "nn": z})
        p = tbl["pos"].to_numpy(zero_copy_only=False)
        n = tbl["neg"].to_numpy(zero_copy_only=False)
        b = tbl["neg_below"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u2": pa.array([int((p * (2 * b + n)).sum())],
                           type=pa.int64()),
            "np_": pa.array([int(p.sum())], type=pa.int64()),
            "nn": pa.array([int(n.sum())], type=pa.int64()),
        })

    u2 = npos = nneg = 0
    for r in with_below.map_batches(fold,
                                    batch_format="pyarrow").take_all():
        u2 += int(r["u2"])
        npos += int(r["np_"])
        nneg += int(r["nn"])
    auc = u2 / (2.0 * npos * nneg) if npos and nneg else float("nan")
    if not np.isfinite(auc):  # one class absent (tiny_sweep empty domain)
        return pd.DataFrame(columns=["n_pos", "n_neg", "u2",
                                     "auc_micro"]).astype(np.int64)
    return pd.DataFrame({
        "n_pos": pd.Series([npos], dtype=np.int64),
        "n_neg": pd.Series([nneg], dtype=np.int64),
        "u2": pd.Series([u2], dtype=np.int64),
        "auc_micro": pd.Series([int(half_away(
            np.array([auc * 1e6]))[0])], dtype=np.int64),
    })
