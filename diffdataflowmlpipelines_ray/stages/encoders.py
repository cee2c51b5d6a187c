"""sklearn-style incremental feature encoders as Ray Data batch operators.

Reimplements every encoder of the reference (`/root/reference`, SURVEY §2.3/2.4)
Ray-Data-first:

- **fit** = a two-phase distributed aggregate: one vectorized partial
  accumulator per Arrow block (``map_batches``), then a deterministic
  driver-side tree merge of the tiny partials (`merge_all`).  The partials are
  the same invertible monoids the reference keeps in the DD diff position, so
  fit also accepts a ``diff`` weight column (+1 insert / −1 retract) and is
  reused verbatim by the streaming engine for incremental maintenance.
- **transform** = a stateless ``map_batches`` with the (small) fitted state
  broadcast into the stage; vectorized pyarrow/numpy kernels, never a Python
  loop over rows.

Reference quirks reproduced behind ``reference_compat`` (default True for
parity, SURVEY §7.5):
- StandardScaler divides by *variance*, not std-dev
  (standard_scaler.rs:109-113, test expectation :162).
- TfidfTransformer's fit binarization is inverted — counts docs where the
  term is ≈0 (tfidf_transformer.rs:36-39) — so the "document frequency" is an
  absence count.  ``reference_compat=False`` computes real df.

All encoders implement::

    fit(ds, column, weight_col=None) -> self       # one pass over ds
    transform_table(tbl, column, out) -> pa.Table  # pure, broadcastable
    transform(ds, column, out=None) -> Dataset     # map_batches(transform_table)

Fitted state is exposed as a plain picklable ``state()`` dict so the
streaming engine can snapshot/restore it.
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash60_array
from ..functions.tokenize import flatten_tokens, tokenize_column
from ..functions.vectors import list_array_from_2d, list_column_to_2d
from ..state.aggregates import (
    DocumentFrequencyAgg,
    MeanVarAgg,
    CategoryMeanAgg,
    MinMaxAgg,
    PositionAssignmentAgg,
    SumCountAgg,
    dumps,
    loads,
    merge_all,
)

__all__ = [
    "Encoder",
    "StandardScaler",
    "MinMaxScaler",
    "KBinsDiscretizer",
    "KBinsQuantileDiscretizer",
    "OrdinalEncoder",
    "OneHotEncoder",
    "CountVectorizer",
    "TfidfTransformer",
    "HashVectorizer",
    "PolynomialFeaturesEncoder",
    "Passthrough",
    "FunctionEncoder",
    "fit_partials",
    "MaxAbsScaler",
    "RobustScaler",
    "Binarizer",
    "SimpleImputer",
    "TargetEncoder",
    "target_encode_loo",
]

#: rows per fit batch — large enough to amortize kernel launches, small
#: enough that batch × concurrency fits a worker heap at 100 TB scale.
DEFAULT_FIT_BATCH = 65536


def fit_partials(ds, columns: list[str], make_partial: Callable[[pa.Table], Any],
                 weight_col: str | None = None):
    """Two-phase distributed aggregate: per-block partials → deterministic merge.

    ``make_partial(tbl)`` must return a mergeable accumulator built
    vectorized from the whole block.  The partial stage emits ONE tiny pickled
    row per block, so the driver-side ``take_all`` moves O(#blocks × state)
    bytes, never data.  This is the salted/two-phase fix for the reference's
    key=`1` single-reducer hot spot (standard_scaler.rs:81-86, SURVEY §4).
    """
    cols = list(columns) + ([weight_col] if weight_col else [])

    def per_block(tbl: pa.Table) -> pa.Table:
        acc = make_partial(tbl)
        return pa.table({"partial": pa.array([dumps(acc)], type=pa.binary())})

    parts = ds.select_columns(cols).map_batches(
        per_block, batch_format="pyarrow", batch_size=DEFAULT_FIT_BATCH
    )
    blobs = [row["partial"] for row in parts.take_all()]
    return merge_all([loads(b) for b in blobs])


def _weights(tbl: pa.Table, weight_col: str | None) -> np.ndarray | None:
    if weight_col is None or weight_col not in tbl.column_names:
        return None
    return tbl[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)


def _float_col(tbl: pa.Table, column: str) -> np.ndarray:
    """Numeric column → float64 ndarray (reference ``get_float`` widening,
    row_value.rs:31-37)."""
    return tbl[column].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


class Encoder(ABC):
    """The ``ColumnEncoder`` plugin surface (column_encoder.rs:6-15)."""

    #: encoders that need no fit pass can skip it
    requires_fit = True

    def fit(self, ds, column: str, weight_col: str | None = None) -> "Encoder":
        if self.requires_fit:
            raise NotImplementedError
        return self

    @abstractmethod
    def transform_table(self, tbl: pa.Table, column: str, out: str) -> pa.Table:
        ...

    def transform(self, ds, column: str, out: str | None = None):
        out = out or f"{column}_enc"
        enc = self  # captured (small fitted state) and broadcast per task

        def apply(tbl: pa.Table) -> pa.Table:
            return enc.transform_table(tbl, column, out)

        return ds.map_batches(apply, batch_format="pyarrow")

    def fit_transform(self, ds, column: str, out: str | None = None,
                      weight_col: str | None = None):
        self.fit(ds, column, weight_col)
        return self.transform(ds, column, out)

    # -- streaming/state plumbing -------------------------------------------
    def state(self) -> dict:
        """Picklable fitted state (for checkpoint/broadcast); caches excluded."""
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}

    def set_state(self, st: dict) -> "Encoder":
        self.__dict__.update(st)
        return self

    # -- incremental fit hooks (used by streaming.IncrementalEncoderSession) --
    def make_partial(self, tbl: pa.Table, column: str,
                     weight_col: str | None = None):
        """Build this encoder's mergeable partial from one block.  Optional —
        implemented by stateful encoders."""
        raise NotImplementedError(f"{type(self).__name__} has no fit state")

    def load_accumulator(self, acc) -> "Encoder":
        """Install a merged accumulator as the fitted state."""
        raise NotImplementedError


class StandardScaler(Encoder):
    """(x − mean) / variance — reference parity incl. the variance quirk.

    fit: Chan-merge (mean, M2, count) partials (standard_scaler.rs:35-48);
    optional rounding of (mean, var) to 10^n damps update propagation
    (new_with_rounding, standard_scaler.rs:73-75,116-120).
    transform: ``(x − mean) / var`` (apply_scaling, standard_scaler.rs:109-113
    — divides by variance; golden ``(i−4.5)/8.25`` at :162).  Set
    ``reference_compat=False`` for the conventional ``/ std``.
    """

    def __init__(self, round_to: tuple[int, int] | None = None,
                 reference_compat: bool = True):
        self.round_to = round_to
        self.reference_compat = reference_compat
        self.acc_: MeanVarAgg | None = None
        self.mean_: float | None = None
        self.scale_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        return MeanVarAgg.from_numpy(_float_col(tbl, column), _weights(tbl, weight_col))

    def load_accumulator(self, acc: MeanVarAgg):
        self.acc_ = acc
        mean, var = acc.get(self.round_to)
        self.mean_ = mean
        self.scale_ = var if self.reference_compat else math.sqrt(var)
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(
            fit_partials(ds, [column], lambda t: self.make_partial(t, column, weight_col),
                         weight_col)
        )

    def transform_table(self, tbl, column, out):
        if self.mean_ is None:
            raise RuntimeError("called transform before fit")
        x = _float_col(tbl, column)
        if self.scale_ == 0.0:
            # constant column: variance 0.  The Rust reference divides by it
            # anyway (apply_scaling, standard_scaler.rs:109-113 → ±inf/NaN);
            # we define the result as ±inf for x≠mean and NaN at the mean —
            # the IEEE outcome — but produce it explicitly so the hot path
            # never trips a RuntimeWarning.
            with np.errstate(divide="ignore", invalid="ignore"):
                y = (x - self.mean_) / self.scale_
            return tbl.append_column(out, pa.array(y))
        return tbl.append_column(out, pa.array((x - self.mean_) / self.scale_))


class MinMaxScaler(Encoder):
    """(x − min) / (max − min) — minmax_scaler.rs:129-166.

    fit keeps the full value→count map so retractions can expose the next
    extreme (minmax_scaler.rs:16-98); batch append-only fit still builds the
    same invertible accumulator so streaming reuses it unchanged.
    """

    def __init__(self):
        self.acc_: MinMaxAgg | None = None
        self.min_: float | None = None
        self.range_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        return MinMaxAgg.from_numpy(_float_col(tbl, column), _weights(tbl, weight_col))

    def load_accumulator(self, acc: MinMaxAgg):
        self.acc_ = acc
        self.min_, self.range_ = acc.get()
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(
            fit_partials(ds, [column], lambda t: self.make_partial(t, column, weight_col),
                         weight_col)
        )

    def transform_table(self, tbl, column, out):
        if self.min_ is None:
            raise RuntimeError("called transform before fit")
        x = _float_col(tbl, column)
        return tbl.append_column(out, pa.array((x - self.min_) / self.range_))


class KBinsDiscretizer(Encoder):
    """Uniform-width k-bins over the MinMax meta — kbins_discretizer.rs:10-47.

    ``bin = int((x − min)/range · k)`` with the ``x == max`` edge clamped to
    k−1 branchlessly in the reference (:42-43); here a vectorized minimum.
    NB the reference truncates toward zero (``as isize``), it does not floor —
    identical for in-range values, reproduced with ``np.trunc``.
    """

    def __init__(self, k: int):
        self.k = int(k)
        self.acc_: MinMaxAgg | None = None
        self.min_: float | None = None
        self.range_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        return MinMaxAgg.from_numpy(_float_col(tbl, column), _weights(tbl, weight_col))

    def load_accumulator(self, acc: MinMaxAgg):
        self.acc_ = acc
        self.min_, self.range_ = acc.get()
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(
            fit_partials(ds, [column], lambda t: self.make_partial(t, column, weight_col),
                         weight_col)
        )

    def transform_table(self, tbl, column, out):
        if self.min_ is None:
            raise RuntimeError("called transform before fit")
        x = _float_col(tbl, column)
        scaled = (x - self.min_) / self.range_
        bins = np.trunc(scaled * self.k)
        bins = np.minimum(bins, self.k - 1)
        return tbl.append_column(out, pa.array(bins))


class KBinsQuantileDiscretizer(Encoder):
    """sklearn-parity ``KBinsDiscretizer(strategy='quantile')``: equal-
    POPULATION bins.  Edges are the exact distributed order statistics at
    p = 1/k … (k−1)/k via ``exact_global_quantiles`` (histogram
    refinement — quantile_cont interpolation, no sort, no value
    co-location; O(blocks × bins) counts per round), and
    ``bin(x) = #{edges ≤ x}`` (numpy ``searchsorted(side='right')`` ==
    the SQL twin's count-of-edges-≤-x), so fit AND transform are exact
    at any cardinality and partitioning.

    Quantiles are holistic, not a mergeable monoid, so this encoder is
    batch-fit only — the streaming counterpart is the retractable
    quantile arrangement (``state/aggregates.py``), which maintains the
    same order statistics incrementally."""

    def __init__(self, k: int):
        self.k = int(k)
        self.edges_: np.ndarray | None = None

    def make_partial(self, tbl, column, weight_col=None):
        raise NotImplementedError(
            "quantile bins are holistic — batch fit() only; stream via "
            "the retractable quantile arrangement")

    def load_accumulator(self, acc):
        raise NotImplementedError("see make_partial")

    def fit(self, ds, column, weight_col=None):
        from .relational import exact_global_quantiles

        qs = tuple((i + 1) / self.k for i in range(self.k - 1))
        qd = exact_global_quantiles(ds, column, qs=qs)
        self.edges_ = np.array([qd[q] for q in qs], dtype=np.float64)
        return self

    def transform_table(self, tbl, column, out):
        if self.edges_ is None:
            raise RuntimeError("called transform before fit")
        x = _float_col(tbl, column)
        bins = np.searchsorted(self.edges_, x, side="right")
        return tbl.append_column(out, pa.array(bins.astype(np.float64)))


class _CategoricalFitMixin:
    """Shared distinct→slot fit for Ordinal/OneHot.

    Batch fit gathers per-block distinct sets (tiny partials) and assigns
    slots in **sorted value order** (deterministic at any parallelism; see
    PositionAssignmentAgg docstring for the documented divergence from Rust
    HashMap iteration order).  Streaming fit reuses the full
    PositionAssignmentAgg algebra with free-list/len policy
    (integer_assignment_aggregate.rs:43-99).
    """

    class _SetPartial:
        def __init__(self, values: set):
            self.values = values

        def copy(self):
            return type(self)(set(self.values))

        def merged(self, other):
            return type(self)(self.values | other.values)

    def make_partial(self, tbl, column, weight_col=None):
        col = tbl[column]
        w = _weights(tbl, weight_col)
        if w is None:
            return PositionAssignmentAgg.from_sorted_values(
                col.drop_null().unique().to_pylist()
            )
        vals = col.to_pylist()
        agg = PositionAssignmentAgg()
        # deterministic within-block order; cross-block merge is order-fixed
        # by merge_all's sorted-bytes ordering
        order = sorted(range(len(vals)), key=lambda i: (str(vals[i]), i))
        for i in order:
            agg.row_count += int(w[i])
            agg._add(vals[i], int(w[i]))
        return agg

    def _fit_map(self, ds, column, weight_col):
        max_categories = getattr(self, "max_categories", None)
        if max_categories is not None:
            if weight_col is not None:
                raise NotImplementedError(
                    "max_categories requires the batch (unweighted) fit")

            def val_counts(tbl: pa.Table) -> pa.Table:
                arr = tbl[column]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                vc = pc.value_counts(arr.drop_null())
                return pa.table({"v": vc.field("values"),
                                 "c": vc.field("counts").cast(pa.int64())})

            values = _capped_value_set(ds.select_columns([column]),
                                       val_counts, None, max_categories)
            return PositionAssignmentAgg.from_sorted_values(values)
        if weight_col is None:
            # distinct → sorted slot assignment (reference `distinct()` then
            # PositionAssignmentAggregate, one_hot_encoder.rs:22-28)
            def per_block(tbl: pa.Table) -> pa.Table:
                uniq = tbl[column].drop_null().unique()
                return pa.table({"v": uniq})

            uniq_ds = ds.select_columns([column]).map_batches(
                per_block, batch_format="pyarrow", batch_size=DEFAULT_FIT_BATCH
            )
            values = set()
            for batch in uniq_ds.iter_batches(batch_format="pyarrow"):
                values.update(batch["v"].to_pylist())
            acc = PositionAssignmentAgg.from_sorted_values(values)
        else:
            acc = fit_partials(ds, [column],
                               lambda t: self.make_partial(t, column, weight_col),
                               weight_col)
        return acc


class OrdinalEncoder(_CategoricalFitMixin, Encoder):
    """value → float(slot); unseen → −1.0 — ordinal_encoder.rs:9-53.

    transform = broadcast dict lookup (the reference's join/antijoin pair
    :34-52 collapses to one vectorized ``index_in`` with a −1 default).

    ``max_categories`` keeps only the most frequent values (count DESC,
    value ASC; computed distributed) — dropped values encode as unseen
    (−1).  Default None preserves reference semantics.
    """

    def __init__(self, max_categories: int | None = None):
        self.max_categories = max_categories
        self.acc_: PositionAssignmentAgg | None = None
        self.mapping_: dict | None = None
        # broadcast-friendly arrays, built lazily per process
        self._value_set: pa.Array | None = None
        self._slots: np.ndarray | None = None

    def load_accumulator(self, acc: PositionAssignmentAgg):
        self.acc_ = acc
        self.mapping_, _ = acc.get_map_and_len()
        self._value_set = None
        self._slots = None
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(self._fit_map(ds, column, weight_col))

    def _lookup_arrays(self):
        if self._value_set is None:
            items = sorted(self.mapping_.items(), key=lambda kv: str(kv[0]))
            self._value_set = pa.array([k for k, _ in items])
            self._slots = np.array([v for _, v in items], dtype=np.float64)
        return self._value_set, self._slots

    def transform_table(self, tbl, column, out):
        if self.mapping_ is None:
            raise RuntimeError("called transform before fit")
        value_set, slots = self._lookup_arrays()
        idx = pc.index_in(tbl[column], value_set)
        missing = idx.is_null().to_numpy(zero_copy_only=False)
        safe = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.where(missing, -1.0, slots[safe])
        return tbl.append_column(out, pa.array(codes))


class OneHotEncoder(_CategoricalFitMixin, Encoder):
    """value → one-hot list<float64> of over-provisioned length
    — one_hot_encoder.rs:10-61.

    Unseen values get the all-zero vector of the current length (the
    antijoin branch :50-57).  Vector length follows the ×1.5 growth /
    0.66-compress policy via PositionAssignmentAgg.

    ``max_categories`` keeps only the most frequent values (count DESC,
    value ASC; computed distributed) — dropped values get the all-zero
    vector like any unseen value.  Default None preserves reference
    semantics.
    """

    def __init__(self, max_categories: int | None = None):
        self.max_categories = max_categories
        self.acc_: PositionAssignmentAgg | None = None
        self.mapping_: dict | None = None
        self.len_: int | None = None
        self._value_set = None
        self._slots = None

    def load_accumulator(self, acc: PositionAssignmentAgg):
        self.acc_ = acc
        self.mapping_, self.len_ = acc.get_map_and_len()
        self._value_set = None
        self._slots = None
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(self._fit_map(ds, column, weight_col))

    def _lookup_arrays(self):
        if self._value_set is None:
            items = sorted(self.mapping_.items(), key=lambda kv: str(kv[0]))
            self._value_set = pa.array([k for k, _ in items])
            self._slots = np.array([v for _, v in items], dtype=np.int64)
        return self._value_set, self._slots

    def transform_table(self, tbl, column, out):
        if self.mapping_ is None:
            raise RuntimeError("called transform before fit")
        value_set, slots = self._lookup_arrays()
        idx = pc.index_in(tbl[column], value_set)
        missing = idx.is_null().to_numpy(zero_copy_only=False)
        idx_np = np.where(missing, 0, idx.fill_null(0).to_numpy(zero_copy_only=False)).astype(np.int64)
        n = len(tbl)
        dense = np.zeros((n, self.len_), dtype=np.float64)
        rows = np.nonzero(~missing)[0]
        dense[rows, slots[idx_np[rows]]] = 1.0
        return tbl.append_column(out, list_array_from_2d(dense))


def _capped_value_set(ds, per_block_counts, min_count: int | None,
                      max_values: int | None, buckets: int = 32) -> set:
    """Distributed value-frequency pruning for vocabulary-style fits.

    ``per_block_counts(tbl) -> pa.Table(v, c)`` emits each block's value
    counts (pre-aggregated — a hot value is one row per block).  One
    ``groupby(hash(v) % buckets)`` shuffle gives exact global counts; each
    bucket filters ``c >= min_count`` and keeps its top ``max_values`` by
    (count DESC, value ASC) — safe because a value aggregates entirely
    inside one bucket, so the global top-k is a subset of the per-bucket
    top-k union.  The driver merges ≤ buckets × max_values rows (or all
    values ≥ min_count when no cap) instead of the full value domain —
    the VERDICT r2 "open-vocabulary cap" fix; reference semantics
    (unbounded, count_vectorizer.rs:25-38) remain the default upstream.
    """
    import pandas as pd

    from ..functions.hashing import fast_hash64_array

    def tag(tbl: pa.Table) -> pa.Table:
        part = per_block_counts(tbl)
        h = fast_hash64_array(part["v"].cast(pa.string()))
        return part.append_column(
            "__b", pa.array((h % np.uint64(buckets)).astype(np.int64)))

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("v", as_index=False)["c"].sum()
        if min_count is not None:
            g = g[g["c"] >= min_count]
        if max_values is not None:
            g = (g.sort_values(["c", "v"], ascending=[False, True],
                               kind="mergesort").head(max_values))
        return g[["v", "c"]]

    pdf = (ds.map_batches(tag, batch_format="pyarrow",
                          batch_size=DEFAULT_FIT_BATCH)
           .groupby("__b")
           .map_groups(reduce_group, batch_format="pandas")
           .to_pandas())
    if max_values is not None and len(pdf) > max_values:
        pdf = (pdf.sort_values(["c", "v"], ascending=[False, True],
                               kind="mergesort").head(max_values))
    return set(pdf["v"])


class CountVectorizer(Encoder):
    """Whitespace-tokenized bag-of-words over a global vocab
    — count_vectorizer.rs:12-70.

    fit: tokens → vocab {token → slot} + over-provisioned length via the
    position-assignment algebra (new_with_vec, :25-38).
    transform: per-row counts (or 0/1 with ``binary``); OOV tokens silently
    dropped (:62-64).

    ``min_df`` / ``max_features`` prune the vocabulary by exact document
    frequency (computed distributed, ties broken token-ascending like the
    count sort) — tokens outside the pruned vocab behave exactly like OOV.
    Defaults (None) preserve the reference's unbounded vocabulary.  Caps
    require the batch (unweighted) fit path.
    """

    def __init__(self, binary: bool = False, min_df: int | None = None,
                 max_features: int | None = None):
        self.binary = binary
        self.min_df = min_df
        self.max_features = max_features
        self.acc_: PositionAssignmentAgg | None = None
        self.vocab_: dict | None = None
        self.len_: int | None = None
        self._value_set = None
        self._slots = None

    def make_partial(self, tbl, column, weight_col=None):
        toks = tokenize_column(tbl[column])
        w = _weights(tbl, weight_col)
        if w is None:
            return PositionAssignmentAgg.from_sorted_values(
                set(toks.flatten().to_pylist())
            )
        agg = PositionAssignmentAgg()
        lists = toks.to_pylist()
        for i, row in enumerate(lists):
            agg.merge(PositionAssignmentAgg.of_tokens(row, int(w[i])))
        return agg

    def load_accumulator(self, acc: PositionAssignmentAgg):
        self.acc_ = acc
        self.vocab_, self.len_ = acc.get_map_and_len()
        self._value_set = None
        self._slots = None
        return self

    def _lookup_arrays(self):
        if self._value_set is None:
            items = sorted(self.vocab_.items())
            self._value_set = pa.array([k for k, _ in items], type=pa.string())
            self._slots = np.array([v for _, v in items], dtype=np.int64)
        return self._value_set, self._slots

    def fit(self, ds, column, weight_col=None):
        capped = self.min_df is not None or self.max_features is not None
        if capped and weight_col is not None:
            raise NotImplementedError(
                "min_df/max_features require the batch (unweighted) fit")
        if capped:
            def df_counts(tbl: pa.Table) -> pa.Table:
                import pandas as pd

                toks = tokenize_column(tbl[column])
                flat, row_ids = flatten_tokens(toks, np.arange(len(tbl)))
                if not len(flat):
                    return pa.table({"v": pa.array([], type=pa.string()),
                                     "c": pa.array([], type=pa.int64())})
                # document frequency: each token counts once per doc
                pdf = pd.DataFrame({"v": flat.to_pandas(), "r": row_ids})
                df = (pdf.drop_duplicates(["v", "r"])
                      .groupby("v", sort=False).size())
                return pa.table({"v": pa.array(df.index, type=pa.string()),
                                 "c": pa.array(df.to_numpy(dtype=np.int64))})

            vocab = _capped_value_set(ds.select_columns([column]), df_counts,
                                      self.min_df, self.max_features)
            return self.load_accumulator(
                PositionAssignmentAgg.from_sorted_values(vocab))
        if weight_col is None:
            def per_block(tbl: pa.Table) -> pa.Table:
                toks = tokenize_column(tbl[column])
                return pa.table({"v": toks.flatten().unique()})

            uniq_ds = ds.select_columns([column]).map_batches(
                per_block, batch_format="pyarrow", batch_size=DEFAULT_FIT_BATCH
            )
            vocab = set()
            for batch in uniq_ds.iter_batches(batch_format="pyarrow"):
                vocab.update(batch["v"].to_pylist())
            return self.load_accumulator(PositionAssignmentAgg.from_sorted_values(vocab))
        return self.load_accumulator(
            fit_partials(ds, [column], lambda t: self.make_partial(t, column, weight_col),
                         weight_col)
        )

    def transform_table(self, tbl, column, out):
        if self.vocab_ is None:
            raise RuntimeError("called transform before fit")
        toks = tokenize_column(tbl[column])
        flat, row_ids = flatten_tokens(toks, np.arange(len(tbl)))
        value_set, slots = self._lookup_arrays()
        idx = pc.index_in(flat, value_set)
        keep = ~idx.is_null().to_numpy(zero_copy_only=False)
        idx_np = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        dense = np.zeros((len(tbl), self.len_), dtype=np.float64)
        np.add.at(dense, (row_ids[keep], slots[idx_np[keep]]), 1.0)
        if self.binary:
            dense = (dense > 0).astype(np.float64)
        return tbl.append_column(out, list_array_from_2d(dense))


class TfidfTransformer(Encoder):
    """tf·idf over the output vector of a vectorizer — tfidf_transformer.rs:11-87.

    ``reference_compat=True`` reproduces the reference's inverted fit
    binarization (entry ≈0 → 1, :36-39): "df" counts docs where the term is
    *absent*.  ``False`` computes conventional document frequency.
    idf = ln(N / df); output 0 where tf == 0 or df == 0 (:74-81).
    """

    def __init__(self, round_to: int | None = None, reference_compat: bool = True):
        self.round_to = round_to
        self.reference_compat = reference_compat
        self.acc_: DocumentFrequencyAgg | None = None
        self.freq_: np.ndarray | None = None
        self.n_docs_: int | None = None

    def _binarize(self, dense: np.ndarray) -> np.ndarray:
        eps = 1e-10
        if self.reference_compat:
            return (np.abs(dense) < eps).astype(np.int64)
        return (np.abs(dense) >= eps).astype(np.int64)

    def make_partial(self, tbl, column, weight_col=None):
        dense = list_column_to_2d(tbl[column])
        binar = self._binarize(dense)
        w = _weights(tbl, weight_col)
        if w is None:
            freqs = binar.sum(axis=0)
            count = dense.shape[0]
        else:
            freqs = (binar * w[:, None]).sum(axis=0)
            count = int(w.sum())
        return DocumentFrequencyAgg(freqs, count, self.round_to)

    def load_accumulator(self, acc: DocumentFrequencyAgg):
        self.acc_ = acc
        self.freq_ = acc.get_frequencies()
        self.n_docs_ = acc.count
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(
            fit_partials(ds, [column], lambda t: self.make_partial(t, column, weight_col),
                         weight_col)
        )

    def transform_table(self, tbl, column, out):
        if self.freq_ is None:
            raise RuntimeError("called transform before fit")
        tf = list_column_to_2d(tbl[column])
        L = tf.shape[1] if tf.size else len(self.freq_)
        freq = self.freq_
        if len(freq) < L:
            freq = np.concatenate([freq, np.zeros(L - len(freq), dtype=np.int64)])
        freq = freq[:L].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            idf = np.log(self.n_docs_ / freq)
            # inf·0 inside the unselected branch is masked by the where
            tfidf = np.where((tf == 0.0) | (freq == 0.0)[None, :], 0.0,
                             tf * idf[None, :])
        return tbl.append_column(out, list_array_from_2d(tfidf))


class HashVectorizer(Encoder):
    """Feature hashing of whitespace tokens — hash_vectorizer.rs:10-49.

    Stateless (no fit).  The reference's unspecified Rust ``DefaultHasher``
    is replaced by the documented ``stable_hash60`` (MD5-60bit, reproducible
    in DuckDB) per SURVEY §7.5.

    ``stable=False`` swaps the MD5 loop for the vectorized codepoint
    polynomial (``poly_hash64_array``, numpy uint64 — no per-string Python)
    — the production path, which is ALSO exactly reproducible in DuckDB
    (``POLY_HASH_SQL``), so the fast bucket assignment is oracle-checkable
    per (doc, bucket) just like the MD5 path.  Buckets come from the high
    bits (``(h >> 32) % n_features``) per the hash's contract.
    """

    requires_fit = False

    def __init__(self, n_features: int, binary: bool = False,
                 stable: bool = True):
        self.n_features = int(n_features)
        self.binary = binary
        self.stable = stable

    def transform_table(self, tbl, column, out):
        toks = tokenize_column(tbl[column])
        flat, row_ids = flatten_tokens(toks, np.arange(len(tbl)))
        dense = np.zeros((len(tbl), self.n_features), dtype=np.float64)
        if len(flat):
            if self.stable:
                h = stable_hash60_array(flat.to_pylist())
                buckets = h % self.n_features
            else:
                from ..functions.hashing import poly_hash64_array

                h = poly_hash64_array(flat)
                buckets = ((h >> np.uint64(32))
                           % np.uint64(self.n_features)).astype(np.int64)
            np.add.at(dense, (row_ids, buckets), 1.0)
        if self.binary:
            dense = (dense > 0).astype(np.float64)
        return tbl.append_column(out, list_array_from_2d(dense))


class PolynomialFeaturesEncoder(Encoder):
    """Polynomial expansion — polynomial_features_encoder.rs:8-107.

    Scalar input: powers ``x^min..x^max`` (polynomials_1d, :76-84).
    Vector input: all degree-d monomials via combinations-with-replacement —
    the multi-feature path the reference scaffolds (:86-108) but never wires
    (its fit is commented out, :43-56); implemented here as intended.
    """

    requires_fit = False

    def __init__(self, min_degree: int = 1, max_degree: int = 2):
        self.min_degree = int(min_degree)
        self.max_degree = int(max_degree)

    @staticmethod
    def _combinations(n_features: int, min_degree: int, max_degree: int) -> list[tuple]:
        from itertools import combinations_with_replacement

        out: list[tuple] = []
        for degree in range(min_degree, max_degree + 1):
            out.extend(combinations_with_replacement(range(n_features), degree))
        return out

    def transform_table(self, tbl, column, out):
        col = tbl[column]
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            dense = list_column_to_2d(col)
            combos = self._combinations(dense.shape[1], self.min_degree, self.max_degree)
            cols = [np.prod(dense[:, list(c)], axis=1) if c else np.ones(len(tbl))
                    for c in combos]
            expanded = np.stack(cols, axis=1) if cols else np.zeros((len(tbl), 0))
        else:
            x = _float_col(tbl, column)
            degrees = np.arange(self.min_degree, self.max_degree + 1)
            expanded = x[:, None] ** degrees[None, :]
        return tbl.append_column(out, list_array_from_2d(expanded))


class Passthrough(Encoder):
    """Identity — passthrough.rs:7-25 (emits the value as float64)."""

    requires_fit = False

    def transform_table(self, tbl, column, out):
        return tbl.append_column(out, pa.array(_float_col(tbl, column)))


class FunctionEncoder(Encoder):
    """Arbitrary UDF, no fit — function_encoder.rs:8-32.

    Prefer ``batch_fn`` (vectorized: ndarray→ndarray or Array→Array); a
    scalar ``fn`` is supported for parity but runs a Python loop.
    """

    requires_fit = False

    def __init__(self, fn: Callable | None = None, batch_fn: Callable | None = None):
        if (fn is None) == (batch_fn is None):
            raise ValueError("provide exactly one of fn / batch_fn")
        self.fn = fn
        self.batch_fn = batch_fn

    def transform_table(self, tbl, column, out):
        col = tbl[column]
        if self.batch_fn is not None:
            res = self.batch_fn(col.to_numpy(zero_copy_only=False))
        else:
            res = [self.fn(v) for v in col.to_pylist()]
        arr = res if isinstance(res, (pa.Array, pa.ChunkedArray)) else pa.array(res)
        return tbl.append_column(out, arr)


def _weighted_quantile_cont(counts: dict, q: float) -> float:
    """quantile_cont over a value→count multiset (exact, interpolated)."""
    vals = np.array(sorted(v for v, c in counts.items() if c > 0))
    if not len(vals):
        raise ValueError("empty aggregate")
    cnts = np.array([counts[v] for v in vals], dtype=np.int64)
    n = int(cnts.sum())
    r = (n - 1) * q
    k0 = int(np.floor(r))
    k1 = min(k0 + 1, n - 1)
    cum = np.cumsum(cnts)
    v0 = float(vals[np.searchsorted(cum, k0 + 1)])
    v1 = float(vals[np.searchsorted(cum, k1 + 1)])
    return v0 + (r - k0) * (v1 - v0)


class MaxAbsScaler(Encoder):
    """x / max(|x|) — sklearn's ``MaxAbsScaler``, absent from the reference
    but the natural sibling of MinMaxScaler (minmax_scaler.rs:129-166); built
    on the same invertible value-count map, so retraction of the current
    extreme exposes the next one and streaming reuses it unchanged."""

    def __init__(self):
        self.acc_: MinMaxAgg | None = None
        self.maxabs_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        return MinMaxAgg.from_numpy(_float_col(tbl, column),
                                    _weights(tbl, weight_col))

    def load_accumulator(self, acc: MinMaxAgg):
        self.acc_ = acc
        mn, rng = acc.get()
        self.maxabs_ = max(abs(mn), abs(mn + rng)) or 1.0
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(fit_partials(
            ds, [column], lambda t: self.make_partial(t, column, weight_col),
            weight_col))

    def transform_table(self, tbl, column, out):
        if self.maxabs_ is None:
            raise RuntimeError("called transform before fit")
        return tbl.append_column(
            out, pa.array(_float_col(tbl, column) / self.maxabs_))


class RobustScaler(Encoder):
    """(x − median) / IQR — sklearn's ``RobustScaler``; exact
    ``quantile_cont`` quartiles derived from the SAME invertible value-count
    map MinMaxScaler keeps, so the fit is incremental AND retractable.  The
    map is O(distinct values): right for discrete/rounded columns (pair with
    ``round_to`` upstream for continuous data); the multi-pass
    ``exact_global_quantiles`` is the unbounded-cardinality batch path."""

    def __init__(self):
        self.acc_: MinMaxAgg | None = None
        self.center_: float | None = None
        self.scale_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        return MinMaxAgg.from_numpy(_float_col(tbl, column),
                                    _weights(tbl, weight_col))

    def load_accumulator(self, acc: MinMaxAgg):
        self.acc_ = acc
        self.center_ = _weighted_quantile_cont(acc.counts, 0.5)
        iqr = (_weighted_quantile_cont(acc.counts, 0.75)
               - _weighted_quantile_cont(acc.counts, 0.25))
        self.scale_ = iqr or 1.0
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(fit_partials(
            ds, [column], lambda t: self.make_partial(t, column, weight_col),
            weight_col))

    def transform_table(self, tbl, column, out):
        if self.center_ is None:
            raise RuntimeError("called transform before fit")
        x = _float_col(tbl, column)
        return tbl.append_column(
            out, pa.array((x - self.center_) / self.scale_))


class Binarizer(Encoder):
    """x > threshold → 1.0 else 0.0 — sklearn's ``Binarizer``; stateless."""

    requires_fit = False

    def __init__(self, threshold: float = 0.0):
        self.threshold = float(threshold)

    def transform_table(self, tbl, column, out):
        x = _float_col(tbl, column)
        return tbl.append_column(
            out, pa.array((x > self.threshold).astype(np.float64)))


class SimpleImputer(Encoder):
    """null → fitted mean of the non-null values — sklearn's
    ``SimpleImputer(strategy='mean')``.  The fit is a nan-aware
    ``SumCountAgg`` (invertible: retractions adjust sum and count), so the
    imputation constant updates incrementally like every other encoder."""

    def __init__(self):
        self.acc_: SumCountAgg | None = None
        self.mean_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        v = _float_col(tbl, column)
        w = _weights(tbl, weight_col)
        ok = ~np.isnan(v)
        return SumCountAgg.from_numpy(v[ok], None if w is None else w[ok])

    def load_accumulator(self, acc: SumCountAgg):
        self.acc_ = acc
        self.mean_ = acc.s / acc.count if acc.count else 0.0
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(fit_partials(
            ds, [column], lambda t: self.make_partial(t, column, weight_col),
            weight_col))

    def transform_table(self, tbl, column, out):
        if self.mean_ is None:
            raise RuntimeError("called transform before fit")
        x = _float_col(tbl, column)
        return tbl.append_column(
            out, pa.array(np.where(np.isnan(x), self.mean_, x)))


class TargetEncoder(Encoder):
    """Category → fitted mean of a numeric target (sklearn's
    ``TargetEncoder`` / mean encoding, the workhorse categorical encoder
    for tree models).  The fit is a per-category invertible (sum, count)
    map (``CategoryMeanAgg``) — O(categories) state, incremental AND
    retraction-safe like every other encoder here.  Unseen categories at
    transform time read the fitted GLOBAL mean (sklearn's behavior)."""

    def __init__(self, target_col: str):
        self.target_col = target_col
        self.acc_: CategoryMeanAgg | None = None
        self.means_: dict | None = None
        self.global_mean_: float | None = None

    def make_partial(self, tbl, column, weight_col=None):
        cats = tbl[column].to_pylist()
        vals = _float_col(tbl, self.target_col)
        return CategoryMeanAgg.from_numpy(cats, vals,
                                          _weights(tbl, weight_col))

    def load_accumulator(self, acc: CategoryMeanAgg):
        self.acc_ = acc
        self.means_, self.global_mean_ = acc.means()
        return self

    def fit(self, ds, column, weight_col=None):
        return self.load_accumulator(fit_partials(
            ds, [column, self.target_col],
            lambda t: self.make_partial(t, column, weight_col), weight_col))

    def transform_table(self, tbl, column, out):
        if self.means_ is None:
            raise RuntimeError("called transform before fit")
        import pandas as pd

        enc = (pd.Series(tbl[column].to_pandas())
               .map(self.means_).fillna(self.global_mean_)
               .to_numpy(dtype=np.float64))
        return tbl.append_column(out, pa.array(enc))


def target_encode_loo(ds, cat_col: str, target_col: str,
                      enc: "TargetEncoder", out: str = "enc_loo"):
    """Leave-one-out variant of ``TargetEncoder.transform`` for TRAIN rows:
    each row's own target is excluded from its category mean
    ((sum − y)/(n − 1)), the standard leakage guard; singleton categories
    and unseen values fall back to the fitted global mean.  Stateless
    vectorized map_batches over the broadcast fitted state."""
    if enc.acc_ is None:
        raise RuntimeError("fit the TargetEncoder first")
    sums = {k: s for k, (s, c) in enc.acc_.m.items() if c > 0}
    cnts = {k: c for k, (s, c) in enc.acc_.m.items() if c > 0}
    gmean = enc.global_mean_

    def loo(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        cat = pd.Series(tbl[cat_col].to_pandas())
        y = _float_col(tbl, target_col)
        s = cat.map(sums).to_numpy(dtype=np.float64)
        n = cat.map(cnts).to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            val = (s - y) / (n - 1.0)
        val = np.where(np.isnan(s) | (n <= 1.0), gmean, val)
        return tbl.append_column(out, pa.array(val))

    return ds.map_batches(loo, batch_format="pyarrow")
