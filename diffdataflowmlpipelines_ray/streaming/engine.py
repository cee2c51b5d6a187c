"""Micro-batch streaming engine: epochs, watermarks, windows, exactly-once.

The driver loop IS the frontier (SURVEY §3 "Ray mapping of the lifecycle"):
the reference's ``InputSession.advance_to/flush`` + ``probe.less_than``
(src/main.rs:82-86) becomes

    for epoch, inputs in source:
        session.process_epoch(epoch, inputs, watermark=...)

where an epoch is complete exactly when its emissions are committed to the
sink manifest.  Late data (impossible in the reference, which closes epochs
by construction — SURVEY §2.1) is handled by watermarks + allowed lateness:
rows for already-finalized windows are counted and dropped.

Data path per epoch:
1. partial stage — vectorized per-block accumulators keyed by
   (key…, window) (``map_batches`` when the input is a Dataset; direct when
   it is a small Arrow table);
2. the driver merges the tiny per-block partials deterministically and
   scatters per-shard deltas to the ``ShardedStateStore`` actors
   (idempotent per epoch);
3. watermark advance sweeps closed windows/sessions out of the shards;
4. emissions are committed to the op's ``ExactlyOnceParquetSink`` under the
   epoch id; a checkpoint (state dump + watermark) is taken every
   ``checkpoint_every`` epochs → kill/resume replays only uncommitted work.
"""

from __future__ import annotations

import json
import logging
import math
import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..state.aggregates import SumCountAgg
from .sink import CheckpointManager, ExactlyOnceParquetSink
from .state_store import ShardedStateStore, rescale_blobs, shard_of

__all__ = [
    "WindowSpec",
    "KeyedAggregation",
    "SessionWindowAggregation",
    "PatternMatch",
    "AbsenceDetect",
    "IncrementalComponents",
    "IncrementalPageRank",
    "IncrementalReachability",
    "StreamNearDup",
    "UpsertToRetract",
    "Scd2History",
    "StreamJoin",
    "AsofStreamJoin",
    "EnrichJoin",
    "BroadcastEnrich",
    "StreamDedup",
    "StreamSession",
]


def _key_bytes(key_tuple: tuple) -> bytes:
    return pickle.dumps(key_tuple, protocol=pickle.HIGHEST_PROTOCOL)


def _lww_partials(tbl: pa.Table, key_cols: Sequence[str],
                  val_cols: Sequence[str], ts_col: str,
                  delete_col: str | None) -> dict:
    """Per-block LWW offers: fold an upsert slice into ``{key_bytes:
    LastValueAgg}`` — one register per key, per-key MAX ``(ts, tiebreak)``
    stamp, delete rows as tombstones (value None, stamp kept).  Shared by
    ``EnrichJoin`` (dim side) and ``UpsertToRetract``; the semilattice merge
    makes block/shard/retry order irrelevant."""
    from ..state.aggregates import LastValueAgg

    key_cols = list(key_cols)
    cols = list(dict.fromkeys(
        key_cols + list(val_cols) + [ts_col]
        + ([delete_col] if delete_col else [])))
    pdf = tbl.select(cols).to_pandas()
    ts = _ts_to_float(pdf[ts_col])
    keys = list(zip(*[pdf[c] for c in key_cols])) if len(pdf) else []
    # val_cols=() is an existence register (semi-join style): zip(*[])
    # would silently truncate EVERY upsert/tombstone to zero rows
    vals = ([()] * len(pdf) if not val_cols
            else list(zip(*[pdf[c] for c in val_cols]))
            if len(pdf) else [])
    dels = (pdf[delete_col].to_numpy(dtype=bool)
            if delete_col else np.zeros(len(pdf), dtype=bool))
    out: dict[bytes, Any] = {}
    for k, t, v, d in zip(keys, ts, vals, dels):
        if d:
            v = None  # tombstone: keeps the stamp, reads as a miss
        # tiebreak on pickled value bytes: totally ordered for any value
        # types (incl. None/mixed), deterministic at equal stamps
        acc = LastValueAgg((float(t), _key_bytes(v)), v)
        kb = _key_bytes(tuple(k))
        cur = out.get(kb)
        if cur is None:
            out[kb] = acc
        else:
            cur.merge(acc)
    return out


def _ts_to_float(series: pd.Series) -> np.ndarray:
    """Event-time column → float seconds (timestamps are UTC-naive; DuckDB's
    ``epoch()`` matches this conversion exactly)."""
    if np.issubdtype(series.dtype, np.datetime64):
        return series.to_numpy(dtype="datetime64[us]").astype(np.int64) / 1e6
    return series.to_numpy(dtype=np.float64)


@dataclass(frozen=True)
class WindowSpec:
    """Tumbling / sliding / session windows over an event-time column.

    Window starts are aligned to multiples of ``slide`` (== ``size`` for
    tumbling) from epoch 0 — the same bucketing DuckDB's
    ``floor(epoch(ts)/size)`` produces, which keeps the SQL oracle exact.
    """

    kind: str  # "tumbling" | "sliding" | "session"
    size: float | None = None
    slide: float | None = None
    gap: float | None = None
    allowed_lateness: float = 0.0

    @staticmethod
    def tumbling(size: float, allowed_lateness: float = 0.0) -> "WindowSpec":
        return WindowSpec("tumbling", size=float(size), slide=float(size),
                          allowed_lateness=allowed_lateness)

    @staticmethod
    def sliding(size: float, slide: float, allowed_lateness: float = 0.0) -> "WindowSpec":
        return WindowSpec("sliding", size=float(size), slide=float(slide),
                          allowed_lateness=allowed_lateness)

    @staticmethod
    def session(gap: float, allowed_lateness: float = 0.0) -> "WindowSpec":
        return WindowSpec("session", gap=float(gap), allowed_lateness=allowed_lateness)

    @property
    def use_panes(self) -> bool:
        """Sliding windows whose slide divides the size keep ONE tumbling
        pane accumulator per (key, slide-bucket) instead of size/slide
        replicated per-window entries; panes merge at emission.  State and
        shuffle shrink by the overlap factor (hourly panes of a daily
        window: 24×) with identical emissions."""
        return (self.kind == "sliding" and self.slide < self.size
                and self.size % self.slide == 0)

    def assign_panes(self, ts: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """ts → (row_index, pane_start, pane_end) — one pane per row."""
        start = np.floor(ts / self.slide) * self.slide
        return np.arange(ts.size), start, start + self.slide

    def assign(self, ts: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """ts → (row_index, window_start, window_end); sliding replicates rows."""
        if self.kind == "tumbling":
            start = np.floor(ts / self.size) * self.size
            return np.arange(ts.size), start, start + self.size
        if self.kind == "sliding":
            n_windows = int(math.ceil(self.size / self.slide))
            idx_parts, start_parts = [], []
            base = np.floor(ts / self.slide)
            for j in range(n_windows):
                s = (base - j) * self.slide
                mask = ts < s + self.size  # s <= ts holds by construction
                idx_parts.append(np.nonzero(mask)[0])
                start_parts.append(s[mask])
            idx = np.concatenate(idx_parts)
            start = np.concatenate(start_parts)
            return idx, start, start + self.size
        raise ValueError("session windows are assigned in the state store")


_AGG_FIELDS = ("count", "sum", "mean", "min", "max")


@dataclass
class KeyedAggregation:
    """Incremental grouped aggregate, optionally windowed.

    The DD pattern ``threshold(monoid) → count()`` (standard_scaler.rs:81-86)
    generalized to per-key state: accumulators are ``SumCountAgg`` (or a
    custom monoid via ``make_acc``/``finalize``), merged in the state shards.
    Retractions: pass ``weight_col`` with −1 diffs.
    """

    name: str
    input: str
    key_cols: Sequence[str]
    value_col: str | None = None
    aggs: Sequence[str] = ("count", "sum")
    ts_col: str | None = None
    window: WindowSpec | None = None
    weight_col: str | None = None
    make_acc: Callable | None = None  # custom: (values, weights) -> acc
    finalize: Callable | None = None  # custom: acc -> dict[str, scalar]
    #: unwindowed only: emit the aggregate's OWN ±1 changelog each epoch —
    #: for every key the epoch touched whose finalized value changed,
    #: ``(−1, key, old_aggs)`` + ``(+1, key, new_aggs)`` rows go to the
    #: op's sink (pure insert/retraction when the key appears/reaches the
    #: monoid identity).  The running sum is the current grouped-aggregate
    #: table, so the output chains into further differential ops
    #: (``weight_col="diff"`` downstream) — DD's arrangement-as-output.
    emit_changelog: bool = False
    #: DD's ``threshold`` operator (``distinct`` = ``lambda m: int(m > 0)``):
    #: the output is the SET-like collection where each key's multiplicity
    #: is ``threshold_fn(net input count)``.  The changelog emits one row
    #: per touched key with ``diff = f(new_count) − f(old_count)`` when
    #: nonzero — so for distinct, +1 only when a key first becomes live and
    #: −1 only when its last copy retracts; interior count churn (2→1)
    #: emits NOTHING.  Requires ``emit_changelog=True``, no window, no
    #: value_col, ``aggs=()`` (output schema = keys + diff + epoch); the
    #: callable must be deterministic with ``f(0) == 0`` and picklable
    #: (it ships to the shard-group workers on Dataset epochs).
    threshold_fn: Callable[[int], int] | None = None
    #: tumbling/sliding windows: besides the exactly-once emission when the
    #: watermark closes a window, emit a PER-EPOCH changelog of the still-
    #: open windows into the ``<name>__early`` side sink — Beam's
    #: accumulating-with-retractions early firing, DD-style: each touched
    #: (key, window) retracts its previous partial aggregate (−1) and adds
    #: the new one (+1), so a consumer's running sum is always the current
    #: speculative result.  The final on-close emission is unchanged.
    #: Sliding windows give up the pane optimization here: speculation
    #: needs one accumulator PER OPEN WINDOW (a row lands in size/slide
    #: windows), so state/traffic grow by the overlap factor — the
    #: documented price of per-epoch speculative results.
    early_firing: bool = False
    #: route late rows to a ``<name>__late`` side sink instead of silently
    #: dropping them (Flink's side-output pattern): a row whose NEWEST
    #: containing window is already finalized (end + allowed_lateness ≤
    #: watermark) is written — with its full original columns — into its
    #: own exactly-once sink, one commit per epoch, so a downstream
    #: backfill/repair job can reprocess exactly what the windows missed.
    #: Table epochs split on the driver; Dataset epochs split per block
    #: with worker-written parts (only manifest entries reach the driver).
    late_output: bool = False

    def __post_init__(self):
        bad = set(self.aggs) - set(_AGG_FIELDS)
        if bad and self.finalize is None:
            raise ValueError(f"unknown aggs {bad}")
        if self.window and self.window.kind != "session" and self.ts_col is None:
            raise ValueError("windowed aggregation needs ts_col")
        if self.emit_changelog and self.window is not None:
            raise ValueError("emit_changelog requires window=None (windowed "
                             "aggregates already emit exactly once on close)")
        if self.early_firing:
            if self.window is None or self.window.kind not in (
                    "tumbling", "sliding"):
                raise ValueError("early_firing requires a tumbling or "
                                 "sliding window (sessions speculate via "
                                 "SessionWindowAggregation(early_firing))")
            if self.emit_changelog:
                raise ValueError("early_firing IS the windowed changelog; "
                                 "emit_changelog applies to unwindowed aggs")
        if self.late_output:
            if self.window is None or self.window.kind not in (
                    "tumbling", "sliding"):
                raise ValueError("late_output requires a tumbling or "
                                 "sliding window")
            if self.early_firing or self.emit_changelog:
                raise ValueError("late_output is not supported together "
                                 "with early_firing / emit_changelog")
        if self.threshold_fn is not None:
            if not self.emit_changelog or self.window is not None:
                raise ValueError("threshold_fn requires emit_changelog=True "
                                 "and window=None")
            if self.value_col or tuple(self.aggs) or self.make_acc:
                raise ValueError("threshold_fn folds multiplicities only: "
                                 "no value_col / aggs / make_acc")
            if self.threshold_fn(0) != 0:
                raise ValueError("threshold_fn(0) must be 0 (absent keys "
                                 "have multiplicity 0)")
        self._track_extremes = bool({"min", "max"} & set(self.aggs))

    # ------------------------------------------------------------ late split
    def split_late(self, tbl: pa.Table,
                   finalized_before: float) -> tuple[pa.Table, pa.Table]:
        """Row-level (on_time, late) split for ``late_output`` routing.

        A row is LATE when even its NEWEST containing window is already
        finalized — the same rule ``partial_batch`` drops by, applied at
        row granularity so the late rows keep their full original columns
        for the side sink.  A sliding-window row that still lands in ≥1
        open window is ON TIME here; ``partial_batch`` then drops it from
        its closed windows only (unchanged semantics)."""
        ts = _ts_to_float(tbl.select([self.ts_col]).to_pandas()[self.ts_col])
        w = self.window
        if w.kind == "tumbling":
            newest_end = np.floor(ts / w.size) * w.size + w.size
        else:  # sliding
            newest_end = np.floor(ts / w.slide) * w.slide + w.size
        keep = newest_end + w.allowed_lateness > finalized_before
        mask = pa.array(keep)
        return tbl.filter(mask), tbl.filter(pc.invert(mask))

    # --------------------------------------------------------------- partials
    def partial_batch(self, tbl: pa.Table, finalized_before: float) -> tuple[dict, int]:
        """One block → {key_bytes: acc}; returns (partials, late_rows)."""
        cols = list(self.key_cols)
        if self.value_col:
            cols.append(self.value_col)
        if self.ts_col:
            cols.append(self.ts_col)
        if self.weight_col and self.weight_col in tbl.column_names:
            cols.append(self.weight_col)
        pdf = tbl.select(dict.fromkeys(cols)).to_pandas()
        values = (
            pdf[self.value_col].to_numpy(dtype=np.float64)
            if self.value_col
            else np.ones(len(pdf))
        )
        weights = (
            pdf[self.weight_col].to_numpy(dtype=np.int64)
            if self.weight_col and self.weight_col in pdf
            else None
        )
        late = 0
        if self.window is not None:
            ts = _ts_to_float(pdf[self.ts_col])
            if self.window.use_panes and not self.early_firing:
                idx, wstart, wend = self.window.assign_panes(ts)
                # a row is late when even its NEWEST containing window
                # (start = pane start) is already closed
                newest_end = wstart + self.window.size
                keep = (newest_end + self.window.allowed_lateness
                        > finalized_before)
            else:
                idx, wstart, wend = self.window.assign(ts)
                keep = wend + self.window.allowed_lateness > finalized_before
            late = int((~keep).sum())
            idx, wstart, wend = idx[keep], wstart[keep], wend[keep]
            frame = pdf.iloc[idx][list(self.key_cols)].assign(
                __ws=wstart, __we=wend
            )
            values = values[idx]
            weights = weights[idx] if weights is not None else None
            group_cols = list(self.key_cols) + ["__ws", "__we"]
        else:
            frame = pdf[list(self.key_cols)].copy()
            group_cols = list(self.key_cols)
        out: dict[bytes, Any] = {}
        if self.make_acc is None and not self._track_extremes:
            # vectorized fast path for plain sum/count (the common case,
            # incl. high-cardinality keys): one C-level groupby-agg, then a
            # light per-key constructor loop over the AGGREGATED rows
            w = weights if weights is not None else np.ones(len(frame), dtype=np.int64)
            frame = frame.assign(__wv=values * w, __w=w)
            agg = frame.groupby(group_cols, sort=True, dropna=False).agg(
                s=("__wv", "sum"), c=("__w", "sum")
            )
            for key, s, c in zip(agg.index, agg["s"].to_numpy(),
                                 agg["c"].to_numpy()):
                key_t = key if isinstance(key, tuple) else (key,)
                out[_key_bytes(key_t)] = SumCountAgg(float(s), int(c))
            return out, late
        frame["__pos"] = np.arange(len(frame))
        for key, grp in frame.groupby(group_cols, sort=True, dropna=False):
            key_t = key if isinstance(key, tuple) else (key,)
            pos = grp["__pos"].to_numpy()
            v = values[pos]
            w = weights[pos] if weights is not None else None
            if self.make_acc is not None:
                acc = self.make_acc(v, w)
            else:
                acc = SumCountAgg.from_numpy(v, w, track_extremes=self._track_extremes)
            out[_key_bytes(key_t)] = acc
        return out, late

    # --------------------------------------------------------------- finalize
    def _finalize_acc(self, acc) -> dict:
        if self.finalize is not None:
            return self.finalize(acc)
        out = {}
        for a in self.aggs:
            if a == "count":
                out["count"] = acc.count
            elif a == "sum":
                out["sum"] = acc.s
            elif a == "mean":
                out["mean"] = acc.mean
            elif a == "min":
                out["min"] = acc.min_max()[0]
            elif a == "max":
                out["max"] = acc.min_max()[1]
        return out

    def rows_to_table(self, items: list[tuple[bytes, Any]], epoch: int) -> pa.Table:
        recs = []
        for kb, acc in items:
            key = pickle.loads(kb)
            rec = dict(zip(list(self.key_cols) + ["window_start", "window_end"], key))
            rec.update(self._finalize_acc(acc))
            rec["epoch"] = epoch
            recs.append(rec)
        if not recs:
            names = list(self.key_cols)
            if self.window is not None:
                names += ["window_start", "window_end"]
            names += [a for a in self.aggs] + ["epoch"]
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)

    def changelog_to_table(self, pairs: list, epoch: int) -> pa.Table:
        """``(key_bytes, old_acc, new_acc)`` per touched key → ±1 delta rows
        (retraction of the old finalized aggregate before the addition of
        the new; keys whose finalized value did not change emit nothing).

        With ``threshold_fn`` the row is the key alone and the diff is
        ``f(new_count) − f(old_count)`` (skipped when 0) — DD threshold."""
        if self.threshold_fn is not None:
            recs = []
            f = self.threshold_fn
            for kb, old, new in pairs:
                d = (f(0 if new is None else int(new.count))
                     - f(0 if old is None else int(old.count)))
                if d == 0:
                    continue
                recs.append({**dict(zip(self.key_cols, pickle.loads(kb))),
                             "diff": d, "epoch": epoch})
            if not recs:
                return pa.table({n: pa.array([]) for n in
                                 list(self.key_cols) + ["diff", "epoch"]})
            return pa.Table.from_pylist(recs)
        key_names = list(self.key_cols)
        if self.window is not None:  # early firing: keys carry the window
            key_names += ["window_start", "window_end"]
        recs = []
        for kb, old, new in pairs:
            of = None if old is None else self._finalize_acc(old)
            nf = None if new is None else self._finalize_acc(new)
            if of == nf:
                continue
            base = dict(zip(key_names, pickle.loads(kb)))
            if of is not None:
                recs.append({**base, **of, "diff": -1, "epoch": epoch})
            if nf is not None:
                recs.append({**base, **nf, "diff": 1, "epoch": epoch})
        if not recs:
            names = key_names + [a for a in self.aggs] + ["diff", "epoch"]
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)


@dataclass
class SessionWindowAggregation:
    """Per-key session windows (gap-merged) with sum/count/min_ts/max_ts.

    Insert-only (see StateShard.apply_session_points); finalized when the
    watermark passes session end + allowed lateness.

    Late side output: unlike the fixed windows (where
    ``KeyedAggregation(late_output=True)`` is genuinely FINER than any
    watermark offset — window ends quantize), the session drop rule is
    exactly the fixed-offset test ``ts + gap + allowed_lateness ≤
    watermark``, so the session-level ``StreamSession.route_late(...,
    lateness=gap + allowed_lateness)`` reproduces the operator's late set
    BIT-EXACTLY — route there for a durable side sink (equivalence
    pytest-pinned in ``TestRouteLate``); no operator-level flag needed.
    """

    name: str
    input: str
    key_cols: Sequence[str]
    ts_col: str
    gap: float
    value_col: str | None = None
    allowed_lateness: float = 0.0
    #: retractable mode keeps the raw point multiset in the shards (a
    #: retraction can SPLIT a session); pair with ``weight_col`` diffs.
    retractable: bool = False
    weight_col: str | None = None
    #: early firing for MERGING windows (Beam's hardest case): besides the
    #: exactly-once emission when the watermark closes a session, each
    #: epoch emits a ±1 changelog of the OPEN sessions the epoch touched
    #: into the ``<name>__early`` side sink — a gap-bridging arrival
    #: retracts BOTH prior partial sessions and adds the merged one; in
    #: retractable mode a deleted bridge point retracts the joined session
    #: and adds the two halves.  The close sweep additionally retracts each
    #: finally-emitted session from the early stream, so main sink + early
    #: stream running sums always form ONE consistent sessionization.
    early_firing: bool = False

    def points_batch(self, tbl: pa.Table, finalized_before: float) -> tuple[dict, int]:
        """→ ({key: [(ts, value)…]}, late) — or (ts, value, diff) triples in
        retractable mode."""
        cols = list(self.key_cols) + [self.ts_col] + (
            [self.value_col] if self.value_col else []
        )
        if self.retractable and self.weight_col and self.weight_col in tbl.column_names:
            cols.append(self.weight_col)
        pdf = tbl.select(dict.fromkeys(cols)).to_pandas()
        ts = _ts_to_float(pdf[self.ts_col])
        vals = (
            pdf[self.value_col].to_numpy(dtype=np.float64)
            if self.value_col
            else np.ones(len(pdf))
        )
        diffs = (
            pdf[self.weight_col].to_numpy(dtype=np.int64)
            if self.retractable and self.weight_col and self.weight_col in pdf
            else np.ones(len(pdf), dtype=np.int64)
        )
        keep = ts + self.gap + self.allowed_lateness > finalized_before
        late = int((~keep).sum())
        pdf = pdf[keep]
        ts, vals, diffs = ts[keep], vals[keep], diffs[keep]
        out: dict[bytes, list] = {}
        frame = pdf[list(self.key_cols)].copy()
        frame["__pos"] = np.arange(len(frame))
        for key, grp in frame.groupby(list(self.key_cols), sort=True, dropna=False):
            key_t = key if isinstance(key, tuple) else (key,)
            pos = grp["__pos"].to_numpy()
            if self.retractable:
                out[_key_bytes(key_t)] = list(
                    zip(ts[pos].tolist(), vals[pos].tolist(), diffs[pos].tolist())
                )
            else:
                out[_key_bytes(key_t)] = list(zip(ts[pos].tolist(), vals[pos].tolist()))
        return out, late

    def rows_to_table(self, items: list, epoch: int) -> pa.Table:
        recs = []
        for kb, sess in items:
            key = pickle.loads(kb)
            s, c, mn_ts, mx_ts = sess[2]
            rec = dict(zip(self.key_cols, key))
            rec.update(
                {
                    "session_start": sess[0],
                    "session_end": sess[1],
                    "sum": s,
                    "count": c,
                    "first_ts": mn_ts,
                    "last_ts": mx_ts,
                    "epoch": epoch,
                }
            )
            recs.append(rec)
        if not recs:
            names = list(self.key_cols) + [
                "session_start", "session_end", "sum", "count", "first_ts",
                "last_ts", "epoch",
            ]
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)

    def early_rows_to_table(self, items: list, epoch: int) -> pa.Table:
        """(key_bytes, ±1, session tuple) rows → the early-changelog table
        (same columns as the final emission, plus ``diff``)."""
        recs = []
        for kb, diff, sess in items:
            key = pickle.loads(kb)
            s, c, mn_ts, mx_ts = sess[2]
            rec = {"diff": int(diff)}
            rec.update(dict(zip(self.key_cols, key)))
            rec.update(
                {
                    "session_start": sess[0],
                    "session_end": sess[1],
                    "sum": s,
                    "count": c,
                    "first_ts": mn_ts,
                    "last_ts": mx_ts,
                    "epoch": epoch,
                }
            )
            recs.append(rec)
        if not recs:
            names = ["diff"] + list(self.key_cols) + [
                "session_start", "session_end", "sum", "count", "first_ts",
                "last_ts", "epoch",
            ]
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)


@dataclass
class PatternMatch:
    """CEP sequence detection: per-key ordered event-type chains.

    A match is a strictly-increasing-event-time chain whose types equal
    ``pattern`` and whose span fits in ``within`` seconds of the first
    element — all-combinations semantics, the same multiset a relational
    self-join produces (the SQL oracle).  Matches are emitted when the
    watermark passes ``start + within`` (+ allowed lateness): no future
    event can extend a finalized start, so emission is exactly-once and
    swept events are dropped from shard state (retention = ``within``).
    The reference has no CEP surface at all; this extends the north rule's
    "structured-streaming / CEP engine" beyond windows + joins.
    """

    name: str
    input: str
    key_cols: Sequence[str]
    ts_col: str
    type_col: str
    pattern: Sequence[str]
    within: float
    allowed_lateness: float = 0.0

    def __post_init__(self):
        if not self.pattern:
            raise ValueError("pattern must list at least one event type")
        if self.within <= 0:
            raise ValueError("within must be positive")

    def points_batch(self, tbl: pa.Table, finalized_before: float) -> tuple[dict, int]:
        """→ ({key: [(ts, type)…]}, late).  Events at or before the last
        finalize bound (watermark − within) can only serve already-emitted
        starts — dropped as late."""
        cols = list(self.key_cols) + [self.ts_col, self.type_col]
        pdf = tbl.select(dict.fromkeys(cols)).to_pandas()
        ts = _ts_to_float(pdf[self.ts_col])
        types = pdf[self.type_col].to_numpy()
        bound = finalized_before - self.within - self.allowed_lateness
        keep = ts > bound
        late = int((~keep).sum())
        pdf, ts, types = pdf[keep], ts[keep], types[keep]
        out: dict[bytes, list] = {}
        frame = pdf[list(self.key_cols)].copy()
        frame["__pos"] = np.arange(len(frame))
        for key, grp in frame.groupby(list(self.key_cols), sort=True, dropna=False):
            key_t = key if isinstance(key, tuple) else (key,)
            pos = grp["__pos"].to_numpy()
            out[_key_bytes(key_t)] = list(zip(ts[pos].tolist(),
                                              types[pos].tolist()))
        return out, late

    def rows_to_table(self, items: list, epoch: int) -> pa.Table:
        recs = []
        for kb, chain in items:
            key = pickle.loads(kb)
            rec = dict(zip(self.key_cols, key))
            for i, t in enumerate(chain):
                rec[f"ts_{i}"] = t
            rec["epoch"] = epoch
            recs.append(rec)
        if not recs:
            names = (list(self.key_cols)
                     + [f"ts_{i}" for i in range(len(self.pattern))]
                     + ["epoch"])
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)


@dataclass
class AbsenceDetect:
    """CEP negation: emit each ``first``-type event with NO ``absent``-type
    event on the same key within ``within`` seconds after it — timeout /
    non-occurrence detection ("click with no purchase inside the window",
    "heartbeat with no follow-up").

    Watermark-driven and exactly-once: a ``first`` event at ``t`` is
    finalizable only when the watermark passes ``t + within`` (no future
    ``absent`` event can still cancel it), at which point it either emits
    (no canceller in state) or is dropped, and state older than the bound
    is swept — retention = ``within``, the same contract as
    ``PatternMatch``.  Multiset semantics: ``k`` copies of an uncancelled
    ``first`` event emit ``k`` rows, exactly like the relational
    ``NOT EXISTS`` oracle.
    """

    name: str
    input: str
    key_cols: Sequence[str]
    ts_col: str
    type_col: str
    first: str            # the event type being watched
    absent: str           # the type whose ABSENCE within the window emits
    within: float
    allowed_lateness: float = 0.0

    def __post_init__(self):
        if self.within <= 0:
            raise ValueError("within must be positive")
        if self.first == self.absent:
            raise ValueError("first and absent must be distinct types")

    def points_batch(self, tbl: pa.Table, finalized_before: float
                     ) -> tuple[dict, int]:
        """→ ({key: [(ts, type)…]}, late) — only the two watched types are
        buffered; events at or before the finalize bound are late."""
        cols = list(self.key_cols) + [self.ts_col, self.type_col]
        pdf = tbl.select(dict.fromkeys(cols)).to_pandas()
        ts = _ts_to_float(pdf[self.ts_col])
        types = pdf[self.type_col].to_numpy()
        bound = finalized_before - self.within - self.allowed_lateness
        keep = (ts > bound) & ((types == self.first) | (types == self.absent))
        late = int(((ts <= bound) & ((types == self.first)
                                     | (types == self.absent))).sum())
        pdf, ts, types = pdf[keep], ts[keep], types[keep]
        out: dict[bytes, list] = {}
        frame = pdf[list(self.key_cols)].copy()
        frame["__pos"] = np.arange(len(frame))
        for key, grp in frame.groupby(list(self.key_cols), sort=True,
                                      dropna=False):
            key_t = key if isinstance(key, tuple) else (key,)
            pos = grp["__pos"].to_numpy()
            out[_key_bytes(key_t)] = list(zip(ts[pos].tolist(),
                                              types[pos].tolist()))
        return out, late

    def rows_to_table(self, items: list, epoch: int) -> pa.Table:
        recs = []
        for kb, ts in items:
            key = pickle.loads(kb)
            rec = dict(zip(self.key_cols, key))
            rec["ts"] = ts
            rec["epoch"] = epoch
            recs.append(rec)
        if not recs:
            names = list(self.key_cols) + ["ts", "epoch"]
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)


@dataclass
class KleenePattern:
    """CEP Kleene-plus sequence (``A B+ C``): per key, emit one match per
    (``first``, ``last``) event pair with ``first.ts < last.ts ≤ first.ts +
    within`` and AT LEAST ONE ``mid`` event strictly between them, carrying
    the aggregated middle count ``b_count`` — MATCH_RECOGNIZE's ``A B+ C``
    with one row per (A, C) pair and ``count(B)`` as the measure.
    Non-contiguous (other event types may interleave), multiset semantics
    (duplicate a/c events multiply rows; duplicate b events add to the
    count) — exactly the relational a⋈c join with an inner b-count, which
    is the SQL oracle.  The middle is AGGREGATED rather than exploded by
    design: all-subsets ``B+`` emits 2^|B|−1 rows per pair, which neither a
    streaming engine nor its SQL twin should materialize.

    Watermark-driven and exactly-once like ``PatternMatch``: a start
    finalizes when the watermark passes ``first.ts + within`` (no future
    event can extend it), swept events drop (retention = ``within``).
    Shares the pattern point state (``apply_pattern_points``), so Table and
    shard-direct Dataset epochs both work unchanged.
    """

    name: str
    input: str
    key_cols: Sequence[str]
    ts_col: str
    type_col: str
    first: str            # A
    mid: str              # B (one-or-more, aggregated)
    last: str             # C
    within: float
    allowed_lateness: float = 0.0

    def __post_init__(self):
        if self.within <= 0:
            raise ValueError("within must be positive")
        if len({self.first, self.mid, self.last}) != 3:
            raise ValueError("first/mid/last must be three distinct types")

    def points_batch(self, tbl: pa.Table, finalized_before: float
                     ) -> tuple[dict, int]:
        """→ ({key: [(ts, type)…]}, late) — only the three watched types
        are buffered; events at or before the finalize bound are late."""
        cols = list(self.key_cols) + [self.ts_col, self.type_col]
        pdf = tbl.select(dict.fromkeys(cols)).to_pandas()
        ts = _ts_to_float(pdf[self.ts_col])
        types = pdf[self.type_col].to_numpy()
        bound = finalized_before - self.within - self.allowed_lateness
        watched = ((types == self.first) | (types == self.mid)
                   | (types == self.last))
        keep = (ts > bound) & watched
        late = int(((ts <= bound) & watched).sum())
        pdf, ts, types = pdf[keep], ts[keep], types[keep]
        out: dict[bytes, list] = {}
        frame = pdf[list(self.key_cols)].copy()
        frame["__pos"] = np.arange(len(frame))
        for key, grp in frame.groupby(list(self.key_cols), sort=True,
                                      dropna=False):
            key_t = key if isinstance(key, tuple) else (key,)
            pos = grp["__pos"].to_numpy()
            out[_key_bytes(key_t)] = list(zip(ts[pos].tolist(),
                                              types[pos].tolist()))
        return out, late

    def rows_to_table(self, items: list, epoch: int) -> pa.Table:
        recs = []
        for kb, (a_ts, c_ts, nb) in items:
            key = pickle.loads(kb)
            rec = dict(zip(self.key_cols, key))
            rec["a_ts"] = a_ts
            rec["c_ts"] = c_ts
            rec["b_count"] = nb
            rec["epoch"] = epoch
            recs.append(rec)
        if not recs:
            names = list(self.key_cols) + ["a_ts", "c_ts", "b_count",
                                           "epoch"]
            return pa.table({n: pa.array([]) for n in names})
        return pa.Table.from_pylist(recs)


@dataclass
class IncrementalComponents:
    """Incremental connected components — the DD ``iterate`` primitive
    maintained ACROSS epochs instead of recomputed: each epoch's new edges
    update a union-find with min-id labels, and the op emits a consolidated
    multiset delta of ``(diff ±1, id, component)`` rows — the timestamped
    retraction stream whose running sum is the current component table
    (materialize with ``SUM(diff) GROUP BY id, component`` and keep net>0).

    State is ONE union-find in one designated shard (a connected component
    is global by nature): the candidate-bounded regime — verified dedup
    pairs, entity-resolution graphs — the same bound as the batch driver
    tier; unbounded raw-corpus graphs belong to the batch two-level
    ``connected_components_ds``.  Deterministic (sorted edge application)
    and replay-idempotent (epoch high-water mark + idempotent sink)."""

    name: str
    input: str
    lo_col: str = "id_lo"
    hi_col: str = "id_hi"

    def edges_from(self, tbl: pa.Table) -> list:
        lo = tbl[self.lo_col].to_numpy(zero_copy_only=False)
        hi = tbl[self.hi_col].to_numpy(zero_copy_only=False)
        return list(zip(lo.tolist(), hi.tolist()))

    def rows_to_table(self, deltas: list, epoch: int) -> pa.Table:
        if not deltas:
            return pa.table({
                "diff": pa.array([], type=pa.int64()),
                "id": pa.array([], type=pa.int64()),
                "component": pa.array([], type=pa.int64()),
                "epoch": pa.array([], type=pa.int64()),
            })
        d, n, c = zip(*deltas)
        k = len(deltas)
        return pa.table({
            "diff": pa.array(list(d), type=pa.int64()),
            "id": pa.array(list(n), type=pa.int64()),
            "component": pa.array(list(c), type=pa.int64()),
            "epoch": pa.array([epoch] * k, type=pa.int64()),
        })


@dataclass
class IncrementalPageRank:
    """Incremental PageRank — the ``iterate`` primitive maintained ACROSS
    epochs WITH retraction, the capability union-find components cannot
    offer (union is monotone; rank maintenance is not): the designated
    shard keeps the live directed edge multiset and the current ranks,
    each epoch applies ±``weight_col`` edge deltas (a −1 removes an edge
    copy — deletions are first-class) and warm-starts the power iteration
    from the previous ranks, so a small delta converges in a few sweeps
    instead of recomputing from scratch.  Emits the consolidated changelog
    ``(−1, id, old_rank)`` / ``(+1, id, new_rank)`` whose running sum IS
    the current rank table.  Same update rule as the batch ``pagerank``
    (stages/iterate.py) — converged ranks agree with a from-scratch
    fixpoint to ``tol``.  One logical graph in ONE shard: the
    candidate-bounded regime (entity graphs, verified dedup pairs), the
    same contract as ``IncrementalComponents``."""

    name: str
    input: str
    src_col: str = "src"
    dst_col: str = "dst"
    #: ±diff per edge row; None = insert-only stream
    weight_col: str | None = None
    damping: float = 0.85
    #: convergence bound on max |Δrank| per sweep; raises past max_iters
    tol: float = 1e-12
    max_iters: int = 500
    #: changelog suppression: silent when a node's rank moved ≤ this (the
    #: stored state keeps the emitted value, so running sum == state)
    emit_tol: float = 1e-9

    def edges_from(self, tbl: pa.Table) -> list:
        src = tbl[self.src_col].to_numpy(zero_copy_only=False)
        dst = tbl[self.dst_col].to_numpy(zero_copy_only=False)
        if self.weight_col and self.weight_col in tbl.column_names:
            d = tbl[self.weight_col].to_numpy(zero_copy_only=False)
        else:
            d = np.ones(len(src), dtype=np.int64)
        return list(zip(src.tolist(), dst.tolist(), d.tolist()))

    def rows_to_table(self, deltas: list, epoch: int) -> pa.Table:
        if not deltas:
            return pa.table({
                "diff": pa.array([], type=pa.int64()),
                "id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.float64()),
                "epoch": pa.array([], type=pa.int64()),
            })
        d, n, r = zip(*deltas)
        k = len(deltas)
        return pa.table({
            "diff": pa.array(list(d), type=pa.int64()),
            "id": pa.array(list(n), type=pa.int64()),
            "rank": pa.array(list(r), type=pa.float64()),
            "epoch": pa.array([epoch] * k, type=pa.int64()),
        })


@dataclass
class IncrementalReachability:
    """Incremental multi-source reachability — the semi-naive DD
    ``iterate`` on a DIRECTED graph, maintained across epochs WITH
    retraction: edge ±diff deltas stream in, the designated shard keeps
    the live edge multiset, and each epoch emits the consolidated SET
    delta ``(+1, id)`` / ``(−1, id)`` of nodes reachable from the static
    ``sources`` — the running sum is the current closure.  A deleted
    bridge retracts everything downstream of it (the classic DD
    reachability demo).  One logical graph in ONE shard: the
    candidate-bounded regime, same contract as ``IncrementalComponents``
    / ``IncrementalPageRank``."""

    name: str
    input: str
    sources: tuple = ()
    src_col: str = "src"
    dst_col: str = "dst"
    #: ±diff per edge row; None = insert-only stream
    weight_col: str | None = None

    def edges_from(self, tbl: pa.Table) -> list:
        src = tbl[self.src_col].to_numpy(zero_copy_only=False)
        dst = tbl[self.dst_col].to_numpy(zero_copy_only=False)
        if self.weight_col and self.weight_col in tbl.column_names:
            d = tbl[self.weight_col].to_numpy(zero_copy_only=False)
        else:
            d = np.ones(len(src), dtype=np.int64)
        return list(zip(src.tolist(), dst.tolist(), d.tolist()))

    def rows_to_table(self, deltas: list, epoch: int) -> pa.Table:
        if not deltas:
            return pa.table({
                "diff": pa.array([], type=pa.int64()),
                "id": pa.array([], type=pa.int64()),
                "epoch": pa.array([], type=pa.int64()),
            })
        d, n = zip(*deltas)
        k = len(deltas)
        return pa.table({
            "diff": pa.array(list(d), type=pa.int64()),
            "id": pa.array(list(n), type=pa.int64()),
            "epoch": pa.array([epoch] * k, type=pa.int64()),
        })


@dataclass
class StreamNearDup:
    """Streaming MinHash-LSH near-duplicate detection: per-block (and on
    Dataset epochs, fully distributed) signature + band derivation, with
    the band-bucket member registers hash-partitioned across the shards —
    horizontal state, like every keyed table.  A new doc joining a bucket
    is compared against the bucket's existing members (signature
    agreement = Jaccard estimate) and pairs estimated ≥ ``threshold``
    emit as candidate detections, incrementally, across epochs.  The
    output is a MULTISET (one pair can fire from several bands/shards/
    epochs) — chain ``StreamDedup`` on (id_lo, id_hi) in the SAME session
    for exactly-once distinct pairs.  ``bucket_cap`` star-caps hot
    boilerplate buckets (overflow docs still compare against members but
    can't be found by later arrivals; drops logged) — the batch LSH
    contract (stages/dedup.py).  State per doc = bands × signature bytes;
    event-time expiry is intentionally absent (near-dup is corpus-global);
    bound state by corpus, not time."""

    name: str
    input: str
    id_col: str = "doc_id"
    text_col: str = "text"
    num_perm: int = 64
    bands: int = 16
    shingle: int = 3
    threshold: float = 0.9
    bucket_cap: int = 64

    def _params(self):
        from ..stages.dedup import MinHashParams
        return MinHashParams(num_perm=self.num_perm, bands=self.bands,
                             shingle=self.shingle)

    def points_batch(self, tbl: pa.Table, finalized_before: float
                     ) -> tuple[dict, int]:
        """One block → {band_bucket_bytes: [(doc_id, sig_bytes)]}."""
        from ..stages.dedup import _P61, minhash_signatures

        params = self._params()
        sig_tbl = minhash_signatures(tbl, self.text_col, params,
                                     self.id_col)
        ids = sig_tbl[self.id_col].to_numpy(zero_copy_only=False)
        sig = np.asarray(
            sig_tbl["sig"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False),
            dtype=np.uint64).reshape(len(sig_tbl), -1)
        r = params.rows_per_band
        mix = (np.arange(1, r + 1, dtype=np.uint64)
               * np.uint64(0xC2B2AE3D27D4EB4F)) | 1
        sig_bytes = [row.tobytes() for row in sig]  # once per doc
        out: dict[bytes, list] = {}
        for bi in range(params.bands):
            chunk = sig[:, bi * r: (bi + 1) * r]
            bh = (chunk * mix[None, :]).sum(axis=1) % np.uint64(_P61)
            # group rows by band hash: one key / one list per BUCKET
            order = np.argsort(bh, kind="stable")
            sh = bh[order]
            cuts = np.concatenate(
                [[0], np.nonzero(sh[1:] != sh[:-1])[0] + 1, [len(sh)]])
            for s, e in zip(cuts[:-1], cuts[1:]):
                kb = _key_bytes((bi, int(sh[s])))
                out.setdefault(kb, []).extend(
                    (int(ids[j]), sig_bytes[j]) for j in order[s:e])
        return out, 0

    def rows_to_table(self, pairs: list, epoch: int) -> pa.Table:
        return pa.table({
            "id_lo": pa.array([p[0] for p in pairs], type=pa.int64()),
            "id_hi": pa.array([p[1] for p in pairs], type=pa.int64()),
            "est": pa.array([p[2] for p in pairs], type=pa.float64()),
            "epoch": pa.array([epoch] * len(pairs), type=pa.int64()),
        })


@dataclass
class UpsertToRetract:
    """Arrange + consolidate (the differential-dataflow changelog primitive):
    an UPSERT stream keyed by ``key`` — each row offers ``vals`` at LWW stamp
    ``(ts_col, tiebreak)``, delete rows (``delete_col``) are tombstones —
    becomes a consolidated RETRACTION changelog: per epoch, each key whose
    latest value changed emits ``(+1, key, new_vals)`` and, when a prior
    value existed, ``(−1, key, old_vals)``; a winning tombstone emits only
    the retraction; intra-epoch churn consolidates away (only the epoch's
    net per-key winner is offered); stale offers (older stamp than the
    register) emit nothing.  The changelog's running sum — ``SUM(diff)
    GROUP BY key, vals HAVING net > 0`` — IS the latest-value-per-key table,
    which is what downstream differential operators consume instead of
    rescanning the upsert history (reference parity: the upsert→retraction
    adapter every CDC ingest needs).

    State: per-key ``LastValueAgg`` registers hash-partitioned across ALL
    shards (unlike ``IncrementalComponents``' single global graph) —
    per-key state, so it scales horizontally; checkpointed with the shard
    snapshot and replay-idempotent via the epoch high-water mark.

    ``key_types`` / ``val_types`` are REQUIRED Arrow types: empty epochs and
    distributed per-shard parts must emit the same schema the sink saw
    before (type inference over an empty delta list cannot)."""

    name: str
    input: str
    key: Sequence[str]
    vals: Sequence[str]
    key_types: Sequence[Any]
    val_types: Sequence[Any]
    ts_col: str = "ts"
    delete_col: str | None = None

    def __post_init__(self):
        if len(self.key_types) != len(self.key):
            raise ValueError("key_types must match key")
        if len(self.val_types) != len(self.vals):
            raise ValueError("val_types must match vals")

    # same partial contract as KeyedAggregation/EnrichJoin: both the Table
    # and shard-direct Dataset paths fold blocks into per-key LWW offers
    def partial_batch(self, tbl: pa.Table, finalized_before: float
                      ) -> tuple[dict, int]:
        return _lww_partials(tbl, self.key, self.vals, self.ts_col,
                             self.delete_col), 0

    def state_to_table(self, items: list, epoch: int) -> pa.Table:
        """``collect()`` registers → the MATERIALIZED latest-per-key table
        (tombstones excluded) — equal to the changelog's running sum, read
        straight from shard state without replaying the sink (this is the
        ``state_table`` surface for this op)."""
        live = [(pickle.loads(kb), acc.value) for kb, acc in items
                if acc.value is not None]
        arrays: dict[str, pa.Array] = {}
        for i, (c, t) in enumerate(zip(self.key, self.key_types)):
            arrays[c] = pa.array([k[i] for k, _ in live], type=t)
        for i, (c, t) in enumerate(zip(self.vals, self.val_types)):
            arrays[c] = pa.array([v[i] for _, v in live], type=t)
        arrays["epoch"] = pa.array([epoch] * len(live), type=pa.int64())
        return pa.table(arrays)

    def rows_to_table(self, deltas: list, epoch: int) -> pa.Table:
        """``(diff, key_bytes, value_tuple)`` deltas → the changelog table
        ``(diff, *key, *vals, epoch)`` with pinned types."""
        keys = [pickle.loads(kb) for _, kb, _ in deltas]
        arrays: dict[str, pa.Array] = {
            "diff": pa.array([d for d, _, _ in deltas], type=pa.int64())}
        for i, (c, t) in enumerate(zip(self.key, self.key_types)):
            arrays[c] = pa.array([k[i] for k in keys], type=t)
        for i, (c, t) in enumerate(zip(self.vals, self.val_types)):
            arrays[c] = pa.array([v[i] for _, _, v in deltas], type=t)
        arrays["epoch"] = pa.array([epoch] * len(deltas), type=pa.int64())
        return pa.table(arrays)


@dataclass
class Scd2History(UpsertToRetract):
    """Incrementally-maintained type-2 slowly-changing dimension — the
    lakehouse SCD2 MERGE as a differential operator.  Same upsert-stream
    input and LWW partial contract as ``UpsertToRetract`` (per-epoch
    per-key winner, stale offers shadowed), but the changelog maintains
    the VERSION-HISTORY table: each value change closes the key's open
    version (retract ``(v_old, from, OPEN)``, add ``(v_old, from, t)``)
    and opens ``(v_new, t, OPEN, version+1)``; a tombstone only closes;
    a same-value re-upsert emits nothing.  ``valid_to`` uses the −1.0
    OPEN sentinel (the ``scd2_build`` convention).  Per-key shard state
    is O(1) — ``[stamp, open_value, open_from, version]`` — because
    closed versions are immutable; the history itself lives only in the
    exactly-once sink, whose running sum IS the SCD2 table.  Batch twin:
    ``q_scd2_build``; SQL twin: per-epoch winners deduped on consecutive
    equal values with window functions."""

    def rows_to_table(self, deltas: list, epoch: int) -> pa.Table:
        keys = [pickle.loads(kb) for _, kb, _ in deltas]
        arrays: dict[str, pa.Array] = {
            "diff": pa.array([d for d, _, _ in deltas], type=pa.int64())}
        for i, (c, t) in enumerate(zip(self.key, self.key_types)):
            arrays[c] = pa.array([k[i] for k in keys], type=t)
        for i, (c, t) in enumerate(zip(self.vals, self.val_types)):
            arrays[c] = pa.array([p[0][i] for _, _, p in deltas], type=t)
        arrays["valid_from"] = pa.array(
            [p[1] for _, _, p in deltas], type=pa.float64())
        arrays["valid_to"] = pa.array(
            [-1.0 if p[2] is None else p[2] for _, _, p in deltas],
            type=pa.float64())
        arrays["version"] = pa.array(
            [p[3] for _, _, p in deltas], type=pa.int64())
        arrays["epoch"] = pa.array([epoch] * len(deltas), type=pa.int64())
        return pa.table(arrays)

    def state_to_table(self, items: list, epoch: int) -> pa.Table:
        """``collect()`` state → the OPEN versions only (the "current"
        dimension view); the full history is the sink's running sum."""
        live = [(pickle.loads(kb), st) for kb, st in items
                if st[1] is not None]
        arrays: dict[str, pa.Array] = {}
        for i, (c, t) in enumerate(zip(self.key, self.key_types)):
            arrays[c] = pa.array([k[i] for k, _ in live], type=t)
        for i, (c, t) in enumerate(zip(self.vals, self.val_types)):
            arrays[c] = pa.array([st[1][i] for _, st in live], type=t)
        arrays["valid_from"] = pa.array([st[2] for _, st in live],
                                        type=pa.float64())
        arrays["version"] = pa.array([st[3] for _, st in live],
                                     type=pa.int64())
        arrays["epoch"] = pa.array([epoch] * len(live), type=pa.int64())
        return pa.table(arrays)


@dataclass
class StreamJoin:
    """Stateful symmetric hash join keyed by arbitrary columns.

    Both sides are hash-partitioned to the same shards (co-location by key —
    SURVEY §7.4); each shard buffers per-key rows and emits each matched pair
    exactly once.  ``retention`` bounds buffered state by event time
    (watermark − retention is expired on every advance).
    """

    name: str
    left_input: str
    right_input: str
    left_key: Sequence[str]
    right_key: Sequence[str]
    left_cols: Sequence[str]
    right_cols: Sequence[str]
    left_ts: str | None = None
    right_ts: str | None = None
    retention: float | None = None
    #: interval join: only emit pairs with |left_ts − right_ts| ≤ max_dt
    #: (the time-bounded stream-stream join — funnels, attribution windows).
    #: The bound is applied INSIDE the shard probe, so unmatched history
    #: still ages out by ``retention`` exactly as before.
    max_dt: float | None = None
    #: LEFT OUTER interval join (Flink's outer interval join): when set,
    #: left rows whose join window has closed (watermark > left_ts +
    #: max_dt) with NO match emit once into the ``<name>__unmatched`` side
    #: sink (left columns + event time), then drop from the buffer —
    #: matched ∪ unmatched is exactly the relational LEFT JOIN multiset
    #: under the interval predicate, provided right rows arrive
    #: watermark-consistently (a right row older than the watermark at
    #: arrival may miss already-finalized lefts — the standard streaming
    #: outer-join contract).  Requires ``max_dt``; not retraction-aware
    #: (a diff=−1 row marks its key matched like any other match).
    #: ``True``/``"left"`` = LEFT OUTER, ``"right"`` = RIGHT OUTER,
    #: ``"full"`` = FULL OUTER (both sides' never-matched rows sweep into
    #: their own side sinks: ``<name>__unmatched`` for left,
    #: ``<name>__unmatched_right`` for right).
    emit_unmatched: bool | str = False

    def unmatched_sides(self) -> tuple[str, ...]:
        if not self.emit_unmatched:
            return ()
        if self.emit_unmatched is True or self.emit_unmatched == "left":
            return ("left",)
        if self.emit_unmatched == "right":
            return ("right",)
        if self.emit_unmatched in ("full", "both"):
            return ("left", "right")
        raise ValueError(f"emit_unmatched={self.emit_unmatched!r}: use "
                         "True/'left'/'right'/'full'")

    def __post_init__(self):
        if self.max_dt is not None and not (self.left_ts and self.right_ts):
            raise ValueError("max_dt requires left_ts and right_ts")
        if self.unmatched_sides():
            if self.max_dt is None:
                raise ValueError("emit_unmatched requires max_dt: an "
                                 "unbounded join never finalizes a row")
            if self.retention is not None and self.retention < self.max_dt:
                raise ValueError("retention < max_dt would expire rows "
                                 "before their unmatched sweep")

    def _side_frame(self, tbl: pa.Table, side: str) -> pd.DataFrame:
        """One side's epoch rows → DataFrame of key + output cols + per-side
        event-time and diff columns (vectorized; no per-row Python).

        A ``diff`` column on the input makes the join **bilinear** like DD's:
        a retraction row (diff = −1) matches the other side's buffered rows
        and emits matches with diff = diff_left · diff_right, cancelling the
        earlier emissions in multiset semantics.
        """
        key_cols = self.left_key if side == "left" else self.right_key
        out_cols = self.left_cols if side == "left" else self.right_cols
        ts_col = self.left_ts if side == "left" else self.right_ts
        cols = list(dict.fromkeys(
            list(key_cols) + list(out_cols)
            + ([ts_col] if ts_col else [])
            + (["diff"] if "diff" in tbl.column_names else [])
        ))
        pdf = tbl.select(cols).to_pandas()
        ts_name = f"__ts_{side}"
        pdf[ts_name] = _ts_to_float(pdf[ts_col]) if ts_col else 0.0
        pdf[f"__diff_{side}"] = (
            pdf.pop("diff").astype(np.int64) if "diff" in pdf.columns else 1
        )
        if ts_col and ts_col not in out_cols and ts_col not in key_cols:
            pdf = pdf.drop(columns=[ts_col])
        return pdf

    def shard_payloads(self, left_tbl, right_tbl, num_shards: int) -> dict[int, dict]:
        """Hash-partition both sides to the same shards (co-location by key):
        shard = hash(key values) % num_shards, computed vectorized and
        identically on both sides (pd.util.hash_pandas_object on the key
        columns by position)."""
        payloads: dict[int, dict] = {}
        for side, tbl, keys in (("left", left_tbl, self.left_key),
                                ("right", right_tbl, self.right_key)):
            if tbl is None:
                continue
            pdf = self._side_frame(tbl, side)
            if not len(pdf):
                continue
            h = pd.util.hash_pandas_object(pdf[list(keys)], index=False).to_numpy()
            sid = (h % np.uint64(num_shards)).astype(np.int64)
            for s in np.unique(sid):
                payloads.setdefault(int(s), {
                    "left_key": list(self.left_key),
                    "right_key": list(self.right_key),
                    "max_dt": self.max_dt,
                    "track": "left" in self.unmatched_sides(),
                    "track_right": "right" in self.unmatched_sides(),
                })[side] = pdf[sid == s].reset_index(drop=True)
        return payloads

    def matches_to_table(self, frames: list, epoch: int) -> pa.Table:
        names = list(dict.fromkeys(
            list(self.left_key) + list(self.left_cols) + list(self.right_cols)
        ))
        if not frames:
            return pa.table({n: pa.array([]) for n in names + ["diff", "epoch"]})
        cat = pd.concat(frames, ignore_index=True)
        df = cat[names].copy()
        df["diff"] = (cat["__diff_left"] * cat["__diff_right"]).astype(np.int64)
        df["epoch"] = np.int64(epoch)
        return pa.Table.from_pandas(df, preserve_index=False)

    def unmatched_to_table(self, frames: list, epoch: int,
                           side: str = "left") -> pa.Table:
        """Swept never-matched rows of one side → that side's columns + its
        event time (as its ts column name) + epoch.  No null-padded other
        side: each side sink keeps its own schema, and a reader null-pads
        at union time (the ``stream_outer_join`` query does)."""
        key_cols = self.left_key if side == "left" else self.right_key
        out_cols = self.left_cols if side == "left" else self.right_cols
        ts_col = self.left_ts if side == "left" else self.right_ts
        names = list(dict.fromkeys(list(key_cols) + list(out_cols)))
        if not frames:
            cols = {n: pa.array([]) for n in names}
            cols[ts_col] = pa.array([], type=pa.float64())
            cols["epoch"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        cat = pd.concat(frames, ignore_index=True)
        df = cat[names].copy()
        if ts_col not in df.columns:  # else keep the carried original
            df[ts_col] = cat[f"__ts_{side}"].astype(np.float64)
        df["epoch"] = np.int64(epoch)
        return pa.Table.from_pandas(df, preserve_index=False)


class AsofStreamJoin(StreamJoin):
    """Incremental event-time AS-OF join — the differential form of DuckDB's
    ``ASOF JOIN`` / Flink's event-time temporal join, as a STREAM-STREAM
    operator: each left event matches the latest right version with
    ``right_ts ≤ left_ts`` among the rows that have ARRIVED, and when a
    late-but-better right version lands in ``(match_ts, left_ts]`` the old
    pair is retracted (diff −1) and the new one emitted (diff +1), so the
    accumulated multiset at any point equals the batch ASOF JOIN of every
    arrived row — regardless of arrival order or epoch split.

    BILINEAR like ``StreamJoin``: a ``diff`` = −1 RIGHT row deletes that
    version — every left currently matched to it retracts its pair and
    re-matches to the next-older surviving version; a ``diff`` = −1 LEFT
    row removes one buffered instance (multiset subtraction) and retracts
    its current pair — so the accumulated multiset equals the ASOF JOIN
    of the NET input multisets.  Retracting a row not in the buffer
    raises (retractions must arrive before their target ages past
    retention).

    Contracts: ``left_ts``/``right_ts`` required; the key columns must have
    the SAME NAMES on both sides; right-side (key, ts) pairs unique
    (replayed duplicates dedup last-wins).  ``retention`` expires
    finalized lefts and COMPACTS the right version history
    (latest-at-horizon version per key survives, so any live left's
    current match does too).  Unmatched lefts emit nothing until a
    version arrives (inner as-of).  ``max_dt`` doubles as a STALENESS
    TOLERANCE (Flink's bounded temporal join): a left matches only
    versions in ``[left_ts − max_dt, left_ts]`` — a fallback outside the
    bound is no match (the pair dies / the left sweeps unmatched).

    Distinct from ``TemporalEnrichJoin``: that op enriches a STREAM against
    a CDC DIM whose versions are watermark-consistent at probe time (no
    retractions); this one tolerates arbitrary interleaving of both sides
    and repairs earlier emissions differentially."""

    def __post_init__(self):
        if not (self.left_ts and self.right_ts):
            raise ValueError("AsofStreamJoin requires left_ts and right_ts")
        if list(self.left_key) != list(self.right_key):
            raise ValueError("AsofStreamJoin requires identical key column "
                             f"names on both sides (got {self.left_key} vs "
                             f"{self.right_key})")
        if self.max_dt is not None and self.max_dt <= 0:
            raise ValueError("AsofStreamJoin max_dt (staleness tolerance) "
                             "must be positive")
        if self.emit_unmatched not in (False, True, "left"):
            raise ValueError("AsofStreamJoin emit_unmatched supports only "
                             "LEFT outer (True/'left') — the right side "
                             "is a version history, not a match partner")

    def out_names(self) -> list:
        return list(dict.fromkeys(
            list(self.left_key) + list(self.left_cols)
            + list(self.right_cols)))

    def shard_payloads(self, left_tbl, right_tbl,
                       num_shards: int) -> dict[int, dict]:
        payloads: dict[int, dict] = {}
        keys = list(self.left_key)
        for side, tbl in (("left", left_tbl), ("right", right_tbl)):
            if tbl is None:
                continue
            pdf = self._side_frame(tbl, side)
            if not len(pdf):
                continue
            h = pd.util.hash_pandas_object(pdf[keys],
                                           index=False).to_numpy()
            sid = (h % np.uint64(num_shards)).astype(np.int64)
            for s in np.unique(sid):
                payloads.setdefault(int(s), {
                    "key": keys,
                    "out_names": self.out_names(),
                    "right_cols": list(self.right_cols),
                    "track_unmatched": bool(self.emit_unmatched),
                    "tolerance": self.max_dt,
                })[side] = pdf[sid == s].reset_index(drop=True)
        return payloads

    def asof_to_table(self, frames: list, epoch: int) -> pa.Table:
        names = self.out_names()
        if not frames:
            return pa.table({n: pa.array([])
                             for n in names + ["diff", "epoch"]})
        cat = pd.concat(frames, ignore_index=True)
        df = cat[names + ["diff"]].copy()
        df["epoch"] = np.int64(epoch)
        return pa.Table.from_pandas(df, preserve_index=False)

    def unmatched_asof_to_table(self, frames: list, epoch: int,
                                with_diff: bool = True) -> pa.Table:
        """Unmatched-left ±deltas (or sweep +rows) → Arrow: left columns
        + the left ts column (float seconds) + diff + epoch."""
        names = [c for c in self.out_names()
                 if c not in list(self.right_cols)]
        if not frames:
            cols = {n: pa.array([]) for n in names}
            cols[self.left_ts] = pa.array([], type=pa.float64())
            cols["diff"] = pa.array([], type=pa.int64())
            cols["epoch"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        cat = pd.concat(frames, ignore_index=True)
        df = cat[names].copy()
        if self.left_ts not in df.columns:  # else keep the carried one
            df[self.left_ts] = cat["__ts_left"].astype(np.float64)
        df["diff"] = (cat["diff"].astype(np.int64)
                      if "diff" in cat.columns else np.int64(1))
        df["epoch"] = np.int64(epoch)
        return pa.Table.from_pandas(df, preserve_index=False)


@dataclass
class EnrichJoin:
    """Stream-table enrichment join: a slowly-changing dimension table kept
    as per-key last-writer-wins registers in the state shards; each epoch's
    stream rows are enriched with the key's CURRENT dim values (left-join
    semantics — unmatched keys get nulls).

    Distinct from ``StreamJoin`` (which buffers both sides' histories and
    emits all matched pairs): the dim side is an upsert stream — epoch-e
    updates are visible to epoch-e events, and ``LastValueAgg``'s semilattice
    merge makes the outcome independent of block/shard/retry order.  Dim
    epochs are assumed small relative to the stream (the slowly-changing-
    dimension contract); per-epoch dim rows are folded into per-key registers
    before they leave the worker.
    """

    name: str
    dim_input: str
    stream_input: str
    key: Sequence[str]                       # key cols on the stream side
    dim_vals: Sequence[str] = ()             # dim cols attached to events
    stream_cols: Sequence[str] = ()          # event cols carried through
    dim_key: Sequence[str] | None = None     # dim-side names (default = key)
    dim_ts: str = "ts"                       # LWW stamp column on dim side
    #: Arrow types for ``dim_vals`` (same order).  Unmatched keys emit NULLs,
    #: and pandas would otherwise promote int columns to float in null-bearing
    #: epochs — an epoch-dependent schema the sink must never see; explicit
    #: types pin it (Arrow ints are nullable).
    dim_types: Sequence[Any] | None = None
    #: optional bool column on the dim side: rows where it is true DELETE the
    #: key — upserted as a TOMBSTONE register (value None) so it keeps its
    #: stamp and shadows older upserts arriving late/out of order; probes
    #: read tombstoned keys as misses (nulls).
    dim_delete_col: str | None = None
    #: register TTL in event time: on each watermark advance, dim registers
    #: whose LWW stamp is older than ``watermark − dim_ttl`` are dropped
    #: (including tombstones).  Bounds shard state for unbounded key spaces;
    #: an expired key re-enriches as a miss, exactly like a never-seen key.
    dim_ttl: float | None = None
    #: optional event-time column on the STREAM side: when set, the probe
    #: ships each group's max stream event time back so the session's
    #: ``auto_watermark_delay`` advances (and ``dim_ttl`` sweeps fire) from
    #: EnrichJoin traffic alone.  Without it, an EnrichJoin-only session
    #: needs explicit watermarks for TTL sweeps.
    stream_ts: str | None = None
    #: SHARED ARRANGEMENT (differential dataflow's signature economy —
    #: arrange once, read from many operators): the name of an
    #: ``UpsertToRetract`` op in the same session whose per-key LWW
    #: registers serve as this join's dim side.  This op then maintains NO
    #: dim state of its own — the one arrangement simultaneously feeds the
    #: changelog the owner emits AND every enrich probe here, and a dim
    #: update/tombstone is visible to both in the same epoch.
    #: ``dim_input`` is unused (pass ""); ``dim_vals`` names the OUTPUT
    #: columns for the owner's ``vals`` tuple (same length/order);
    #: ``dim_types`` defaults to the owner's ``val_types``.  ``dim_ttl``
    #: must be None — state lifetime belongs to the arrangement's owner.
    share_from: str | None = None
    #: probe plan for Dataset stream epochs.  ``"shuffle"`` (default): one
    #: ``groupby(shard)`` exchange co-locates each shard's events, one
    #: probe call per (shard, epoch) — the cheapest plan when keys are
    #: well-spread.  ``"block"`` is the async-lookup plan (Flink's lookup
    #: join): events NEVER move — each block asks the shards for just its
    #: own unique keys (one parallel actor call per touched shard per
    #: block) and writes its sink part in place.  Choose it when the key
    #: distribution is skewed: under a hot key the shuffle plan funnels
    #: every one of that key's events through the single task owning its
    #: shard group, while block mode spreads them across all input blocks
    #: and each block pays one tiny register lookup.  Results are
    #: identical (gated in pytest); probe cost is O(unique keys/block ×
    #: blocks) actor traffic instead of O(events) shuffle bytes.
    probe_mode: str = "shuffle"

    def __post_init__(self):
        overlap = set(self.dim_vals) & (set(self.stream_cols) | set(self.key))
        if overlap:
            raise ValueError(f"dim_vals collide with stream columns: {overlap}")
        if self.share_from and self.dim_ttl is not None:
            raise ValueError(
                "share_from + dim_ttl: a shared arrangement's state "
                "lifetime belongs to its owning UpsertToRetract op — "
                "sweeping it from the reader would corrupt the owner")
        if self.probe_mode not in ("shuffle", "block"):
            raise ValueError(f"probe_mode {self.probe_mode!r}: use "
                             "'shuffle' or 'block'")

    # dim side → {key_bytes: LastValueAgg}; same partial contract as
    # KeyedAggregation so the Table and shard-direct Dataset paths both work
    def partial_batch(self, tbl: pa.Table, finalized_before: float
                      ) -> tuple[dict, int]:
        dk = list(self.dim_key or self.key)
        return _lww_partials(tbl, dk, self.dim_vals, self.dim_ts,
                             self.dim_delete_col), 0


class TemporalEnrichJoin(EnrichJoin):
    """Event-time TEMPORAL dim join (Flink temporal-table join; DuckDB
    ``ASOF JOIN``): the dim side keeps a per-key VERSION HISTORY
    (``VersionedValueAgg``) in the state shards, and each stream event is
    enriched with the dim version valid AT ITS EVENT TIME — the version
    with the largest ``dim_ts ≤ stream_ts`` — instead of the key's current
    value.  Left-join semantics: events before the key's first version (or
    landing on a tombstone) read nulls.

    Inherits ``EnrichJoin``'s shape: dim epochs fold into per-key
    accumulators before leaving the worker, stream epochs probe through the
    same shard-of(key) partitioning with worker-written sink parts.  The
    version-union semilattice makes results independent of block/shard/
    replay order; they match a batch ASOF join whenever each key's probed
    versions arrive in an epoch ≤ the probing epoch (the temporal-join
    contract — a dim version arriving AFTER a probe it should have matched
    is late data, exactly as in Flink).

    ``stream_ts`` is REQUIRED (it is the probe time).  ``dim_ttl`` is the
    history horizon: on each watermark advance, versions older than
    ``watermark − dim_ttl`` are COMPACTED to the single still-reachable one
    (not dropped like EnrichJoin's LWW registers — the latest old version
    stays probe-able for event times at/after the horizon).
    """

    def __post_init__(self):
        super().__post_init__()
        if not self.stream_ts:
            raise ValueError("TemporalEnrichJoin requires stream_ts: it is "
                             "the AS-OF probe time")
        if self.share_from:
            raise ValueError(
                "share_from is LWW-register sharing (EnrichJoin); a "
                "temporal join needs the version-history arrangement, "
                "which UpsertToRetract does not keep")
        if self.probe_mode == "block":
            raise ValueError(
                "probe_mode='block' is implemented for the LWW enrich "
                "probe; the AS-OF probe uses the shuffle plan")

    # dim side → {key_bytes: VersionedValueAgg}; same partial contract as
    # EnrichJoin so Table and shard-direct Dataset dim epochs both work
    def partial_batch(self, tbl: pa.Table, finalized_before: float
                      ) -> tuple[dict, int]:
        from ..state.aggregates import VersionedValueAgg

        dk = list(self.dim_key or self.key)
        cols = list(dict.fromkeys(
            dk + list(self.dim_vals) + [self.dim_ts]
            + ([self.dim_delete_col] if self.dim_delete_col else [])))
        pdf = tbl.select(cols).to_pandas()
        ts = _ts_to_float(pdf[self.dim_ts])
        keys = list(zip(*[pdf[c] for c in dk])) if len(pdf) else []
        vals = ([()] * len(pdf) if not self.dim_vals
                else list(zip(*[pdf[c] for c in self.dim_vals]))
                if len(pdf) else [])
        dels = (pdf[self.dim_delete_col].to_numpy(dtype=bool)
                if self.dim_delete_col else np.zeros(len(pdf), dtype=bool))
        out: dict[bytes, Any] = {}
        for k, t, v, d in zip(keys, ts, vals, dels):
            if d:
                v = None  # tombstone version: probes at/after t miss
            acc = VersionedValueAgg({(float(t), _key_bytes(v)): v})
            kb = _key_bytes(tuple(k))
            cur = out.get(kb)
            if cur is None:
                out[kb] = acc
            else:
                cur.merge(acc)
        return out, 0


@dataclass
class StreamDedup:
    """Streaming exactly-once deduplication: only the FIRST event per key
    (ordered by ``(ts_col, *order_cols)``) is emitted; later occurrences —
    in the same epoch or any later epoch — are dropped.  State is one tiny
    ``FirstSeenReg`` per distinct key in the shards; ``ttl`` bounds it in
    event time (a key idle longer than the dedup window re-emits, the
    standard streaming-dedup contract, cf. Flink deduplication with state
    TTL).  Deterministic and replay-idempotent: each (shard, epoch) offers
    its per-key MINIMUM stamp exactly once, and a replayed epoch re-wins its
    own claims, so retries emit identical rows into existing manifests.
    Not retractable (dedup is not a monoid) — retracting an emitted first
    occurrence would need the full per-key history, which is exactly the
    state this operator exists to avoid."""

    name: str
    input: str
    key: Sequence[str]
    ts_col: str = "ts"
    order_cols: Sequence[str] = ()   # deterministic tiebreak after ts
    carry: Sequence[str] = ()        # extra cols emitted on the winning row
    ttl: float | None = None         # dedup window in event time


@dataclass
class BroadcastEnrich:
    """Flink's broadcast-state pattern: a LOW-VOLUME control/rule stream is
    kept as per-rule LWW registers in the state shards and, each epoch, the
    CURRENT rule set is shipped to the event stream as ONE object-store
    broadcast (`ray.put` once, read in every task) — the event blocks
    evaluate the rules where they already live, with **no shuffle at all**,
    and write their sink parts worker-side.

    This is the scale-correct plan for global (non-keyed) rule lookups.
    The alternative — an ``EnrichJoin`` on a constant key — hash-routes
    EVERY event through the one shard that owns the constant key: the
    classic hot-key collapse.  Broadcast state inverts it: the rules move
    (they are tiny by contract), the events never do.

    Semantics: rule epochs are upserts keyed by ``rule_key`` with LWW by
    ``(rule_ts, tiebreak)``; ``rule_delete_col`` rows retire a rule
    (tombstone — shadows late out-of-order upserts, excluded from the
    snapshot).  Epoch-e rule changes are visible to epoch-e events
    (add order = processing order, as with shared arrangements).  ``apply``
    is the user hook: ``apply(events: pa.Table, rules: list[dict]) ->
    pa.Table`` — filter, tag, route, fan out (1→N is fine); rules arrive
    sorted by ``rule_key`` so the hook is deterministic.  Rule registers
    ride the normal checkpoint / resume / savepoint-rescale machinery
    (they are ordinary keyed registers, hash-partitioned by rule key)."""

    name: str
    rules_input: str
    stream_input: str
    rule_key: Sequence[str]
    rule_vals: Sequence[str]
    #: (event_block, current_rules) -> output block.  MUST be a pure
    #: function of its arguments (it runs in retried tasks).
    apply: Callable[[pa.Table, list], pa.Table] = None  # type: ignore
    rule_ts: str = "ts"
    rule_delete_col: str | None = None
    #: optional event-time column on the STREAM side: block maxima feed the
    #: session auto-watermark (same plumbing as the enrich probe)
    stream_ts: str | None = None
    #: hard cap on materialized rule rows per epoch — broadcast state is
    #: small BY CONTRACT; a rule stream that trips this wants EnrichJoin
    max_rule_rows: int = 1_000_000

    def __post_init__(self):
        if not callable(self.apply):
            raise ValueError("BroadcastEnrich requires an apply(events, "
                             "rules) callable")
        if not self.rule_key:
            raise ValueError("rule_key must name at least one column")

    # rule side → {key_bytes: LastValueAgg}; same partial contract as the
    # EnrichJoin dim side so Table and Dataset rule epochs both work
    def partial_batch(self, tbl: pa.Table, finalized_before: float
                      ) -> tuple[dict, int]:
        return _lww_partials(tbl, list(self.rule_key), self.rule_vals,
                             self.rule_ts, self.rule_delete_col), 0

    def rules_snapshot(self, collected: list) -> list[dict]:
        """Live rules from the register dump: tombstones drop, order is the
        rule-key sort (deterministic input to ``apply``)."""
        rules = []
        for kb, acc in collected:
            if acc.value is None:
                continue  # retired rule
            k = pickle.loads(kb)
            d = dict(zip(self.rule_key, k))
            d.update(zip(self.rule_vals, acc.value))
            rules.append(d)
        rules.sort(key=lambda d: tuple(d[c] for c in self.rule_key))
        return rules


class StreamSession:
    """The per-job driver: owns the state store, per-op sinks, watermark and
    checkpoints.  See module docstring for the epoch data path."""

    def __init__(self, root: str | Path, num_shards: int = 4,
                 checkpoint_every: int = 1,
                 auto_watermark_delay: float | None = None,
                 fsync: bool = True, pipelined: bool = False,
                 consolidate_every: int | None = None,
                 sync_every: int = 1):
        #: sync_every=K > 1: group commit for every op sink — per-epoch
        #: commits stay atomic (rename) but fsyncs batch into one barrier
        #: + durable watermark per K epochs, with verify-on-open dropping
        #: any torn suffix (ExactlyOnceParquetSink docs).  The sub-3ms
        #: durable-epoch knob for high-rate micro-batch jobs; power-loss
        #: window = up to K epochs past the last barrier, replayable.
        self.sync_every = max(int(sync_every), 1)
        #: every N epochs, net each changelog sink's committed history into
        #: a SUM(diff) snapshot (``ExactlyOnceParquetSink.consolidate``) —
        #: bounds sink storage at O(live rows) for unbounded CDC streams;
        #: consumers keep the exact running sum but lose per-epoch replay
        #: granularity of the consolidated span (by design)
        self.consolidate_every = consolidate_every
        #: pipelined=True submits Table-epoch state applies WITHOUT blocking
        #: (per-actor submission order keeps shard state serialized); every
        #: read surface — sweeps, collect, checkpoint, join probe — fences
        #: first, so emissions and snapshots always observe a consistent
        #: frontier.  Cuts per-epoch latency for high-rate micro-batches.
        self.pipelined = pipelined
        #: fsync=False relaxes commit durability (no power-loss guarantee)
        #: for latency-sensitive jobs; exactly-once vs process crashes keeps
        #: holding either way (manifest atomicity needs only rename)
        self.fsync = fsync
        self.root = Path(root)
        self.store = ShardedStateStore(num_shards=num_shards)
        self.checkpoint_every = checkpoint_every
        #: when set and ``process_epoch`` gets no explicit watermark, advance
        #: it to (max event time seen − delay) — the standard bounded-
        #: out-of-orderness watermark generator
        self.auto_watermark_delay = auto_watermark_delay
        #: complete checkpoints retained on disk (older ones pruned per save)
        self.checkpoint_keep = 2
        self._max_event_time = -math.inf
        #: per-SOURCE watermarks (multi-input frontier alignment): each
        #: source reported via ``process_epoch(source_watermarks=...)``
        #: ratchets its own watermark, and the session watermark advances to
        #: the MINIMUM over non-idle tracked sources — the Flink/Beam rule
        #: that makes a union/join of streams wait for its slowest input.
        #: ``mark_source_idle`` excludes a stalled source from the min until
        #: it next reports data or a watermark.
        self.source_watermarks: dict[str, float] = {}
        self.idle_sources: set[str] = set()
        self.ops: dict[str, Any] = {}
        self.sinks: dict[str, ExactlyOnceParquetSink] = {}
        #: late-data side-output sinks, one per routed input (``route_late``)
        self._late_sinks: dict[str, ExactlyOnceParquetSink] = {}
        self.chk = CheckpointManager(self.root / "_checkpoints")
        self.watermark = -math.inf
        self.last_epoch = -1
        self._replay_floor = 0  # raised by resume(); see advance_watermark
        #: per-epoch input lineage (set by process_epoch, stamped into every
        #: sink manifest committed for that epoch — the audit trail from an
        #: output partition back to the input slice that produced it)
        self.current_lineage: dict | None = None
        self.metrics = {"late_dropped": 0, "late_routed": 0, "epochs": 0,
                        "input_rows": 0, "emitted_rows": 0}

    def _meta(self, **kw) -> dict:
        if self.current_lineage is not None:
            kw["lineage"] = self.current_lineage
        return kw

    # ------------------------------------------------------------------ setup
    def add(self, op) -> "StreamSession":
        src_name = getattr(op, "share_from", None)
        if src_name:
            src = self.ops.get(src_name)
            if not isinstance(src, UpsertToRetract) \
                    or isinstance(src, Scd2History):
                raise ValueError(
                    f"share_from={src_name!r}: add the owning "
                    "UpsertToRetract op to the session first (the shared "
                    "arrangement is its register table; Scd2History's "
                    "version state is not an LWW register table)")
            if len(op.dim_vals) != len(src.vals):
                raise ValueError(
                    f"share_from: dim_vals ({len(op.dim_vals)}) must name "
                    f"every column of the owner's vals ({len(src.vals)}) "
                    "in order")
            if op.dim_types is None:
                op.dim_types = list(src.val_types)
        self.ops[op.name] = op
        if isinstance(op, (KeyedAggregation, SessionWindowAggregation)) and (
            getattr(op, "window", None) is not None
            or isinstance(op, SessionWindowAggregation)
            or getattr(op, "emit_changelog", False)
        ):
            self.sinks[op.name] = ExactlyOnceParquetSink(self.root / op.name,
                                                         fsync=self.fsync,
                                sync_every=self.sync_every)
            if getattr(op, "early_firing", False):
                self.sinks[f"{op.name}__early"] = ExactlyOnceParquetSink(
                    self.root / f"{op.name}__early", fsync=self.fsync,
                                sync_every=self.sync_every)
            if getattr(op, "late_output", False):
                self.sinks[f"{op.name}__late"] = ExactlyOnceParquetSink(
                    self.root / f"{op.name}__late", fsync=self.fsync,
                                sync_every=self.sync_every)
        elif isinstance(op, (StreamJoin, PatternMatch, AbsenceDetect,
                             KleenePattern, IncrementalComponents,
                             IncrementalPageRank, IncrementalReachability,
                             StreamNearDup,
                             UpsertToRetract, EnrichJoin, BroadcastEnrich,
                             StreamDedup)):
            self.sinks[op.name] = ExactlyOnceParquetSink(self.root / op.name,
                                                         fsync=self.fsync,
                                sync_every=self.sync_every)
            if isinstance(op, StreamJoin):
                # outer join: finalized never-matched rows get their OWN
                # side sink per tracked side (own schema, no null padding)
                # — committing them into the match sink would double-commit
                # its per-epoch manifest
                for s, suffix in (("left", "__unmatched"),
                                  ("right", "__unmatched_right")):
                    if s in op.unmatched_sides():
                        self.sinks[f"{op.name}{suffix}"] = \
                            ExactlyOnceParquetSink(
                                self.root / f"{op.name}{suffix}",
                                fsync=self.fsync,
                                sync_every=self.sync_every)
        return self

    # ------------------------------------------------------------------ resume
    def resume(self) -> int:
        """Restore the latest checkpoint; returns the next epoch to process
        (0 when starting fresh).  Sink commits for later epochs are skipped
        idempotently during replay."""
        latest = self.chk.latest()
        if latest is None:
            return 0
        blobs, extra = self.chk.load(latest)
        if set(blobs) != set(range(self.store.num_shards)):
            # savepoint rescale: the checkpoint was taken at a different
            # shard count — re-bucket every keyed family with this
            # session's routing rule before loading (see rescale_blobs)
            logging.getLogger(__name__).info(
                "resume: rescaling checkpoint from %d to %d shards",
                len(blobs), self.store.num_shards)
            blobs = rescale_blobs(blobs, self.store.num_shards)
        self.store.load_all(blobs)
        self.watermark = extra.get("watermark", -math.inf)
        self.last_epoch = latest
        self.metrics.update(extra.get("metrics", {}))
        self.source_watermarks = dict(extra.get("source_watermarks", {}))
        self.idle_sources = set(extra.get("idle_sources", ()))
        # epochs below this floor are replays: their sink commits already
        # exist and re-sweeping state for them must stay a silent no-op
        self._replay_floor = max(
            (max(s.committed_epochs(), default=-1) + 1 for s in self.sinks.values()),
            default=latest + 1,
        )
        return latest + 1

    # ------------------------------------------------------------- main loop
    def _observe_event_time(self, op, tbl: pa.Table) -> None:
        """Track max event time (Table inputs) for the auto-watermark."""
        ts_col = getattr(op, "ts_col", None)
        if ts_col and ts_col in tbl.column_names and tbl.num_rows:
            ts = _ts_to_float(tbl.select([ts_col]).to_pandas()[ts_col])
            if ts.size:
                self._max_event_time = max(self._max_event_time, float(ts.max()))

    def _merged_partials(self, op, data, finalized_before: float) -> dict:
        """Partial stage: Dataset → distributed map_batches; Table → direct.

        Both paths feed ``self._max_event_time`` so the auto-watermark
        generator works for Dataset epochs too (the per-block max rides in
        the partial blob — no extra scan)."""
        if isinstance(data, pa.Table):
            partials, late = op.partial_batch(data, finalized_before)
            self.metrics["late_dropped"] += late
            self._observe_event_time(op, data)
            return partials

        ts_col = getattr(op, "ts_col", None)

        def per_block(tbl: pa.Table) -> pa.Table:
            part, late = op.partial_batch(tbl, finalized_before)
            max_ts = -math.inf
            if ts_col and ts_col in tbl.column_names and tbl.num_rows:
                ts = _ts_to_float(tbl.select([ts_col]).to_pandas()[ts_col])
                if ts.size:
                    max_ts = float(ts.max())
            blob = pickle.dumps((part, late, max_ts),
                                protocol=pickle.HIGHEST_PROTOCOL)
            return pa.table({"blob": pa.array([blob], type=pa.binary())})

        rows = data.map_batches(per_block, batch_format="pyarrow").take_all()
        blobs = sorted(r["blob"] for r in rows)  # deterministic merge order
        merged: dict[bytes, Any] = {}
        for b in blobs:
            part, late, max_ts = pickle.loads(b)
            self.metrics["late_dropped"] += late
            self._max_event_time = max(self._max_event_time, max_ts)
            for k, acc in part.items():
                if k in merged:
                    merged[k].merge(acc)
                else:
                    merged[k] = acc
        return merged

    def _scatter_partials_distributed(self, op, name: str, epoch: int, data,
                                      finalized_before: float) -> None:
        """Shard-direct partial scatter for Dataset epochs (VERDICT r1 fix:
        no driver merge of per-block partial dicts).

        Map tasks emit (shard, key, accumulator) rows, pre-combined per key
        per block; ONE ``groupby(shard)`` shuffle co-locates each shard's
        partials, and the per-shard group task merges them (deterministic
        (key, acc-bytes) order) and calls its ``StateShard.apply_delta``
        directly — exactly one actor call per (shard, epoch), preserving the
        replay-idempotency contract.  The driver sees only a per-shard
        summary row (late counts, max event time); per-epoch key cardinality
        never touches driver memory.
        """
        num_shards = self.store.num_shards
        shards = self.store.shards
        ts_col = getattr(op, "ts_col", None)
        from .sink import write_epoch_part
        from .state_store import shard_of

        # late_output: each block splits off its late rows and writes them
        # as a worker-side part of the <name>__late sink — only the tiny
        # manifest entries ride back in the summary row; on REPLAY of an
        # already-committed epoch nothing is rewritten (strays without a
        # manifest entry are invisible anyway)
        late_root: str | None = None
        late_skip = False
        if getattr(op, "late_output", False):
            lsink = self.sinks[f"{name}__late"]
            late_root = str(lsink.root)
            late_skip = lsink.is_committed(epoch)
        do_fsync = self.fsync

        def per_block(tbl: pa.Table) -> pa.Table:
            import uuid

            entries: list[dict] = []
            max_ts = -math.inf
            if ts_col and ts_col in tbl.column_names and tbl.num_rows:
                ts = _ts_to_float(tbl.select([ts_col]).to_pandas()[ts_col])
                if ts.size:
                    max_ts = float(ts.max())
            if late_root is not None:
                tbl, late_tbl = op.split_late(tbl, finalized_before)
                if late_tbl.num_rows and not late_skip:
                    entries.append(write_epoch_part(
                        late_root, epoch, late_tbl,
                        tag=f"b{uuid.uuid4().hex[:12]}", fsync=do_fsync))
            part, late = op.partial_batch(tbl, finalized_before)
            sids, keys, accs = [-1], [b""], [pickle.dumps(
                (late, max_ts, entries), protocol=pickle.HIGHEST_PROTOCOL)]
            for k, acc in part.items():
                sids.append(shard_of(k, num_shards))
                keys.append(k)
                accs.append(pickle.dumps(acc, protocol=pickle.HIGHEST_PROTOCOL))
            return pa.table({
                "__shard": pa.array(sids, type=pa.int64()),
                "__key": pa.array(keys, type=pa.binary()),
                "__acc": pa.array(accs, type=pa.binary()),
            })

        def apply_group(g: pa.Table) -> pa.Table:
            # pyarrow group format: binary key/acc columns stay Arrow
            # buffers end-to-end (no pandas object boxing per epoch)
            sid = g["__shard"][0].as_py()
            keys = g["__key"].to_pylist()
            accs = g["__acc"].to_pylist()
            if sid == -1:
                lates, max_ts = 0, -math.inf
                entries: list[dict] = []
                for blob in accs:
                    late, mt, ents = pickle.loads(blob)
                    lates += late
                    max_ts = max(max_ts, mt)
                    entries.extend(ents)
                return pa.table({"late": pa.array([lates], type=pa.int64()),
                                 "max_ts": pa.array([max_ts]),
                                 "keys": pa.array([0], type=pa.int64()),
                                 "entries": pa.array(
                                     [pickle.dumps(entries)],
                                     type=pa.binary())})
            merged: dict[bytes, Any] = {}
            for k, blob in sorted(zip(keys, accs)):
                acc = pickle.loads(blob)
                if k in merged:
                    merged[k].merge(acc)
                else:
                    merged[k] = acc
            payload = pickle.dumps(sorted(merged.items()),
                                   protocol=pickle.HIGHEST_PROTOCOL)
            n = ray.get(shards[sid].apply_delta.remote(name, epoch, payload))
            return pa.table({"late": pa.array([0], type=pa.int64()),
                             "max_ts": pa.array([-math.inf]),
                             "keys": pa.array([int(n)], type=pa.int64()),
                             "entries": pa.array([pickle.dumps([])],
                                                 type=pa.binary())})

        import ray

        summaries = (
            data.map_batches(per_block, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(apply_group, batch_format="pyarrow")
            .take_all()
        )
        late_entries: list[dict] = []
        for row in summaries:
            self.metrics["late_dropped"] += int(row["late"])
            self._max_event_time = max(self._max_event_time,
                                       float(row["max_ts"]))
            if row.get("entries") is not None:
                late_entries.extend(pickle.loads(row["entries"]))
        if late_root is not None and not late_skip:
            self.sinks[f"{name}__late"].commit_files(
                epoch, late_entries, meta=self._meta(kind="late_rows"))
            self.metrics["late_routed"] += sum(
                e["rows"] for e in late_entries)

    def _changelog_distributed(self, op, name: str, epoch: int, data,
                               shard_method: str, to_table, kind: str,
                               state_name: str | None = None) -> int:
        """Distributed changelog epoch (UpsertToRetract and
        ``KeyedAggregation(emit_changelog=True)``) — the changelog sibling
        of ``_scatter_partials_distributed``: per-block partials ride one
        ``groupby(shard)`` shuffle; the per-shard group task merges them
        (deterministic key order), makes the single ``shard_method`` actor
        call, converts the returned deltas with ``to_table``, and writes
        them straight into the sink's epoch directory
        (``write_epoch_part``) — neither the epoch's input nor its
        changelog ever reside in driver memory; the driver commits only
        the manifest.  Returns committed delta rows.

        ``state_name`` lets a SIDE sink (early firing's ``<op>__early``)
        ride the op's own shard state: data commits under ``name``'s sink
        while the shard call targets ``state_name``."""
        from .sink import write_epoch_part

        state = name if state_name is None else state_name
        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        ts_col = getattr(op, "ts_col", None)
        finalized_before = self.watermark

        def per_block(tbl: pa.Table) -> pa.Table:
            part, _late = op.partial_batch(tbl, finalized_before)
            max_ts = -math.inf
            if ts_col and ts_col in tbl.column_names and tbl.num_rows:
                ts = _ts_to_float(tbl.select([ts_col]).to_pandas()[ts_col])
                if ts.size:
                    max_ts = float(ts.max())
            sids, keys, accs = [-1], [b""], [pickle.dumps(
                max_ts, protocol=pickle.HIGHEST_PROTOCOL)]
            for k, acc in part.items():
                sids.append(shard_of(k, num_shards))
                keys.append(k)
                accs.append(pickle.dumps(acc,
                                         protocol=pickle.HIGHEST_PROTOCOL))
            return pa.table({
                "__shard": pa.array(sids, type=pa.int64()),
                "__key": pa.array(keys, type=pa.binary()),
                "__acc": pa.array(accs, type=pa.binary()),
            })

        def apply_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            accs = g["__acc"].to_pylist()
            if sid == -1:
                max_ts = max(pickle.loads(b) for b in accs)
                return pa.table({"rows": pa.array([0], type=pa.int64()),
                                 "max_ts": pa.array([max_ts]),
                                 "entry": pa.array([""])})
            merged: dict[bytes, Any] = {}
            for k, blob in sorted(zip(g["__key"].to_pylist(), accs)):
                acc = pickle.loads(blob)
                if k in merged:
                    merged[k].merge(acc)
                else:
                    merged[k] = acc
            payload = pickle.dumps(sorted(merged.items()),
                                   protocol=pickle.HIGHEST_PROTOCOL)
            deltas = pickle.loads(ray.get(getattr(
                shards[sid], shard_method).remote(state, epoch, payload)))
            tbl = to_table(deltas, epoch)
            if not tbl.num_rows:  # empty parts add nothing; skip the file
                return pa.table({"rows": pa.array([0], type=pa.int64()),
                                 "max_ts": pa.array([-math.inf]),
                                 "entry": pa.array([""])})
            entry = write_epoch_part(
                sink_root, epoch, tbl, tag=f"shard{sid:04d}", fsync=do_fsync)
            return pa.table({"rows": pa.array([entry["rows"]],
                                              type=pa.int64()),
                             "max_ts": pa.array([-math.inf]),
                             "entry": pa.array([json.dumps(entry)])})

        summaries = (
            data.map_batches(per_block, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(apply_group, batch_format="pyarrow")
            .take_all()
        )
        files = []
        for row in summaries:
            self._max_event_time = max(self._max_event_time,
                                       float(row["max_ts"]))
            if row["entry"]:
                files.append(json.loads(row["entry"]))
        self.sinks[name].commit_files(epoch, files,
                                      meta=self._meta(kind=kind))
        return sum(f["rows"] for f in files)

    def _scatter_points_distributed(self, op, name: str, epoch: int, data,
                                    kind: str) -> None:
        """Shard-direct scatter for session/pattern Dataset epochs — the
        list-payload sibling of ``_scatter_partials_distributed``: per-block
        points (sessions pre-compressed to intervals, pattern events raw but
        window-bounded) ride one ``groupby(shard)`` shuffle to a single
        per-shard apply call; the driver sees only summary rows."""
        num_shards = self.store.num_shards
        shards = self.store.shards
        wm = self.watermark
        gap = getattr(op, "gap", None)
        ts_col = op.ts_col
        from .state_store import StateShard, shard_of

        def per_block(tbl: pa.Table) -> pa.Table:
            pts, late = op.points_batch(tbl, wm)
            if kind == "session":
                # insert-only sessions compress to intervals per block;
                # "session_delta" (retractable) and "pattern" payloads stay
                # raw point lists (concatenation-mergeable)
                pts = {k: StateShard.build_sessions(v, gap)
                       for k, v in pts.items()}
            max_ts = -math.inf
            if ts_col in tbl.column_names and tbl.num_rows:
                ts = _ts_to_float(tbl.select([ts_col]).to_pandas()[ts_col])
                if ts.size:
                    max_ts = float(ts.max())
            sids, keys, blobs = [-1], [b""], [pickle.dumps(
                (late, max_ts), protocol=pickle.HIGHEST_PROTOCOL)]
            for k, v in pts.items():
                sids.append(shard_of(k, num_shards))
                keys.append(k)
                blobs.append(pickle.dumps(v, protocol=pickle.HIGHEST_PROTOCOL))
            return pa.table({
                "__shard": pa.array(sids, type=pa.int64()),
                "__key": pa.array(keys, type=pa.binary()),
                "__acc": pa.array(blobs, type=pa.binary()),
            })

        def apply_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            accs = g["__acc"].to_pylist()
            if sid == -1:
                lates, max_ts = 0, -math.inf
                for blob in accs:
                    late, mt = pickle.loads(blob)
                    lates += late
                    max_ts = max(max_ts, mt)
                return pa.table({"late": pa.array([lates], type=pa.int64()),
                                 "max_ts": pa.array([max_ts]),
                                 "keys": pa.array([0], type=pa.int64())})
            merged: dict[bytes, list] = {}
            for k, blob in sorted(zip(g["__key"].to_pylist(), accs)):
                v = pickle.loads(blob)
                if k not in merged:
                    merged[k] = v
                elif kind == "session":
                    merged[k] = StateShard.merge_session_lists(merged[k], v)
                else:
                    merged[k] = sorted(merged[k] + v)
            payload = pickle.dumps(sorted(merged.items()),
                                   protocol=pickle.HIGHEST_PROTOCOL)
            if kind == "session":
                n = ray.get(shards[sid].apply_session_points.remote(
                    name, epoch, payload, gap))
            elif kind == "session_delta":
                n = ray.get(shards[sid].apply_session_point_deltas.remote(
                    name, epoch, payload))
            else:
                n = ray.get(shards[sid].apply_pattern_points.remote(
                    name, epoch, payload))
            return pa.table({"late": pa.array([0], type=pa.int64()),
                             "max_ts": pa.array([-math.inf]),
                             "keys": pa.array([int(n)], type=pa.int64())})

        summaries = (
            data.map_batches(per_block, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(apply_group, batch_format="pyarrow")
            .take_all()
        )
        for row in summaries:
            self.metrics["late_dropped"] += int(row["late"])
            self._max_event_time = max(self._max_event_time,
                                       float(row["max_ts"]))

    def _neardup_distributed(self, op: "StreamNearDup", name: str,
                             epoch: int, data) -> tuple[list, int]:
        """Dataset-epoch StreamNearDup: per-block signature + band-bucket
        derivation in ``map_batches``, ONE ``groupby(shard)`` shuffle to
        the bucket registers, one actor call per (shard, epoch); the
        driver collects only the emitted candidate pairs (the op's
        output) and the drop counts."""
        num_shards = self.store.num_shards
        shards = self.store.shards
        wm = self.watermark
        threshold, cap = op.threshold, op.bucket_cap
        from .state_store import shard_of

        def per_block(tbl: pa.Table) -> pa.Table:
            offers, _ = op.points_batch(tbl, wm)
            sids, keys, blobs = [], [], []
            for k, v in offers.items():
                sids.append(shard_of(k, num_shards))
                keys.append(k)
                blobs.append(pickle.dumps(v,
                                          protocol=pickle.HIGHEST_PROTOCOL))
            return pa.table({
                "__shard": pa.array(sids, type=pa.int64()),
                "__key": pa.array(keys, type=pa.binary()),
                "__acc": pa.array(blobs, type=pa.binary()),
            })

        def apply_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            merged: dict[bytes, list] = {}
            for k, blob in sorted(zip(g["__key"].to_pylist(),
                                      g["__acc"].to_pylist())):
                v = pickle.loads(blob)
                merged[k] = sorted(merged.get(k, []) + v)
            blob = ray.get(shards[sid].apply_neardup_offers.remote(
                name, epoch,
                pickle.dumps(sorted(merged.items()),
                             protocol=pickle.HIGHEST_PROTOCOL),
                threshold, cap))
            pairs, drops = pickle.loads(blob)
            return pa.table({
                "id_lo": pa.array([p[0] for p in pairs] + [-1],
                                  type=pa.int64()),
                "id_hi": pa.array([p[1] for p in pairs] + [-1],
                                  type=pa.int64()),
                "est": pa.array([p[2] for p in pairs] + [float(drops)]),
            })

        rows = (data.map_batches(per_block, batch_format="pyarrow")
                .groupby("__shard")
                .map_groups(apply_group, batch_format="pyarrow")
                .take_all())
        pairs = sorted((int(r["id_lo"]), int(r["id_hi"]), float(r["est"]))
                       for r in rows if r["id_lo"] >= 0)
        drops = int(sum(r["est"] for r in rows if r["id_lo"] < 0))
        return pairs, drops

    def _distributed_join_epoch(self, op: "StreamJoin", name: str, epoch: int,
                                left, right) -> int:
        """Distributed StreamJoin epoch (VERDICT r1 fix: the driver is out of
        the data path entirely).

        Each side's Dataset is partitioned in ``map_batches`` (per-shard
        pickled sub-frames keyed by the same positional hash as the Table
        path); ONE ``groupby(shard)`` shuffle co-locates both sides per
        shard; the group task makes the single ``join_insert_probe`` actor
        call and writes its matches straight into the sink's epoch directory
        (``write_epoch_part``), returning only a manifest entry.  The driver
        commits the manifest — per-epoch input AND output never reside in
        driver memory.  Returns committed match rows.
        """
        import ray
        import ray.data as rd

        from .sink import write_epoch_part

        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        lk, rk = list(op.left_key), list(op.right_key)
        out_names = list(dict.fromkeys(lk + list(op.left_cols)
                                       + list(op.right_cols)))

        def part_fn(side: str, keys: list):
            def f(tbl: pa.Table) -> pa.Table:
                pdf = op._side_frame(tbl, side)
                sids_out, blobs = [], []
                if len(pdf):
                    h = pd.util.hash_pandas_object(pdf[keys],
                                                   index=False).to_numpy()
                    sid = (h % np.uint64(num_shards)).astype(np.int64)
                    for s in np.unique(sid):
                        sids_out.append(int(s))
                        blobs.append(pickle.dumps(
                            pdf[sid == s].reset_index(drop=True),
                            protocol=pickle.HIGHEST_PROTOCOL,
                        ))
                return pa.table({
                    "__shard": pa.array(sids_out, type=pa.int64()),
                    "__jside": pa.array([side] * len(sids_out),
                                        type=pa.string()),
                    "__blob": pa.array(blobs, type=pa.binary()),
                })
            return f

        parts = None
        for side, keys, data in (("left", lk, left), ("right", rk, right)):
            if data is None:
                continue
            dsd = rd.from_arrow(data) if isinstance(data, pa.Table) else data
            p = dsd.map_batches(part_fn(side, keys), batch_format="pyarrow")
            parts = p if parts is None else parts.union(p)
        if parts is None:
            return 0

        def probe_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            us = (op.unmatched_sides()
                  if hasattr(op, "unmatched_sides") else ())
            payload: dict[str, Any] = {
                "left_key": lk, "right_key": rk,
                "max_dt": getattr(op, "max_dt", None),
                "track": "left" in us,
                "track_right": "right" in us}
            jsides = g["__jside"].to_pylist()
            gblobs = g["__blob"].to_pylist()
            for side in ("left", "right"):
                blobs = sorted(b for s, b in zip(jsides, gblobs)
                               if s == side)
                if blobs:
                    payload[side] = pd.concat(
                        [pickle.loads(b) for b in blobs], ignore_index=True
                    )
            blob = ray.get(shards[sid].join_insert_probe.remote(
                name, epoch, pickle.dumps(payload,
                                          protocol=pickle.HIGHEST_PROTOCOL)
            ))
            df = pickle.loads(blob)
            if df is None or not len(df):
                return pa.table({"rows": pa.array([], type=pa.int64()),
                                 "entry": pa.array([], type=pa.string())})
            out = df[out_names].copy()
            out["diff"] = (df["__diff_left"] * df["__diff_right"]).astype(
                np.int64)
            out["epoch"] = np.int64(epoch)
            entry = write_epoch_part(
                sink_root, epoch,
                pa.Table.from_pandas(out, preserve_index=False),
                tag=f"shard{sid:04d}", fsync=do_fsync,
            )
            return pa.table({"rows": pa.array([entry["rows"]],
                                              type=pa.int64()),
                             "entry": pa.array([json.dumps(entry)])})

        entries = (
            parts.groupby("__shard")
            .map_groups(probe_group, batch_format="pyarrow")
            .take_all()
        )
        files = [json.loads(r["entry"]) for r in entries]
        self.sinks[name].commit_files(epoch, files, meta=self._meta(kind="join"))
        return sum(f["rows"] for f in files)

    def _distributed_asof_epoch(self, op: "AsofStreamJoin", name: str,
                                epoch: int, left, right) -> int:
        """Distributed AsofStreamJoin epoch — the `_distributed_join_epoch`
        plan verbatim (per-block key-hash partition, ONE ``groupby(shard)``
        shuffle co-locating both sides, the group task making the single
        ``asof_insert_probe`` actor call and writing its ±diff emissions
        straight into the sink's epoch directory); the driver commits only
        the manifest."""
        import ray
        import ray.data as rd

        from .sink import write_epoch_part

        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        keys = list(op.left_key)
        out_names = op.out_names()
        right_cols = list(op.right_cols)
        track_um = bool(op.emit_unmatched)
        tol = op.max_dt
        usink_root = (str(self.sinks[f"{name}__unmatched"].root)
                      if track_um else None)
        left_ts_name = op.left_ts
        left_names = [c for c in out_names if c not in right_cols]

        def part_fn(side: str):
            def f(tbl: pa.Table) -> pa.Table:
                pdf = op._side_frame(tbl, side)
                sids_out, blobs = [], []
                if len(pdf):
                    h = pd.util.hash_pandas_object(pdf[keys],
                                                   index=False).to_numpy()
                    sid = (h % np.uint64(num_shards)).astype(np.int64)
                    for s in np.unique(sid):
                        sids_out.append(int(s))
                        blobs.append(pickle.dumps(
                            pdf[sid == s].reset_index(drop=True),
                            protocol=pickle.HIGHEST_PROTOCOL,
                        ))
                return pa.table({
                    "__shard": pa.array(sids_out, type=pa.int64()),
                    "__jside": pa.array([side] * len(sids_out),
                                        type=pa.string()),
                    "__blob": pa.array(blobs, type=pa.binary()),
                })
            return f

        parts = None
        for side, data in (("left", left), ("right", right)):
            if data is None:
                continue
            dsd = rd.from_arrow(data) if isinstance(data, pa.Table) else data
            p = dsd.map_batches(part_fn(side), batch_format="pyarrow")
            parts = p if parts is None else parts.union(p)
        if parts is None:
            return 0

        def probe_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            payload: dict[str, Any] = {
                "key": keys, "out_names": out_names,
                "right_cols": right_cols,
                "track_unmatched": track_um,
                "tolerance": tol}
            jsides = g["__jside"].to_pylist()
            gblobs = g["__blob"].to_pylist()
            for side in ("left", "right"):
                blobs = sorted(b for s2, b in zip(jsides, gblobs)
                               if s2 == side)
                if blobs:
                    payload[side] = pd.concat(
                        [pickle.loads(b) for b in blobs], ignore_index=True
                    )
            blob = ray.get(shards[sid].asof_insert_probe.remote(
                name, epoch, pickle.dumps(payload,
                                          protocol=pickle.HIGHEST_PROTOCOL)
            ))
            r = pickle.loads(blob)
            if isinstance(r, dict):
                df, udf = r.get("m"), r.get("u")
            else:
                df, udf = r, None
            recs = []
            if df is not None and len(df):
                out = df[out_names + ["diff"]].copy()
                out["epoch"] = np.int64(epoch)
                entry = write_epoch_part(
                    sink_root, epoch,
                    pa.Table.from_pandas(out, preserve_index=False),
                    tag=f"shard{sid:04d}", fsync=do_fsync,
                )
                recs.append((entry["rows"], json.dumps(entry), "m"))
            if udf is not None and len(udf):
                uo = udf[left_names].copy()
                if left_ts_name not in uo.columns:
                    uo[left_ts_name] = udf["__ts_left"].astype(np.float64)
                uo["diff"] = udf["diff"].astype(np.int64)
                uo["epoch"] = np.int64(epoch)
                uentry = write_epoch_part(
                    usink_root, epoch,
                    pa.Table.from_pandas(uo, preserve_index=False),
                    tag=f"shard{sid:04d}", fsync=do_fsync,
                )
                recs.append((uentry["rows"], json.dumps(uentry), "u"))
            if not recs:
                return pa.table({
                    "rows": pa.array([], type=pa.int64()),
                    "entry": pa.array([], type=pa.string()),
                    "chan": pa.array([], type=pa.string())})
            rws, ents, chans = zip(*recs)
            return pa.table({"rows": pa.array(list(rws), type=pa.int64()),
                             "entry": pa.array(list(ents)),
                             "chan": pa.array(list(chans))})

        entries = (
            parts.groupby("__shard")
            .map_groups(probe_group, batch_format="pyarrow")
            .take_all()
        )
        files = [json.loads(r["entry"]) for r in entries
                 if r["chan"] == "m"]
        self.sinks[name].commit_files(epoch, files,
                                      meta=self._meta(kind="asof_join"))
        if track_um:
            ufiles = [json.loads(r["entry"]) for r in entries
                      if r["chan"] == "u"]
            if ufiles:  # non-empty only (same rule as the Table path)
                self.sinks[f"{name}__unmatched"].commit_files(
                    epoch, ufiles,
                    meta=self._meta(kind="asof_unmatched"))
        return sum(f["rows"] for f in files)

    def _enrich_probe_epoch(self, op: "EnrichJoin", name: str, epoch: int,
                            stream) -> int:
        """Distributed enrich probe: stream blocks partition by the SAME
        ``shard_of(key_bytes)`` mapping the dim registers live under; one
        ``groupby(shard)`` shuffle co-locates each shard's events; the group
        task asks its shard actor for the current register values of just its
        UNIQUE keys, attaches the dim columns vectorized, and writes the
        enriched rows straight into the sink's epoch directory.  The driver
        commits only the manifest (same contract as the distributed
        StreamJoin path)."""
        import ray.data as rd

        from .sink import write_epoch_part
        from .state_store import shard_of

        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        # shared arrangement: probe the owning op's register table
        probe_name = op.share_from or name
        sk = list(op.key)
        carry = list(dict.fromkeys(
            sk + list(op.stream_cols)
            + ([op.stream_ts] if op.stream_ts else [])))
        dim_vals = list(op.dim_vals)
        dim_types = list(op.dim_types) if op.dim_types is not None else None
        stream_ts = op.stream_ts

        def part(tbl: pa.Table) -> pa.Table:
            pdf = tbl.select(carry).to_pandas()
            sids_out, blobs, maxts = [], [], []
            if len(pdf):
                # block max BEFORE partitioning so every event advances the
                # auto-watermark (same plumbing as the dedup probe)
                block_max = -math.inf
                if stream_ts is not None:
                    ts_all = _ts_to_float(pdf[stream_ts])
                    if ts_all.size:
                        block_max = float(ts_all.max())
                uniq = pdf[sk].drop_duplicates()
                kbs = [_key_bytes(t) for t in
                       uniq.itertuples(index=False, name=None)]
                uniq = uniq.assign(
                    __sid=[shard_of(kb, num_shards) for kb in kbs])
                pdf = pdf.merge(uniq, on=sk, how="left")
                for s, grp in pdf.groupby("__sid"):
                    sids_out.append(int(s))
                    blobs.append(pickle.dumps(
                        grp.drop(columns="__sid").reset_index(drop=True),
                        protocol=pickle.HIGHEST_PROTOCOL))
                    maxts.append(block_max)
            return pa.table({
                "__shard": pa.array(sids_out, type=pa.int64()),
                "__blob": pa.array(blobs, type=pa.binary()),
                "__maxts": pa.array(maxts, type=pa.float64()),
            })

        def probe_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            grp_max = float(pc.max(g["__maxts"]).as_py())
            ev = pd.concat([pickle.loads(b)
                            for b in sorted(g["__blob"].to_pylist())],
                           ignore_index=True)
            uniq = ev[sk].drop_duplicates()
            key_tuples = list(uniq.itertuples(index=False, name=None))
            kbs = [_key_bytes(t) for t in key_tuples]
            looked = pickle.loads(ray.get(shards[sid].enrich_probe.remote(
                probe_name,
                pickle.dumps(kbs, protocol=pickle.HIGHEST_PROTOCOL))))
            val_by_kb = dict(looked)
            # one list comprehension over unique keys, then a columnwise
            # unzip — no per-(key, col) Python inner loop
            vals = [val_by_kb.get(kb) for kb in kbs]
            lut = uniq.reset_index(drop=True)
            for i, c in enumerate(dim_vals):
                # keep object dtype: no int→float promotion on miss-nulls
                lut[c] = pd.Series(
                    [None if v is None else v[i] for v in vals],
                    dtype="object")
            out = ev.merge(lut, on=sk, how="left")
            out["epoch"] = np.int64(epoch)
            tbl_out = pa.Table.from_pandas(out, preserve_index=False)
            if dim_types is not None:
                for c, typ in zip(dim_vals, dim_types):
                    i = tbl_out.schema.get_field_index(c)
                    tbl_out = tbl_out.set_column(
                        i, c, tbl_out[c].cast(typ))
            entry = write_epoch_part(
                sink_root, epoch, tbl_out,
                tag=f"shard{sid:04d}", fsync=do_fsync,
            )
            return pa.table({"rows": pa.array([entry["rows"]],
                                              type=pa.int64()),
                             "entry": pa.array([json.dumps(entry)]),
                             "max_ts": pa.array([grp_max])})

        dsd = rd.from_arrow(stream) if isinstance(stream, pa.Table) else stream
        entries = (
            dsd.map_batches(part, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(probe_group, batch_format="pyarrow")
            .take_all()
        )
        files = [json.loads(r["entry"]) for r in entries]
        for r in entries:  # auto-watermark + dim_ttl sweeps fire from
            self._max_event_time = max(self._max_event_time,  # enrich traffic
                                       float(r["max_ts"]))
        self.sinks[name].commit_files(epoch, files, meta=self._meta(kind="enrich"))
        return sum(f["rows"] for f in files)

    def _enrich_block_probe_epoch(self, op: "EnrichJoin", name: str,
                                  epoch: int, stream) -> int:
        """Async-lookup enrich (``probe_mode="block"``): events NEVER move —
        each block looks up just its own unique keys from the shards (one
        parallel actor call per touched shard) and writes its enriched rows
        in place.  The skew-proof plan: a hot key's events stay spread
        across the input blocks instead of funneling through the one task
        that owns the key's shard group in the shuffle plan."""
        import uuid

        import ray.data as rd

        from .sink import write_epoch_part
        from .state_store import shard_of

        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        probe_name = op.share_from or name
        sk = list(op.key)
        carry = list(dict.fromkeys(
            sk + list(op.stream_cols)
            + ([op.stream_ts] if op.stream_ts else [])))
        dim_vals = list(op.dim_vals)
        dim_types = list(op.dim_types) if op.dim_types is not None else None
        stream_ts = op.stream_ts

        def per_block(tbl: pa.Table) -> pa.Table:
            pdf = tbl.select(carry).to_pandas()
            max_ts = -math.inf
            rows, entry = 0, None
            if len(pdf):
                if stream_ts is not None:
                    ts_all = _ts_to_float(pdf[stream_ts])
                    if ts_all.size:
                        max_ts = float(ts_all.max())
                uniq = pdf[sk].drop_duplicates().reset_index(drop=True)
                kbs = [_key_bytes(t) for t in
                       uniq.itertuples(index=False, name=None)]
                by_shard: dict[int, list[bytes]] = {}
                for kb in kbs:
                    by_shard.setdefault(shard_of(kb, num_shards),
                                        []).append(kb)
                refs = [shards[s].enrich_probe.remote(
                    probe_name,
                    pickle.dumps(ks, protocol=pickle.HIGHEST_PROTOCOL))
                    for s, ks in sorted(by_shard.items())]
                val_by_kb = dict(kv for blob in ray.get(refs)
                                 for kv in pickle.loads(blob))
                vals = [val_by_kb.get(kb) for kb in kbs]
                lut = uniq
                for i, c in enumerate(dim_vals):
                    lut[c] = pd.Series(
                        [None if v is None else v[i] for v in vals],
                        dtype="object")
                out = pdf.merge(lut, on=sk, how="left")
                out["epoch"] = np.int64(epoch)
                tbl_out = pa.Table.from_pandas(out, preserve_index=False)
                if dim_types is not None:
                    for c, typ in zip(dim_vals, dim_types):
                        i = tbl_out.schema.get_field_index(c)
                        tbl_out = tbl_out.set_column(
                            i, c, tbl_out[c].cast(typ))
                entry = write_epoch_part(
                    sink_root, epoch, tbl_out,
                    tag=f"b{uuid.uuid4().hex[:12]}", fsync=do_fsync)
                rows = entry["rows"]
            return pa.table({
                "rows": pa.array([rows], type=pa.int64()),
                "entry": pa.array([json.dumps(entry) if entry else ""],
                                  type=pa.string()),
                "max_ts": pa.array([max_ts], type=pa.float64()),
            })

        dsd = rd.from_arrow(stream) if isinstance(stream, pa.Table) else stream
        summaries = dsd.map_batches(per_block, batch_format="pyarrow"
                                    ).take_all()
        files = [json.loads(r["entry"]) for r in summaries if r["entry"]]
        for r in summaries:
            self._max_event_time = max(self._max_event_time,
                                       float(r["max_ts"]))
        self.sinks[name].commit_files(epoch, files,
                                      meta=self._meta(kind="enrich"))
        return sum(f["rows"] for f in files)

    def _broadcast_apply_epoch(self, op: "BroadcastEnrich", name: str,
                               epoch: int, stream) -> int:
        """The no-shuffle half of broadcast state: snapshot the live rules
        from the shards (tiny by contract), ``ray.put`` them ONCE, and map
        the event blocks where they already live — each task reads the one
        broadcast copy, runs the user hook, and writes its sink part
        directly.  No groupby, no repartition: event bytes never cross
        workers.  The driver commits only the manifest."""
        import uuid

        import ray.data as rd

        from .sink import write_epoch_part

        rules = op.rules_snapshot(self.store.collect(name))
        rules_ref = ray.put(rules)
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        apply_fn = op.apply
        stream_ts = op.stream_ts

        def per_block(tbl: pa.Table) -> pa.Table:
            max_ts = -math.inf
            if stream_ts and stream_ts in tbl.column_names and tbl.num_rows:
                ts = _ts_to_float(tbl.select([stream_ts])
                                  .to_pandas()[stream_ts])
                if ts.size:
                    max_ts = float(ts.max())
            out = apply_fn(tbl, ray.get(rules_ref))
            rows, entry = 0, None
            if out is not None and out.num_rows:
                out = out.append_column(
                    "epoch", pa.array([epoch] * out.num_rows,
                                      type=pa.int64()))
                entry = write_epoch_part(
                    sink_root, epoch, out,
                    tag=f"b{uuid.uuid4().hex[:12]}", fsync=do_fsync)
                rows = entry["rows"]
            return pa.table({
                "rows": pa.array([rows], type=pa.int64()),
                "entry": pa.array([json.dumps(entry) if entry else ""],
                                  type=pa.string()),
                "max_ts": pa.array([max_ts], type=pa.float64()),
            })

        dsd = rd.from_arrow(stream) if isinstance(stream, pa.Table) else stream
        summaries = dsd.map_batches(per_block, batch_format="pyarrow"
                                    ).take_all()
        files = [json.loads(r["entry"]) for r in summaries if r["entry"]]
        for r in summaries:
            self._max_event_time = max(self._max_event_time,
                                       float(r["max_ts"]))
        self.sinks[name].commit_files(epoch, files,
                                      meta=self._meta(kind="broadcast"))
        return sum(f["rows"] for f in files)

    def _temporal_probe_epoch(self, op: "TemporalEnrichJoin", name: str,
                              epoch: int, stream) -> int:
        """Distributed AS-OF probe (mirrors ``_enrich_probe_epoch``): stream
        blocks partition by the dim registers' ``shard_of(key_bytes)``
        mapping; the group task asks its shard for the version valid at each
        UNIQUE ``(key, event_time)`` pair and attaches the dim columns with
        one vectorized merge — per-shard probe cost is O(unique pairs), not
        O(rows), and the driver commits only the manifest."""
        import ray.data as rd

        from .sink import write_epoch_part
        from .state_store import shard_of

        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        sk = list(op.key)
        stream_ts = op.stream_ts
        carry = list(dict.fromkeys(sk + list(op.stream_cols) + [stream_ts]))
        dim_vals = list(op.dim_vals)
        dim_types = list(op.dim_types) if op.dim_types is not None else None

        def part(tbl: pa.Table) -> pa.Table:
            pdf = tbl.select(carry).to_pandas()
            sids_out, blobs, maxts = [], [], []
            if len(pdf):
                ts_all = _ts_to_float(pdf[stream_ts])
                block_max = float(ts_all.max()) if ts_all.size else -math.inf
                pdf = pdf.assign(__tsf=ts_all)
                uniq = pdf[sk].drop_duplicates()
                kbs = [_key_bytes(t) for t in
                       uniq.itertuples(index=False, name=None)]
                uniq = uniq.assign(
                    __sid=[shard_of(kb, num_shards) for kb in kbs])
                pdf = pdf.merge(uniq, on=sk, how="left")
                for s, grp in pdf.groupby("__sid"):
                    sids_out.append(int(s))
                    blobs.append(pickle.dumps(
                        grp.drop(columns="__sid").reset_index(drop=True),
                        protocol=pickle.HIGHEST_PROTOCOL))
                    maxts.append(block_max)
            return pa.table({
                "__shard": pa.array(sids_out, type=pa.int64()),
                "__blob": pa.array(blobs, type=pa.binary()),
                "__maxts": pa.array(maxts, type=pa.float64()),
            })

        def probe_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            grp_max = float(pc.max(g["__maxts"]).as_py())
            ev = pd.concat([pickle.loads(b)
                            for b in sorted(g["__blob"].to_pylist())],
                           ignore_index=True)
            uniq = ev[sk + ["__tsf"]].drop_duplicates()
            pair_keys = [(_key_bytes(t[:-1]), float(t[-1])) for t in
                         uniq.itertuples(index=False, name=None)]
            looked = pickle.loads(ray.get(shards[sid].temporal_probe.remote(
                name,
                pickle.dumps(pair_keys, protocol=pickle.HIGHEST_PROTOCOL))))
            val_by_pair = dict(looked)
            vals = [val_by_pair.get(p) for p in pair_keys]
            lut = uniq.reset_index(drop=True)
            for i, c in enumerate(dim_vals):
                # keep object dtype: no int→float promotion on miss-nulls
                lut[c] = pd.Series(
                    [None if v is None else v[i] for v in vals],
                    dtype="object")
            out = ev.merge(lut, on=sk + ["__tsf"], how="left").drop(
                columns="__tsf")
            out["epoch"] = np.int64(epoch)
            tbl_out = pa.Table.from_pandas(out, preserve_index=False)
            if dim_types is not None:
                for c, typ in zip(dim_vals, dim_types):
                    i = tbl_out.schema.get_field_index(c)
                    tbl_out = tbl_out.set_column(
                        i, c, tbl_out[c].cast(typ))
            entry = write_epoch_part(
                sink_root, epoch, tbl_out,
                tag=f"shard{sid:04d}", fsync=do_fsync,
            )
            return pa.table({"rows": pa.array([entry["rows"]],
                                              type=pa.int64()),
                             "entry": pa.array([json.dumps(entry)]),
                             "max_ts": pa.array([grp_max])})

        dsd = rd.from_arrow(stream) if isinstance(stream, pa.Table) else stream
        entries = (
            dsd.map_batches(part, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(probe_group, batch_format="pyarrow")
            .take_all()
        )
        files = [json.loads(r["entry"]) for r in entries]
        for r in entries:  # probe traffic advances the auto-watermark
            self._max_event_time = max(self._max_event_time,
                                       float(r["max_ts"]))
        self.sinks[name].commit_files(epoch, files,
                                      meta=self._meta(kind="temporal"))
        return sum(f["rows"] for f in files)

    @staticmethod
    def _dedup_winners_frame(op: "StreamDedup", pdf: pd.DataFrame
                             ) -> pd.DataFrame:
        """Per-key minimum-(ts, tiebreak) candidate rows of a slice: stable
        sort by (float ts, *order_cols) then first-per-key.  Adds ``__ts``
        (float event time) and ``__kb`` (key bytes) working columns."""
        sk = list(op.key)
        pdf = pdf.assign(__ts=_ts_to_float(pdf[op.ts_col]))
        pdf = pdf.sort_values(["__ts", *op.order_cols], kind="mergesort")
        win = pdf.drop_duplicates(subset=sk, keep="first").copy()
        win["__kb"] = [_key_bytes(t) for t in
                       win[sk].itertuples(index=False, name=None)]
        return win

    @staticmethod
    def _dedup_claims(op: "StreamDedup", win: pd.DataFrame
                      ) -> list[tuple[bytes, tuple]]:
        """(key_bytes, stamp) claim list for a winners frame; stamp =
        (float event time, tiebreak bytes from order_cols)."""
        if op.order_cols:
            tbs = [_key_bytes(t) for t in
                   win[list(op.order_cols)].itertuples(index=False,
                                                       name=None)]
        else:
            tbs = [b""] * len(win)
        return [(kb, (float(ts), tb)) for kb, ts, tb in
                zip(win["__kb"], win["__ts"], tbs)]

    def _dedup_table_epoch(self, op: "StreamDedup", name: str, epoch: int,
                           tbl: pa.Table) -> pa.Table:
        """Driver micro-batch path: fold the epoch to per-key min candidates,
        one ``dedup_filter`` claim per shard, emit the winning rows."""
        cols = list(dict.fromkeys(
            list(op.key) + [op.ts_col] + list(op.order_cols)
            + list(op.carry)))
        self._observe_event_time(op, tbl)
        win = self._dedup_winners_frame(op, tbl.select(cols).to_pandas())
        shard_items: dict[int, list] = {}
        for kb, stamp in self._dedup_claims(op, win):
            sid = shard_of(kb, self.store.num_shards)
            shard_items.setdefault(sid, []).append((kb, stamp))
        winners = (self.store.dedup_filter(name, epoch, shard_items)
                   if shard_items else set())
        out = win[win["__kb"].isin(winners)].drop(columns=["__ts", "__kb"])
        out["epoch"] = np.int64(epoch)
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    def _dedup_probe_epoch(self, op: "StreamDedup", name: str, epoch: int,
                           stream) -> int:
        """Distributed path (mirrors ``_enrich_probe_epoch``): per-block
        pre-reduction to per-key min candidates, ONE ``groupby(shard)``
        shuffle of candidates only (duplicates die in their block), the
        per-shard group re-reduces across blocks and makes the shard's
        single claim call, winners are written straight to the sink's epoch
        directory by the workers; the driver commits only the manifest."""
        import ray.data as rd

        from .sink import write_epoch_part

        num_shards = self.store.num_shards
        shards = self.store.shards
        sink_root = str(self.sinks[name].root)
        do_fsync = self.sinks[name].fsync
        cols = list(dict.fromkeys(
            list(op.key) + [op.ts_col] + list(op.order_cols)
            + list(op.carry)))
        mk_win, mk_claims = self._dedup_winners_frame, self._dedup_claims

        def part(tbl: pa.Table) -> pa.Table:
            sids_out, blobs, maxts = [], [], []
            if tbl.num_rows:
                pdf = tbl.select(cols).to_pandas()
                # block max BEFORE the per-key reduction: dropped duplicates
                # still advance the auto-watermark
                ts_all = _ts_to_float(pdf[op.ts_col])
                block_max = float(ts_all.max()) if ts_all.size else -math.inf
                win = mk_win(op, pdf)
                win["__sid"] = [shard_of(kb, num_shards)
                                for kb in win["__kb"]]
                for s, grp in win.groupby("__sid"):
                    sids_out.append(int(s))
                    blobs.append(pickle.dumps(
                        grp.drop(columns="__sid").reset_index(drop=True),
                        protocol=pickle.HIGHEST_PROTOCOL))
                    maxts.append(block_max)
            return pa.table({
                "__shard": pa.array(sids_out, type=pa.int64()),
                "__blob": pa.array(blobs, type=pa.binary()),
                "__maxts": pa.array(maxts, type=pa.float64()),
            })

        def probe_group(g: pa.Table) -> pa.Table:
            sid = g["__shard"][0].as_py()
            grp_max = float(pc.max(g["__maxts"]).as_py())
            cand = pd.concat([pickle.loads(b)
                            for b in sorted(g["__blob"].to_pylist())],
                             ignore_index=True)
            # cross-block re-reduction: the shard claim must see the per-key
            # min over the WHOLE (shard, epoch) slice for determinism
            cand = (cand.sort_values(["__ts", *op.order_cols],
                                     kind="mergesort")
                    .drop_duplicates(subset=list(op.key), keep="first"))
            items = mk_claims(op, cand)
            winners = pickle.loads(ray.get(shards[sid].dedup_filter.remote(
                name, epoch,
                pickle.dumps(items, protocol=pickle.HIGHEST_PROTOCOL))))
            out = cand[cand["__kb"].isin(set(winners))].drop(
                columns=["__ts", "__kb"])
            out["epoch"] = np.int64(epoch)
            tbl_out = pa.Table.from_pandas(out.reset_index(drop=True),
                                           preserve_index=False)
            entry = write_epoch_part(sink_root, epoch, tbl_out,
                                     tag=f"shard{sid:04d}", fsync=do_fsync)
            return pa.table({"rows": pa.array([entry["rows"]],
                                              type=pa.int64()),
                             "entry": pa.array([json.dumps(entry)]),
                             "max_ts": pa.array([grp_max])})

        dsd = rd.from_arrow(stream) if isinstance(stream, pa.Table) else stream
        entries = (
            dsd.map_batches(part, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(probe_group, batch_format="pyarrow")
            .take_all()
        )
        files = [json.loads(r["entry"]) for r in entries]
        for r in entries:  # auto-watermark works for Dataset epochs too
            self._max_event_time = max(self._max_event_time,
                                       float(r["max_ts"]))
        self.sinks[name].commit_files(epoch, files,
                                      meta=self._meta(kind="dedup"))
        return sum(f["rows"] for f in files)

    def process_epoch(self, epoch: int, inputs: dict[str, pa.Table | Any],
                      watermark: float | None = None,
                      lineage: dict | None = None,
                      source_watermarks: dict[str, float] | None = None
                      ) -> dict:
        """Apply one micro-batch; optionally advance the watermark after.

        ``inputs``: {input_name: Arrow table | Ray Dataset}.  Deltas carry an
        optional ``diff`` column (+1/−1) for retractions (KeyedAggregation
        with ``weight_col='diff'``).

        ``source_watermarks``: {source_name: watermark} per-source frontier
        reports.  Each source's watermark only ratchets upward; the SESSION
        watermark then advances to the minimum over all non-idle tracked
        sources (multi-input alignment — a union or join of streams is only
        as complete as its slowest input).  A source that reports here, or
        appears in ``inputs`` with data, is un-idled.  An explicit
        ``watermark=`` still overrides (single-source sessions keep their
        API unchanged).

        ``lineage``: caller-supplied description of WHERE this epoch's rows
        came from (source paths / shard ids / offsets) — stamped verbatim
        into every sink manifest this epoch commits (and into subsequent
        watermark-advance commits until the next epoch), giving each output
        partition a durable input-lineage record.
        """
        self.current_lineage = lineage
        # In-session dataflow chaining: an op that emits DURING the epoch
        # (changelog, joins, enrich, dedup, components) publishes its output
        # under its own name, so ops declared AFTER it can consume it as an
        # input in the SAME process_epoch call — e.g. UpsertToRetract("chg")
        # feeding KeyedAggregation(input="chg", weight_col="diff") is an
        # incrementally-maintained GROUP BY over a CDC table.  Watermark-
        # driven emissions (window closes, sweeps) happen AFTER the loop and
        # do not chain within the epoch — feed those back explicitly.
        # Caller inputs shadow nothing: op names must not collide with
        # source names (ops dict + inputs dict share the namespace here).
        avail: dict[str, Any] = dict(inputs)
        # caller-fed Table micro-batches count toward input_rows here;
        # Dataset epochs stream worker-side without a driver row count (an
        # extra count() pass would re-execute the plan) — their volumes are
        # recorded per-op in the sink manifests instead
        self.metrics["input_rows"] += sum(
            t.num_rows for t in inputs.values() if isinstance(t, pa.Table))
        chain_to = avail  # close over for the mirroring dict below

        class _ChainedEmits(dict):
            def __setitem__(self, k, v):
                # feeding an op's OUTPUT name from the caller is the view-
                # bootstrap pattern (hydrate a new downstream op from a
                # snapshot) — legal exactly when the op emits nothing that
                # epoch; if it DOES emit, silently replacing the caller's
                # rows (or theirs replacing ours) would corrupt the chain
                if k in inputs:
                    raise ValueError(
                        f"input {k!r} was fed by the caller AND emitted by "
                        "an op this epoch — hydrate in an epoch where the "
                        "op has no input of its own")
                super().__setitem__(k, v)
                chain_to[k] = v

        emitted: dict[str, pa.Table] = _ChainedEmits()
        for name, op in self.ops.items():
            if isinstance(op, KeyedAggregation):
                if op.input not in avail:
                    continue
                data = avail[op.input]
                if op.emit_changelog:
                    # the aggregate's OWN ±1 changelog: old/new finalized
                    # values per touched key, committed per epoch (chains
                    # into later-declared differential consumers)
                    if isinstance(data, pa.Table):
                        merged = self._merged_partials(op, data,
                                                       self.watermark)
                        pairs = self.store.apply_delta_changelog(
                            name, epoch, merged)
                        out_tbl = op.changelog_to_table(pairs, epoch)
                        self.sinks[name].commit_tables(
                            epoch, [out_tbl],
                            meta=self._meta(kind="agg_changelog"))
                        emitted[name] = out_tbl
                        self.metrics["emitted_rows"] += out_tbl.num_rows
                    else:
                        n = self._changelog_distributed(
                            op, name, epoch, data, "apply_delta_changelog",
                            op.changelog_to_table, kind="agg_changelog")
                        emitted[name] = self.sinks[name].read_committed(
                            epochs=[epoch])
                        self.metrics["emitted_rows"] += n
                elif op.early_firing:
                    # same single state apply, but through the changelog
                    # surface: the touched open windows' (old, new) partial
                    # aggregates emit as ±1 rows into the __early side sink;
                    # the on-close emission later reads the SAME store
                    if isinstance(data, pa.Table):
                        merged = self._merged_partials(op, data,
                                                       self.watermark)
                        pairs = self.store.apply_delta_changelog(
                            name, epoch, merged)
                        out_tbl = op.changelog_to_table(pairs, epoch)
                        self.sinks[f"{name}__early"].commit_tables(
                            epoch, [out_tbl],
                            meta=self._meta(kind="early_firing"))
                        emitted[f"{name}__early"] = out_tbl
                        self.metrics["emitted_rows"] += out_tbl.num_rows
                    else:
                        n = self._changelog_distributed(
                            op, f"{name}__early", epoch, data,
                            "apply_delta_changelog", op.changelog_to_table,
                            kind="early_firing", state_name=name)
                        emitted[f"{name}__early"] = \
                            self.sinks[f"{name}__early"].read_committed(
                                epochs=[epoch])
                        self.metrics["emitted_rows"] += n
                elif isinstance(data, pa.Table):
                    if op.late_output:
                        data, late_tbl = op.split_late(data, self.watermark)
                        lsink = self.sinks[f"{name}__late"]
                        if not lsink.is_committed(epoch):
                            self.metrics["late_routed"] += late_tbl.num_rows
                        lsink.commit_tables(
                            epoch, [late_tbl],
                            meta=self._meta(kind="late_rows"))
                        emitted[f"{name}__late"] = late_tbl
                    merged = self._merged_partials(op, data, self.watermark)
                    self.store.apply_deltas(name, epoch, merged,
                                            wait=not self.pipelined)
                else:  # Dataset epoch: shard-direct, no driver key merge
                    self._scatter_partials_distributed(
                        op, name, epoch, data, self.watermark
                    )
            elif isinstance(op, SessionWindowAggregation):
                if op.input not in avail:
                    continue
                data = avail[op.input]
                if op.retractable and isinstance(data, pa.Table):
                    points, late = op.points_batch(data, self.watermark)
                    self.metrics["late_dropped"] += late
                    self._observe_event_time(op, data)
                    self.store.apply_session_point_deltas(
                        name, epoch, points, wait=not self.pipelined)
                elif op.retractable:
                    # Dataset epoch of (ts, value, diff) point deltas:
                    # shard-direct like every other keyed payload
                    self._scatter_points_distributed(op, name, epoch, data,
                                                     kind="session_delta")
                elif isinstance(data, pa.Table):
                    points, late = op.points_batch(data, self.watermark)
                    self.metrics["late_dropped"] += late
                    self._observe_event_time(op, data)
                    self.store.apply_session_points(name, epoch, points,
                                                    op.gap,
                                                    wait=not self.pipelined)
                else:
                    # shard-direct: per-block local sessions (raw rows
                    # compress to intervals before leaving workers) ride one
                    # groupby(shard) shuffle straight to the shard actors —
                    # no driver-side per-key merge
                    self._scatter_points_distributed(op, name, epoch, data,
                                                     kind="session")
                if op.early_firing:
                    # speculative changelog of the epoch's touched OPEN
                    # sessions (fences the applies above first); a cross-
                    # epoch merge retracts both prior partials
                    rows = self.store.emit_early_sessions(
                        name, op.gap, op.retractable)
                    out_tbl = op.early_rows_to_table(rows, epoch)
                    self.sinks[f"{name}__early"].commit_tables(
                        epoch, [out_tbl], meta=self._meta(kind="session_early"))
                    emitted[f"{name}__early"] = out_tbl
                    self.metrics["emitted_rows"] += out_tbl.num_rows
            elif isinstance(op, (PatternMatch, AbsenceDetect, KleenePattern)):
                if op.input not in avail:
                    continue
                data = avail[op.input]
                if isinstance(data, pa.Table):
                    points, late = op.points_batch(data, self.watermark)
                    self.metrics["late_dropped"] += late
                    self._observe_event_time(op, data)
                    self.store.apply_pattern_points(name, epoch, points,
                                                    wait=not self.pipelined)
                else:
                    # shard-direct: raw (window-bounded) pattern events ride
                    # one groupby(shard) shuffle straight to the shard actors
                    self._scatter_points_distributed(op, name, epoch, data,
                                                     kind="pattern")
            elif isinstance(op, IncrementalComponents):
                if op.input not in avail:
                    continue
                # edge deltas are narrow (16 B/row) and the union-find is one
                # logical graph: the epoch's edges collapse to a Table and
                # ride one actor call to the op's designated shard
                tbl = self._as_table(avail[op.input])
                deltas = self.store.apply_cc_edges(
                    op.name, epoch, op.edges_from(tbl))
                out_tbl = op.rows_to_table(deltas, epoch)
                self.sinks[name].commit_tables(
                    epoch, [out_tbl], meta=self._meta(kind="cc"))
                emitted[name] = out_tbl
                self.metrics["emitted_rows"] += out_tbl.num_rows
            elif isinstance(op, StreamNearDup):
                if op.input not in avail:
                    continue
                data = avail[op.input]
                if isinstance(data, pa.Table):
                    offers, _ = op.points_batch(data, self.watermark)
                    pairs, drops = self.store.apply_neardup(
                        name, epoch, offers, op.threshold, op.bucket_cap)
                else:
                    # distributed: signatures + band buckets derive per
                    # block, offers ride one groupby(shard) shuffle to the
                    # bucket registers; the driver sees only emitted pairs
                    pairs, drops = self._neardup_distributed(
                        op, name, epoch, data)
                if drops:
                    import logging

                    logging.getLogger(__name__).warning(
                        "StreamNearDup(%s) epoch %d: %d offers dropped by "
                        "bucket_cap=%d (hot buckets)", name, epoch, drops,
                        op.bucket_cap)
                out_tbl = op.rows_to_table(pairs, epoch)
                self.sinks[name].commit_tables(
                    epoch, [out_tbl], meta=self._meta(kind="neardup",
                                                      drops=drops))
                emitted[name] = out_tbl
                self.metrics["emitted_rows"] += out_tbl.num_rows
            elif isinstance(op, IncrementalReachability):
                if op.input not in avail:
                    continue
                tbl = self._as_table(avail[op.input])
                deltas = self.store.apply_reach_edges(
                    op.name, epoch, op.edges_from(tbl), op.sources)
                out_tbl = op.rows_to_table(deltas, epoch)
                self.sinks[name].commit_tables(
                    epoch, [out_tbl], meta=self._meta(kind="reach"))
                emitted[name] = out_tbl
                self.metrics["emitted_rows"] += out_tbl.num_rows
            elif isinstance(op, IncrementalPageRank):
                if op.input not in avail:
                    continue
                # same designated-shard contract as components; the rank
                # changelog commits per epoch and chains like any changelog
                tbl = self._as_table(avail[op.input])
                deltas = self.store.apply_pagerank_edges(
                    op.name, epoch, op.edges_from(tbl), op.damping,
                    op.tol, op.max_iters, op.emit_tol)
                out_tbl = op.rows_to_table(deltas, epoch)
                self.sinks[name].commit_tables(
                    epoch, [out_tbl], meta=self._meta(kind="pagerank"))
                emitted[name] = out_tbl
                self.metrics["emitted_rows"] += out_tbl.num_rows
            elif isinstance(op, UpsertToRetract):
                if op.input not in avail:
                    continue
                # Scd2History subclasses UpsertToRetract: same partial
                # contract and plumbing, different shard method + schema
                is_scd2 = isinstance(op, Scd2History)
                method = "apply_scd2" if is_scd2 else "apply_upsert_retract"
                kind = "scd2" if is_scd2 else "upsert"
                data = avail[op.input]
                if isinstance(data, pa.Table):
                    merged = self._merged_partials(op, data, self.watermark)
                    deltas = getattr(self.store, method)(name, epoch,
                                                         merged)
                    out_tbl = op.rows_to_table(deltas, epoch)
                    self.sinks[name].commit_tables(
                        epoch, [out_tbl], meta=self._meta(kind=kind))
                    emitted[name] = out_tbl
                    self.metrics["emitted_rows"] += out_tbl.num_rows
                else:
                    n = self._changelog_distributed(
                        op, name, epoch, data, method,
                        op.rows_to_table, kind=kind)
                    emitted[name] = self.sinks[name].read_committed(
                        epochs=[epoch])
                    self.metrics["emitted_rows"] += n
            elif isinstance(op, EnrichJoin):
                # shared arrangement: the owner op applied its upserts
                # earlier this epoch (add order = processing order), so
                # probes read the epoch-current registers; no dim state here
                dim = None if op.share_from else avail.get(op.dim_input)
                if dim is not None:
                    # upsert registers FIRST: epoch-e dim updates are visible
                    # to epoch-e events (both paths block until applied, and
                    # pipelined probes serialize behind the apply per actor)
                    if isinstance(dim, pa.Table):
                        merged = self._merged_partials(op, dim, self.watermark)
                        self.store.apply_deltas(name, epoch, merged,
                                                wait=not self.pipelined)
                    else:
                        self._scatter_partials_distributed(
                            op, name, epoch, dim, self.watermark)
                stream = avail.get(op.stream_input)
                if stream is not None:
                    if isinstance(op, TemporalEnrichJoin):
                        n = self._temporal_probe_epoch(op, name, epoch, stream)
                    elif op.probe_mode == "block":
                        n = self._enrich_block_probe_epoch(op, name, epoch,
                                                           stream)
                    else:
                        n = self._enrich_probe_epoch(op, name, epoch, stream)
                    emitted[name] = self.sinks[name].read_committed(
                        epochs=[epoch])
                    self.metrics["emitted_rows"] += n
            elif isinstance(op, BroadcastEnrich):
                rules = avail.get(op.rules_input)
                if rules is not None:
                    if not isinstance(rules, pa.Table):
                        # broadcast state is tiny by contract: materialize
                        # the rule epoch, enforcing the documented cap
                        parts = [p for p in ray.get(rules.to_arrow_refs())
                                 if p.num_rows]
                        rules = (pa.concat_tables(parts) if parts
                                 else None)
                    if rules is not None and \
                            rules.num_rows > op.max_rule_rows:
                        raise ValueError(
                            f"BroadcastEnrich {name!r}: rule epoch has "
                            f"{rules.num_rows} rows > max_rule_rows="
                            f"{op.max_rule_rows} — a rule stream this "
                            "large wants a keyed EnrichJoin, not "
                            "broadcast state")
                    if rules is not None:
                        # upsert registers FIRST: epoch-e rule changes are
                        # visible to epoch-e events
                        merged = self._merged_partials(op, rules,
                                                       self.watermark)
                        self.store.apply_deltas(name, epoch, merged,
                                                wait=True)
                stream = avail.get(op.stream_input)
                if stream is not None:
                    n = self._broadcast_apply_epoch(op, name, epoch, stream)
                    emitted[name] = self.sinks[name].read_committed(
                        epochs=[epoch])
                    self.metrics["emitted_rows"] += n
            elif isinstance(op, StreamDedup):
                data = avail.get(op.input)
                if data is None:
                    continue
                if isinstance(data, pa.Table):
                    tbl = self._dedup_table_epoch(op, name, epoch, data)
                    self.sinks[name].commit_tables(
                        epoch, [tbl], meta=self._meta(kind="dedup"))
                    emitted[name] = tbl
                    self.metrics["emitted_rows"] += tbl.num_rows
                else:
                    n = self._dedup_probe_epoch(op, name, epoch, data)
                    emitted[name] = self.sinks[name].read_committed(
                        epochs=[epoch])
                    self.metrics["emitted_rows"] += n
            elif isinstance(op, AsofStreamJoin):
                left_tbl = avail.get(op.left_input)
                right_tbl = avail.get(op.right_input)
                if any(d is not None and not isinstance(d, pa.Table)
                       for d in (left_tbl, right_tbl)):
                    n = self._distributed_asof_epoch(
                        op, name, epoch, left_tbl, right_tbl
                    )
                    emitted[name] = self.sinks[name].read_committed(
                        epochs=[epoch]
                    )
                    self.metrics["emitted_rows"] += n
                    continue
                payloads = op.shard_payloads(
                    left_tbl, right_tbl, self.store.num_shards
                )
                if payloads:
                    frames = self.store.asof_insert_probe(
                        name, epoch, payloads)
                    tbl = op.asof_to_table(frames["m"], epoch)
                    self.sinks[name].commit_tables(
                        epoch, [tbl], meta=self._meta(kind="asof_join"))
                    emitted[name] = tbl
                    self.metrics["emitted_rows"] += tbl.num_rows
                    if op.emit_unmatched and frames["u"]:
                        # non-empty only: an empty commit would occupy
                        # this epoch's id and starve the advance-sweep
                        utbl = op.unmatched_asof_to_table(
                            frames["u"], epoch)
                        self.sinks[f"{name}__unmatched"].commit_tables(
                            epoch, [utbl],
                            meta=self._meta(kind="asof_unmatched"))
                        emitted[f"{name}__unmatched"] = utbl
                        self.metrics["emitted_rows"] += utbl.num_rows
            elif isinstance(op, StreamJoin):
                left_tbl = avail.get(op.left_input)
                right_tbl = avail.get(op.right_input)
                if any(d is not None and not isinstance(d, pa.Table)
                       for d in (left_tbl, right_tbl)):
                    # Dataset epoch: distributed partition + shard-side probe
                    # + worker-written sink parts; driver sees metadata only
                    n = self._distributed_join_epoch(
                        op, name, epoch, left_tbl, right_tbl
                    )
                    emitted[name] = self.sinks[name].read_committed(
                        epochs=[epoch]
                    )
                    self.metrics["emitted_rows"] += n
                    continue
                payloads = op.shard_payloads(
                    left_tbl, right_tbl, self.store.num_shards
                )
                if payloads:
                    frames = self.store.join_insert_probe(name, epoch, payloads)
                    tbl = op.matches_to_table(frames, epoch)
                    self.sinks[name].commit_tables(epoch, [tbl], meta=self._meta(kind="join"))
                    emitted[name] = tbl
                    self.metrics["emitted_rows"] += tbl.num_rows

        if source_watermarks:
            for s, wm in source_watermarks.items():
                self.source_watermarks[s] = max(
                    self.source_watermarks.get(s, -math.inf), float(wm))
                self.idle_sources.discard(s)
        for s in inputs:
            self.idle_sources.discard(s)  # fresh data un-idles a source
        if watermark is None and self.source_watermarks:
            live = [wm for s, wm in self.source_watermarks.items()
                    if s not in self.idle_sources]
            if live:  # all-idle → frontier holds (no source vouches for it)
                watermark = min(live)

        if watermark is None and self.auto_watermark_delay is not None:
            # keyed/session op paths above already fed _max_event_time for
            # Table AND Dataset inputs; join sides are sampled here
            for name, op in self.ops.items():
                if isinstance(op, StreamJoin):
                    for inp, ts_col in ((op.left_input, op.left_ts),
                                        (op.right_input, op.right_ts)):
                        if ts_col and inp in inputs and inputs[inp] is not None:
                            data = inputs[inp]
                            tbl = (data if isinstance(data, pa.Table)
                                   else None)
                            if tbl is not None and ts_col in tbl.column_names:
                                ts = _ts_to_float(tbl.to_pandas()[ts_col])
                                if ts.size:
                                    self._max_event_time = max(
                                        self._max_event_time, float(ts.max())
                                    )
            if self._max_event_time > -math.inf:
                watermark = self._max_event_time - self.auto_watermark_delay

        if watermark is not None:
            self.advance_watermark(epoch, watermark, emitted)

        self.last_epoch = epoch
        self.metrics["epochs"] += 1
        if self.checkpoint_every and (epoch % self.checkpoint_every == 0):
            self.checkpoint(epoch)
        if (self.consolidate_every
                and epoch >= self._replay_floor
                and (epoch + 1) % self.consolidate_every == 0):
            # DD arrangement compaction on a cadence: net the changelog
            # sinks' committed ±diff history into a snapshot — running sum
            # (the live table) unchanged, sink storage drops to O(live
            # rows).  Replays skip this (their history may already be a
            # snapshot; re-netting it is pointless work).
            for name in self._changelog_sink_names():
                self.sinks[name].consolidate(upto_epoch=epoch)
        return emitted

    def _changelog_sink_names(self) -> list[str]:
        """Sinks holding pure ±diff changelogs (safe to consolidate):
        UpsertToRetract, IncrementalComponents, and any
        KeyedAggregation(emit_changelog=True) incl. threshold/distinct."""
        out = []
        for name, op in self.ops.items():
            if name not in self.sinks:
                continue
            if isinstance(op, (UpsertToRetract, IncrementalComponents)) or \
                    getattr(op, "emit_changelog", False):
                out.append(name)
        return out

    @staticmethod
    def _as_table(data) -> pa.Table:
        if isinstance(data, pa.Table):
            return data
        return pa.concat_tables(list(data.iter_batches(batch_format="pyarrow")))

    def advance_watermark(self, epoch: int, watermark: float,
                          emitted: dict | None = None) -> dict:
        """Frontier advance: close windows/sessions whose end (+ lateness)
        ≤ the new watermark, commit emissions under this epoch.

        Guard: a FRESH epoch whose sink manifest already exists means a
        second ``advance_watermark`` call under the same epoch — sweeping
        would drain state into a no-op commit and lose the emissions forever,
        so we raise BEFORE touching any shard.  Replayed epochs (below the
        resume floor) re-sweep deterministically into their existing
        manifests, which is the exactly-once path.
        """
        emitted = emitted if emitted is not None else {}
        if epoch >= self._replay_floor:
            new_wm = max(self.watermark, watermark)
            dup = []
            sweep_sinks = []  # (display name, sink) pairs that commit sweeps
            for n, o in self.ops.items():
                if isinstance(o, StreamJoin):
                    # its unmatched side sinks sweep
                    if "left" in o.unmatched_sides():
                        sweep_sinks.append((n, f"{n}__unmatched"))
                    if "right" in o.unmatched_sides():
                        sweep_sinks.append((n, f"{n}__unmatched_right"))
                elif not isinstance(o, (EnrichJoin, StreamDedup)):
                    sweep_sinks.append((n, n))
                    if isinstance(o, SessionWindowAggregation) and \
                            o.early_firing:
                        # the early side sink ALSO sweep-commits on advance
                        # (close retractions) — same fresh-epoch guard; an
                        # advance must use a fresh epoch id, not one the
                        # per-epoch early commit already used
                        sweep_sinks.append((n, f"{n}__early"))
            for n, sn in sweep_sinks:
                if sn not in self.sinks or not self.sinks[sn].is_committed(
                        epoch):
                    continue
                committed_wm = self.sinks[sn].manifest(epoch).get(
                    "meta", {}).get("watermark")
                # a pure RETRY (watermark ≤ the committed one) re-sweeps
                # nothing new and stays a safe idempotent no-op; a HIGHER
                # watermark would drain newly-closed windows into a no-op
                # commit and lose them — refuse before touching any shard
                if committed_wm is None or new_wm > committed_wm:
                    dup.append(n)
            if dup:
                raise RuntimeError(
                    f"epoch {epoch} already committed for {dup} at a lower "
                    "watermark; advancing further must use a new epoch id"
                )
        self.watermark = max(self.watermark, watermark)
        for name, op in self.ops.items():
            if isinstance(op, KeyedAggregation) and op.window is not None:
                bound = self.watermark - op.window.allowed_lateness
                if op.window.use_panes and not op.early_firing:
                    items = self.store.sweep_sliding_panes(
                        name, bound, op.window.size, op.window.slide
                    )
                else:
                    items = self.store.sweep_closed_windows(name, bound)
                tbl = op.rows_to_table(items, epoch)
                self.sinks[name].commit_tables(
                    epoch, [tbl],
                    meta=self._meta(watermark=self.watermark, op=name,
                                    metrics=dict(self.metrics)),
                )
                emitted[name] = tbl
                self.metrics["emitted_rows"] += tbl.num_rows
            elif isinstance(op, SessionWindowAggregation):
                bound = self.watermark - op.allowed_lateness
                if op.retractable:
                    items = self.store.sweep_closed_retractable_sessions(
                        name, bound, op.gap, early=op.early_firing
                    )
                else:
                    items = self.store.sweep_closed_sessions(
                        name, bound, op.gap, early=op.early_firing)
                if op.early_firing:
                    items, early_rets = items
                    # each finally-emitted session leaves the speculative
                    # set: its −1 in the early stream keeps main + early
                    # running sums one consistent sessionization
                    ret_tbl = op.early_rows_to_table(early_rets, epoch)
                    self.sinks[f"{name}__early"].commit_tables(
                        epoch, [ret_tbl],
                        meta=self._meta(watermark=self.watermark, op=name),
                    )
                    emitted[f"{name}__early"] = ret_tbl
                    self.metrics["emitted_rows"] += ret_tbl.num_rows
                tbl = op.rows_to_table(items, epoch)
                self.sinks[name].commit_tables(
                    epoch, [tbl],
                    meta=self._meta(watermark=self.watermark, op=name,
                                    metrics=dict(self.metrics)),
                )
                emitted[name] = tbl
                self.metrics["emitted_rows"] += tbl.num_rows
            elif isinstance(op, PatternMatch):
                bound = self.watermark - op.allowed_lateness
                items = self.store.sweep_pattern_matches(
                    name, bound, list(op.pattern), op.within
                )
                tbl = op.rows_to_table(items, epoch)
                self.sinks[name].commit_tables(
                    epoch, [tbl],
                    meta=self._meta(watermark=self.watermark, op=name,
                                    metrics=dict(self.metrics)),
                )
                emitted[name] = tbl
                self.metrics["emitted_rows"] += tbl.num_rows
            elif isinstance(op, KleenePattern):
                bound = self.watermark - op.allowed_lateness
                items = self.store.sweep_kleene_matches(
                    name, bound, op.first, op.mid, op.last, op.within
                )
                tbl = op.rows_to_table(items, epoch)
                self.sinks[name].commit_tables(
                    epoch, [tbl],
                    meta=self._meta(watermark=self.watermark, op=name,
                                    metrics=dict(self.metrics)),
                )
                emitted[name] = tbl
                self.metrics["emitted_rows"] += tbl.num_rows
            elif isinstance(op, AbsenceDetect):
                bound = self.watermark - op.allowed_lateness
                items = self.store.sweep_absence(
                    name, bound, op.first, op.absent, op.within
                )
                tbl = op.rows_to_table(items, epoch)
                self.sinks[name].commit_tables(
                    epoch, [tbl],
                    meta=self._meta(watermark=self.watermark, op=name,
                                    metrics=dict(self.metrics)),
                )
                emitted[name] = tbl
                self.metrics["emitted_rows"] += tbl.num_rows
            elif isinstance(op, AsofStreamJoin):
                if op.emit_unmatched:
                    usink = self.sinks[f"{name}__unmatched"]
                    if usink.is_committed(epoch):
                        # this epoch's id carried in-epoch ± repairs; the
                        # sweep defers to the next advance — the bound is
                        # monotone and unswept rows stay eligible, so
                        # nothing is lost, only deferred
                        pass
                    else:
                        # sweep BEFORE expiry: a finalized unmatched left
                        # owes its +1 before retention may drop it
                        frames = self.store.asof_sweep_unmatched(
                            name, self.watermark)
                        tbl = op.unmatched_asof_to_table(frames, epoch)
                        usink.commit_tables(
                            epoch, [tbl],
                            meta=self._meta(watermark=self.watermark,
                                            op=name,
                                            kind="asof_unmatched"),
                        )
                        emitted[f"{name}__unmatched"] = tbl
                        self.metrics["emitted_rows"] += tbl.num_rows
                if op.retention is not None:
                    self.store.asof_expire(
                        name, self.watermark - op.retention)
            elif isinstance(op, StreamJoin):
                for s, suffix in (("left", "__unmatched"),
                                  ("right", "__unmatched_right")):
                    if s not in op.unmatched_sides():
                        continue
                    # sweep BEFORE expiry so retention == max_dt cannot
                    # silently delete a row owed an unmatched emission
                    frames = self.store.sweep_join_unmatched(
                        name, self.watermark - op.max_dt, side=s)
                    tbl = op.unmatched_to_table(frames, epoch, side=s)
                    self.sinks[f"{name}{suffix}"].commit_tables(
                        epoch, [tbl],
                        meta=self._meta(watermark=self.watermark, op=name,
                                        kind="join_unmatched"),
                    )
                    emitted[f"{name}{suffix}"] = tbl
                    self.metrics["emitted_rows"] += tbl.num_rows
                if op.retention is not None:
                    self.store.join_expire(name, self.watermark - op.retention)
            elif isinstance(op, TemporalEnrichJoin) and op.dim_ttl is not None:
                # compact, don't drop: the latest below-horizon version stays
                # probe-able for event times at/after the horizon
                self.store.compact_version_registers(
                    name, self.watermark - op.dim_ttl)
            elif isinstance(op, EnrichJoin) and op.dim_ttl is not None:
                self.store.sweep_stale_registers(
                    name, self.watermark - op.dim_ttl)
            elif isinstance(op, StreamDedup) and op.ttl is not None:
                self.store.sweep_stale_registers(
                    name, self.watermark - op.ttl)
        return emitted

    # ------------------------------------------------------------- inspection
    def state_table(self, name: str) -> pa.Table:
        """Current (non-windowed) per-key aggregates as an Arrow table —
        for ``UpsertToRetract``, the materialized latest-per-key table."""
        op = self.ops[name]
        fn = getattr(op, "state_to_table", None) or op.rows_to_table
        return fn(self.store.collect(name), self.last_epoch)

    def vector_topk(self, name: str, query_ids, query_mat, k: int = 5,
                    exclude_self: bool = True) -> pa.Table:
        """Similarity probe over a CDC-MAINTAINED vector index: ``name``
        must be an ``UpsertToRetract`` op whose value is an embedding (one
        list<float> val or d float vals) — its live LWW registers, spread
        across the shards, ARE the index partitions; upserts/updates/
        tombstones keep it current and this scans it.  Per-shard
        brute-force cosine partial top-k (vectorized matmul over shard-
        resident state), merged to the global top-k per query; driver
        traffic = shards × queries × k rows.  ``exclude_self`` drops a hit
        whose single-column key equals the query id (the ann_topk
        convention)."""
        op = self.ops[name]
        if not isinstance(op, UpsertToRetract):
            raise ValueError("vector_topk probes UpsertToRetract state")
        rows = self.store.vector_topk(name, list(query_ids), query_mat, k,
                                      exclude_self)
        arrays: dict[str, pa.Array] = {
            "query_id": pa.array([q for q, _, _, _ in rows], type=pa.int64())}
        for i, (c, t) in enumerate(zip(op.key, op.key_types)):
            arrays[c] = pa.array([key[i] for _, key, _, _ in rows], type=t)
        arrays["cos"] = pa.array([c for _, _, c, _ in rows],
                                 type=pa.float64())
        arrays["rank"] = pa.array([r for _, _, _, r in rows],
                                  type=pa.int64())
        return pa.table(arrays)

    def read_output(self, name: str) -> pa.Table:
        return self.sinks[name].read_committed_table()

    def stats(self) -> dict:
        """Observability: driver metrics + per-shard state sizes (keys per
        table, session keys, join buffer sizes) — the ``inspect`` surface."""
        return {"metrics": dict(self.metrics), "watermark": self.watermark,
                "shards": self.store.stats()}

    def route_late(self, epoch: int, inputs: dict,
                   ts_cols: dict[str, str], lateness: float = 0.0) -> dict:
        """Late-data SIDE OUTPUT (the Beam pattern): split each named input
        at the CURRENT session watermark − ``lateness`` — rows with event
        time ≤ that bound are droppably late (their windows/starts already
        finalized) — commit them to a per-input side sink
        (``<root>/_late_<input>``, exactly-once like every sink) stamped
        with the epoch and the watermark that condemned them, and return
        the on-time remainder to feed ``process_epoch``.  Instead of
        silently counting drops, the late rows stay queryable for repair /
        backfill / monitoring.

        Late rows are assumed FEW (they are the out-of-orderness tail), so
        a Dataset input pays one extra filter pass and the late slice
        collects to the driver for the side commit; the on-time side stays
        a lazy Dataset.  Replays re-commit identically (idempotent sink).
        Metrics: ``late_routed`` counts rows diverted here (the ops' own
        ``late_dropped`` then stays 0 for routed inputs, since they never
        see the late rows)."""
        bound = self.watermark - lateness
        out: dict[str, Any] = dict(inputs)
        for name, ts_col in ts_cols.items():
            data = inputs.get(name)
            if data is None:
                continue
            if isinstance(data, pa.Table):
                ts = _ts_to_float(data.select([ts_col]).to_pandas()[ts_col])
                mask = pa.array(ts > bound)
                on_time, late_tbl = data.filter(mask), data.filter(
                    pc.invert(mask))
            else:
                # bind per-iteration via default args: ``on_time`` is LAZY
                # (executes after this loop moves on), so a plain closure
                # over the loop variables would read the wrong input's col
                def flt(tbl: pa.Table, keep_on_time: bool,
                        _c=ts_col, _b=bound) -> pa.Table:
                    ts = _ts_to_float(tbl.select([_c]).to_pandas()[_c])
                    m = pa.array(ts > _b)
                    return tbl.filter(m if keep_on_time else pc.invert(m))

                on_time = data.map_batches(
                    lambda t, _f=flt: _f(t, True), batch_format="pyarrow")
                late_tbl = self._as_table(data.map_batches(
                    lambda t, _f=flt: _f(t, False), batch_format="pyarrow"))
            n_late = late_tbl.num_rows
            if n_late:
                late_tbl = late_tbl.append_column(
                    "late_epoch", pa.array([epoch] * n_late,
                                           type=pa.int64()))
                late_tbl = late_tbl.append_column(
                    "watermark", pa.array([self.watermark] * n_late,
                                          type=pa.float64()))
                sink = self._late_sinks.get(name)
                if sink is None:
                    sink = ExactlyOnceParquetSink(
                        self.root / f"_late_{name}", fsync=self.fsync,
                                sync_every=self.sync_every)
                    self._late_sinks[name] = sink
                sink.commit_tables(epoch, [late_tbl],
                                   meta=self._meta(kind="late"))
                self.metrics["late_routed"] = (
                    self.metrics.get("late_routed", 0) + n_late)
            out[name] = on_time
        return out

    def late_output(self, input_name: str) -> pa.Table:
        """All late rows routed off ``input_name`` so far (durable read)."""
        sink = self._late_sinks.get(input_name)
        if sink is None:
            sink = ExactlyOnceParquetSink(self.root / f"_late_{input_name}",
                                          fsync=self.fsync,
                                sync_every=self.sync_every)
            self._late_sinks[input_name] = sink
        return sink.read_committed_table()

    def mark_source_idle(self, source: str) -> None:
        """Exclude a stalled source from the per-source watermark minimum
        (the Flink idle-source marker): without this, one silent input pins
        the session frontier forever.  The source re-joins the minimum the
        next time it reports data or a watermark."""
        self.idle_sources.add(source)

    def checkpoint(self, epoch: int) -> None:
        self.chk.save(
            epoch,
            self.store.dump_all(),
            extra={"watermark": self.watermark, "metrics": dict(self.metrics),
                   "source_watermarks": dict(self.source_watermarks),
                   "idle_sources": sorted(self.idle_sources)},
        )
        self.chk.prune(keep_last=self.checkpoint_keep)

    def sync(self) -> None:
        """Force a group-commit barrier on every sink (durable through the
        last committed epoch; no-op unless ``sync_every > 1``)."""
        for s in self.sinks.values():
            s.sync()
        for s in self._late_sinks.values():
            s.sync()

    def close(self, epoch: int | None = None) -> dict:
        """Final watermark → +inf: flush every window/session, commit, stop.

        Stopping KILLS the shard actor pool: read live (non-windowed) state
        via ``state_table`` BEFORE closing; sink outputs are durable files
        and stay readable afterwards."""
        e = self.last_epoch + 1 if epoch is None else epoch
        out = self.advance_watermark(e, math.inf)
        self.checkpoint(e)
        self.sync()
        self.store.shutdown()
        return out
