"""Incremental feature encoding over epochs — the reference's program shape.

Reproduces the lifecycle of ``demo_presentation`` (src/main.rs:52-110) and
``diabetes_pipeline`` (src/pipelines/pipeline_3_diabetes.rs:12-60) on the
streaming engine: encoder fit-state is maintained incrementally across
micro-batch epochs (inserts AND retractions via a ``diff`` column), and each
epoch's rows are transformed against the state *including* that epoch — the
same-timestamp join semantics of DD (``data.join(&meta)`` at equal times,
standard_scaler.rs:109-113).

State residency: every encoder's accumulator lives in the sharded actor
store under key ``(encoder_index,)`` (the reference's arranged fit-state
collections, SURVEY §1.1), applied idempotently per epoch; snapshots ride the
normal checkpoint mechanism, so kill/resume replays uncommitted epochs only.

On re-emission: when an epoch changes fitted state, DD retracts and re-emits
*all* prior output rows (damped by the rounding knobs,
standard_scaler.rs:116-120).  Continuous full re-emission is the reference's
admitted scale bottleneck (paper §3); here per-epoch outputs are versioned
with the fitted-state epoch in the manifest (lineage), and ``refresh()``
produces the fully-consistent output of the final state as a batch job —
equal to what DD's accumulated deltas converge to (tested).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Sequence

import pyarrow as pa

from ..stages.encoders import Encoder
from ..stages.multi_column import MultiColumnEncoder
from .sink import CheckpointManager, ExactlyOnceParquetSink
from .state_store import ShardedStateStore

__all__ = ["IncrementalEncoderSession"]


def _kb(i: int) -> bytes:
    return pickle.dumps((i,), protocol=pickle.HIGHEST_PROTOCOL)


class IncrementalEncoderSession:
    """Drive a MultiColumnEncoder over an unbounded stream of epochs."""

    def __init__(self, config: Sequence[tuple[str, Encoder]], root: str | Path,
                 num_shards: int = 2, weight_col: str | None = None,
                 keep_input: bool = False, out_col: str = "features",
                 checkpoint_every: int = 1, pre_transform=None,
                 archive_input: bool = True, output_cols: list | None = None,
                 epoch_aggs: list | None = None, fsync: bool = True,
                 pre_transform_in_fit: bool = False, sync_every: int = 1,
                 pipeline_state: bool = False):
        #: fsync=False relaxes power-loss durability for latency-sensitive
        #: jobs; crash-level exactly-once (manifest rename atomicity) holds
        #: either way
        self.fsync = fsync
        #: sync_every=K > 1 turns every sink into group-commit mode: all
        #: fsyncs batch into one barrier per K epochs with a durable
        #: watermark + verify-on-open (see ExactlyOnceParquetSink) — the
        #: latency fix for single-row epochs (fsync cost amortized K×).
        #: Loss window on POWER failure: up to K epochs past the last
        #: barrier (replayable — exactly-once replay re-commits them).
        self.sync_every = max(int(sync_every), 1)
        #: pipeline_state=True removes the blocking state-store round-trip
        #: from the epoch critical path: the driver keeps a local mirror of
        #: the encoder accumulators (same merge algebra as StateShard,
        #: epoch-high-water idempotent) and ships each epoch's deltas
        #: one-way (`wait=False`); checkpoints and all read surfaces fence
        #: first, so durability and resume semantics are unchanged.
        self.pipeline_state = bool(pipeline_state)
        self._local_state: dict[bytes, object] | None = {} if pipeline_state else None
        self._local_hwm = -1
        self.mce = MultiColumnEncoder(config)
        self.weight_col = weight_col
        self.keep_input = keep_input
        self.out_col = out_col
        #: optional per-block stage fused into the encode pass (e.g. token
        #: feature derivation) — runs distributed, never archived twice
        self.pre_transform = pre_transform
        #: True when a stateful encoder fits on a pre_transform-DERIVED
        #: column (e.g. TF-IDF over a vectorizer's output): the fit partial
        #: pass then applies pre_transform too, to ALL rows — including
        #: retraction rows (diff < 0), whose derived values must be
        #: recomputed identically so the negative partial cancels the
        #: original contribution exactly.  Default False: encoders that fit
        #: on raw input columns (flagship) skip the double derivation cost.
        self.pre_transform_in_fit = bool(pre_transform_in_fit)
        #: False when the epoch source is already durable (e.g. one parquet
        #: directory per epoch): replay re-reads the source instead of an
        #: engine-side archive, halving sink IO.  ``refresh()`` then needs the
        #: caller to re-supply the stream.
        self.archive_input = archive_input
        #: with keep_input=False: extra columns to carry into the sink beside
        #: the id and feature columns (sink bytes are often the scale
        #: bottleneck — write the product, not the whole input)
        self.output_cols = list(output_cols or [])
        #: optional observer called with (epoch, encoder_index, column,
        #: state_dict) whenever an encoder's fitted meta changes — the
        #: reference's ``inspect`` on the meta collections
        #: (standard_scaler.rs:94-96, minmax_scaler.rs:143-145)
        self.inspect_meta = None
        self._last_meta: dict[int, dict] = {}
        #: DD delta-output semantics: when an epoch changes the fitted meta,
        #: differential dataflow retracts and re-emits every affected prior
        #: output row (damped by the rounding knobs,
        #: standard_scaler.rs:116-120).  With ``emit_corrections=True`` (needs
        #: archive_input) each epoch additionally commits a corrections table
        #: of (changed prior rows) × {diff=−1 old, diff=+1 new}; base outputs
        #: ⊕ corrections ≡ the full recompute (tested).
        self.emit_corrections = False
        self._meta_snapshot = None
        #: per-epoch grouped aggregates fused into the SAME partial scan as
        #: the encoder fit (zero extra passes) — the epoch IS the tumbling
        #: window here, the reference's degenerate windowing (SURVEY §2.1).
        #: Each spec: {"name", "key_cols", "value_col", "aggs"}.
        self.epoch_aggs = list(epoch_aggs or [])
        self.root = Path(root)
        se = self.sync_every
        self.epoch_agg_sinks = {
            spec["name"]: ExactlyOnceParquetSink(Path(root) / spec["name"],
                                                 fsync=fsync, sync_every=se)
            for spec in self.epoch_aggs
        }
        self.corrections_sink = ExactlyOnceParquetSink(self.root / "corrections",
                                                       fsync=fsync, sync_every=se)
        self.effective_sink = ExactlyOnceParquetSink(self.root / "_effective",
                                                     fsync=fsync, sync_every=se)
        self.store = ShardedStateStore(num_shards=num_shards)
        self.sink = ExactlyOnceParquetSink(self.root / "encoded", fsync=fsync,
                                           sync_every=se)
        self.input_archive = ExactlyOnceParquetSink(self.root / "input",
                                                    fsync=fsync, sync_every=se)
        self.chk = CheckpointManager(self.root / "_checkpoints")
        self.checkpoint_every = checkpoint_every
        self.last_epoch = -1
        self._stateful = [
            (i, col, enc)
            for i, (col, enc) in enumerate(self.mce.config)
            if enc.requires_fit
        ]

    # ------------------------------------------------------------------ resume
    def resume(self) -> int:
        latest = self.chk.latest()
        if latest is None:
            return 0
        blobs, extra = self.chk.load(latest)
        self.store.load_all(blobs)
        self.last_epoch = latest
        if self._local_state is not None:
            # mirror = restored checkpoint state; replayed epochs (> the
            # checkpoint, not in the restored high-water marks) apply once
            # on both sides
            self._local_state = dict(self.store.collect("encoders"))
            self._local_hwm = latest
        self._refresh_encoder_state()
        return latest + 1

    def _meta(self, **kw) -> dict:
        if getattr(self, "_lineage", None) is not None:
            kw["lineage"] = self._lineage
        return kw

    # -------------------------------------------------------------- epoch step
    def process_epoch(self, epoch: int, data,
                      lineage: dict | None = None) -> pa.Table | dict:
        """fit-update on the epoch's deltas, then transform the epoch's
        insertions with the updated state; exactly-once commit of both the
        input archive (for refresh/lineage) and the encoded output.

        ``lineage``: caller-supplied input provenance for this epoch
        (source paths / shard ids / offsets) — stamped into every manifest
        the epoch commits, so each output partition records the input slice
        it came from.

        Small ``pa.Table`` epochs run driver-side; ``ray.data.Dataset``
        epochs are first committed to the input archive (single upstream
        execution), then re-read distributed for the partial and transform
        stages — the archive doubles as the epoch's durable replay source.
        Returns the encoded table (table path) or the sink manifest (Dataset
        path; use ``read_epoch_output``).
        """
        self._lineage = lineage
        small = isinstance(data, pa.Table)
        # 0) archive the raw epoch (atomic; upstream executes exactly once).
        # Skipped when the source itself is durable (archive_input=False) —
        # then the input must be a materialized Dataset / table so the two
        # passes below don't re-execute upstream.
        if not self.archive_input:
            epoch_data = data
        elif small:
            self.input_archive.commit_tables(epoch, [data], meta=self._meta(kind="input"))
            epoch_data = data
        else:
            self.input_archive.commit_dataset(epoch, data, meta=self._meta(kind="input"))
            import ray.data as rd

            epoch_data = rd.read_parquet(self.input_archive.committed_files([epoch]))

        # 1) partial stage → tiny per-block accumulator dicts → driver merge
        if self._stateful or self.epoch_aggs:
            if small:
                parts = [self._block_partials(epoch_data)]
            else:
                def per_block(tbl: pa.Table) -> pa.Table:
                    blob = pickle.dumps(self._block_partials(tbl),
                                        protocol=pickle.HIGHEST_PROTOCOL)
                    return pa.table({"blob": pa.array([blob], type=pa.binary())})

                parts = [
                    pickle.loads(r["blob"])
                    for r in epoch_data.map_batches(
                        per_block, batch_format="pyarrow"
                    ).take_all()
                ]
            merged: dict[bytes, object] = {}
            for part in sorted(
                parts,
                key=lambda d: sorted(
                    (k, pickle.dumps(v, protocol=4)) for k, v in d.items()
                ),
            ):
                for k, acc in part.items():
                    if k in merged:
                        merged[k].merge(acc)
                    else:
                        merged[k] = acc
            # fused per-epoch grouped aggregates: strip from the encoder
            # deltas and commit directly (epoch == tumbling window)
            if len(merged) > 1_000_000:
                import logging

                logging.getLogger(__name__).warning(
                    "IncrementalEncoderSession merged %d per-epoch keys on "
                    "the driver; the fused epoch_aggs path is built for "
                    "LOW-cardinality keys (encoder meta + coarse groups). "
                    "Route high-cardinality keyed aggregation through "
                    "StreamSession/KeyedAggregation (shard-direct scatter).",
                    len(merged),
                )
            if self.epoch_aggs:
                win_items: dict[str, list] = {s["name"]: [] for s in self.epoch_aggs}
                for k in [k for k in merged if pickle.loads(k)[0] == "__epoch_agg"]:
                    _, name_, key_t = pickle.loads(k)
                    win_items[name_].append((key_t, merged.pop(k)))
                self._commit_epoch_aggs(epoch, win_items)
            if self._local_state is not None:
                # pipelined: ship the delta one-way (pickled NOW, before the
                # local merge mutates shared accumulators) and fold it into
                # the driver mirror with StateShard.apply_delta's exact
                # algebra; the epoch high-water mark mirrors its idempotency
                self.store.apply_deltas("encoders", epoch, merged,
                                        wait=False)
                if epoch > self._local_hwm:
                    self._local_hwm = epoch
                    local = self._local_state
                    for k, acc in sorted(merged.items()):
                        cur = local.get(k)
                        if cur is None:
                            if not (hasattr(acc, "is_identity")
                                    and acc.is_identity()):
                                local[k] = acc
                        else:
                            cur.merge(acc)
                            if (hasattr(cur, "is_identity")
                                    and cur.is_identity()):
                                del local[k]
                items = self._local_state
            else:
                # one round-trip: apply the deltas AND get the merged meta
                # back
                post = self.store.apply_deltas("encoders", epoch, merged,
                                               return_merged=True)
                items = dict(post)
            for i, col, enc in self._stateful:
                acc = items.get(_kb(i))
                if acc is not None:
                    enc.load_accumulator(acc)
        else:
            self._refresh_encoder_state()
        if self.inspect_meta is not None:
            import pickle as _p

            for i, col, enc in self._stateful:
                st = enc.state()
                key = _p.dumps(sorted(st.items(), key=lambda kv: kv[0]), protocol=4)
                if self._last_meta.get(i) != key:
                    self._last_meta[i] = key
                    self.inspect_meta(epoch, i, col, st)

        # 3) transform this epoch's insertions (diff > 0 when deltas present)
        mce, out_col, weight_col, keep_input = (
            self.mce, self.out_col, self.weight_col, self.keep_input
        )
        pre = self.pre_transform
        extra = set(self.output_cols)

        def encode(tbl: pa.Table) -> pa.Table:
            if weight_col and weight_col in tbl.column_names:
                import pyarrow.compute as pc

                tbl = tbl.filter(pc.greater(tbl[weight_col], 0))
            if pre is not None:
                tbl = pre(tbl)
            out = mce.transform_table(tbl, out_col)
            if not keep_input:
                ids = {c for c in ("row_id", "doc_id") if c in out.column_names}
                out = out.select([c for c in out.column_names
                                  if c == out_col or c in ids or c in extra])
            return out

        if small:
            out_tbl = encode(epoch_data)
            result = self.sink.commit_tables(
                epoch, [out_tbl], meta=self._meta(state_epoch=epoch, kind="encoded")
            )
        else:
            out_ds = epoch_data.map_batches(encode, batch_format="pyarrow")
            result = self.sink.commit_dataset(
                epoch, out_ds, meta=self._meta(state_epoch=epoch, kind="encoded")
            )
        if self.emit_corrections:
            self._maybe_emit_corrections(epoch, encode)
        self.last_epoch = epoch
        if self.checkpoint_every and epoch % self.checkpoint_every == 0:
            self.chk.save(epoch, self.store.dump_all(), extra={})
            self.chk.prune(keep_last=2)
        return out_tbl if small else result

    def _prior_effective(self, epoch: int):
        """Last emitted version of every prior row = latest effective snapshot
        ∪ base outputs of epochs since that snapshot."""
        snaps = [e for e in self.effective_sink.committed_epochs() if e < epoch]
        last_snap = max(snaps) if snaps else None
        parts = []
        if last_snap is not None:
            parts.append(self.effective_sink.read_committed_table([last_snap]))
        start = -1 if last_snap is None else last_snap
        base_epochs = [e for e in self.sink.committed_epochs() if start <= e < epoch]
        if base_epochs:
            parts.append(self.sink.read_committed_table(base_epochs))
        return pa.concat_tables(parts, promote_options="default") if parts else None

    def _maybe_emit_corrections(self, epoch: int, encode) -> None:
        """DD retract-and-re-emit: when this epoch changed the fitted meta,
        re-encode all prior inputs under the new state, retract each changed
        row's LAST emitted version (diff=−1) and emit the new one (diff=+1);
        the new full re-encode becomes the effective snapshot for the next
        correction round.  Empty corrections table when meta is unchanged
        (the rounding knobs' damping — standard_scaler.rs:116-120)."""
        snap = pickle.dumps(
            [sorted(enc.state().items()) for _, _, enc in self._stateful],
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        prior = [e for e in self.sink.committed_epochs() if e < epoch]
        changed_tbl = None
        if prior and self._meta_snapshot is not None and snap != self._meta_snapshot:
            if not self.archive_input:
                raise RuntimeError("emit_corrections requires archive_input=True")
            import numpy as np
            import pandas as pd

            old_pd = self._prior_effective(epoch).to_pandas()
            new = encode(self.input_archive.read_committed_table(prior))
            new_pd = new.to_pandas()
            key = next(c for c in ("row_id", "doc_id") if c in old_pd.columns)
            old_pd = old_pd.sort_values(key).reset_index(drop=True)
            new_pd = new_pd[list(old_pd.columns)].sort_values(key).reset_index(drop=True)
            mask = np.array(
                [tuple(a) != tuple(b)
                 for a, b in zip(old_pd[self.out_col], new_pd[self.out_col])],
                dtype=bool,
            )
            changed = pd.concat(
                [old_pd[mask].assign(diff=-1), new_pd[mask].assign(diff=1)],
                ignore_index=True,
            )
            changed_tbl = pa.Table.from_pandas(changed, preserve_index=False)
            # the re-encode is the new effective snapshot for rows < epoch
            self.effective_sink.commit_tables(epoch, [new], meta=self._meta(kind="effective"))
        self._meta_snapshot = snap
        tbl = changed_tbl if changed_tbl is not None else pa.table(
            {"diff": pa.array([], type=pa.int64())}
        )
        self.corrections_sink.commit_tables(epoch, [tbl], meta=self._meta(kind="corrections"))

    def read_epoch_output(self, epoch: int) -> pa.Table:
        return self.sink.read_committed_table([epoch])

    def _id_cols(self, tbl: pa.Table) -> set:
        return {c for c in ("row_id", "doc_id") if c in tbl.column_names}

    def _commit_epoch_aggs(self, epoch: int, win_items: dict[str, list]) -> None:
        for spec in self.epoch_aggs:
            recs = []
            for key_t, acc in sorted(win_items.get(spec["name"], []),
                                     key=lambda kv: str(kv[0])):
                rec = dict(zip(spec["key_cols"], key_t))
                rec["window_start"] = float(epoch)
                rec["window_end"] = float(epoch + 1)
                for a in spec.get("aggs", ("count", "sum")):
                    if a == "count":
                        rec["count"] = acc.count
                    elif a == "sum":
                        rec["sum"] = acc.s
                    elif a == "min":
                        rec["min"] = acc.min_max()[0]
                    elif a == "max":
                        rec["max"] = acc.min_max()[1]
                rec["epoch"] = epoch
                recs.append(rec)
            tbl = (pa.Table.from_pylist(recs) if recs
                   else pa.table({"epoch": pa.array([], type=pa.int64())}))
            self.epoch_agg_sinks[spec["name"]].commit_tables(
                epoch, [tbl], meta=self._meta(kind="epoch_agg")
            )

    def _block_partials(self, tbl: pa.Table) -> dict[bytes, object]:
        if self.pre_transform_in_fit and self.pre_transform is not None:
            tbl = self.pre_transform(tbl)
        out = {
            _kb(i): enc.make_partial(tbl, col, self.weight_col)
            for i, col, enc in self._stateful
        }
        if self.epoch_aggs:
            import numpy as np

            from ..state.aggregates import SumCountAgg

            for spec in self.epoch_aggs:
                keys = list(spec["key_cols"])
                pdf = tbl.select(keys + [spec["value_col"]]).to_pandas()
                vals = pdf[spec["value_col"]].to_numpy(dtype=np.float64)
                track = bool({"min", "max"} & set(spec.get("aggs", ())))
                pdf["__pos"] = np.arange(len(pdf))
                for key, grp in pdf.groupby(keys, sort=True):
                    key_t = key if isinstance(key, tuple) else (key,)
                    acc = SumCountAgg.from_numpy(
                        vals[grp["__pos"].to_numpy()], track_extremes=track
                    )
                    out[pickle.dumps(("__epoch_agg", spec["name"], key_t),
                                     protocol=pickle.HIGHEST_PROTOCOL)] = acc
        return out

    def _refresh_encoder_state(self) -> None:
        items = dict(self.store.collect("encoders"))
        for i, col, enc in self._stateful:
            acc = items.get(_kb(i))
            if acc is not None:
                enc.load_accumulator(acc)

    @staticmethod
    def _concat(ds) -> pa.Table:
        return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))

    # ------------------------------------------------------------------ refresh
    def refresh(self) -> pa.Table:
        """Batch re-transform of every archived input row under the FINAL
        fitted state — what the reference's accumulated output deltas converge
        to after its cascade of retract/re-emit updates."""
        self._refresh_encoder_state()
        full = self.input_archive.read_committed_table()
        if self.weight_col and self.weight_col in full.column_names:
            import pyarrow.compute as pc

            # net out retracted rows: keep rows whose net diff > 0 by identity
            # (identity = all non-diff columns); the common case is ±1 pairs.
            import pandas as pd

            pdf = full.to_pandas()
            ids = [c for c in pdf.columns if c != self.weight_col]
            net = pdf.groupby(ids, dropna=False, sort=False)[self.weight_col].sum()
            pdf = net[net > 0].reset_index()
            rep = pdf.loc[pdf.index.repeat(pdf[self.weight_col])].drop(
                columns=[self.weight_col]
            )
            full = pa.Table.from_pandas(rep, preserve_index=False)
        return self.mce.transform_table(full, self.out_col)

    def sync(self) -> None:
        """Force a group-commit barrier on every sink (durable through the
        last committed epoch) and fence pipelined state writes."""
        self.store.fence()
        for s in (self.sink, self.input_archive, self.corrections_sink,
                  self.effective_sink, *self.epoch_agg_sinks.values()):
            s.sync()

    def close(self) -> None:
        self.sync()
        self.store.shutdown()
