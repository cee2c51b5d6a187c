"""Diabetes pipeline — the reference's ``pipeline_3_diabetes`` shape.

Mirrors src/pipelines/pipeline_3_diabetes.rs:12-60: one
``StandardScaler(new_with_rounding(r1, r2))`` per float column
(:22-26), an init epoch with ``split`` of the rows (:33-42), then the
remainder applied as incremental update epochs (:44-54) — here micro-batches
through the ``IncrementalEncoderSession`` (sharded actor state, exactly-once
sink), not per-row timely epochs.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

from ..stages.encoders import StandardScaler
from ..streaming.encoders import IncrementalEncoderSession

__all__ = ["run_diabetes_pipeline"]


def run_diabetes_pipeline(tbl: pa.Table, root: str | Path,
                          round_to: tuple[int, int] = (-2, 0),
                          init_fraction: float = 0.9,
                          update_epochs: int = 4,
                          num_shards: int = 2) -> IncrementalEncoderSession:
    """All-float table → per-column StandardScaler features, incrementally.

    Epoch 0 carries ``init_fraction`` of the rows; the rest arrives in
    ``update_epochs`` micro-batches, each updating the fitted state and
    emitting its encoded rows under an epoch manifest.
    """
    config = [(name, StandardScaler(round_to=round_to)) for name in tbl.column_names]
    sess = IncrementalEncoderSession(config, root, num_shards=num_shards,
                                    keep_input=True)
    split = int(tbl.num_rows * init_fraction)
    sess.process_epoch(0, tbl.slice(0, split))
    rest = tbl.slice(split)
    step = max(1, rest.num_rows // max(1, update_epochs))
    e = 1
    for off in range(0, rest.num_rows, step):
        sess.process_epoch(e, rest.slice(off, min(step, rest.num_rows - off)))
        e += 1
    return sess
