"""Executable replica of the reference's ``demo_presentation``
(src/main.rs:52-110): five encoders over a 5-column table, an init epoch of
25 rows, then single-row update epochs whose meta changes ripple through the
delta-output stream.

Reference shape (src/main.rs:62-68):
  col0 → StandardScaler with rounding (−2, 0)
  col1 → MinMaxScaler
  col2 → KBinsDiscretizer(4)
  col3 → OneHotEncoder
  col4 → Passthrough
rows: (i%5, i%10, i%8, i%3, i)  (src/main.rs:112-118, FIXTURES F5)

Run: ``python -m diffdataflowmlpipelines_ray.pipelines.demo`` — prints the
per-epoch meta changes (the reference's ``inspect`` output) and the
correction deltas (the reference's retract/re-emit stream).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa

from ..stages.encoders import (
    KBinsDiscretizer,
    MinMaxScaler,
    OneHotEncoder,
    Passthrough,
    StandardScaler,
)
from ..streaming.encoders import IncrementalEncoderSession

__all__ = ["demo_table", "run_demo"]


def demo_table(lo: int, hi: int) -> pa.Table:
    i = np.arange(lo, hi)
    return pa.table(
        {
            "row_id": i,
            "c0": (i % 5).astype(np.float64),
            "c1": (i % 10).astype(np.float64),
            "c2": (i % 8).astype(np.float64),
            "c3": np.array([str(x % 3) for x in i]),
            "c4": i.astype(np.float64),
        }
    )


def run_demo(root: str | None = None, n_updates: int = 5,
             verbose: bool = True) -> dict:
    root = root or tempfile.mkdtemp(prefix="ddmlp-demo-", dir="/tmp")
    sess = IncrementalEncoderSession(
        config=[
            ("c0", StandardScaler(round_to=(-2, 0))),
            ("c1", MinMaxScaler()),
            ("c2", KBinsDiscretizer(4)),
            ("c3", OneHotEncoder()),
            ("c4", Passthrough()),
        ],
        root=root, num_shards=1, keep_input=True,
    )
    sess.emit_corrections = True
    meta_events: list = []
    if verbose:
        sess.inspect_meta = lambda e, i, col, st: (
            meta_events.append((e, col)),
            print(f"[epoch {e}] {col} meta: "
                  f"{ {k: v for k, v in st.items() if k.endswith('_') and not k.startswith('acc')} }"),
        )
    else:
        sess.inspect_meta = lambda e, i, col, st: meta_events.append((e, col))

    # epoch 0: 25 rows (src/main.rs:75-80)
    sess.process_epoch(0, demo_table(0, 25))
    # single-row epochs (src/main.rs:87-107)
    for k in range(n_updates):
        sess.process_epoch(1 + k, demo_table(25 + k, 26 + k))
    corrections = sess.corrections_sink.read_committed_table()
    base = sess.sink.read_committed_table()
    final = sess.refresh()
    sess.close()
    if verbose:
        print(f"base rows: {base.num_rows}, correction deltas: "
              f"{corrections.num_rows}, final rows: {final.num_rows}")
    return {
        "base_rows": base.num_rows,
        "correction_rows": corrections.num_rows,
        "final_rows": final.num_rows,
        "meta_events": meta_events,
        "root": root,
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    run_demo()
    ray.shutdown()
