"""Iterative (fixed-point) dataflow — the DD ``iterate`` analogue.

Differential dataflow's third primitive family besides map/join/reduce is
``iterate`` (fixed-point loops over a collection).  The canonical
data-engineering instance is connected components by min-label propagation,
which is also the scalable replacement for the driver-side union-find in the
dedup pipelines: each round is a pair of groupby-min exchanges over the edge
list; the loop stops when no label changes (the fixpoint / frontier-empty
condition).

``connected_components`` is exact and deterministic: the final label of every
node is the minimum node id of its component.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]


def connected_components(edges, max_iters: int = 64):
    """edges: Dataset or Table with columns id_lo, id_hi → pa.Table
    (id, component) where component = min id in the component.

    Each iteration: label[n] ← min(label[n], min over neighbors' labels) via
    two grouped min-exchanges, then a **pointer-doubling** shortcut
    (label[n] ← label[label[n]]) so path lengths halve every round and the
    fixpoint is reached in O(log diameter) rounds, not O(diameter).  The
    per-round changed-count is the probe; the loop ends at changed == 0.
    ``max_iters`` is a safety net only — with doubling, 64 rounds cover any
    component with diameter < 2^64; if the loop somehow exits non-converged
    a RuntimeError is raised instead of returning wrong labels.

    Runs on the driver with pandas C-kernels: the input here is always a
    *candidate-pair* list (dedup output), orders of magnitude smaller than
    the corpus.  At cluster scale the identical two-groupby round maps to
    `hash_join` + `groupby().min()` over Datasets — same algebra, one shuffle
    pair per round.
    """
    if not isinstance(edges, pa.Table):
        edges = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    if edges.num_rows == 0:
        return pa.table({"id": pa.array([], type=pa.int64()),
                         "component": pa.array([], type=pa.int64())})
    ed = edges.to_pandas()[["id_lo", "id_hi"]]
    # undirected edge list, both directions
    sym = pd.concat(
        [ed, ed.rename(columns={"id_lo": "id_hi", "id_hi": "id_lo"})],
        ignore_index=True,
    ).rename(columns={"id_lo": "src", "id_hi": "dst"})
    labels = pd.DataFrame({"id": pd.unique(pd.concat([sym["src"], sym["dst"]]))})
    labels["component"] = labels["id"]
    converged = False
    for _ in range(max_iters):
        # neighbor minimum: join labels onto edges, groupby dst min
        j = sym.merge(labels, left_on="src", right_on="id")[["dst", "component"]]
        neigh = j.groupby("dst", as_index=False)["component"].min().rename(
            columns={"dst": "id", "component": "neigh_min"}
        )
        merged = labels.merge(neigh, on="id", how="left")
        new_comp = merged[["component", "neigh_min"]].min(axis=1).astype(
            labels["component"].dtype
        )
        # pointer doubling: follow the label chain one hop (label-of-label)
        lab = pd.DataFrame({"id": labels["id"], "component": new_comp})
        hop = lab.merge(
            lab.rename(columns={"id": "component", "component": "__cc2"}),
            on="component", how="left",
        )
        new_comp = hop["__cc2"].fillna(hop["component"]).astype(
            labels["component"].dtype
        )
        changed = int((new_comp.to_numpy() != labels["component"].to_numpy()).sum())
        labels["component"] = new_comp.to_numpy()
        if changed == 0:  # fixpoint reached — the iterate frontier is empty
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    return pa.Table.from_pandas(labels.sort_values("id").reset_index(drop=True),
                                preserve_index=False)
