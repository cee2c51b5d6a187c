"""Zone-map (min/max statistics) pruned Parquet scan.

At 100 TB the cheapest row is the one never read: Parquet footers carry
per-row-group min/max statistics, so a range predicate can skip whole
row groups from the DRIVER by reading O(files) footers — no data I/O —
and ship only the surviving (file, row_group) fragments to workers.
Each worker task reads exactly its row group with column pruning and
applies the residual filter vectorized, so the scan moves
``selectivity × data`` bytes instead of ``data`` bytes.

This is the same skipping discipline `read_parquet(filter=...)` applies
internally; having it as an explicit stage makes the pruning measurable
(``ZoneScanStats``), testable, and usable over *derived* zone maps
(e.g. a manifest table from a previous run) where no reader pushdown
exists.  Reference parity: the reference engine scans CSV whole
(`src/bin/pipeline_3_diabetes.rs` reads the full file); this stage is a
scale-path addition, not a port.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["ZoneScanStats", "zone_map_fragments", "zone_pruned_scan"]


@dataclass(frozen=True)
class ZoneScanStats:
    """Observability for the prune decision (driver-side, footer-only)."""

    files: int
    row_groups_total: int
    row_groups_read: int
    rows_skipped_bound: int  # rows in pruned groups (provably filtered)


def zone_map_fragments(paths, column: str, lo, hi):
    """Footer-only prune: return ([(path, rg_idx)], ZoneScanStats) for
    row groups whose [min, max] zone intersects [lo, hi].  Groups with
    missing statistics are conservatively kept (correctness first)."""
    frags: list[tuple[str, int]] = []
    total = 0
    skipped_rows = 0
    for path in paths:
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        ci = names.index(column)
        for i in range(md.num_row_groups):
            total += 1
            st = md.row_group(i).column(ci).statistics
            if (st is None or not st.has_min_max
                    or (st.min <= hi and st.max >= lo)):
                frags.append((path, i))
            else:
                skipped_rows += md.row_group(i).num_rows
    stats = ZoneScanStats(files=len(paths), row_groups_total=total,
                          row_groups_read=len(frags),
                          rows_skipped_bound=skipped_rows)
    return frags, stats


def zone_pruned_scan(paths, column: str, lo, hi, columns=None):
    """Pruned distributed scan: (Dataset of surviving rows, stats).

    The fragment list is O(row groups) descriptors — never row data —
    and each map task reads ONE row group (column-pruned) and applies
    the residual ``lo <= column <= hi`` filter vectorized, so partially
    overlapping zones stay exact."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    frags, stats = zone_map_fragments(paths, column, lo, hi)
    cols = list(columns) if columns is not None else None
    if cols is not None and column not in cols:
        cols = cols + [column]

    def read_frag(batch: dict) -> pa.Table:
        tables = []
        for path, rg in zip(batch["path"], batch["rg"]):
            t = pq.ParquetFile(str(path)).read_row_group(
                int(rg), columns=cols)
            mask = pc.and_(pc.greater_equal(t[column], lo),
                           pc.less_equal(t[column], hi))
            tables.append(t.filter(mask))
        return pa.concat_tables(tables)

    items = [{"path": p, "rg": np.int64(i)} for p, i in frags]
    if not items:
        # fully pruned: an empty dataset with the right schema
        schema = pq.ParquetFile(paths[0]).schema_arrow
        fields = [schema.field(c) for c in (cols or schema.names)]
        empty = pa.table({f.name: pa.array([], type=f.type)
                          for f in fields})
        return rd.from_arrow(empty), stats
    ds = rd.from_items(items).map_batches(
        read_frag, batch_format="numpy", batch_size=1)
    return ds, stats
