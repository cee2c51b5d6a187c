"""JSONL document source — the lingua franca of web-scale text corpora.

Reads newline-delimited JSON into the documents schema (or any subset of
fields), column-pruned: ``ray.data.read_json`` yields Arrow blocks directly;
missing fields become nulls so heterogeneous crawl shards load uniformly.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_jsonl_documents", "extract_json_field"]


def read_jsonl_documents(paths, columns: list[str] | None = None):
    """JSONL file(s) → Dataset with the requested columns (null-padded)."""
    import ray.data as rd

    ds = rd.read_json(paths)
    if columns:
        want = list(columns)

        def project(tbl: pa.Table) -> pa.Table:
            cols = {}
            for c in want:
                cols[c] = (
                    tbl[c] if c in tbl.column_names
                    else pa.nulls(tbl.num_rows, type=pa.string())
                )
            return pa.table(cols)

        ds = ds.map_batches(project, batch_format="pyarrow")
    return ds


def extract_json_field(ds, col: str, field: str, out: str,
                       as_int: bool = True):
    """Vectorized scalar-field extraction from a JSON-string column via an
    Arrow regex kernel (for flat ``{"k": v}``-shaped props; full JSON paths
    belong in a real parser stage).  Matches DuckDB's
    ``json_extract(col, '$.field')`` for this shape."""
    import pyarrow.compute as pc

    pattern = (rf'"{field}"\s*:\s*(?P<v>-?\d+)' if as_int
               else rf'"{field}"\s*:\s*"(?P<v>[^"]*)"')

    def ex(tbl: pa.Table) -> pa.Table:
        m = pc.extract_regex(tbl[col], pattern)
        vals = pc.struct_field(m, "v")
        if as_int:
            vals = pc.cast(vals, pa.int64())
        return tbl.append_column(out, vals)

    return ds.map_batches(ex, batch_format="pyarrow")
