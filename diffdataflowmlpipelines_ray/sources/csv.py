"""CSV sources with the reference's reader semantics.

- ``read_csv_inferred`` ⇄ ``read_adult_csv``
  (src/pipelines/adult_dataset_reader.rs:6-29): trim each cell, parse as
  float when possible, else keep text.  The reference infers per CELL (its
  rows are untyped); a columnar engine needs per-COLUMN types, so inference
  runs on a driver-side sample: a column is float64 iff every sampled
  non-empty cell parses — identical results on homogeneous data like the
  adult census table.
- ``read_csv_floats`` ⇄ ``read_csv2``
  (src/pipelines/diabetes_dataset_reader.rs:7-21): every cell parsed as
  float, parse failure → ``-1.0`` sentinel.
"""

from __future__ import annotations

import csv as _csv

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["infer_csv_schema", "read_csv_inferred", "read_csv_floats"]


def infer_csv_schema(path: str, sample_rows: int = 1000) -> dict[str, str]:
    """column → "float" | "text" by trying float() on each sampled cell
    (trimmed), mirroring adult_dataset_reader.rs:15-23."""
    kinds: dict[str, str] = {}
    with open(path, newline="") as f:
        reader = _csv.reader(f)
        header = [h.strip() for h in next(reader)]
        is_float = {h: True for h in header}
        for i, rec in enumerate(reader):
            if i >= sample_rows:
                break
            for h, cell in zip(header, rec):
                if not is_float[h]:
                    continue
                try:
                    float(cell.strip())
                except ValueError:
                    is_float[h] = False
        kinds = {h: ("float" if is_float[h] else "text") for h in header}
    return kinds


def read_csv_inferred(path: str, sample_rows: int = 1000):
    """Ray Dataset with trimmed text / float64 columns per the inference."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    kinds = infer_csv_schema(path, sample_rows)
    # read everything as string, convert vectorized per batch (keeps the
    # trim-then-parse semantics for float columns exactly)
    convert = pacsv.ConvertOptions(
        column_types={name: pa.string() for name in kinds}
    )
    ds = rd.read_csv(path, convert_options=convert)

    def convert_batch(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arrays, names = [], []
        for name in tbl.column_names:
            col = pc.utf8_trim_whitespace(tbl[name])
            if kinds.get(name) == "float":
                col = pc.cast(col, pa.float64())
            names.append(name)
            arrays.append(col)
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(convert_batch, batch_format="pyarrow")


def read_csv_floats(path: str):
    """Ray Dataset, all columns float64; unparsable cells → −1.0
    (diabetes_dataset_reader.rs:16)."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    with open(path, newline="") as f:
        header = [h.strip() for h in next(_csv.reader(f))]
    convert = pacsv.ConvertOptions(column_types={name: pa.string() for name in header})
    ds = rd.read_csv(path, convert_options=convert)

    def convert_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for name in df.columns:
            vals = pd.to_numeric(df[name].str.strip(), errors="coerce")
            out[name] = vals.fillna(-1.0).astype(np.float64)
        return pd.DataFrame(out)

    return ds.map_batches(convert_batch, batch_format="pandas")
