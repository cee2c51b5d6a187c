"""Census (Adult) pipeline — the reference's ``pipeline_2`` shape.

Mirrors src/pipelines/pipeline_2.rs:17-82:
- excluded attributes: protected [8, 9] ∪ proxy [12] ∪ target {14}
  (pipeline_2.rs:21-30);
- remaining columns classified by runtime type — numeric → Passthrough,
  text → OneHotEncoder (pipeline_2.rs:32-39 classifies by the type of row 0;
  here by the column's Arrow type, equivalent for homogeneous columns);
- assembled with the MultiColumnEncoder into one feature vector.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.encoders import OneHotEncoder, Passthrough
from ..stages.multi_column import MultiColumnEncoder

__all__ = ["census_encoder_config", "run_census_pipeline"]

DEFAULT_EXCLUDED = (8, 9, 12, 14)  # protected [8,9], proxy [12], target 14


def census_encoder_config(schema: pa.Schema,
                          excluded: tuple = DEFAULT_EXCLUDED) -> MultiColumnEncoder:
    config = []
    for i, field in enumerate(schema):
        if i in excluded:
            continue
        if pa.types.is_floating(field.type) or pa.types.is_integer(field.type):
            config.append((field.name, Passthrough()))
        else:
            config.append((field.name, OneHotEncoder()))
    return MultiColumnEncoder(config)


def run_census_pipeline(ds, excluded: tuple = DEFAULT_EXCLUDED,
                        out: str = "features"):
    """fit + transform the census table → Dataset with a ``features`` vector."""
    mce = census_encoder_config(ds.schema().base_schema, excluded)
    return mce.fit_transform(ds, out=out), mce
