"""Declarative data-validation rules — the dbt-tests / Great-Expectations
primitive: evaluate a rule list against a Dataset and report per-rule
violation counts (0 = the expectation holds).

Rules (each a ``(kind, column, *params)`` tuple):

- ``("not_null", col)`` — violations = null count;
- ``("unique", col)`` — violations = rows beyond the first per value
  (n_non_null − n_distinct; exact, nulls excluded like SQL UNIQUE);
- ``("in_range", col, lo, hi)`` — violations = values outside [lo, hi]
  (nulls don't violate range, matching SQL three-valued logic);
- ``("accepted_values", col, values)`` — violations = non-null values
  outside the set;
- ``("matches", col, regex)`` — violations = non-null strings NOT
  fully matching (anchored, the Arrow ``match_substring_regex`` over
  ``^…$`` — same semantics as DuckDB ``regexp_full_match``).

100-TB plan: every rule except ``unique`` folds from one shared map
pass of O(blocks × rules) count partials; ``unique`` adds one narrow
block-pre-deduped value exchange per unique-rule column (the
``profile_columns`` distinct plan).  Rows never shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["validate"]


def validate(ds, rules: list[tuple]) -> "object":
    """→ pandas DataFrame (rule_id, kind, column, violations, ok)."""
    import pandas as pd

    ds = ds.materialize()
    simple = [(i, r) for i, r in enumerate(rules) if r[0] != "unique"]
    uniqs = [(i, r) for i, r in enumerate(rules) if r[0] == "unique"]

    def part(tbl: pa.Table) -> pa.Table:
        out = np.zeros(len(simple), dtype=np.int64)
        for j, (_, r) in enumerate(simple):
            kind, col = r[0], r[1]
            arr = tbl[col]
            if kind == "not_null":
                out[j] = arr.null_count
            elif kind == "in_range":
                lo, hi = r[2], r[3]
                v = pc.or_(pc.less(arr, lo), pc.greater(arr, hi))
                out[j] = pc.sum(v).as_py() or 0  # nulls drop from sum
            elif kind == "accepted_values":
                ok = pc.is_in(arr, value_set=pa.array(list(r[2])))
                bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
                out[j] = pc.sum(bad).as_py() or 0
            elif kind == "matches":
                ok = pc.match_substring_regex(arr, f"^(?:{r[2]})$")
                bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
                out[j] = pc.sum(bad).as_py() or 0
            else:
                raise ValueError(f"unknown rule kind {kind!r}")
        return pa.table({"v": pa.array([out.tobytes()])})

    counts = np.zeros(len(simple), dtype=np.int64)
    if simple:
        for r in ds.map_batches(part, batch_format="pyarrow").take_all():
            counts += np.frombuffer(r["v"], dtype=np.int64)

    def nn_and_distinct(col: str) -> tuple[int, int]:
        def blk(tbl: pa.Table) -> pa.Table:
            arr = tbl[col].drop_null()
            u = pc.unique(arr.combine_chunks()
                          if isinstance(arr, pa.ChunkedArray) else arr)
            return pa.table({"v": u, "c": pa.array(
                np.full(len(u), 0, dtype=np.int64))})

        nd = (ds.map_batches(blk, batch_format="pyarrow")
              .groupby("v").count().count())
        nn = 0
        for r in ds.map_batches(
                lambda t, _c=col: pa.table({"n": pa.array(
                    [len(t[_c]) - t[_c].null_count], type=pa.int64())}),
                batch_format="pyarrow").take_all():
            nn += int(r["n"])
        return nn, nd

    rows: list = [None] * len(rules)
    for j, (i, r) in enumerate(simple):
        rows[i] = (i, r[0], r[1], int(counts[j]))
    for i, r in uniqs:
        nn, nd = nn_and_distinct(r[1])
        rows[i] = (i, "unique", r[1], nn - nd)
    df = pd.DataFrame(rows, columns=["rule_id", "kind", "column",
                                     "violations"])
    df["ok"] = df["violations"] == 0
    return df.astype({"rule_id": np.int64, "violations": np.int64})
