"""Tokenized-sequence source (the BASELINE.json ``input_hint`` table).

Canonical input schema::

    doc_id : string
    tokens : list<int32>
    n_tok  : int32
    source : string

Derivation is deterministic from the driver-provided ``documents`` table
(seed-free: token ids are stable hashes of the whitespace tokens modulo the
vocab), so every scale factor yields the same tokens for the same text —
the per-row invariant the driver checks is token-array equality.

Also provides the micro-batch (epoch) splitter: a deterministic partition of
a Dataset/table into K epochs by row position — the reference's
``advance_to``-delimited insertion batches (src/main.rs:489-513).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fast_hash64_array
from ..functions.tokenize import tokenize_column

__all__ = ["derive_tokenized", "tokenized_dataset", "epoch_tables", "epoch_datasets"]

VOCAB_SIZE = 32768


def derive_tokenized(tbl: pa.Table, vocab_size: int = VOCAB_SIZE) -> pa.Table:
    """documents(doc_id, text, source, …) → tokenized-sequence table."""
    toks = tokenize_column(tbl["text"])
    flat = toks.flatten()
    if len(flat):
        ids = (fast_hash64_array(flat) % np.uint64(vocab_size)).astype(np.int32)
    else:
        ids = np.array([], dtype=np.int32)
    tokens = pa.ListArray.from_arrays(toks.offsets, pa.array(ids, type=pa.int32()))
    n_tok = pc.cast(pc.list_value_length(tokens), pa.int32())
    doc_id = pc.cast(tbl["doc_id"], pa.string()) if not pa.types.is_string(
        tbl["doc_id"].type
    ) else tbl["doc_id"]
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": tbl["source"],
        }
    )


def tokenized_dataset(sf_dir: str, vocab_size: int = VOCAB_SIZE,
                      replicate: int = 1, parallelism: int | None = None,
                      hot_source_frac: float | None = None):
    """Ray Dataset of tokenized sequences derived from ``documents.parquet``
    (columns pruned at the read).

    ``replicate`` synthesizes an N×-larger corpus (distinct doc_ids per copy,
    identical token arrays — deterministic) for throughput benchmarking;
    ``parallelism`` repartitions the small source table before the CPU-heavy
    tokenize stage so it fans out across the cluster (a single parquet file
    otherwise yields a single block → a single task).

    ``hot_source_frac``: deterministically rewrite that fraction of rows'
    ``source`` to one hot key (``"web"``) — the skew-stress input for the
    keyed window aggregate / OneHot fit / shard state paths (BASELINE.md
    skew bench).
    """
    import math

    import pyarrow.parquet as pq
    import ray.data as rd

    # bound rows-per-task AFTER replication: a fat block (10M+ tokens) blows
    # a worker's heap and forces object-store spill, while too-small blocks
    # pay task-launch overhead per stage; ~48k rows (≈2.5M tokens) per task
    # balances both
    total_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * replicate
    auto_blocks = max(1, math.ceil(total_rows / 49152))
    blocks = max(parallelism or 0, auto_blocks)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"],
        override_num_blocks=blocks,
    )

    def prep(tbl: pa.Table) -> pa.Table:
        # tokenize FIRST, then tile the tokenized rows: the string
        # tokenize+hash (the expensive part) runs once per distinct doc, not
        # once per replica; copies share identical token arrays by
        # construction (the determinism the bench relies on)
        tok = derive_tokenized(tbl, vocab_size)
        if replicate > 1:
            n = tok.num_rows
            idx = np.tile(np.arange(n, dtype=np.int64), replicate)
            tok = tok.take(pa.array(idx))
            rep_tag = pa.array(
                np.repeat(np.arange(replicate, dtype=np.int64), n).astype(str)
            )
            new_id = pc.binary_join_element_wise(rep_tag, tok["doc_id"], "_")
            tok = tok.set_column(
                tok.schema.get_field_index("doc_id"), "doc_id", new_id
            )
        if hot_source_frac:
            # deterministic by doc_id hash: the same rows are hot on every
            # run and at every parallelism; Arrow if_else, no Python rows
            h = fast_hash64_array(tok["doc_id"], seed=7)
            hot = pa.array((h % np.uint64(1000))
                           < np.uint64(int(hot_source_frac * 1000)))
            src = pc.if_else(hot, pa.scalar("web"), tok["source"])
            tok = tok.set_column(
                tok.schema.get_field_index("source"), "source", src)
        return tok

    return ds.map_batches(prep, batch_format="pyarrow")


def epoch_tables(tbl: pa.Table, n_epochs: int) -> list[pa.Table]:
    """Deterministic contiguous split into micro-batches (epochs)."""
    bounds = np.linspace(0, tbl.num_rows, n_epochs + 1).astype(int)
    return [tbl.slice(int(a), int(b - a)) for a, b in zip(bounds[:-1], bounds[1:])]


def epoch_datasets(ds, n_epochs: int) -> list:
    """Split a Dataset into epoch Datasets with ``split_proportionately``
    (stays distributed; no driver materialization)."""
    if n_epochs <= 1:
        return [ds]
    return ds.split_proportionately([1.0 / n_epochs] * (n_epochs - 1))
