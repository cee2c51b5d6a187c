"""End-to-end training-data preparation — the composed 100 TB use case.

documents.parquet
  → text quality stats (vectorized)      — drop low-quality docs
  → language ID (actor pool)             — keep target languages
  → decontamination (broadcast n-grams)  — drop docs overlapping held-out
  → exact dedup (hash-bucketed)          — drop byte-identical repeats
  → MinHash near-dup groups              — keep one doc per dup group
  → tokenized-sequence derivation        — (doc_id, tokens, n_tok, source)
  → token features + incremental encode  — flagship encoder session
  → exactly-once Parquet sink            — per-epoch manifests

Every stage streams over Arrow blocks; the only shuffles are the dedup
bucket groupbys (8-byte keys / narrow band tables).  Returns per-stage row
counts (the funnel) for observability.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..sources.tokenized import derive_tokenized, epoch_datasets
from ..stages.dedup import exact_dedup, minhash_dedup_groups
from ..stages.encoders import OneHotEncoder, StandardScaler
from ..stages.text_stats import add_lang_id, add_text_stats
from ..streaming.encoders import IncrementalEncoderSession
from .flagship import token_features_table

__all__ = ["run_dataprep"]


def run_dataprep(sf_dir: str, root: str | Path, min_quality: float = 0.3,
                 languages: tuple = ("en", "de", "fr", "es", "unknown"),
                 n_epochs: int = 2, num_shards: int = 2,
                 near_dup_threshold: float = 0.8) -> dict:
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    n_input = ds.count()

    # 1) quality filter (vectorized stats inside map_batches)
    scored = add_text_stats(ds)
    kept_quality = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality_score"], min_quality)),
        batch_format="pyarrow",
    )

    # 2) language filter (actor-pool lang id)
    langs = add_lang_id(kept_quality)
    lang_set = pa.array(sorted(languages))
    kept_lang = langs.map_batches(
        lambda t: t.filter(pc.is_in(t["lang_pred"], value_set=lang_set)),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "text", "source"]).materialize()
    n_lang = kept_lang.count()

    # 2b) decontamination: drop every doc sharing a 5-gram with the
    # held-out split (doc_id % 97 == 0) — small-side hash set broadcast once
    from ..stages.text_clean import contamination_set, flag_contaminated

    def held_out(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    cref = ray.put(contamination_set(
        kept_lang.map_batches(held_out, batch_format="pyarrow"), n=5))
    decont = flag_contaminated(kept_lang, cref, n=5).map_batches(
        lambda t: t.filter(pc.invert(t["contaminated"]))
                   .drop_columns(["contaminated"]),
        batch_format="pyarrow",
    ).materialize()
    n_decont = decont.count()

    # 3) exact dedup
    exact = exact_dedup(decont, "text", "doc_id").materialize()
    n_exact = exact.count()

    # 4) near-dup: keep the group representative (min doc_id per group)
    groups = minhash_dedup_groups(exact, threshold=near_dup_threshold)
    drop_ids = {
        d for d, g in zip(groups["doc_id"].to_pylist(),
                          groups["group_id"].to_pylist())
        if d != g
    }
    if drop_ids:
        drop_arr = pa.array(sorted(drop_ids))
        ref = ray.put(drop_arr)

        def drop(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=ray.get(ref))))

        unique = exact.map_batches(drop, batch_format="pyarrow")
    else:
        unique = exact

    # 5) tokenize + 6) incremental encode with exactly-once sink
    tokenized = unique.map_batches(derive_tokenized, batch_format="pyarrow")
    epochs = epoch_datasets(tokenized.materialize(), n_epochs)
    session = IncrementalEncoderSession(
        config=[("n_tok", StandardScaler(round_to=(-2, 0))),
                ("source", OneHotEncoder())],
        root=root, num_shards=num_shards, keep_input=False,
        output_cols=["n_tok", "source", "fingerprint"],
        pre_transform=lambda t: token_features_table(t, 64),
        archive_input=False,
    )
    start = session.resume()
    for e, epoch_ds in enumerate(epochs):
        if e >= start:
            session.process_epoch(e, epoch_ds, lineage={
                "source": f"{sf_dir}/documents.parquet", "epoch": e,
                "n_epochs": n_epochs, "funnel": "dataprep"})
    out_rows = session.sink.total_rows()
    session.close()
    return {
        "input_docs": n_input,
        "after_quality_lang": n_lang,
        "after_decontamination": n_decont,
        "after_exact_dedup": n_exact,
        "near_dup_dropped": len(drop_ids),
        "output_rows": out_rows,
        "committed_epochs": session.sink.committed_epochs(),
        "root": str(root),
    }
