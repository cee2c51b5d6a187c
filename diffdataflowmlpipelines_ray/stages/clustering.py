"""Distributed k-means (Lloyd's) over an embedding column.

The reference has no clustering; this is part of the added LLM-data-pipeline
surface (SURVEY §2.7) — `ivf_topk` (stages/similarity.py) already builds
centroids from a driver-side sample, while this module is the full
distributed fit: every Lloyd iteration is ONE `map_batches` pass emitting
per-block per-cluster partial sums (k×(dim+2) floats per block — never rows),
merged on the driver in O(blocks · k · dim).  No shuffle at all: the only
data movement is the centroid broadcast down (one `ray.put` per iteration)
and the tiny partials up.

Determinism: centroids are initialized from the k rows with the smallest
stable content hash of their id (a global partial top-k, no RNG state), so
the fit is reproducible at any parallelism / block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import stable_hash60_array
from ..functions.vectors import list_array_from_2d, list_column_to_2d

__all__ = ["kmeans_fit", "kmeans_assign"]


def _init_centroids(ds, emb_col: str, id_col: str, k: int) -> np.ndarray:
    """k seed vectors = rows with the k smallest stable id hashes.

    Per-block partial top-k (k rows each) → driver merge of ≤ blocks×k rows;
    deterministic and parallelism-invariant (ties cannot happen: the hash is
    of distinct ids)."""

    def block_topk(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        h = stable_hash60_array(ids.astype(str))
        idx = np.argsort(h)[:k]
        return pa.table({
            "__h": pa.array(h[idx]),
            emb_col: tbl.take(pa.array(idx))[emb_col],
        })

    parts = pa.concat_tables(
        list(ds.map_batches(block_topk, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow"))
    )
    order = np.argsort(parts["__h"].to_numpy(zero_copy_only=False))[:k]
    return list_column_to_2d(parts[emb_col].take(pa.array(order)))


def kmeans_fit(ds, emb_col: str = "embedding", id_col: str = "vec_id",
               n_clusters: int = 8, max_iters: int = 25, tol: float = 1e-6,
               ) -> dict:
    """Lloyd's k-means: returns {"centroids" (k, dim), "inertia", "iters",
    "sizes" (k,)}.  Euclidean metric; empty clusters keep their previous
    centroid.  Converges when the max squared centroid shift < ``tol``."""
    cent = _init_centroids(ds, emb_col, id_col, n_clusters)
    k, dim = cent.shape
    inertia = float("inf")
    sizes = np.zeros(k, dtype=np.int64)
    iters_run = 0
    for it in range(max_iters):
        ref = ray.put(cent)

        def partial(tbl: pa.Table) -> pa.Table:
            c = ray.get(ref)
            mat = list_column_to_2d(tbl[emb_col])
            # ||x-c||² = ||x||² − 2x·c + ||c||²; argmin over c drops ||x||²
            d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
            assign = d.argmin(axis=1)
            sums = np.zeros((k, dim))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            sse = float((d[np.arange(len(mat)), assign]
                         + (mat * mat).sum(axis=1)).sum())
            out = np.concatenate(
                [sums, counts[:, None],
                 np.full((k, 1), sse / k)], axis=1)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "part": list_array_from_2d(out),
            })

        merged = np.zeros((k, dim + 2))
        for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
            merged[int(row["cluster"])] += np.asarray(row["part"])
        counts = merged[:, dim]
        inertia = float(merged[:, dim + 1].sum())
        new_cent = cent.copy()
        nz = counts > 0
        new_cent[nz] = merged[nz, :dim] / counts[nz, None]
        shift = float(((new_cent - cent) ** 2).sum(axis=1).max())
        cent = new_cent
        sizes = counts.astype(np.int64)
        iters_run = it + 1
        if shift < tol:
            break
    return {"centroids": cent, "inertia": inertia, "iters": iters_run,
            "sizes": sizes}


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  out: str = "cluster"):
    """Stateless assignment pass: nearest-centroid id per row (broadcast
    centroids, one vectorized matmul per block)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(tbl: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = list_column_to_2d(tbl[emb_col])
        d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
        return tbl.append_column(
            out, pa.array(d.argmin(axis=1).astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow")
