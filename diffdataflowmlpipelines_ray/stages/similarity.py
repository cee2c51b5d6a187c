"""Similarity search over an embedding column (list<float>).

- **brute_force_topk** — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a (batch × queries) matmul and
  emits only its local top-k candidates per query; a final tiny merge keeps
  the global top-k.  Data moved after the scan: O(#queries · k · #blocks).
- **ivf_topk** — the scale path: k-means centroids trained on a driver-side
  sample (deterministic seed), batches assign rows to nearest centroid
  (one matmul), and queries probe only the ``nprobe`` nearest lists.
  Recall < 1.0 by construction; the exact variant is the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

__all__ = ["brute_force_topk", "ivf_topk", "pq_topk"]


def _mat(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, queries: np.ndarray, k: int = 5,
                     emb_col: str = "embedding", id_col: str = "vec_id",
                     query_ids: np.ndarray | None = None,
                     exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k for each query row → (query_id, vec_id, cosine, rank).

    Ties broken by ascending ``vec_id`` (deterministic at any parallelism).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = (
        np.asarray(query_ids)
        if query_ids is not None
        else np.arange(qn.shape[0], dtype=np.int64)
    )
    q_ref = ray.put((qn, qids))

    def local_topk(tbl: pa.Table) -> pa.Table:
        q, qi = ray.get(q_ref)
        mat = _normalize(_mat(tbl[emb_col]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sims = mat @ q.T  # (n, Q)
        n, nq = sims.shape
        kk = min(k + (1 if exclude_self else 0), n)
        # ONE argpartition over all query columns (axis=0), then only the
        # tiny (kk, Q) candidate block is ordered deterministically
        if kk < n:
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        else:
            part = np.broadcast_to(np.arange(n)[:, None], (n, nq)).copy()
        cand_cos = np.take_along_axis(sims, part, axis=0)  # (kk, Q)
        cand_ids = ids[part]
        out_q = np.repeat(qi, part.shape[0])
        out_id = np.empty(part.shape[0] * nq, dtype=np.int64)
        out_cos = np.empty(part.shape[0] * nq, dtype=np.float64)
        for c in range(nq):  # O(Q · kk log kk) — candidates only
            order = np.lexsort((cand_ids[:, c], -cand_cos[:, c]))
            sl = slice(c * part.shape[0], (c + 1) * part.shape[0])
            out_id[sl] = cand_ids[order, c]
            out_cos[sl] = cand_cos[order, c]
        return pa.table(
            {
                "query_id": pa.array(out_q.astype(np.int64)),
                id_col: pa.array(out_id),
                "cosine": pa.array(out_cos),
            }
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    merged = pa.concat_tables(list(cands.iter_batches(batch_format="pyarrow")))
    pdf = merged.to_pandas()
    if exclude_self:
        pdf = pdf[pdf["query_id"] != pdf[id_col]]
    pdf = pdf.sort_values(["query_id", "cosine", id_col],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id", sort=True).head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_clusters, sample.shape[0]),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = sample @ cent.T
        assign = d.argmax(axis=1)
        for c in range(cent.shape[0]):
            pts = sample[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / n if n else cent[c]
    return cent


def ivf_topk(ds, queries: np.ndarray, k: int = 5, n_clusters: int = 16,
             nprobe: int = 4, emb_col: str = "embedding", id_col: str = "vec_id",
             query_ids: np.ndarray | None = None, sample_size: int = 2048,
             seed: int = 42, exclude_self: bool = True) -> pa.Table:
    """Approximate cosine top-k via inverted-file probing.

    Centroids from a seeded sample; each batch scores only rows whose
    assigned centroid is among the query's ``nprobe`` nearest — the matmul
    shrinks by ~n_clusters/nprobe at equal recall for clustered data.
    """
    sample_rows = ds.random_sample(
        min(1.0, sample_size / max(1, ds.count())), seed=seed
    ).take_all()
    if not sample_rows:
        raise ValueError("empty dataset")
    sample = _normalize(
        np.array([r[emb_col] for r in sample_rows], dtype=np.float64)
    )
    cent = _kmeans(sample, n_clusters, seed=seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = (
        np.asarray(query_ids)
        if query_ids is not None
        else np.arange(qn.shape[0], dtype=np.int64)
    )
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qn, qids, cent, probe))

    def local(tbl: pa.Table) -> pa.Table:
        q, qi, c, pr = ray.get(ref)
        mat = _normalize(_mat(tbl[emb_col]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        assign = (mat @ c.T).argmax(axis=1)
        out_q, out_id, out_cos = [], [], []
        for ci in range(q.shape[0]):
            mask = np.isin(assign, pr[ci])
            if not mask.any():
                continue
            sub = mat[mask]
            sub_ids = ids[mask]
            col = sub @ q[ci]
            kk = min(k + 1, col.size)
            cand = np.argpartition(-col, kk - 1)[:kk] if kk < col.size else np.arange(col.size)
            order = cand[np.lexsort((sub_ids[cand], -col[cand]))]
            out_q.extend([qi[ci]] * len(order))
            out_id.extend(sub_ids[order].tolist())
            out_cos.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_cos, type=pa.float64()),
            }
        )

    cands = ds.map_batches(local, batch_format="pyarrow")
    merged = pa.concat_tables(list(cands.iter_batches(batch_format="pyarrow")))
    pdf = merged.to_pandas()
    if exclude_self:
        pdf = pdf[pdf["query_id"] != pdf[id_col]]
    pdf = pdf.sort_values(["query_id", "cosine", id_col],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id", sort=True).head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


def _kmeans_sub(sample: np.ndarray, n_codes: int, iters: int = 10,
                seed: int = 42) -> np.ndarray:
    """Plain Euclidean Lloyd's on SUBVECTORS (no normalization — PQ
    codebooks live in the raw subspace).  Deterministic via seeded init;
    empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_codes, sample.shape[0]),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(cent.shape[0]):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    return cent


def pq_topk(ds, queries: np.ndarray, k: int = 5, m: int = 8,
            n_codes: int = 32, refine: int = 0,
            emb_col: str = "embedding", id_col: str = "vec_id",
            query_ids: np.ndarray | None = None, sample_size: int = 2048,
            seed: int = 42, exclude_self: bool = True) -> pa.Table:
    """Approximate cosine top-k via product quantization + ADC scan
    (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    Search") — the memory-compression path for 100-TB vector corpora.

    The d-dim (normalized) vector splits into ``m`` subspaces; each
    subspace gets an ``n_codes``-entry Euclidean codebook trained on a
    seeded sample.  A vector is then ``m`` uint8 codes — e.g. 64-dim
    float32 (256 B) → 8 B, 32×.  Scoring is ASYMMETRIC: the query stays
    exact, and cos(q, x) ≈ Σₘ qₘ·cₘ[codeₘ(x)] is one (m × n_codes)
    lookup table per query + ``m`` gathers per row — no decompression.
    ``refine > 0`` re-ranks each query's top ``refine·k`` ADC candidates
    with TRUE vectors (still one pass; only the candidate block pays the
    exact dot products).  Deterministic: seeded sample/codebooks,
    per-row encode, (score desc, id asc) ties — partitioning-invariant.
    """
    sample_rows = ds.random_sample(
        min(1.0, sample_size / max(1, ds.count())), seed=seed
    ).take_all()
    if not sample_rows:
        raise ValueError("empty dataset")
    sample = _normalize(
        np.array([r[emb_col] for r in sample_rows], dtype=np.float64))
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    books = np.stack([
        _kmeans_sub(sample[:, j * sub_d:(j + 1) * sub_d], n_codes,
                    seed=seed + j)
        for j in range(m)
    ])  # (m, K, sub_d)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = (np.asarray(query_ids) if query_ids is not None
            else np.arange(qn.shape[0], dtype=np.int64))
    # (Q, m, K) ADC lookup tables: q's subvector · every codeword
    luts = np.einsum("qmd,mkd->qmk",
                     qn.reshape(qn.shape[0], m, sub_d), books)
    ref = ray.put((qn, qids, books, luts))
    cand_k = max(k + (1 if exclude_self else 0),
                 refine * k if refine else 0)

    def local(tbl: pa.Table) -> pa.Table:
        q, qi, bks, lt = ray.get(ref)
        mat = _normalize(_mat(tbl[emb_col]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        n = mat.shape[0]
        # encode: per subspace, nearest codeword (vectorized ||x-c||² =
        # ||x||² - 2x·c + ||c||²; the x² term is rank-constant)
        codes = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * sub_d:(j + 1) * sub_d]
            dist = (-2.0 * (sub @ bks[j].T)
                    + (bks[j] ** 2).sum(axis=1)[None, :])
            codes[:, j] = dist.argmin(axis=1)
        # ADC scores for every query at once: gather per subspace
        scores = np.zeros((n, q.shape[0]), dtype=np.float64)
        for j in range(m):
            scores += lt[:, j, :].T[codes[:, j]]  # (n, Q)
        kk = min(cand_k, n)
        if kk < n:
            part = np.argpartition(-scores, kk - 1, axis=0)[:kk]
        else:
            part = np.broadcast_to(np.arange(n)[:, None],
                                   (n, q.shape[0])).copy()
        out = []
        for c in range(q.shape[0]):
            rows = part[:, c]
            adc = scores[rows, c]
            # exact score rides ALONG but candidacy is decided by ADC
            # globally at the merge — otherwise block-local extras that
            # rerank well would make the result partition-dependent
            exact = mat[rows] @ q[c] if refine else adc
            order = np.lexsort((ids[rows], -adc))
            out.append(pa.table({
                "query_id": pa.array(np.full(len(rows), qi[c],
                                             dtype=np.int64)),
                id_col: pa.array(ids[rows][order]),
                "adc": pa.array(adc[order]),
                "score": pa.array(exact[order]),
            }))
        return pa.concat_tables(out)

    cands = ds.map_batches(local, batch_format="pyarrow")
    merged = pa.concat_tables(list(cands.iter_batches(
        batch_format="pyarrow")))
    pdf = merged.to_pandas()
    if exclude_self:
        pdf = pdf[pdf["query_id"] != pdf[id_col]]
    # deterministic two-stage: global ADC top-cand_k fixes candidacy,
    # exact (or ADC) score ranks the final k
    pdf = pdf.sort_values(["query_id", "adc", id_col],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id", sort=True).head(cand_k)
    pdf = pdf.sort_values(["query_id", "score", id_col],
                          ascending=[True, False, True])
    pdf = pdf.drop(columns=["adc"])
    pdf = pdf.groupby("query_id", sort=True).head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)
