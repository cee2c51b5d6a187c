"""Distributed multivariate moments → PCA and OLS (normal equations).

The reference fits per-column univariate statistics with an invertible
Chan-merge variance accumulator (src/feature_encoders/standard_scaler.rs:35-48);
this module is the d-dimensional generalisation: ONE ``map_batches`` pass
emits per-block (n, mean vector, comoment matrix) partials — d(d+3)/2+1
floats per block, never rows — merged on the driver with the pairwise Chan
update, so the covariance is exact-order-stable (no catastrophic
cancellation from raw Σxᵢxⱼ sums) and the only data movement is the tiny
partials.  At 100 TB the driver merge is O(blocks · d²) with d ≤ a few
hundred; there is NO shuffle.

From the merged moments:
  * ``pca_fit``    — eigh of the d×d covariance on the driver (d is small by
    construction; the data never moves), deterministic sign convention.
  * ``linreg_fit`` — multivariate OLS via the centered normal equations
    β = C⁻¹ₓₓ Cₓᵧ, numerically the textbook two-pass algorithm but done in
    one distributed pass thanks to the Chan merge.
  * ``pca_transform`` — stateless broadcast projection pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.vectors import list_array_from_2d, list_column_to_2d

__all__ = [
    "Moments", "column_moments", "vector_moments",
    "pca_fit", "pca_transform", "linreg_fit",
]


class Moments:
    """n, mean (d,), M2 (d,d) centered comoment matrix (Σ(x−μ)(x−μ)ᵀ)."""

    __slots__ = ("n", "mean", "m2")

    def __init__(self, n: int, mean: np.ndarray, m2: np.ndarray):
        self.n = int(n)
        self.mean = np.asarray(mean, dtype=np.float64)
        self.m2 = np.asarray(m2, dtype=np.float64)

    @classmethod
    def from_matrix(cls, mat: np.ndarray) -> "Moments":
        mat = np.asarray(mat, dtype=np.float64)
        n = mat.shape[0]
        mean = mat.mean(axis=0) if n else np.zeros(mat.shape[1])
        c = mat - mean
        return cls(n, mean, c.T @ c)

    def merge(self, other: "Moments") -> "Moments":
        """Chan's pairwise update — exact regardless of split sizes."""
        if other.n == 0:
            return self
        if self.n == 0:
            return other
        n = self.n + other.n
        delta = other.mean - self.mean
        mean = self.mean + delta * (other.n / n)
        m2 = self.m2 + other.m2 + np.outer(delta, delta) * (
            self.n * other.n / n)
        return Moments(n, mean, m2)

    def cov(self, ddof: int = 0) -> np.ndarray:
        return self.m2 / max(self.n - ddof, 1)


def _merge_partial_rows(rows) -> Moments:
    """Merge per-block partial rows deterministically (sorted by (n, mean))
    so the float result is identical across schedulings."""
    parts = []
    for r in rows:
        mean = np.asarray(r["mean"], dtype=np.float64)
        d = len(mean)
        parts.append(Moments(int(r["n"]), mean,
                             np.asarray(r["m2"],
                                        dtype=np.float64).reshape(d, d)))
    parts.sort(key=lambda m: (m.n, tuple(m.mean)))
    acc = Moments(0, np.zeros(d), np.zeros((d, d)))
    for p in parts:
        acc = acc.merge(p)
    return acc


def _moments_from(ds, to_matrix) -> Moments:
    def partial(tbl: pa.Table) -> pa.Table:
        m = Moments.from_matrix(to_matrix(tbl))
        return pa.table({
            "n": pa.array([m.n], type=pa.int64()),
            "mean": list_array_from_2d(m.mean[None, :]),
            "m2": list_array_from_2d(m.m2.reshape(1, -1)),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_partial_rows(rows)


def column_moments(ds, cols: list[str]) -> Moments:
    """Joint moments of d scalar columns in one no-shuffle pass."""
    def to_matrix(tbl: pa.Table) -> np.ndarray:
        return np.column_stack([
            tbl[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
    return _moments_from(ds, to_matrix)


def vector_moments(ds, emb_col: str) -> Moments:
    """Joint moments of a fixed-width list<float> column (width inferred)."""
    return _moments_from(ds, lambda tbl: list_column_to_2d(tbl[emb_col]))


def pca_fit(moments: Moments, n_components: int | None = None) -> dict:
    """PCA from the covariance eigendecomposition (population covariance,
    matching sklearn's ddof=1 only in ratio terms — we expose both).

    Sign convention: each component's largest-|.| coordinate is positive, so
    the fit is deterministic (eigh sign is otherwise arbitrary)."""
    cov = moments.cov(ddof=1) if moments.n > 1 else moments.cov()
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    comps = vecs.T                            # (d, d) rows = components
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    k = n_components or len(vals)
    total = float(vals.sum()) or 1.0
    return {
        "mean": moments.mean,
        "components": comps[:k],
        "explained_variance": vals[:k],
        "explained_variance_ratio": vals[:k] / total,
        "n": moments.n,
    }


def pca_transform(ds, model: dict, emb_col: str = "embedding",
                  out: str = "pc"):
    """Stateless projection pass: (x − mean) @ componentsᵀ per block; the
    model (k×d) is broadcast once via ``ray.put``."""
    ref = ray.put((np.asarray(model["mean"]),
                   np.asarray(model["components"])))

    def project(tbl: pa.Table) -> pa.Table:
        mean, comps = ray.get(ref)
        mat = list_column_to_2d(tbl[emb_col])
        proj = (mat - mean) @ comps.T
        return tbl.append_column(out, list_array_from_2d(proj))

    return ds.map_batches(project, batch_format="pyarrow")


def linreg_fit(moments: Moments, x_idx: list[int], y_idx: int) -> dict:
    """OLS on the centered normal equations: β = Cₓₓ⁻¹ Cₓᵧ,
    intercept = μ_y − β·μ_x, R² = β·Cₓᵧ / C_yy.  Exact same estimator as
    lstsq-with-intercept but computed from the one-pass moments."""
    c = moments.cov()
    xi = np.asarray(x_idx)
    cxx = c[np.ix_(xi, xi)]
    cxy = c[xi, y_idx]
    cyy = float(c[y_idx, y_idx])
    beta = np.linalg.solve(cxx, cxy)
    intercept = float(moments.mean[y_idx] - beta @ moments.mean[xi])
    r2 = float(beta @ cxy / cyy) if cyy > 0 else 0.0
    return {"coef": beta, "intercept": intercept, "r2": r2, "n": moments.n}
