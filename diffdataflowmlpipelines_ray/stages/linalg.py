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
    "logreg_fit", "logreg_predict",
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


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically safe logistic (no overflow for |z| large)
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_fit(ds, emb_col: str, label_fn, max_iters: int = 25,
               tol: float = 1e-8, ridge: float = 1e-6) -> dict:
    """Binary logistic regression by distributed IRLS (Newton).

    Per iteration: broadcast β once (``ray.put``), ONE ``map_batches`` pass
    emits per-block partials — gradient Xᵀ(y−p) ((d+1,) incl. intercept),
    Hessian XᵀWX ((d+1)², W = p(1−p)), log-loss and correct-count scalars —
    merged on the driver in deterministic sorted order, then one (d+1)×(d+1)
    ridge-damped solve.  Data never moves; per-block uplink is O(d²) floats.
    Same no-shuffle shape as ``kmeans_fit`` (stages/clustering.py).

    ``label_fn(tbl) -> float64 {0,1} array`` derives the target from the
    block, so the label can be a threshold over any column.  Converges when
    ‖Δβ‖∞ < ``tol``."""
    # probe width with a 1-row sample (schema-only; no full read)
    first = ds.take(1)[0]
    d = len(np.asarray(first[emb_col])) + 1
    beta = np.zeros(d)
    loss = float("inf")
    n_total = 0
    acc = 0.0
    iters_run = 0
    for it in range(max_iters):
        ref = ray.put(beta)

        def partial(tbl: pa.Table) -> pa.Table:
            b = ray.get(ref)
            x = list_column_to_2d(tbl[emb_col])
            X = np.column_stack([x, np.ones(len(x))])
            y = np.asarray(label_fn(tbl), dtype=np.float64)
            p = _sigmoid(X @ b)
            g = X.T @ (y - p)
            w = p * (1.0 - p)
            H = (X * w[:, None]).T @ X
            eps = 1e-12
            ll = float(-(y * np.log(p + eps)
                         + (1 - y) * np.log(1 - p + eps)).sum())
            correct = float(((p >= 0.5) == (y >= 0.5)).sum())
            flat = np.concatenate([g, H.reshape(-1),
                                   [ll, correct, float(len(x))]])
            return pa.table({"part": list_array_from_2d(flat[None, :])})

        rows = [np.asarray(r["part"], dtype=np.float64)
                for r in ds.map_batches(partial,
                                        batch_format="pyarrow").take_all()]
        rows.sort(key=lambda a: (a[-1], a[0]))   # deterministic merge order
        tot = np.zeros(d + d * d + 3)
        for r in rows:
            tot += r
        g = tot[:d]
        H = tot[d:d + d * d].reshape(d, d)
        loss = float(tot[-3])
        n_total = int(tot[-1])
        acc = float(tot[-2]) / max(n_total, 1)
        step = np.linalg.solve(H + ridge * np.eye(d), g)
        beta = beta + step
        iters_run = it + 1
        if float(np.abs(step).max()) < tol:
            break
    return {"coef": beta[:-1], "intercept": float(beta[-1]),
            "log_loss": loss / max(n_total, 1), "train_accuracy": acc,
            "iters": iters_run, "n": n_total}


def logreg_predict(ds, model: dict, emb_col: str = "embedding",
                   out: str = "score"):
    """Stateless scoring pass: σ(x·β + b) per row, model broadcast once."""
    ref = ray.put((np.asarray(model["coef"]), float(model["intercept"])))

    def score(tbl: pa.Table) -> pa.Table:
        coef, b = ray.get(ref)
        x = list_column_to_2d(tbl[emb_col])
        return tbl.append_column(out, pa.array(_sigmoid(x @ coef + b)))

    return ds.map_batches(score, batch_format="pyarrow")


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
