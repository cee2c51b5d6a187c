"""Skyline (Pareto frontier) operator: kernel vs brute force, Dataset
plan partition-invariance, tie semantics (equal-on-all-dims rows all
survive), anti-correlated worst case."""

import numpy as np
import pandas as pd
import pytest

import ray

from diffdataflowmlpipelines_ray.stages.skyline import _sky_mask, skyline


def _brute(X: np.ndarray) -> np.ndarray:
    n = len(X)
    keep = np.ones(n, bool)
    for i in range(n):
        dom = ((X >= X[i]).all(axis=1) & (X > X[i]).any(axis=1)).any()
        keep[i] = not dom
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        n = int(rng.integers(1, 300))
        d = int(rng.integers(1, 5))
        # small integer domain → heavy ties, the hard case for the
        # dense-rank visit order
        X = rng.integers(0, 6, size=(n, d)).astype(float)
        assert (_sky_mask(X) == _brute(X)).all()


def test_duplicates_all_survive():
    X = np.array([[3.0, 3.0], [3.0, 3.0], [1.0, 1.0]])
    assert (_sky_mask(X) == [True, True, False]).all()


def test_anticorrelated_everything_on_frontier():
    n = 50
    X = np.column_stack([np.arange(n), n - np.arange(n)]).astype(float)
    assert _sky_mask(X).all()


@pytest.mark.parametrize("blocks", [1, 5])
def test_dataset_skyline_partition_invariant(ray_session, blocks):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "id": np.arange(400),
        "a": rng.integers(0, 20, 400).astype(np.int64),
        "b": rng.integers(0, 20, 400).astype(np.int64),
        "c": rng.integers(0, 20, 400).astype(np.int64),
    })
    ds = ray.data.from_pandas(pdf).repartition(blocks)
    got = (skyline(ds, ["a", "b", "c"]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    keep = _brute(pdf[["a", "b", "c"]].to_numpy(dtype=float))
    want = pdf[keep].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
