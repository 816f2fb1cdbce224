"""k-stride arithmetic of the Kolmogorov datasets across the step-size
sweep range (reference experiments/torus_kochkov/ffno/step_sizes/*): the
trajectory dataset's two-stage slice (file cadence -> model cadence ->
validation snapshots) must yield enough frames for the equal-sim-horizon
rollout at every k, and the markov pair count must track (T - k)."""

import os

import h5py
import numpy as np
import pytest

from fourierflow_tpu.builders.kolmogorov import (
    KolmogorovMarkovDataset,
    KolmogorovTrajectoryDataset,
    KolmogorovVelocityTrajectoryDataset,
)

T = 601  # file frames (small analog of the 2441-frame sweep files)


@pytest.fixture(scope="module")
def sweep_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("ksweep")
    rng = np.random.default_rng(0)
    for stem, size, nt in (("train_64_1", 8, 3), ("test_64_1", 8, 2),
                           ("test_32_1", 4, 2)):
        with h5py.File(os.path.join(d, stem + ".h5"), "w") as f:
            for k in ("vorticity", "vx", "vy"):
                f[k] = rng.standard_normal((nt, T, size, size)).astype(np.float32)
            f["time"] = (np.arange(T, dtype=np.float32) + 1) * 0.014
    with h5py.File(os.path.join(d, "test_init_64.h5"), "w") as f:
        for k in ("vorticity", "vx", "vy"):
            f[k] = rng.standard_normal((2, 8, 8)).astype(np.float32)
        f["time"] = np.zeros((2,), np.float32)
    return str(d)


@pytest.mark.parametrize("k", [5, 10, 20, 40])
def test_equal_horizon_rollout_fits(sweep_files, k):
    d = sweep_files
    n_steps = (T - 1 - k) // k  # equal-sim-horizon rollout length
    ds = KolmogorovMarkovDataset(os.path.join(d, "train_64_1.h5"), k=k)
    assert len(ds) == 3 * (T - k)
    eds = KolmogorovTrajectoryDataset(
        init_path=os.path.join(d, "test_init_64.h5"),
        path=os.path.join(d, "test_64_1.h5"),
        corr_path=os.path.join(d, "test_32_1.h5"), k=k)
    b = eds.sample(np.arange(2))
    # init frame + at least n_steps strided targets, 64^2 and 32^2 aligned
    assert b["data"].shape[-1] >= n_steps + 1
    assert b["corr_data"].shape[-1] == b["data"].shape[-1]


def test_velocity_trajectory_two_stage_subsample(sweep_files):
    """Targets land at raw index i*inner*k - 1 (the reference indexes the
    k-strided array at s, 2s, ... after prepending the init)."""
    d = sweep_files
    eds = KolmogorovVelocityTrajectoryDataset(
        init_path=os.path.join(d, "test_init_64.h5"),
        corr_path=os.path.join(d, "test_32_1.h5"),
        k=1, inner_steps=16, outer_steps=30)
    s = eds.sample(np.arange(2))
    assert s["targets"].shape == (2, 4, 4, 30)
    np.testing.assert_allclose(
        s["times"][0], (np.arange(30, dtype=np.float32) + 1) * 16 * 0.014,
        rtol=1e-5)
