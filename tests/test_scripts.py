"""Unit coverage for the measurement scripts' host-side logic (the chip
legs are driven on hardware; see RESULTS.md)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stepsize_dns_rejects_misaligned_mults(tmp_path, monkeypatch):
    """A dt multiple whose recording cadence can't land exactly on
    ground-truth frames must be rejected before any simulation."""
    ss = _load("stepsize_dns")
    monkeypatch.setattr(sys, "argv", [
        "stepsize_dns.py", "--data-dir", str(tmp_path), "--mults", "1", "3"])
    with pytest.raises(SystemExit, match="does not align"):
        ss.main()
    # coarser-than-gt-only sweeps whose strides don't divide are rejected too
    monkeypatch.setattr(sys, "argv", [
        "stepsize_dns.py", "--data-dir", str(tmp_path), "--mults", "64", "96"])
    with pytest.raises(SystemExit, match="does not align"):
        ss.main()


def test_stepsize_dns_alignment_math():
    """Divisor multiples share the gt cadence (stride 1); whole multiples
    stride the gt frames (the reference's isel(time=slice(1,None,2)))."""
    cadence_mult = 32
    gt_mult = 1
    gt_cadence_steps = gt_mult * max(1, cadence_mult // gt_mult)
    for m, want_stride in [(1, 1), (2, 1), (16, 1), (32, 1), (64, 2), (128, 4)]:
        cadence_steps = m * max(1, cadence_mult // m)
        assert cadence_steps % gt_cadence_steps == 0
        assert cadence_steps // gt_cadence_steps == want_stride


def test_inference_timing_model_builder():
    """The timing script rebuilds the exact campaign architectures."""
    it = _load("inference_timing")
    m = it.build_model("ffno", 4, "f32")
    assert type(m).__name__ == "FNOFactorized2DBlock"
    m = it.build_model("zongyi", 24, "bf16")
    assert type(m).__name__ == "FNOZongyi2DBlock"
    with pytest.raises(ValueError):
        it.build_model("nope", 4, "f32")


def test_downsampling_fidelity_ladder_logic():
    """The fidelity script carries the reference's exact acceptance
    thresholds (reference:tests/test_conversions.py:59-76) and its ladder
    agrees with the library downsampler on a smooth small-scale field."""
    import jax
    import jax.numpy as jnp

    df = _load("downsampling_fidelity")
    assert df.REFERENCE_THRESHOLDS == {
        1024: 0.9999999, 512: 0.999, 256: 0.998, 128: 0.99, 64: 0.97,
        32: 0.927,
    }

    # A band-limited k=1 field: direct vs repeated agree to O(h^2) of the
    # fd curl at the coarse target (measured 0.9976 at 16^2).
    from fourierflow_tpu.utils.grids import Grid
    from fourierflow_tpu.utils.spectral import (
        downsample_vorticity_hat, grid_correlation, rfft2,
        vorticity_to_velocity_solve,
    )

    n = 64
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    # k=1 only: the fd curl's O((kh)^2) error at the 16^2 target is then
    # far below the assertion tolerance on both ladder paths.
    w = np.sin(x)[:, None] * np.cos(x)[None, :].astype(np.float32)
    domain = ((0, 2 * np.pi), (0, 2 * np.pi))

    def down(field, frm, to):
        g_in = Grid((frm, frm), domain=domain)
        g_out = Grid((to, to), domain=domain)
        sv = vorticity_to_velocity_solve(g_in)
        return downsample_vorticity_hat(
            rfft2(jnp.asarray(field, jnp.float32), axes=(0, 1)), sv, g_in, g_out
        )["vorticity"]

    direct = down(w, n, 16)
    rep = down(down(w, n, 32), 32, 16)
    rho = float(grid_correlation(direct, rep, axes=(-2, -1)))
    assert rho > 0.99, rho


def test_elasticity_standin_generation_shapes_and_physics():
    es = _load("elasticity_standin")
    rr, xy, sigma = es.generate(16, seed=3)
    assert rr.shape == (16, 42) and xy.shape == (16, 972, 2)
    assert sigma.shape == (16, 972, 1)
    # Geometry bounds and Kirsch stress-concentration range (factor -1..3
    # of sigma_inf at the hole for uniaxial tension).
    assert rr.min() >= 0.08 and rr.max() <= 0.35
    assert xy.min() >= 0.0 and xy.max() <= 1.0
    assert sigma.min() >= -1.01 * es.SIGMA_INF
    assert sigma.max() <= 3.01 * es.SIGMA_INF
    # Points lie OUTSIDE the void: radius from center >= local boundary.
    rho = np.linalg.norm(xy - 0.5, axis=-1).reshape(16, 27, 36)
    theta_c = 2 * np.pi * np.arange(42) / 42
    theta = 2 * np.pi * np.arange(36) / 36
    for i in range(4):
        r_b = np.interp(theta, theta_c, rr[i], period=2 * np.pi)
        assert (rho[i] >= r_b[None, :] - 1e-5).all()


def test_mgn_standin_mesh_is_valid_triangulation():
    mg = _load("mgn_standin")
    pos, cells, node_type = mg._mesh(8)
    assert pos.shape == (64, 2) and cells.shape == (2 * 49, 3)
    assert cells.min() >= 0 and cells.max() < 64
    # Every triangle has nonzero area (no degenerate cells).
    p = pos[cells]  # [C, 3, 2]
    area = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1]))
    assert (area > 1e-8).all()
    # Border ring marked as wall, interior normal.
    assert node_type.sum() == 6 * (4 * 8 - 4)
    assert set(np.unique(node_type)) == {0, 6}


def test_mgn_standin_build_h5_stride_time(tmp_path):
    """--stride-time subsamples frames before the (vel, tgt) pairing, so
    targets are stride-sized deltas, not stride-strided one-frame deltas."""
    import h5py

    mg = _load("mgn_standin")
    src = tmp_path / "src.h5"
    T, n = 33, 8
    ramp = np.arange(T, dtype=np.float32)[None, :, None, None]
    with h5py.File(src, "w") as f:
        f["vx"] = np.broadcast_to(ramp, (3, T, n, n)).copy()
        f["vy"] = np.zeros((3, T, n, n), np.float32)
    out = tmp_path / "cyl.h5"
    mg.build_h5(str(src), str(out), 1, 1, 1, stride_time=16)
    with h5py.File(out, "r") as f:
        vel = f["train/velocity"][...]
        tgt = f["train/target_velocity"][...]
    # T=33 at stride 16 -> frames {0,16,32} -> 2 (vel,tgt) pairs.
    assert vel.shape[1] == 2
    # The vx delta per pair is the full 16-frame ramp step.
    np.testing.assert_allclose(tgt[..., 0] - vel[..., 0], 16.0)


def test_li_diagnosis_reference_alignment():
    """The diagnosis compares snapshots at raw indices 15, 31, ... — the
    exact two-stage subsample KolmogorovVelocityTrajectoryDataset uses
    (inner=16, k=1). Pin the arithmetic."""
    li = _load("li_diagnosis")
    s = li.SNAPSHOT_MODEL_STEPS
    idx = np.arange(s - 1, 1600, s)[: li.N_SNAPSHOTS]
    assert idx[0] == 15 and idx[1] == 31 and len(idx) == 100
    # matches the dataset's slice(s*k - 1, None, s*k) for k=1
    assert list(idx) == list(range(1600))[slice(s - 1, None, s)][:100]
