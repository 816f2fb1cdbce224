"""Tests for the Geo-FNO family: NUDFT ops, mesh/point-cloud models,
supervised routines, and their builders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierflow_tpu.models import (
    FNOFactorizedMesh2D,
    FNOFactorizedMesh3D,
    FNOFactorizedPointCloud2D,
    IPhi,
)
from fourierflow_tpu.ops.nudft import inudft2d, nudft2d, nudft_wavenumbers
from fourierflow_tpu.routines import PointCloudRoutine, StructuredMeshRoutine
from fourierflow_tpu.routines.base import make_optimizer


def _reference_nudft_numpy(u, x, modes1, modes2):
    """Literal numpy replica of reference point_cloud_2d.py fft2d/ifft2d
    (complex arithmetic, channels-first)."""
    k1, k2 = nudft_wavenumbers(modes1, modes2)
    K = x[..., 0][..., None, None] * k1[None, None, :, None] + x[..., 1][
        ..., None, None
    ] * k2[None, None, None, :]
    basis = np.exp(-2j * np.pi * K)  # [b, n, m1, m2]
    return np.einsum("bcn,bnxy->bcxy", u, basis)


def _reference_inudft_numpy(u_ft, x, modes1, modes2):
    k1, k2 = nudft_wavenumbers(modes1, modes2)
    K = x[..., 0][..., None, None] * k1[None, None, :, None] + x[..., 1][
        ..., None, None
    ] * k2[None, None, None, :]
    basis = np.exp(2j * np.pi * K)
    u_ft2 = np.flip(u_ft[..., 1:], axis=(-1, -2)).conj()
    u_full = np.concatenate([u_ft, u_ft2], axis=-1)
    return np.real(np.einsum("bcxy,bnxy->bcn", u_full, basis))


def test_nudft_matches_reference_formula():
    rng = np.random.RandomState(0)
    b, n, c, m1, m2 = 2, 17, 3, 4, 5
    u = rng.randn(b, n, c).astype(np.float32)
    x = rng.rand(b, n, 2).astype(np.float32)

    yr, yi = nudft2d(jnp.asarray(u), jnp.asarray(x), m1, m2)
    want = _reference_nudft_numpy(np.moveaxis(u, -1, 1), x, m1, m2)[..., :m2]
    got = np.moveaxis(np.asarray(yr + 1j * yi), -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_inudft_matches_reference_formula():
    rng = np.random.RandomState(1)
    b, n, c, m1, m2 = 2, 13, 3, 4, 5
    u_half = (rng.randn(b, c, 2 * m1, m2) + 1j * rng.randn(b, c, 2 * m1, m2)).astype(
        np.complex64
    )
    x = rng.rand(b, n, 2).astype(np.float32)

    got = inudft2d(
        jnp.asarray(np.moveaxis(u_half.real, 1, -1)),
        jnp.asarray(np.moveaxis(u_half.imag, 1, -1)),
        jnp.asarray(x),
        m1,
        m2,
    )
    want = np.moveaxis(_reference_inudft_numpy(u_half, x, m1, m2), 1, -1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_mesh_2d_forward_and_grad():
    m = FNOFactorizedMesh2D(
        modes_x=4, modes_y=3, width=8, input_dim=4, n_layers=2, share_weight=True
    )
    x = jnp.ones((2, 20, 12, 2))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 20, 12, 1)

    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_mesh_3d_forward():
    m = FNOFactorizedMesh3D(
        modes_x=3, modes_y=3, modes_z=3, width=8, input_dim=4, output_dim=4, n_layers=2
    )
    x = jnp.ones((1, 12, 10, 8, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 12, 10, 8, 4)


def test_mesh_3d_remat_matches_unremat():
    """remat=True: identical param tree, forward, and gradients."""
    kwargs = dict(modes_x=3, modes_y=3, modes_z=3, width=8, input_dim=4,
                  output_dim=4, n_layers=2)
    m0 = FNOFactorizedMesh3D(remat=False, **kwargs)
    m1 = FNOFactorizedMesh3D(remat=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 10, 8, 1))
    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(m0.apply(p0, x)),
                               np.asarray(m1.apply(p0, x)), rtol=1e-6, atol=1e-7)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    g0 = jax.jit(jax.grad(loss(m0)))(p0)
    g1 = jax.jit(jax.grad(loss(m1)))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_iphi_shapes_and_identity_scale():
    m = IPhi(width=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 50, 2))
    code = jax.random.normal(jax.random.PRNGKey(1), (2, 42))
    params = m.init(jax.random.PRNGKey(2), x, code)
    out = m.apply(params, x, code)
    assert out.shape == (2, 50, 2)
    out_nc = m.init_with_output(jax.random.PRNGKey(3), x)[0]
    assert out_nc.shape == (2, 50, 2)


def test_point_cloud_model_with_iphi():
    m = FNOFactorizedPointCloud2D(
        modes1=4, modes2=4, width=8, in_channels=2, out_channels=1,
        n_layers=2, s1=12, s2=12, iphi=IPhi(width=8),
    )
    u = jax.random.uniform(jax.random.PRNGKey(0), (2, 30, 2))
    code = jax.random.normal(jax.random.PRNGKey(1), (2, 42))
    params = m.init(jax.random.PRNGKey(2), u, code=code)
    out = m.apply(params, u, code=code)
    assert out.shape == (2, 30, 1)
    assert "iphi" in params["params"]


def test_structured_mesh_routine_learns():
    m = FNOFactorizedMesh2D(modes_x=4, modes_y=4, width=8, input_dim=4, n_layers=2)
    routine = StructuredMeshRoutine(m, optimizer=make_optimizer(lr=2e-3))
    rng = np.random.RandomState(0)
    x = rng.rand(8, 16, 12, 2).astype(np.float32)
    y = (x[..., :1] * 2 + 0.5).astype(np.float32)  # easy target
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    state = routine.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(routine.train_step)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < 0.5 * losses[0]
    val = routine.valid_step(state, batch)
    assert np.isfinite(float(val["loss"]))


def test_point_cloud_routine_trains():
    m = FNOFactorizedPointCloud2D(
        modes1=3, modes2=3, width=8, in_channels=2, out_channels=1,
        n_layers=2, s1=10, s2=10, iphi=IPhi(width=8),
    )
    routine = PointCloudRoutine(m, N=16, optimizer=make_optimizer(lr=1e-3))
    rng = np.random.RandomState(0)
    batch = {
        "xy": jnp.asarray(rng.rand(2, 24, 2).astype(np.float32)),
        "rr": jnp.asarray(rng.randn(2, 42).astype(np.float32)),
        "sigma": jnp.asarray(rng.randn(2, 24, 1).astype(np.float32)),
    }
    state = routine.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(routine.train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))
    assert np.isfinite(float(metrics["train_loss_reg"]))


def test_geo_builders(tmp_path):
    from fourierflow_tpu.builders import (
        ElasticityBuilder,
        PlasticityBuilder,
        StructuredMesh2DBuilder,
    )

    rng = np.random.RandomState(0)
    # elasticity triplet
    np.save(tmp_path / "rr.npy", rng.rand(42, 20))
    np.save(tmp_path / "sigma.npy", rng.rand(50, 20))
    np.save(tmp_path / "xy.npy", rng.rand(50, 2, 20))
    eb = ElasticityBuilder(
        sigma_path=str(tmp_path / "sigma.npy"),
        xy_path=str(tmp_path / "xy.npy"),
        rr_path=str(tmp_path / "rr.npy"),
        train_size=10, valid_size=5, test_size=5, batch_size=4,
    )
    assert eb.train_data["rr"].shape == (10, 42)
    assert eb.train_data["sigma"].shape == (10, 50, 1)
    assert eb.train_data["xy"].shape == (10, 50, 2)
    assert len(eb.valid_data["rr"]) == 5 and len(eb.test_data["rr"]) == 5

    # airfoil
    np.save(tmp_path / "x1.npy", rng.rand(20, 11, 7))
    np.save(tmp_path / "x2.npy", rng.rand(20, 11, 7))
    np.save(tmp_path / "q.npy", rng.rand(20, 4, 11, 7))
    sb = StructuredMesh2DBuilder(
        x1_path=str(tmp_path / "x1.npy"),
        x2_path=str(tmp_path / "x2.npy"),
        sigma_path=str(tmp_path / "q.npy"),
        output_dim=3, train_size=10, valid_size=5, test_size=5, batch_size=4,
    )
    assert sb.train_data["x"].shape == (10, 11, 7, 2)
    assert sb.train_data["y"].shape == (10, 11, 7)

    # plasticity
    import h5py
    import scipy.io

    scipy.io.savemat(
        tmp_path / "plas.mat",
        {"input": rng.rand(12, 9), "output": rng.rand(12, 9, 5, 4, 4)},
    )
    pb = PlasticityBuilder(
        data_path=str(tmp_path / "plas.mat"),
        train_size=8, valid_size=2, test_size=2,
        s1=9, s2=5, t=4, batch_size=4,
    )
    assert pb.train_data["x"].shape == (8, 9, 5, 4, 1)
    assert pb.train_data["y"].shape == (8, 9, 5, 4, 4)


def test_ns_contextual_builder(tmp_path):
    import h5py

    from fourierflow_tpu.builders import NSContextualBuilder

    rng = np.random.RandomState(0)
    path = tmp_path / "ctx.h5"
    with h5py.File(path, "w") as f:
        for split in ["train", "valid", "test"]:
            f.create_dataset(f"{split}/u", data=rng.rand(4, 8, 8, 6).astype(np.float32))
            f.create_dataset(f"{split}/f", data=rng.rand(4, 8, 8).astype(np.float32))
            f.create_dataset(f"{split}/mu", data=rng.rand(4).astype(np.float32))
    b = NSContextualBuilder(str(path), ssr=1, k=1, batch_size=4)
    assert b.train_data["x"].shape == (20, 8, 8, 1)  # 4 * (6-1)
    assert b.train_data["f"].shape == (20, 8, 8)
    assert b.train_data["mu"].shape == (20,)
    assert b.valid_data["data"].shape == (4, 8, 8, 6)


def test_mesh_models_padding_zero():
    """padding=0 must be a no-op (periodic domains), not an empty ':-0'
    slice — regression for the 3D Kolmogorov one-step training setup."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fourierflow_tpu.models import FNOFactorizedMesh2D, FNOFactorizedMesh3D

    rng = np.random.RandomState(0)
    m2 = FNOFactorizedMesh2D(modes_x=4, modes_y=4, width=8, input_dim=4,
                             n_layers=2, padding=0)
    x2 = jnp.asarray(rng.randn(2, 12, 10, 2).astype(np.float32))
    p2 = m2.init(jax.random.PRNGKey(0), x2)
    out2 = m2.apply(p2, x2)
    assert out2.shape == (2, 12, 10, 1)
    assert bool(jnp.isfinite(out2).all())

    m3 = FNOFactorizedMesh3D(modes_x=3, modes_y=3, modes_z=3, width=8,
                             input_dim=6, output_dim=3, n_layers=2, padding=0)
    x3 = jnp.asarray(rng.randn(2, 8, 8, 8, 3).astype(np.float32))
    p3 = m3.init(jax.random.PRNGKey(0), x3)
    out3 = m3.apply(p3, x3)
    assert out3.shape == (2, 8, 8, 8, 3)
    assert bool(jnp.isfinite(out3).all())
