"""Tests for the secondary model families: FNO++ and the Geo-FNO zongyi
baselines (mesh 2D/3D, point cloud), the fully-factorized mesh_plus
variant, the FCNO (DCT) family, GehringLinear, and the Hilbert ordering."""

import jax
import jax.numpy as jnp
import numpy as np

from fourierflow_tpu.layers import GehringLinear
from fourierflow_tpu.models import (
    CNOFactorized2DBlock,
    CNOFactorizedMesh2D,
    CNOFactorizedMesh3D,
    FNOFullyFactorizedMesh2D,
    FNOMesh2D,
    FNOMesh3D,
    FNOPlus2DBlock,
    FNOPointCloud2D,
    IPhi,
)
from fourierflow_tpu.ops.spectral import spectral_conv_3d_full
from fourierflow_tpu.utils.hilbert import hilbert_sort


def test_fno_plus_2d_block_forward():
    model = FNOPlus2DBlock(modes=4, width=8, input_dim=3, n_layers=2, use_fork=True)
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["forecast"].shape == (2, 16, 16, 1)
    assert len(out["forecast_list"]) == 2
    assert np.isfinite(np.asarray(out["forecast"])).all()


def test_fno_plus_share_weight_param_count():
    kwargs = dict(modes=4, width=8, input_dim=3, n_layers=3)
    x = jnp.ones((1, 16, 16, 3))
    p_shared = FNOPlus2DBlock(share_weight=True, **kwargs).init(jax.random.PRNGKey(0), x)
    p_sep = FNOPlus2DBlock(share_weight=False, **kwargs).init(jax.random.PRNGKey(0), x)
    n_shared = sum(np.size(v) for v in jax.tree.leaves(p_shared))
    n_sep = sum(np.size(v) for v in jax.tree.leaves(p_sep))
    assert n_shared < n_sep


def test_zongyi_mesh_2d_forward():
    model = FNOMesh2D(modes1=4, modes2=4, width=8, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 12, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 24, 12, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_zongyi_mesh_3d_forward():
    model = FNOMesh3D(modes1=3, modes2=3, modes3=2, width=6, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 10, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 12, 10, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_spectral_conv_3d_full_matches_fft_reference():
    """Golden check of the 4-corner 3D spectral conv against a direct
    complex-FFT computation (the reference math, zongyi mesh_3d.py:38-56)."""
    rng = np.random.RandomState(0)
    b, sx, sy, sz, ci, co, m1, m2, m3 = 2, 8, 8, 8, 3, 4, 2, 2, 2
    x = rng.randn(b, sx, sy, sz, ci).astype(np.float32)
    ws = [rng.randn(ci, co, m1, m2, m3, 2).astype(np.float32) * 0.1 for _ in range(4)]

    got = np.asarray(spectral_conv_3d_full(jnp.asarray(x), [jnp.asarray(w) for w in ws]))

    xc = np.moveaxis(x, -1, 1)  # [b, i, sx, sy, sz]
    xf = np.fft.rfftn(xc, axes=(2, 3, 4))
    out_f = np.zeros((b, co, sx, sy, sz // 2 + 1), dtype=np.complex64)
    corners = [
        (slice(0, m1), slice(0, m2)),
        (slice(sx - m1, sx), slice(0, m2)),
        (slice(0, m1), slice(sy - m2, sy)),
        (slice(sx - m1, sx), slice(sy - m2, sy)),
    ]
    for w, (s1, s2) in zip(ws, corners):
        wc = w[..., 0] + 1j * w[..., 1]
        out_f[:, :, s1, s2, :m3] = np.einsum(
            "bixyz,ioxyz->boxyz", xf[:, :, s1, s2, :m3], wc
        )
    want = np.fft.irfftn(out_f, s=(sx, sy, sz), axes=(2, 3, 4))
    want = np.moveaxis(want, 1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_zongyi_point_cloud_forward():
    iphi = IPhi(width=8)
    model = FNOPointCloud2D(
        modes1=3, modes2=3, width=8, in_channels=2, out_channels=1,
        n_layers=2, s1=12, s2=12, iphi=iphi,
    )
    u = jax.random.uniform(jax.random.PRNGKey(2), (2, 37, 2))
    code = jax.random.normal(jax.random.PRNGKey(3), (2, 42))
    params = model.init(jax.random.PRNGKey(0), u, code)
    out = model.apply(params, u, code)
    assert out.shape == (2, 37, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_mesh_plus_forward():
    iphi = IPhi(width=8)
    model = FNOFullyFactorizedMesh2D(
        modes1=3, modes2=4, width=8, in_channels=2, out_channels=1,
        n_layers=2, s1=12, s2=12, iphi=iphi,
    )
    u = jax.random.uniform(jax.random.PRNGKey(2), (2, 29, 2))
    code = jax.random.normal(jax.random.PRNGKey(3), (2, 42))
    params = model.init(jax.random.PRNGKey(0), u, code)
    out = model.apply(params, u, code)
    assert out.shape == (2, 29, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cno_grid_2d_forward():
    model = CNOFactorized2DBlock(modes=4, width=8, input_dim=3, n_layers=2, use_fork=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["forecast"].shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out["forecast"])).all()


def test_cno_mesh_2d_forward():
    model = CNOFactorizedMesh2D(
        modes_x=4, modes_y=3, width=8, input_dim=4, n_layers=2
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 14, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 20, 14, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cno_mesh_3d_forward():
    model = CNOFactorizedMesh3D(
        modes_x=3, modes_y=3, modes_z=2, width=6, input_dim=4, output_dim=4, n_layers=2
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 10, 10, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 12, 10, 10, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_gehring_linear_init_stats():
    layer = GehringLinear(64, dropout=0.0)
    x = jnp.ones((4, 256))
    params = layer.init(jax.random.PRNGKey(0), x)
    kernel = np.asarray(params["params"]["kernel"])
    # N(0, sqrt(1/fan_in)) -> std ~ 1/16
    assert abs(kernel.std() - 1.0 / 16.0) < 0.01
    out = layer.apply(params, x)
    assert out.shape == (4, 64)


def test_hilbert_sort_locality():
    """Consecutive points along the Hilbert order should be spatially close
    on average — much closer than a random order."""
    rng = np.random.RandomState(0)
    pos = rng.rand(512, 2)
    perm = hilbert_sort(pos)
    assert sorted(perm.tolist()) == list(range(512))
    sorted_d = np.linalg.norm(np.diff(pos[perm], axis=0), axis=1).mean()
    rand_d = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
    assert sorted_d < 0.5 * rand_d


def test_hilbert_sort_grid_is_exact_curve():
    """On a perfect 2^k lattice the order must visit unit-distance
    neighbours only (the defining Hilbert property)."""
    k = 4
    xs, ys = np.meshgrid(np.arange(2**k), np.arange(2**k), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    perm = hilbert_sort(pos, order=k)
    steps = np.abs(np.diff(pos[perm], axis=0)).sum(axis=1)
    np.testing.assert_array_equal(steps, np.ones(len(pos) - 1))


def test_zongyi_remat_matches_unremat():
    """FNOZongyi2DBlock remat=True: identical tree, forward, gradients."""
    from fourierflow_tpu.models import FNOZongyi2DBlock

    kwargs = dict(modes1=4, modes2=4, width=8, input_dim=3, n_layers=2,
                  residual=True)
    m0 = FNOZongyi2DBlock(remat=False, **kwargs)
    m1 = FNOZongyi2DBlock(remat=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(m0.apply(p0, x)["forecast"]),
                               np.asarray(m1.apply(p0, x)["forecast"]),
                               rtol=1e-6, atol=1e-7)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x)["forecast"] ** 2)

    g0 = jax.jit(jax.grad(loss(m0)))(p0)
    g1 = jax.jit(jax.grad(loss(m1)))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
