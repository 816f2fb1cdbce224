"""Golden tests for the core spectral ops: the truncated-DFT matmul path
must match an explicit FFT computation (which itself mirrors the reference
torch code, reference grid_2d.py:51-99)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft

from fourierflow_tpu.ops import (
    dct2_basis,
    dct_mix_axis,
    idct2_basis,
    spectral_conv_2d_full,
    spectral_lowpass_axis,
    spectral_mix_axis,
)


def _ref_mix_axis_numpy(x, w, axis):
    """Reference computation in numpy, mirroring torch:
    rfft(ortho) -> truncate -> complex einsum -> zero-pad -> irfft(ortho)."""
    n = x.shape[axis]
    modes = w.shape[2]
    wc = w[..., 0] + 1j * w[..., 1]
    xf = np.fft.rfft(x, axis=axis, norm="ortho")
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, modes)
    xm = xf[tuple(sl)]
    # channels last; contract in -> out per mode along `axis`
    xm = np.moveaxis(xm, axis, -2)  # [..., m, i]
    ym = np.einsum("...mi,iom->...mo", xm, wc)
    ym = np.moveaxis(ym, -2, axis)
    out_shape = list(ym.shape)
    out_shape[axis] = n // 2 + 1
    out = np.zeros(out_shape, dtype=complex)
    out[tuple(sl)] = ym
    return np.fft.irfft(out, n=n, axis=axis, norm="ortho")


@pytest.mark.parametrize("axis", [1, 2])
@pytest.mark.parametrize("impl", ["dft", "fft"])
def test_spectral_mix_axis_matches_reference(axis, impl):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 12, 5).astype(np.float32)
    w = (0.2 * rng.randn(5, 7, 6, 2)).astype(np.float32)
    got = spectral_mix_axis(jnp.asarray(x), jnp.asarray(w), axis=axis, impl=impl)
    want = _ref_mix_axis_numpy(x, w, axis)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_spectral_mix_axis_dft_equals_fft():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 32, 32, 8).astype(np.float32))
    w = jnp.asarray((0.1 * rng.randn(8, 8, 10, 2)).astype(np.float32))
    a = spectral_mix_axis(x, w, axis=2, impl="dft")
    b = spectral_mix_axis(x, w, axis=2, impl="fft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_spectral_mix_dual_equals_branch_composition():
    """The stacked dual-branch fast path (square grids) must match the
    two-call composition; non-square inputs take the fallback."""
    from fourierflow_tpu.ops.spectral import spectral_mix_dual

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 16, 16, 6).astype(np.float32))
    wy = jnp.asarray((0.1 * rng.randn(6, 6, 5, 2)).astype(np.float32))
    wx = jnp.asarray((0.1 * rng.randn(6, 6, 5, 2)).astype(np.float32))
    want = spectral_mix_axis(x, wy, axis=2, impl="dft") + spectral_mix_axis(
        x, wx, axis=1, impl="dft"
    )
    got = spectral_mix_dual(x, wy, wx, impl="dft")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    # gradients flow identically (training uses both fwd+bwd)
    f_ref = lambda x, wy, wx: jnp.sum(
        (spectral_mix_axis(x, wy, axis=2) + spectral_mix_axis(x, wx, axis=1)) ** 2
    )
    f_dual = lambda x, wy, wx: jnp.sum(spectral_mix_dual(x, wy, wx) ** 2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, wy, wx)
    g_dual = jax.grad(f_dual, argnums=(0, 1, 2))(x, wy, wx)
    for a, b in zip(g_ref, g_dual):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    # non-square fallback
    xr = jnp.asarray(rng.randn(2, 12, 16, 6).astype(np.float32))
    want = spectral_mix_axis(xr, wy, axis=2) + spectral_mix_axis(xr, wx, axis=1)
    got = spectral_mix_dual(xr, wy, wx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_spectral_mix_full_modes_roundtrip():
    """With modes == n//2+1 and identity per-mode weights, the op is the
    identity map."""
    rng = np.random.RandomState(2)
    n = 16
    c = 4
    x = jnp.asarray(rng.randn(2, 8, n, c).astype(np.float32))
    modes = n // 2 + 1
    eye = np.zeros((c, c, modes, 2), dtype=np.float32)
    for m in range(modes):
        eye[..., m, 0] = np.eye(c)
    out = spectral_mix_axis(x, jnp.asarray(eye), axis=2, impl="dft")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["dft", "fft"])
def test_spectral_lowpass(impl):
    rng = np.random.RandomState(3)
    x = np.asarray(rng.randn(2, 10, 16, 3).astype(np.float32))
    modes = 5
    got = spectral_lowpass_axis(jnp.asarray(x), modes, axis=2, impl=impl)
    xf = np.fft.rfft(x, axis=2, norm="ortho")
    xf[:, :, modes:, :] = 0
    want = np.fft.irfft(xf, n=16, axis=2, norm="ortho")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_spectral_conv_2d_full_matches_reference():
    """Mirrors reference zongyi_fno/grid_2d.py:49-77 numerically."""
    rng = np.random.RandomState(4)
    b, sx, sy, ci, co, m1, m2 = 2, 16, 16, 3, 5, 4, 4
    x = rng.randn(b, sx, sy, ci).astype(np.float32)
    w1 = (0.1 * rng.randn(ci, co, m1, m2, 2)).astype(np.float32)
    w2 = (0.1 * rng.randn(ci, co, m1, m2, 2)).astype(np.float32)
    got = spectral_conv_2d_full(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))

    xf = np.fft.rfft2(x, axes=(1, 2))
    w1c = w1[..., 0] + 1j * w1[..., 1]
    w2c = w2[..., 0] + 1j * w2[..., 1]
    out_f = np.zeros((b, sx, sy // 2 + 1, co), dtype=complex)
    out_f[:, :m1, :m2] = np.einsum("bxyi,ioxy->bxyo", xf[:, :m1, :m2], w1c)
    out_f[:, -m1:, :m2] = np.einsum("bxyi,ioxy->bxyo", xf[:, -m1:, :m2], w2c)
    want = np.fft.irfft2(out_f, s=(sx, sy), axes=(1, 2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_dct_basis_matches_scipy():
    n, modes = 16, 16
    d = dct2_basis(n, modes)
    x = np.random.RandomState(5).randn(4, n).astype(np.float32)
    got = x @ d
    want = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # inverse roundtrip at full modes
    di = idct2_basis(n, modes)
    np.testing.assert_allclose(got @ di, x, rtol=1e-4, atol=1e-5)


def test_dct_mix_axis():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 8, 16, 3).astype(np.float32)
    w = (0.2 * rng.randn(3, 5, 6)).astype(np.float32)
    got = dct_mix_axis(jnp.asarray(x), jnp.asarray(w), axis=2)
    xs = scipy.fft.dct(x, type=2, norm="ortho", axis=2)[:, :, :6, :]
    ys = np.einsum("bxmi,iom->bxmo", xs, w)
    full = np.zeros((2, 8, 16, 5), dtype=np.float32)
    full[:, :, :6, :] = ys
    want = scipy.fft.idct(full, type=2, norm="ortho", axis=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_jit_and_grad():
    """The op must be jittable and differentiable."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray((0.1 * rng.randn(4, 4, 3, 2)).astype(np.float32))

    @jax.jit
    def loss(w):
        return jnp.sum(spectral_mix_axis(x, w, axis=2, impl="dft") ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_dct_idct_user_api_roundtrip_and_scipy():
    """User-facing dct/idct wrappers (reference modules/dct.py API):
    orthonormal roundtrip and scipy agreement."""
    import scipy.fft

    from fourierflow_tpu.ops.dft import dct, dct_2d, dct_3d, idct, idct_2d, idct_3d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 8, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(idct_2d(dct_2d(x))), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dct(x)), scipy.fft.dct(np.asarray(x), axis=-1, norm="ortho"),
        atol=1e-5,
    )
    x3 = jnp.asarray(rng.randn(2, 4, 6, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(idct_3d(dct_3d(x3))), np.asarray(x3), atol=1e-5)


def test_lp_loss_class_api():
    from fourierflow_tpu.layers import LpLoss, lp_loss_rel

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    loss = LpLoss()
    np.testing.assert_allclose(float(loss(x, y)), float(lp_loss_rel(x, y)), rtol=1e-6)
    assert np.isfinite(float(loss.abs(x, y)))
