"""The matmul Fourier transforms must match numpy's FFTs exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from fourierflow_tpu.ops.fourier import fftn, ifftn, irfft2, rfft2


@pytest.mark.parametrize("shape,axes", [((3, 16, 12), (1, 2)), ((2, 8, 16), (-2, -1))])
def test_rfft2_matmul_matches_numpy(shape, axes):
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    got = rfft2(jnp.asarray(x), axes=axes, impl="matmul")
    want = np.fft.rfftn(x, axes=axes)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_irfft2_matmul_roundtrip():
    x = np.random.RandomState(1).randn(4, 16, 16).astype(np.float32)
    z = rfft2(jnp.asarray(x), axes=(1, 2), impl="matmul")
    back = irfft2(z, s=(16, 16), axes=(1, 2), impl="matmul")
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-5)


def test_irfft2_matmul_matches_numpy_on_modified_spectrum():
    """Apply a spectral operation (derivative) then invert — the physics
    pattern used by the solver."""
    x = np.random.RandomState(2).randn(2, 16, 16).astype(np.float32)
    kx = np.fft.fftfreq(16, d=1.0 / 16)[:, None]
    z = np.fft.rfftn(x, axes=(1, 2)) * (2j * np.pi * kx)
    got = irfft2(jnp.asarray(z.astype(np.complex64)), s=(16, 16), axes=(1, 2), impl="matmul")
    want = np.fft.irfftn(z, s=(16, 16), axes=(1, 2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_fftn_ifftn_matmul_complex():
    rng = np.random.RandomState(3)
    z = (rng.randn(2, 8, 8) + 1j * rng.randn(2, 8, 8)).astype(np.complex64)
    got = fftn(jnp.asarray(z), axes=(1, 2), impl="matmul")
    want = np.fft.fftn(z, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    back = ifftn(jnp.asarray(want.astype(np.complex64)), axes=(1, 2), impl="matmul")
    np.testing.assert_allclose(np.asarray(back), z, rtol=1e-3, atol=1e-4)


def test_solver_identical_between_impls():
    """The solver must produce the same trajectories with matmul and XLA
    transforms."""
    from fourierflow_tpu.builders.synthetic import solve_navier_stokes_2d

    w0 = np.random.RandomState(4).randn(2, 16, 16).astype(np.float32)
    a, _ = solve_navier_stokes_2d(w0, 1e-2, 0.2, 1e-2, 2, force="li", fourier_impl="matmul")
    b, _ = solve_navier_stokes_2d(w0, 1e-2, 0.2, 1e-2, 2, force="li", fourier_impl="xla")
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_four_step_large_axis_matches_numpy():
    """Large axes use the four-step Cooley-Tukey matmul factorization
    (keeps compile payloads small and FLOPs at O(n^2 sqrt n)); exact vs
    numpy at 512/768/1024."""
    from fourierflow_tpu.ops import fourier as F

    rng = np.random.RandomState(0)
    for n in (512, 768, 1024):
        x = jnp.asarray(rng.randn(1, n, n).astype(np.float32))
        zr, zi = F.rfftn_pair(x, axes=(1, 2), impl="matmul")
        want = np.fft.rfftn(np.asarray(x), axes=(1, 2))
        scale = np.abs(want).max()
        np.testing.assert_allclose(np.asarray(zr) / scale, want.real / scale, atol=5e-4)
        np.testing.assert_allclose(np.asarray(zi) / scale, want.imag / scale, atol=5e-4)
        back = F.irfftn_pair(zr, zi, s=(n, n), axes=(1, 2), impl="matmul")
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=5e-3)
