"""Correctness tests for the fused Pallas spectral-mix kernel (interpret
mode here; the same kernel compiles and matches on the real chip — kept
as a non-default path because Mosaic's layout rules cap it below the XLA
chain at flagship shapes; see the module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from fourierflow_tpu.ops.pallas_spectral import fused_mix_2d
from fourierflow_tpu.ops.spectral import spectral_mix_axis


def _ref(x, wy, wx):
    return spectral_mix_axis(x, wy, axis=2, impl="dft") + spectral_mix_axis(
        x, wx, axis=1, impl="dft"
    )


def _inputs(seed=0, b=2, n=16, c=8, m=4):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, n, c).astype(np.float32))
    wy = jnp.asarray(rng.randn(c, c, m, 2).astype(np.float32) * 0.1)
    wx = jnp.asarray(rng.randn(c, c, m, 2).astype(np.float32) * 0.1)
    return x, wy, wx


def test_fused_mix_matches_reference():
    x, wy, wx = _inputs()
    got = fused_mix_2d(x, wy, wx, True)
    want = _ref(x, wy, wx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_mix_custom_vjp_matches_autodiff():
    x, wy, wx = _inputs(1)

    def loss_ref(x, wy, wx):
        return jnp.sum(jnp.sin(_ref(x, wy, wx)))

    def loss_ker(x, wy, wx):
        return jnp.sum(jnp.sin(fused_mix_2d(x, wy, wx, True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wy, wx)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(x, wy, wx)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4)
