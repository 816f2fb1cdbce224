"""Tests for the flagship F-FNO grid model."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from fourierflow_tpu.models import FNOFactorized2DBlock


def _count_params(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_forward_shapes_markov_config():
    """The torus_li markov 24-layer flagship config
    (reference experiments/torus_li/markov/24_layers/config.yaml) — scaled
    down for CPU test speed."""
    m = FNOFactorized2DBlock(
        modes=8,
        width=16,
        input_dim=3,
        n_layers=4,
        share_weight=True,
        factor=4,
        ff_weight_norm=True,
        gain=0.1,
    )
    x = jnp.ones((2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["forecast"].shape == (2, 32, 32, 1)
    assert out["forecast_list"] == []


def test_share_weight_param_count():
    kwargs = dict(modes=4, width=8, input_dim=3, n_layers=3, factor=2, ff_weight_norm=True)
    x = jnp.ones((1, 16, 16, 3))
    p_shared = FNOFactorized2DBlock(share_weight=True, **kwargs).init(jax.random.PRNGKey(0), x)
    p_sep = FNOFactorized2DBlock(share_weight=False, **kwargs).init(jax.random.PRNGKey(0), x)
    w_per_layer = 2 * 8 * 8 * 4 * 2  # two axes * in*out*modes*2
    assert _count_params(p_sep) - _count_params(p_shared) == 2 * w_per_layer


def test_share_fork_param_count():
    kwargs = dict(modes=4, width=8, input_dim=3, n_layers=3, factor=2, use_fork=True)
    x = jnp.ones((1, 16, 16, 3))
    p_shared = FNOFactorized2DBlock(share_fork=True, **kwargs).init(jax.random.PRNGKey(0), x)
    p_sep = FNOFactorized2DBlock(share_fork=False, **kwargs).init(jax.random.PRNGKey(0), x)
    assert _count_params(p_sep) > _count_params(p_shared)
    out = FNOFactorized2DBlock(share_fork=True, **kwargs).apply(p_shared, x)
    assert out["forecast"].shape == (1, 16, 16, 1)
    assert len(out["forecast_list"]) == 3


def test_resolution_invariance():
    """F-FNO trained at one resolution evaluates at another — the weights
    only see modes, never the grid size (the super-resolution property,
    reference routines/base.py:89-102)."""
    m = FNOFactorized2DBlock(modes=4, width=8, input_dim=3, n_layers=2)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 3)))
    out32 = m.apply(params, jnp.ones((1, 32, 32, 3)))
    assert out32["forecast"].shape == (1, 32, 32, 1)


def test_ablation_modes():
    x = jnp.ones((1, 16, 16, 3))
    for mode in ["full", "low-pass", "no-fourier"]:
        m = FNOFactorized2DBlock(modes=4, width=8, input_dim=3, n_layers=2, mode=mode)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out["forecast"].shape == (1, 16, 16, 1)


def test_jit_grad_through_model():
    m = FNOFactorized2DBlock(modes=4, width=8, input_dim=3, n_layers=2, ff_weight_norm=True)
    x = jnp.ones((2, 16, 16, 3))
    y = jnp.zeros((2, 16, 16, 1))
    params = m.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(params):
        out = m.apply(params, x)["forecast"]
        return jnp.mean((out - y) ** 2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)


def test_dft_vs_fft_impl_agree_in_model():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    kwargs = dict(modes=5, width=8, input_dim=3, n_layers=2)
    m1 = FNOFactorized2DBlock(spectral_impl="dft", **kwargs)
    m2 = FNOFactorized2DBlock(spectral_impl="fft", **kwargs)
    params = m1.init(jax.random.PRNGKey(0), x)
    o1 = m1.apply(params, x)["forecast"]
    o2 = m2.apply(params, x)["forecast"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("config", [
    dict(share_weight=True, ff_weight_norm=True),
    dict(share_weight=False),
    dict(use_fork=True, share_fork=True, ff_weight_norm=True),
    dict(mode="low-pass"),
])
def test_remat_matches_unremat(config):
    """remat=True must change only what the backward pass saves: identical
    param tree, identical forward, identical gradients."""
    kwargs = dict(modes=4, width=8, input_dim=3, n_layers=3, **config)
    m0 = FNOFactorized2DBlock(remat=False, **kwargs)
    m1 = FNOFactorized2DBlock(remat=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)

    def loss(m):
        def fn(p):
            return jnp.mean((m.apply(p, x)["forecast"] - y) ** 2)
        return fn

    o0 = m0.apply(p0, x)["forecast"]
    o1 = m1.apply(p0, x)["forecast"]
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=1e-6, atol=1e-7)

    g0 = jax.jit(jax.grad(loss(m0)))(p0)
    g1 = jax.jit(jax.grad(loss(m1)))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
