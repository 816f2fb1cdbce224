"""Tests for shared layers: weight-norm linear, feedforward, positional
encodings, losses, normalizer."""

import jax
import jax.numpy as jnp
import numpy as np

from fourierflow_tpu.layers import (
    FeedForward,
    WNLinear,
    encode_positions,
    fourier_encode,
    lp_loss_rel,
    normalizer_accumulate,
    normalizer_apply,
    normalizer_init,
    normalizer_inverse,
)


def test_wnlinear_reparam():
    key = jax.random.PRNGKey(0)
    m = WNLinear(6, wnorm=True)
    x = jnp.ones((3, 4))
    params = m.init(key, x)["params"]
    # At init g == ||v|| so the effective weight equals v.
    v = params["kernel"]
    g = params["g"]
    np.testing.assert_allclose(
        np.asarray(g), np.linalg.norm(np.asarray(v), axis=0, keepdims=True), rtol=1e-6
    )
    y = m.apply({"params": params}, x)
    want = x @ v + params["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-6)

    # After scaling g, output scales correspondingly (direction fixed).
    params2 = dict(params)
    params2["g"] = g * 2.0
    y2 = m.apply({"params": params2}, x)
    np.testing.assert_allclose(
        np.asarray(y2 - params["bias"]), np.asarray(2 * (y - params["bias"])), rtol=1e-5, atol=1e-6
    )


def test_feedforward_shapes():
    key = jax.random.PRNGKey(1)
    m = FeedForward(dim=8, factor=4, ff_weight_norm=True, n_layers=2, layer_norm=False)
    x = jnp.ones((2, 5, 8))
    params = m.init(key, x)
    y = m.apply(params, x)
    assert y.shape == (2, 5, 8)
    # hidden layer is dim*factor
    assert params["params"]["WNLinear_0"]["kernel"].shape == (8, 32)
    assert params["params"]["WNLinear_1"]["kernel"].shape == (32, 8)


def test_fourier_encode_matches_reference_formula():
    """Mirror reference:fourierflow/modules/position.py:7-31 in numpy."""
    x = np.linspace(-1, 1, 7).astype(np.float32)
    max_freq, num_bands, base = 10.0, 4, 2.0
    got = fourier_encode(jnp.asarray(x), max_freq, num_bands, base)
    scales = np.logspace(0.0, np.log(max_freq / 2) / np.log(base), num=num_bands, base=base)
    xs = x[:, None] * scales[None, :] * np.pi
    want = np.concatenate([np.sin(xs), np.cos(xs), x[:, None]], axis=-1)
    np.testing.assert_allclose(np.asarray(got), want.astype(np.float32), rtol=1e-5, atol=5e-6)
    assert got.shape == (7, 2 * num_bands + 1)


def test_encode_positions_linear():
    pos = encode_positions([4, 6], low=0.0, high=1.0, fourier=False)
    assert pos.shape == (4, 6, 2)
    np.testing.assert_allclose(np.asarray(pos[:, 0, 0]), np.linspace(0, 1, 4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pos[0, :, 1]), np.linspace(0, 1, 6), rtol=1e-6)


def test_lp_loss_rel():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 10).astype(np.float32)
    y = rng.randn(4, 10).astype(np.float32)
    got = lp_loss_rel(jnp.asarray(x), jnp.asarray(y))
    want = np.mean(
        np.linalg.norm(x - y, axis=1) / np.linalg.norm(y, axis=1)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_normalizer_stats_and_roundtrip():
    rng = np.random.RandomState(1)
    state = normalizer_init(3, max_accumulations=100)
    xs = rng.randn(5, 7, 3).astype(np.float32) * 2.0 + 1.0
    for i in range(5):
        state = normalizer_accumulate(state, jnp.asarray(xs[i]))
    flat = xs.reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(state.mean), flat.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state.std), flat.std(0), rtol=1e-3)

    x = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    z = normalizer_apply(state, x)
    back = normalizer_inverse(state, z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-5)
    # channel-specific inverse used for forecasts (normalizer.py:56-66)
    z0 = normalizer_inverse(state, z[..., :1], channel=0)
    np.testing.assert_allclose(np.asarray(z0[..., 0]), np.asarray(x[..., 0]), rtol=1e-4, atol=1e-5)


def test_normalizer_max_accumulations():
    state = normalizer_init(2, max_accumulations=2)
    x = jnp.ones((3, 2))
    for _ in range(5):
        state = normalizer_accumulate(state, x)
    assert float(state.n_accumulations) == 2.0
    assert float(state.count) == 6.0
