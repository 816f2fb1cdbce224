"""Fused feed-forward Pallas kernel: correctness vs the XLA composition
(interpret mode on CPU; compiles natively on TPU, where the fused
forward+backward is default-on — layers.py fuse='auto' — because the
fused backward keeps the dominant HBM traffic on-chip; see
ops/pallas_ff.py and RESULTS.md for the measured step win)."""

import jax
import jax.numpy as jnp
import numpy as np

from fourierflow_tpu.ops.pallas_ff import fused_ff


def _inputs(rows=300, cin=8, hidden=32, cout=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(rows, cin).astype(np.float32))
    w1 = jnp.asarray(rng.randn(cin, hidden).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(hidden).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(hidden, cout).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2


def _xla(x, w1, b1, w2, b2):
    return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2


def test_fused_ff_matches_xla():
    args = _inputs()
    got = fused_ff(*args, True)
    want = _xla(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_ff_ragged_rows_padding():
    # rows=300 not divisible by the block: exercises the pad/slice path.
    args = _inputs(rows=37)
    np.testing.assert_allclose(
        np.asarray(fused_ff(*args, True)), np.asarray(_xla(*args)),
        rtol=1e-5, atol=1e-5,
    )


def test_fused_ff_vjp_matches_autodiff():
    x, w1, b1, w2, b2 = _inputs(seed=1)

    def loss_k(x, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(fused_ff(x, w1, b1, w2, b2, True)))

    def loss_x(x, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(_xla(x, w1, b1, w2, b2)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_ff_vjp_unfused_bwd_matches():
    """fuse_bwd=False falls back to the XLA-dots backward."""
    x, w1, b1, w2, b2 = _inputs(seed=4)

    def loss_k(x, w1, b1, w2, b2):
        return jnp.sum(fused_ff(x, w1, b1, w2, b2, True, False) ** 2)

    def loss_x(x, w1, b1, w2, b2):
        return jnp.sum(_xla(x, w1, b1, w2, b2) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_ff_bwd_multiblock_accumulation():
    """Weight grads accumulate across row blocks (rows > bwd block size),
    including the zero-padded remainder block."""
    x, w1, b1, w2, b2 = _inputs(rows=5000, seed=2)

    def loss_k(x, w1, b1, w2, b2):
        return jnp.sum(jnp.cos(fused_ff(x, w1, b1, w2, b2, True)))

    def loss_x(x, w1, b1, w2, b2):
        return jnp.sum(jnp.cos(_xla(x, w1, b1, w2, b2)))

    gk = jax.grad(loss_k, argnums=(1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_x, argnums=(1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_feedforward_fused_path_matches_plain():
    """FeedForward(fuse='always') (interpreted off-TPU) matches the plain
    WNLinear composition for values and grads, on the SAME param tree."""
    from fourierflow_tpu.layers import FeedForward

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 9, 16).astype(np.float32))
    plain = FeedForward(16, 4, ff_weight_norm=True, fuse="never")
    fused = FeedForward(16, 4, ff_weight_norm=True, fuse="always")
    params = plain.init(jax.random.PRNGKey(0), x)
    jax.tree.map(  # identical param trees: fused declares the same leaves
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, fused.init(jax.random.PRNGKey(0), x),
    )
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(plain.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
    gp = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        gp, gf,
    )


def test_feedforward_fwd_only_fusion_matches():
    """fuse='fwd' (fused forward, XLA-dots backward) matches plain."""
    from fourierflow_tpu.layers import FeedForward

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(3, 7, 12).astype(np.float32))
    plain = FeedForward(12, 2, ff_weight_norm=True, fuse="never")
    params = plain.init(jax.random.PRNGKey(0), x)
    # 'fwd' mode == fused_ff with fuse_bwd=False on the effective weights
    from fourierflow_tpu.ops.pallas_ff import fused_ff

    k1 = params["params"]["WNLinear_0"]["kernel"]
    g1 = params["params"]["WNLinear_0"]["g"]
    b1 = params["params"]["WNLinear_0"]["bias"]
    k2 = params["params"]["WNLinear_1"]["kernel"]
    g2 = params["params"]["WNLinear_1"]["g"]
    b2 = params["params"]["WNLinear_1"]["bias"]

    def eff(k, g):
        n = jnp.linalg.norm(k, axis=0, keepdims=True)
        return g * k / jnp.maximum(n, 1e-12)

    def loss_fwdonly(x):
        return jnp.sum(fused_ff(x, eff(k1, g1), b1, eff(k2, g2), b2,
                                True, False) ** 2)

    def loss_plain_x(x):
        return jnp.sum(plain.apply(params, x) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fwdonly)(x)),
        np.asarray(jax.grad(loss_plain_x)(x)), rtol=1e-4, atol=1e-5)
