"""Golden-parity oracle: the repo's F-FNO forward vs an independent
straight-from-the-math implementation of the reference model.

The oracle below re-expresses reference
fourierflow/modules/factorized_fno/grid_2d.py:10-177 exactly as written
there (complex rfft/irfft with norm='ortho', per-mode complex einsums
'bixy,ioy->boxy' / 'bixy,iox->boxy', zero-padded spectra, backcast
feed-forward, input-to-layer residuals, output head on the LAST backcast
— note the reference's own JAX sketch in commands/infer.py:146-161
deviates from its torch model by applying the head to the residual
stream; the torch model is ground truth) — but with none of the repo's
TPU machinery: no truncated-DFT matmuls, no packed-complex mixing, no
interleaved bases, no Pallas. Agreement therefore checks the whole
TPU-native reformulation against the reference computation.

The repo model's flax params are folded into plain dense weights
(explicit weight-norm reparameterization g * v / ||v||) and fed to the
oracle; outputs must match numerically at 64^2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fourierflow_tpu.models import FNOFactorized2DBlock


def _eff(p):
    """Effective (kernel, bias) of a WNLinear param dict with weight norm
    folded in."""
    v = np.asarray(p["kernel"], np.float64)
    if "g" in p:
        g = np.asarray(p["g"], np.float64)
        v = g * v / np.maximum(np.linalg.norm(v, axis=0, keepdims=True), 1e-12)
    return jnp.asarray(v, jnp.float32), jnp.asarray(p["bias"], jnp.float32)


def _oracle_ff(lin0, lin1, x):
    x = x @ lin0[0] + lin0[1]
    x = jax.nn.relu(x)
    return x @ lin1[0] + lin1[1]


def _oracle_mix(x, wy, wx, modes):
    """Reference forward_fourier (grid_2d.py:51-99), channels-last."""
    b, sx, sy, c = x.shape
    wy_c = wy[..., 0] + 1j * wy[..., 1]  # [i, o, modes]
    wx_c = wx[..., 0] + 1j * wx[..., 1]

    xf = jnp.fft.rfft(x, axis=2, norm="ortho")[:, :, :modes, :]
    yf = jnp.einsum("bxyi,ioy->bxyo", xf, wy_c)
    out_y = jnp.zeros((b, sx, sy // 2 + 1, c), jnp.complex64)
    out_y = out_y.at[:, :, :modes, :].set(yf)
    br_y = jnp.fft.irfft(out_y, n=sy, axis=2, norm="ortho")

    xf = jnp.fft.rfft(x, axis=1, norm="ortho")[:, :modes, :, :]
    yf = jnp.einsum("bxyi,iox->bxyo", xf, wx_c)
    out_x = jnp.zeros((b, sx // 2 + 1, sy, c), jnp.complex64)
    out_x = out_x.at[:, :modes, :, :].set(yf)
    br_x = jnp.fft.irfft(out_x, n=sx, axis=1, norm="ortho")

    return br_x + br_y


def _oracle_out_head(p, h):
    # The output head's WNLinears are registered at block level
    # (flax Sequential over pre-built children does not add a scope).
    for k in ("WNLinear_0", "WNLinear_1"):
        kern, bias = _eff(p[k])
        h = h @ kern + bias
    return h


def _oracle_forward(params, x, n_layers, modes, share_weight, use_fork=False):
    """Reference FNOFactorized2DBlock.forward (grid_2d.py:154-177): with
    use_fork each layer's forecast branch goes through the shared output
    head and the per-layer outputs accumulate; without it the head applies
    to the LAST backcast only."""
    p = params["params"]
    x = x @ _eff(p["in_proj"])[0] + _eff(p["in_proj"])[1]
    b = x
    forecast = 0.0
    for i in range(n_layers):
        if share_weight:
            wy = np.asarray(p["fourier_weight_y"])
            wx = np.asarray(p["fourier_weight_x"])
        else:
            wy = np.asarray(p[f"layers_{i}_fourier_weight_y"])
            wx = np.asarray(p[f"layers_{i}_fourier_weight_x"])
        h = _oracle_mix(x, jnp.asarray(wy), jnp.asarray(wx), modes)
        ff = p[f"layers_{i}_backcast_ff"] if f"layers_{i}_backcast_ff" in p else p["backcast_ff"]
        b = _oracle_ff(_eff(ff["WNLinear_0"]), _eff(ff["WNLinear_1"]), h)
        if use_fork:
            fff = (
                p[f"layers_{i}_forecast_ff"]
                if f"layers_{i}_forecast_ff" in p
                else p["forecast_ff"]
            )
            f = _oracle_ff(_eff(fff["WNLinear_0"]), _eff(fff["WNLinear_1"]), h)
            forecast = forecast + _oracle_out_head(p, f)
        x = x + b
    if not use_fork:
        forecast = _oracle_out_head(p, b)
    return forecast


def _run_parity(share_weight, ff_weight_norm, n_layers=3, grid=64,
                use_fork=False, share_fork=False):
    model = FNOFactorized2DBlock(
        modes=8,
        width=16,
        input_dim=3,
        n_layers=n_layers,
        share_weight=share_weight,
        share_fork=share_fork,
        use_fork=use_fork,
        factor=2,
        ff_weight_norm=ff_weight_norm,
        gain=0.5,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, grid, grid, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    got = model.apply(params, x)["forecast"]
    want = _oracle_forward(params, x, n_layers, 8, share_weight, use_fork)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_golden_parity_flagship_config():
    """share_weight + weight-norm — the flagship 24-layer configuration's
    structure (at reduced depth/width for test time), 64^2 grid."""
    _run_parity(share_weight=True, ff_weight_norm=True)


def test_golden_parity_unshared_no_wnorm():
    _run_parity(share_weight=False, ff_weight_norm=False, grid=32)


def test_golden_parity_single_layer_values():
    """One layer at 64^2: tightest check of the spectral reformulation
    (truncated-DFT matmuls + packed mixing vs complex FFT einsums)."""
    _run_parity(share_weight=True, ff_weight_norm=True, n_layers=1)


def test_golden_parity_fork():
    """use_fork: per-layer forecast branches through the shared output
    head, accumulated (reference grid_2d.py:160-170)."""
    _run_parity(share_weight=False, ff_weight_norm=True, grid=32, use_fork=True)


def test_golden_parity_fork_shared():
    """share_fork + use_fork: ONE backcast/forecast FeedForward reused by
    every layer (reference grid_2d.py:118-124)."""
    _run_parity(
        share_weight=True, ff_weight_norm=False, grid=32,
        use_fork=True, share_fork=True,
    )
