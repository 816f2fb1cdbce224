"""Factorized Fourier Neural Operator on a regular 2D grid — the flagship
model (TPU-native equivalent of
reference:fourierflow/modules/factorized_fno/grid_2d.py:102-177).

Structure per layer: separable spectral mixing along each grid axis
(sum of the two branches), a feed-forward "backcast" applied to the mixed
features, and an input-to-layer residual ``x = x + backcast``. Optionally a
"forecast" fork accumulates per-layer output-head contributions.

Weight/FF sharing across layers (``share_weight``/``share_fork``,
grid_2d.py:117-132) is expressed by creating the shared params/modules once
in the block scope.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.spectral import spectral_lowpass_axis, spectral_mix_axis

__all__ = ["SpectralConv2d", "FNOFactorized2DBlock"]


def fourier_mix_2d(x, wy, wx, mode="full", n_modes=None, impl="auto"):
    """The separable spectral mixing: y-axis branch + x-axis branch
    (grid_2d.py:51-99). x: [batch, sx, sy, channels]."""
    if mode == "low-pass":
        return spectral_lowpass_axis(x, n_modes, axis=2, impl=impl) + spectral_lowpass_axis(
            x, n_modes, axis=1, impl=impl
        )
    # Two independent branch dispatches, NOT the stacked single-chain
    # variant (ops.spectral.spectral_mix_dual): stacking [x, x^T] measured
    # within noise on one chip (XLA already overlaps the branches) and its
    # concat forces an involuntary resharding under a spatial-sharded mesh.
    xy = spectral_mix_axis(x, wy, axis=2, impl=impl)
    xx = spectral_mix_axis(x, wx, axis=1, impl=impl)
    return xx + xy


class SpectralConv2d(nn.Module):
    """Standalone factorized spectral layer (grid_2d.py:10-99) — used
    directly in tests and by the mesh models; the block below inlines the
    same logic to support cross-layer sharing."""

    in_dim: int
    out_dim: int
    n_modes: int
    factor: int = 2
    ff_weight_norm: bool = False
    n_ff_layers: int = 2
    layer_norm: bool = False
    use_fork: bool = False
    dropout: float = 0.0
    mode: str = "full"
    spectral_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.mode != "no-fourier":
            wy = wx = None
            if self.mode == "full":
                shape = (self.in_dim, self.out_dim, self.n_modes, 2)
                wy = self.param("fourier_weight_y", xavier_normal_init(1.0), shape)
                wx = self.param("fourier_weight_x", xavier_normal_init(1.0), shape)
            x = fourier_mix_2d(x, wy, wx, self.mode, self.n_modes, self.spectral_impl)

        b = FeedForward(
            self.out_dim,
            self.factor,
            self.ff_weight_norm,
            self.n_ff_layers,
            self.layer_norm,
            self.dropout,
            name="backcast_ff",
        )(x, deterministic=deterministic)
        f = None
        if self.use_fork:
            f = FeedForward(
                self.out_dim,
                self.factor,
                self.ff_weight_norm,
                self.n_ff_layers,
                self.layer_norm,
                self.dropout,
                name="forecast_ff",
            )(x, deterministic=deterministic)
        return b, f


class FNOFactorized2DBlock(nn.Module):
    """Stack of factorized spectral layers with input-to-layer residuals
    (grid_2d.py:102-177). Returns ``{'forecast', 'forecast_list'}``."""

    modes: int
    width: int
    input_dim: int = 12
    dropout: float = 0.0
    in_dropout: float = 0.0
    n_layers: int = 4
    share_weight: bool = False
    share_fork: bool = False
    factor: int = 2
    ff_weight_norm: bool = False
    n_ff_layers: int = 2
    gain: float = 1.0
    layer_norm: bool = False
    use_fork: bool = False
    mode: str = "full"
    spectral_impl: str = "auto"
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. bf16); params f32
    # Rematerialize each layer in the backward pass (jax.checkpoint): only
    # layer inputs are saved; the spectral-mix intermediates (truncated-DFT
    # coefficients, both branches) are recomputed. Trades ~1/3 extra FLOPs
    # for O(n_layers) less activation memory — enables larger grids/batches
    # (e.g. 256^2 training) on one chip. Parameter tree is unchanged, so
    # checkpoints and reference-weight imports work in either mode.
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, **kwargs):
        # x: [batch, sx, sy, input_dim]
        x = WNLinear(
            self.width, wnorm=self.ff_weight_norm, dtype=self.dtype, name="in_proj"
        )(x)
        if self.in_dropout > 0.0:
            x = nn.Dropout(self.in_dropout, deterministic=deterministic)(x)

        wshape = (self.width, self.width, self.modes, 2)
        shared_wy = shared_wx = None
        if self.share_weight and self.mode == "full":
            # Shared across layers, init gain from config (grid_2d.py:126-132).
            shared_wy = self.param("fourier_weight_y", xavier_normal_init(self.gain), wshape)
            shared_wx = self.param("fourier_weight_x", xavier_normal_init(self.gain), wshape)

        def make_ff(name):
            return FeedForward(
                self.width,
                self.factor,
                self.ff_weight_norm,
                self.n_ff_layers,
                self.layer_norm,
                self.dropout,
                dtype=self.dtype,
                name=name,
            )

        shared_backcast = make_ff("backcast_ff") if self.share_fork else None
        shared_forecast = (
            make_ff("forecast_ff") if (self.share_fork and self.use_fork) else None
        )

        out_head = nn.Sequential(
            [
                WNLinear(128, wnorm=self.ff_weight_norm, dtype=self.dtype),
                WNLinear(1, wnorm=self.ff_weight_norm, dtype=self.dtype),
            ],
            name="out",
        )

        if self.remat:
            # Params stay in block scope (created below, passed as arrays)
            # and the FF is handed in as the module argument, so remat
            # changes only what the backward pass saves — not the tree.
            def _layer(ff, x_in, wy, wx, det):
                if self.mode == "no-fourier":
                    h = x_in
                else:
                    h = fourier_mix_2d(
                        x_in, wy, wx, self.mode, self.modes, self.spectral_impl
                    )
                return h, ff(h, deterministic=det)

            layer_fn = nn.remat(_layer, static_argnums=(4,))

        forecast = 0.0
        forecast_list = []
        b = x
        for i in range(self.n_layers):
            if self.mode == "full" and not self.share_weight:
                wy = self.param(
                    f"layers_{i}_fourier_weight_y", xavier_normal_init(1.0), wshape
                )
                wx = self.param(
                    f"layers_{i}_fourier_weight_x", xavier_normal_init(1.0), wshape
                )
            else:
                wy, wx = shared_wy, shared_wx

            backcast_ff = shared_backcast or make_ff(f"layers_{i}_backcast_ff")
            if self.remat:
                h, b = layer_fn(backcast_ff, x, wy, wx, deterministic)
            else:
                if self.mode == "no-fourier":
                    h = x
                else:
                    h = fourier_mix_2d(x, wy, wx, self.mode, self.modes, self.spectral_impl)
                b = backcast_ff(h, deterministic=deterministic)
            if self.use_fork:
                forecast_ff = shared_forecast or make_ff(f"layers_{i}_forecast_ff")
                f = forecast_ff(h, deterministic=deterministic)
                f_out = out_head(f)
                forecast = forecast + f_out
                forecast_list.append(f_out)
            x = x + b

        if not self.use_fork:
            forecast = out_head(b)

        if self.dtype is not None:
            # Mixed precision: hand a f32 forecast back to the loss/rollout.
            forecast = jnp.asarray(forecast, jnp.float32)
            forecast_list = [jnp.asarray(f, jnp.float32) for f in forecast_list]
        return {"forecast": forecast, "forecast_list": forecast_list}
