"""Factorized *Cosine* Neural Operator on a regular 2D grid — the "FCNO"
ablation family (TPU-native equivalent of
reference:fourierflow/modules/factorized_cno/grid_2d.py).

Identical block structure to :class:`FNOFactorized2DBlock` but the
separable spectral mixing uses the DCT-II instead of the real FFT, so the
per-mode weights are real ``[in, out, modes]`` tensors and no complex
arithmetic is needed at all — a single matmul chain per axis, all on the
MXU (see ops/spectral.py:dct_mix_axis).
"""

import flax.linen as nn

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.spectral import dct_mix_axis

__all__ = ["CNOFactorized2DBlock"]


def cosine_mix_2d(x, wy, wx):
    """Separable DCT mixing: y-axis branch + x-axis branch
    (factorized_cno/grid_2d.py:51-95). x: [batch, sx, sy, channels]."""
    return dct_mix_axis(x, wy, axis=2) + dct_mix_axis(x, wx, axis=1)


class CNOFactorized2DBlock(nn.Module):
    """Stack of factorized DCT layers with input-to-layer residuals
    (factorized_cno/grid_2d.py:98-172). Returns ``{'forecast',
    'forecast_list'}`` like the FNO block."""

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

    @nn.compact
    def __call__(self, x, deterministic: bool = True, **kwargs):
        # x: [batch, sx, sy, input_dim]
        x = WNLinear(self.width, wnorm=self.ff_weight_norm, name="in_proj")(x)
        if self.in_dropout > 0.0:
            x = nn.Dropout(self.in_dropout, deterministic=deterministic)(x)

        wshape = (self.width, self.width, self.modes)
        shared_wy = shared_wx = None
        if self.share_weight:
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
                name=name,
            )

        shared_backcast = make_ff("backcast_ff") if self.share_fork else None
        shared_forecast = (
            make_ff("forecast_ff") if (self.share_fork and self.use_fork) else None
        )

        out_head = nn.Sequential(
            [
                WNLinear(128, wnorm=self.ff_weight_norm),
                WNLinear(1, wnorm=self.ff_weight_norm),
            ],
            name="out",
        )

        forecast = 0.0
        forecast_list = []
        b = x
        for i in range(self.n_layers):
            if self.share_weight:
                wy, wx = shared_wy, shared_wx
            else:
                wy = self.param(
                    f"layers_{i}_fourier_weight_y", xavier_normal_init(1.0), wshape
                )
                wx = self.param(
                    f"layers_{i}_fourier_weight_x", xavier_normal_init(1.0), wshape
                )
            h = cosine_mix_2d(x, wy, wx)

            backcast_ff = shared_backcast or make_ff(f"layers_{i}_backcast_ff")
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

        return {"forecast": forecast, "forecast_list": forecast_list}
