"""FNO++ — the non-factorized ablation with the F-FNO block structure
(TPU-native equivalent of
reference:fourierflow/modules/zongyi_fno/grid_plus_2d.py).

Each layer applies the original FNO's *full* 2D spectral weights
(``[in, out, m, m, 2]`` on two mode corner blocks, ortho-normalized FFT)
but keeps the F-FNO improvements: feed-forward backcast, input-to-layer
residuals, optional weight/FF sharing, weight-norm, and the forecast fork.
"""

import flax.linen as nn

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.spectral import spectral_conv_2d_full

__all__ = ["FNOPlus2DBlock"]


class FNOPlus2DBlock(nn.Module):
    """Stack of full-spectral-weight layers with the factorized block
    structure (grid_plus_2d.py:86-161). Returns ``{'forecast',
    'forecast_list'}``."""

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

        wshape = (self.width, self.width, self.modes, self.modes, 2)
        shared_w = None
        if self.share_weight:
            shared_w = (
                self.param("fourier_weight_1", xavier_normal_init(self.gain), wshape),
                self.param("fourier_weight_2", xavier_normal_init(self.gain), wshape),
            )

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
            if self.mode == "no-fourier":
                h = x
            else:
                if shared_w is not None:
                    w1, w2 = shared_w
                else:
                    w1 = self.param(
                        f"layers_{i}_fourier_weight_1", xavier_normal_init(1.0), wshape
                    )
                    w2 = self.param(
                        f"layers_{i}_fourier_weight_2", xavier_normal_init(1.0), wshape
                    )
                # grid_plus_2d.py:58 uses ortho-normalized FFTs.
                h = spectral_conv_2d_full(x, w1, w2, norm="ortho")

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
