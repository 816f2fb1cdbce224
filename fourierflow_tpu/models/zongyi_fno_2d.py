"""Original FNO (Li et al. 2021) reproduction — the torus_li/zongyi
baseline family (TPU-native equivalent of
reference:fourierflow/modules/zongyi_fno/grid_2d.py).

Full (non-factorized) 2D spectral weights on two mode corner blocks, a
linear residual branch inside each layer, ReLU activations, and a 10-step
input window (input_dim=12 with the two position channels).
"""

import math

import flax.linen as nn
import jax

from ..layers import WNLinear
from ..ops.spectral import spectral_conv_2d_full

__all__ = ["ZongyiSpectralConv2d", "FNOZongyi2DBlock"]


def _zongyi_weight_init(in_dim: int, out_dim: int):
    """xavier_normal_ with gain 1/(in*out) over [in, out, m, m, 2]
    (zongyi grid_2d.py:26-30)."""
    gain = 1.0 / (in_dim * out_dim)

    def init(key, shape, dtype=jax.numpy.float32):
        fan_in, fan_out = shape[0], shape[1]
        receptive = 1
        for s in shape[2:]:
            receptive *= s
        std = gain * math.sqrt(2.0 / ((fan_in + fan_out) * receptive))
        return std * jax.random.normal(key, shape, dtype)

    return init


class ZongyiSpectralConv2d(nn.Module):
    """One original-FNO layer (zongyi grid_2d.py:16-77): rfft2(ortho),
    complex mixing on the (+,+) and (-,+) mode corners, irfft2, plus a
    linear residual and ReLU."""

    in_dim: int
    out_dim: int
    n_modes: int
    residual: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [b, sx, sy, in_dim]
        shape = (self.in_dim, self.out_dim, self.n_modes, self.n_modes, 2)
        init = _zongyi_weight_init(self.in_dim, self.out_dim)
        w1 = self.param("fourier_weight_1", init, shape)
        w2 = self.param("fourier_weight_2", init, shape)
        linear = WNLinear(self.out_dim, name="linear")

        h = spectral_conv_2d_full(x, w1, w2, norm="ortho")
        if self.residual:
            return nn.relu(h + linear(x))
        return nn.relu(linear(h))


class FNOZongyi2DBlock(nn.Module):
    """Stack of original-FNO layers (zongyi grid_2d.py:80-129).

    Note: the reference passes only ``modes1`` to its layers, so ``modes2``
    is accepted for config parity but unused — we reproduce that behavior.
    """

    modes1: int
    modes2: int
    width: int
    input_dim: int = 12
    dropout: float = 0.1
    n_layers: int = 4
    residual: bool = False
    conv_residual: bool = True
    # Rematerialize each layer in the backward pass (jax.checkpoint);
    # same parameter tree either way. The deep f32 configs (24-layer
    # ablation) are the memory-hungry ones here.
    remat: bool = False

    @nn.compact
    def __call__(self, x, **kwargs):
        x = WNLinear(self.width, name="in_proj")(x)
        layer_fn = nn.remat(lambda mdl, h: mdl(h)) if self.remat else (
            lambda mdl, h: mdl(h)
        )
        for i in range(self.n_layers):
            layer = ZongyiSpectralConv2d(
                in_dim=self.width,
                out_dim=self.width,
                n_modes=self.modes1,
                residual=self.conv_residual,
                name=f"layers_{i}",
            )
            x = layer_fn(layer, x) + x if self.residual else layer_fn(layer, x)
        x = WNLinear(128)(x)
        x = nn.relu(x)
        x = WNLinear(1)(x)
        return {"forecast": x}
