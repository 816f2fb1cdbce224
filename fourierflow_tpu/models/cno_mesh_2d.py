"""Factorized Cosine Neural Operator on structured 2D meshes (FCNO
ablation of the airfoil/pipe models) — TPU-native equivalent of
reference:fourierflow/modules/factorized_cno/mesh_2d.py.

Appends unit-square grid coordinates, pads the non-periodic domain by 8,
runs separable DCT-mixing layers (separate modes_x / modes_y, real
weights), unpads the last backcast, then the output head.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.spectral import dct_mix_axis
from .ffno_mesh_2d import get_grid_2d

__all__ = ["CNOFactorizedMesh2D"]


class CNOFactorizedMesh2D(nn.Module):
    modes_x: int
    modes_y: int
    width: int
    input_dim: int
    n_layers: int
    share_weight: bool = False
    factor: int = 4
    ff_weight_norm: bool = True
    n_ff_layers: int = 2
    layer_norm: bool = False
    padding: int = 8

    @nn.compact
    def __call__(self, x, **kwargs):
        # x: [batch, sx, sy, input_dim - 2]
        b = x.shape[0]
        grid = get_grid_2d(b, x.shape[1], x.shape[2], x.dtype)
        x = jnp.concatenate([x, grid], axis=-1)
        x = WNLinear(self.width, wnorm=self.ff_weight_norm, name="in_proj")(x)
        p = self.padding
        if p:
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)))

        def make_w(name, modes):
            return self.param(
                name, xavier_normal_init(1.0), (self.width, self.width, modes)
            )

        shared = None
        if self.share_weight:
            shared = (
                make_w("fourier_weight_x", self.modes_x),
                make_w("fourier_weight_y", self.modes_y),
            )

        h = x
        for i in range(self.n_layers):
            if shared is not None:
                wx, wy = shared
            else:
                wx = make_w(f"layers_{i}_fourier_weight_x", self.modes_x)
                wy = make_w(f"layers_{i}_fourier_weight_y", self.modes_y)
            mixed = dct_mix_axis(x, wy, axis=2) + dct_mix_axis(x, wx, axis=1)
            h = FeedForward(
                self.width,
                self.factor,
                self.ff_weight_norm,
                self.n_ff_layers,
                self.layer_norm,
                0.0,
                name=f"layers_{i}_backcast_ff",
            )(mixed)
            x = x + h

        if p:
            h = h[:, :-p, :-p, :]
        out = nn.Sequential(
            [
                WNLinear(128, wnorm=self.ff_weight_norm),
                WNLinear(1, wnorm=self.ff_weight_norm),
            ],
            name="out",
        )(h)
        return out
