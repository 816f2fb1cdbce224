"""Factorized Cosine Neural Operator on structured 3D meshes (FCNO
ablation of the plasticity model) — TPU-native equivalent of
reference:fourierflow/modules/factorized_cno/mesh_3d.py.

Three separable DCT-mixing branches (x, y, z) summed, padding 8 on all
spatial dims, grid channels appended, multi-channel output head.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.spectral import dct_mix_axis
from .ffno_mesh_3d import get_grid_3d

__all__ = ["CNOFactorizedMesh3D"]


class CNOFactorizedMesh3D(nn.Module):
    modes_x: int
    modes_y: int
    modes_z: int
    width: int
    input_dim: int
    output_dim: int
    n_layers: int
    share_weight: bool = False
    factor: int = 4
    ff_weight_norm: bool = True
    n_ff_layers: int = 2
    layer_norm: bool = False
    padding: int = 8

    @nn.compact
    def __call__(self, x, **kwargs):
        # x: [batch, sx, sy, sz, input_dim - 3]
        b = x.shape[0]
        grid = get_grid_3d(b, x.shape[1], x.shape[2], x.shape[3], x.dtype)
        x = jnp.concatenate([x, grid], axis=-1)
        x = WNLinear(self.width, wnorm=self.ff_weight_norm, name="in_proj")(x)
        p = self.padding
        if p:
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, p), (0, 0)))

        def make_w(name, modes):
            return self.param(
                name, xavier_normal_init(1.0), (self.width, self.width, modes)
            )

        shared = None
        if self.share_weight:
            shared = (
                make_w("fourier_weight_x", self.modes_x),
                make_w("fourier_weight_y", self.modes_y),
                make_w("fourier_weight_z", self.modes_z),
            )

        h = x
        for i in range(self.n_layers):
            if shared is not None:
                wx, wy, wz = shared
            else:
                wx = make_w(f"layers_{i}_fourier_weight_x", self.modes_x)
                wy = make_w(f"layers_{i}_fourier_weight_y", self.modes_y)
                wz = make_w(f"layers_{i}_fourier_weight_z", self.modes_z)
            mixed = (
                dct_mix_axis(x, wx, axis=1)
                + dct_mix_axis(x, wy, axis=2)
                + dct_mix_axis(x, wz, axis=3)
            )
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
            h = h[:, :-p, :-p, :-p, :]
        out = nn.Sequential(
            [
                WNLinear(128, wnorm=self.ff_weight_norm),
                WNLinear(self.output_dim, wnorm=self.ff_weight_norm),
            ],
            name="out",
        )(h)
        return out
