"""Geo-FNO structured-mesh 3D baseline (plasticity, Li et al. 2022
reproduction) — TPU-native equivalent of
reference:fourierflow/modules/zongyi_fno/mesh_3d.py.

Full 3D spectral weights on the four (x, y) sign corner blocks with the
z half-spectrum, 1x1-conv residual branches, GELU between layers, domain
padding 5 on all spatial dims, grid channels appended, 4-channel output.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..ops.spectral import spectral_conv_3d_full
from .ffno_mesh_3d import get_grid_3d
from .zongyi_mesh_2d import geo_complex_init

__all__ = ["FNOMesh3D"]


class FNOMesh3D(nn.Module):
    modes1: int
    modes2: int
    modes3: int
    width: int
    n_layers: int = 4
    padding: int = 5
    output_dim: int = 4

    @nn.compact
    def __call__(self, x, **kwargs):
        # x: [batch, sx, sy, sz, 1] (the scalar input field)
        b = x.shape[0]
        grid = get_grid_3d(b, x.shape[1], x.shape[2], x.shape[3], x.dtype)
        x = jnp.concatenate([x, grid], axis=-1)  # [b, sx, sy, sz, 4]
        x = nn.Dense(self.width, name="fc0")(x)
        p = self.padding
        if p:
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, p), (0, 0)))

        scale = 1.0 / (self.width * self.width)
        wshape = (self.width, self.width, self.modes1, self.modes2, self.modes3, 2)
        for i in range(self.n_layers):
            ws = [
                self.param(f"convs_{i}_weight_{j}", geo_complex_init(scale), wshape)
                for j in range(1, 5)
            ]
            x1 = spectral_conv_3d_full(x, ws, norm="backward")
            x2 = nn.Dense(self.width, name=f"ws_{i}")(x)  # 1x1 conv residual
            x = x1 + x2
            if i < self.n_layers - 1:
                x = nn.gelu(x)

        if p:
            x = x[:, :-p, :-p, :-p, :]
        x = nn.Dense(128, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.output_dim, name="fc2")(x)
