"""Geo-FNO structured-mesh 2D baseline (Li et al. 2022 reproduction) —
TPU-native equivalent of reference:fourierflow/modules/zongyi_fno/mesh_2d.py.

Full 2D spectral weights (uniform-random complex init, backward-normalized
FFT), a 1x1-conv residual branch per layer (a channel linear in our
channels-last layout), GELU between layers, domain padding 8, grid
channels appended.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.spectral import spectral_conv_2d_full
from .ffno_mesh_2d import get_grid_2d

__all__ = ["FNOMesh2D", "geo_complex_init"]


def geo_complex_init(scale: float):
    """torch ``scale * rand(..., dtype=cfloat)``: real and imaginary parts
    each ~ U(0, scale) (zongyi mesh_2d.py:27-31)."""

    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


class FNOMesh2D(nn.Module):
    modes1: int
    modes2: int
    width: int
    n_layers: int = 4
    padding: int = 8

    @nn.compact
    def __call__(self, x, **kwargs):
        # x: [batch, sx, sy, 2] (the mesh coordinates)
        b = x.shape[0]
        grid = get_grid_2d(b, x.shape[1], x.shape[2], x.dtype)
        x = jnp.concatenate([x, grid], axis=-1)  # [b, sx, sy, 4]
        x = nn.Dense(self.width, name="fc0")(x)
        p = self.padding
        if p:
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)))

        scale = 1.0 / (self.width * self.width)
        wshape = (self.width, self.width, self.modes1, self.modes2, 2)
        for i in range(self.n_layers):
            w1 = self.param(f"convs_{i}_weight_1", geo_complex_init(scale), wshape)
            w2 = self.param(f"convs_{i}_weight_2", geo_complex_init(scale), wshape)
            x1 = spectral_conv_2d_full(x, w1, w2, norm="backward")
            x2 = nn.Dense(self.width, name=f"ws_{i}")(x)  # 1x1 conv residual
            x = x1 + x2
            if i < self.n_layers - 1:
                x = nn.gelu(x)

        if p:
            x = x[:, :-p, :-p, :]
        x = nn.Dense(128, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(1, name="fc2")(x)
