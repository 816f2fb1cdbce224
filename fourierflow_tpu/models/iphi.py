"""Learned coordinate deformation x -> xi for Geo-FNO point clouds.

TPU-native equivalent of reference:fourierflow/modules/iphi.py:6-58:
angle/radius feature engineering, NeRF-style sin/cos features with bands
``B = pi * 2^k``, a 5-layer tanh MLP, and a residual multiplicative update
``x + x * MLP(...)``. (The reference hardcodes device='cuda'; here the
bands are plain constants.)
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import WNLinear

__all__ = ["IPhi"]


class IPhi(nn.Module):
    width: int = 32

    @nn.compact
    def __call__(self, x, code=None):
        # x: [batch, n_points, 2]; code: [batch, n_features] or None
        center = jnp.array([0.0001, 0.0001], dtype=x.dtype)
        angle = jnp.arctan2(x[..., 1] - center[1], x[..., 0] - center[0])
        radius = jnp.linalg.norm(x - center, axis=-1)
        xd = jnp.stack([x[..., 0], x[..., 1], angle, radius], axis=-1)  # [b,n,4]

        n_bands = self.width // 4
        bands = jnp.asarray(np.pi * (2.0 ** np.arange(n_bands)), dtype=x.dtype)
        ang = xd[..., None] * bands  # [b, n, 4, n_bands]
        b, n = xd.shape[0], xd.shape[1]
        x_sin = jnp.sin(ang).reshape(b, n, 4 * n_bands)
        x_cos = jnp.cos(ang).reshape(b, n, 4 * n_bands)

        h = WNLinear(self.width, name="fc0")(xd)
        h = jnp.concatenate([h, x_sin, x_cos], axis=-1)  # [b, n, 3*width]

        if code is not None:
            cd = WNLinear(self.width, name="fc_code")(code)
            cd = jnp.broadcast_to(cd[:, None, :], (b, n, self.width))
            h = jnp.concatenate([cd, h], axis=-1)
        else:
            h = WNLinear(4 * self.width, name="fc_no_code")(h)

        h = WNLinear(4 * self.width, name="fc1")(h)
        h = jnp.tanh(h)
        h = WNLinear(4 * self.width, name="fc2")(h)
        h = jnp.tanh(h)
        h = WNLinear(4 * self.width, name="fc3")(h)
        h = jnp.tanh(h)
        h = WNLinear(2, name="fc4")(h)
        return x + x * h
