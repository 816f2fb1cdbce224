"""Factorized FNO on structured 3D meshes (plasticity).

TPU-native equivalent of
reference:fourierflow/modules/factorized_fno/mesh_3d.py:115-189: three
separable spectral branches (x, y, z) summed, padding 8 on all spatial
dims, grid channels appended, multi-channel output head.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.spectral import spectral_mix_axis

__all__ = ["FNOFactorizedMesh3D", "get_grid_3d"]


def get_grid_3d(batch, sx, sy, sz, dtype=jnp.float32):
    gx = jnp.broadcast_to(
        jnp.linspace(0, 1, sx, dtype=dtype)[None, :, None, None, None],
        (batch, sx, sy, sz, 1),
    )
    gy = jnp.broadcast_to(
        jnp.linspace(0, 1, sy, dtype=dtype)[None, None, :, None, None],
        (batch, sx, sy, sz, 1),
    )
    gz = jnp.broadcast_to(
        jnp.linspace(0, 1, sz, dtype=dtype)[None, None, None, :, None],
        (batch, sx, sy, sz, 1),
    )
    return jnp.concatenate([gx, gy, gz], axis=-1)


class FNOFactorizedMesh3D(nn.Module):
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
    spectral_impl: str = "auto"
    # Rematerialize each layer's three spectral branches + FF in the
    # backward pass (jax.checkpoint) — the 3D volumes make this the most
    # activation-hungry model; same param tree either way.
    remat: bool = False

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
                name, xavier_normal_init(1.0), (self.width, self.width, modes, 2)
            )

        shared = None
        if self.share_weight:
            shared = (
                make_w("fourier_weight_x", self.modes_x),
                make_w("fourier_weight_y", self.modes_y),
                make_w("fourier_weight_z", self.modes_z),
            )

        def _layer(ff, x_in, wx, wy, wz):
            mixed = (
                spectral_mix_axis(x_in, wx, axis=1, impl=self.spectral_impl)
                + spectral_mix_axis(x_in, wy, axis=2, impl=self.spectral_impl)
                + spectral_mix_axis(x_in, wz, axis=3, impl=self.spectral_impl)
            )
            return ff(mixed)

        layer_fn = nn.remat(_layer) if self.remat else _layer

        h = x
        for i in range(self.n_layers):
            if shared is not None:
                wx, wy, wz = shared
            else:
                wx = make_w(f"layers_{i}_fourier_weight_x", self.modes_x)
                wy = make_w(f"layers_{i}_fourier_weight_y", self.modes_y)
                wz = make_w(f"layers_{i}_fourier_weight_z", self.modes_z)
            ff = FeedForward(
                self.width,
                self.factor,
                self.ff_weight_norm,
                self.n_ff_layers,
                self.layer_norm,
                0.0,
                name=f"layers_{i}_backcast_ff",
            )
            h = layer_fn(ff, x, wx, wy, wz)
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
