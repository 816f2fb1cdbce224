"""Factorized FNO on 2D point clouds (elasticity) — Geo-FNO style.

TPU-native equivalent of
reference:fourierflow/modules/factorized_fno/point_cloud_2d.py:162-280:
the first layer is a direct non-uniform Fourier transform from scattered
points onto a uniform s1 x s2 spectral grid (optionally through a learned
IPhi deformation), the middle layers are factorized spectral convs on the
uniform grid, and the last layer is a full 2D spectral conv whose output
is evaluated back at the query points via the inverse NUDFT. Grid-coord
"bias" branches (the reference's 1x1 convs ``bs``) are channel linears.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FeedForward, WNLinear, xavier_normal_init
from ..ops.fourier import irfftn_pair, rfftn_pair
from ..ops.nudft import inudft2d, nudft2d
from ..ops.spectral import permode_cmul, spectral_mix_axis
from .ffno_mesh_2d import get_grid_2d

__all__ = ["FNOFactorizedPointCloud2D"]


def _geo_complex_init(scale: float):
    """torch ``scale * rand(..., dtype=cfloat)``: real/imag ~ U(0, scale)
    (point_cloud_2d.py:33-37)."""

    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


class FNOFactorizedPointCloud2D(nn.Module):
    modes1: int
    modes2: int
    width: int
    in_channels: int
    out_channels: int
    n_layers: int = 4
    is_mesh: bool = True
    s1: int = 40
    s2: int = 40
    share_weight: bool = False
    iphi: Optional[nn.Module] = None
    spectral_impl: str = "auto"

    def _halves_to_grid(self, yr, yi):
        """Zero-pad the truncated spectrum halves into rfft2 layout and
        transform to the uniform grid (point_cloud_2d.py:66-76). Real-pair
        arithmetic throughout — eager complex dispatch is UNIMPLEMENTED on
        the axon TPU backend (see ops/fourier.py:rfftn_pair)."""
        b, _, _, c = yr.shape
        m1, m2 = self.modes1, self.modes2
        out_r = jnp.zeros((b, self.s1, self.s2 // 2 + 1, c), dtype=yr.dtype)
        out_i = jnp.zeros((b, self.s1, self.s2 // 2 + 1, c), dtype=yr.dtype)
        out_r = out_r.at[:, :m1, :m2, :].set(yr[:, :m1]).at[:, -m1:, :m2, :].set(yr[:, m1:])
        out_i = out_i.at[:, :m1, :m2, :].set(yi[:, :m1]).at[:, -m1:, :m2, :].set(yi[:, m1:])
        return irfftn_pair(out_r, out_i, s=(self.s1, self.s2), axes=(1, 2))

    @nn.compact
    def __call__(self, u, code=None, x_in=None, x_out=None, **kwargs):
        # u: [batch, n_points, in_channels] (for meshes: the coords)
        if self.is_mesh and x_in is None:
            x_in = u
        if self.is_mesh and x_out is None:
            x_out = u
        b = u.shape[0]
        m1, m2 = self.modes1, self.modes2

        xi_in = self.iphi(x_in, code) if self.iphi is not None else x_in
        xi_out = self.iphi(x_out, code) if self.iphi is not None else x_out

        grid = get_grid_2d(b, self.s1, self.s2, u.dtype)
        bs_grid = WNLinear(self.width, name="bs_grid")  # reference bs[0]
        bs_points = WNLinear(self.width, name="bs_points")  # reference bs[1]

        feats = WNLinear(self.width, name="fc0")(u)  # [b, n, width]

        # Layer 0: points -> uniform grid, no learned mixing.
        yr, yi = nudft2d(feats, xi_in, m1, m2)
        uc = self._halves_to_grid(yr, yi) + bs_grid(grid)

        # Middle layers: factorized spectral convs on the grid.
        wshape = (self.width, self.width, m1, 2)
        shared = None
        if self.share_weight:
            shared = (
                self.param("fourier_weight_y", xavier_normal_init(1.0), wshape),
                self.param("fourier_weight_x", xavier_normal_init(1.0), wshape),
            )
        for i in range(1, self.n_layers):
            if shared is not None:
                wy, wx = shared
            else:
                wy = self.param(f"layers_{i}_fourier_weight_y", xavier_normal_init(1.0), wshape)
                wx = self.param(f"layers_{i}_fourier_weight_x", xavier_normal_init(1.0), wshape)
            mixed = spectral_mix_axis(uc, wy, axis=2, impl=self.spectral_impl)
            mixed = mixed + spectral_mix_axis(uc, wx, axis=1, impl=self.spectral_impl)
            backcast = FeedForward(
                self.width, 2, True, 2, False, 0.0, name=f"layers_{i}_backcast_ff"
            )(mixed)
            uc = uc + backcast + bs_grid(grid)

        # Last layer: full 2D spectral conv, evaluated at the query points.
        scale = 1.0 / (self.width * self.width)
        wshape_full = (self.width, self.width, m1, m2, 2)
        w1 = self.param("last_weight_1", _geo_complex_init(scale), wshape_full)
        w2 = self.param("last_weight_2", _geo_complex_init(scale), wshape_full)

        ufr, ufi = rfftn_pair(uc, axes=(1, 2))  # [b, s1, s2//2+1, width]
        # Batched-matmul mixing: multi-batch-dim einsums hang the axon
        # TPU compiler (see ops/spectral.py:permode_cmul).
        f1r, f1i = permode_cmul(ufr[:, :m1, :m2, :], ufi[:, :m1, :m2, :], w1)
        f2r, f2i = permode_cmul(ufr[:, -m1:, :m2, :], ufi[:, -m1:, :m2, :], w2)
        ur = jnp.concatenate([f1r, f2r], axis=1)  # [b, 2*m1, m2, width]
        ui = jnp.concatenate([f1i, f2i], axis=1)
        pts = inudft2d(ur, ui, xi_out, m1, m2)  # [b, n, width]
        pts = pts + bs_points(x_out)

        h = WNLinear(128, name="fc1")(pts)
        h = nn.gelu(h)
        return WNLinear(self.out_channels, name="fc2")(h)
