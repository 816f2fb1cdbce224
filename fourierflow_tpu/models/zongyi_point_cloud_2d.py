"""Geo-FNO point-cloud 2D baseline (elasticity, Li et al. 2022
reproduction) — TPU-native equivalent of
reference:fourierflow/modules/zongyi_fno/point_cloud_2d.py.

The first layer transforms scattered points onto a uniform s1 x s2 grid
via the truncated NUDFT *with* learned complex mixing on the two mode
corner blocks; the middle layers are full 2D spectral convs on the grid
with 1x1-conv residual and grid-bias branches; the last layer mixes and
evaluates back at the query points via the inverse NUDFT. All complex
arithmetic is expanded into real matmuls for the MXU.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.fourier import irfftn_pair, rfftn_pair
from ..ops.spectral import permode_cmul as _cmul_modes
from ..ops.nudft import inudft2d, nudft2d
from .ffno_mesh_2d import get_grid_2d
from .zongyi_mesh_2d import geo_complex_init

__all__ = ["FNOPointCloud2D"]




class FNOPointCloud2D(nn.Module):
    modes1: int
    modes2: int
    width: int
    in_channels: int
    out_channels: int
    n_layers: int = 4
    is_mesh: bool = True
    s1: int = 40
    s2: int = 40
    iphi: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, u, code=None, x_in=None, x_out=None, **kwargs):
        # u: [batch, n_points, in_channels] (for meshes: the coords)
        if self.is_mesh and x_in is None:
            x_in = u
        if self.is_mesh and x_out is None:
            x_out = u
        b = u.shape[0]
        m1, m2 = self.modes1, self.modes2
        scale = 1.0 / (self.width * self.width)
        wshape = (self.width, self.width, m1, m2, 2)

        xi_in = self.iphi(x_in, code) if self.iphi is not None else x_in
        xi_out = self.iphi(x_out, code) if self.iphi is not None else x_out

        grid = get_grid_2d(b, self.s1, self.s2, u.dtype)

        feats = nn.Dense(self.width, name="fc0")(u)  # [b, n, width]

        # Layer 0: points -> spectrum (NUDFT), learned mixing, -> grid
        # (point_cloud_2d.py:41-72 with x_in set).
        yr, yi = nudft2d(feats, xi_in, m1, m2)  # [b, 2*m1, m2, width]
        w1 = self.param("convs_0_weight_1", geo_complex_init(scale), wshape)
        w2 = self.param("convs_0_weight_2", geo_complex_init(scale), wshape)
        f1r, f1i = _cmul_modes(yr[:, :m1], yi[:, :m1], w1)
        f2r, f2i = _cmul_modes(yr[:, m1:], yi[:, m1:], w2)
        out_r = jnp.zeros((b, self.s1, self.s2 // 2 + 1, self.width), dtype=u.dtype)
        out_i = jnp.zeros((b, self.s1, self.s2 // 2 + 1, self.width), dtype=u.dtype)
        out_r = out_r.at[:, :m1, :m2, :].set(f1r).at[:, -m1:, :m2, :].set(f2r)
        out_i = out_i.at[:, :m1, :m2, :].set(f1i).at[:, -m1:, :m2, :].set(f2i)
        uc1 = irfftn_pair(out_r, out_i, s=(self.s1, self.s2), axes=(1, 2))
        uc3 = nn.Dense(self.width, name="bs_0")(grid)
        uc = nn.gelu(uc1 + uc3)

        # Middle layers: full 2D spectral convs on the grid with residual
        # and grid-bias branches (point_cloud_2d.py:227-232).
        for i in range(1, self.n_layers):
            w1 = self.param(f"convs_{i}_weight_1", geo_complex_init(scale), wshape)
            w2 = self.param(f"convs_{i}_weight_2", geo_complex_init(scale), wshape)
            ufr, ufi = rfftn_pair(uc, axes=(1, 2))
            t1r, t1i = _cmul_modes(ufr[:, :m1, :m2], ufi[:, :m1, :m2], w1)
            t2r, t2i = _cmul_modes(ufr[:, -m1:, :m2], ufi[:, -m1:, :m2], w2)
            out_r = jnp.zeros(
                (b, self.s1, self.s2 // 2 + 1, self.width), dtype=u.dtype
            )
            out_i = jnp.zeros(
                (b, self.s1, self.s2 // 2 + 1, self.width), dtype=u.dtype
            )
            out_r = out_r.at[:, :m1, :m2, :].set(t1r).at[:, -m1:, :m2, :].set(t2r)
            out_i = out_i.at[:, :m1, :m2, :].set(t1i).at[:, -m1:, :m2, :].set(t2i)
            uc1 = irfftn_pair(out_r, out_i, s=(self.s1, self.s2), axes=(1, 2))
            uc2 = nn.Dense(self.width, name=f"ws_{i - 1}")(uc)
            uc3 = nn.Dense(self.width, name=f"bs_{i}")(grid)
            uc = nn.gelu(uc1 + uc2 + uc3)

        # Last layer: mix then inverse NUDFT back to the query points
        # (point_cloud_2d.py:234-237).
        L = self.n_layers
        w1 = self.param(f"convs_{L}_weight_1", geo_complex_init(scale), wshape)
        w2 = self.param(f"convs_{L}_weight_2", geo_complex_init(scale), wshape)
        ufr, ufi = rfftn_pair(uc, axes=(1, 2))
        t1r, t1i = _cmul_modes(ufr[:, :m1, :m2], ufi[:, :m1, :m2], w1)
        t2r, t2i = _cmul_modes(ufr[:, -m1:, :m2], ufi[:, -m1:, :m2], w2)
        ur = jnp.concatenate([t1r, t2r], axis=1)  # [b, 2*m1, m2, width]
        ui = jnp.concatenate([t1i, t2i], axis=1)
        pts = inudft2d(ur, ui, xi_out, m1, m2)  # [b, n, width]
        pts = pts + nn.Dense(self.width, name=f"bs_{L}")(x_out)

        h = nn.Dense(128, name="fc1")(pts)
        h = nn.gelu(h)
        return nn.Dense(self.out_channels, name="fc2")(h)
