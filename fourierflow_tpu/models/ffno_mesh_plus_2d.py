"""Fully-factorized Geo-FNO on 2D point clouds — the "mesh_plus" variant
(TPU-native equivalent of
reference:fourierflow/modules/factorized_fno/mesh_plus_2d.py).

This variant factorizes the *non-uniform* transform itself: each layer has
two independent per-axis branches. For scattered inputs, each branch is a
per-axis NUDFT onto the positive frequencies ``0..m-1`` (ops/nudft.py:
nudft_axis), per-mode complex channel mixing, and an inverse real DFT back
to a regular axis, broadcast along the other grid axis. For scattered
outputs, the branch sums the grid along the other axis and evaluates the
mixed truncated spectrum at the query coordinates (inudft_axis). On the
uniform grid the branch reduces to the standard separable F-FNO mixing.

Normalization mirrors the reference's torch defaults: forward transforms
are unscaled, inverse transforms carry the 1/n 'backward' factor (for the
grid->grid path this composite equals the ortho-normalized
spectral_mix_axis, which we reuse).

Reference quirks mirrored deliberately: the y-branch uses coordinate 0
with modes2 and the x-branch coordinate 1 with modes1 (mesh_plus_2d.py:
118-142), and the middle layers accumulate ``uc = uc + conv(uc) + bias``
with the *same* grid-bias linear as layer 0 (mesh_plus_2d.py:254-257).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FeedForward, xavier_normal_init
from ..ops.dft import irdft_basis, rdft_basis
from ..ops.nudft import inudft_axis, nudft_axis
from ..ops.spectral import spectral_mix_axis
from .ffno_mesh_2d import get_grid_2d

__all__ = ["FNOFullyFactorizedMesh2D"]


def _mix_modes(sr, si, w):
    """Per-mode complex channel mixing on one axis: s [b, m, i], w [i, o, m, 2]."""
    wr, wi = w[..., 0], w[..., 1]
    yr = jnp.einsum("bmi,iom->bmo", sr, wr) - jnp.einsum("bmi,iom->bmo", si, wi)
    yi = jnp.einsum("bmi,iom->bmo", sr, wi) + jnp.einsum("bmi,iom->bmo", si, wr)
    return yr, yi


def _points_to_axis(feats, coord, w, s):
    """One branch of the scattered-input layer: NUDFT -> mix -> inverse
    real DFT (backward norm) onto a regular axis of length ``s``
    (mesh_plus_2d.py:59-75, 87-103 with x_in set)."""
    m = w.shape[2]
    sr, si = nudft_axis(feats, coord, m)  # [b, m, c]
    yr, yi = _mix_modes(sr, si, w)
    cr, ci = (jnp.asarray(b) for b in irdft_basis(s, m, norm="backward", dtype=str(yr.dtype)))
    return jnp.einsum("bmc,mn->bnc", yr, cr) + jnp.einsum("bmc,mn->bnc", yi, ci)


def _grid_axis_to_points(x, axis, coord, w):
    """One branch of the scattered-output layer: rfft along ``axis``
    (backward norm, unscaled), sum the grid along the other spatial axis,
    mix, evaluate at the query coords (mesh_plus_2d.py:77-84, 105-111)."""
    m = w.shape[2]
    n = x.shape[axis]
    er, ei = (jnp.asarray(b) for b in rdft_basis(n, m, norm="backward", dtype=str(x.dtype)))
    xm = jnp.moveaxis(x, axis, -2)  # [..., n, c]
    sr = jnp.einsum("bqnc,nm->bqmc", xm, er)  # q = the other spatial axis
    si = jnp.einsum("bqnc,nm->bqmc", xm, ei)
    sr, si = sr.sum(axis=1), si.sum(axis=1)  # [b, m, c]
    yr, yi = _mix_modes(sr, si, w)
    return inudft_axis(yr, yi, coord, m)  # [b, n_points, c]


class FNOFullyFactorizedMesh2D(nn.Module):
    modes1: int
    modes2: int
    width: int
    in_channels: int
    out_channels: int
    n_layers: int = 4
    is_mesh: bool = True
    s1: int = 40
    s2: int = 40
    factor: int = 2
    ff_weight_norm: bool = True
    n_ff_layers: int = 2
    iphi: Optional[nn.Module] = None

    def _weights(self, i):
        # Per-conv weight pair: [0] y-axis (modes2), [1] x-axis (modes1)
        # (mesh_plus_2d.py:26-34).
        wy = self.param(
            f"convs_{i}_fourier_weight_y",
            xavier_normal_init(1.0),
            (self.width, self.width, self.modes2, 2),
        )
        wx = self.param(
            f"convs_{i}_fourier_weight_x",
            xavier_normal_init(1.0),
            (self.width, self.width, self.modes1, 2),
        )
        return wy, wx

    def _ff(self, i):
        return FeedForward(
            self.width,
            self.factor,
            self.ff_weight_norm,
            self.n_ff_layers,
            False,
            0.0,
            name=f"convs_{i}_backcast_ff",
        )

    @nn.compact
    def __call__(self, u, code=None, x_in=None, x_out=None, **kwargs):
        # u: [batch, n_points, in_channels] (for meshes: the coords)
        if self.is_mesh and x_in is None:
            x_in = u
        if self.is_mesh and x_out is None:
            x_out = u
        b = u.shape[0]

        xi_in = self.iphi(x_in, code) if self.iphi is not None else x_in
        xi_out = self.iphi(x_out, code) if self.iphi is not None else x_out

        grid = get_grid_2d(b, self.s1, self.s2, u.dtype)
        bs_grid = nn.Dense(self.width, name="bs_grid")  # reference bs[0]
        bs_points = nn.Dense(self.width, name="bs_points")  # reference bs[1]

        feats = nn.Dense(self.width, name="fc0")(u)  # [b, n, width]

        # Layer 0: points -> grid, each axis factorized independently.
        wy, wx = self._weights(0)
        xy = _points_to_axis(feats, xi_in[..., 0], wy, self.s2)  # [b, s2, c]
        xx = _points_to_axis(feats, xi_in[..., 1], wx, self.s1)  # [b, s1, c]
        mixed = xy[:, None, :, :] + xx[:, :, None, :]  # broadcast to the grid
        uc = self._ff(0)(mixed) + bs_grid(grid)

        # Middle layers: standard separable mixing on the grid.
        for i in range(1, self.n_layers):
            wy, wx = self._weights(i)
            mixed = spectral_mix_axis(uc, wy, axis=2) + spectral_mix_axis(
                uc, wx, axis=1
            )
            uc = uc + self._ff(i)(mixed) + bs_grid(grid)

        # Last layer: grid -> points, no feed-forward (ff=False,
        # mesh_plus_2d.py:260).
        L = self.n_layers
        wy, wx = self._weights(L)
        pts = _grid_axis_to_points(uc, 2, xi_out[..., 0], wy)
        pts = pts + _grid_axis_to_points(
            jnp.swapaxes(uc, 1, 2), 2, xi_out[..., 1], wx
        )
        pts = pts + bs_points(x_out)

        h = nn.Dense(128, name="fc1")(pts)
        h = nn.gelu(h)
        return nn.Dense(self.out_channels, name="fc2")(h)
