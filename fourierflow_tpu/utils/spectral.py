"""Spectral / staggered-grid field utilities: vorticity<->velocity
conversions, 2/3-rule filtering, and staggered downsampling.

Native replacements for the jax-cfd helpers the reference leans on
(reference:fourierflow/utils/array.py): ``vorticity_to_velocity`` (the
streamfunction Poisson solve), ``circular_filter_2d`` (isotropic 2/3
dealiasing), ``downsample_staggered_velocity`` (face-strided + transverse
block mean), and the composite ``downsample_vorticity[_hat]`` used for
multi-resolution dataset generation and correlation metrics. All
transforms ride the platform-robust matmul-DFT wrappers.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import irfft2, rfft2
from .grids import Grid, laplacian_hat, rfft_mesh

__all__ = [
    "vorticity_to_velocity_solve",
    "circular_filter_2d",
    "velocity_to_vorticity_fd",
    "downsample_staggered_velocity",
    "downsample_vorticity_hat",
    "downsample_vorticity",
    "grid_correlation",
]

TWO_PI = 2.0 * np.pi


def vorticity_to_velocity_solve(grid: Grid):
    """Return ``solve(w_hat) -> (vx_hat, vy_hat)`` via the streamfunction:
    psi = -w/lap, u = psi_y, v = -psi_x (jax-cfd spectral.utils
    equivalent; cf. reference utils/array.py:10,54-56)."""
    kx, ky = rfft_mesh(grid.shape, grid.domain)
    lap = laplacian_hat(grid.shape, grid.domain)
    two_pi_i = TWO_PI * 1j

    def solve(w_hat):
        psi_hat = -w_hat / lap
        vx_hat = two_pi_i * ky * psi_hat
        vy_hat = -two_pi_i * kx * psi_hat
        return vx_hat, vy_hat

    return solve


def circular_filter_2d(grid: Grid) -> jax.Array:
    """Isotropic 2/3-rule low-pass mask in rfft layout (anti-aliasing for
    the pseudo-spectral advection term)."""
    kx, ky = rfft_mesh(grid.shape, grid.domain)
    k_max = float(grid.shape[0] // 2) / (grid.domain[0][1] - grid.domain[0][0])
    mask = (kx**2 + ky**2) <= (2.0 / 3.0 * k_max) ** 2
    return mask.astype(np.float32)  # numpy constant (axon eager-op gotcha)


def velocity_to_vorticity_fd(vx: jax.Array, vy: jax.Array, grid: Grid) -> jax.Array:
    """Finite-difference curl on the staggered grid
    (reference utils/array.py:83-90): w = (roll(vy,-1,x)-vy)/dx -
    (roll(vx,-1,y)-vx)/dy. Operates on the trailing two axes."""
    dx, dy = grid.step
    dv_dx = (jnp.roll(vy, shift=-1, axis=-2) - vy) / dx
    du_dy = (jnp.roll(vx, shift=-1, axis=-1) - vx) / dy
    return dv_dx - du_dy


def _downsample_component(u: jax.Array, direction: int, factor: int,
                          ndim: int = 2) -> jax.Array:
    """Downsample one staggered velocity component: take the fine faces
    lying on each coarse face (stride ``factor`` starting at
    ``factor-1`` along the face direction) and block-average every
    transverse direction (jax-cfd base.resize semantics). The trailing
    ``ndim`` axes are spatial."""
    sl = [slice(None)] * u.ndim
    ax_face = u.ndim - ndim + direction
    sl[ax_face] = slice(factor - 1, None, factor)
    u = u[tuple(sl)]
    for tr in range(ndim):
        if tr == direction:
            continue
        ax_tr = u.ndim - ndim + tr
        shape = list(u.shape)
        shape[ax_tr] = shape[ax_tr] // factor
        shape.insert(ax_tr + 1, factor)
        u = u.reshape(shape).mean(axis=ax_tr + 1)
    return u


def downsample_staggered_velocity(in_grid: Grid, out_grid: Grid, velocity):
    """Downsample staggered velocities (component i at offset 1 along axis
    i, 0.5 elsewhere) between grids over the same domain. N-D."""
    factor = in_grid.shape[0] // out_grid.shape[0]
    if factor * out_grid.shape[0] != in_grid.shape[0]:
        raise ValueError(f"incompatible grids {in_grid.shape} -> {out_grid.shape}")
    ndim = in_grid.ndim
    return tuple(
        _downsample_component(v, i, factor, ndim) for i, v in enumerate(velocity)
    )


def downsample_vorticity_hat(
    vorticity_hat: jax.Array, velocity_solve, in_grid: Grid, out_grid: Grid
) -> Dict[str, jax.Array]:
    """Spectral vorticity -> velocity -> staggered downsample -> fd curl
    back to vorticity (reference utils/array.py:52-74). Input hat is the
    rfft2 of a [X, Y] field; returns dict(vx, vy, vorticity) on out_grid."""
    vxhat, vyhat = velocity_solve(vorticity_hat)
    vx = irfft2(vxhat, s=in_grid.shape, axes=(-2, -1))
    vy = irfft2(vyhat, s=in_grid.shape, axes=(-2, -1))
    vx, vy = downsample_staggered_velocity(in_grid, out_grid, (vx, vy))
    w = velocity_to_vorticity_fd(vx, vy, out_grid)
    return {"vx": vx, "vy": vy, "vorticity": w}


def downsample_vorticity(
    vorticity: jax.Array, out_size: int = 32, domain=((0, TWO_PI), (0, TWO_PI))
) -> jax.Array:
    """Batched downsampling of vorticity trajectories [B, X, Y, T] ->
    [B, out, out, T] (reference utils/array.py:18-49 loops in Python over
    batch and time; here it's one vmapped XLA program)."""
    b, sx, sy, t = vorticity.shape
    in_grid = Grid(shape=(sx, sy), domain=domain)
    out_grid = Grid(shape=(out_size, out_size), domain=domain)
    solve = vorticity_to_velocity_solve(in_grid)

    def one(w):  # [X, Y]
        w_hat = rfft2(w, axes=(0, 1))
        return downsample_vorticity_hat(w_hat, solve, in_grid, out_grid)["vorticity"]

    fn = jax.vmap(jax.vmap(one))  # over [B, T, X, Y]
    ws = fn(jnp.moveaxis(vorticity, -1, 1))
    return jnp.moveaxis(ws, 1, -1)


def grid_correlation(x: jax.Array, y: jax.Array, axes=(-2, -1)) -> jax.Array:
    """Normalized inner product over spatial axes
    (reference utils/array.py:11-14)."""
    xn = x / jnp.linalg.norm(x, axis=axes, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=axes, keepdims=True)
    return (xn * yn).sum(axis=axes)
