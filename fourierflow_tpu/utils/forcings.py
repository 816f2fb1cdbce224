"""Forcing functions for the Kolmogorov flows.

Native equivalents of reference:fourierflow/utils/forcings.py:5-19 and the
``jax_cfd.base.forcings.simple_turbulence_forcing`` config target: a
forcing factory takes a grid and returns ``fn(vx, vy) -> (fx, fy)`` real
force fields.
"""

import jax.numpy as jnp

from .grids import Grid

__all__ = ["kolmogorov_forcing_fn", "simple_turbulence_forcing"]


def kolmogorov_forcing_fn(grid: Grid, scale: float = 1.0, k: int = 4):
    """Constant x-direction forcing ``scale * cos(k*y)`` evaluated on the
    offset-(0,0) mesh (reference utils/forcings.py:5-19)."""
    _, ys = grid.mesh(offset=(0, 0))
    f = scale * jnp.cos(k * ys)

    def forcing(vx, vy):
        return f, jnp.zeros_like(f)

    return forcing


def simple_turbulence_forcing(
    grid: Grid,
    constant_magnitude: float = 1.0,
    constant_wavenumber: int = 4,
    linear_coefficient: float = 0.0,
):
    """Kolmogorov forcing plus linear (drag-like) velocity forcing — the
    jax-cfd config target used by data/kolmogorov/*.yaml. Works for the
    2D spectral solver (called as ``forcing(vx, vy)``) and the N-D
    finite-volume projection solver (called as ``forcing(*velocities)``)."""
    if grid.ndim == 2:
        _, ys = grid.mesh(offset=(0, 0))
        f_const = constant_magnitude * jnp.cos(constant_wavenumber * ys)
    else:
        import numpy as np

        y = grid.axes(offset=0.5)[1]
        sh = [1] * grid.ndim
        sh[1] = len(y)
        f_const = jnp.asarray(
            (constant_magnitude * np.cos(constant_wavenumber * y)).reshape(sh),
            jnp.float32,
        )

    def forcing(*vel):
        out = [linear_coefficient * v for v in vel]
        out[0] = out[0] + f_const
        return tuple(out)

    return forcing
