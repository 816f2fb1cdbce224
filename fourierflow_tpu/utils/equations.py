"""Pseudo-spectral Navier-Stokes equation and IMEX time stepping.

Native replacements for the jax-cfd pieces used by all Kolmogorov data
configs (reference:fourierflow/utils/equations.py:11-74 and the
``jax_cfd.spectral.time_stepping.crank_nicolson_rk4`` /
``jax_cfd.base.equations.stable_time_step`` targets in
data/kolmogorov/*.yaml):

- ``NavierStokes2D``: vorticity equation split into explicit advection
  (+ forcing curl, 2/3-filtered) and implicit diffusion + drag with an
  exact pointwise solve.
- ``crank_nicolson_rk4``: the Carpenter-Kennedy low-storage RK4 combined
  with Crank-Nicolson on the implicit part (same scheme jax-cfd uses; the
  tableau coefficients are the published CK 4(3)5[2R+C] values).
- ``stable_time_step``: min of the advective CFL and explicit-diffusion
  limits.
- ``repeated`` / ``trajectory``: scanned step composition
  (jax_cfd.base.funcutils equivalents).

State convention: the rfft2 half-spectrum of vorticity, shape
[nx, ny//2+1] complex (batching handled by vmap at the call site).
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import irfft2, rfft2
from .grids import Grid, rfft_mesh
from .spectral import circular_filter_2d, vorticity_to_velocity_solve

__all__ = [
    "NavierStokes2D",
    "crank_nicolson_rk4",
    "stable_time_step",
    "repeated",
    "trajectory",
]

TWO_PI = 2.0 * np.pi


@dataclasses.dataclass
class NavierStokes2D:
    """Implicit-explicit split of the 2D NS vorticity equation
    (reference utils/equations.py:11-74)."""

    viscosity: float
    grid: Grid
    drag: float = 0.0
    smooth: bool = True
    forcing_fn: Optional[Callable] = None

    def __post_init__(self):
        self.kx, self.ky = rfft_mesh(self.grid.shape, self.grid.domain)
        self.laplace = (TWO_PI * 1j) ** 2 * (self.kx**2 + self.ky**2)
        self.filter_ = circular_filter_2d(self.grid)
        self.linear_term = self.viscosity * self.laplace - self.drag
        self.velocity_solve = vorticity_to_velocity_solve(self.grid)
        self._forcing_with_grid = (
            self.forcing_fn(self.grid) if self.forcing_fn is not None else None
        )

    def explicit_terms(self, vorticity_hat):
        s = self.grid.shape
        vxhat, vyhat = self.velocity_solve(vorticity_hat)
        vx = irfft2(vxhat, s=s, axes=(-2, -1))
        vy = irfft2(vyhat, s=s, axes=(-2, -1))

        grad_x = irfft2(2j * jnp.pi * self.kx * vorticity_hat, s=s, axes=(-2, -1))
        grad_y = irfft2(2j * jnp.pi * self.ky * vorticity_hat, s=s, axes=(-2, -1))

        advection_hat = rfft2(-(grad_x * vx + grad_y * vy), axes=(-2, -1))
        if self.smooth:
            advection_hat = advection_hat * self.filter_

        terms = advection_hat
        if self._forcing_with_grid is not None:
            fx, fy = self._forcing_with_grid(vx, vy)
            fx_hat = rfft2(fx, axes=(-2, -1))
            fy_hat = rfft2(fy, axes=(-2, -1))
            # spectral curl: 2*pi*i*(kx*fy - ky*fx)
            terms = terms + 2j * jnp.pi * (self.kx * fy_hat - self.ky * fx_hat)
        return terms

    def implicit_terms(self, vorticity_hat):
        return self.linear_term * vorticity_hat

    def implicit_solve(self, vorticity_hat, time_step):
        return vorticity_hat / (1 - time_step * self.linear_term)


# Carpenter-Kennedy RK4(3)5[2R+C] low-storage coefficients (public tableau,
# the same scheme jax-cfd's crank_nicolson_rk4 uses).
_CK_ALPHAS = (
    0.0,
    0.1496590219993,
    0.3704009573644,
    0.6222557631345,
    0.9582821306748,
    1.0,
)
_CK_BETAS = (
    0.0,
    -0.4178904745,
    -1.192151694643,
    -1.697784692471,
    -1.514183444257,
)
_CK_GAMMAS = (
    0.1496590219993,
    0.3792103129999,
    0.8229550293869,
    0.6994504559488,
    0.1530572479681,
)


def crank_nicolson_rk4(equation, time_step: float):
    """Low-storage IMEX RK: explicit terms advanced with CK-RK4, implicit
    terms with Crank-Nicolson sub-steps solved exactly."""
    dt = time_step
    f = equation.explicit_terms
    g = equation.implicit_terms
    g_inv = equation.implicit_solve

    def step_fn(u):
        h = jnp.zeros_like(u)
        for k in range(len(_CK_GAMMAS)):
            h = f(u) + _CK_BETAS[k] * h
            mu = 0.5 * dt * (_CK_ALPHAS[k + 1] - _CK_ALPHAS[k])
            u = g_inv(u + _CK_GAMMAS[k] * dt * h + mu * g(u), mu)
        return u

    return step_fn


def stable_time_step(
    max_velocity: float, max_courant_number: float, viscosity: float, grid: Grid
) -> float:
    """min(CFL dt, explicit-diffusion dt) — jax_cfd.base.equations
    equivalent; reproduces the reference config's dt=2.1914e-4 for the
    2048^2 Re=1000 setup."""
    dx = min(grid.step)
    dt_courant = max_courant_number * dx / max_velocity
    dt_diffusion = dx**2 / (viscosity * 2 ** grid.ndim)
    return min(dt_courant, dt_diffusion)


def repeated(step_fn: Callable, n: int) -> Callable:
    """Compose step_fn n times (scanned)."""

    def f(state):
        def body(s, _):
            return step_fn(s), None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    return f


def trajectory(step_fn: Callable, steps: int, post_process: Callable = lambda x: x):
    """Iterate step_fn `steps` times, stacking post_process of each state
    (jax_cfd.base.funcutils.trajectory equivalent)."""

    def f(state):
        def body(s, _):
            s2 = step_fn(s)
            return s2, post_process(s2)

        return jax.lax.scan(body, state, None, length=steps)

    return f
