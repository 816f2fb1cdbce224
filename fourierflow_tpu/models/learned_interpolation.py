"""Learned-interpolation Navier-Stokes solver (Kochkov et al. 2021,
"Machine learning accelerated CFD") — TPU-native finite-volume stack.

Native re-implementation of the physics the reference delegates to
jax-cfd's ``modular_navier_stokes_model``
(reference:fourierflow/routines/learned_interpolator.py:48-62). One model
step advances incompressible NS on a staggered (MAC) grid:

1. **Learned advection**: a periodic CNN consumes (u, v) and emits, for
   each advected component and flux direction, corrections to a 4-point
   interpolation stencil along that direction. The correction is
   constrained to sum to zero, so the interpolation always reproduces the
   linear scheme on constants — untrained networks start at second-order
   accuracy (the central trick of the paper).
2. **Explicit diffusion** (5-point stencil) and Kolmogorov forcing
   ``sin(k y)`` on u with linear drag.
3. **Pressure projection**: the staggered divergence is removed with a
   Poisson solve diagonalized by the FD Laplacian eigenvalues, computed
   with the matmul-DFT wrappers (ops/fourier.py) so it runs on the MXU —
   the axon TPU backend has no native FFT.

Everything is channels-last, real-dtype, static-shape; the whole step is a
few convs + rolls + two DFT matmuls, which XLA fuses into a tight loop
under ``lax.scan``.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import irfftn_pair, rfftn_pair

__all__ = ["LearnedInterpolationStep", "pressure_projection", "advect_linear"]


def _roll(x, shift, axis):
    return jnp.roll(x, shift, axis=axis)


def pressure_projection(u: jax.Array, v: jax.Array, h: float) -> Tuple[jax.Array, jax.Array]:
    """Project staggered velocities onto the divergence-free subspace.

    u: [..., X, Y] at x-faces (offset (1, 0.5)); v at y-faces (0.5, 1).
    Solves the cell-centered Poisson problem with the 5-point Laplacian,
    diagonalized by the DFT (periodic), then subtracts the face gradient.
    """
    n1, n2 = u.shape[-2], u.shape[-1]
    # Cell-centered divergence: (u_i - u_{i-1})/h + (v_j - v_{j-1})/h.
    div = (u - _roll(u, 1, -2)) / h + (v - _roll(v, 1, -1)) / h

    # Eigenvalues of the periodic 5-point Laplacian.
    k1 = np.arange(n1)
    k2 = np.arange(n2 // 2 + 1)
    lam1 = (2.0 * np.cos(2.0 * np.pi * k1 / n1) - 2.0) / h**2
    lam2 = (2.0 * np.cos(2.0 * np.pi * k2 / n2) - 2.0) / h**2
    lam = lam1[:, None] + lam2[None, :]
    lam[0, 0] = 1.0  # zero mode: pressure defined up to a constant
    inv_lam = jnp.asarray(np.where(lam == 0.0, 0.0, 1.0 / lam), dtype=u.dtype)

    dr, di = rfftn_pair(div, axes=(-2, -1))
    pr = dr * inv_lam
    pi = di * inv_lam
    # Kill the mean (zero mode) explicitly.
    pr = pr.at[..., 0, 0].set(0.0)
    pi = pi.at[..., 0, 0].set(0.0)
    p = irfftn_pair(pr, pi, s=(n1, n2), axes=(-2, -1))

    # Face gradients: dp/dx at x-faces, dp/dy at y-faces.
    u_new = u - (_roll(p, -1, -2) - p) / h
    v_new = v - (_roll(p, -1, -1) - p) / h
    return u_new, v_new


def _stencil_values(phi: jax.Array, axis: int):
    """The 4 neighbours of a face along `axis`: offsets -1, 0, +1, +2 in
    cell units relative to the face between cell 0 and 1."""
    return jnp.stack(
        [_roll(phi, 1, axis), phi, _roll(phi, -1, axis), _roll(phi, -2, axis)],
        axis=-1,
    )


def advect_linear(phi: jax.Array, axis: int) -> jax.Array:
    """Second-order central interpolation of `phi` to the face along
    `axis` (the base scheme the learned correction perturbs)."""
    return 0.5 * (phi + _roll(phi, -1, axis))


class PeriodicCNN(nn.Module):
    """Small conv tower with periodic padding — the interpolation
    coefficient network (Kochkov et al. use 6 layers of 3x3, 64 ch)."""

    features: int = 64
    n_layers: int = 6
    out_channels: int = 16

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers - 1):
            x = nn.Conv(self.features, (3, 3), padding="CIRCULAR", name=f"conv_{i}")(x)
            x = nn.relu(x)
        # Zero-init: the untrained model is exactly the second-order
        # central scheme, so the long unrolled loss starts finite (random
        # stencil corrections at CFL ~0.5 blow up within a few steps).
        return nn.Conv(
            self.out_channels, (3, 3), padding="CIRCULAR",
            kernel_init=nn.initializers.zeros, name="out",
        )(x)


class LearnedInterpolationStep(nn.Module):
    """One NS time step with learned advection interpolation.

    Input/Output: (u, v) each ``[X, Y]`` (vmap over batch outside).
    """

    size: int
    dt: float
    density: float = 1.0
    viscosity: float = 1e-3
    forcing_wavenumber: int = 4
    forcing_scale: float = 1.0
    drag: float = 0.1
    domain_length: float = 2 * np.pi
    features: int = 64
    n_cnn_layers: int = 6

    @nn.compact
    def __call__(self, u, v):
        h = self.domain_length / self.size
        dt = self.dt

        # Learned stencil corrections: 4 interpolations x 4 taps.
        inputs = jnp.stack([u, v], axis=-1)
        raw = PeriodicCNN(
            self.features, self.n_cnn_layers, out_channels=16, name="coeff_net"
        )(inputs)
        raw = raw.reshape(*raw.shape[:-1], 4, 4)
        # Zero-sum constraint: corrections never break constant fields.
        corr = raw - raw.mean(axis=-1, keepdims=True)

        def interp(phi, axis, which):
            vals = _stencil_values(phi, axis)  # [X, Y, 4]
            base = jnp.zeros((4,), dtype=phi.dtype).at[1].set(0.5).at[2].set(0.5)
            w = base + corr[..., which, :]
            return (vals * w).sum(axis=-1)

        # Advecting velocities at the flux faces (linear interpolation of
        # the staggered components onto each other's faces).
        u_at_v_face = 0.25 * (u + _roll(u, 1, -2) + _roll(u, -1, -1)
                              + _roll(_roll(u, 1, -2), -1, -1))
        v_at_u_face = 0.25 * (v + _roll(v, 1, -1) + _roll(v, -1, -2)
                              + _roll(_roll(v, 1, -1), -1, -2))

        # Flux-form advection divergence for u (at x-faces):
        #   d(uu)/dx + d(vu)/dy
        uu_face = interp(u, -2, 0) * advect_linear(u, -2)
        vu_face = interp(u, -1, 1) * v_at_u_face
        adv_u = (uu_face - _roll(uu_face, 1, -2)) / h + (
            vu_face - _roll(vu_face, 1, -1)
        ) / h

        # ... and for v (at y-faces): d(uv)/dx + d(vv)/dy
        uv_face = interp(v, -2, 2) * u_at_v_face
        vv_face = interp(v, -1, 3) * advect_linear(v, -1)
        adv_v = (uv_face - _roll(uv_face, 1, -2)) / h + (
            vv_face - _roll(vv_face, 1, -1)
        ) / h

        def laplacian(phi):
            return (
                _roll(phi, 1, -2) + _roll(phi, -1, -2)
                + _roll(phi, 1, -1) + _roll(phi, -1, -1)
                - 4.0 * phi
            ) / h**2

        # Kolmogorov forcing sin(k y) on u, with linear drag on both
        # (utils/forcings.py; jax-cfd simple_turbulence_forcing).
        y_faces = (jnp.arange(self.size) + 0.5) * h
        force_u = self.forcing_scale * jnp.sin(self.forcing_wavenumber * y_faces)[None, :]

        du = -adv_u + self.viscosity * laplacian(u) + force_u - self.drag * u
        dv = -adv_v + self.viscosity * laplacian(v) - self.drag * v

        u = u + dt * du
        v = v + dt * dv
        return pressure_projection(u, v, h)
