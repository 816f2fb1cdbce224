"""Spectral grid helpers: wavenumber meshes and vorticity/velocity
conversions on the 2D torus.

Conventions follow the reference (which uses jax-cfd ``Grid.rfft_mesh``):
wavenumbers are in *cycles per unit length* — for a domain of length L the
integer mode k has wavenumber k/L — so spectral derivatives multiply by
``2*pi*i*k`` (reference:fourierflow/routines/grid_2d_markov.py:82-93,130-144).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import irfft2, rfft2

__all__ = ["rfft_mesh", "fft_mesh", "laplacian_hat", "velocity_from_vorticity"]

TWO_PI = 2.0 * np.pi


def _domain_lengths(domain) -> Tuple[float, float]:
    (x0, x1), (y0, y1) = domain
    return float(x1) - float(x0), float(y1) - float(y0)


def rfft_mesh(shape: Sequence[int], domain=((0, TWO_PI), (0, TWO_PI))):
    """(kx, ky) wavenumber meshes for rfft2 layout [nx, ny//2+1], in cycles
    per unit length (matches jax_cfd.base.grids.Grid.rfft_mesh)."""
    nx, ny = shape
    lx, ly = _domain_lengths(domain)
    kx = np.fft.fftfreq(nx, d=lx / nx)
    ky = np.fft.rfftfreq(ny, d=ly / ny)
    kxm, kym = np.meshgrid(kx, ky, indexing="ij")
    return jnp.asarray(kxm.astype(np.float32)), jnp.asarray(kym.astype(np.float32))


def fft_mesh(shape: Sequence[int], domain=((0, TWO_PI), (0, TWO_PI))):
    """(kx, ky) for full fft2 layout [nx, ny]."""
    nx, ny = shape
    lx, ly = _domain_lengths(domain)
    kx = np.fft.fftfreq(nx, d=lx / nx)
    ky = np.fft.fftfreq(ny, d=ly / ny)
    kxm, kym = np.meshgrid(kx, ky, indexing="ij")
    return jnp.asarray(kxm.astype(np.float32)), jnp.asarray(kym.astype(np.float32))


def laplacian_hat(shape, domain=((0, TWO_PI), (0, TWO_PI)), rfft: bool = True):
    """``(2*pi*i)^2 (kx^2+ky^2)`` with the (0,0) entry set to 1 so the
    Poisson solve is well-defined (grid_2d_markov.py:86-89)."""
    kx, ky = rfft_mesh(shape, domain) if rfft else fft_mesh(shape, domain)
    lap = (TWO_PI * 1j) ** 2 * (jnp.abs(kx) ** 2 + jnp.abs(ky) ** 2)
    lap = lap.at[0, 0].set(1.0)
    return lap


def velocity_from_vorticity(w: jax.Array, domain=((0, TWO_PI), (0, TWO_PI))):
    """Recover (u, v) from vorticity via the streamfunction:
    psi = -w/lap; u = psi_y, v = -psi_x (grid_2d_markov.py:130-144).

    w: [..., nx, ny] real (trailing two axes spatial). Returns (u, v) with
    the same shape.
    """
    nx, ny = w.shape[-2], w.shape[-1]
    kx, ky = rfft_mesh((nx, ny), domain)
    lap = laplacian_hat((nx, ny), domain)
    w_hat = rfft2(w, axes=(-2, -1))
    psi_hat = -w_hat / lap
    u = irfft2(TWO_PI * 1j * ky * psi_hat, s=(nx, ny), axes=(-2, -1))
    v = irfft2(-TWO_PI * 1j * kx * psi_hat, s=(nx, ny), axes=(-2, -1))
    return u, v
