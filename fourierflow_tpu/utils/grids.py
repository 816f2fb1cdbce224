"""Spectral grid helpers: wavenumber meshes and vorticity/velocity
conversions on the 2D torus.

Conventions follow the reference (which uses jax-cfd ``Grid.rfft_mesh``):
wavenumbers are in *cycles per unit length* — for a domain of length L the
integer mode k has wavenumber k/L — so spectral derivatives multiply by
``2*pi*i*k`` (reference:fourierflow/routines/grid_2d_markov.py:82-93,130-144).
"""

from typing import Sequence, Tuple

import jax
import numpy as np

from ..ops.fourier import irfftn_pair, rfftn_pair

__all__ = [
    "Grid",
    "rfft_mesh",
    "fft_mesh",
    "laplacian_hat",
    "velocity_from_vorticity",
]

TWO_PI = 2.0 * np.pi


class Grid:
    """Minimal native uniform periodic grid (replaces jax_cfd.base.grids.Grid
    for our purposes; config target parity with ``fourierflow.utils.Grid``,
    reference:fourierflow/utils/array.py:97-103).

    Cell size is ``step = L/n`` per axis; ``axes()`` returns cell centers
    (offset 0.5), ``mesh(offset)`` arbitrary-offset meshgrids.
    """

    def __init__(self, shape, step=None, domain=None):
        self.shape = tuple(int(s) for s in shape)
        if domain is not None:
            self.domain = tuple((float(a), float(b)) for a, b in domain)
        else:
            step = step if step is not None else 1.0
            steps = (step,) * len(self.shape) if np.ndim(step) == 0 else step
            self.domain = tuple(
                (0.0, float(s) * n) for s, n in zip(steps, self.shape)
            )

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def step(self):
        return tuple((d[1] - d[0]) / n for d, n in zip(self.domain, self.shape))

    def axes(self, offset=0.5):
        return tuple(
            d[0] + (np.arange(n) + offset) * ((d[1] - d[0]) / n)
            for d, n in zip(self.domain, self.shape)
        )

    def mesh(self, offset=None):
        offs = offset if offset is not None else (0.5,) * self.ndim
        axes = [
            d[0] + (np.arange(n) + o) * ((d[1] - d[0]) / n)
            for d, n, o in zip(self.domain, self.shape, offs)
        ]
        return tuple(m.astype(np.float32) for m in np.meshgrid(*axes, indexing="ij"))

    def rfft_mesh(self):
        return rfft_mesh(self.shape, self.domain)

    def fft_mesh(self):
        return fft_mesh(self.shape, self.domain)


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
    # numpy on purpose: these are trace-time constants; building them as
    # device arrays dispatches eager ops, and eager complex arithmetic is
    # UNIMPLEMENTED on the axon TPU backend (see ops/fourier.py).
    return kxm.astype(np.float32), kym.astype(np.float32)


def fft_mesh(shape: Sequence[int], domain=((0, TWO_PI), (0, TWO_PI))):
    """(kx, ky) for full fft2 layout [nx, ny]."""
    nx, ny = shape
    lx, ly = _domain_lengths(domain)
    kx = np.fft.fftfreq(nx, d=lx / nx)
    ky = np.fft.fftfreq(ny, d=ly / ny)
    kxm, kym = np.meshgrid(kx, ky, indexing="ij")
    return kxm.astype(np.float32), kym.astype(np.float32)  # numpy: see rfft_mesh


def laplacian_hat(shape, domain=((0, TWO_PI), (0, TWO_PI)), rfft: bool = True):
    """``(2*pi*i)^2 (kx^2+ky^2)`` with the (0,0) entry set to 1 so the
    Poisson solve is well-defined (grid_2d_markov.py:86-89)."""
    kx, ky = rfft_mesh(shape, domain) if rfft else fft_mesh(shape, domain)
    lap = (TWO_PI * 1j) ** 2 * (np.abs(kx) ** 2 + np.abs(ky) ** 2)
    lap[0, 0] = 1.0
    return lap.astype(np.complex64)  # numpy constant: see rfft_mesh


def velocity_from_vorticity(w: jax.Array, domain=((0, TWO_PI), (0, TWO_PI))):
    """Recover (u, v) from vorticity via the streamfunction:
    psi = -w/lap; u = psi_y, v = -psi_x (grid_2d_markov.py:130-144).

    w: [..., nx, ny] real (trailing two axes spatial). Returns (u, v) with
    the same shape.
    """
    nx, ny = w.shape[-2], w.shape[-1]
    kx, ky = rfft_mesh((nx, ny), domain)
    # Real-pair arithmetic throughout: this runs in the feature-building
    # hot path and must also work eagerly (flax init), where complex
    # dispatch is UNIMPLEMENTED on the axon TPU backend.
    # lap is real and negative: (2*pi*i)^2 (kx^2+ky^2) = -(2*pi)^2 |k|^2.
    lap = -(TWO_PI**2) * (kx**2 + ky**2)
    lap[0, 0] = 1.0
    wr, wi = rfftn_pair(w, axes=(-2, -1))
    # psi = -w/lap; u = d(psi)/dy = Re-pair mult by 2*pi*i*ky; v = -d/dx.
    pr, pi = -wr / lap, -wi / lap
    cy = TWO_PI * ky
    cx = TWO_PI * kx
    # (i*c) * (pr + i*pi) = -c*pi + i*c*pr
    u = irfftn_pair(-cy * pi, cy * pr, s=(nx, ny), axes=(-2, -1))
    v = irfftn_pair(cx * pi, -cx * pr, s=(nx, ny), axes=(-2, -1))
    return u, v
