"""Gaussian random fields with power-law spectra, used as initial
conditions for the Navier-Stokes data generators.

TPU-native equivalent of
reference:fourierflow/builders/synthetic/random_fields.py (itself adapted
from Zongyi Li's public FNO data generation code): sample complex normal
coefficients, scale by the sqrt eigenvalues of (-Lap + tau^2 I)^(-alpha),
and inverse-FFT.
"""

import math
from typing import Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.fourier import ifftn

__all__ = ["gaussian_random_field", "grf_sqrt_eigenvalues"]


def grf_sqrt_eigenvalues(n_dims: int, size: int, alpha: float = 2.0, tau: float = 3.0,
                         sigma: Optional[float] = None) -> np.ndarray:
    if sigma is None:
        sigma = tau ** (0.5 * (2 * alpha - n_dims))
    k_max = size // 2
    k1 = np.concatenate([np.arange(0, k_max), np.arange(-k_max, 0)])
    if n_dims == 1:
        ksq = k1**2
    elif n_dims == 2:
        kx, ky = np.meshgrid(k1, k1, indexing="ij")
        ksq = kx**2 + ky**2
    elif n_dims == 3:
        kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
        ksq = kx**2 + ky**2 + kz**2
    else:
        raise ValueError(f"n_dims={n_dims} unsupported")
    eig = (size**n_dims) * math.sqrt(2.0) * sigma * (
        (4 * math.pi**2 * ksq + tau**2) ** (-alpha / 2.0)
    )
    eig.flat[0] = 0.0
    return eig.astype(np.float32)


@partial(jax.jit, static_argnames=("n_samples", "size", "n_dims", "alpha", "tau", "sigma"))
def gaussian_random_field(
    key: jax.Array,
    n_samples: int,
    size: int,
    n_dims: int = 2,
    alpha: float = 2.0,
    tau: float = 3.0,
    sigma: Optional[float] = None,
) -> jax.Array:
    """Sample ``n_samples`` fields of shape ``[size]*n_dims``."""
    eig = jnp.asarray(grf_sqrt_eigenvalues(n_dims, size, alpha, tau, sigma))
    shape = (n_samples,) + (size,) * n_dims
    kr, ki = jax.random.split(key)
    coeff = eig * (
        jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)
    )
    axes = tuple(range(1, n_dims + 1))
    return jnp.real(ifftn(coeff, axes=axes))
