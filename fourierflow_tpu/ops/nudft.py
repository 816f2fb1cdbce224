"""Non-uniform direct Fourier transforms (Geo-FNO point-cloud layers).

TPU-native equivalent of the NUDFT in
reference:fourierflow/modules/factorized_fno/point_cloud_2d.py:81-159: a
direct transform between scattered points and a truncated uniform spectral
grid via the basis ``exp(-+ 2*pi*i <x, k>)``. All complex arithmetic is
expanded into real cos/sin einsums (MXU matmuls), avoiding complex dtypes
entirely.

Mode layout (matching the reference): ``m1 = 2*modes1`` x-frequencies
``[0..modes1-1, -modes1..-1]`` and ``m2 = 2*modes2-1`` y-frequencies
``[0..modes2-1, -(modes2-1)..-1]``; the forward keeps only the
non-negative-y half ``[..., :modes2]`` (Hermitian redundancy), the inverse
reconstructs the other half by conjugate symmetry.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nudft_wavenumbers", "nudft2d", "inudft2d", "nudft_axis", "inudft_axis"]


def nudft_wavenumbers(modes1: int, modes2: int) -> Tuple[np.ndarray, np.ndarray]:
    """(k1 [m1], k2 [m2]) integer frequency vectors."""
    k1 = np.concatenate([np.arange(0, modes1), np.arange(-modes1, 0)]).astype(np.float32)
    k2 = np.concatenate([np.arange(0, modes2), np.arange(-(modes2 - 1), 0)]).astype(
        np.float32
    )
    return k1, k2


def _basis_angles(x: jax.Array, modes1: int, modes2: int) -> jax.Array:
    """2*pi*<x, k> angles: [batch, n_points, m1, m2]."""
    k1, k2 = nudft_wavenumbers(modes1, modes2)
    ang = (
        x[..., 0][..., None, None] * jnp.asarray(k1)[None, None, :, None]
        + x[..., 1][..., None, None] * jnp.asarray(k2)[None, None, None, :]
    )
    return 2 * jnp.pi * ang


def nudft2d(
    u: jax.Array, x: jax.Array, modes1: int, modes2: int
) -> Tuple[jax.Array, jax.Array]:
    """Forward NUDFT: scattered values -> truncated spectrum.

    Args:
      u: ``[batch, n_points, channels]`` real point values.
      x: ``[batch, n_points, 2]`` point coords in [0,1]^2 (possibly after a
        learned deformation).
    Returns:
      (real, imag) each ``[batch, m1, modes2, channels]`` — the
      non-negative-y half of the spectrum (point_cloud_2d.py:81-118 keeps
      both halves but only ever uses ``[..., :modes2]``).
    """
    ang = _basis_angles(x, modes1, modes2)[..., :modes2]  # [b, n, m1, modes2]
    cr = jnp.cos(ang)
    si = jnp.sin(ang)
    # basis exp(-i ang): real part cos, imag part -sin.
    yr = jnp.einsum("bnc,bnxy->bxyc", u, cr)
    yi = -jnp.einsum("bnc,bnxy->bxyc", u, si)
    return yr, yi


def inudft2d(
    u_r: jax.Array, u_i: jax.Array, x: jax.Array, modes1: int, modes2: int
) -> jax.Array:
    """Inverse NUDFT: truncated spectrum -> values at query points.

    Args:
      u_r, u_i: ``[batch, m1, modes2, channels]`` spectrum halves.
      x: ``[batch, n_points, 2]`` query coords.
    Returns:
      ``[batch, n_points, channels]`` real values.

    Mirrors the reference literally (point_cloud_2d.py:120-159): the
    negative-y columns are reconstructed as
    ``cat([u_ft, conj(flip(u_ft[..., 1:], (-1, -2)))], -1)`` — note the
    row flip maps frequency k to -(k+1), reproducing the reference's
    extension exactly — then contracted with ``exp(+i ang)`` and the real
    part taken.
    """
    # Hermitian-style extension: flip rows and the y>0 columns, conjugate.
    ur2 = jnp.flip(u_r[:, :, 1:, :], axis=(1, 2))
    ui2 = -jnp.flip(u_i[:, :, 1:, :], axis=(1, 2))
    ur_full = jnp.concatenate([u_r, ur2], axis=2)  # [b, m1, m2, c]
    ui_full = jnp.concatenate([u_i, ui2], axis=2)

    ang = _basis_angles(x, modes1, modes2)  # [b, n, m1, m2]
    cr = jnp.cos(ang)
    si = jnp.sin(ang)
    # Re((ur + i*ui) * exp(+i ang)) = ur*cos - ui*sin
    return jnp.einsum("bxyc,bnxy->bnc", ur_full, cr) - jnp.einsum(
        "bxyc,bnxy->bnc", ui_full, si
    )


def nudft_axis(u: jax.Array, coord: jax.Array, modes: int) -> Tuple[jax.Array, jax.Array]:
    """Per-axis forward NUDFT (the fully-factorized Geo-FNO transform,
    reference:fourierflow/modules/factorized_fno/mesh_plus_2d.py:118-142).

    Only the non-negative frequencies ``k = 0..modes-1`` are kept — the
    reference's per-axis bases use ``arange(0, m)``.

    Args:
      u: ``[batch, n_points, channels]`` real point values.
      coord: ``[batch, n_points]`` the coordinate along this axis.
    Returns:
      (real, imag) each ``[batch, modes, channels]``:
      ``sum_n u_n * exp(-2*pi*i * coord_n * k)``.
    """
    k = jnp.arange(modes, dtype=u.dtype)
    ang = 2 * jnp.pi * coord[..., None] * k[None, None, :]  # [b, n, m]
    yr = jnp.einsum("bnc,bnm->bmc", u, jnp.cos(ang))
    yi = -jnp.einsum("bnc,bnm->bmc", u, jnp.sin(ang))
    return yr, yi


def inudft_axis(
    u_r: jax.Array, u_i: jax.Array, coord: jax.Array, modes: int
) -> jax.Array:
    """Per-axis inverse NUDFT: truncated positive-frequency spectrum ->
    real values at scattered coordinates (mesh_plus_2d.py:144-168):
    ``Re(sum_k (u_r + i*u_i)_k * exp(+2*pi*i * coord_n * k))``.

    Args:
      u_r, u_i: ``[batch, modes, channels]``.
      coord: ``[batch, n_points]``.
    Returns:
      ``[batch, n_points, channels]`` real.
    """
    k = jnp.arange(modes, dtype=u_r.dtype)
    ang = 2 * jnp.pi * coord[..., None] * k[None, None, :]  # [b, n, m]
    return jnp.einsum("bmc,bnm->bnc", u_r, jnp.cos(ang)) - jnp.einsum(
        "bmc,bnm->bnc", u_i, jnp.sin(ang)
    )
