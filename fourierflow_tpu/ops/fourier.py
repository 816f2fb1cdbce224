"""Platform-robust 2D Fourier transforms for the solver / physics paths.

The axon TPU backend's native FFT lowering is unreliable (eager fft
dispatch raises UNIMPLEMENTED; jitted fft compiles are flaky — verified on
TPU v5e). These wrappers therefore default to **matmul DFTs on the MXU** on TPU
(dense bases for short axes, the four-step Cooley-Tukey factorization —
two sqrt(n)-sized matmul stages + twiddles — for axes >= 512), and XLA's
FFT on CPU. Use ``set_default_impl`` to override globally.

All functions operate on two trailing-or-named spatial axes and accept
jnp complex arrays at the interface; internally everything is real-pair
arithmetic so only real matmuls hit the hardware.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dft import cdft_basis, irdft_basis, rdft_basis

__all__ = [
    "rfft2",
    "rfftn",
    "irfftn",
    "rfftn_pair",
    "irfftn_pair",
    "irfft2",
    "fft2",
    "ifft2",
    "fftn",
    "ifftn",
    "set_default_impl",
    "resolve_fourier_impl",
]

_DEFAULT_IMPL: Optional[str] = None  # None -> per-platform auto


def set_default_impl(impl: Optional[str]) -> None:
    """Set the global default ('matmul' | 'xla' | None for auto)."""
    global _DEFAULT_IMPL
    _DEFAULT_IMPL = impl


def resolve_fourier_impl(impl: str = "auto") -> str:
    if impl != "auto":
        return impl
    if _DEFAULT_IMPL is not None:
        return _DEFAULT_IMPL
    try:
        backend = jax.default_backend()
    except RuntimeError:
        backend = "cpu"
    return "xla" if backend == "cpu" else "matmul"


# Above this axis length the dense [n, n] DFT matrix is replaced by the
# four-step Cooley-Tukey factorization: two sqrt(n)-sized matmul DFT
# stages with a twiddle multiply in between. This keeps the MXU fed with
# O(n^2 sqrt(n)) FLOPs instead of O(n^3) AND keeps the basis constants
# small — the axon relay rejects compile payloads with the >30 MB dense
# bases that 1024+/2048+ grids would otherwise embed in the HLO.
_FOUR_STEP_MIN = 512


def _split_factor(n: int) -> Tuple[int, int]:
    a = int(np.sqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def _cfft_axis(zr, zi, axis: int, inverse: bool) -> Tuple[jax.Array, jax.Array]:
    """Complex DFT along `axis` via real matmuls (dense below
    ``_FOUR_STEP_MIN``, four-step Cooley-Tukey above)."""
    n = zr.shape[axis]
    a, b = _split_factor(n)
    if n >= _FOUR_STEP_MIN and a >= 8:
        return _cfft_axis_four_step(zr, zi, axis, inverse, a, b)
    fr, fi = (jnp.asarray(m) for m in cdft_basis(n, inverse, dtype=str(zr.dtype)))
    zr = jnp.moveaxis(zr, axis, -1)
    zi = jnp.moveaxis(zi, axis, -1)
    yr = zr @ fr - zi @ fi
    yi = zr @ fi + zi @ fr
    return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)


@functools.lru_cache(maxsize=64)
def _twiddles(n: int, a: int, b: int, inverse: bool, dtype: str):
    """W_n^{±t1*k2} for t1 in [0, a), k2 in [0, b): [b, a] real/imag."""
    t1 = np.arange(a)[None, :]
    k2 = np.arange(b)[:, None]
    sign = 1.0 if inverse else -1.0
    ang = sign * 2.0 * np.pi * t1 * k2 / n
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _cfft_axis_four_step(zr, zi, axis, inverse, a, b):
    """Four-step decimation (n = a*b, t = t2*a + t1, k = k1*b + k2):
      X[k1*b + k2] = sum_t1 W_n^{±t1*k2} W_a^{±t1*k1} sum_t2 x[t2*a+t1] W_b^{±t2*k2}
    Inner/outer stages are dense matmul DFTs of size b and a."""
    dt = str(zr.dtype)
    n = a * b
    zr = jnp.moveaxis(zr, axis, -1)
    zi = jnp.moveaxis(zi, axis, -1)
    lead = zr.shape[:-1]
    zr = zr.reshape(*lead, b, a)  # [..., t2, t1]
    zi = zi.reshape(*lead, b, a)

    # Inner DFT over t2 (length b), contract the -2 axis.
    br_, bi_ = (jnp.asarray(m) for m in cdft_basis(b, inverse, dtype=dt))
    yr = jnp.einsum("...ta,tk->...ka", zr, br_) - jnp.einsum("...ta,tk->...ka", zi, bi_)
    yi = jnp.einsum("...ta,tk->...ka", zr, bi_) + jnp.einsum("...ta,tk->...ka", zi, br_)

    # Twiddle [k2, t1].
    twr, twi = (jnp.asarray(m) for m in _twiddles(n, a, b, inverse, dt))
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr

    # Outer DFT over t1 (length a) on the last axis.
    ar_, ai_ = (jnp.asarray(m) for m in cdft_basis(a, inverse, dtype=dt))
    xr = yr @ ar_ - yi @ ai_
    xi = yr @ ai_ + yi @ ar_

    # [..., k2, k1] -> k = k1*b + k2.
    xr = jnp.swapaxes(xr, -1, -2).reshape(*lead, n)
    xi = jnp.swapaxes(xi, -1, -2).reshape(*lead, n)
    return jnp.moveaxis(xr, -1, axis), jnp.moveaxis(xi, -1, axis)


def rfftn_pair(x: jax.Array, axes, impl: str = "auto") -> Tuple[jax.Array, jax.Array]:
    """Real N-D FFT over `axes` (half-spectrum on axes[-1]), norm='backward',
    returned as a (real, imag) float pair.

    Prefer this (and ``irfftn_pair``) inside models: the axon TPU backend
    cannot *eagerly* dispatch complex arithmetic (``zr + 1j*zi`` raises
    UNIMPLEMENTED outside jit — verified on v5e), and flax ``init`` runs
    eagerly. The pair API keeps the whole spectral path in real dtypes.
    """
    if resolve_fourier_impl(impl) == "xla":
        z = jnp.fft.rfftn(x, axes=axes)
        return jnp.real(z), jnp.imag(z)
    axes = [a % x.ndim for a in axes]
    ax_half = axes[-1]
    n1 = x.shape[ax_half]
    m = n1 // 2 + 1
    if n1 >= _FOUR_STEP_MIN:
        # Large axis: full complex four-step transform of the real signal,
        # then keep the non-negative half (the dense [n, m] half-basis
        # would blow up the compile payload).
        zr, zi = _cfft_axis(x, jnp.zeros_like(x), ax_half, inverse=False)
        sl = [slice(None)] * x.ndim
        sl[ax_half] = slice(0, m)
        zr, zi = zr[tuple(sl)], zi[tuple(sl)]
    else:
        er, ei = (jnp.asarray(b) for b in rdft_basis(n1, m, norm="backward", dtype=str(x.dtype)))
        xm = jnp.moveaxis(x, ax_half, -1)
        zr = jnp.moveaxis(xm @ er, -1, ax_half)
        zi = jnp.moveaxis(xm @ ei, -1, ax_half)
    for ax in axes[:-1]:
        zr, zi = _cfft_axis(zr, zi, ax, inverse=False)
    return zr, zi


def irfftn_pair(zr: jax.Array, zi: jax.Array, s, axes, impl: str = "auto") -> jax.Array:
    """Inverse of ``rfftn_pair`` back to a real field of spatial shape `s`."""
    if resolve_fourier_impl(impl) == "xla":
        return jnp.fft.irfftn(zr + 1j * zi, s=s, axes=axes)
    axes = [a % zr.ndim for a in axes]
    ax_half = axes[-1]
    n1 = s[-1]
    for ax in axes[:-1]:
        zr, zi = _cfft_axis(zr, zi, ax, inverse=True)
    m = zr.shape[ax_half]
    if n1 >= _FOUR_STEP_MIN:
        # Hermitian-extend the half spectrum and run the full complex
        # four-step inverse, taking the real part.
        zr_m = jnp.moveaxis(zr, ax_half, -1)
        zi_m = jnp.moveaxis(zi, ax_half, -1)
        pad = n1 - m
        # k = m..n-1 maps to conj of k' = n-k in [1, n-m]: reversed slice.
        tr = jnp.flip(zr_m[..., 1 : pad + 1], axis=-1)
        ti = -jnp.flip(zi_m[..., 1 : pad + 1], axis=-1)
        fr = jnp.concatenate([zr_m, tr], axis=-1)
        fi = jnp.concatenate([zi_m, ti], axis=-1)
        out, _ = _cfft_axis(fr, fi, fr.ndim - 1, inverse=True)
        return jnp.moveaxis(out, -1, ax_half)
    cr, ci = (jnp.asarray(b) for b in irdft_basis(n1, m, norm="backward", dtype=str(zr.dtype)))
    out = jnp.moveaxis(zr, ax_half, -1) @ cr + jnp.moveaxis(zi, ax_half, -1) @ ci
    return jnp.moveaxis(out, -1, ax_half)


def rfftn(x: jax.Array, axes, impl: str = "auto") -> jax.Array:
    """Complex-interface ``rfftn``; safe under jit. For eager/model code use
    ``rfftn_pair`` (see its docstring for the axon eager-complex gotcha)."""
    zr, zi = rfftn_pair(x, axes, impl)
    return zr + 1j * zi


def irfftn(z: jax.Array, s, axes, impl: str = "auto") -> jax.Array:
    """Inverse of ``rfftn`` back to a real field of spatial shape `s`."""
    return irfftn_pair(jnp.real(z), jnp.imag(z), s, axes, impl)


def rfft2(x: jax.Array, axes=(-2, -1), impl: str = "auto") -> jax.Array:
    """Real 2D FFT over `axes` (half-spectrum on axes[1]), norm='backward'."""
    return rfftn(x, axes, impl)


def irfft2(z: jax.Array, s, axes=(-2, -1), impl: str = "auto") -> jax.Array:
    """Inverse of ``rfft2`` back to a real field of spatial shape `s`."""
    return irfftn(z, s, axes, impl)


def fftn(z: jax.Array, axes, impl: str = "auto") -> jax.Array:
    if resolve_fourier_impl(impl) == "xla":
        return jnp.fft.fftn(z, axes=axes)
    zr = jnp.real(z).astype(jnp.float32)
    zi = jnp.imag(z).astype(jnp.float32)
    for ax in axes:
        zr, zi = _cfft_axis(zr, zi, ax % z.ndim, inverse=False)
    return zr + 1j * zi


def ifftn(z: jax.Array, axes, impl: str = "auto") -> jax.Array:
    if resolve_fourier_impl(impl) == "xla":
        return jnp.fft.ifftn(z, axes=axes)
    zr = jnp.real(z).astype(jnp.float32)
    zi = jnp.imag(z).astype(jnp.float32)
    for ax in axes:
        zr, zi = _cfft_axis(zr, zi, ax % z.ndim, inverse=True)
    return zr + 1j * zi


def fft2(z: jax.Array, axes=(-2, -1), impl: str = "auto") -> jax.Array:
    return fftn(z, axes, impl)


def ifft2(z: jax.Array, axes=(-2, -1), impl: str = "auto") -> jax.Array:
    return ifftn(z, axes, impl)
