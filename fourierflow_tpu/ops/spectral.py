"""Core spectral convolution ops (functional, jit-friendly).

These are the TPU-native equivalents of the reference's torch spectral
layers:

- ``spectral_mix_axis``        <- one branch of the factorized (separable)
  F-FNO layer (reference:fourierflow/modules/factorized_fno/grid_2d.py:51-99)
- ``spectral_lowpass_axis``    <- the 'low-pass' ablation (same file :69-70)
- ``spectral_conv_2d_full``    <- the original FNO full 2D spectral conv
  (reference:fourierflow/modules/zongyi_fno/grid_2d.py:16-77)
- ``dct_mix_axis``             <- the FCNO (DCT) ablation family
  (reference:fourierflow/modules/factorized_cno/grid_2d.py)

Data layout is channels-last ``[batch, *spatial, channels]`` throughout —
channels ride the TPU lane dimension, spatial dims tile the sublanes.

Two interchangeable implementations:

- ``impl='dft'``: truncated-DFT matmuls (see ops/dft.py). All FLOPs land on
  the MXU; the zero-padded spectrum is never materialized. Preferred for
  axis lengths up to ~1024.
- ``impl='fft'``: XLA FFT with mode slicing/padding, mirroring the
  reference computation; used for very long axes and as a golden reference
  in tests.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .dft import dct2_basis, idct2_basis, irdft_basis, rdft_basis

__all__ = [
    "spectral_mix_axis",
    "spectral_lowpass_axis",
    "spectral_conv_2d_full",
    "dct_mix_axis",
    "resolve_impl",
]

# Above this axis length the O(N log N) FFT beats the O(N*M) matmul DFT —
# but only where XLA exposes an FFT at all: the axon TPU backend raises
# UNIMPLEMENTED for fft ops (verified on TPU v5e), so on TPU 'auto' always
# picks the MXU matmul path.
_DFT_MAX_AXIS = 1024


def _default_platform() -> str:
    try:
        return jax.default_backend()
    except RuntimeError:
        return "cpu"


def resolve_impl(impl: str, axis_len: int) -> str:
    if impl == "auto":
        if _default_platform() != "cpu":
            return "dft"
        return "dft" if axis_len <= _DFT_MAX_AXIS else "fft"
    return impl


def _moveaxis_in(x: jax.Array, axis: int):
    """Move spatial `axis` to position -2 (just before channels)."""
    axis = axis % x.ndim
    if axis == x.ndim - 1:
        raise ValueError("last dim is channels; pick a spatial axis")
    return jnp.moveaxis(x, axis, -2)


def spectral_mix_axis(
    x: jax.Array,
    weight: jax.Array,
    axis: int,
    *,
    impl: str = "auto",
    precision: Optional[jax.lax.Precision] = None,
) -> jax.Array:
    """One separable F-FNO branch: rfft along `axis`, per-mode complex
    channel mixing, irfft back — computed as truncated-DFT matmuls.

    Args:
      x: ``[batch, *spatial, in_channels]`` real.
      weight: ``[in, out, modes, 2]`` real/imag pairs (the reference's
        parameterization, grid_2d.py:26, view_as_complex'd at :68).
      axis: which spatial axis to transform.
    Returns:
      ``[batch, *spatial, out_channels]`` real.
    """
    n = x.shape[axis % x.ndim]
    modes = weight.shape[2]
    wr = weight[..., 0]
    wi = weight[..., 1]
    xm = _moveaxis_in(x, axis)  # [..., n, i]
    impl = resolve_impl(impl, n)

    if impl == "dft":
        er, ei = (jnp.asarray(m) for m in rdft_basis(n, modes, dtype=str(x.dtype)))
        xr = jnp.einsum("...ni,nm->...mi", xm, er, precision=precision)
        xi = jnp.einsum("...ni,nm->...mi", xm, ei, precision=precision)
    else:
        xf = jnp.fft.rfft(xm, axis=-2, norm="ortho")[..., :modes, :]
        xr, xi = jnp.real(xf), jnp.imag(xf)

    # Complex channel mixing, split into real matmuls for the MXU.
    yr = jnp.einsum("...mi,iom->...mo", xr, wr, precision=precision) - jnp.einsum(
        "...mi,iom->...mo", xi, wi, precision=precision
    )
    yi = jnp.einsum("...mi,iom->...mo", xr, wi, precision=precision) + jnp.einsum(
        "...mi,iom->...mo", xi, wr, precision=precision
    )

    if impl == "dft":
        cr, ci = (jnp.asarray(m) for m in irdft_basis(n, modes, dtype=str(x.dtype)))
        out = jnp.einsum("...mo,mn->...no", yr, cr, precision=precision) + jnp.einsum(
            "...mo,mn->...no", yi, ci, precision=precision
        )
    else:
        yf = yr + 1j * yi
        pad = [(0, 0)] * yf.ndim
        pad[-2] = (0, n // 2 + 1 - modes)
        yf = jnp.pad(yf, pad)
        out = jnp.fft.irfft(yf, n=n, axis=-2, norm="ortho")

    return jnp.moveaxis(out, -2, axis % x.ndim)


def spectral_lowpass_axis(x: jax.Array, modes: int, axis: int, *, impl: str = "auto") -> jax.Array:
    """The 'low-pass' ablation: truncate to `modes` along `axis` and
    transform back with no learned mixing (grid_2d.py:69-70,87-88)."""
    n = x.shape[axis % x.ndim]
    xm = _moveaxis_in(x, axis)
    impl = resolve_impl(impl, n)
    if impl == "dft":
        er, ei = (jnp.asarray(m) for m in rdft_basis(n, modes, dtype=str(x.dtype)))
        cr, ci = (jnp.asarray(m) for m in irdft_basis(n, modes, dtype=str(x.dtype)))
        xr = jnp.einsum("...ni,nm->...mi", xm, er)
        xi = jnp.einsum("...ni,nm->...mi", xm, ei)
        out = jnp.einsum("...mi,mn->...ni", xr, cr) + jnp.einsum("...mi,mn->...ni", xi, ci)
    else:
        xf = jnp.fft.rfft(xm, axis=-2, norm="ortho")
        mask = (jnp.arange(xf.shape[-2]) < modes)[..., :, None]
        out = jnp.fft.irfft(jnp.where(mask, xf, 0.0), n=n, axis=-2, norm="ortho")
    return jnp.moveaxis(out, -2, axis % x.ndim)


def spectral_conv_2d_full(
    x: jax.Array,
    weight1: jax.Array,
    weight2: jax.Array,
    *,
    norm: str = "backward",
    precision: Optional[jax.lax.Precision] = None,
) -> jax.Array:
    """Original-FNO full 2D spectral conv (Li et al. 2021 reproduction).

    Mirrors reference:fourierflow/modules/zongyi_fno/grid_2d.py:16-77: rfft2,
    complex mixing on the two mode corner blocks (positive and negative x
    frequencies), irfft2. Weights: ``[in, out, m1, m2, 2]``.

    Args:
      x: ``[batch, sx, sy, in_channels]``.
      norm: fft normalization; the reference uses torch defaults
        (='backward').
    """
    b, sx, sy, ci = x.shape
    m1, m2 = weight1.shape[2], weight1.shape[3]
    w1 = weight1[..., 0] + 1j * weight1[..., 1]
    w2 = weight2[..., 0] + 1j * weight2[..., 1]

    xf = jnp.fft.rfft2(x, axes=(1, 2), norm=norm)  # [b, sx, sy//2+1, i]
    top = jnp.einsum("bxyi,ioxy->bxyo", xf[:, :m1, :m2, :], w1, precision=precision)
    bot = jnp.einsum("bxyi,ioxy->bxyo", xf[:, -m1:, :m2, :], w2, precision=precision)

    co = w1.shape[1]
    out_f = jnp.zeros((b, sx, sy // 2 + 1, co), dtype=xf.dtype)
    out_f = out_f.at[:, :m1, :m2, :].set(top)
    out_f = out_f.at[:, -m1:, :m2, :].set(bot)
    return jnp.fft.irfft2(out_f, s=(sx, sy), axes=(1, 2), norm=norm)


def dct_mix_axis(
    x: jax.Array,
    weight: jax.Array,
    axis: int,
    *,
    precision: Optional[jax.lax.Precision] = None,
) -> jax.Array:
    """FCNO branch: DCT-II along `axis`, real per-mode channel mixing,
    inverse DCT (reference:fourierflow/modules/factorized_cno/grid_2d.py:58-80).

    weight: ``[in, out, modes]`` real.
    """
    n = x.shape[axis % x.ndim]
    modes = weight.shape[2]
    xm = _moveaxis_in(x, axis)
    d = jnp.asarray(dct2_basis(n, modes, dtype=str(x.dtype)))
    di = jnp.asarray(idct2_basis(n, modes, dtype=str(x.dtype)))
    xs = jnp.einsum("...ni,nm->...mi", xm, d, precision=precision)
    ys = jnp.einsum("...mi,iom->...mo", xs, weight, precision=precision)
    out = jnp.einsum("...mo,mn->...no", ys, di, precision=precision)
    return jnp.moveaxis(out, -2, axis % x.ndim)
