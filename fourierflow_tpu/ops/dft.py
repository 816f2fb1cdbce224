"""Truncated real-DFT bases as dense matrices.

TPU-first design note: the reference implements its spectral layers as
``rfft -> slice modes -> complex einsum -> zero-pad -> irfft``
(reference:fourierflow/modules/factorized_fno/grid_2d.py:51-99). On TPU the
FFT is a poor fit for small/medium grids (it runs on the VPU with awkward
layouts), while a truncated DFT is just a pair of skinny real matmuls that
map straight onto the MXU and never materialize the zero-padded spectrum.
For an axis of length N truncated to M modes the forward transform is
``x @ (Er + i*Ei)`` with ``Er/Ei: [N, M]`` and the inverse (of a spectrum
that is zero beyond mode M) is ``Yr @ Cr + Yi @ Ci`` with ``Cr/Ci: [M, N]``.

All matrices use the *orthonormal* convention (matching ``norm='ortho'`` in
the reference) unless ``norm='backward'`` is requested.
"""

import functools

import numpy as np

__all__ = [
    "rdft_basis",
    "irdft_basis",
    "cdft_basis",
    "dct2_basis",
    "idct2_basis",
    "dct",
    "idct",
    "dct_2d",
    "idct_2d",
    "dct_3d",
    "idct_3d",
]


@functools.lru_cache(maxsize=128)
def rdft_basis(n: int, modes: int, norm: str = "ortho", dtype: str = "float32"):
    """Forward truncated real-DFT matrices.

    Returns ``(Er, Ei)``, each ``[n, modes]``, such that for a real signal
    ``x: [..., n]`` the first ``modes`` rfft coefficients are
    ``X = x @ Er + 1j * (x @ Ei)``.
    """
    if modes > n // 2 + 1:
        raise ValueError(f"modes={modes} exceeds n//2+1={n // 2 + 1}")
    k = np.arange(modes)[None, :]
    t = np.arange(n)[:, None]
    ang = 2.0 * np.pi * t * k / n
    scale = {"ortho": 1.0 / np.sqrt(n), "backward": 1.0, "forward": 1.0 / n}[norm]
    er = np.cos(ang) * scale
    ei = -np.sin(ang) * scale
    return er.astype(dtype), ei.astype(dtype)


@functools.lru_cache(maxsize=128)
def irdft_basis(n: int, modes: int, norm: str = "ortho", dtype: str = "float32"):
    """Inverse truncated real-DFT matrices.

    Returns ``(Cr, Ci)``, each ``[modes, n]``, such that for a truncated
    spectrum ``Y = Yr + 1j*Yi`` (zero for k >= modes) the length-``n``
    inverse rfft is ``Yr @ Cr + Yi @ Ci``. Hermitian symmetry is folded in:
    mode 0 (and the Nyquist mode, if included) get weight 1, all others 2.
    """
    if modes > n // 2 + 1:
        raise ValueError(f"modes={modes} exceeds n//2+1={n // 2 + 1}")
    k = np.arange(modes)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    c = np.full((modes, 1), 2.0)
    c[0] = 1.0
    if n % 2 == 0 and modes == n // 2 + 1:
        c[-1] = 1.0
    scale = {"ortho": 1.0 / np.sqrt(n), "backward": 1.0 / n, "forward": 1.0}[norm]
    cr = c * np.cos(ang) * scale
    ci = -c * np.sin(ang) * scale
    return cr.astype(dtype), ci.astype(dtype)


@functools.lru_cache(maxsize=128)
def rdft_basis_interleaved(n: int, modes: int, norm: str = "ortho",
                           dtype: str = "float32"):
    """``[n, 2*modes]`` forward basis with columns mode-major interleaved:
    column 2m is Re of mode m, column 2m+1 is Im.

    With this ordering, regrouping the spectrum ``[..., 2M, C]`` into the
    per-mode packed form ``[..., M, 2C]`` (real block then imag block per
    mode, as the 2Cx2C block weights expect) is a CONTIGUOUS reshape —
    with the block ordering of :func:`rdft_basis` it is a lane concat,
    i.e. a real HBM copy on TPU."""
    er, ei = rdft_basis(n, modes, norm=norm, dtype=dtype)
    out = np.empty((n, 2 * modes), dtype)
    out[:, 0::2] = er
    out[:, 1::2] = ei
    return out


@functools.lru_cache(maxsize=128)
def irdft_basis_interleaved(n: int, modes: int, norm: str = "ortho",
                            dtype: str = "float32"):
    """``[2*modes, n]`` inverse basis with rows mode-major interleaved
    (row 2m = Re weights of mode m, row 2m+1 = Im); the dual of
    :func:`rdft_basis_interleaved`."""
    cr, ci = irdft_basis(n, modes, norm=norm, dtype=dtype)
    out = np.empty((2 * modes, n), dtype)
    out[0::2] = cr
    out[1::2] = ci
    return out


@functools.lru_cache(maxsize=128)
def cdft_basis(n: int, inverse: bool = False, dtype: str = "float32"):
    """Full complex-DFT matrices ``(Fr, Fi)``, each ``[n, n]``, such that
    for complex z the (i)fft along an axis is ``z @ (Fr + i*Fi)``.
    Forward uses norm='backward' (scale 1); inverse scales by 1/n."""
    k = np.arange(n)[None, :]
    t = np.arange(n)[:, None]
    ang = 2.0 * np.pi * t * k / n
    if inverse:
        fr = np.cos(ang) / n
        fi = np.sin(ang) / n
    else:
        fr = np.cos(ang)
        fi = -np.sin(ang)
    return fr.astype(dtype), fi.astype(dtype)


@functools.lru_cache(maxsize=128)
def dct2_basis(n: int, modes: int, norm: str = "ortho", dtype: str = "float32"):
    """Truncated DCT-II matrix ``[n, modes]``: ``X = x @ D``.

    DCT-II: X_k = s_k * sum_t x_t cos(pi*(2t+1)*k/(2n)), with the usual
    orthonormal scaling (s_0 = sqrt(1/(4n))*2, s_k = sqrt(1/(2n))*2 under
    'ortho'; matching scipy.fft.dct(type=2, norm='ortho')).
    """
    if modes > n:
        raise ValueError(f"modes={modes} exceeds n={n}")
    k = np.arange(modes)[None, :]
    t = np.arange(n)[:, None]
    d = 2.0 * np.cos(np.pi * (2 * t + 1) * k / (2 * n))
    if norm == "ortho":
        s = np.full((1, modes), np.sqrt(1.0 / (2 * n)))
        s[0, 0] = np.sqrt(1.0 / (4 * n))
        d = d * s
    return d.astype(dtype)


@functools.lru_cache(maxsize=128)
def idct2_basis(n: int, modes: int, norm: str = "ortho", dtype: str = "float32"):
    """Inverse of the (orthonormal) DCT-II for a mode-truncated spectrum.

    Returns ``[modes, n]`` with ``x = X @ Dinv``; exact when the dropped
    modes are zero (the orthonormal DCT-II inverse is its transpose).
    """
    return dct2_basis(n, modes, norm=norm, dtype=dtype).T.copy()


def dct(x, axis: int = -1, norm: str = "ortho"):
    """DCT-II along ``axis`` via the basis matmul (user-facing equivalent
    of reference:fourierflow/modules/dct.py:16-60, which uses FFT tricks;
    on TPU a dense matmul is both simpler and MXU-native)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    d, _ = dct2_basis(n, n, norm=norm), None
    xm = jnp.moveaxis(x, axis, -1)
    out = xm @ jnp.asarray(d).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def idct(x, axis: int = -1, norm: str = "ortho"):
    """Inverse DCT-II (DCT-III) along ``axis``
    (reference modules/dct.py:63-106)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    di = idct2_basis(n, n, norm=norm)
    xm = jnp.moveaxis(x, axis, -1)
    out = xm @ jnp.asarray(di).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def dct_2d(x, norm: str = "ortho"):
    """Separable 2D DCT-II over the trailing two axes (modules/dct.py:109-117)."""
    return dct(dct(x, axis=-1, norm=norm), axis=-2, norm=norm)


def idct_2d(x, norm: str = "ortho"):
    return idct(idct(x, axis=-1, norm=norm), axis=-2, norm=norm)


def dct_3d(x, norm: str = "ortho"):
    """Separable 3D DCT-II over the trailing three axes (modules/dct.py:120-131)."""
    return dct(dct_2d(x, norm=norm), axis=-3, norm=norm)


def idct_3d(x, norm: str = "ortho"):
    return idct(idct_2d(x, norm=norm), axis=-3, norm=norm)
