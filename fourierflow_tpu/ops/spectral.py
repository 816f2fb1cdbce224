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

from .dft import (
    dct2_basis,
    idct2_basis,
    irdft_basis,
    irdft_basis_interleaved,
    rdft_basis,
    rdft_basis_interleaved,
)
from .fourier import irfftn_pair as _irfftn_pair
from .fourier import rfftn_pair as _rfftn_pair

__all__ = [
    "spectral_mix_axis",
    "spectral_mix_dual",
    "spectral_lowpass_axis",
    "spectral_conv_2d_full",
    "spectral_conv_3d_full",
    "dct_mix_axis",
    "permode_cmul",
    "resolve_impl",
]


def permode_cmul(xr, xi, w):
    """Per-mode complex channel mixing as batched real matmuls.

    Computes the reference's ``einsum('bxyi,ioxy->boxy', x, w)`` (and its
    N-D analogues) with the mode dims flattened into the matmul batch
    dimension. The axon TPU backend pathologically compiles dot_generals
    with multiple non-leading batch dims (minutes/hangs, verified on v5e),
    while plain [g, b, i] @ [g, i, o] batched matmuls compile in <1s and
    run on the MXU.

    Args:
      xr, xi: ``[batch, *modes, in]`` real/imag spectrum parts.
      w: ``[in, out, *modes, 2]`` per-mode weights.
    Returns:
      (yr, yi) each ``[batch, *modes, out]``.
    """
    b = xr.shape[0]
    mode_dims = xr.shape[1:-1]
    ci, co = w.shape[0], w.shape[1]
    g = 1
    for m in mode_dims:
        g *= m
    nd = len(mode_dims)

    def x_bm(x):  # [b, *modes, i] -> [g, b, i]
        x = jnp.moveaxis(x, 0, nd)
        return x.reshape(g, b, ci)

    # [i, o, *modes, 2] -> [g, i, o] per part
    wm = jnp.moveaxis(w, (0, 1), (nd, nd + 1)).reshape(g, ci, co, 2)
    wr, wi = wm[..., 0], wm[..., 1]
    xrm, xim = x_bm(xr), x_bm(xi)
    yr = xrm @ wr - xim @ wi
    yi = xrm @ wi + xim @ wr

    def back(y):  # [g, b, o] -> [b, *modes, o]
        return jnp.moveaxis(y.reshape(*mode_dims, b, co), nd, 0)

    return back(yr), back(yi)

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
    weight = weight.astype(x.dtype)  # mixed precision: follow activations
    wr = weight[..., 0]
    wi = weight[..., 1]
    xm = _moveaxis_in(x, axis)  # [..., n, i]
    impl = resolve_impl(impl, n)

    if impl == "dft":
        # Packed complex formulation — three matmuls per branch instead of
        # eight: (1) one truncated-rDFT matmul with the [n, 2M]
        # mode-interleaved real/imag basis; (2) one mode-batched mixing
        # matmul against the real 2Cx2C block form [[Wr, Wi], [-Wi, Wr]]
        # of the complex weights (contraction width 2C fills the 128 MXU
        # lanes at C=64); (3) one inverse matmul with the [2M, n]
        # interleaved basis. Measured 1.66x over the unpacked einsum chain
        # on v5e at flagship shapes; the mode-major interleaving makes the
        # [..., 2M, C] <-> [..., M, 2C] regrouping around the mixing
        # matmul a contiguous reshape instead of a lane concat (an HBM
        # copy each way — a further ~5% on the spectral chain, measured on
        # chip with the 24-layer scan).
        fwd_basis = jnp.asarray(rdft_basis_interleaved(n, modes)).astype(x.dtype)
        inv_basis = jnp.asarray(irdft_basis_interleaved(n, modes)).astype(x.dtype)
        wrm = jnp.moveaxis(wr, 2, 0)  # [M, Ci, Co]
        wim = jnp.moveaxis(wi, 2, 0)
        w_pack = jnp.concatenate(
            [
                jnp.concatenate([wrm, wim], axis=2),
                jnp.concatenate([-wim, wrm], axis=2),
            ],
            axis=1,
        )  # [M, 2Ci, 2Co]

        s = jnp.einsum("...nc,nk->...kc", xm, fwd_basis, precision=precision)
        sp = s.reshape(*s.shape[:-2], modes, 2 * wr.shape[0])  # [..., M, 2Ci]
        yp = jnp.einsum("...mi,mio->...mo", sp, w_pack, precision=precision)
        co = yp.shape[-1] // 2
        y = yp.reshape(*yp.shape[:-2], 2 * modes, co)  # [..., 2M, Co]
        out = jnp.einsum("...kc,kn->...nc", y, inv_basis, precision=precision)
    else:
        xf = jnp.fft.rfft(xm, axis=-2, norm="ortho")[..., :modes, :]
        xr, xi = jnp.real(xf), jnp.imag(xf)
        yr = jnp.einsum("...mi,iom->...mo", xr, wr, precision=precision) - jnp.einsum(
            "...mi,iom->...mo", xi, wi, precision=precision
        )
        yi = jnp.einsum("...mi,iom->...mo", xr, wi, precision=precision) + jnp.einsum(
            "...mi,iom->...mo", xi, wr, precision=precision
        )
        yf = yr + 1j * yi
        pad = [(0, 0)] * yf.ndim
        pad[-2] = (0, n // 2 + 1 - modes)
        yf = jnp.pad(yf, pad)
        out = jnp.fft.irfft(yf, n=n, axis=-2, norm="ortho")

    return jnp.moveaxis(out, -2, axis % x.ndim)


def _pack_weight(w, dtype):
    """[Ci, Co, M, 2] complex pairs -> [M, 2Ci, 2Co] real block form."""
    w = w.astype(dtype)
    wr, wi = jnp.moveaxis(w[..., 0], 2, 0), jnp.moveaxis(w[..., 1], 2, 0)
    return jnp.concatenate(
        [
            jnp.concatenate([wr, wi], axis=2),
            jnp.concatenate([-wi, wr], axis=2),
        ],
        axis=1,
    )


def spectral_mix_dual(
    x: jax.Array,
    wy: jax.Array,
    wx: jax.Array,
    *,
    impl: str = "auto",
) -> jax.Array:
    """Both separable F-FNO branches in one matmul chain (equals
    ``spectral_mix_axis(x, wy, 2) + spectral_mix_axis(x, wx, 1)``).

    Square grids stack the y-branch input (native layout) and the x-branch
    input (spatial transpose) along the leading batch dim, so the
    truncated-rDFT, per-mode mixing, and inverse-DFT matmuls each dispatch
    once at double the rows (the per-branch weights ride the flattened
    (branch, mode) bmm batch, never a multi-batch-dim einsum, which the
    axon compiler mishandles). Non-square grids and the 'fft' impl fall
    back to the two-branch composition.

    Measured trade-off (v5e, flagship shapes): ~1.06x on the isolated mix
    but within noise end-to-end (XLA already overlaps the two branch
    chains), and the [x, x^T] concat forces an involuntary resharding
    under a spatial-sharded mesh — so the models use the two-branch
    composition; this op is the single-chip alternative kept for
    experimentation.
    """
    b, sx, sy, ci = x.shape
    if sx != sy or resolve_impl(impl, sx) != "dft":
        return spectral_mix_axis(x, wy, axis=2, impl=impl) + spectral_mix_axis(
            x, wx, axis=1, impl=impl
        )
    n, modes = sx, wy.shape[2]
    co = wy.shape[1]
    er, ei = (jnp.asarray(m).astype(x.dtype) for m in rdft_basis(n, modes))
    cr, ci_ = (jnp.asarray(m).astype(x.dtype) for m in irdft_basis(n, modes))
    fwd_basis = jnp.concatenate([er, ei], axis=1)  # [n, 2M]
    inv_basis = jnp.concatenate([cr, ci_], axis=0)  # [2M, n]

    xs = jnp.concatenate([x, x.transpose(0, 2, 1, 3)], axis=0)  # [2b, n, n, C]
    s = jnp.einsum("...nc,nk->...kc", xs, fwd_basis)  # [2b, n, 2M, C]
    sp = jnp.concatenate([s[..., :modes, :], s[..., modes:, :]], axis=-1)
    # Flatten (branch, mode) into ONE leading bmm batch (see permode_cmul).
    sp = sp.reshape(2, b * n, modes, 2 * ci)
    sp = jnp.moveaxis(sp, 2, 1).reshape(2 * modes, b * n, 2 * ci)
    w2 = jnp.concatenate([_pack_weight(wy, x.dtype), _pack_weight(wx, x.dtype)])
    yp = sp @ w2  # [2M', rows, 2Co]
    yp = jnp.moveaxis(yp.reshape(2, modes, b * n, 2 * co), 1, 2)
    yp = yp.reshape(2 * b, n, modes, 2 * co)
    y = jnp.concatenate([yp[..., :co], yp[..., co:]], axis=-2)  # [2b, n, 2M, Co]
    out = jnp.einsum("...kc,kn->...nc", y, inv_basis)  # [2b, n, n, Co]
    return out[:b] + out[b:].transpose(0, 2, 1, 3)


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
      norm: accepted for API parity with the reference ('backward' or
        'ortho') but irrelevant to the result: the forward/inverse scale
        factors cancel in the transform->mix->inverse round trip, so both
        normalizations yield identical outputs. We always compute with the
        backward-normalized platform-robust wrappers (ops/fourier.py),
        which use matmul DFTs on TPU where XLA's FFT is unavailable.
    """
    del norm, precision
    b, sx, sy, ci = x.shape
    m1, m2 = weight1.shape[2], weight1.shape[3]

    xr, xi = _rfftn_pair(x, axes=(1, 2))  # [b, sx, sy//2+1, i]
    tr, ti = permode_cmul(xr[:, :m1, :m2, :], xi[:, :m1, :m2, :], weight1)
    br, bi = permode_cmul(xr[:, -m1:, :m2, :], xi[:, -m1:, :m2, :], weight2)

    co = weight1.shape[1]
    out_r = jnp.zeros((b, sx, sy // 2 + 1, co), dtype=x.dtype)
    out_i = jnp.zeros((b, sx, sy // 2 + 1, co), dtype=x.dtype)
    out_r = out_r.at[:, :m1, :m2, :].set(tr).at[:, -m1:, :m2, :].set(br)
    out_i = out_i.at[:, :m1, :m2, :].set(ti).at[:, -m1:, :m2, :].set(bi)
    return _irfftn_pair(out_r, out_i, s=(sx, sy), axes=(1, 2))


def spectral_conv_3d_full(
    x: jax.Array,
    weights,
    *,
    norm: str = "backward",
    precision: Optional[jax.lax.Precision] = None,
) -> jax.Array:
    """Original-FNO full 3D spectral conv (Geo-FNO plasticity baseline).

    Mirrors reference:fourierflow/modules/zongyi_fno/mesh_3d.py:10-56:
    rfftn over the three spatial axes, complex mixing on the four mode
    corner blocks (the sign combinations of the x/y frequencies, with the
    z-axis half-spectrum), irfftn back.

    Args:
      x: ``[batch, sx, sy, sz, in_channels]``.
      weights: sequence of four ``[in, out, m1, m2, m3, 2]`` arrays in the
        reference's corner order (+x+y, -x+y, +x-y, -x-y).
      norm: accepted for parity; irrelevant (scales cancel in the round
        trip — see spectral_conv_2d_full).
    """
    del norm, precision
    b, sx, sy, sz, ci = x.shape
    m1, m2, m3 = weights[0].shape[2:5]
    xr, xi = _rfftn_pair(x, axes=(1, 2, 3))  # [b, sx, sy, sz//2+1, i]

    pos1, neg1 = slice(0, m1), slice(sx - m1, sx)
    pos2, neg2 = slice(0, m2), slice(sy - m2, sy)
    co = weights[0].shape[1]
    out_r = jnp.zeros((b, sx, sy, sz // 2 + 1, co), dtype=x.dtype)
    out_i = jnp.zeros((b, sx, sy, sz // 2 + 1, co), dtype=x.dtype)
    corners = [(pos1, pos2), (neg1, pos2), (pos1, neg2), (neg1, neg2)]
    for w, (sl1, sl2) in zip(weights, corners):
        yr, yi = permode_cmul(xr[:, sl1, sl2, :m3, :], xi[:, sl1, sl2, :m3, :], w)
        out_r = out_r.at[:, sl1, sl2, :m3, :].set(yr)
        out_i = out_i.at[:, sl1, sl2, :m3, :].set(yi)
    return _irfftn_pair(out_r, out_i, s=(sx, sy, sz), axes=(1, 2, 3))


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
