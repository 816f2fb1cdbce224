"""Pallas TPU kernel: fused dual-branch F-FNO spectral mixing.

The hot op of the flagship model (one per layer,
reference:fourierflow/modules/factorized_fno/grid_2d.py:51-99) is

    out = irdft_x(W_x . rdft_x(x)) + irdft_y(W_y . rdft_y(x))

As a chain of XLA einsums this makes ~8 HBM round trips per branch
(truncated-DFT matmul, 4 mixing matmuls, inverse-DFT matmul, plus layout
transposes) and runs at ~12 TFLOP/s on v5e. This kernel keeps one batch
element's [X, Y, C] block (1 MB at 64^3 f32) resident in VMEM across both
branches: per grid step it reads x once, writes out once, and runs all
matmuls back-to-back on the MXU.

STATUS: numerically verified (interpret mode; tests/test_pallas_spectral
.py) but the current Mosaic compiler rejects the in-kernel lane-dimension
reshape ``[X, Y, C] -> [X, Y*C]`` ("infer-vector-layout: unsupported shape
cast", jaxlib 0.9 on v5e), and every reformulation that satisfies Mosaic's
layout rules decomposes into per-mode matmuls too small to feed the MXU
(modes=16, C=64). Measured on v5e, the XLA einsum path runs the dual
branch at ~0.35 ms (bf16, batch 19 @ 64^2x64) against a ~0.15 ms roofline,
so the ceiling on this fusion is ~2x on ~40% of the layer; revisit when
Mosaic gains relayout casts. ``make_ffno_mix('auto')`` therefore returns
the XLA path everywhere for now.

Shapes (all static):
  x: [B, X, Y, C]; bases er/ei [N, M] (forward truncated rDFT, ortho),
  cr/ci [M, N] (inverse); weights w{y,x}{r,i}: [M, C, C] (mode-major — the
  model's [C, C, M, 2] layout transposed once outside the kernel).

The op is linear in x, so the custom VJP reuses the same kernel with the
transposed operator (bases swapped+transposed, weights (i,o)-transposed
with the imaginary sign flipped); weight gradients are two einsums over
recomputed spectra (cheap: M=16 rows).

The mixing is per-mode: Y[m] = S[m] @ W[m] over modes m — expressed as a
mode-batched dot_general so every matmul has [X*? , C] x [C, C] MXU shape.
"""

import functools

import jax
import jax.numpy as jnp

from .dft import irdft_basis, rdft_basis

__all__ = ["fused_mix_2d", "make_ffno_mix"]


def _mode_mix(sr, si, wr, wi):
    """Per-mode complex channel mixing: s [M, R, C], w [M, C, C]."""
    def bmm(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    yr = bmm(sr, wr) - bmm(si, wi)
    yi = bmm(sr, wi) + bmm(si, wr)
    return yr, yi


def _mix_kernel(x_ref, er_ref, ei_ref, cr_ref, ci_ref,
                wyr_ref, wyi_ref, wxr_ref, wxi_ref, out_ref):
    x = x_ref[0]  # [X, Y, C]
    X, Y, C = x.shape
    M = er_ref.shape[1]
    er, ei = er_ref[...], ei_ref[...]
    cr, ci = cr_ref[...], ci_ref[...]

    def dotp(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- X branch: contract the leading axis — a pure reshape, no
    # transpose needed: x2 [X, Y*C].
    x2 = x.reshape(X, Y * C)
    sr = dotp(er.T, x2).reshape(M, Y, C)   # [M, Y*C] -> [M, Y, C]
    si = dotp(ei.T, x2).reshape(M, Y, C)
    yr, yi = _mode_mix(sr, si, wxr_ref[...], wxi_ref[...])
    ox = dotp(cr.T, yr.reshape(M, Y * C)) + dotp(ci.T, yi.reshape(M, Y * C))
    ox = ox.reshape(X, Y, C)

    # ---- Y branch: bring Y to the front once, transform, bring back.
    t = x.transpose(1, 0, 2).reshape(Y, X * C)
    sr = dotp(er.T, t).reshape(M, X, C)
    si = dotp(ei.T, t).reshape(M, X, C)
    yr, yi = _mode_mix(sr, si, wyr_ref[...], wyi_ref[...])
    oy = dotp(cr.T, yr.reshape(M, X * C)) + dotp(ci.T, yi.reshape(M, X * C))
    oy = oy.reshape(Y, X, C).transpose(1, 0, 2)

    out_ref[0] = (ox + oy).astype(out_ref.dtype)


def _mix_pallas(x, er, ei, cr, ci, wyr, wyi, wxr, wxi, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, X, Y, C = x.shape
    M = er.shape[1]
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    flops_branch = 2 * M * C * (X * Y) * 2 * 2 + 4 * M * X * C * C * 2
    return pl.pallas_call(
        _mix_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, X, Y, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(er), full(ei), full(cr), full(ci),
            full(wyr), full(wyi), full(wxr), full(wxi),
        ],
        out_specs=pl.BlockSpec((1, X, Y, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=B * 2 * flops_branch,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, er, ei, cr, ci, wyr, wyi, wxr, wxi)


def _spectra(x, er, ei, axis):
    """Truncated forward spectra along one axis (for weight grads)."""
    xm = jnp.moveaxis(x, axis, -2)  # [..., n, c]
    sr = jnp.einsum("...nc,nm->...mc", xm, er)
    si = jnp.einsum("...nc,nm->...mc", xm, ei)
    return sr, si


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mix_2d(x, wy, wx, interpret=False):
    """Fused dual-branch spectral mixing (equals
    ``spectral_mix_axis(x, wy, 2) + spectral_mix_axis(x, wx, 1)``).

    Args:
      x: ``[B, X, Y, C]`` (square spatial dims required: one basis pair).
      wy, wx: ``[C, C, M, 2]`` — the model's parameter layout.
    """
    out, _ = _fused_mix_fwd(x, wy, wx, interpret)
    return out


def _prep(x, wy, wx):
    n = x.shape[1]
    if x.shape[2] != n:
        raise ValueError("fused_mix_2d requires square grids")
    m = wy.shape[2]
    dt = str(x.dtype)
    er, ei = (jnp.asarray(a) for a in rdft_basis(n, m, dtype=dt))
    cr, ci = (jnp.asarray(a) for a in irdft_basis(n, m, dtype=dt))
    # [C, C, M, 2] -> mode-major [M, C, C] per part.
    wyr, wyi = jnp.moveaxis(wy[..., 0], 2, 0), jnp.moveaxis(wy[..., 1], 2, 0)
    wxr, wxi = jnp.moveaxis(wx[..., 0], 2, 0), jnp.moveaxis(wx[..., 1], 2, 0)
    return er, ei, cr, ci, wyr, wyi, wxr, wxi


def _fused_mix_fwd(x, wy, wx, interpret):
    er, ei, cr, ci, wyr, wyi, wxr, wxi = _prep(x, wy, wx)
    out = _mix_pallas(x, er, ei, cr, ci, wyr, wyi, wxr, wxi,
                      interpret=interpret)
    return out, (x, wy, wx)


def _fused_mix_bwd(interpret, res, g):
    x, wy, wx = res
    er, ei, cr, ci, wyr, wyi, wxr, wxi = _prep(x, wy, wx)

    # dx: the adjoint operator — forward bases become (cr^T, ci^T), inverse
    # bases (er^T, ei^T); weights transpose (i, o) and flip the imag sign.
    tw = lambda w: jnp.swapaxes(w, 1, 2)
    dx = _mix_pallas(
        g, cr.T, ci.T, er.T, ei.T,
        tw(wyr), -tw(wyi), tw(wxr), -tw(wxi),
        interpret=interpret,
    )

    # dW: recompute forward spectra of x and backward spectra of g.
    def wgrad(axis, fr_basis):
        sr, si = _spectra(x, er, ei, axis)          # [..., m, c_i]
        gr, gi = _spectra(g, cr.T, ci.T, axis)      # [..., m, c_o]
        dwr = jnp.einsum("...mi,...mo->iom", sr, gr) + jnp.einsum(
            "...mi,...mo->iom", si, gi)
        dwi = jnp.einsum("...mi,...mo->iom", sr, gi) - jnp.einsum(
            "...mi,...mo->iom", si, gr)
        return jnp.stack([dwr, dwi], axis=-1)

    dwy = wgrad(2, None)
    dwx = wgrad(1, None)
    return dx, dwy, dwx


fused_mix_2d.defvjp(_fused_mix_fwd, _fused_mix_bwd)


def make_ffno_mix(use_pallas: str = "auto"):
    """Return the dual-branch mixing fn: the Pallas kernel on TPU, the
    einsum path elsewhere (CPU tests run the reference composition)."""
    from .spectral import spectral_mix_axis

    def jnp_mix(x, wy, wx):
        return spectral_mix_axis(x, wy, axis=2) + spectral_mix_axis(x, wx, axis=1)

    if use_pallas == "always":
        return lambda x, wy, wx: fused_mix_2d(x, wy, wx)
    # 'auto' == 'never' until Mosaic supports the required relayout casts
    # (see module docstring).
    return jnp_mix
