"""Pallas TPU kernel: fused dual-branch F-FNO spectral mixing.

The hot op of the flagship model (one per layer,
reference:fourierflow/modules/factorized_fno/grid_2d.py:51-99) is

    out = irdft_x(W_x . rdft_x(x)) + irdft_y(W_y . rdft_y(x))

As a chain of XLA einsums this makes ~8 HBM round trips per branch
(truncated-DFT matmul, mixing matmuls, inverse-DFT matmul, plus layout
transposes); measured on v5e it is ~64% of the flagship train step. This
kernel keeps one batch element's [X, Y, C] block (512 KB bf16 at 64^2x64)
resident in VMEM across both branches: per grid step it reads x once,
writes out once, and runs all matmuls back-to-back on the MXU.

Mosaic (axon v5e, jaxlib 0.9) rejects lane-merging reshapes
([X, Y, C] -> [X, Y*C]), dot_generals with 3D non-batch operands, and
concats of lane-sliced (offset) operands, so the kernel uses only
on-chip-probed forms: leading-batch bmms, (1,0,2) transposes,
leading-dim slices/concats, and broadcast_to feeding a bmm. Per branch:

  1. s      = bmm(E[2M,n] broadcast over rows, x[X, Y, C]) -> [X, 2M, C]
  2. sr, si = leading-dim split of s^T(1,0,2)              -> [M, X, C] x2
  3. yr, yi = 4 bmms against Wr/Wi [M, C, C]               -> [M, X, C] x2
  4. ys     = leading-dim concat, ^T(1,0,2)                -> [X, 2M, C]
  5. o      = bmm(CI[n,2M] broadcast over rows, ys)        -> [X, Y, C]

The x-branch runs the same pipeline on x^T(1,0,2) and transposes back.

STATUS: compiles and matches on the real chip (values and custom VJP at
bf16 tolerance) — the historical Mosaic blocker is solved — but measured
SLOWER than the XLA einsum chain at flagship shapes (fwd 0.63 vs 0.49 ms,
fwd+bwd 0.99 vs 0.82 ms, bf16 batch 19 @ 64^2x64): every matmul the
layout rules allow is at most [64, 64] x [64, 64], filling a quarter of
the 128x128 MXU, while XLA reshapes freely in HBM and runs larger fused
matmuls. The factorized mix is latency-bound at these shapes, not
bandwidth-bound, so VMEM residency does not pay. `make_ffno_mix('auto')`
therefore returns the XLA path; the kernel is kept compiling + tested as
the starting point for when Mosaic gains lane-merging relayouts (which
would re-enable the [rows, 2C]-packed big-matmul form).

The op is linear in x, so the custom VJP reuses the same kernel with the
transposed operator (bases swapped+transposed, weights (i,o)-transposed
with the imaginary sign flipped); weight gradients are two einsums over
recomputed spectra (cheap: M=16 rows).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dft import irdft_basis, rdft_basis

__all__ = ["fused_mix_2d", "make_ffno_mix"]


def _branch(x, eb, cb, wr, wi, modes):
    """One separable branch on [R, n, C] with batched-bmm DFTs.

    x: [R, n, C]; eb: [R, 2M, n]; cb: [R, n, 2M]; wr/wi: [M, C, C].
    All slices/concats act on the LEADING dim of rank-3 operands — layouts
    tile the trailing (sublane, lane) dims, so leading-dim ops carry no
    offset and sidestep Mosaic's "offset mismatch on non-concat dimension"
    limitation (lane-sliced operands cannot be concatenated).
    """

    def bmm(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    s = bmm(eb, x).astype(x.dtype)                      # [R, 2M, C]
    st = s.transpose(1, 0, 2)                           # [2M, R, C]
    sr, si = st[:modes], st[modes:]                     # leading-dim slices
    yr = bmm(sr, wr) - bmm(si, wi)                      # [M, R, C] f32
    yi = bmm(sr, wi) + bmm(si, wr)
    ys = jnp.concatenate([yr, yi], axis=0).astype(x.dtype)  # [2M, R, C]
    return bmm(cb, ys.transpose(1, 0, 2))               # [R, n, C] f32


def _make_mix_kernel(modes):
    def kernel(x_ref, e_ref, ci_ref, wyr_ref, wyi_ref, wxr_ref, wxi_ref,
               out_ref):
        x = x_ref[0]              # [X, Y, C] (one batch element per step)
        n = x.shape[0]
        e = e_ref[...]            # [2M, n]
        ci = ci_ref[...]          # [n, 2M]
        eb = jnp.broadcast_to(e[None], (n, e.shape[0], e.shape[1]))
        cb = jnp.broadcast_to(ci[None], (n, ci.shape[0], ci.shape[1]))

        oy = _branch(x, eb, cb, wyr_ref[...], wyi_ref[...], modes)
        xt = x.transpose(1, 0, 2)
        ox = _branch(xt, eb, cb, wxr_ref[...], wxi_ref[...], modes)
        out = oy + ox.transpose(1, 0, 2)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _mix_pallas(x, e, ci, wy4, wx4, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, X, Y, C = x.shape
    M = wy4[0].shape[0]
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    flops_branch = (X * 2 * M * Y * C + 4 * M * X * C * C + X * Y * 2 * M * C) * 2
    return pl.pallas_call(
        _make_mix_kernel(M),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, X, Y, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(e), full(ci),
            full(wy4[0]), full(wy4[1]), full(wx4[0]), full(wx4[1]),
        ],
        out_specs=pl.BlockSpec((1, X, Y, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=B * 2 * flops_branch,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, e, ci, wy4[0], wy4[1], wx4[0], wx4[1])


def _mode_major(w, dtype):
    """[Ci, Co, M, 2] complex pairs -> ([M, Ci, Co] real, [M, Ci, Co] imag)."""
    w = w.astype(dtype)
    return jnp.moveaxis(w[..., 0], 2, 0), jnp.moveaxis(w[..., 1], 2, 0)


def _spectra(x, er, ei, axis):
    """Truncated forward spectra along one axis (for weight grads)."""
    xm = jnp.moveaxis(x, axis, -2)  # [..., n, c]
    sr = jnp.einsum("...nc,nm->...mc", xm, er)
    si = jnp.einsum("...nc,nm->...mc", xm, ei)
    return sr, si


def _bases(n, m, dtype):
    er, ei = rdft_basis(n, m)    # numpy [n, M] each
    cr, ci = irdft_basis(n, m)   # numpy [M, n] each
    e = np.concatenate([er.T, ei.T], axis=0)   # [2M, n]
    c = np.concatenate([cr, ci], axis=0).T     # [n, 2M]
    return jnp.asarray(e.astype(dtype)), jnp.asarray(c.astype(dtype))


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
    dt = np.dtype(str(x.dtype))
    e, ci = _bases(n, m, dt)
    return e, ci, _mode_major(wy, x.dtype), _mode_major(wx, x.dtype)


def _fused_mix_fwd(x, wy, wx, interpret):
    e, ci, wy4, wx4 = _prep(x, wy, wx)
    out = _mix_pallas(x, e, ci, wy4, wx4, interpret=interpret)
    return out, (x, wy, wx)


def _fused_mix_bwd(interpret, res, g):
    x, wy, wx = res
    e, ci, wy4, wx4 = _prep(x, wy, wx)

    # dx: the adjoint operator — forward basis becomes CI^T, inverse E^T;
    # weights (i, o)-transposed with the imaginary sign flipped (the
    # conjugate transpose of the complex mode weights).
    adj = lambda w4: (jnp.swapaxes(w4[0], 1, 2), -jnp.swapaxes(w4[1], 1, 2))
    dx = _mix_pallas(
        g.astype(x.dtype), ci.T, e.T, adj(wy4), adj(wx4), interpret=interpret
    )

    # dW: recompute forward spectra of x and backward spectra of g (XLA
    # einsums; M=16 rows — cheap).
    n, m = x.shape[1], wy.shape[2]
    ern, ein = rdft_basis(n, m)
    crn, cin_ = irdft_basis(n, m)
    er = jnp.asarray(ern.astype(np.dtype(str(x.dtype))))
    ei = jnp.asarray(ein.astype(np.dtype(str(x.dtype))))
    crt = jnp.asarray(crn.T.astype(np.dtype(str(x.dtype))))
    cit = jnp.asarray(cin_.T.astype(np.dtype(str(x.dtype))))

    def wgrad(axis):
        sr, si = _spectra(x, er, ei, axis)            # [..., m, c_i]
        gr, gi = _spectra(g.astype(x.dtype), crt, cit, axis)  # [..., m, c_o]
        dwr = jnp.einsum("...mi,...mo->iom", sr, gr) + jnp.einsum(
            "...mi,...mo->iom", si, gi)
        dwi = jnp.einsum("...mi,...mo->iom", sr, gi) - jnp.einsum(
            "...mi,...mo->iom", si, gr)
        return jnp.stack([dwr, dwi], axis=-1)

    dwy = wgrad(2).astype(wy.dtype)
    dwx = wgrad(1).astype(wx.dtype)
    return dx.astype(x.dtype), dwy, dwx


fused_mix_2d.defvjp(_fused_mix_fwd, _fused_mix_bwd)


def make_ffno_mix(use_pallas: str = "auto"):
    """Return the dual-branch mixing fn: the fused Pallas kernel on TPU
    (square grids), the einsum composition elsewhere."""
    from .spectral import spectral_mix_axis

    def jnp_mix(x, wy, wx):
        return spectral_mix_axis(x, wy, axis=2) + spectral_mix_axis(x, wx, axis=1)

    if use_pallas == "always":
        return lambda x, wy, wx: fused_mix_2d(x, wy, wx)
    # 'auto' == 'never': the kernel compiles on today's Mosaic but the
    # layout rules cap it below the XLA chain (see module docstring).
    return jnp_mix
