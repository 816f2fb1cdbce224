"""Pallas TPU kernel: fused 2-layer feed-forward (matmul-ReLU-matmul).

The F-FNO backcast feed-forward (reference:fourierflow/modules/
feedforward.py, factor 4) expands channels C -> 4C -> C. As two XLA dots
the [rows, 4C] intermediate makes an HBM round trip (~80 MB f32 at the
flagship shapes) between them; this kernel tiles the rows and keeps the
intermediate in VMEM. Weight-norm is applied outside the kernel (the
effective g*v/||v|| kernels are tiny) so the kernel sees plain dense
weights.

All in-kernel ops are 2D matmuls + elementwise — no reshapes across the
lane dim, so this compiles with today's Mosaic (unlike the spectral-mix
fusion; see pallas_spectral.py).

Custom VJP: residuals are just (x, w1, b1, w2); the backward pass
recomputes the (cheap) first matmul and runs standard MLP gradients as
XLA dots — the fusion win is forward-only by design, which also keeps the
backward numerically identical to autodiff.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_ff"]


def _ff_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[...], 0.0).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = (y + b2_ref[...]).astype(out_ref.dtype)


def _ff_pallas(x2d, w1, b1, w2, b2, *, block_rows=512, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cin = x2d.shape
    hidden, cout = w1.shape[1], w2.shape[1]
    grid = (pl.cdiv(rows, block_rows),)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ff_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cout), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(w1), full(b1), full(w2), full(b2),
        ],
        out_specs=pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * cin * hidden + 2 * rows * hidden * cout,
            bytes_accessed=(rows * (cin + cout)) * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ff(x, w1, b1, w2, b2, interpret=False):
    """``relu(x @ w1 + b1) @ w2 + b2`` with the hidden activations kept in
    VMEM. ``x``: [..., C_in]; weights are plain dense (apply weight-norm
    reparameterization before calling)."""
    out, _ = _ff_fwd(x, w1, b1, w2, b2, interpret)
    return out


def _ff_fwd(x, w1, b1, w2, b2, interpret):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    rows = x2d.shape[0]
    block = min(512, rows)
    pad = (-rows) % block
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = _ff_pallas(x2d, w1, b1, w2, b2, block_rows=block, interpret=interpret)
    if pad:
        out = out[:rows]
    out = out.reshape(*shape[:-1], w2.shape[1])
    return out, (x, w1, b1, w2)


def _ff_bwd(interpret, res, g):
    x, w1, b1, w2 = res
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    # Recompute the (cheap) pre-activation; standard MLP backward as XLA
    # dots — these are large well-shaped matmuls XLA runs at peak.
    pre = x2d @ w1 + b1
    h = jnp.maximum(pre, 0.0)
    dh = (g2d @ w2.T) * (pre > 0).astype(g2d.dtype)
    dx = (dh @ w1.T).reshape(shape)
    dw1 = x2d.T @ dh
    db1 = dh.sum(axis=0)
    dw2 = h.T @ g2d
    db2 = g2d.sum(axis=0)
    return dx, dw1, db1, dw2, db2


fused_ff.defvjp(_ff_fwd, _ff_bwd)
