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

Custom VJP: residuals are just (x, w1, b1, w2). The backward pass is a
second fused kernel gridded over row blocks: it recomputes the hidden
activations from x in VMEM, computes dh = (g @ w2^T) * relu'(pre) without
ever materializing pre/h/dh in HBM, writes dx per block, and accumulates
the weight/bias gradients in f32 VMEM buffers across the (sequential) TPU
grid. Unfused, the [rows, 4C] intermediates cost ~5 HBM round trips in
backward — the dominant memory traffic of the flagship train step.
``fused_ff(..., fuse_bwd=False)`` keeps the XLA-dots backward instead.
"""

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["fused_ff"]

# Row-block sizes (tunable for benchmarking; defaults are the best
# measured on v5e at flagship shapes).
_FWD_BLOCK = int(os.environ.get("FOURIERFLOW_FF_FWD_BLOCK", "1024"))
_BWD_BLOCK = int(os.environ.get("FOURIERFLOW_FF_BWD_BLOCK", "2048"))


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


def _make_bwd_kernel():
    from jax.experimental import pallas as pl

    def kernel(x_ref, g_ref, w1_ref, b1_ref, w2t_ref, w1t_ref,
               dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)

        x = x_ref[...]           # [R, Cin]
        gg = g_ref[...]          # [R, Cout]

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def dot_t(a, b):  # contract over rows: [R, M] x [R, N] -> [M, N]
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        pre = dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
        h = jnp.maximum(pre, 0.0).astype(x.dtype)          # [R, H]
        dh = dot(gg, w2t_ref[...]) * (pre > 0)             # [R, H] f32
        dh = dh.astype(x.dtype)
        dx_ref[...] = dot(dh, w1t_ref[...]).astype(dx_ref.dtype)
        dw1_ref[...] += dot_t(x, dh)
        db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True,
                                dtype=jnp.float32)
        dw2_ref[...] += dot_t(h, gg)
        db2_ref[...] += jnp.sum(gg, axis=0, keepdims=True,
                                dtype=jnp.float32)

    return kernel


def _ff_bwd_pallas(x2d, g2d, w1, b1, w2, *, block_rows, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cin = x2d.shape
    hidden, cout = w1.shape[1], w2.shape[1]
    grid = (pl.cdiv(rows, block_rows),)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    w2t = w2.T
    w1t = w1.T
    return pl.pallas_call(
        _make_bwd_kernel(),
        out_shape=(
            jax.ShapeDtypeStruct((rows, cin), x2d.dtype),      # dx
            jax.ShapeDtypeStruct((cin, hidden), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),    # db1
            jax.ShapeDtypeStruct((hidden, cout), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, cout), jnp.float32),      # db2
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(w1), full(b1), full(w2t), full(w1t),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            acc((cin, hidden)), acc((1, hidden)),
            acc((hidden, cout)), acc((1, cout)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * rows * cin * hidden + 4 * rows * hidden * cout,
            bytes_accessed=(2 * rows * (cin + cout)) * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, g2d, w1, b1, w2t, w1t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ff(x, w1, b1, w2, b2, interpret=False, fuse_bwd=True):
    """``relu(x @ w1 + b1) @ w2 + b2`` with the hidden activations kept in
    VMEM. ``x``: [..., C_in]; weights are plain dense (apply weight-norm
    reparameterization before calling)."""
    out, _ = _ff_fwd(x, w1, b1, w2, b2, interpret, fuse_bwd)
    return out


def _ff_fwd(x, w1, b1, w2, b2, interpret, fuse_bwd):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    rows = x2d.shape[0]
    block = min(_FWD_BLOCK, rows)
    pad = (-rows) % block
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = _ff_pallas(x2d, w1, b1, w2, b2, block_rows=block, interpret=interpret)
    if pad:
        out = out[:rows]
    out = out.reshape(*shape[:-1], w2.shape[1])
    return out, (x, w1, b1, w2, b2)


def _ff_bwd(interpret, fuse_bwd, res, g):
    x, w1, b1, w2, b2 = res
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    if fuse_bwd:
        rows = x2d.shape[0]
        block = min(_BWD_BLOCK, rows)
        pad = (-rows) % block
        if pad:
            # Zero-padded rows are exact no-ops: g=0 kills dh and every
            # gradient contribution; the padded dx rows are sliced off.
            x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
            g2d = jnp.pad(g2d, ((0, pad), (0, 0)))
        dx2, dw1, db1, dw2, db2 = _ff_bwd_pallas(
            x2d, g2d, w1, b1, w2, block_rows=block, interpret=interpret)
        if pad:
            dx2 = dx2[:rows]
        dx = dx2.reshape(shape)
        return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
                dw2.astype(w2.dtype), db2[0].astype(b2.dtype))
    # Unfused fallback: recompute the (cheap) pre-activation; standard MLP
    # backward as XLA dots.
    pre = x2d @ w1 + b1
    h = jnp.maximum(pre, 0.0)
    dh = (g2d @ w2.T) * (pre > 0).astype(g2d.dtype)
    dx = (dh @ w1.T).reshape(shape)
    dw1 = x2d.T @ dh
    db1 = dh.sum(axis=0)
    dw2 = h.T @ g2d
    db2 = g2d.sum(axis=0).astype(b2.dtype)
    return dx, dw1, db1.astype(b1.dtype), dw2, db2


fused_ff.defvjp(_ff_fwd, _ff_bwd)
