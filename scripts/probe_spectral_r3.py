"""Round-3 on-chip probe: spectral-chain variants vs the bandwidth floor.

Measures the isolated 24-layer dual-branch spectral mixing chain
(fwd-only and fwd+bwd) at flagship shapes (batch 19, 64x64, C=64, M=16,
bf16, shared weights) for several dispatch/layout strategies:

  base      current production path: two spectral_mix_axis branches
  dual_cat  both branches in one matmul chain, [x, x^T] input concat
  dual_spec both branches in one mixing bmm, spectra stacked (no input cat)
  bmm_lead  per-branch chain, mixing as explicit leading-batch bmm
  pallas    the fused Pallas kernel (ops/pallas_spectral.py)

Timing discipline per CLAUDE.md: timed regions end with a real value
fetch; dispatches stay far below the relay's ~1 min kill threshold.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_spectral_r3.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fourierflow_tpu.ops.dft import (
    irdft_basis_interleaved,
    rdft_basis_interleaved,
)
from fourierflow_tpu.ops.spectral import spectral_mix_axis

B, N, C, M, L = 19, 64, 64, 16, 24
DTYPE = jnp.bfloat16


def _pack(w, dtype):
    """[Ci, Co, M, 2] -> [M, 2Ci, 2Co] real block form."""
    w = w.astype(dtype)
    wr, wi = jnp.moveaxis(w[..., 0], 2, 0), jnp.moveaxis(w[..., 1], 2, 0)
    return jnp.concatenate(
        [jnp.concatenate([wr, wi], axis=2), jnp.concatenate([-wi, wr], axis=2)],
        axis=1,
    )


def mix_base(x, wy, wx):
    return spectral_mix_axis(x, wy, axis=2) + spectral_mix_axis(x, wx, axis=1)


FWD_IL = rdft_basis_interleaved(N, M)   # numpy [n, 2M]
INV_IL = irdft_basis_interleaved(N, M)  # numpy [2M, n]


def mix_dual_cat(x, wy, wx):
    """Both branches through one chain; input = concat([x, x^T])."""
    b, n, _, c = x.shape
    fwd = jnp.asarray(FWD_IL).astype(x.dtype)
    inv = jnp.asarray(INV_IL).astype(x.dtype)
    w2 = jnp.concatenate([_pack(wy, x.dtype), _pack(wx, x.dtype)], axis=0)
    xs = jnp.concatenate([x, x.transpose(0, 2, 1, 3)], axis=0)  # [2b,n,n,C]
    s = jnp.einsum("...nc,nk->...kc", xs, fwd)                   # [2b,n,2M,C]
    sp = s.reshape(2, b * n, M, 2 * c)                           # contiguous
    sp = jnp.moveaxis(sp, 2, 1).reshape(2 * M, b * n, 2 * c)
    yp = sp @ w2                                                 # [2M,rows,2C]
    yp = jnp.moveaxis(yp.reshape(2, M, b * n, 2 * c), 1, 2)
    yp = yp.reshape(2 * b, n, 2 * M, c)
    out = jnp.einsum("...kc,kn->...nc", yp, inv)                 # [2b,n,n,C]
    return out[:b] + out[b:].transpose(0, 2, 1, 3)


def mix_dual_spec(x, wy, wx):
    """Branch spectra computed separately, stacked for ONE mixing bmm."""
    b, n, _, c = x.shape
    fwd = jnp.asarray(FWD_IL).astype(x.dtype)
    inv = jnp.asarray(INV_IL).astype(x.dtype)
    w2 = jnp.concatenate([_pack(wy, x.dtype), _pack(wx, x.dtype)], axis=0)
    sy = jnp.einsum("bxnc,nk->bxkc", x, fwd)   # y-branch [b,n,2M,C]
    sx = jnp.einsum("bnyc,nk->bykc", x, fwd)   # x-branch [b,n,2M,C]
    s = jnp.stack([sy, sx], axis=0)            # [2,b,n,2M,C]
    sp = s.reshape(2, b * n, M, 2 * c)
    sp = jnp.moveaxis(sp, 2, 1).reshape(2 * M, b * n, 2 * c)
    yp = sp @ w2
    yp = jnp.moveaxis(yp.reshape(2, M, b * n, 2 * c), 1, 2)
    yp = yp.reshape(2, b, n, 2 * M, c)
    oy = jnp.einsum("bxkc,kn->bxnc", yp[0], inv)
    ox = jnp.einsum("bykc,kn->bync", yp[1], inv)
    return oy + jnp.moveaxis(ox, 1, 2)


def mix_bmm_lead(x, wy, wx):
    """Per-branch chain with the mixing as an explicit leading-batch bmm."""

    def branch(xm, w):  # xm: [b, r, n, c] transform along axis -2
        b, r, n, c = xm.shape
        fwd = jnp.asarray(FWD_IL).astype(xm.dtype)
        inv = jnp.asarray(INV_IL).astype(xm.dtype)
        wp = _pack(w, xm.dtype)                       # [M, 2C, 2C]
        s = jnp.einsum("...nc,nk->...kc", xm, fwd)    # [b,r,2M,C]
        sp = s.reshape(b * r, M, 2 * c)
        sp = jnp.moveaxis(sp, 1, 0)                   # [M, rows, 2C]
        yp = sp @ wp
        yp = jnp.moveaxis(yp, 0, 1).reshape(b, r, 2 * M, c)
        return jnp.einsum("...kc,kn->...nc", yp, inv)

    oy = branch(x, wy)
    ox = jnp.moveaxis(branch(jnp.moveaxis(x, 2, 1), wx), 1, 2)
    return oy + ox


def mix_pallas(x, wy, wx):
    from fourierflow_tpu.ops.pallas_spectral import fused_mix_2d

    return fused_mix_2d(x, wy, wx)


def chain(mix_fn):
    """24 shared-weight layers of mix + residual (the flagship skeleton)."""

    def f(x, wy, wx):
        def body(h, _):
            return h + mix_fn(h, wy, wx), None

        out, _ = jax.lax.scan(body, x, None, length=L)
        return out

    return f


def timeit(fn, args, reps=20):
    out = fn(*args)
    _ = float(jnp.asarray(out, jnp.float32).ravel()[0])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(out, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, N, C), DTYPE)
    wy = jnp.asarray(rng.randn(C, C, M, 2).astype(np.float32) * 0.02)
    wx = jnp.asarray(rng.randn(C, C, M, 2).astype(np.float32) * 0.02)

    variants = {
        "base": mix_base,
        "dual_cat": mix_dual_cat,
        "dual_spec": mix_dual_spec,
        "bmm_lead": mix_bmm_lead,
        "pallas": mix_pallas,
    }

    # numerical agreement (single layer, f32 inputs to reduce noise)
    xf = x.astype(jnp.float32)
    ref = jax.jit(mix_base)(xf, wy, wx)
    for name, fn in variants.items():
        if name == "base":
            continue
        try:
            got = jax.jit(fn)(xf, wy, wx)
            err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
            print(f"agree {name}: rel-max-err {err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"agree {name}: FAILED {type(e).__name__}: {e}")

    results = {}
    for name, fn in variants.items():
        ch = chain(fn)
        try:
            fwd = jax.jit(ch)
            t_f = timeit(fwd, (x, wy, wx))

            def loss(x_, wy_, wx_, _ch=ch):
                return jnp.mean(jnp.square(_ch(x_, wy_, wx_).astype(jnp.float32)))

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_g = timeit(lambda *a: g(*a)[0], (x, wy, wx))
            results[name] = (t_f, t_g)
            print(
                f"{name:10s} fwd {t_f * 1e3 / L:7.3f} ms/layer   "
                f"fwd+bwd {t_g * 1e3 / L:7.3f} ms/layer   "
                f"(chain {t_f * 1e3:.1f} / {t_g * 1e3:.1f} ms)"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED {type(e).__name__}: {e}")

    if "base" in results:
        bf, bg = results["base"]
        for name, (tf_, tg_) in results.items():
            print(f"speedup {name:10s} fwd {bf / tf_:5.2f}x   fwd+bwd {bg / tg_:5.2f}x")


if __name__ == "__main__":
    main()
