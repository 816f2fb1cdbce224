"""Round-3 on-chip probe: where do the flagship step's 18.7 ms go?

Decomposes the full train step (bench.py config) into:
  model_vg     fwd+bwd of the 24-layer model on pre-built features
  model_fwd    fwd only
  featurize    feature build + normalize + noise (routine internals)
  adam         optimizer update + apply on fixed grads
  full         the production train_step (reference composition)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_step_anatomy.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fourierflow_tpu.models import FNOFactorized2DBlock
from fourierflow_tpu.routines import Grid2DMarkovRoutine
from fourierflow_tpu.routines.base import make_optimizer
from fourierflow_tpu.schedulers import cosine_with_warmup

B, N = 19, 64


def timeit(fn, args, reps=30):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices())
    model = FNOFactorized2DBlock(
        modes=16, width=64, input_dim=3, n_layers=24, share_weight=True,
        factor=4, ff_weight_norm=True, gain=0.1, dtype=jnp.bfloat16,
    )
    routine = Grid2DMarkovRoutine(
        model, n_steps=10, max_accumulations=1000, noise_std=0.01,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(0.0025, 500, 100000), weight_decay=1e-4
        ),
    )
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.randn(B, N, N, 1).astype(np.float32)),
        "y": jnp.asarray(rng.randn(B, N, N, 1).astype(np.float32)),
    }
    state = routine.init(jax.random.PRNGKey(0), batch)
    state = routine.accumulate_step(state, batch)
    key = jax.random.PRNGKey(1)

    # full production step
    step = jax.jit(routine.train_step)
    t_full = timeit(lambda s, b, k: step(s, b, k)[0].params, (state, batch, key))
    print(f"full train_step        {t_full * 1e3:7.2f} ms")

    # featurize (build features + normalize + noise), as in train_step
    from fourierflow_tpu.layers import normalizer_accumulate, normalizer_apply

    def feat(s, b, k):
        x = routine.build_features(b["x"], b.get("f"), b.get("mu"))
        norm = normalizer_accumulate(s.normalizer, x)
        x = normalizer_apply(norm, x)
        return x + routine.noise_std * jax.random.normal(k, x.shape, x.dtype)

    try:
        jfeat = jax.jit(feat)
        t_feat = timeit(jfeat, (state, batch, key))
        print(f"featurize              {t_feat * 1e3:7.2f} ms")
        x_feat = jfeat(state, batch, key)
    except Exception as e:  # noqa: BLE001
        print("featurize probe failed:", type(e).__name__, e)
        x_feat = None

    if x_feat is not None:
        xin = x_feat[0] if isinstance(x_feat, tuple) else x_feat
        y = batch["y"]

        def loss_fn(params, x_, y_):
            out = model.apply(params, x_)
            fc = out["forecast"]
            d = fc - y_
            return jnp.sqrt(jnp.mean(jnp.square(d))) / (
                jnp.sqrt(jnp.mean(jnp.square(y_))) + 1e-9
            )

        fwd = jax.jit(lambda p, x_, y_: loss_fn(p, x_, y_))
        t_fwd = timeit(fwd, (state.params, xin, y))
        print(f"model fwd              {t_fwd * 1e3:7.2f} ms")

        vg = jax.jit(jax.value_and_grad(loss_fn))
        t_vg = timeit(lambda p, x_, y_: vg(p, x_, y_)[1], (state.params, xin, y))
        print(f"model fwd+bwd          {t_vg * 1e3:7.2f} ms")

        grads = vg(state.params, xin, y)[1]

        opt = routine.optimizer

        def adam(opt_state, params, g):
            updates, new_opt = opt.update(g, opt_state, params)
            import optax

            return optax.apply_updates(params, updates), new_opt

        jadam = jax.jit(adam)
        t_adam = timeit(
            lambda os_, p, g: jadam(os_, p, g)[0], (state.opt_state, state.params, grads)
        )
        print(f"adam update            {t_adam * 1e3:7.2f} ms")

        print(
            f"sum feat+vg+adam       "
            f"{(t_feat + t_vg + t_adam) * 1e3:7.2f} ms (vs full {t_full * 1e3:.2f})"
        )


if __name__ == "__main__":
    main()
