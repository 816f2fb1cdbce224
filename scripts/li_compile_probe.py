"""Time the LI train-step compile at the reference config (CPU or chip).

The round-3 li_ref chip run wedged inside the first train-step compile
(forward-only control rollout compiled fine at 02:17, then the fwd+bwd
compile never returned and the relay stopped answering). This probe times
lower() and compile() separately at several unroll lengths to attribute:
graph-size blowup (slow everywhere) vs axon-compiler hang (CPU fast).

Usage: JAX_PLATFORMS=cpu python scripts/li_compile_probe.py --unrolls 8 32
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", type=int, nargs="+", default=[8, 32])
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--run", action="store_true", help="also execute one step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fourierflow_tpu.routines import LearnedInterpolatorRoutine
    from fourierflow_tpu.routines.base import make_optimizer

    DT_MODEL = 0.007012483601762931
    for unroll in args.unrolls:
        routine = LearnedInterpolatorRoutine(
            size=args.size, dt=DT_MODEL, inner_steps=16, outer_steps=100,
            unroll_length=unroll,
            optimizer=make_optimizer(optimizer=optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(
                    optax.warmup_cosine_decay_schedule(
                        0.0, 1e-3, warmup_steps=500, decay_steps=40000,
                        end_value=0.0),
                    b1=0.9, b2=0.99, weight_decay=1e-4))),
        )
        # batch: (inputs {vx,vy [B,X,Y]}, outputs {vx,vy [B,X,Y,L]})
        rng = np.random.RandomState(0)

        def f(*shape):
            return jnp.asarray(rng.randn(*shape), jnp.float32) * 0.1

        inputs = {"vx": f(args.batch, args.size, args.size),
                  "vy": f(args.batch, args.size, args.size)}
        outputs = {"vx": f(args.batch, args.size, args.size, unroll),
                   "vy": f(args.batch, args.size, args.size, unroll)}
        batch = (inputs, outputs)
        state = routine.init(jax.random.PRNGKey(0), batch)

        t0 = time.perf_counter()
        lowered = jax.jit(routine.train_step).lower(
            state, batch, jax.random.PRNGKey(1))
        t_lower = time.perf_counter() - t0
        hlo_bytes = len(lowered.as_text())
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        print(f"unroll {unroll}: lower {t_lower:.1f}s, HLO {hlo_bytes/1e6:.1f} MB, "
              f"compile {t_compile:.1f}s", flush=True)
        if args.run:
            t0 = time.perf_counter()
            st, metrics = compiled(state, batch, jax.random.PRNGKey(1))
            loss = float(metrics["train_loss"])
            print(f"unroll {unroll}: step ran in {time.perf_counter()-t0:.2f}s "
                  f"loss {loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
