"""Post-hoc LI reference-protocol validation from a saved checkpoint.

The round-3 li_ref chip run was truncated by the round wall-clock; its
per-epoch checkpoints are in artifacts/li_ref. This re-runs the full
reference validation (100 outer snapshots x 16 model steps, staggered
downsample to the 32^2 DNS reference, vorticity correlation rho(t) and
the rho>=0.95 horizon — reference:routines/learned_interpolator.py:124-184)
for a checkpoint, on CPU or chip, and prints the rho(t) table.

Usage:
  JAX_PLATFORMS=cpu python scripts/li_posthoc_eval.py \
      --ckpt artifacts/li_ref/last.ckpt --data-dir /root/data/li_ref
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/li_ref/last.ckpt")
    p.add_argument("--data-dir", default="/root/data/li_ref")
    p.add_argument("--out", default=None)
    p.add_argument("--inner", type=int, default=16)
    p.add_argument("--outer", type=int, default=100)
    args = p.parse_args()

    import jax
    import numpy as np
    import optax

    from fourierflow_tpu.builders import KolmogorovBuilder
    from fourierflow_tpu.builders.kolmogorov import (
        KolmogorovVelocityDataset,
        KolmogorovVelocityTrajectoryDataset,
    )
    from fourierflow_tpu.routines import LearnedInterpolatorRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer
    from fourierflow_tpu.trainers.callbacks import load_state

    DT_MODEL = 0.007012483601762931
    d = args.data_dir
    train_ds = KolmogorovVelocityDataset(
        os.path.join(d, "train_64_1.h5"), k=1, unroll_length=32)
    eval_ds = KolmogorovVelocityTrajectoryDataset(
        init_path=os.path.join(d, "test_init_64.h5"),
        corr_path=os.path.join(d, "test_32_1.h5"),
        k=1, inner_steps=args.inner, outer_steps=args.outer)
    builder = KolmogorovBuilder(train_ds, eval_ds, eval_ds, batch_size=4)
    routine = LearnedInterpolatorRoutine(
        size=64, dt=DT_MODEL, inner_steps=args.inner, outer_steps=args.outer,
        unroll_length=32,
        # Must match the training optimizer exactly: the checkpoint's
        # opt_state pytree is the chained clip+adamw state.
        optimizer=make_optimizer(optimizer=optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    0.0, 1e-3, warmup_steps=500, decay_steps=40000,
                    end_value=0.0),
                b1=0.9, b2=0.99, weight_decay=1e-4))),
    )
    template = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    state = load_state(args.ckpt, template)
    print(f"[ckpt] {args.ckpt}: step {int(state.step)}", flush=True)

    trainer = Trainer(max_epochs=0, data_parallel=False, seed=0)
    t0 = time.time()
    logs = trainer.evaluate(routine, builder, state, split="valid")
    out = {}
    for k, v in logs.items():
        out[k] = (float(v) if np.ndim(v) == 0
                  else [round(float(c), 4) for c in np.asarray(v).ravel()])
    out["eval_wall_s"] = round(time.time() - t0, 1)
    out["ckpt_step"] = int(state.step)
    print(json.dumps({k: v for k, v in out.items()
                      if np.ndim(v) == 0}), flush=True)
    corr = out.get("valid_correlations")
    times = out.get("valid_times")
    if corr and times:
        for i in [0, 4, 9, 19, 39, 69, 99]:
            if i < len(corr):
                print(f"  t={times[i]:.2f}s rho={corr[i]:.4f}", flush=True)
    path = args.out or os.path.join("artifacts/li_ref",
                                    f"posthoc_step{int(state.step)}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[out] {path}", flush=True)


if __name__ == "__main__":
    main()
