"""Benchmark: F-FNO flagship training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference flagship experiment
(experiments/torus_li/markov/24_layers/config.yaml): 24-layer factorized
FNO, width 64, 16 modes, batch 19 on the 64x64 torus, AdamW + cosine
warmup, full train_step (features + normalizer + fwd + bwd + update).

Baseline: the reference repo stores no absolute throughput numbers
(BASELINE.md). Its training budget is 100k steps in <=48h on a V100
(~0.58 steps/s floor); a PyTorch eager A100 estimate for this model is
~10 steps/s. vs_baseline is reported against that 10 steps/s estimate.
"""

import json
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

BASELINE_STEPS_PER_SEC = 10.0  # estimated torch A100 (see module docstring)


def main():
    batch, n = 19, 64
    model = FNOFactorized2DBlock(
        modes=16,
        width=64,
        input_dim=3,
        n_layers=24,
        share_weight=True,
        factor=4,
        ff_weight_norm=True,
        gain=0.1,
    )
    routine = Grid2DMarkovRoutine(
        model,
        n_steps=10,
        max_accumulations=1000,
        noise_std=0.01,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(0.0025, 500, 100000), weight_decay=1e-4
        ),
    )
    rng = np.random.RandomState(0)
    batch_data = {
        "x": jnp.asarray(rng.randn(batch, n, n, 1).astype(np.float32)),
        "y": jnp.asarray(rng.randn(batch, n, n, 1).astype(np.float32)),
    }
    state = routine.init(jax.random.PRNGKey(0), batch_data)
    state = routine.accumulate_step(state, batch_data)

    train_step = jax.jit(routine.train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    # warmup/compile
    for i in range(3):
        state, metrics = train_step(state, batch_data, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["train_loss"])

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = train_step(state, batch_data, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(metrics["train_loss"])
    elapsed = time.perf_counter() - t0
    steps_per_sec = n_iters / elapsed

    print(
        json.dumps(
            {
                "metric": "ffno24_torus64_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
