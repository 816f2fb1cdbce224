"""Round-3 on-chip probe: does per-layer remat fix the batch-76 cliff?

RESULTS' batch-scaling table shows samples/s dropping 36% below the
plateau at batch 76 (64², 24-layer bf16). This probe re-measures batch
38/76 with remat on and off to decide the Trainer's auto-remat trigger:
if the cliff is saved-activation memory, remat restores throughput; if
it isn't, the trigger should fire only on the compile-OOM boundary.

batch 152 is deliberately NOT probed: a previous batch-152 run completed
and then wedged the relay (verify skill, near-capacity warning).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_remat_cliff.py
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

N = 64


def run(batch, remat, n_steps=40):
    model = FNOFactorized2DBlock(
        modes=16, width=64, input_dim=3, n_layers=24, share_weight=True,
        factor=4, ff_weight_norm=True, gain=0.1, dtype=jnp.bfloat16,
        remat=remat,
    )
    routine = Grid2DMarkovRoutine(
        model, n_steps=10, max_accumulations=1000, noise_std=0.01,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(0.0025, 500, 100000), weight_decay=1e-4
        ),
    )
    rng = np.random.RandomState(0)
    batch_data = {
        "x": jnp.asarray(rng.randn(batch, N, N, 1).astype(np.float32)),
        "y": jnp.asarray(rng.randn(batch, N, N, 1).astype(np.float32)),
    }
    state = routine.init(jax.random.PRNGKey(0), batch_data)
    state = routine.accumulate_step(state, batch_data)
    step = jax.jit(routine.train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    state, m = step(state, batch_data, key)
    _ = float(m["train_loss"])  # compile + settle
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batch_data, jax.random.fold_in(key, i))
    _ = float(m["train_loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(
        f"batch {batch:4d} remat={remat!s:5s}  {dt * 1e3:7.1f} ms/step  "
        f"{batch / dt:8.1f} samples/s",
        flush=True,
    )


def main():
    print("devices:", jax.devices())
    for batch in (38, 76):
        for remat in (False, True):
            run(batch, remat)


if __name__ == "__main__":
    main()
