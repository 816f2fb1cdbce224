"""``infer`` command: jitted autoregressive rollout inference benchmark.

Equivalent of reference:fourierflow/commands/infer.py:20-213 — which was
the reference's own proof-of-concept JAX port of F-FNO inference (torch
checkpoint -> jnp pytree -> lax.scan rollout). In this framework the model
is already functional JAX, so this command simply loads a checkpoint,
builds the feature pipeline, and times a jitted+vmapped ``lax.scan``
rollout, reporting seconds per sample per simulation-second (the
reference's canonical speed metric, commands/train.py:133-148).
"""

import logging
import time
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import instantiate, load_config
from .train import build_routine

logger = logging.getLogger(__name__)

__all__ = ["main"]


def main(
    config_path: str,
    checkpoint_path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
    n_steps: int = 100,
    trial: int = 0,
    torch_checkpoint: Optional[str] = None,
):
    cfg = load_config(config_path, overrides)
    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)

    batch = next(builder.test_batches())
    state = routine.init(jax.random.PRNGKey(7231 + trial), builder.sample_batch())
    if checkpoint_path:
        from ..trainers.callbacks import load_state

        state = load_state(checkpoint_path, state)
    if torch_checkpoint:
        from ..utils.torch_import import import_reference_checkpoint

        state = import_reference_checkpoint(torch_checkpoint, state)

    # Evaluation trajectories [b, X, Y, T]; if shorter than the requested
    # rollout, tile the first frame as dummy targets (pure timing mode).
    data = jnp.asarray(batch.get("data", batch.get("x")))
    routine.n_steps = n_steps
    if data.shape[-1] < n_steps + 1:
        data = jnp.concatenate(
            [data[..., :1]] * (n_steps + 1 - data.shape[-1]) + [data], axis=-1
        )
    sim_batch = dict(batch)
    sim_batch["data"] = data

    rollout = jax.jit(lambda st, b: routine.rollout(st, b)[0])
    trajs = rollout(state, sim_batch)
    _ = float(jnp.sum(trajs))  # compile + barrier (relay-safe)

    start = time.time()
    trajs = rollout(state, sim_batch)
    _ = float(jnp.sum(trajs))
    elapsed = time.time() - start

    step_size = cfg["routine"].get("step_size", 1.0)
    sim_time = step_size * n_steps
    per_sample_per_sim_second = elapsed / sim_time / data.shape[0]
    logger.info(
        "rollout %s: %.4f s total, %.6f s/sample/sim-second",
        tuple(trajs.shape), elapsed, per_sample_per_sim_second,
    )
    print(
        {
            "shape": tuple(int(s) for s in trajs.shape),
            "elapsed": elapsed,
            "inference_time": per_sample_per_sim_second,
        }
    )
    return per_sample_per_sim_second
