"""``predict`` command: inference-time measurement
(reference:fourierflow/commands/predict.py:24-105): seconds per sample per
simulation-second of the autoregressive rollout."""

import logging
import time

import jax
import numpy as np

from ..config import instantiate, load_config
from ..trainers.callbacks import load_state
from .train import build_routine

logger = logging.getLogger(__name__)


def main(config_path, checkpoint_path=None, overrides=None, trial: int = 0):
    cfg = load_config(config_path, overrides)
    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)
    template = routine.init(jax.random.PRNGKey(7231 + trial), builder.sample_batch())
    state = template
    if checkpoint_path:
        state = load_state(checkpoint_path, template)

    data = builder.inference_data()
    batch = {k: jax.numpy.asarray(v) for k, v in data.items()}
    rollout = jax.jit(lambda s, b: routine.rollout(s, b)[0])

    # warmup (compile)
    preds = rollout(state, batch)
    _ = float(jax.numpy.sum(preds))

    t0 = time.perf_counter()
    preds = rollout(state, batch)
    _ = float(jax.numpy.sum(preds))
    elapsed = time.perf_counter() - t0

    n_samples = len(next(iter(batch.values())))
    n_steps = preds.shape[-1]
    step_size = getattr(routine, "step_size", 1.0)
    sim_seconds = n_steps * step_size
    inference_time = elapsed / n_samples / sim_seconds
    logger.info(
        "inference: %.4g s total, %d samples, %.3g sim-s -> %.4g s/sample/sim-s",
        elapsed, n_samples, sim_seconds, inference_time,
    )
    return inference_time
