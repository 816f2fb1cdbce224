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


def time_dns_baseline(n_samples: int = 32, s: int = 64, steps: int = 10,
                      delta_t: float = 1e-4, inner: int = 100):
    """With no config, time the Crank-Nicolson DNS itself — the reference's
    numerical-solver baseline for the inference-speedup claim
    (predict.py:32-44). Returns seconds / sample / simulation-second."""
    from ..builders.synthetic import gaussian_random_field, solve_navier_stokes_2d

    key = jax.random.PRNGKey(0)
    w0 = np.asarray(gaussian_random_field(key, n_samples, s, n_dims=2))
    # warmup (compile)
    solve_navier_stokes_2d(w0[:1], 1e-5, t_end=delta_t * inner, delta_t=delta_t,
                           record_steps=1, force="li")
    t0 = time.perf_counter()
    sol, _ = solve_navier_stokes_2d(
        w0, 1e-5, t_end=delta_t * inner * steps, delta_t=delta_t,
        record_steps=steps, force="li",
    )
    _ = float(np.sum(sol))
    elapsed = time.perf_counter() - t0
    sim_seconds = delta_t * inner * steps
    per = elapsed / n_samples / sim_seconds
    logger.info("DNS baseline: %.4f s total, %.6f s/sample/sim-second", elapsed, per)
    print({"elapsed": elapsed, "inference_time": per, "mode": "dns_baseline"})
    return per


def main(config_path=None, checkpoint_path=None, overrides=None, trial: int = 0):
    if config_path is None:
        return time_dns_baseline()
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
