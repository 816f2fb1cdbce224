"""Optax learning-rate schedules mirroring the reference schedulers
(reference:fourierflow/schedulers/*.py). All are per-step schedules (the
reference steps its LambdaLR inside optimize_manually,
routines/base.py:51-52)."""

import math

import jax.numpy as jnp

__all__ = [
    "cosine_with_warmup",
    "linear_with_warmup",
    "exponential_with_warmup",
    "step_lr",
]


def cosine_with_warmup(
    lr: float, num_warmup_steps: int, num_training_steps: int, num_cycles: float = 0.5
):
    """Linear warmup then cosine decay
    (reference:fourierflow/schedulers/cosine_with_warmup.py:6-26)."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps
        )
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def linear_with_warmup(lr: float, num_warmup_steps: int, num_training_steps: int):
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        lin = jnp.maximum(
            0.0,
            (num_training_steps - step)
            / jnp.maximum(1.0, num_training_steps - num_warmup_steps),
        )
        return lr * jnp.where(step < num_warmup_steps, warm, lin)

    return schedule


def exponential_with_warmup(
    lr: float, num_warmup_steps: int, decay_rate: float = 0.5, decay_steps: int = 10000
):
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        exp = decay_rate ** ((step - num_warmup_steps) / decay_steps)
        return lr * jnp.where(step < num_warmup_steps, warm, exp)

    return schedule


def step_lr(lr: float, step_size: int, gamma: float = 0.5, steps_per_epoch: int = 1):
    """torch StepLR equivalent: decay by gamma every `step_size` *epochs*
    (the zongyi baseline config uses interval: epoch)."""

    def schedule(step):
        epoch = jnp.asarray(step, dtype=jnp.float32) / max(1, steps_per_epoch)
        return lr * gamma ** jnp.floor(epoch / step_size)

    return schedule


def swa_lr(lr: float, swa_lr: float, swa_step_start: int, anneal_steps: int = 1000):
    """SWALR-style schedule (reference:fourierflow/schedulers — torch SWALR):
    constant ``lr`` until ``swa_step_start``, then a cosine anneal down to
    the (typically smaller) constant ``swa_lr``."""
    import jax.numpy as jnp

    def schedule(step):
        t = jnp.clip((step - swa_step_start) / max(anneal_steps, 1), 0.0, 1.0)
        annealed = swa_lr + (lr - swa_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < swa_step_start, lr, annealed)

    return schedule
