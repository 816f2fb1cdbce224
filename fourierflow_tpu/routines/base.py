"""Routine base: train state, optimizer plumbing, and the functional
routine contract.

TPU-native redesign of reference:fourierflow/routines/base.py. The torch
version is a LightningModule with manual optimization; here a Routine is a
plain object owning a flax model plus *pure* step functions that the
Trainer jits (optionally pjit-sharded over a device mesh):

- ``init(key, sample_batch) -> TrainState``
- ``train_step(state, batch, rng) -> (state, metrics)``
- ``accumulate_step(state, batch) -> state``      (normalizer warm-up)
- ``valid_step(state, batch) -> metrics``
"""

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..layers import NormalizerState

__all__ = ["TrainState", "Routine", "make_optimizer"]


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    normalizer: Optional[NormalizerState]
    step: jax.Array


def make_optimizer(
    optimizer: Optional[optax.GradientTransformation] = None,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    schedule: Optional[Callable] = None,
    clip_val: Optional[float] = None,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    """AdamW with an optional per-step LR schedule, gradient value clipping
    (reference routines/base.py:27-52 clips grads *by value* before the
    step), and gradient accumulation."""
    if optimizer is None:
        if schedule is not None:
            lr = schedule
        optimizer = optax.adamw(lr, weight_decay=weight_decay)
    chain = []
    if clip_val is not None:
        # torch.nn.utils.clip_grad_value_ equivalent.
        chain.append(
            optax.stateless(lambda g, p: jax.tree.map(lambda x: jnp.clip(x, -clip_val, clip_val), g))
        )
    chain.append(optimizer)
    tx = optax.chain(*chain) if len(chain) > 1 else optimizer
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


class Routine:
    """Base functional routine. Subclasses set ``self.model`` (a flax
    module) and implement the step functions."""

    def __init__(
        self,
        optimizer: Optional[optax.GradientTransformation] = None,
        track_grad_norm: bool = False,
        **kwargs,
    ):
        self.optimizer = optimizer if optimizer is not None else make_optimizer()
        # Reference trainer debug knob (`track_grad_norm` in configs,
        # commands/train.py / pl.Trainer): when on, apply_grads adds the
        # global gradient L2 norm to the metrics via grad_norm().
        self.track_grad_norm = track_grad_norm

    @staticmethod
    def grad_norm(grads) -> jax.Array:
        """Global L2 norm over a gradient pytree (for debug logging)."""
        return optax.global_norm(grads)

    def with_grad_norm(self, metrics: dict, grads) -> dict:
        """Attach the global grad norm when ``track_grad_norm`` is on —
        call from every train_step so the config knob works uniformly."""
        if getattr(self, "track_grad_norm", False):
            metrics = dict(metrics)
            metrics["grad_norm"] = self.grad_norm(grads)
        return metrics

    # --- contract -------------------------------------------------------
    def init(self, key, sample_batch) -> TrainState:
        raise NotImplementedError

    def train_step(self, state: TrainState, batch, rng):
        raise NotImplementedError

    def accumulate_step(self, state: TrainState, batch) -> TrainState:
        """Normalizer statistics warm-up (epoch 0). Default: no-op."""
        return state

    def valid_step(self, state: TrainState, batch):
        raise NotImplementedError

    # --- helpers --------------------------------------------------------
    def n_params(self, state: TrainState) -> int:
        return sum(int(p.size) for p in jax.tree.leaves(state.params))

    def make_train_state(self, params, normalizer=None) -> TrainState:
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            normalizer=normalizer,
            step=jnp.zeros((), dtype=jnp.int32),
        )

    def apply_grads(self, state: TrainState, grads) -> TrainState:
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state, step=state.step + 1)
