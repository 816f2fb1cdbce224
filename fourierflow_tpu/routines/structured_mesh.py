"""Structured-mesh routine (airfoil / pipe / plasticity): plain supervised
N-MSE of model(x) vs y with an optional loss scale
(reference:fourierflow/routines/structured_mesh.py:8-51)."""

import jax
import jax.numpy as jnp

from ..layers import lp_loss_rel
from .base import Routine, TrainState

__all__ = ["StructuredMeshRoutine"]


class StructuredMeshRoutine(Routine):
    def __init__(self, model=None, loss_scale: float = 1.0, optimizer=None, conv=None, **kwargs):
        super().__init__(optimizer=optimizer)
        self.model = model if model is not None else conv
        self.loss_scale = loss_scale

    def init(self, key, sample_batch) -> TrainState:
        x = jnp.asarray(sample_batch["x"])
        params = self.model.init(key, x)
        return self.make_train_state(params)

    def _loss(self, params, batch):
        x, y = batch["x"], batch["y"]
        b = x.shape[0]
        out = self.model.apply(params, x)
        return lp_loss_rel(out.reshape(b, -1), y.reshape(b, -1))

    def train_step(self, state: TrainState, batch, rng=None):
        def scaled(params):
            loss = self._loss(params, batch)
            return loss * self.loss_scale, loss

        (_, loss), grads = jax.value_and_grad(scaled, has_aux=True)(state.params)
        state = self.apply_grads(state, grads)
        return state, self.with_grad_norm({"train_loss": loss}, grads)

    def valid_step(self, state: TrainState, batch):
        return {"loss": self._loss(state.params, batch)}
