"""Point-cloud routine (elasticity): supervised stress prediction on
scattered points with a learned coordinate deformation.

TPU-native equivalent of reference:fourierflow/routines/point_cloud.py:
N-MSE of model(xy, code=rr) vs sigma, plus the reference's (inactive,
weight-0) IPhi regularization term, still computed and logged.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..layers import lp_loss_rel
from .base import Routine, TrainState

__all__ = ["PointCloudRoutine"]


class PointCloudRoutine(Routine):
    def __init__(self, model=None, iphi=None, N: int = 1000, reg_weight: float = 0.0,
                 optimizer=None, **kwargs):
        super().__init__(optimizer=optimizer)
        if iphi is not None and getattr(model, "iphi", None) is None:
            model = model.clone(iphi=iphi)
        self.model = model
        self.N = N
        self.reg_weight = reg_weight

    def init(self, key, sample_batch) -> TrainState:
        xy = jnp.asarray(sample_batch["xy"])
        rr = jnp.asarray(sample_batch["rr"])
        params = self.model.init(key, xy, code=rr)
        return self.make_train_state(params)

    def _loss(self, params, batch, rng: Optional[jax.Array]):
        xy, rr, sigma = batch["xy"], batch["rr"], batch["sigma"]
        b = rr.shape[0]
        out = self.model.apply(params, xy, code=rr)
        loss_data = lp_loss_rel(out.reshape(b, -1), sigma.reshape(b, -1))

        loss_reg = jnp.zeros(())
        if rng is not None and self.model.iphi is not None:
            # IPhi regularization: deformed random samples should stay close
            # to the identity (point_cloud.py:36-39; weight 0 in reference).
            samples_x = jax.random.uniform(rng, (b, self.N, 2)) * 3 - 1
            samples_xi = self.model.apply(
                params, samples_x, rr, method=lambda m, x, c: m.iphi(x, c)
            )
            loss_reg = lp_loss_rel(samples_xi, samples_x)
        return loss_data + self.reg_weight * loss_reg, (loss_data, loss_reg)

    def train_step(self, state: TrainState, batch, rng):
        (loss, (loss_data, loss_reg)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state.params, batch, rng)
        state = self.apply_grads(state, grads)
        return state, self.with_grad_norm(
            {"train_loss": loss_data, "train_loss_reg": loss_reg}, grads)

    def valid_step(self, state: TrainState, batch):
        loss, _ = self._loss(state.params, batch, None)
        return {"loss": loss}
