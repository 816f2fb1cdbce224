"""Learned-interpolation CFD routine (Kochkov et al. 2021 reproduction).

TPU-native equivalent of
reference:fourierflow/routines/learned_interpolator.py:20-219, with the
jax-cfd model replaced by the native finite-volume step
(models/learned_interpolation.py). One model application advances a full
*coarse* step ``dt`` (~32x the DNS step — the paper's speedup); training
unrolls ``unroll_length`` steps against ground-truth velocities, and
validation unrolls ``outer_steps`` snapshots of ``inner_steps`` model
steps each, downsamples to the 32x32 reference grid, and scores the
vorticity correlation ``rho(t)`` and the time until ``rho < 0.95``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..models.learned_interpolation import LearnedInterpolationStep
from ..utils.grids import Grid
from ..utils.spectral import (
    downsample_staggered_velocity,
    grid_correlation,
    velocity_to_vorticity_fd,
)
from .base import Routine, TrainState

__all__ = ["LearnedInterpolatorRoutine"]

TWO_PI = 2 * np.pi


class LearnedInterpolatorRoutine(Routine):
    def __init__(
        self,
        size: int,
        dt: float = 0.007012483601762931,
        inner_steps: int = 16,
        outer_steps: int = 100,
        unroll_length: int = 32,
        density: float = 1.0,
        viscosity: float = 1e-3,
        forcing_wavenumber: int = 4,
        forcing_scale: float = 1.0,
        drag: float = 0.1,
        features: int = 64,
        n_cnn_layers: int = 6,
        optimizer=None,
        **kwargs,
    ):
        super().__init__(optimizer=optimizer)
        self.size = size
        self.inner_steps = inner_steps
        self.outer_steps = outer_steps
        self.unroll_length = unroll_length
        self.step_size = dt * inner_steps  # sim-time per validation snapshot
        self.sim_grid = Grid((size, size), domain=((0, TWO_PI), (0, TWO_PI)))
        self.out_grid = Grid((32, 32), domain=((0, TWO_PI), (0, TWO_PI)))
        self.model = LearnedInterpolationStep(
            size=size,
            dt=dt,
            density=density,
            viscosity=viscosity,
            forcing_wavenumber=forcing_wavenumber,
            forcing_scale=forcing_scale,
            drag=drag,
            features=features,
            n_cnn_layers=n_cnn_layers,
        )

    # -- plumbing ---------------------------------------------------------
    def init(self, key, sample_batch) -> TrainState:
        inputs = sample_batch[0] if isinstance(sample_batch, tuple) else sample_batch
        u = jnp.asarray(inputs["vx"][0])
        v = jnp.asarray(inputs["vy"][0])
        params = self.model.init(key, u, v)
        return self.make_train_state(params)

    def _step_uv(self, params, u, v):
        return jax.vmap(lambda a, b: self.model.apply(params, a, b))(u, v)

    def _unroll_snapshots(self, params, u, v, n_snapshots, steps_per_snapshot, post):
        """lax.scan over snapshots; each snapshot is `steps_per_snapshot`
        model steps (reference's repeated+trajectory composition,
        learned_interpolator.py:176-184)."""

        def snapshot(carry, _):
            u, v = carry

            def inner(c, _):
                return self._step_uv(params, *c), None

            (u, v), _ = jax.lax.scan(inner, (u, v), None, length=steps_per_snapshot)
            return (u, v), post(u, v)

        (u, v), outs = jax.lax.scan(snapshot, (u, v), None, length=n_snapshots)
        return (u, v), outs

    # -- training ---------------------------------------------------------
    def _loss(self, params, inputs, outputs):
        u = jnp.asarray(inputs["vx"])
        v = jnp.asarray(inputs["vy"])
        _, preds = self._unroll_snapshots(
            params, u, v, self.unroll_length, 1, lambda a, b: (a, b)
        )
        # preds: ([L, b, X, Y], [L, b, X, Y]); outputs [b, X, Y, L].
        vx_t = jnp.moveaxis(jnp.asarray(outputs["vx"]), -1, 0)
        vy_t = jnp.moveaxis(jnp.asarray(outputs["vy"]), -1, 0)
        vx_loss = (0.5 * (preds[0] - vx_t) ** 2).mean(axis=1).sum()
        vy_loss = (0.5 * (preds[1] - vy_t) ** 2).mean(axis=1).sum()
        return vx_loss + vy_loss

    def train_step(self, state: TrainState, batch, rng=None):
        inputs, outputs = batch if isinstance(batch, tuple) else (batch["inputs"], batch["outputs"])
        loss, grads = jax.value_and_grad(self._loss)(state.params, inputs, outputs)
        state = self.apply_grads(state, grads)
        # "train_loss" like every other routine's train_step (the trainer
        # logs train metrics under their own names).
        return state, self.with_grad_norm({"train_loss": loss}, grads)

    # -- validation -------------------------------------------------------
    def _downsample_vorticity(self, u, v):
        def one(u1, v1):
            if self.size > 32:
                u1, v1 = downsample_staggered_velocity(
                    self.sim_grid, self.out_grid, (u1, v1)
                )
            return velocity_to_vorticity_fd(u1, v1, self.out_grid)

        return jax.vmap(one)(u, v)

    def valid_step(self, state: TrainState, batch):
        u = jnp.asarray(batch["vx"])
        v = jnp.asarray(batch["vy"])
        targets = jnp.asarray(batch["targets"])  # [b, 32, 32, outer]
        n_out = targets.shape[-1]

        _, preds = self._unroll_snapshots(
            state.params, u, v, n_out, self.inner_steps,
            self._downsample_vorticity,
        )  # [outer, b, 32, 32]
        preds = jnp.moveaxis(preds, 0, -1)  # [b, 32, 32, outer]

        rho = grid_correlation(preds, targets, axes=(1, 2))  # [b, outer]
        rho = jnp.nan_to_num(rho).mean(axis=0)  # [outer]
        has_diverged = rho < 0.95
        diverged_t = jnp.argmax(
            jnp.concatenate([has_diverged, jnp.ones((1,), bool)])
        )
        time_until = diverged_t * self.step_size

        return {
            "loss": -rho.mean(),
            "rho": rho.mean(),
            "reduced_time_until": time_until,
            "correlations": rho,
            "times": jnp.asarray(batch["times"])[0],
            "weight": jnp.asarray(u.shape[0], jnp.float32),
        }
