"""MeshGraphNets routine: one-step training on velocity deltas, 50-step
autoregressive rollout validation.

TPU-native equivalent of
reference:fourierflow/routines/meshgraphnet_jax.py:330-506 (the torch twin
routines/meshgraphnet_torch.py implements the same task). Differences by
design: the rollout is a ``lax.scan`` (the reference unrolls a Python loop
of 50 jitted applies, meshgraphnet_jax.py:454-468), gradients are clipped
by global norm exactly like ``safe_clip_grads`` (:18-27), and batching is
a ``vmap`` over padded samples.
"""

import jax
import jax.numpy as jnp
import optax

from ..models.meshgraphnet import GraphProcessor, build_cylinder_graph
from .base import Routine, TrainState

__all__ = ["MeshGraphNetRoutine"]


def _model_forward(model, params, batch):
    """vmapped forward over a padded batch dict -> (preds, targets, mask)."""

    def single(velocity, node_type, mesh_pos, cells, target_velocity):
        node_feats, edge_feats, senders, receivers = build_cylinder_graph(
            velocity, node_type, mesh_pos, cells
        )
        preds = model.apply(params, node_feats, edge_feats, senders, receivers)
        targets = target_velocity - velocity
        # Padded nodes are NaN in targets (meshgraphnet_jax.py:361-366).
        mask = ~jnp.isnan(targets)
        return preds, jnp.nan_to_num(targets), mask

    return jax.vmap(single)(
        batch["velocity"],
        batch["node_type"],
        batch["mesh_pos"],
        batch["cells"],
        batch["target_velocity"],
    )


class MeshGraphNetRoutine(Routine):
    def __init__(
        self,
        n_layers: int = 15,
        latent_size: int = 128,
        output_dim: int = 2,
        clip_val: float = 0.1,
        rollout_steps: int = 50,
        optimizer=None,
        **kwargs,
    ):
        super().__init__(optimizer=optimizer, **kwargs)
        self.model = GraphProcessor(
            n_layers=n_layers, latent_size=latent_size, output_dim=output_dim
        )
        self.clip_val = clip_val
        self.rollout_steps = rollout_steps

    def init(self, key, sample_batch) -> TrainState:
        b = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        node_feats, edge_feats, senders, receivers = build_cylinder_graph(
            b["velocity"][0], b["node_type"][0], b["mesh_pos"][0], b["cells"][0]
        )
        params = self.model.init(key, node_feats, edge_feats, senders, receivers)
        return self.make_train_state(params)

    def _loss(self, params, batch):
        preds, targets, mask = _model_forward(self.model, params, batch)
        sq = 0.5 * (preds - targets) ** 2  # optax.l2_loss semantics
        sq = jnp.where(mask, sq, 0.0)
        per_node = sq.sum(axis=-1)
        valid = mask.any(axis=-1)
        return per_node.sum() / jnp.maximum(valid.sum(), 1)

    def train_step(self, state: TrainState, batch, rng=None):
        loss, grads = jax.value_and_grad(self._loss)(state.params, batch)
        # safe_clip_grads (meshgraphnet_jax.py:18-27) == clip by global norm.
        norm = optax.global_norm(grads)
        scale = jnp.where(norm < self.clip_val, 1.0, self.clip_val / (norm + 1e-9))
        grads = jax.tree.map(lambda g: g * scale, grads)
        state = self.apply_grads(state, grads)
        return state, self.with_grad_norm({"train_loss": loss}, grads)

    def valid_step(self, state: TrainState, batch):
        """50-step rollout: feed predicted velocity back in
        (meshgraphnet_jax.py:449-482), scanned for one compilation."""
        steps = self.rollout_steps
        static = {
            k: batch[k] for k in ("node_type", "mesh_pos", "cells")
        }
        v0 = batch["velocity"][:, 0]  # [b, n, 2] at t=0
        targets_seq = jnp.moveaxis(
            batch["target_velocity"][:, :steps], 1, 0
        )  # [t, b, n, 2]

        params = state.params

        def step(velocity, target_velocity):
            sub = dict(static)
            sub["velocity"] = velocity
            sub["target_velocity"] = target_velocity
            preds, targets, mask = _model_forward(self.model, params, sub)
            # The model predicts the velocity *delta*; integrate it.
            # (The reference feeds the raw delta back as the next velocity,
            # meshgraphnet_jax.py:462 — a bug we deliberately do not copy.)
            new_velocity = jnp.where(mask, velocity + preds, velocity)
            sq = jnp.where(mask, 0.5 * (preds - targets) ** 2, 0.0).sum(axis=-1)
            valid = mask.any(axis=-1)
            return new_velocity, (sq.sum(), valid.sum())

        _, (sq_sums, valid_counts) = jax.lax.scan(step, v0, targets_seq)
        loss = sq_sums.sum() / jnp.maximum(valid_counts.sum(), 1)
        return {"loss": loss, "weight": jnp.asarray(v0.shape[0], jnp.float32)}
