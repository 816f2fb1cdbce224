"""MeshGraphNets (Pfaff et al. 2021) — encode-process-decode message
passing on triangular meshes.

TPU-native equivalent of
reference:fourierflow/routines/meshgraphnet_jax.py:30-223 (the reference's
torch twin is routines/meshgraphnet_torch.py). Design notes for TPU:

- **Static shapes**: meshes are padded to a fixed node/cell count;
  ``triangles_to_edges`` uses ``jnp.unique(..., size=...)`` with -1 fill so
  every step compiles once regardless of the true mesh size
  (meshgraphnet_jax.py:55-87).
- **Padding masks instead of NaN plumbing**: the reference pads with NaNs
  and re-masks after every gather (meshgraphnet_jax.py:157-176). Here
  invalid edges (-1 indices) and padded nodes are handled with explicit
  boolean masks: padded indices are clamped to 0 for the gather/scatter
  and their contributions multiplied by 0 — scatter-add with masked zeros
  is fusion-friendly and avoids NaN traffic through the MXU. NaN-padded
  *inputs* are still zeroed on entry for parity with the reference data
  format.
"""

import enum
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["NodeType", "triangles_to_edges", "GraphProcessor", "build_cylinder_graph"]


class NodeType(enum.IntEnum):
    """Node categories (meshgraphnet_jax.py:30-38)."""

    NORMAL = 0
    OBSTACLE = 1
    AIRFOIL = 2
    HANDLE = 3
    INFLOW = 4
    OUTFLOW = 5
    WALL_BOUNDARY = 6
    SIZE = 9


def triangles_to_edges(faces: jax.Array):
    """Bidirectional unique edges from triangle faces, statically padded.

    Args:
      faces: ``[n_faces, 3]`` int32, -1-padded rows for unused faces.
    Returns:
      (senders, receivers): each ``[6 * n_faces]`` int32; padding entries
      are -1 (mirrors meshgraphnet_jax.py:55-87).
    """
    e1 = faces[:, 0:2]
    e2 = faces[:, 1:3]
    e3 = jnp.stack([faces[:, 2], faces[:, 0]], axis=1)
    edges = jnp.concatenate([e1, e2, e3], axis=0)  # [3f, 2]

    # Canonical direction large->small so duplicates collapse in unique.
    receivers = edges.min(axis=1)
    senders = edges.max(axis=1)
    sorted_edges = jnp.stack([senders, receivers], axis=1)

    unique_edges = jnp.unique(sorted_edges, axis=0, size=edges.shape[0], fill_value=-1)
    s, r = unique_edges[:, 0], unique_edges[:, 1]
    # Two-way connectivity; -1 pads stay -1 on both sides.
    sources = jnp.concatenate([s, r], axis=0)
    dests = jnp.concatenate([r, s], axis=0)
    return sources, dests


class MLPBlock(nn.Module):
    """MLP with ReLU between layers and optional final LayerNorm
    (meshgraphnet_jax.py:90-114)."""

    output_sizes: Sequence[int]
    layer_norm: bool = True

    @nn.compact
    def __call__(self, x):
        n = len(self.output_sizes)
        for i, size in enumerate(self.output_sizes):
            x = nn.Dense(size, name=f"linear_{i}")(x)
            if i < n - 1:
                x = nn.relu(x)
        if self.layer_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x


class GraphNetBlock(nn.Module):
    """One message-passing step with residuals (meshgraphnet_jax.py:140-201)."""

    latent_size: int = 128

    @nn.compact
    def __call__(self, node_feats, edge_feats, senders, receivers, edge_mask):
        # Edge update: gather endpoint features, concat, MLP.
        s_idx = jnp.maximum(senders, 0)
        r_idx = jnp.maximum(receivers, 0)
        sender_feats = jnp.take(node_feats, s_idx, axis=0)
        receiver_feats = jnp.take(node_feats, r_idx, axis=0)
        ef = jnp.concatenate([sender_feats, receiver_feats, edge_feats], axis=-1)
        new_edges = MLPBlock([self.latent_size] * 2, name="edge_updater_0")(ef)
        new_edges = new_edges * edge_mask[:, None]

        # Node update: scatter-add incoming edge messages.
        agg = jnp.zeros_like(node_feats).at[r_idx].add(new_edges)
        nf = jnp.concatenate([node_feats, agg], axis=-1)
        new_nodes = MLPBlock([self.latent_size] * 2, name="node_updater")(nf)

        # Residual connections.
        return node_feats + new_nodes, edge_feats + new_edges


class GraphProcessor(nn.Module):
    """Encode-process-decode (meshgraphnet_jax.py:204-223): node/edge MLP
    encoders, ``n_layers`` message-passing blocks, a LayerNorm-free decoder
    head to ``output_dim``."""

    n_layers: int = 15
    latent_size: int = 128
    output_dim: int = 2

    @nn.compact
    def __call__(self, node_feats, edge_feats, senders, receivers):
        edge_mask = (senders >= 0).astype(node_feats.dtype)

        h_nodes = MLPBlock([self.latent_size] * 2, name="node_encoder")(node_feats)
        h_edges = MLPBlock([self.latent_size] * 2, name="edge_encoder_0")(edge_feats)
        h_edges = h_edges * edge_mask[:, None]

        for i in range(self.n_layers):
            h_nodes, h_edges = GraphNetBlock(
                self.latent_size, name=f"graph_layer_{i}"
            )(h_nodes, h_edges, senders, receivers, edge_mask)

        return MLPBlock(
            [self.latent_size, self.output_dim], layer_norm=False, name="decoder"
        )(h_nodes)


def build_cylinder_graph(velocity, node_type, mesh_pos, cells):
    """Feature building for one cylinder-flow sample
    (meshgraphnet_jax.py:381-421): node features = velocity (+) one-hot
    node type; edge features = relative position (+) its norm.

    All NaN padding in the inputs is zeroed here; returns
    (node_feats [n, 11], edge_feats [e, 3], senders [e], receivers [e]).
    """
    node_types = jax.nn.one_hot(node_type, int(NodeType.SIZE))
    velocity = jnp.nan_to_num(velocity)
    node_feats = jnp.concatenate([velocity, node_types], axis=-1)

    senders, receivers = triangles_to_edges(cells)
    pos = jnp.nan_to_num(mesh_pos)
    rel = jnp.take(pos, jnp.maximum(senders, 0), axis=0) - jnp.take(
        pos, jnp.maximum(receivers, 0), axis=0
    )
    norms = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    edge_feats = jnp.concatenate([rel, norms], axis=-1)
    edge_feats = edge_feats * (senders >= 0).astype(edge_feats.dtype)[:, None]
    return node_feats, edge_feats, senders, receivers
