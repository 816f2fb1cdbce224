"""Golden-parity oracle: the repo's MeshGraphNets forward vs an independent
straight-from-the-math implementation of the reference model.

The oracle below re-expresses reference
fourierflow/routines/meshgraphnet_jax.py:117-223 (GraphEncoder,
GraphNetBlock, GraphProcessor), :55-87 (triangles_to_edges) and
:381-421 (_build_graph feature construction) exactly as written there —
haiku MLPs with ReLU between layers and a final LayerNorm (haiku's
eps=1e-5), raw gathers of sender/receiver features, scatter-add edge
aggregation, residuals on nodes and edges, a LayerNorm-free decoder — but
in plain numpy, with none of the repo's machinery (no masks, no clamped
indices, no flax). Agreement on a fully valid (unpadded) graph therefore
pins the whole flax reformulation to the reference computation; the
padding-path deviations (masked messages instead of NaN plumbing,
models/meshgraphnet.py module docstring) are exercised separately in
tests/test_meshgraphnet.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierflow_tpu.models.meshgraphnet import (
    GraphProcessor,
    build_cylinder_graph,
    triangles_to_edges,
)

LN_EPS_REF = 1e-5  # haiku hk.LayerNorm default (meshgraphnet_jax.py:102-105)


# --------------------------------------------------------------------------
# The oracle: reference math in numpy
# --------------------------------------------------------------------------
def _oracle_mlp(p, x, layer_norm=True):
    """MLPEncoder (meshgraphnet_jax.py:90-114): Linear chain, ReLU between,
    optional trailing LayerNorm with learned scale/offset."""
    names = sorted(k for k in p if k.startswith("linear_"))
    for i, name in enumerate(names):
        x = x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])
        if i < len(names) - 1:
            x = np.maximum(x, 0.0)
    if layer_norm:
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        x = (x - mu) / np.sqrt(var + LN_EPS_REF)
        x = x * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])
    return x


def _oracle_block(p, node_feats, edge_feats, senders, receivers):
    """GraphNetBlock (meshgraphnet_jax.py:140-201) on a fully valid graph:
    edge update from [sender, receiver, edge] concat, node update from
    [node, scatter-added messages] concat, residuals on both."""
    ef = np.concatenate(
        [node_feats[senders], node_feats[receivers], edge_feats], axis=-1
    )
    new_edges = _oracle_mlp(p["edge_updater_0"], ef)

    agg = np.zeros_like(node_feats)
    np.add.at(agg, receivers, new_edges)
    nf = np.concatenate([node_feats, agg], axis=-1)
    new_nodes = _oracle_mlp(p["node_updater"], nf)

    return node_feats + new_nodes, edge_feats + new_edges


def _oracle_processor(params, node_feats, edge_feats, senders, receivers,
                      n_layers):
    """GraphProcessor (meshgraphnet_jax.py:204-223): encode-process-decode."""
    p = params["params"]
    h_nodes = _oracle_mlp(p["node_encoder"], node_feats)
    h_edges = _oracle_mlp(p["edge_encoder_0"], edge_feats)
    for i in range(n_layers):
        h_nodes, h_edges = _oracle_block(
            p[f"graph_layer_{i}"], h_nodes, h_edges, senders, receivers
        )
    return _oracle_mlp(p["decoder"], h_nodes, layer_norm=False)


def _oracle_features(velocity, node_type, mesh_pos, senders, receivers):
    """_build_graph feature math (meshgraphnet_jax.py:381-421): node =
    velocity ++ one-hot(9); edge = relative position ++ its norm."""
    one_hot = np.eye(9, dtype=np.float32)[node_type]
    node_feats = np.concatenate([velocity, one_hot], axis=-1)
    rel = mesh_pos[senders] - mesh_pos[receivers]
    norms = np.linalg.norm(rel, axis=-1, keepdims=True)
    edge_feats = np.concatenate([rel, norms], axis=-1)
    return node_feats.astype(np.float32), edge_feats.astype(np.float32)


def _valid_graph(rng, n_nodes=24, n_edges=60):
    """A fully valid bidirectional edge list (no -1 padding)."""
    pairs = set()
    while len(pairs) < n_edges // 2:
        a, b = rng.randint(0, n_nodes, 2)
        if a != b:
            pairs.add((max(a, b), min(a, b)))
    s = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int32)
    r = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int32)
    return s, r


# --------------------------------------------------------------------------
def test_mgn_processor_golden_parity():
    """flax GraphProcessor == the reference encode-process-decode math on a
    fully valid graph, with the same weights folded into the oracle."""
    rng = np.random.RandomState(0)
    n_nodes, latent, n_layers = 16, 16, 2
    senders, receivers = _valid_graph(rng, n_nodes)
    node_feats = rng.randn(n_nodes, 11).astype(np.float32)
    edge_feats = rng.randn(len(senders), 3).astype(np.float32)

    model = GraphProcessor(n_layers=n_layers, latent_size=latent, output_dim=2)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(node_feats),
        jnp.asarray(edge_feats),
        jnp.asarray(senders),
        jnp.asarray(receivers),
    )
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(node_feats),
            jnp.asarray(edge_feats),
            jnp.asarray(senders),
            jnp.asarray(receivers),
        )
    )
    want = _oracle_processor(
        jax.tree.map(np.asarray, params),
        node_feats, edge_feats, senders, receivers, n_layers,
    )
    # Tolerance covers the LayerNorm epsilon difference (flax 1e-6 vs
    # haiku 1e-5) and f32 reduction-order noise through the blocks.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mgn_feature_building_golden_parity():
    """build_cylinder_graph features == the reference _build_graph math on
    the valid (non-padded) edges."""
    rng = np.random.RandomState(1)
    n_nodes, n_faces = 12, 10
    velocity = rng.randn(n_nodes, 2).astype(np.float32)
    node_type = rng.randint(0, 7, n_nodes).astype(np.int32)
    mesh_pos = rng.randn(n_nodes, 2).astype(np.float32)
    cells = rng.randint(0, n_nodes, (n_faces, 3)).astype(np.int32)

    node_feats, edge_feats, senders, receivers = jax.tree.map(
        np.asarray,
        build_cylinder_graph(
            jnp.asarray(velocity), jnp.asarray(node_type),
            jnp.asarray(mesh_pos), jnp.asarray(cells),
        ),
    )
    valid = senders >= 0
    want_nodes, want_edges = _oracle_features(
        velocity, node_type, mesh_pos, senders[valid], receivers[valid]
    )
    np.testing.assert_allclose(node_feats, want_nodes, rtol=1e-6)
    np.testing.assert_allclose(edge_feats[valid], want_edges, rtol=1e-5, atol=1e-6)
    # Padded edges carry zero features in our build (reference pads get
    # rel = pos[-1] - pos[-1] = 0 as well: same values, different route).
    assert np.all(edge_feats[~valid] == 0.0)


def test_mgn_edge_building_golden_parity():
    """triangles_to_edges == an independent set-based construction
    (meshgraphnet_jax.py:55-87): every undirected face edge appears in
    both directions exactly once; everything else is -1 padding."""
    rng = np.random.RandomState(2)
    n_nodes, n_faces = 9, 8
    cells = rng.randint(0, n_nodes, (n_faces, 3)).astype(np.int32)

    senders, receivers = jax.tree.map(
        np.asarray, triangles_to_edges(jnp.asarray(cells))
    )
    undirected = set()
    for a, b, c in cells:
        for u, v in ((a, b), (b, c), (c, a)):
            # Degenerate (u == u) edges are kept, as the reference keeps
            # them: min/max canonicalization + unique does not drop them.
            undirected.add((max(u, v), min(u, v)))
    want = set()
    for u, v in undirected:
        want.add((u, v))
        want.add((v, u))

    got = {(int(s), int(r)) for s, r in zip(senders, receivers) if s >= 0 and r >= 0}
    assert got == want
    assert len(senders) == 6 * n_faces  # static shape, -1 padded


def test_mgn_loss_golden_parity():
    """Routine loss == the reference's optax.l2_loss + nanmean semantics
    (meshgraphnet_jax.py:443-447) on a fully valid batch."""
    import optax

    from fourierflow_tpu.routines.meshgraphnet import MeshGraphNetRoutine

    rng = np.random.RandomState(3)
    n_nodes, n_faces = 16, 12
    batch = {
        "velocity": rng.randn(1, n_nodes, 2).astype(np.float32),
        "target_velocity": rng.randn(1, n_nodes, 2).astype(np.float32),
        "node_type": rng.randint(0, 7, (1, n_nodes)).astype(np.int32),
        "mesh_pos": rng.randn(1, n_nodes, 2).astype(np.float32),
        "cells": rng.randint(0, n_nodes, (1, n_faces, 3)).astype(np.int32),
    }
    routine = MeshGraphNetRoutine(
        n_layers=1, latent_size=8, optimizer=optax.adam(1e-3)
    )
    state = routine.init(jax.random.PRNGKey(0), batch)
    got = float(routine._loss(state.params, jax.tree.map(jnp.asarray, batch)))

    from fourierflow_tpu.routines.meshgraphnet import _model_forward

    preds, targets, mask = _model_forward(
        routine.model, state.params, jax.tree.map(jnp.asarray, batch)
    )
    ref_loss = float(
        jnp.nanmean(optax.l2_loss(np.asarray(targets), np.asarray(preds)).sum(-1))
    )
    assert got == pytest.approx(ref_loss, rel=1e-6)
