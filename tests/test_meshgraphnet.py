"""End-to-end MeshGraphNets tests: TFRecord parsing + HDF5 conversion,
the cylinder-flow builder, graph construction, and a short training run."""

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierflow_tpu.commands.convert import cylinder_flow, parse_example, read_tfrecord
from fourierflow_tpu.models.meshgraphnet import (
    GraphProcessor,
    build_cylinder_graph,
    triangles_to_edges,
)
from fourierflow_tpu.routines import MeshGraphNetRoutine


# ---- minimal protobuf/TFRecord writers (test-side encoders) -------------

def _varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, payload):
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _example(features):
    """Encode {name: list-of-bytes} as a tf.train.Example."""
    entries = b""
    for name, values in features.items():
        bytes_list = b"".join(_field(1, v) for v in values)
        feature = _field(1, bytes_list)
        entry = _field(1, name.encode()) + _field(2, feature)
        entries += _field(1, entry)
    return _field(1, entries)  # Example{1: Features}


def _write_tfrecord(path, payloads):
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)))
            f.write(b"\0" * 4)
            f.write(p)
            f.write(b"\0" * 4)


def _make_dataset(tmp_path, n_traj=2, t_len=6, n_nodes=8, n_cells=6):
    rng = np.random.RandomState(0)
    meta = {
        "trajectory_length": t_len,
        "field_names": ["cells", "mesh_pos", "node_type", "velocity", "pressure"],
        "features": {
            "cells": {"dtype": "int32", "shape": [1, n_cells, 3], "type": "static"},
            "mesh_pos": {"dtype": "float32", "shape": [1, n_nodes, 2], "type": "static"},
            "node_type": {"dtype": "int32", "shape": [1, n_nodes, 1], "type": "static"},
            "velocity": {"dtype": "float32", "shape": [t_len, n_nodes, 2], "type": "dynamic"},
            "pressure": {"dtype": "float32", "shape": [t_len, n_nodes, 1], "type": "dynamic"},
        },
    }
    (tmp_path / "meta.json").write_text(json.dumps(meta))

    for split in ("train", "valid", "test"):
        payloads = []
        for _ in range(n_traj):
            cells = rng.randint(0, n_nodes, (1, n_cells, 3)).astype(np.int32)
            feats = {
                "cells": [cells.tobytes()],
                "mesh_pos": [rng.rand(1, n_nodes, 2).astype(np.float32).tobytes()],
                "node_type": [rng.randint(0, 7, (1, n_nodes, 1)).astype(np.int32).tobytes()],
                "velocity": [rng.randn(t_len, n_nodes, 2).astype(np.float32).tobytes()],
                "pressure": [rng.randn(t_len, n_nodes, 1).astype(np.float32).tobytes()],
            }
            payloads.append(_example(feats))
        _write_tfrecord(tmp_path / f"{split}.tfrecord", payloads)
    return meta


def test_tfrecord_example_roundtrip(tmp_path):
    _make_dataset(tmp_path)
    payloads = list(read_tfrecord(tmp_path / "train.tfrecord"))
    assert len(payloads) == 2
    ex = parse_example(payloads[0])
    assert set(ex) == {"cells", "mesh_pos", "node_type", "velocity", "pressure"}
    vel = np.frombuffer(b"".join(ex["velocity"]), np.float32)
    assert vel.shape == (6 * 8 * 2,)


def test_convert_and_builder(tmp_path):
    _make_dataset(tmp_path)
    out = tmp_path / "cylinder_flow.h5"
    cylinder_flow(str(tmp_path), str(out))

    from fourierflow_tpu.builders import CylinderFlowBuilder

    builder = CylinderFlowBuilder(str(out), batch_size=2)
    batch = builder.sample_batch()
    assert batch["velocity"].shape == (2, 8, 2)
    assert batch["cells"].shape == (2, 6, 3)
    eval_batch = next(builder.val_batches())
    assert eval_batch["velocity"].shape[1] == 4  # t_len - 2 steps
    assert builder.batches_per_epoch == 4  # 2 trajs * 4 steps / 2


def test_triangles_to_edges_bidirectional():
    faces = jnp.array([[0, 1, 2], [1, 2, 3], [-1, -1, -1]], dtype=jnp.int32)
    senders, receivers = triangles_to_edges(faces)
    assert senders.shape == (18,)
    pairs = {
        (int(s), int(r))
        for s, r in zip(senders, receivers)
        if int(s) >= 0 and int(r) >= 0
    }
    # 5 unique undirected edges -> 10 directed pairs
    expected = {(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)}
    assert {tuple(sorted(p, reverse=True)) for p in pairs} == {
        tuple(sorted(e, reverse=True)) for e in expected
    }
    assert len(pairs) == 10


def test_graph_processor_forward():
    rng = np.random.RandomState(0)
    n, e = 10, 24
    node_feats = jnp.asarray(rng.randn(n, 11).astype(np.float32))
    edge_feats = jnp.asarray(rng.randn(e, 3).astype(np.float32))
    senders = jnp.asarray(rng.randint(0, n, e).at if False else rng.randint(0, n, e))
    receivers = jnp.asarray(rng.randint(0, n, e))
    model = GraphProcessor(n_layers=2, latent_size=16, output_dim=2)
    params = model.init(jax.random.PRNGKey(0), node_feats, edge_feats, senders, receivers)
    out = model.apply(params, node_feats, edge_feats, senders, receivers)
    assert out.shape == (10, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_padded_edges_do_not_contribute():
    """Messages on -1-padded edges must not change any node's output."""
    rng = np.random.RandomState(1)
    n = 6
    node_feats = jnp.asarray(rng.randn(n, 11).astype(np.float32))
    model = GraphProcessor(n_layers=1, latent_size=8, output_dim=2)

    senders = jnp.array([0, 1, -1, -1])
    receivers = jnp.array([1, 0, -1, -1])
    edge_feats = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), node_feats, edge_feats, senders, receivers)
    out_pad = model.apply(params, node_feats, edge_feats, senders, receivers)

    # Same graph without the padding rows' (random) features: zero them.
    edge_feats2 = edge_feats.at[2:].set(123.0)  # junk in padded rows
    out_junk = model.apply(params, node_feats, edge_feats2, senders, receivers)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_junk), rtol=1e-5)


def test_meshgraphnet_training_loss_decreases(tmp_path):
    _make_dataset(tmp_path, n_traj=2, t_len=6, n_nodes=8, n_cells=6)
    out = tmp_path / "cf.h5"
    cylinder_flow(str(tmp_path), str(out))

    from fourierflow_tpu.builders import CylinderFlowBuilder

    builder = CylinderFlowBuilder(str(out), batch_size=4)
    routine = MeshGraphNetRoutine(n_layers=2, latent_size=16)
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())

    step = jax.jit(routine.train_step)
    losses = []
    for _ in range(15):
        for batch in builder.train_batches(np.random.default_rng(0)):
            state, metrics = step(state, batch)
            losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0]

    valid = jax.jit(routine.valid_step)
    routine.rollout_steps = 4
    logs = jax.jit(routine.valid_step)(state, next(builder.val_batches()))
    assert np.isfinite(float(logs["loss"]))
