"""Serving export: StableHLO rollout artifacts (utils/serving.py).

The exported artifact bakes in params + normalizer stats; deserializing
and calling it must reproduce the live rollout exactly — and the CLI
`export` command must produce a loadable artifact end to end.
"""

import os

import h5py
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from fourierflow_tpu.models import FNOFactorized2DBlock
from fourierflow_tpu.routines import Grid2DMarkovRoutine
from fourierflow_tpu.utils.serving import (
    export_rollout,
    load_exported,
    make_rollout_fn,
)


def _routine_and_state(use_velocity=False, grid=16):
    in_dim = 5 if use_velocity else 3
    model = FNOFactorized2DBlock(
        modes=4, width=8, input_dim=in_dim, n_layers=2,
        share_weight=True, factor=2, ff_weight_norm=True,
    )
    routine = Grid2DMarkovRoutine(
        model, n_steps=4, max_accumulations=100, use_velocity=use_velocity
    )
    rng = np.random.RandomState(0)
    batch = {"x": rng.randn(2, grid, grid, 1).astype(np.float32),
             "y": rng.randn(2, grid, grid, 1).astype(np.float32)}
    state = routine.init(jax.random.PRNGKey(0), batch)
    state = routine.accumulate_step(state, batch)
    return routine, state


def test_export_roundtrip_matches_live_rollout(tmp_path):
    routine, state = _routine_and_state()
    n_steps, grid = 3, 16
    serve = make_rollout_fn(routine, state, n_steps)
    rng = np.random.RandomState(1)
    w0 = jnp.asarray(rng.randn(2, grid, grid, 1).astype(np.float32))
    live = serve(w0)
    assert live.shape == (2, grid, grid, n_steps)

    path = str(tmp_path / "rollout.stablehlo")
    export_rollout(routine, state, path, n_steps=n_steps, batch_size=2, size=grid)
    assert os.path.getsize(path) > 0

    loaded = load_exported(path)
    got = loaded(w0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(live), rtol=1e-5, atol=1e-6)


def test_export_matches_eval_rollout_predictions(tmp_path):
    """The serving fn reproduces routine.rollout's predictions (same
    feature rebuild + normalizer + feedback), with velocity features."""
    routine, state = _routine_and_state(use_velocity=True)
    grid, n_steps = 16, 4
    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randn(2, grid, grid, n_steps + 1).astype(np.float32))
    preds, _, _ = jax.jit(routine.rollout)(state, {"data": data})

    serve = make_rollout_fn(routine, state, n_steps)
    w0 = data[..., 0][..., None]
    got = serve(w0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(preds), rtol=2e-4, atol=1e-5)


def test_export_lowers_unfused_ff(tmp_path):
    """Artifacts must carry plain XLA dots, never a pallas_call: Pallas
    cannot cross-lower to other platforms (a fused-FF model exported
    multi-platform from a TPU host raised 'Only interpret mode is
    supported on CPU backend'), and the fused kernel only wins in the
    backward. An ambient ff_fuse_override('always') (which puts the kernel
    in the trace even on CPU) must lose to the export's own 'never'."""
    from jax import export as jax_export

    from fourierflow_tpu.layers import ff_fuse_override

    routine, state = _routine_and_state()
    rng = np.random.RandomState(0)
    path = str(tmp_path / "fused.stablehlo")
    with ff_fuse_override("always"):
        export_rollout(routine, state, path, n_steps=2, batch_size=1, size=16,
                       platforms=["cpu", "tpu"])
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    mlir = exported.mlir_module()
    assert "pallas" not in mlir and "mosaic" not in mlir

    # and the artifact reproduces the live rollout (both unfused here —
    # fuse='auto' resolves off on the CPU backend; fused-vs-artifact
    # agreement is an on-chip check, see RESULTS.md serving section)
    w0 = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    live = jax.jit(make_rollout_fn(routine, state, 2))(w0)
    got = load_exported(path)(w0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(live),
                               rtol=2e-4, atol=1e-5)


def test_export_precision_baked_into_artifact(tmp_path):
    """precision='highest' must be recorded on the artifact's dots: at TPU
    default precision two equivalent lowerings differ ~0.5%/matmul, so
    reproducible serving exports pin full-f32 dots."""
    from jax import export as jax_export

    routine, state = _routine_and_state()
    path = str(tmp_path / "hi.stablehlo")
    export_rollout(routine, state, path, n_steps=2, batch_size=1, size=16,
                   precision="highest")
    with open(path, "rb") as f:
        mlir = jax_export.deserialize(f.read()).mlir_module()
    assert "HIGHEST" in mlir
    out = load_exported(path)(jnp.zeros((1, 16, 16, 1)))
    assert np.asarray(out).shape == (1, 16, 16, 2)


def test_multiplatform_export_from_cpu_host(tmp_path):
    """platforms=['cpu','tpu'] lowers for BOTH backends on the CPU host —
    export where you build, serve on the TPU fleet."""
    routine, state = _routine_and_state()
    path = str(tmp_path / "multi.stablehlo")
    export_rollout(routine, state, path, n_steps=2, batch_size=1, size=16,
                   platforms=["cpu", "tpu"])
    fn = load_exported(path)
    out = fn(jnp.zeros((1, 16, 16, 1)))
    assert np.asarray(out).shape == (1, 16, 16, 2)


def test_cli_export_end_to_end(tmp_path):
    from fourierflow_tpu.commands.__main__ import main as cli

    rng = np.random.RandomState(0)
    flat = str(tmp_path / "ns_flat.h5")
    with h5py.File(flat, "w") as f:
        f.create_dataset("u", data=rng.randn(12, 16, 16, 10).astype(np.float32))
    cfg = {
        "builder": {
            "_target_": "fourierflow_tpu.builders.NSMarkovBuilder",
            "data_path": flat,
            "train_size": 8, "test_size": 4, "ssr": 1, "batch_size": 4,
        },
        "routine": {
            "_target_": "fourierflow_tpu.routines.Grid2DMarkovRoutine",
            "conv": {
                "_target_": "fourierflow_tpu.models.FNOFactorized2DBlock",
                "modes": 4, "width": 8, "input_dim": 3, "n_layers": 2,
            },
            "n_steps": 4, "max_accumulations": 100,
        },
    }
    cfg_path = str(tmp_path / "exp" / "config.yaml")
    os.makedirs(os.path.dirname(cfg_path))
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = str(tmp_path / "artifact.stablehlo")
    cli(["export", cfg_path, out, "--n-steps", "2", "--batch-size", "1",
         "--size", "16"])
    fn = load_exported(out)
    w0 = jnp.zeros((1, 16, 16, 1))
    assert np.asarray(fn(w0)).shape == (1, 16, 16, 2)
