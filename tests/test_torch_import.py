"""Reference (torch Lightning) checkpoint import — VERDICT r1 item 9.

Builds a synthetic checkpoint with the reference's exact state_dict
naming (fourierflow/modules/factorized_fno/grid_2d.py module tree,
including the duplicated shared-parameter paths torch state_dict emits),
imports it, and checks:

1. the converted tree key/shape-matches the flax model's own init;
2. the model forward under imported weights matches the golden oracle
   (the straight-from-the-math reference forward in test_golden_parity)
   consuming the same weights — i.e. reference weights produce reference
   outputs in this framework;
3. weight-norm folding: torch's g * v/||v||_row equals our folded kernel;
4. normalizer buffers land in NormalizerState with matching mean/std;
5. mismatched checkpoints are rejected with a clear error.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fourierflow_tpu.models import FNOFactorized2DBlock
from fourierflow_tpu.utils.torch_import import (
    convert_ffno_state_dict,
    import_reference_checkpoint,
    load_reference_state_dict,
)
from test_golden_parity import _eff, _oracle_forward

MODES, WIDTH, IN_DIM, N_LAYERS, FACTOR = 4, 8, 3, 2, 2


def _t(rng, *shape):
    return torch.tensor(rng.randn(*shape).astype(np.float32))


def _wn_linear(rng, sd, base, in_f, out_f):
    v = rng.randn(out_f, in_f).astype(np.float32)
    g = np.abs(rng.randn(out_f, 1)).astype(np.float32) + 0.5
    sd[f"{base}.weight_v"] = torch.tensor(v)
    sd[f"{base}.weight_g"] = torch.tensor(g)
    sd[f"{base}.bias"] = _t(rng, out_f)


def _ff(rng, sd, base, dim, factor):
    _wn_linear(rng, sd, f"{base}.layers.0.0", dim, dim * factor)
    _wn_linear(rng, sd, f"{base}.layers.1.0", dim * factor, dim)


def _make_reference_state_dict(rng):
    """share_weight=True, share_fork=False, ff_weight_norm=True — the
    flagship configuration's structure."""
    sd = {}
    _wn_linear(rng, sd, "conv.in_proj", IN_DIM, WIDTH)
    wy = _t(rng, WIDTH, WIDTH, MODES, 2) * 0.2
    wx = _t(rng, WIDTH, WIDTH, MODES, 2) * 0.2
    sd["conv.fourier_weight.0"] = wy
    sd["conv.fourier_weight.1"] = wx
    for i in range(N_LAYERS):
        # torch state_dict duplicates shared params under every path the
        # module is reachable by — reproduce that.
        sd[f"conv.spectral_layers.{i}.fourier_weight.0"] = wy
        sd[f"conv.spectral_layers.{i}.fourier_weight.1"] = wx
        _ff(rng, sd, f"conv.spectral_layers.{i}.backcast_ff", WIDTH, FACTOR)
    _wn_linear(rng, sd, "conv.out.0", WIDTH, 128)
    _wn_linear(rng, sd, "conv.out.1", 128, 1)
    sd["normalizer.sum"] = _t(rng, IN_DIM) * 10
    sd["normalizer.sum_squared"] = torch.abs(_t(rng, IN_DIM)) * 100 + 50
    sd["normalizer.count"] = torch.tensor(37.0)
    return sd


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    rng = np.random.RandomState(3)
    sd = _make_reference_state_dict(rng)
    path = tmp_path_factory.mktemp("ckpt") / "ref.ckpt"
    torch.save({"state_dict": sd, "epoch": 11, "hyper_parameters": {"modes": MODES}}, path)
    return str(path)


def _model():
    return FNOFactorized2DBlock(
        modes=MODES, width=WIDTH, input_dim=IN_DIM, n_layers=N_LAYERS,
        share_weight=True, factor=FACTOR, ff_weight_norm=True,
    )


def test_import_matches_model_tree_and_oracle(ckpt_path):
    sd = load_reference_state_dict(ckpt_path)
    variables, norm = convert_ffno_state_dict(sd)

    model = _model()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, IN_DIM).astype(np.float32))
    init = model.init(jax.random.PRNGKey(0), x)

    # Exact structural match with the model's own parameter tree.
    want = jax.tree_util.tree_map(lambda a: a.shape, init)
    got = jax.tree_util.tree_map(lambda a: np.shape(a), variables)
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(want)
    assert jax.tree_util.tree_leaves(got) == jax.tree_util.tree_leaves(want)

    imported = jax.tree.map(jnp.asarray, variables)
    out = model.apply(imported, x)["forecast"]
    want_out = _oracle_forward(imported, x, N_LAYERS, MODES, share_weight=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out), rtol=2e-4, atol=2e-5)

    assert norm is not None and norm["count"] == 37.0


def test_weight_norm_folding_matches_torch(ckpt_path):
    sd = load_reference_state_dict(ckpt_path)
    variables, _ = convert_ffno_state_dict(sd)
    v = sd["conv.in_proj.weight_v"]  # [out, in]
    g = sd["conv.in_proj.weight_g"]  # [out, 1]
    want = (g * v / np.linalg.norm(v, axis=1, keepdims=True)).T  # -> [in, out]
    kern, bias = _eff(variables["params"]["in_proj"])
    np.testing.assert_allclose(np.asarray(kern), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bias), sd["conv.in_proj.bias"])


def test_import_into_train_state(ckpt_path):
    from fourierflow_tpu.layers import normalizer_init
    from fourierflow_tpu.routines.base import TrainState

    model = _model()
    x = jnp.zeros((1, 16, 16, IN_DIM))
    init = model.init(jax.random.PRNGKey(1), x)
    state = TrainState(
        params=init, opt_state=None, normalizer=normalizer_init(IN_DIM), step=0
    )
    state = import_reference_checkpoint(ckpt_path, state)

    sd = load_reference_state_dict(ckpt_path)
    want_mean = sd["conv.fourier_weight.0"].reshape(-1)
    got = np.asarray(state.params["params"]["fourier_weight_y"]).reshape(-1)
    np.testing.assert_allclose(got, want_mean, rtol=1e-6)

    count = float(sd["normalizer.count"])
    np.testing.assert_allclose(
        np.asarray(state.normalizer.mean), sd["normalizer.sum"] / count, rtol=1e-5
    )
    var = sd["normalizer.sum_squared"] / count - (sd["normalizer.sum"] / count) ** 2
    np.testing.assert_allclose(
        np.asarray(state.normalizer.std), np.sqrt(np.maximum(var, 0)), rtol=1e-4
    )


def test_cli_test_with_torch_checkpoint(ckpt_path, tmp_path):
    """`test --torch-checkpoint ref.ckpt` evaluates a reference Lightning
    checkpoint end to end (the reference's test command consumes lightning
    .ckpt files directly, ref commands/test.py:51-60)."""
    import os

    import h5py
    import yaml

    from fourierflow_tpu.commands.test import main as test_main

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
                "modes": MODES, "width": WIDTH, "input_dim": IN_DIM,
                "n_layers": N_LAYERS, "share_weight": True,
                "factor": FACTOR, "ff_weight_norm": True,
            },
            "n_steps": 4,
            "max_accumulations": 100,
        },
        "trainer": {"max_epochs": 1},
    }
    cfg_path = str(tmp_path / "exp" / "config.yaml")
    os.makedirs(os.path.dirname(cfg_path))
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    logs = test_main(cfg_path, torch_checkpoint=ckpt_path)
    assert np.isfinite(logs["test_loss"])


def test_zongyi_import_matches_model_tree():
    """FNOZongyi2DBlock checkpoints (reference zongyi_fno/grid_2d.py torch
    naming) auto-detect and convert; fourier weights transfer verbatim and
    plain-Linear kernels transpose into flax layout."""
    from fourierflow_tpu.models import FNOZongyi2DBlock
    from fourierflow_tpu.utils.torch_import import convert_reference_state_dict

    rng = np.random.RandomState(5)
    width, modes, n_layers, in_dim = 6, 3, 2, 4
    sd = {}

    def lin(base, i, o):
        sd[f"{base}.weight"] = _t(rng, o, i)
        sd[f"{base}.bias"] = _t(rng, o)

    lin("conv.in_proj", in_dim, width)
    for i in range(n_layers):
        sd[f"conv.spectral_layers.{i}.fourier_weight.0"] = _t(rng, width, width, modes, modes, 2)
        sd[f"conv.spectral_layers.{i}.fourier_weight.1"] = _t(rng, width, width, modes, modes, 2)
        lin(f"conv.spectral_layers.{i}.linear", width, width)
    lin("conv.feedforward.0", width, 128)
    lin("conv.feedforward.2", 128, 1)
    sd_np = {k: np.asarray(v) for k, v in sd.items()}

    variables, norm = convert_reference_state_dict(sd_np)
    assert norm is None

    model = FNOZongyi2DBlock(modes1=modes, modes2=modes, width=width,
                             input_dim=in_dim, n_layers=n_layers, dropout=0.0)
    x = jnp.zeros((1, 12, 12, in_dim))
    init = model.init(jax.random.PRNGKey(0), x)
    want = jax.tree_util.tree_map(lambda a: a.shape, init)
    got = jax.tree_util.tree_map(lambda a: np.shape(a), variables)
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(want)
    assert jax.tree_util.tree_leaves(got) == jax.tree_util.tree_leaves(want)

    np.testing.assert_allclose(
        variables["params"]["layers_0"]["fourier_weight_1"],
        sd_np["conv.spectral_layers.0.fourier_weight.0"],
    )
    np.testing.assert_allclose(
        variables["params"]["in_proj"]["kernel"], sd_np["conv.in_proj.weight"].T
    )

    # Converted weights run through the model.
    out = model.apply(jax.tree.map(jnp.asarray, variables), x)
    if isinstance(out, dict):
        out = out["forecast"]
    assert np.isfinite(np.asarray(out)).all()


def test_mismatched_checkpoint_rejected(ckpt_path, tmp_path):
    sd = load_reference_state_dict(ckpt_path)
    # Wrong width: model expects WIDTH=8, checkpoint says 16.
    model = FNOFactorized2DBlock(
        modes=MODES, width=16, input_dim=IN_DIM, n_layers=N_LAYERS,
        share_weight=True, factor=FACTOR, ff_weight_norm=True,
    )
    from fourierflow_tpu.routines.base import TrainState

    init = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, IN_DIM)))
    state = TrainState(params=init, opt_state=None, normalizer=None, step=0)
    with pytest.raises(ValueError, match="mismatch"):
        import_reference_checkpoint(ckpt_path, state)
