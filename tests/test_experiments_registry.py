"""Registry-wide smoke tests: every experiment config must resolve — its
builder target imports, and its routine node instantiates (constructing
the actual model module) without needing data on disk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierflow_tpu.commands.train import build_routine
from fourierflow_tpu.config import _interpolate, resolve_symbol
from fourierflow_tpu.experiments import experiment_names, get_experiment
from fourierflow_tpu.routines.base import Routine


def test_registry_covers_reference_families():
    names = experiment_names()
    assert len(names) >= 256
    for required in [
        "torus_li/markov/24_layers",
        "torus_li/zongyi/4_layers",
        "torus_li/ablation/teacher_forcing/24_layers",
        "airfoil/ffno/8_layers",
        "airfoil/fcno/4_layers",
        "airfoil/geo-fno-big/24_layers",
        "pipe/ffno-shared/16_layers",
        "elasticity/geo-fno/4_layers",
        "elasticity/ffno/24_layers",
        "plasticity/fcno/12_layers",
        "plasticity/geo-fno/4_layers",
        "torus_kochkov/ffno/grid_sizes/64",
        "torus_kochkov/ffno/superresolution/train_with_x64/256",
        "torus_kochkov/ffno/step_sizes/64/0.25",
        "torus_kochkov/ffno/ablation/fno++/128",
        "torus_kochkov/fcno/grid_sizes/64",
        "torus_kochkov/learned_interpolation/rollout/x64",
        "torus_vis/01_baseline",
        "torus_vis_force/06_shared_all_no_fork",
        "cylinder_flow/baseline",
    ]:
        assert required in names, f"missing {required}"


def test_registry_covers_every_reference_config_name():
    """Exact-name parity: every experiment AND data config path shipped by
    the reference (its 256 experiments/**/config.yaml + 57 data/**/*.yaml,
    snapshotted in tests/data/reference_config_names.txt) must resolve in
    this registry under the same name, so a reference user can paste any
    config path they already use."""
    import os

    fixture = os.path.join(
        os.path.dirname(__file__), "data", "reference_config_names.txt"
    )
    with open(fixture) as f:
        required = [line.strip() for line in f if line.strip()]
    assert len(required) == 313
    names = set(experiment_names())
    missing = [r for r in required if r not in names]
    assert not missing, f"missing reference config names: {missing[:20]}"


@pytest.mark.parametrize(
    "name", [n for n in experiment_names() if not n.startswith("data/")]
)
def test_experiment_instantiates(name):
    cfg = get_experiment(name)
    cfg = _interpolate(cfg, root=cfg)

    # Builder target must import (actual construction needs data files).
    builder_target = cfg["builder"]["_target_"]
    assert resolve_symbol(builder_target) is not None

    # The routine — including its model — must construct.
    routine = build_routine(cfg["routine"])
    assert isinstance(routine, Routine)
    assert routine.model is not None or hasattr(routine, "sim_grid")


def test_train_command_resolves_registry_names():
    from fourierflow_tpu.config import load_config

    cfg = load_config("torus_li/markov/4_layers")
    assert cfg["routine"]["conv"]["n_layers"] == 4
    cfg = load_config("torus_li/markov/4_layers", ["routine.conv.n_layers=2"])
    assert cfg["routine"]["conv"]["n_layers"] == 2
    with pytest.raises(KeyError):
        load_config("torus_li/markov/3_layers")


def test_learned_interpolation_trains_on_synthetic_data():
    """Short end-to-end run of the native learned-interpolation solver:
    the training loss against a synthetic smooth trajectory decreases."""
    from fourierflow_tpu.routines import LearnedInterpolatorRoutine

    from fourierflow_tpu.routines.base import make_optimizer

    routine = LearnedInterpolatorRoutine(
        size=32, dt=0.001, unroll_length=2, features=8, n_cnn_layers=2,
        inner_steps=2, outer_steps=3,
        optimizer=make_optimizer(lr=3e-3, weight_decay=0.0),
    )
    rng = np.random.RandomState(0)
    b, s, L = 2, 32, 2
    inputs = {
        "vx": rng.randn(b, s, s).astype(np.float32) * 0.1,
        "vy": rng.randn(b, s, s).astype(np.float32) * 0.1,
    }
    # Student-teacher: targets from the same solver under different
    # (teacher) parameters, so the loss is actually reducible. The
    # correction head is zero-initialized (untrained model == central
    # scheme), so explicitly randomize the teacher's head.
    state = routine.init(jax.random.PRNGKey(0), (inputs, None))
    teacher = routine.init(jax.random.PRNGKey(7), (inputs, None))
    tparams = jax.tree.map(lambda p: p, teacher.params)
    out_kernel = tparams["params"]["coeff_net"]["out"]["kernel"]
    tparams["params"]["coeff_net"]["out"]["kernel"] = (
        0.05 * jax.random.normal(jax.random.PRNGKey(8), out_kernel.shape)
    )
    teacher = teacher.replace(params=tparams)
    _, (tvx, tvy) = routine._unroll_snapshots(
        teacher.params, jnp.asarray(inputs["vx"]), jnp.asarray(inputs["vy"]),
        L, 1, lambda a, b: (a, b),
    )
    outputs = {
        "vx": np.moveaxis(np.asarray(tvx), 0, -1),
        "vy": np.moveaxis(np.asarray(tvy), 0, -1),
    }

    step = jax.jit(routine.train_step)
    losses = []
    for _ in range(30):
        state, metrics = step(state, (inputs, outputs))
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0]


def test_learned_interpolation_projection_is_divergence_free():
    from fourierflow_tpu.models.learned_interpolation import pressure_projection

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(16, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(16, 16).astype(np.float32))
    h = 2 * np.pi / 16
    u2, v2 = pressure_projection(u, v, h)
    div = (u2 - jnp.roll(u2, 1, 0)) / h + (v2 - jnp.roll(v2, 1, 1)) / h
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-4)
    # Idempotent: projecting again changes nothing.
    u3, v3 = pressure_projection(u2, v2, h)
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u2), atol=1e-5)


def test_learned_interpolation_valid_step():
    from fourierflow_tpu.routines import LearnedInterpolatorRoutine

    routine = LearnedInterpolatorRoutine(
        size=32, dt=0.001, unroll_length=2, features=8, n_cnn_layers=2,
        inner_steps=2, outer_steps=3,
    )
    rng = np.random.RandomState(0)
    inputs = {
        "vx": rng.randn(2, 32, 32).astype(np.float32) * 0.1,
        "vy": rng.randn(2, 32, 32).astype(np.float32) * 0.1,
    }
    state = routine.init(jax.random.PRNGKey(0), (inputs, None))
    batch = {
        "vx": inputs["vx"],
        "vy": inputs["vy"],
        "targets": rng.randn(2, 32, 32, 3).astype(np.float32),
        "times": np.tile(np.arange(3, dtype=np.float32), (2, 1)),
    }
    logs = jax.jit(routine.valid_step)(state, batch)
    assert np.isfinite(float(logs["loss"]))
    assert logs["correlations"].shape == (3,)


def test_data_generation_configs_resolve():
    """The data/ namespace: generation configs for initial conditions,
    trajectories, baselines, time-step sweeps, learned-interpolation data
    (reference:data/kolmogorov/re_1000/**)."""
    from fourierflow_tpu.config import instantiate, _interpolate

    names = [n for n in experiment_names() if n.startswith("data/")]
    assert len(names) >= 25
    for required in [
        "data/kolmogorov/re_1000/initial_conditions/train",
        "data/kolmogorov/re_1000/trajectories/test",
        "data/kolmogorov/re_1000/short_trajectories/valid",
        "data/kolmogorov/re_1000/baselines/1024",
        "data/kolmogorov/re_1000/time_steps/x8",
        "data/kolmogorov/re_1000/learned_interpolation/64",
    ]:
        assert required in names

    cfg = get_experiment("data/kolmogorov/re_1000/baselines/64")
    cfg = _interpolate(cfg, root=cfg)
    grid = instantiate(cfg["sim_grid"])
    assert grid.shape == (64, 64)
    step_fn = instantiate(cfg["step_fn"])
    assert callable(step_fn)


def test_generate_from_registry_name(tmp_path, monkeypatch):
    """`generate kolmogorov` accepts a registry name (tiny override)."""
    import os

    from fourierflow_tpu.commands.generate import kolmogorov as gen

    monkeypatch.chdir(tmp_path)
    gen(
        "data/kolmogorov/re_1000/baselines/32",
        overrides=[
            "n_trajectories=1", "outer_steps=2", "warmup_steps=0",
            "inner_steps=1", "init_path=",
        ],
    )
    import glob

    import h5py

    files = glob.glob(str(tmp_path / "data" / "**" / "*.h5"), recursive=True)
    assert files
    with h5py.File(files[0]) as f:
        assert np.isfinite(f["vorticity"][...]).all()


def test_generate_3d_projection_from_registry(tmp_path, monkeypatch):
    """CLI: tiny 3D projection-method generation resolves and runs."""
    import glob

    import h5py

    from fourierflow_tpu.commands.generate import kolmogorov as gen

    monkeypatch.chdir(tmp_path)
    gen(
        "data/kolmogorov/three_dimensions/initial_conditions/test",
        overrides=[
            "n_trajectories=1", "warmup_steps=2", "inner_steps=1",
            "sim_grid.shape=[16, 16, 16]",
            "out_sizes=[{'size': 16, 'k': 1}, {'size': 8, 'k': 1}]",
        ],
    )
    files = sorted(glob.glob(str(tmp_path / "data" / "**" / "*.h5"), recursive=True))
    assert files
    with h5py.File(files[-1]) as f:
        assert set(f.keys()) >= {"vx", "vy", "vz"}
        assert f["vx"].shape[-3:] == (16, 16, 16) or f["vx"].shape[-3:] == (8, 8, 8)
        assert np.isfinite(f["vx"][...]).all()


def test_generate_decaying_spectral_and_projection(tmp_path, monkeypatch):
    """Decaying turbulence (no forcing/drag): both methods run from the
    registry at toy scale, and energy decays."""
    import glob

    import h5py

    from fourierflow_tpu.commands.generate import kolmogorov as gen

    monkeypatch.chdir(tmp_path)
    common = ["n_trajectories=1", "outer_steps=6", "inner_steps=2",
              "warmup_steps=0", "sim_grid.shape=[32, 32]",
              "out_sizes=[{'size': 32, 'k': 1}]", "init_path="]
    gen("data/kolmogorov/decaying/baselines/64", overrides=common)
    gen("data/kolmogorov/decaying/projection/64", overrides=common)
    files = sorted(glob.glob(str(tmp_path / "data" / "**" / "*_32_1.h5"),
                             recursive=True))
    assert len(files) == 2
    for f in files:
        with h5py.File(f) as h:
            vx = h["vx"][...]
            energy = (vx**2).sum(axis=(-2, -1))[0]
            assert np.isfinite(vx).all()
            # Unforced flow: no energy injection (the viscous decay itself
            # is ~2-3% over this tiny horizon, below discretization noise,
            # so assert stability rather than strict monotone decay).
            assert energy[-1] < 1.2 * energy[0]


def test_kochkov_per_grid_reference_specs():
    """The torus_kochkov configs carry the reference's literal per-grid
    batch/modes/accumulation/epoch values
    (reference:experiments/torus_kochkov/ffno/grid_sizes/{64,128,256}/
    config.yaml and predictions/, ablation/fno++/, multi_resolution/)."""
    g64 = get_experiment("torus_kochkov/ffno/grid_sizes/64")
    assert g64["builder"]["batch_size"] == 32
    assert g64["routine"]["conv"]["modes"] == 16
    assert g64["routine"]["max_accumulations"] == 2421
    assert g64["trainer"]["max_epochs"] == 11

    g128 = get_experiment("torus_kochkov/ffno/grid_sizes/128")
    assert g128["builder"]["batch_size"] == 8
    assert g128["routine"]["conv"]["modes"] == 32
    assert g128["routine"]["max_accumulations"] == 9684

    g256 = get_experiment("torus_kochkov/ffno/grid_sizes/256")
    assert g256["builder"]["batch_size"] == 2
    assert g256["routine"]["conv"]["modes"] == 64
    assert g256["routine"]["max_accumulations"] == 38736
    assert g256["trainer"]["max_epochs"] == 21

    # predictions/256 evaluates with the modes-32 checkpoint shape.
    p256 = get_experiment("torus_kochkov/ffno/predictions/256")
    assert p256["routine"]["conv"]["modes"] == 32
    assert p256["builder"]["batch_size"] == 12
    assert p256["routine"]["max_accumulations"] == 6456

    # fno++ halves batches at the big grids.
    pp = get_experiment("torus_kochkov/ffno/ablation/fno++/256")
    assert pp["builder"]["batch_size"] == 1
    assert pp["routine"]["max_accumulations"] == 77472


def test_kochkov_step_size_cadence_and_budgets():
    """Sub-snapshot step sizes (0.25, 0.5) read the fine-cadence _1
    files at dataset stride 1/2; every k carries the reference's literal
    accumulation count (reference:experiments/torus_kochkov/ffno/
    step_sizes/64/{k}/config.yaml)."""
    KOCH_STEP = 0.0002191401125550916

    quarter = get_experiment("torus_kochkov/ffno/step_sizes/64/0.25")
    train = quarter["builder"]["train_dataset"]
    assert train["path"].endswith("train_64_1.nc")
    assert train["k"] == 1
    assert quarter["routine"]["max_accumulations"] == 2440
    assert quarter["routine"]["step_size"] == pytest.approx(
        KOCH_STEP * 64 * 0.25)

    half = get_experiment("torus_kochkov/ffno/step_sizes/64/0.5")
    assert half["builder"]["train_dataset"]["k"] == 2
    assert half["builder"]["train_dataset"]["path"].endswith("train_64_1.nc")

    k40 = get_experiment("torus_kochkov/ffno/step_sizes/64/40")
    assert k40["builder"]["train_dataset"]["path"].endswith("train_64_4.nc")
    assert k40["builder"]["train_dataset"]["k"] == 40
    assert k40["routine"]["max_accumulations"] == 2421  # the ref's quirk
    # ...and the matching scheduler quirk: cosine pinned to 24010 steps
    # ("2401 per epoch", step_sizes/64/40/config.yaml:64), not
    # acc*(epochs-1)=24210 like its siblings.
    assert (k40["routine"]["scheduler"]["scheduler"]["num_training_steps"]
            == 24010)
    k20 = get_experiment("torus_kochkov/ffno/step_sizes/64/20")
    assert (k20["routine"]["scheduler"]["scheduler"]["num_training_steps"]
            == 24210)

    k80 = get_experiment("torus_kochkov/ffno/step_sizes/64/80")
    assert k80["routine"]["max_accumulations"] == 2361


def test_multi_resolution_eval_grids():
    """x32_x64 and x64_x128 evaluate at 64^2 but x32_x128 evaluates at
    128^2 (reference:experiments/torus_kochkov/ffno/multi_resolution/
    x32_x128/config.yaml reads valid_128_4.nc/test_128_4.nc)."""
    for key, eval_size in (("x32_x64", 64), ("x64_x128", 64),
                           ("x32_x128", 128)):
        cfg = get_experiment(f"torus_kochkov/ffno/multi_resolution/{key}")
        valid = cfg["builder"]["valid_dataset"]
        test = cfg["builder"]["test_dataset"]
        assert valid["path"].endswith(f"valid_{eval_size}_4.nc"), key
        assert valid["init_path"].endswith(f"valid_{eval_size}.nc"), key
        assert test["path"].endswith(f"test_{eval_size}_4.nc"), key
        # the 32^2 correlation files ride along at every pair
        assert valid["corr_path"].endswith("valid_32_4.nc"), key


def test_learned_interpolation_per_size_specs():
    """LI rollout dt halves per grid doubling with matching file stride
    and validation cadence (reference:experiments/torus_kochkov/
    learned_interpolation/rollout/x{32,64,128,256}/config.yaml)."""
    expect = {32: (0.014024967203525862, 4, 8),
              64: (0.007012483601762931, 2, 16),
              128: (0.0035062418008814655, 1, 32)}
    for size, (dt, k, inner) in expect.items():
        cfg = get_experiment(
            f"torus_kochkov/learned_interpolation/rollout/x{size}")
        assert cfg["routine"]["dt"] == pytest.approx(dt)
        assert cfg["routine"]["inner_steps"] == inner
        assert cfg["builder"]["train_dataset"]["k"] == k
        assert cfg["builder"]["valid_dataset"]["inner_steps"] == inner
        assert "/trajectories/" in cfg["builder"]["train_dataset"]["path"]

    # x256 is the odd one out: short_trajectories/ files (incl. the 32^2
    # corr files) and a routine that takes 64 sub-steps per recorded
    # snapshot while the dataset cadence stays 32
    # (reference rollout/x256/config.yaml:13-31,41).
    x256 = get_experiment("torus_kochkov/learned_interpolation/rollout/x256")
    assert x256["routine"]["dt"] == pytest.approx(0.001753121)
    assert x256["routine"]["inner_steps"] == 64
    assert x256["builder"]["valid_dataset"]["inner_steps"] == 32
    assert "/short_trajectories/" in x256["builder"]["train_dataset"]["path"]
    assert x256["builder"]["valid_dataset"]["corr_path"].endswith(
        "short_trajectories/valid_32_1.nc")
    assert x256["builder"]["test_dataset"]["corr_path"].endswith(
        "short_trajectories/test_32_1.nc")


def test_superresolution_validates_at_train_grid():
    """Superresolution configs validate at the training grid and test at
    the eval grid, with `end` applied to the test split only
    (reference:experiments/torus_kochkov/ffno/superresolution/*)."""
    cfg = get_experiment(
        "torus_kochkov/ffno/superresolution/train_with_x32_x64/128")
    valid = cfg["builder"]["valid_dataset"]
    test = cfg["builder"]["test_dataset"]
    assert valid["path"].endswith("valid_64_4.nc")
    assert test["path"].endswith("test_128_4.nc")
    assert "end" not in valid and test["end"] == 800


def test_torus_li_ablation_budgets_and_teacher_forcing():
    """zongyi_markov ablations train the reference's 500 epochs; the
    teacher-forcing ablation is the Zongyi ROLLOUT conv (12/12/20), not
    the markov conv (reference:experiments/torus_li/ablation/)."""
    zm = get_experiment("torus_li/ablation/zongyi_markov/4_layers")
    assert zm["trainer"]["max_epochs"] == 500
    tf = get_experiment("torus_li/ablation/teacher_forcing/4_layers")
    assert tf["routine"]["teacher_forcing"] is True
    conv = tf["routine"]["conv"]
    assert conv["_target_"].endswith("FNOZongyi2DBlock")
    assert (conv["modes1"], conv["modes2"], conv["width"]) == (12, 12, 20)
