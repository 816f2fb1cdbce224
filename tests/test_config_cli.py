"""Config system + CLI tests, including loading the REFERENCE repo's own
experiment YAMLs through the translation table."""

import os

import h5py
import jax
import numpy as np
import pytest
import yaml

from fourierflow_tpu.config import apply_overrides, instantiate, load_config
from fourierflow_tpu.models import FNOFactorized2DBlock
from fourierflow_tpu.commands.train import build_routine

REF = "/root/reference/experiments"


def test_resolvers(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_ROOT", "/data/root")
    p = tmp_path / "c.yaml"
    p.write_text(
        "a: ${oc.env:MY_ROOT}/x\n"
        'b: "${eval: 2 * pi}"\n'
        'c: "${oc.env:NOPE,fallback}"\n'
        "d:\n  nested: 3\n"
    )
    cfg = load_config(str(p), overrides=["d.nested=7", "d.new=hi"])
    assert cfg["a"] == "/data/root/x"
    assert abs(cfg["b"] - 2 * np.pi) < 1e-9
    assert cfg["c"] == "fallback"
    assert cfg["d"]["nested"] == 7
    assert cfg["d"]["new"] == "hi"


def test_yaml12_float_semantics(tmp_path):
    """Bare scientific notation must parse as float (YAML 1.2), not string
    (PyYAML's YAML 1.1) — every reference data YAML writes ``viscosity:
    1e-3``, and OmegaConf (the reference's loader) reads it as a float.
    Caught on the real TPU: stable_time_step got the string and crashed."""
    p = tmp_path / "c.yaml"
    p.write_text(
        "viscosity: 1e-3\n"
        "drag: -1E+2\n"
        "plain_int: 16\n"
        "dotted: 2.5e-4\n"
        "version_str: 1e3x\n"
        "name: spectral\n"
    )
    cfg = load_config(str(p))
    assert cfg["viscosity"] == 1e-3 and isinstance(cfg["viscosity"], float)
    assert cfg["drag"] == -100.0
    assert cfg["plain_int"] == 16 and isinstance(cfg["plain_int"], int)
    assert cfg["dotted"] == 2.5e-4
    assert cfg["version_str"] == "1e3x"
    assert cfg["name"] == "spectral"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_flagship_config_loads(monkeypatch):
    """The reference's own flagship YAML instantiates through the
    translation table (model + adapted optimizer/scheduler)."""
    monkeypatch.setenv("DATA_ROOT", "/nonexistent")
    cfg = load_config(f"{REF}/torus_li/markov/24_layers/config.yaml")
    model = instantiate(cfg["routine"]["conv"])
    assert isinstance(model, FNOFactorized2DBlock)
    assert model.n_layers == 24 and model.modes == 16 and model.share_weight

    routine_cfg = dict(cfg["routine"])
    routine_cfg["conv"] = {
        "_target_": "fourierflow_tpu.models.FNOFactorized2DBlock",
        "modes": 4, "width": 8, "input_dim": 3, "n_layers": 2,
    }
    routine = build_routine(routine_cfg)
    assert routine.noise_std == 0.01
    assert routine.n_steps == 10
    # the adapted optimizer trains
    x = jax.numpy.ones((2, 16, 16, 1))
    state = routine.init(jax.random.PRNGKey(0), {"x": x})
    state, m = jax.jit(routine.train_step)(state, {"x": x, "y": x}, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["train_loss"]))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_zongyi_config_loads(monkeypatch):
    monkeypatch.setenv("DATA_ROOT", "/nonexistent")
    cfg = load_config(f"{REF}/torus_li/zongyi/4_layers/config.yaml")
    model = instantiate(cfg["routine"]["conv"])
    assert model.modes1 == 12 and model.width == 20


def test_cli_generate_and_train_end_to_end(tmp_path):
    """Full CLI flow: generate a tiny dataset, then train from a config."""
    from fourierflow_tpu.commands.__main__ import main as cli

    data_path = str(tmp_path / "ns.h5")
    cli([
        "generate", "navier-stokes", data_path,
        "--n-train", "8", "--n-valid", "4", "--n-test", "4",
        "--s", "16", "--t", "0.5", "--steps", "12", "--delta", "0.01",
        "--mu", "0.001", "--batch-size", "8",
    ])
    with h5py.File(data_path) as f:
        assert f["train/u"].shape == (8, 16, 16, 12)
        assert np.isfinite(f["train/u"][...]).all()

    # merge the three splits into one array for the simple markov builder
    with h5py.File(data_path) as f:
        u = np.concatenate([f["train/u"][...], f["test/u"][...]], axis=0)
    flat = str(tmp_path / "ns_flat.h5")
    with h5py.File(flat, "w") as f:
        f.create_dataset("u", data=u)

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
            "n_steps": 4,
            "max_accumulations": 100,
            "optimizer": {
                "_target_": "functools.partial",
                "_args_": ["${get_method: torch.optim.AdamW}"],
                "lr": 0.001, "weight_decay": 0.0001,
            },
        },
        "trainer": {"max_epochs": 2},
    }
    cfg_path = str(tmp_path / "exp" / "config.yaml")
    os.makedirs(os.path.dirname(cfg_path))
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    cli(["train", cfg_path])

    ckpt_root = os.path.join(tmp_path, "exp", "checkpoints")
    trials = os.listdir(ckpt_root)
    assert len(trials) == 1
    files = os.listdir(os.path.join(ckpt_root, trials[0]))
    assert "best.ckpt" in files and "metrics.jsonl" in files


def test_force_resume_guard(tmp_path):
    """Run-directory hygiene (reference utils/path.py:55-72): a second run
    of the same trial must raise unless --force or --resume is given, and
    --resume restarts from last.ckpt."""
    import pytest

    from fourierflow_tpu.builders.synthetic import (
        gaussian_random_field,
        solve_navier_stokes_2d,
    )
    from fourierflow_tpu.commands.train import ExistingExperimentFound
    from fourierflow_tpu.commands.train import main as train_main

    import h5py
    import jax

    w0 = gaussian_random_field(jax.random.PRNGKey(0), 12, 16, n_dims=2)
    sol, _ = solve_navier_stokes_2d(
        np.asarray(w0), 1e-3, t_end=1.0, delta_t=1e-2, record_steps=8, force="li"
    )
    data_path = tmp_path / "ns.h5"
    with h5py.File(data_path, "w") as f:
        f.create_dataset("u", data=sol)

    cfg_path = tmp_path / "exp" / "config.yaml"
    cfg_path.parent.mkdir()
    cfg_path.write_text(f"""
builder:
  _target_: fourierflow_tpu.builders.NSMarkovBuilder
  data_path: {data_path}
  train_size: 8
  test_size: 4
  batch_size: 4
routine:
  _target_: fourierflow_tpu.routines.Grid2DMarkovRoutine
  conv:
    _target_: fourierflow_tpu.models.FNOFactorized2DBlock
    modes: 4
    width: 8
    n_layers: 1
    input_dim: 3
  n_steps: 3
  max_accumulations: 50
trainer:
  max_epochs: 2
""")
    train_main(str(cfg_path), no_test=True)
    with pytest.raises(ExistingExperimentFound):
        train_main(str(cfg_path), no_test=True)
    train_main(str(cfg_path), no_test=True, resume=True)  # continues


def test_cli_test_command_auto_checkpoint(tmp_path):
    """`test` locates the newest trial checkpoint automatically (reference
    commands/test.py glob semantics)."""
    from fourierflow_tpu.builders.synthetic import (
        gaussian_random_field,
        solve_navier_stokes_2d,
    )
    from fourierflow_tpu.commands.__main__ import main as cli

    import jax

    w0 = gaussian_random_field(jax.random.PRNGKey(0), 12, 16, n_dims=2)
    sol, _ = solve_navier_stokes_2d(
        np.asarray(w0), 1e-3, t_end=1.0, delta_t=1e-2, record_steps=8, force="li"
    )
    data_path = tmp_path / "ns.h5"
    with h5py.File(data_path, "w") as f:
        f.create_dataset("u", data=sol)
    cfg_path = tmp_path / "exp" / "config.yaml"
    cfg_path.parent.mkdir()
    cfg_path.write_text(f"""
builder:
  _target_: fourierflow_tpu.builders.NSMarkovBuilder
  data_path: {data_path}
  train_size: 8
  test_size: 4
  batch_size: 4
routine:
  _target_: fourierflow_tpu.routines.Grid2DMarkovRoutine
  conv:
    _target_: fourierflow_tpu.models.FNOFactorized2DBlock
    modes: 4
    width: 8
    n_layers: 1
    input_dim: 3
  n_steps: 3
  max_accumulations: 50
trainer:
  max_epochs: 2
""")
    cli(["train", str(cfg_path), "--no-test"])
    cli(["test", str(cfg_path)])  # auto-locates the checkpoint


def test_plot_table_from_metrics(tmp_path):
    """plot.table rebuilds result tables from local metrics.jsonl files
    (the reference pulls these from the author's wandb account)."""
    import json

    from fourierflow_tpu.commands import plot as plot_mod

    run_dir = tmp_path / "exp" / "checkpoints" / "trial-0-123"
    run_dir.mkdir(parents=True)
    with open(run_dir / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"train_loss": 0.5, "valid_loss": 0.4}) + "\n")
        f.write(json.dumps({"test_loss": 0.31}) + "\n")
    text = plot_mod.table(str(tmp_path), keys=["test_loss", "valid_loss"])
    assert "0.31" in text and "0.4" in text

    from fourierflow_tpu.viz.heatmap import midpoint_norm

    arr = np.array([[-2.0, 0.0], [1.0, 2.0]])
    normed = midpoint_norm(arr)
    assert normed.min() >= 0 and normed.max() <= 1
    assert normed[0, 1] == 0.5


def test_plot_reference_tables_and_figures(tmp_path):
    """The paper-table/figure surface (reference plot.py:617-731, 854-995)
    rebuilt from local logs: reference_table aggregates trials into
    N-MSE x100 mean/min/max + params + hours, layers/parameters/
    step-losses/correlation emit figures."""
    import json
    import time as _time

    from fourierflow_tpu.commands import plot as plot_mod
    from fourierflow_tpu.commands.__main__ import main as cli

    # Two trials of one group + one of another, reference naming.
    t0 = 1_000_000.0
    runs = {
        ("torus_li/markov/4_layers", 0): [
            {"time": t0, "n_params": 1234, "train_loss": 0.5},
            {"time": t0 + 7200, "test_loss": 0.10,
             "test_step_losses": [0.05, 0.1, 0.2],
             "test_correlations": [0.99, 0.97, 0.9], "test_time_until": 2.0},
        ],
        ("torus_li/markov/4_layers", 1): [
            {"time": t0, "n_params": 1234},
            {"time": t0 + 3600, "test_loss": 0.20},
        ],
        ("torus_li/markov/8_layers", 0): [
            {"time": t0, "n_params": 2468},
            {"time": t0 + 3600, "test_loss": 0.08},
        ],
    }
    for (group, trial), records in runs.items():
        d = tmp_path / group / "checkpoints" / f"trial-{trial}-123"
        d.mkdir(parents=True)
        with open(d / "metrics.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    text = plot_mod.reference_table("torus_li", str(tmp_path))
    # mean/min/max over the two trials, x100
    assert "15.00" in text and "10.00" in text and "20.00" in text
    assert "1,234" in text
    assert "F-FNO-WS" in text
    # missing rows keep the reference table shape
    assert "FNO (reproduced)" in text and "—" in text

    latex = plot_mod.reference_table("torus_li", str(tmp_path), latex=True)
    assert "\\multirow" in latex and "\\midrule" in latex

    out = plot_mod.layers(str(tmp_path), out_path=str(tmp_path / "layers.png"))
    out2 = plot_mod.parameters(str(tmp_path), out_path=str(tmp_path / "p.png"))
    out3 = plot_mod.step_losses(str(tmp_path), out_path=str(tmp_path / "s.png"))
    out4 = plot_mod.correlation(str(tmp_path), out_path=str(tmp_path / "c.png"))
    import os

    for o in (out, out2, out3, out4):
        if isinstance(o, str):  # matplotlib present -> file written
            assert os.path.exists(o)

    # CLI dispatch: `plot table torus_li`
    cli(["plot", "table", "torus_li", "--root", str(tmp_path),
         "--out-path", str(tmp_path / "table.md")])
    assert (tmp_path / "table.md").exists()


def test_plot_ablation(tmp_path, capsys):
    """`plot ablation` renders final campaign metrics vs a swept scalar
    from campaign_log.jsonl files (reference plot_varying_step_size,
    plot.py:458-525)."""
    import json as _json

    from fourierflow_tpu.commands.__main__ import main as cli

    inputs = []
    for val, tu, loss in ((0.0, 1.5, 0.02), (0.01, 3.9, 0.03), (0.1, 2.2, 0.08)):
        path = tmp_path / f"log_{val}.jsonl"
        with open(path, "w") as f:
            f.write(_json.dumps({"epoch": 1, "train_loss": loss * 2}) + "\n")
            f.write(
                _json.dumps(
                    {"epoch": 2, "train_loss": loss, "valid_time_until": tu}
                )
                + "\n"
            )
        inputs.append(f"{val}={path}")
    cli(["plot", "ablation", "--inputs", *inputs, "--xlabel", "noise std",
         "--out-path", str(tmp_path / "abl.png")])
    out = capsys.readouterr().out
    assert "| noise std |" in out and "3.9" in out and "0.08" in out
    import os

    if os.path.exists(str(tmp_path / "abl.png")):
        assert os.path.getsize(str(tmp_path / "abl.png")) > 0


def test_plot_tradeoff(tmp_path, capsys):
    """`plot tradeoff` joins campaign logs with inference timings into the
    N-MSE-vs-runtime figure (reference
    plot_pde_inference_performance_tradeoff, plot.py:1026-1054)."""
    import json as _json
    import os

    from fourierflow_tpu.commands.__main__ import main as cli

    runs = tmp_path / "runs"
    os.makedirs(runs)
    specs = [("ffno4", "ffno", 4, 0.00028, 0.08),
             ("ffno24", "ffno", 24, 0.0013, 0.04),
             ("zongyi4", "zongyi", 4, 0.00041, 0.21)]
    for tag, arch, n_layers, t, loss in specs:
        os.makedirs(runs / tag, exist_ok=True)
        with open(runs / tag / "campaign_log.jsonl", "w") as f:
            f.write(_json.dumps({"epoch": 1, "valid_loss": loss * 2}) + "\n")
            f.write(_json.dumps({"epoch": 2, "valid_loss": loss}) + "\n")
        with open(runs / "inference_times.jsonl", "a") as f:
            f.write(_json.dumps({"tag": tag, "arch": arch,
                                 "n_layers": n_layers,
                                 "inference_time": t}) + "\n")
    cli(["plot", "tradeoff", str(tmp_path),
         "--out-path", str(tmp_path / "tradeoff.png"),
         "--inputs", "dns64=0.0011"])
    out = capsys.readouterr().out
    assert "| ffno24 | ffno | 24 | 4.00 |" in out
    assert "dns64 (DNS)" in out
    if os.path.exists(str(tmp_path / "tradeoff.png")):
        assert os.path.getsize(str(tmp_path / "tradeoff.png")) > 0


def test_plot_stepsize(tmp_path, capsys):
    """`plot stepsize` combines the k-sweep campaign logs with the DNS
    dt-sweep JSON into the varying-step-size figure (reference
    plot_varying_step_size, plot.py:458-525)."""
    import json as _json
    import os

    from fourierflow_tpu.commands.__main__ import main as cli

    inputs = []
    for step, tu in ((0.07, 4.1), (0.28, 3.9), (0.56, 2.2)):
        path = tmp_path / f"k_{step}.jsonl"
        with open(path, "w") as f:
            f.write(_json.dumps({"epoch": 1, "valid_time_until": tu / 2}) + "\n")
            f.write(_json.dumps({"epoch": 2, "valid_time_until": tu}) + "\n")
        inputs.append(f"{step}={path}")
    dns = tmp_path / "stepsize_dns.json"
    dns.write_text(_json.dumps([
        {"step_size": 0.00022, "time_until": 12.0},
        {"step_size": 0.0035, "time_until": 11.5},
        {"step_size": 0.028, "time_until": 0.9},
    ]))
    cli(["plot", "stepsize", str(dns), "--inputs", *inputs,
         "--out-path", str(tmp_path / "ss.png")])
    out = capsys.readouterr().out
    assert "| F-FNO | 0.28 | 3.9 |" in out
    assert "| DNS | 0.028 | 0.9 |" in out
    if os.path.exists(str(tmp_path / "ss.png")):
        assert os.path.getsize(str(tmp_path / "ss.png")) > 0


def test_plot_superresolution(tmp_path, capsys):
    """`plot superresolution` renders the super-res transfer figure and
    table from a superres_results.json (scripts/superres_eval.py output;
    reference plot.py:66-75, 341-456)."""
    import json as _json

    from fourierflow_tpu.commands.__main__ import main as cli

    results = {
        "32": {"loss": 0.9, "corr": 0.61, "time_until": 1.4},
        "64": {"loss": 0.6, "corr": 0.79, "time_until": 3.6},
        "128": {"loss": 0.7, "corr": 0.74, "time_until": 2.5},
    }
    path = tmp_path / "superres_results.json"
    path.write_text(_json.dumps(results))
    cli(["plot", "superresolution", str(path),
         "--out-path", str(tmp_path / "sr.png")])
    out = capsys.readouterr().out
    assert "64² (train)" in out and "3.60" in out
    import os

    if os.path.exists(str(tmp_path / "sr.png")):  # matplotlib present
        assert os.path.getsize(str(tmp_path / "sr.png")) > 0


def test_plot_energy_spectrum_and_flows(tmp_path):
    """`plot energy` / `plot flows` (reference plot.py:256-307, 139-170)
    over local HDF5 files, both layouts: a single-mode velocity field
    concentrates its shell-averaged spectrum at that wavenumber, and the
    vorticity-derived path agrees with the velocity path."""
    import h5py

    from fourierflow_tpu.commands import plot as plot_mod
    from fourierflow_tpu.commands.__main__ import main as cli

    n, t_len, k0 = 32, 6, 5
    x = np.arange(n) * 2 * np.pi / n
    # u = sin(k0 y), v = 0 -> vorticity w = dv/dx - du/dy = -k0 cos(k0 y)
    u = np.tile(np.sin(k0 * x)[None, :], (n, 1))
    w = np.tile(-k0 * np.cos(k0 * x)[None, :], (n, 1))
    vx = np.broadcast_to(u[None, :, :, None], (2, n, n, t_len)).astype(np.float32)
    vy = np.zeros_like(vx)
    wt = np.broadcast_to(w[None, :, :, None], (2, n, n, t_len)).astype(np.float32)

    # predictions layout: [sample, x, y, time]
    preds = tmp_path / "preds.h5"
    with h5py.File(preds, "w") as f:
        f["vorticity"], f["vx"], f["vy"] = wt, vx, vy
        f["time"] = np.arange(t_len, dtype=np.float32)
    # generated-trajectory layout: [traj, time, x, y], vorticity only
    traj = tmp_path / "traj.h5"
    with h5py.File(traj, "w") as f:
        f["vorticity"] = np.moveaxis(wt, -1, 1)
        f["time"] = np.arange(t_len, dtype=np.float32)

    k, e_vel = plot_mod._energy_spectrum(wt, vx, vy)
    _, e_vort = plot_mod._energy_spectrum(wt)
    # all energy in shell k0; E = mean(u^2)/2 = 1/4
    assert int(np.argmax(e_vel)) == k0
    assert e_vel[k0] == pytest.approx(0.25, rel=1e-5)
    assert e_vel[k0] / e_vel.sum() > 0.999
    np.testing.assert_allclose(e_vort, e_vel, rtol=1e-5, atol=1e-9)

    cli(["plot", "energy", "--inputs", f"model={preds}", f"dns={traj}",
         "--tail", "4", "--out-path", str(tmp_path / "energy.png")])
    cli(["plot", "flows", "--inputs", f"model={preds}", f"dns={traj}",
         "--times", "0", "2", "5", "--out-path", str(tmp_path / "samples.png")])
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        pass
    else:
        assert (tmp_path / "energy.png").exists()
        assert (tmp_path / "samples.png").exists()


@pytest.fixture()
def tiny_experiment(tmp_path):
    """A tiny trained markov experiment on synthetic data (shared by the
    infer/sample CLI tests)."""
    from fourierflow_tpu.builders.synthetic import (
        gaussian_random_field,
        solve_navier_stokes_2d,
    )
    from fourierflow_tpu.commands.__main__ import main as cli

    import jax

    w0 = gaussian_random_field(jax.random.PRNGKey(0), 12, 16, n_dims=2)
    sol, _ = solve_navier_stokes_2d(
        np.asarray(w0), 1e-3, t_end=1.0, delta_t=1e-2, record_steps=8, force="li"
    )
    data_path = tmp_path / "ns.h5"
    with h5py.File(data_path, "w") as f:
        f.create_dataset("u", data=sol)
    cfg_path = tmp_path / "exp" / "config.yaml"
    cfg_path.parent.mkdir()
    cfg_path.write_text(f"""
builder:
  _target_: fourierflow_tpu.builders.NSMarkovBuilder
  data_path: {data_path}
  train_size: 8
  test_size: 4
  batch_size: 4
routine:
  _target_: fourierflow_tpu.routines.Grid2DMarkovRoutine
  conv:
    _target_: fourierflow_tpu.models.FNOFactorized2DBlock
    modes: 4
    width: 8
    n_layers: 1
    input_dim: 3
  n_steps: 3
  max_accumulations: 50
  step_size: 0.1
trainer:
  max_epochs: 1
""")
    cli(["train", str(cfg_path), "--no-test"])
    return cfg_path


def test_train_pretrained_path_finetune(tiny_experiment, tmp_path):
    """``pretrained_path`` fine-tuning (reference commands/train.py:70-72):
    a second experiment starts from the first one's checkpoint weights
    (fresh optimizer/step), not from random init."""
    import glob

    import jax

    from fourierflow_tpu.commands.train import main as train_main
    from fourierflow_tpu.config import load_config
    from fourierflow_tpu.trainers.callbacks import load_inference_state

    ckpt = sorted(glob.glob(
        str(tiny_experiment.parent / "checkpoints" / "trial-0-*" / "best.ckpt")))[-1]

    cfg2 = tmp_path / "exp2" / "config.yaml"
    cfg2.parent.mkdir()
    cfg2.write_text(tiny_experiment.read_text()
                    + f"pretrained_path: {ckpt}\n")
    trainer, state = train_main(str(cfg2), no_test=True)

    # the fine-tuned run's starting weights == the pretrained checkpoint's
    cfg = load_config(str(tiny_experiment))
    from fourierflow_tpu.commands.train import build_routine
    from fourierflow_tpu.config import instantiate

    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)
    template = routine.init(jax.random.PRNGKey(7231), builder.sample_batch())
    pre = load_inference_state(ckpt, template)
    # max_epochs=1 means the fine-tune run only executed the epoch-0
    # normalizer-accumulation pass: its params must BE the pretrained
    # weights (a silent fallback to random init would fail this), with
    # the carried-over normalizer stats advanced by one more epoch.
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(pre.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(pre.normalizer.count) > 0
    assert float(state.normalizer.count) > float(pre.normalizer.count)


def test_cli_infer_and_sample(tiny_experiment, tmp_path):
    from fourierflow_tpu.commands.infer import main as infer_main
    from fourierflow_tpu.commands.sample import main as sample_main

    t = infer_main(str(tiny_experiment), n_steps=5)
    assert np.isfinite(t) and t > 0

    out = sample_main(
        str(tiny_experiment), out_path=str(tmp_path / "sample.pkl")
    )
    import pickle

    with open(out, "rb") as f:
        batch, preds = pickle.load(f)
    assert np.isfinite(np.asarray(preds)).all()
