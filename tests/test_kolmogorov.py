"""Tests for the native Kolmogorov pipeline: spectral conversions and
downsampling (modeled on the reference's own tests/test_conversions.py),
the IMEX stepper, and end-to-end generation + dataset loading."""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from fourierflow_tpu.builders.kolmogorov import (
    KolmogorovBuilder,
    KolmogorovMarkovDataset,
    KolmogorovTrajectoryDataset,
    filtered_velocity_field,
)
from fourierflow_tpu.ops.fourier import rfft2
from fourierflow_tpu.utils import (
    Grid,
    downsample_vorticity,
    downsample_vorticity_hat,
    grid_correlation,
    velocity_to_vorticity_fd,
    vorticity_to_velocity_solve,
)
from fourierflow_tpu.utils.equations import (
    NavierStokes2D,
    crank_nicolson_rk4,
    repeated,
    stable_time_step,
)

TWO_PI = 2 * np.pi
DOMAIN = ((0, TWO_PI), (0, TWO_PI))


def _smooth_field(key, n, kp=4.0):
    grid = Grid(shape=(n, n), domain=DOMAIN)
    vx, vy = filtered_velocity_field(key, grid, maximum_velocity=5.0, peak_wavenumber=kp)
    return velocity_to_vorticity_fd(vx, vy, grid), grid


def test_vorticity_velocity_spectral_roundtrip_exact():
    """The spectral curl of the streamfunction-solve velocities recovers
    the vorticity exactly (the mathematical identity behind
    vorticity_to_velocity)."""
    from fourierflow_tpu.utils.grids import rfft_mesh

    w, grid = _smooth_field(jax.random.PRNGKey(0), 64)
    w = w - w.mean()
    solve = vorticity_to_velocity_solve(grid)
    w_hat = rfft2(w, axes=(0, 1))
    vxh, vyh = solve(w_hat)
    kx, ky = rfft_mesh(grid.shape, DOMAIN)
    w_hat2 = 2j * np.pi * (kx * np.asarray(vyh) - ky * np.asarray(vxh))
    np.testing.assert_allclose(w_hat2, np.asarray(w_hat), rtol=1e-3, atol=2e-2)


def test_vorticity_velocity_fd_roundtrip():
    """vorticity -> spectral velocity -> fd curl recovers the vorticity on
    a smooth field (reference tests/test_conversions.py:9-40; their 0.9999
    threshold holds for well-resolved fields — we use peak wavenumber 2 on
    a 128^2 grid)."""
    w, grid = _smooth_field(jax.random.PRNGKey(0), 128, kp=2.0)
    solve = vorticity_to_velocity_solve(grid)
    out = downsample_vorticity_hat(rfft2(w, axes=(0, 1)), solve, grid, grid)
    corr = np.corrcoef(np.asarray(out["vorticity"]).ravel(), np.asarray(w).ravel())[0, 1]
    # The reference reaches 0.9999 on decayed 2048^2 turbulence; our
    # synthetic field carries relatively more high-k energy, where the
    # fd-vs-spectral curl discrepancy lives.
    assert corr > 0.995


def test_repeated_vs_direct_downsampling():
    """Direct N->32 vs repeated halving (reference
    tests/test_conversions.py:43-80; thresholds loosened for the smaller
    256 starting grid)."""
    w, grid = _smooth_field(jax.random.PRNGKey(1), 256, kp=4.0)
    w = w[None, ..., None]  # [B, X, Y, T]

    direct = {n: np.asarray(downsample_vorticity(w, n, DOMAIN))[0, ..., 0] for n in (128, 64, 32)}

    repeated_w = w
    rep = {}
    for n in (128, 64, 32):
        repeated_w = np.asarray(downsample_vorticity(repeated_w, n, DOMAIN))
        rep[n] = repeated_w[0, ..., 0]

    # Decreasing thresholds with depth, like the reference's
    # [0.9999999 ... 0.927] ladder (scaled for the rougher synthetic field).
    thresholds = {128: 0.999, 64: 0.98, 32: 0.89}
    for n in (128, 64, 32):
        corr = np.corrcoef(direct[n].ravel(), rep[n].ravel())[0, 1]
        assert corr > thresholds[n], (n, corr)


def test_stable_time_step_matches_reference_value():
    """The 2048^2 Re=1000 config's commented dt (train.yaml:1)."""
    grid = Grid(shape=(2048, 2048), domain=DOMAIN)
    dt = stable_time_step(7.0, 0.5, 1e-3, grid)
    np.testing.assert_allclose(dt, 0.0002191401125550916, rtol=1e-9)


def test_cn_rk4_linear_decay():
    """With a single Fourier mode the advection vanishes, so the solution
    decays exactly at rate nu*m^2 + drag on the 2pi domain."""
    n = 32
    grid = Grid(shape=(n, n), domain=DOMAIN)
    xs, _ = grid.mesh(offset=(0, 0))
    w0 = jnp.cos(xs)  # mode m=1 in x
    nu, drag = 0.01, 0.1
    eq = NavierStokes2D(viscosity=nu, grid=grid, drag=drag, smooth=True)
    dt = 0.01
    steps = 200
    step = crank_nicolson_rk4(eq, dt)
    from fourierflow_tpu.ops.fourier import irfft2

    w_hat = rfft2(w0, axes=(0, 1))
    w_hat = jax.jit(repeated(step, steps))(w_hat)
    w = np.asarray(irfft2(w_hat, s=(n, n), axes=(0, 1)))
    t = dt * steps
    expected = np.cos(np.asarray(xs)) * np.exp(-(nu * 1.0 + drag) * t)
    np.testing.assert_allclose(w, expected, rtol=1e-3, atol=1e-4)


def test_filtered_velocity_field_properties():
    grid = Grid(shape=(64, 64), domain=DOMAIN)
    vx, vy = filtered_velocity_field(jax.random.PRNGKey(2), grid, 7.0, 4.0)
    speed = np.sqrt(np.asarray(vx) ** 2 + np.asarray(vy) ** 2)
    np.testing.assert_allclose(speed.max(), 7.0, rtol=1e-4)
    # divergence-free in spectral space
    from fourierflow_tpu.utils.grids import rfft_mesh

    kx, ky = rfft_mesh(grid.shape, DOMAIN)
    div = 2j * np.pi * (kx * np.asarray(rfft2(vx, axes=(0, 1))) + ky * np.asarray(rfft2(vy, axes=(0, 1))))
    assert np.abs(div).max() < 1e-2 * np.abs(np.asarray(rfft2(vx, axes=(0, 1)))).max()


@pytest.fixture(scope="module")
def kolmogorov_files(tmp_path_factory):
    """Generate a tiny Kolmogorov dataset end-to-end through the CLI."""
    d = tmp_path_factory.mktemp("kol")
    base = {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {
            "_target_": "fourierflow_tpu.utils.Grid",
            "shape": [64, 64],
            "domain": "${domain}",
        },
        "time_step": 0.005,
        "method": "pseudo_spectral",
        "step_fn": {
            "_target_": "jax_cfd.spectral.time_stepping.crank_nicolson_rk4",
            "equation": {
                "_target_": "fourierflow.utils.equations.NavierStokes2D",
                "grid": "${sim_grid}",
                "viscosity": 1e-2,
                "drag": 0.1,
                "smooth": True,
                "forcing_fn": {
                    "_target_": "functools.partial",
                    "_args_": ["${get_method:jax_cfd.base.forcings.simple_turbulence_forcing}"],
                    "constant_magnitude": 1,
                    "constant_wavenumber": 4,
                    "linear_coefficient": 0,
                },
            },
            "time_step": "${time_step}",
        },
        "downsample_fn": "${get_method:fourierflow.builders.kolmogorov.downsample_vorticity}",
        "n_trajectories": 2,
        "max_velocity": 7.0,
        "peak_wavenumber": 4.0,
        "seed": 1234,
        "inner_steps": 4,
        "outer_steps": 6,
        "warmup_steps": 0,
        "out_sizes": [{"size": 64, "k": 1}, {"size": 32, "k": 1}, {"size": 32, "k": 2}],
    }
    # initial conditions config: warmup only
    init_cfg = dict(base)
    init_cfg.update({"outer_steps": 0, "warmup_steps": 3,
                     "out_sizes": [{"size": 64, "k": 1}, {"size": 32, "k": 1}]})
    with open(d / "train.yaml", "w") as f:
        yaml.safe_dump(base, f)
    with open(d / "init.yaml", "w") as f:
        yaml.safe_dump(init_cfg, f)

    from fourierflow_tpu.commands.generate import kolmogorov as gen

    gen(str(d / "init.yaml"))
    gen(str(d / "train.yaml"))
    return d


def test_generate_kolmogorov_files(kolmogorov_files):
    d = kolmogorov_files
    with h5py.File(d / "train_64_1.h5") as f:
        assert f["vorticity"].shape == (2, 6, 64, 64)
        assert np.isfinite(f["vorticity"][...]).all()
        assert f["time"].shape == (6,)
        np.testing.assert_allclose(f["time"][0], 0.005 * 4)
    with h5py.File(d / "train_32_2.h5") as f:
        assert f["vorticity"].shape == (2, 3, 32, 32)
    with h5py.File(d / "init_64.h5") as f:
        assert f["vorticity"].shape == (2, 64, 64)
        assert np.isfinite(f["vorticity"][...]).all()


def test_kolmogorov_datasets_and_training(kolmogorov_files):
    d = kolmogorov_files
    train_ds = KolmogorovMarkovDataset(str(d / "train_64_1.h5"), k=1)
    assert len(train_ds) == 2 * 5
    batch = train_ds.sample(np.arange(4))
    assert batch["x"].shape == (4, 64, 64, 1)
    assert batch["vx"].shape == (4, 64, 64, 1)

    eval_ds = KolmogorovTrajectoryDataset(
        init_path=str(d / "init_64.h5"),
        path=str(d / "train_64_1.h5"),
        corr_path=str(d / "train_32_1.h5"),
        k=1,
    )
    item = eval_ds.sample(np.arange(2))
    assert item["data"].shape == (2, 64, 64, 7)
    assert item["corr_data"].shape == (2, 32, 32, 7)
    assert item["times"].shape == (2, 7)

    builder = KolmogorovBuilder(train_ds, eval_ds, eval_ds, batch_size=4)

    # Train the markov routine with velocity recovery on this data.
    from fourierflow_tpu.models import FNOFactorized2DBlock
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer

    model = FNOFactorized2DBlock(modes=5, width=8, input_dim=5, n_layers=2)
    routine = Grid2DMarkovRoutine(
        model,
        n_steps=4,
        use_velocity=True,
        max_accumulations=100,
        optimizer=make_optimizer(lr=1e-3),
        step_size=0.02,
    )
    trainer = Trainer(max_epochs=2, seed=0, data_parallel=False, fast_loop=False)
    state = trainer.fit(routine, builder)
    assert np.isfinite(trainer.logs["valid_loss"])
    assert "valid_time_until" in trainer.logs


def test_warmup_then_trajectory_records_evolving_states():
    """warmup_steps>0 with outer_steps>0 must warm the state and THEN
    record a time-varying trajectory. Regression: this combination used to
    early-return the single warmed snapshot, which the HDF5 writer then
    silently broadcast across the whole time axis (constant 'trajectories'
    — catastrophic for training)."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        downsample_vorticity_snapshot,
        generate_kolmogorov,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import kolmogorov_forcing_fn
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
                        forcing_fn=kolmogorov_forcing_fn)
    kwargs = dict(
        sim_grid=grid, out_sizes=[{"size": 32, "k": 1}],
        method="pseudo_spectral", step_fn=crank_nicolson_rk4(eq, 0.005),
        downsample_fn=downsample_vorticity_snapshot,
        seed=jax.random.PRNGKey(9), inner_steps=2, outer_steps=4,
    )
    warm, _ = generate_kolmogorov(warmup_steps=3, **kwargs)
    w = np.asarray(warm[(32, 1)]["vorticity"])
    assert w.shape == (4, 32, 32)
    assert np.abs(w[1] - w[0]).max() > 1e-3, "trajectory must evolve in time"

    # The recorded trajectory starts after the warmup: its first snapshot
    # equals the (warmup+1)-outer-step state of a cold run.
    cold, _ = generate_kolmogorov(warmup_steps=0, **{**kwargs, "outer_steps": 7})
    wc = np.asarray(cold[(32, 1)]["vorticity"])
    np.testing.assert_allclose(w[0], wc[3], rtol=1e-4, atol=1e-4)

    # warmup-only (outer_steps=0) still returns the single snapshot
    ic, _ = generate_kolmogorov(warmup_steps=3, **{**kwargs, "outer_steps": 0})
    assert np.asarray(ic[(32, 1)]["vorticity"]).shape == (32, 32)
    np.testing.assert_allclose(
        np.asarray(ic[(32, 1)]["vorticity"]), wc[2], rtol=1e-4, atol=1e-4)


def test_batched_generation_matches_sequential():
    """vmap-batched trajectory generation (stacked seeds) must reproduce
    the per-trajectory results — one dispatch per batch instead of per
    trajectory."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        downsample_vorticity_snapshot,
        generate_kolmogorov,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import kolmogorov_forcing_fn
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
                        forcing_fn=kolmogorov_forcing_fn)
    kwargs = dict(
        sim_grid=grid,
        out_sizes=[{"size": 32, "k": 1}, {"size": 16, "k": 1}],
        method="pseudo_spectral",
        step_fn=crank_nicolson_rk4(eq, 0.005),
        downsample_fn=downsample_vorticity_snapshot,
        inner_steps=2, outer_steps=3, warmup_steps=0,
    )
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    seq = [generate_kolmogorov(seed=k, **kwargs)[0] for k in keys]
    bat, _ = generate_kolmogorov(seed=keys, **kwargs)
    for key in bat:
        for name in bat[key]:
            got = np.asarray(bat[key][name])
            want = np.stack([np.asarray(s[key][name]) for s in seq])
            # vmap reassociates reductions, so agreement is to fp tolerance
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batched_generation_cli(tmp_path):
    """generation_batch in the data config drives the batched writer."""
    import yaml as _yaml

    from fourierflow_tpu.commands.generate import kolmogorov as gen

    cfg = {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {"_target_": "fourierflow_tpu.utils.Grid",
                     "shape": [32, 32], "domain": "${domain}"},
        "time_step": 0.005, "method": "pseudo_spectral",
        "step_fn": {"_target_": "jax_cfd.spectral.time_stepping.crank_nicolson_rk4",
                    "equation": {"_target_": "fourierflow.utils.equations.NavierStokes2D",
                                 "grid": "${sim_grid}", "viscosity": 1e-2,
                                 "drag": 0.1, "smooth": True},
                    "time_step": "${time_step}"},
        "downsample_fn": "${get_method:fourierflow.builders.kolmogorov.downsample_vorticity}",
        "n_trajectories": 3, "max_velocity": 7.0, "peak_wavenumber": 4.0,
        "seed": 77, "inner_steps": 2, "outer_steps": 4, "warmup_steps": 0,
        "out_sizes": [{"size": 32, "k": 1}, {"size": 16, "k": 2}],
        "generation_batch": 2,
    }
    with open(tmp_path / "b.yaml", "w") as f:
        _yaml.safe_dump(cfg, f)
    gen(str(tmp_path / "b.yaml"))
    with h5py.File(tmp_path / "b_32_1.h5") as f:
        assert f["vorticity"].shape == (3, 4, 32, 32)
        assert np.isfinite(f["vorticity"][...]).all()
        assert (np.abs(f["vorticity"][...]).max(axis=(1, 2, 3)) > 0).all()
    with h5py.File(tmp_path / "b_16_2.h5") as f:
        assert f["vorticity"].shape == (3, 2, 16, 16)


def test_sharded_generation_matches_unsharded():
    """Spatial-axis sharding of the pseudo-spectral solver: the same
    trajectory generated on an 8-device mesh (vorticity sharded along x)
    matches the single-device result — XLA inserts the collectives for
    the cross-axis DFT matmuls (SURVEY.md §2.7)."""
    import jax
    from jax.sharding import Mesh

    from fourierflow_tpu.builders.kolmogorov import generate_kolmogorov
    from fourierflow_tpu.builders.kolmogorov import (
        downsample_vorticity_snapshot,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import kolmogorov_forcing_fn
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(
        viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
        forcing_fn=kolmogorov_forcing_fn,
    )
    step_fn = crank_nicolson_rk4(eq, 0.005)
    kwargs = dict(
        sim_grid=grid,
        out_sizes=[{"size": 32, "k": 1}],
        method="pseudo_spectral",
        step_fn=step_fn,
        downsample_fn=downsample_vorticity_snapshot,
        seed=jax.random.PRNGKey(0),
        inner_steps=2,
        outer_steps=3,
        warmup_steps=0,
    )
    ref, _ = generate_kolmogorov(**kwargs)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("spatial",))
    shd, _ = generate_kolmogorov(mesh=mesh, **kwargs)

    for key in ref:
        np.testing.assert_allclose(
            ref[key]["vorticity"], shd[key]["vorticity"], rtol=1e-4, atol=1e-5
        )


def test_kolmogorov_trainer_fast_path(kolmogorov_files):
    """The Trainer must take the device-resident scanned fast path for
    Kolmogorov datasets (virtual (traj, time) items sampled on device) and
    learn — this path measured 2.7x over host-streamed batches on TPU."""
    import jax

    from fourierflow_tpu.builders import (
        KolmogorovBuilder,
        KolmogorovMarkovDataset,
        KolmogorovTrajectoryDataset,
    )
    from fourierflow_tpu.models import FNOFactorized2DBlock
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer

    d = kolmogorov_files
    builder = KolmogorovBuilder(
        train_dataset=KolmogorovMarkovDataset(str(d / "train_64_1.h5"), k=1),
        valid_dataset=KolmogorovTrajectoryDataset(
            init_path=str(d / "init_64.h5"), path=str(d / "train_64_1.h5"),
            corr_path=str(d / "train_32_1.h5"), k=1),
        test_dataset=KolmogorovTrajectoryDataset(
            init_path=str(d / "init_64.h5"), path=str(d / "train_64_1.h5"),
            corr_path=str(d / "train_32_1.h5"), k=1),
        batch_size=4,
    )
    assert hasattr(builder, "device_train_data")
    model = FNOFactorized2DBlock(modes=4, width=8, input_dim=5, n_layers=1)
    routine = Grid2DMarkovRoutine(
        model, n_steps=3, max_accumulations=50, use_velocity=True,
        optimizer=make_optimizer(lr=1e-3),
    )
    trainer = Trainer(max_epochs=3, data_parallel=False)
    state = trainer.fit(routine, builder)
    assert np.isfinite(trainer.logs["train_loss"])
    assert trainer.global_step == 2 * (len(builder.train_dataset) // 4)


def test_fast_path_uploads_only_declared_fields(kolmogorov_files):
    """The Markov routine declares device_data_fields=('w',); the Trainer
    must pass that through so vx/vy never cross the relay (3x less
    transfer for large datasets)."""
    from fourierflow_tpu.builders import (
        KolmogorovBuilder,
        KolmogorovMarkovDataset,
        KolmogorovTrajectoryDataset,
    )
    from fourierflow_tpu.models import FNOFactorized2DBlock
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer

    d = kolmogorov_files
    train_ds = KolmogorovMarkovDataset(str(d / "train_64_1.h5"), k=1)
    seen = {}
    orig = train_ds.device_train_data

    def spy(fields=("w", "vx", "vy")):
        seen["fields"] = fields
        return orig(fields=fields)

    train_ds.device_train_data = spy
    traj = KolmogorovTrajectoryDataset(
        init_path=str(d / "init_64.h5"), path=str(d / "train_64_1.h5"),
        corr_path=str(d / "train_32_1.h5"), k=1)
    builder = KolmogorovBuilder(train_ds, traj, traj, batch_size=4)
    model = FNOFactorized2DBlock(modes=4, width=8, input_dim=5, n_layers=1)
    routine = Grid2DMarkovRoutine(
        model, n_steps=3, max_accumulations=50, use_velocity=True,
        optimizer=make_optimizer(lr=1e-3),
    )
    trainer = Trainer(max_epochs=2, data_parallel=False)
    trainer.fit(routine, builder)
    assert seen["fields"] == ("w",)
    assert np.isfinite(trainer.logs["train_loss"])


def test_projection_method_2d_matches_spectral_statistics():
    """The native finite-volume projection solver: divergence-free
    evolution whose short-horizon trajectory correlates with the
    pseudo-spectral solver from the same initial condition (the
    reference's compare_methods configs do this comparison with jax-cfd)."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        filtered_velocity_field,
        generate_kolmogorov,
        downsample_velocity_snapshot,
        downsample_vorticity_snapshot,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.finite_volume import semi_implicit_navier_stokes
    from fourierflow_tpu.utils.forcings import simple_turbulence_forcing
    from fourierflow_tpu.utils.grids import Grid
    from fourierflow_tpu.utils.spectral import grid_correlation

    grid = Grid((64, 64), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    dt = 0.002
    seed = jax.random.PRNGKey(3)

    spec_step = crank_nicolson_rk4(
        NavierStokes2D(viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
                       forcing_fn=lambda g: simple_turbulence_forcing(g, 1, 4, 0)),
        dt,
    )
    spec, _ = generate_kolmogorov(
        sim_grid=grid, out_sizes=[{"size": 64, "k": 1}],
        method="pseudo_spectral", step_fn=spec_step,
        downsample_fn=downsample_vorticity_snapshot, seed=seed,
        inner_steps=5, outer_steps=8, warmup_steps=0,
    )

    fv_step = semi_implicit_navier_stokes(
        density=1.0, viscosity=1e-3, dt=dt, grid=grid,
        forcing=simple_turbulence_forcing(grid, 1, 4, -0.1),
    )
    fv, _ = generate_kolmogorov(
        sim_grid=grid, out_sizes=[{"size": 64, "k": 1}],
        method="projection", step_fn=fv_step,
        downsample_fn=downsample_velocity_snapshot, seed=seed,
        inner_steps=5, outer_steps=8, warmup_steps=0,
    )

    w_spec = spec[(64, 1)]["vorticity"]  # [T, 64, 64]
    w_fv = fv[(64, 1)]["vorticity"]
    assert np.isfinite(w_fv).all()
    rho = np.asarray(grid_correlation(
        np.asarray(w_spec), np.asarray(w_fv), axes=(-2, -1)))
    # Same IC, same physics, different discretizations: strong short-time
    # agreement, slowly decorrelating.
    assert rho[0] > 0.98, rho
    assert rho[-1] > 0.8, rho


def test_projection_method_3d():
    """3D finite-volume generation: divergence-free, finite, downsampled
    velocity outputs (the reference's three_dimensions configs at toy
    scale)."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        generate_kolmogorov,
        downsample_velocity_snapshot,
    )
    from fourierflow_tpu.utils.finite_volume import (
        filtered_velocity_field_3d,
        pressure_projection_nd,
        semi_implicit_navier_stokes,
    )
    from fourierflow_tpu.utils.forcings import simple_turbulence_forcing
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((16, 16, 16), domain=((0, 2 * np.pi),) * 3)
    step = semi_implicit_navier_stokes(
        density=1.0, viscosity=1e-3, dt=0.002, grid=grid,
        forcing=simple_turbulence_forcing(grid, 1, 4, -0.1),
    )
    outs, _ = generate_kolmogorov(
        sim_grid=grid, out_sizes=[{"size": 16, "k": 1}, {"size": 8, "k": 1}],
        method="projection", step_fn=step,
        downsample_fn=downsample_velocity_snapshot,
        seed=jax.random.PRNGKey(0), inner_steps=3, outer_steps=4,
        warmup_steps=0, out_vorticity=False,
    )
    full = outs[(16, 1)]
    assert full["vx"].shape == (4, 16, 16, 16)
    assert set(full) == {"vx", "vy", "vz"}
    for k in ("vx", "vy", "vz"):
        assert np.isfinite(full[k]).all()
    small = outs[(8, 1)]
    assert small["vx"].shape == (4, 8, 8, 8)

    # Divergence-free at the final state.
    u, v, w = (full[k][-1] for k in ("vx", "vy", "vz"))
    h = 2 * np.pi / 16
    div = ((u - np.roll(u, 1, 0)) + (v - np.roll(v, 1, 1)) + (w - np.roll(w, 1, 2))) / h
    np.testing.assert_allclose(div, 0.0, atol=2e-3)


def test_inv_laplacian_on_device_matches_numpy_and_stays_small():
    """The projection's inverse-Laplacian eigenvalues are assembled on
    device from per-axis 1-D constants — the materialized N-D constant
    blows the TPU relay's compile-payload limit at 512^3 (HTTP 413,
    measured round 5). The device assembly must (a) match the numpy
    formula exactly and (b) keep big grids' lowered programs free of
    N^3-scaled constant blobs."""
    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.utils.finite_volume import (
        _fd_laplacian_eigs,
        _inv_laplacian_on_device,
        pressure_projection_nd,
    )

    shape, h = (8, 12, 10), (0.3, 0.2, 0.25)
    want = _fd_laplacian_eigs(shape, h)
    got = np.asarray(_inv_laplacian_on_device(shape, h, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got[0, 0, 0] == 0.0  # pressure gauge: zero mode removed

    n = 128  # lowered text stays ~O(100 KB); the old embedded inv-lambda
    # constant alone would print >1M floats here
    x = jax.ShapeDtypeStruct((n, n, n), jnp.float32)
    hs = [2 * np.pi / n] * 3
    text = (
        jax.jit(lambda u, v, w: pressure_projection_nd((u, v, w), hs))
        .lower(x, x, x)
        .as_text()
    )
    assert len(text) < 2_000_000, f"lowered program is {len(text)} bytes"


def test_van_leer_advection_stability():
    """Forward-Euler projection defaults to Van Leer upwind advection
    (jax-cfd's default scheme, reference:data/kolmogorov/three_dimensions
    configs) and stays bounded at high cell-Reynolds number where central
    ('linear') advection under Euler blows up — the measured 64^3 on-chip
    failure mode, reproduced here at 32^2/100 steps (linear reaches ~8e10,
    Van Leer stays at O(1))."""
    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.builders.kolmogorov import filtered_velocity_field
    from fourierflow_tpu.utils.finite_volume import (
        kolmogorov_forcing_fv,
        pressure_projection_nd,
        semi_implicit_navier_stokes,
    )
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi),) * 2)
    dt = 0.5 * grid.step[0] / 7.0  # stable_time_step(max_velocity 7, courant 0.5)
    forcing = kolmogorov_forcing_fv(grid, 1.0, 4, -0.1)
    v0 = pressure_projection_nd(
        tuple(
            jax.jit(lambda k: filtered_velocity_field(k, grid, 7.0, 4.0))(
                jax.random.PRNGKey(0)
            )
        ),
        list(grid.step),
    )

    def run(convect):
        step = semi_implicit_navier_stokes(
            density=1.0, viscosity=1e-3, dt=dt, grid=grid,
            forcing=forcing, convect=convect,
        )

        @jax.jit
        def scan(vel):
            out, _ = jax.lax.scan(lambda v, _: (step(v), None), vel, None,
                                  length=100)
            return out

        out = scan(v0)
        return float(max(jnp.abs(c).max() for c in out))

    # Default under Euler is van_leer; 'linear' is the explicit opt-out.
    default = semi_implicit_navier_stokes(
        density=1.0, viscosity=1e-3, dt=dt, grid=grid, forcing=forcing)
    explicit = run("van_leer")
    assert np.isfinite(explicit) and explicit < 10.0, explicit
    unstable = run("linear")
    assert (not np.isfinite(unstable)) or unstable > 1e3, unstable
    # The default Euler step is the van_leer one (bounded after 100 steps).
    v = v0
    fn = jax.jit(default)
    for _ in range(100):
        v = fn(v)
    assert float(max(jnp.abs(c).max() for c in v)) < 10.0


def test_projection_rk4_stepper():
    """The projected classic-RK4 stepper (reference:data/kolmogorov/
    compare_methods/downsampling/projection_rk4/*.yaml via the
    ``time_stepper`` key): resolves from the registry config, and is
    substantially more accurate per step than forward Euler against a
    fine-dt reference (full 4th order verified in f64: error ratio 16.4
    per dt halving; f32 asserts a conservative accuracy margin)."""
    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.config import _interpolate, instantiate
    from fourierflow_tpu.experiments import get_experiment
    from fourierflow_tpu.utils.finite_volume import (
        pressure_projection_nd,
        semi_implicit_navier_stokes,
    )
    from fourierflow_tpu.utils.forcings import simple_turbulence_forcing
    from fourierflow_tpu.utils.grids import Grid
    from fourierflow_tpu.builders.kolmogorov import filtered_velocity_field

    # The registry config plumbs the reference's get_method target through
    # to the rk4 stepper.
    cfg = get_experiment(
        "data/kolmogorov/compare_methods/downsampling/projection_rk4/128")
    cfg = _interpolate(cfg, root=cfg)
    assert cfg["method"] == "projection"
    grid128 = instantiate(cfg["sim_grid"])
    step = instantiate({**cfg["step_fn"], "dt": 1e-3, "grid": grid128})
    assert step.__name__ == "rk4_step"

    # Accuracy: projected RK4 beats Euler against a fine-dt reference.
    grid = Grid((16, 16), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    forcing = simple_turbulence_forcing(grid, 1, 4, -0.1)
    h = list(grid.step)
    state0 = pressure_projection_nd(
        tuple(
            jax.jit(lambda k: filtered_velocity_field(k, grid, 7.0, 4.0))(
                jax.random.PRNGKey(0)
            )
        ),
        h,
    )
    T = 0.04

    def run(dt, stepper):
        fn = jax.jit(
            semi_implicit_navier_stokes(
                density=1.0, viscosity=1e-3, dt=dt, grid=grid,
                forcing=forcing, time_stepper=stepper,
            )
        )
        s = state0
        for _ in range(int(round(T / dt))):
            s = fn(s)
        return np.stack([np.asarray(c) for c in s])

    ref = run(T / 64, "rk4")
    err_euler = np.abs(run(T / 4, "euler") - ref).max()
    err_rk4 = np.abs(run(T / 4, "rk4") - ref).max()
    assert np.isfinite(err_euler) and np.isfinite(err_rk4)
    assert err_rk4 < err_euler / 3, (err_rk4, err_euler)

    # Both end states stay divergence-free.
    final = run(T / 4, "rk4")
    div = sum(
        (final[d] - np.roll(final[d], 1, axis=ax)) / h[d]
        for d, ax in enumerate((-2, -1))
    )
    np.testing.assert_allclose(div, 0.0, atol=2e-3)


def test_multi_dataset_falls_back_to_host_loop(kolmogorov_files):
    """KolmogorovMultiDataset has no device protocol; the Trainer must
    fall back to the host-streamed loop rather than crash."""
    import jax

    from fourierflow_tpu.builders import (
        KolmogorovBuilder,
        KolmogorovMultiDataset,
        KolmogorovTrajectoryDataset,
    )
    from fourierflow_tpu.models import FNOFactorized2DBlock
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer

    d = kolmogorov_files
    builder = KolmogorovBuilder(
        train_dataset=KolmogorovMultiDataset(
            [str(d / "train_64_1.h5"), str(d / "train_32_1.h5")], k=1, batch_size=2),
        valid_dataset=KolmogorovTrajectoryDataset(
            init_path=str(d / "init_64.h5"), path=str(d / "train_64_1.h5"),
            corr_path=str(d / "train_32_1.h5"), k=1),
        test_dataset=KolmogorovTrajectoryDataset(
            init_path=str(d / "init_64.h5"), path=str(d / "train_64_1.h5"),
            corr_path=str(d / "train_32_1.h5"), k=1),
        batch_size=2,
    )
    model = FNOFactorized2DBlock(modes=4, width=8, input_dim=5, n_layers=1)
    routine = Grid2DMarkovRoutine(
        model, n_steps=3, max_accumulations=50, use_velocity=True,
        optimizer=make_optimizer(lr=1e-3),
    )
    trainer = Trainer(max_epochs=2, data_parallel=False)
    trainer.fit(routine, builder)
    assert np.isfinite(trainer.logs["train_loss"])


def test_chunked_generation_matches_single_dispatch():
    """chunk_outer splits warmup+recording into bounded dispatches (the
    relay kills >1 min dispatches); the recorded trajectory must be
    identical to the single-dispatch path."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        downsample_vorticity_snapshot,
        generate_kolmogorov,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import kolmogorov_forcing_fn
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
                        forcing_fn=kolmogorov_forcing_fn)
    kwargs = dict(
        sim_grid=grid, out_sizes=[{"size": 32, "k": 1}],
        method="pseudo_spectral", step_fn=crank_nicolson_rk4(eq, 0.005),
        downsample_fn=downsample_vorticity_snapshot,
        seed=jax.random.PRNGKey(3), inner_steps=2, outer_steps=9,
        warmup_steps=5,
    )
    single, _ = generate_kolmogorov(chunk_outer=None, **kwargs)
    chunked, _ = generate_kolmogorov(chunk_outer=3, **kwargs)
    auto, _ = generate_kolmogorov(chunk_outer="auto", **kwargs)
    ws = np.asarray(single[(32, 1)]["vorticity"])
    np.testing.assert_allclose(
        np.asarray(chunked[(32, 1)]["vorticity"]), ws, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(auto[(32, 1)]["vorticity"]), ws, rtol=1e-5, atol=1e-5)

    # batched generation (leading [B, 2] seed) chunks identically
    seeds = jax.random.split(jax.random.PRNGKey(3), 2)
    b_single, _ = generate_kolmogorov(chunk_outer=None, **{**kwargs, "seed": seeds})
    b_chunked, _ = generate_kolmogorov(chunk_outer=4, **{**kwargs, "seed": seeds})
    np.testing.assert_allclose(
        np.asarray(b_chunked[(32, 1)]["vorticity"]),
        np.asarray(b_single[(32, 1)]["vorticity"]), rtol=1e-5, atol=1e-5)


def test_generation_fn_cache_reuse_across_batches():
    """A persistent fn_cache (as the generate command passes per config)
    reuses compiled chunk fns across calls without changing results."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        downsample_vorticity_snapshot,
        generate_kolmogorov,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import kolmogorov_forcing_fn
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
                        forcing_fn=kolmogorov_forcing_fn)
    kwargs = dict(
        sim_grid=grid, out_sizes=[{"size": 32, "k": 1}],
        method="pseudo_spectral", step_fn=crank_nicolson_rk4(eq, 0.005),
        downsample_fn=downsample_vorticity_snapshot,
        inner_steps=2, outer_steps=6, warmup_steps=3,
    )
    cache = {}
    a1, _ = generate_kolmogorov(seed=jax.random.PRNGKey(1), fn_cache=cache,
                                chunk_outer="auto", **kwargs)
    assert "__chunk__" in cache
    a2, _ = generate_kolmogorov(seed=jax.random.PRNGKey(2), fn_cache=cache,
                                chunk_outer="auto", **kwargs)
    # call 2 skips the probes (different warmup split -> may add one size);
    # from call 3 on, every chunk fn cache-hits.
    n_fns = len(cache)
    a3, _ = generate_kolmogorov(seed=jax.random.PRNGKey(3), fn_cache=cache,
                                chunk_outer="auto", **kwargs)
    assert len(cache) == n_fns, "third call must reuse every compiled fn"
    fresh, _ = generate_kolmogorov(seed=jax.random.PRNGKey(2),
                                   chunk_outer="auto", **kwargs)
    np.testing.assert_allclose(
        np.asarray(a2[(32, 1)]["vorticity"]),
        np.asarray(fresh[(32, 1)]["vorticity"]), rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(a1[(32, 1)]["vorticity"]) -
                  np.asarray(a2[(32, 1)]["vorticity"])).max() > 1e-3


def test_generation_fn_cache_batched_then_unbatched():
    """Regression: a shared fn_cache must not hand a vmapped chunk fn to an
    unbatched remainder trajectory (n_trajectories % generation_batch == 1
    in commands/generate.py) — that crashed the scan with a carry-shape
    mismatch and the finally block then deleted every .tmp output."""
    import jax

    from fourierflow_tpu.builders.kolmogorov import (
        downsample_vorticity_snapshot,
        generate_kolmogorov,
    )
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import kolmogorov_forcing_fn
    from fourierflow_tpu.utils.grids import Grid

    grid = Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
                        forcing_fn=kolmogorov_forcing_fn)
    kwargs = dict(
        sim_grid=grid, out_sizes=[{"size": 32, "k": 1}],
        method="pseudo_spectral", step_fn=crank_nicolson_rk4(eq, 0.005),
        downsample_fn=downsample_vorticity_snapshot,
        inner_steps=2, outer_steps=6, warmup_steps=3,
    )
    cache = {}
    seeds = jax.random.split(jax.random.PRNGKey(7), 2)
    batched, _ = generate_kolmogorov(seed=seeds, fn_cache=cache,
                                     chunk_outer="auto", **kwargs)
    # The "remainder batch of 1": unbatched seed, SAME cache + chunk sizes.
    single, _ = generate_kolmogorov(seed=jax.random.PRNGKey(9), fn_cache=cache,
                                    chunk_outer="auto", **kwargs)
    assert single[(32, 1)]["vorticity"].ndim == 3  # [T, 32, 32], no batch dim
    fresh, _ = generate_kolmogorov(seed=jax.random.PRNGKey(9),
                                   chunk_outer="auto", **kwargs)
    np.testing.assert_allclose(
        np.asarray(single[(32, 1)]["vorticity"]),
        np.asarray(fresh[(32, 1)]["vorticity"]), rtol=1e-5, atol=1e-5)


def test_velocity_trajectory_dataset_target_alignment(tmp_path):
    """Validation targets must land every ``inner_steps`` MODEL steps at
    raw corr-file index i*s*k - 1 (the reference prepends the initial
    condition at index 0 and then indexes the k-strided array at s, 2s,
    ...; reference builders/kolmogorov.py:215-255). Regression for the
    reference-protocol learned-interpolation eval (k=1/2, inner_steps=16)."""
    import h5py

    from fourierflow_tpu.builders.kolmogorov import (
        KolmogorovVelocityTrajectoryDataset,
    )

    s_traj, t_frames, nx = 2, 40, 4
    # frame j's field holds its own 1-based index so picks are readable
    cw = np.broadcast_to(
        np.arange(1, t_frames + 1, dtype=np.float32)[None, :, None, None],
        (s_traj, t_frames, nx, nx),
    )
    times = 0.5 * np.arange(1, t_frames + 1, dtype=np.float32)
    corr = tmp_path / "corr.h5"
    with h5py.File(corr, "w") as f:
        f["vorticity"] = cw
        f["time"] = times
    init = tmp_path / "init.h5"
    with h5py.File(init, "w") as f:
        f["vx"] = np.zeros((s_traj, nx, nx), np.float32)
        f["vy"] = np.zeros((s_traj, nx, nx), np.float32)

    # k=2 (file at half the model cadence), inner_steps=4 -> snapshot i
    # is 4 model steps = 8 frames apart, first at raw index 7 (frame 8).
    ds = KolmogorovVelocityTrajectoryDataset(
        init_path=str(init), corr_path=str(corr), k=2, inner_steps=4,
        outer_steps=3,
    )
    batch = ds.sample(np.array([0]))
    np.testing.assert_array_equal(batch["targets"][0, 0, 0], [8.0, 16.0, 24.0])
    np.testing.assert_allclose(batch["times"][0], 0.5 * np.array([8, 16, 24]))

    # The demo setting (k=1, inner_steps=1) keeps every frame from 0.
    ds1 = KolmogorovVelocityTrajectoryDataset(
        init_path=str(init), corr_path=str(corr), k=1, inner_steps=1,
        outer_steps=5,
    )
    np.testing.assert_array_equal(
        ds1.sample(np.array([0]))["targets"][0, 0, 0], [1, 2, 3, 4, 5]
    )
