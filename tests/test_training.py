"""End-to-end training tests: synthetic data -> builders -> routines ->
trainer, on CPU with tiny models. Mirrors the reference call stack
(SURVEY.md §3.1) at toy scale."""

import os

import h5py
import jax
import numpy as np
import optax
import pytest

from fourierflow_tpu.builders import NSMarkovBuilder, NSZongyiBuilder
from fourierflow_tpu.builders.synthetic import (
    gaussian_random_field,
    solve_navier_stokes_2d,
)
from fourierflow_tpu.models import FNOFactorized2DBlock, FNOZongyi2DBlock
from fourierflow_tpu.routines import Grid2DMarkovRoutine, Grid2DRolloutRoutine
from fourierflow_tpu.routines.base import make_optimizer
from fourierflow_tpu.schedulers import cosine_with_warmup
from fourierflow_tpu.trainers import ModelCheckpoint, Trainer
from fourierflow_tpu.trainers.callbacks import load_state, save_state


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """Generate a tiny torus NS dataset with the native solver and store
    it as h5 (the torus_vis format)."""
    key = jax.random.PRNGKey(0)
    w0 = gaussian_random_field(key, 24, 16, n_dims=2, alpha=2.5, tau=7.0)
    sol, _ = solve_navier_stokes_2d(
        np.asarray(w0), 1e-3, t_end=2.0, delta_t=1e-2, record_steps=22, force="li"
    )
    path = tmp_path_factory.mktemp("data") / "ns_tiny.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("u", data=sol)
    return str(path)


def _markov_routine(lr=1e-3, noise_std=0.0, n_steps=5, **model_kwargs):
    kwargs = dict(modes=5, width=8, input_dim=3, n_layers=2, factor=2, ff_weight_norm=True)
    kwargs.update(model_kwargs)
    model = FNOFactorized2DBlock(**kwargs)
    opt = make_optimizer(
        schedule=cosine_with_warmup(lr, 10, 500), weight_decay=1e-4, clip_val=0.1
    )
    return Grid2DMarkovRoutine(
        model,
        n_steps=n_steps,
        max_accumulations=100,
        noise_std=noise_std,
        optimizer=opt,
    )


def test_builders_nested_h5_key(synthetic_dataset, tmp_path):
    """Builders accept a nested HDF5 key (``train/u``) — the layout the
    native ``generate navier-stokes`` command writes — everywhere the
    array is (re)loaded, including ``inference_data``."""
    import shutil

    nested = str(tmp_path / "nested.h5")
    shutil.copy(synthetic_dataset, nested)
    with h5py.File(nested, "a") as f:
        f["train/u"] = f["u"][...]
        del f["u"]

    b = NSMarkovBuilder(nested, train_size=16, test_size=8, ssr=1,
                        batch_size=8, key="train/u")
    assert b.train_data["x"].shape[0] == 16 * 20
    assert b.inference_data()["data"].shape[0] == 24

    z = NSZongyiBuilder(nested, train_size=16, test_size=8, ssr=1,
                        n_steps=10, batch_size=8, key="train/u")
    assert z.train_data["x"].shape == (16, 16, 16, 12)
    assert z.inference_data()["data"].shape[0] == 24


def test_markov_end_to_end(synthetic_dataset, tmp_path):
    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    routine = _markov_routine(lr=3e-3, noise_std=0.01)
    ckpt = ModelCheckpoint(str(tmp_path / "ckpts"), monitor="valid_loss")
    trainer = Trainer(max_epochs=4, callbacks=[ckpt], seed=0, data_parallel=False)
    state = trainer.fit(routine, builder)

    # epoch 0 accumulated normalizer stats
    assert float(state.normalizer.count) > 0
    assert "train_loss" in trainer.logs
    assert "valid_loss" in trainer.logs
    assert np.isfinite(trainer.logs["train_loss"])
    assert trainer.logs["valid_time_until"] >= 0
    assert ckpt.best_path is not None

    # test split
    logs = trainer.test(routine, builder, state)
    assert np.isfinite(logs["test_loss"])
    assert logs["test_correlations"].shape == (5,)


def test_trainer_tensor_parallel_end_to_end(synthetic_dataset):
    """Trainer(tensor_parallel=2): full fit with params + optimizer state
    distributed over the 'model' mesh axis must reproduce the
    single-device run's losses (sharding changes layout, not math)."""
    from jax.sharding import PartitionSpec as P

    def run(**trainer_kwargs):
        builder = NSMarkovBuilder(
            synthetic_dataset, train_size=16, test_size=4, ssr=1, batch_size=8
        )
        routine = _markov_routine(
            lr=3e-3, width=16, factor=4, share_weight=False, n_steps=4
        )
        # fast_loop off so both runs use the identical per-batch loop
        # (the no-mesh fast path draws a different shuffle/noise stream).
        trainer = Trainer(max_epochs=2, seed=0, fast_loop=False, **trainer_kwargs)
        state = trainer.fit(routine, builder)
        return trainer, state

    t_ref, s_ref = run(data_parallel=False)
    t_tp, s_tp = run(tensor_parallel=2)
    assert dict(t_tp.mesh.shape) == {"data": 4, "model": 2}

    np.testing.assert_allclose(
        t_ref.logs["train_loss"], t_tp.logs["train_loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        t_ref.logs["valid_loss"], t_tp.logs["valid_loss"], rtol=1e-3
    )
    # Params stayed distributed through the whole fit.
    w = s_tp.params["params"]["layers_0_backcast_ff"]["WNLinear_0"]["kernel"]
    assert tuple(w.sharding.spec)[-1] == "model"
    # Adam scales per-element, amplifying reduction-order drift over the
    # fit; exact single-step parity is covered by
    # test_tensor_parallel_train_step_matches_unsharded.
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4
        )


def test_trainer_spatial_parallel_end_to_end(synthetic_dataset):
    """Trainer(spatial_parallel=2): full fit with the grid's x-axis
    sharded over the 'spatial' mesh axis (the sequence-parallel analog —
    each separable F-FNO branch transforms along one axis, so the
    y-branch stays device-local) must reproduce the single-device run's
    losses."""

    def run(**trainer_kwargs):
        builder = NSMarkovBuilder(
            synthetic_dataset, train_size=16, test_size=4, ssr=1, batch_size=8
        )
        routine = _markov_routine(
            lr=3e-3, width=16, factor=4, share_weight=False, n_steps=4
        )
        # fast_loop off so both runs use the identical per-batch loop.
        trainer = Trainer(max_epochs=2, seed=0, fast_loop=False, **trainer_kwargs)
        state = trainer.fit(routine, builder)
        return trainer, state

    t_ref, _ = run(data_parallel=False)
    t_sp, _ = run(spatial_parallel=2)
    assert dict(t_sp.mesh.shape) == {"data": 4, "spatial": 2}

    np.testing.assert_allclose(
        t_ref.logs["train_loss"], t_sp.logs["train_loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        t_ref.logs["valid_loss"], t_sp.logs["valid_loss"], rtol=1e-3
    )
    # The eval rollout also ran sharded.
    assert np.isfinite(t_sp.logs["valid_time_until"])


def test_shard_batch_spatial_axis():
    """shard_batch(spatial_axis=...): grid arrays shard (data, spatial),
    non-dividing dim-1 extents fall back to batch-only sharding, and
    non-dividing batch dims replicate."""
    from fourierflow_tpu.parallel.mesh import make_sp_mesh, shard_batch

    mesh = make_sp_mesh(2)  # 8 devices -> 4x2 data x spatial
    batch = {
        "x": np.zeros((8, 16, 16, 1), np.float32),
        "mu": np.zeros((8, 3), np.float32),  # dim 1 doesn't divide 2
        "meta": np.zeros((3,), np.float32),  # batch doesn't divide 4
    }
    out = shard_batch(batch, mesh, spatial_axis="spatial")
    assert tuple(out["x"].sharding.spec) == ("data", "spatial")
    assert tuple(out["mu"].sharding.spec) == ("data",)
    assert tuple(out["meta"].sharding.spec) == ()


def test_shard_batch_small_batch_grid_shards_spatially():
    """A grid whose batch dim does NOT divide the data axis still shards
    spatially (the primary SP use case: batch 1-2 at huge grids) instead
    of replicating; flat per-sample leaves never pick up a spatial spec."""
    from fourierflow_tpu.parallel.mesh import make_sp_mesh, shard_batch

    mesh = make_sp_mesh(2)  # 8 devices -> 4x2 data x spatial
    batch = {
        "big": np.zeros((2, 16, 16, 1), np.float32),  # batch 2 !% 4
        "flat": np.zeros((8, 4), np.float32),  # dim 1 divides 2 but ndim<3
    }
    out = shard_batch(batch, mesh, spatial_axis="spatial")
    assert tuple(out["big"].sharding.spec) == (None, "spatial")
    assert tuple(out["flat"].sharding.spec) == ("data",)


def test_fast_dp_respects_caller_sharded_state(synthetic_dataset):
    """A caller-passed mesh with a pre-sharded state must NOT take the
    scanned-epoch fast path (which would replicate the state, silently
    undoing the caller's layout); _state_is_sharded is the gate."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fourierflow_tpu.parallel.mesh import make_mesh
    from fourierflow_tpu.trainers import trainer as trainer_mod

    mesh = make_mesh()
    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    routine = _markov_routine()
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    assert not trainer_mod._state_is_sharded(state)
    batch_like = jax.device_put(
        jnp.zeros((8, 4), jnp.float32), NamedSharding(mesh, P("data"))
    )
    assert trainer_mod._state_is_sharded((batch_like,))

    # End to end: a caller mesh + sharded state streams per-batch but
    # still trains (epoch 0 accumulates, epoch 1 steps).
    sharded_state = state.replace(
        params=jax.device_put(state.params, NamedSharding(mesh, P()))
    )
    sharded_state = sharded_state.replace(
        params=jax.tree.map(
            lambda p: jax.device_put(p, NamedSharding(mesh, P("data")))
            if p.ndim >= 1 and p.shape[0] % mesh.shape["data"] == 0 and p.shape[0] > 0
            else p,
            sharded_state.params,
        )
    )
    tr = trainer_mod.Trainer(max_epochs=2, mesh=mesh, seed=0)
    out_state = tr.fit(routine, builder, state=sharded_state)
    assert out_state is not None
    assert np.isfinite(tr.logs["train_loss"])


def test_fast_loop_hbm_guard_falls_back(synthetic_dataset, monkeypatch):
    """Multichip DP with a dataset bigger than the per-device replication
    budget falls back to the streaming per-batch loop instead of OOMing."""
    from fourierflow_tpu.trainers import trainer as trainer_mod

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    routine = _markov_routine()
    monkeypatch.setattr(trainer_mod, "_device_hbm_bytes", lambda: 1)
    tr = trainer_mod.Trainer(max_epochs=2, seed=0)  # builds a DP mesh
    assert tr.mesh is not None
    state = tr.fit(routine, builder)
    assert state is not None
    assert np.isfinite(tr.logs["train_loss"])


def test_auto_remat_hbm_guard(synthetic_dataset, monkeypatch):
    """The Trainer flips the model to per-layer remat when the estimated
    saved-activation footprint approaches device memory (VERDICT r2 #6);
    training proceeds with an unchanged parameter tree."""
    from fourierflow_tpu.trainers import trainer as trainer_mod

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    routine = _markov_routine()
    assert routine.model.remat is False
    ref_params = routine.init(jax.random.PRNGKey(0), builder.sample_batch()).params

    monkeypatch.setattr(trainer_mod, "_device_hbm_bytes", lambda: 1024)
    tr = trainer_mod.Trainer(max_epochs=2, seed=0, data_parallel=False)
    state = tr.fit(routine, builder)
    assert routine.model.remat is True
    assert np.isfinite(tr.logs["train_loss"])
    # Same tree: remat changes what the backward saves, not the params.
    assert jax.tree_util.tree_structure(state.params) == jax.tree_util.tree_structure(
        ref_params
    )

    # Estimator: None for models without the F-FNO attributes, scaled by
    # batch x cells x width for those with them.
    assert trainer_mod._estimate_activation_bytes(object(), {}) is None
    est = trainer_mod._estimate_activation_bytes(
        routine.model, builder.sample_batch()
    )
    assert est and est > 0

    # With a realistic budget the flagship config must NOT trigger.
    monkeypatch.setattr(trainer_mod, "_device_hbm_bytes", lambda: 16 << 30)
    routine2 = _markov_routine()
    trainer_mod.Trainer(max_epochs=1, seed=0, data_parallel=False)._maybe_enable_remat(
        routine2, builder
    )
    assert routine2.model.remat is False


def test_trainer_rejects_tp_times_sp():
    with pytest.raises(ValueError):
        Trainer(tensor_parallel=2, spatial_parallel=2)


def test_markov_loss_decreases(synthetic_dataset):
    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=4, ssr=1, batch_size=8
    )
    routine = _markov_routine(lr=3e-3)
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    # warm up normalizer
    for batch in builder.train_batches():
        state = routine.accumulate_step(state, batch)

    train_step = jax.jit(routine.train_step)
    losses = []
    key = jax.random.PRNGKey(1)
    for epoch in range(6):
        for batch in builder.train_batches(np.random.default_rng(epoch)):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            losses.append(float(metrics["train_loss"]))
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10])


def test_rollout_end_to_end(synthetic_dataset):
    builder = NSZongyiBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, n_steps=5, batch_size=8
    )
    model = FNOZongyi2DBlock(modes1=4, modes2=4, width=8, input_dim=7, n_layers=2)
    routine = Grid2DRolloutRoutine(
        model, n_steps=5, optimizer=make_optimizer(lr=1e-3, weight_decay=1e-4)
    )
    trainer = Trainer(max_epochs=2, seed=0, data_parallel=False)
    state = trainer.fit(routine, builder)
    assert np.isfinite(trainer.logs["train_loss"])
    assert np.isfinite(trainer.logs["valid_loss"])


def test_rollout_fourier_position(synthetic_dataset):
    """The learned-embedding variant (reference grid_2d_rollout.py:84-95):
    in_proj(window) + fourier positions replaces the 2 linspace channels;
    the model consumes pos_size channels, and the in_proj params train."""
    builder = NSZongyiBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, n_steps=5, batch_size=8
    )
    pos_size = 2 * (2 * 2 + 1)  # num_freq_bands=2
    model = FNOZongyi2DBlock(
        modes1=4, modes2=4, width=8, input_dim=pos_size, n_layers=2
    )
    routine = Grid2DRolloutRoutine(
        model,
        n_steps=5,
        k_max=4,
        num_freq_bands=2,
        use_fourier_position=True,
        optimizer=make_optimizer(lr=1e-3, weight_decay=1e-4),
    )
    state0 = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    assert set(state0.params) == {"conv", "in_proj"}
    kernel0 = np.asarray(state0.params["in_proj"]["kernel"])

    trainer = Trainer(max_epochs=2, seed=0, data_parallel=False)
    state = trainer.fit(routine, builder, state=state0)
    assert np.isfinite(trainer.logs["train_loss"])
    assert np.isfinite(trainer.logs["valid_loss"])
    kernel1 = np.asarray(state.params["in_proj"]["kernel"])
    assert not np.allclose(kernel0, kernel1), "in_proj received no gradient"


def test_post_fit_test_uses_best_checkpoint(synthetic_dataset, tmp_path):
    """The post-fit test pass restores the best MONITORED checkpoint
    rather than the final fit state (reference commands/train.py:125-131
    loads best before trainer.test); with monitor=None (the flagship
    keeps-last convention) the live state is used untouched."""
    from fourierflow_tpu.commands.train import resolve_test_state
    from fourierflow_tpu.trainers import ModelCheckpoint
    from fourierflow_tpu.trainers.callbacks import save_state

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=8, test_size=4, ssr=1, batch_size=4
    )
    routine = _markov_routine()
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    best = state.replace(params=jax.tree.map(lambda x: x + 1.0, state.params))
    best_path = str(tmp_path / "best.ckpt")
    save_state(best_path, jax.device_get(best))

    cb = ModelCheckpoint(str(tmp_path), monitor="valid_loss")
    cb.best_path, cb.best = best_path, 0.125
    out = resolve_test_state([cb], state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out.params)[0]),
        np.asarray(jax.tree.leaves(best.params)[0]),
    )
    # monitor=None -> the final state is already the last save
    assert resolve_test_state([ModelCheckpoint(str(tmp_path))], state) is state
    # missing best file -> fall back to the final state
    cb.best_path = str(tmp_path / "gone.ckpt")
    assert resolve_test_state([cb], state) is state


def test_checkpoint_roundtrip(synthetic_dataset, tmp_path):
    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=8, test_size=4, ssr=1, batch_size=4
    )
    routine = _markov_routine()
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    for batch in builder.train_batches():
        state = routine.accumulate_step(state, batch)

    path = str(tmp_path / "state.ckpt")
    save_state(path, state)
    template = routine.init(jax.random.PRNGKey(7), builder.sample_batch())
    restored = load_state(path, template)

    batch = builder.sample_batch()
    m1 = routine.valid_step(state, {k: v for k, v in builder.valid_data.items()})
    m2 = routine.valid_step(restored, {k: v for k, v in builder.valid_data.items()})
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_load_inference_state_cross_optimizer(synthetic_dataset, tmp_path):
    """A checkpoint written under one optimizer config restores for
    inference under a template built with a DIFFERENT optimizer
    (params/normalizer/step only — scripts/inference_timing.py relies on
    this to time campaign checkpoints without replaying their schedules)."""
    from fourierflow_tpu.trainers.callbacks import load_inference_state

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=8, test_size=4, ssr=1, batch_size=4
    )
    routine = _markov_routine()  # cosine schedule + clip_val optimizer
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    for batch in builder.train_batches():
        state = routine.accumulate_step(state, batch)
    path = str(tmp_path / "state.ckpt")
    save_state(path, state)

    plain = Grid2DMarkovRoutine(
        FNOFactorized2DBlock(modes=5, width=8, input_dim=3, n_layers=2,
                             factor=2, ff_weight_norm=True),
        n_steps=5, max_accumulations=100,
        optimizer=make_optimizer(lr=1e-3),  # different opt_state treedef
    )
    template = plain.init(jax.random.PRNGKey(9), builder.sample_batch())
    restored = load_inference_state(path, template)

    m1 = routine.valid_step(state, builder.valid_data)
    m2 = plain.valid_step(restored, builder.valid_data)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_data_parallel_training(synthetic_dataset):
    """Batch-sharded training over the 8 virtual CPU devices must match
    single-device results (same data, same init)."""
    from fourierflow_tpu.parallel import make_mesh

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    results = {}
    for name, mesh in [("single", None), ("dp", make_mesh())]:
        routine = _markov_routine()
        trainer = Trainer(
            max_epochs=2, seed=0, mesh=mesh, data_parallel=mesh is not None, fast_loop=False
        )
        state = trainer.fit(routine, builder)
        results[name] = trainer.logs["valid_loss"]
    np.testing.assert_allclose(results["single"], results["dp"], rtol=1e-4)


def test_fast_loop_data_parallel_scan_epoch(synthetic_dataset):
    """Pure-DP meshes keep the device-resident scanned-epoch fast path:
    the dataset is replicated, each scanned batch is sharding-constrained
    onto 'data', and the whole epoch stays one dispatch per chunk. The
    permutation/noise streams are identical to the single-device fast
    path (same epoch key), so losses must match."""

    def run(**kw):
        builder = NSMarkovBuilder(
            synthetic_dataset, train_size=16, test_size=4, ssr=1, batch_size=8
        )
        routine = _markov_routine(lr=3e-3, n_steps=4)
        trainer = Trainer(max_epochs=2, seed=0, fast_loop=True, **kw)
        state = trainer.fit(routine, builder)
        return trainer, state

    t_ref, _ = run(data_parallel=False)
    t_dp, s_dp = run(data_parallel=True)
    assert t_dp.mesh is not None and dict(t_dp.mesh.shape) == {"data": 8}

    np.testing.assert_allclose(
        t_ref.logs["train_loss"], t_dp.logs["train_loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        t_ref.logs["valid_loss"], t_dp.logs["valid_loss"], rtol=1e-3
    )
    # Normalizer statistics accumulated identically through the DP scan.
    assert float(s_dp.normalizer.count) > 0


def test_fast_loop_matches_host_loop_learning(synthetic_dataset):
    """The scanned device-resident epoch must train as well as the host
    loop (not bitwise — different shuffle RNG — but to similar loss)."""
    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    losses = {}
    for name, fast in [("host", False), ("fast", True)]:
        routine = _markov_routine(lr=3e-3)
        trainer = Trainer(max_epochs=6, seed=0, data_parallel=False, fast_loop=fast)
        trainer.fit(routine, builder)
        losses[name] = trainer.logs["train_loss"]
    assert np.isfinite(losses["fast"])
    assert abs(losses["fast"] - losses["host"]) < 0.5 * max(losses.values())


def test_super_resolution_rollout(synthetic_dataset):
    """Resolution invariance (reference routines/base.py:89-102 strips
    per-resolution wavenumber buffers so a model trained at one grid can
    be evaluated at another): train at 16^2, roll out at 32^2 with the
    same parameters — all spectral buffers here are built on the fly."""
    import jax.numpy as jnp

    routine = _markov_routine(n_steps=3)
    builder = NSMarkovBuilder(synthetic_dataset, train_size=16, test_size=4, batch_size=8)
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    state = routine.accumulate_step(state, builder.sample_batch())
    state, _ = jax.jit(routine.train_step)(
        state, builder.sample_batch(), jax.random.PRNGKey(1)
    )

    # Evaluate the SAME state on a double-resolution trajectory.
    rng = np.random.RandomState(0)
    hi = jnp.asarray(rng.randn(2, 32, 32, 6).astype(np.float32))
    preds, step_losses, yy = jax.jit(routine.rollout)(state, {"data": hi})
    assert preds.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(preds)).all()


def test_markov_training_bf16(synthetic_dataset):
    """Mixed-precision training (bf16 compute, f32 params) runs and the
    loss decreases, with f32 parameters preserved."""
    import jax.numpy as jnp

    routine = _markov_routine(lr=3e-3, dtype=jnp.bfloat16)
    builder = NSMarkovBuilder(synthetic_dataset, train_size=16, test_size=4, batch_size=8)
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    state = routine.accumulate_step(state, builder.sample_batch())
    step = jax.jit(routine.train_step)
    losses = []
    for i in range(30):
        batch = next(builder.train_batches(np.random.default_rng(i)))
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["train_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_contextual_training_with_force_and_mu(tmp_path):
    """torus_vis-style conditioning: per-sample viscosity and forcing
    appended as features, trained and rolled out with the force re-fed at
    every step (reference torus_vis configs + grid_2d_markov append_force/
    append_mu paths)."""
    import jax.numpy as jnp

    from fourierflow_tpu.builders import NSContextualBuilder

    rng = np.random.RandomState(0)
    B, S, T = 6, 16, 8
    with h5py.File(tmp_path / "vis.h5", "w") as f:
        for split, n in [("train", B), ("valid", 2), ("test", 2)]:
            g = f.create_group(split)
            g.create_dataset("u", data=rng.randn(n, S, S, T).astype(np.float32))
            g.create_dataset("f", data=rng.randn(n, S, S).astype(np.float32))
            g.create_dataset("mu", data=rng.rand(n).astype(np.float32) * 1e-4)

    builder = NSContextualBuilder(str(tmp_path / "vis.h5"), ssr=1, k=1, batch_size=4)
    model = FNOFactorized2DBlock(modes=4, width=8, input_dim=5, n_layers=2)
    routine = Grid2DMarkovRoutine(
        model,
        n_steps=3,
        max_accumulations=50,
        append_force=True,
        append_mu=True,
        optimizer=make_optimizer(lr=1e-3),
    )
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    state = routine.accumulate_step(state, builder.sample_batch())
    step = jax.jit(routine.train_step)
    for i, batch in enumerate(builder.train_batches(np.random.default_rng(0))):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(m["train_loss"]))

    val_batch = next(builder.val_batches())
    logs = jax.jit(routine.valid_step)(state, val_batch)
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["time_until"]))


def test_prediction_dump(synthetic_dataset, tmp_path):
    """pred_path-style prediction dump: vorticity + recovered velocities,
    written as HDF5 (reference grid_2d_markov.py:427-476 uses netCDF)."""
    routine = _markov_routine(n_steps=3)
    builder = NSMarkovBuilder(synthetic_dataset, train_size=8, test_size=4, batch_size=4)
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    state = routine.accumulate_step(state, builder.sample_batch())
    batch = next(builder.test_batches())
    preds, _, _ = jax.jit(routine.rollout)(state, batch)
    out = routine.save_predictions(preds, times=np.arange(3), path=str(tmp_path / "p.h5"))
    with h5py.File(out) as f:
        assert f["vorticity"].shape == preds.shape
        assert f["vx"].shape == preds.shape
        assert np.isfinite(f["vx"][...]).all()


def test_orbax_checkpoint_roundtrip(synthetic_dataset, tmp_path):
    """save_state/load_state with the orbax backend (directory layout)."""
    from fourierflow_tpu.trainers.callbacks import load_state, save_state

    routine = _markov_routine()
    builder = NSMarkovBuilder(synthetic_dataset, train_size=8, test_size=4, batch_size=4)
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    path = str(tmp_path / "ckpt_orbax")
    save_state(path, state, backend="orbax")
    assert os.path.isdir(path)

    template = routine.init(jax.random.PRNGKey(1), builder.sample_batch())
    restored = load_state(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_chunked_epoch_matches_single_dispatch(synthetic_dataset):
    """Splitting an epoch into bounded-size dispatches (the relay kills
    dispatches over ~1 min) is bit-equivalent to the single-dispatch scan:
    same permutation, same per-step RNG, same final state."""
    import jax.numpy as jnp

    from fourierflow_tpu.trainers.trainer import make_scan_epoch_indexed

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=4, ssr=1, batch_size=4
    )
    data = {k: jnp.asarray(v) for k, v in builder.train_data.items()}
    sample_fn = lambda d, idx: {k: v[idx] for k, v in d.items()}
    n = len(next(iter(data.values())))

    def run(chunk_steps):
        routine = _markov_routine(lr=3e-3, noise_std=0.01)
        state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
        state = routine.accumulate_step(state, builder.sample_batch())
        epoch = make_scan_epoch_indexed(
            routine, 4, n, sample_fn, accumulate=False, chunk_steps=chunk_steps
        )
        key = jax.random.PRNGKey(7)
        losses = []
        for e in range(2):
            state, metrics = epoch(state, data, jax.random.fold_in(key, e))
            losses.append(float(metrics["train_loss"]))
        return state, losses

    s1, l1 = run(None)       # single dispatch
    s2, l2 = run(3)          # 22 batches -> chunks of 3/2 steps
    s3, l3 = run("auto")     # probe path (rate calibrated on tiny chunks)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    np.testing.assert_allclose(l1, l3, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_track_grad_norm_and_fast_dev_run(synthetic_dataset):
    """Reference debug knobs: track_grad_norm adds the global grad L2 norm
    to train metrics; trainer.fast_dev_run builds a 1-batch trainer."""
    import jax.numpy as jnp

    from fourierflow_tpu.commands.train import build_trainer

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=8, test_size=4, ssr=1, batch_size=4
    )
    routine = _markov_routine(lr=1e-3)
    routine.track_grad_norm = True
    state = routine.init(jax.random.PRNGKey(0), builder.sample_batch())
    state, metrics = jax.jit(routine.train_step)(
        state, builder.sample_batch(), jax.random.PRNGKey(1)
    )
    assert "grad_norm" in metrics and float(metrics["grad_norm"]) > 0

    trainer = build_trainer({"fast_dev_run": True, "max_epochs": 50})
    assert trainer.max_epochs == 2
    assert trainer.limit_train_batches == 1
    state = trainer.fit(routine, builder)
    assert trainer.current_epoch == 1

    # trainer config reaches the TP knob (config-level tensor parallelism)
    tp_trainer = build_trainer({"max_epochs": 1, "tensor_parallel": 2})
    assert dict(tp_trainer.mesh.shape) == {"data": 4, "model": 2}


def test_per_batch_loop_tuple_batches():
    """The streaming per-batch loop (limit_train_batches set) must accept
    (inputs, outputs)-tuple batches — the learned-interpolator loader's
    format. Regression: the epoch-weight bookkeeping assumed dict batches
    and crashed the LI full-budget reference run (r3_queue2 li_ref2)."""
    from fourierflow_tpu.routines import LearnedInterpolatorRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer

    routine = LearnedInterpolatorRoutine(
        size=16, dt=0.001, unroll_length=2, features=4, n_cnn_layers=1,
        inner_steps=2, outer_steps=2,
        optimizer=make_optimizer(lr=1e-3, weight_decay=0.0),
    )
    rng = np.random.RandomState(0)
    b, s = 2, 16
    inputs = {
        "vx": rng.randn(b, s, s).astype(np.float32) * 0.1,
        "vy": rng.randn(b, s, s).astype(np.float32) * 0.1,
    }
    outputs = {
        "vx": rng.randn(b, s, s, 2).astype(np.float32) * 0.1,
        "vy": rng.randn(b, s, s, 2).astype(np.float32) * 0.1,
    }
    valid = {
        "vx": inputs["vx"],
        "vy": inputs["vy"],
        "targets": rng.randn(b, s, s, 2).astype(np.float32),
        "times": np.tile(np.arange(2, dtype=np.float32), (b, 1)),
    }

    class _TupleBuilder:
        batch_size = b

        def sample_batch(self):
            return (inputs, outputs)

        def train_batches(self, rng=None):
            yield (inputs, outputs)
            yield (inputs, outputs)

        def val_batches(self):
            yield valid

        def test_batches(self):
            yield valid

    trainer = Trainer(max_epochs=1, limit_train_batches=2, seed=0)
    state = trainer.fit(routine, _TupleBuilder())
    assert np.isfinite(trainer.logs["train_loss"])
    assert np.isfinite(trainer.logs["valid_loss"])
    assert state is not None


def test_sharded_train_step_matches_unsharded():
    """The data x spatial mesh through the spectral layers — the exact path
    __graft_entry__.dryrun_multichip exercises — must compile, run on the
    8 virtual CPU devices, and match the unsharded train step numerically
    (XLA inserts the collectives; results are identical data)."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "spatial"))

    routine = _markov_routine(lr=1e-3, n_steps=4)
    rng = np.random.RandomState(0)
    batch = {
        "x": np.asarray(rng.randn(4, 32, 32, 1), np.float32),
        "y": np.asarray(rng.randn(4, 32, 32, 1), np.float32),
    }
    state0 = routine.init(jax.random.PRNGKey(0), batch)
    state0 = routine.accumulate_step(state0, batch)

    # Unsharded reference step.
    s_ref, m_ref = jax.jit(routine.train_step)(state0, batch, jax.random.PRNGKey(1))

    # Sharded: batch on 'data', first spatial axis on 'spatial'; params and
    # optimizer/normalizer state replicated.
    batch_sharding = NamedSharding(mesh, P("data", "spatial"))
    repl = NamedSharding(mesh, P())
    sharded_batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
    sharded_state = jax.device_put(state0, repl)
    s_sh, m_sh = jax.jit(routine.train_step)(
        sharded_state, sharded_batch, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(
        float(m_ref["train_loss"]), float(m_sh["train_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # Sharded eval rollout (scan + per-step re-featurization) as well.
    data = jnp_data = np.asarray(rng.randn(4, 32, 32, 6), np.float32)
    data = jax.device_put(jnp_data, NamedSharding(mesh, P("data", "spatial")))
    val_sh = jax.jit(routine.valid_step)(s_sh, {"data": data})
    val_ref = jax.jit(routine.valid_step)(s_ref, {"data": jnp_data})
    assert np.isfinite(float(val_sh["loss"]))
    np.testing.assert_allclose(
        float(val_ref["loss"]), float(val_sh["loss"]), rtol=1e-5
    )


def test_tensor_parallel_train_step_matches_unsharded():
    """Megatron-style tensor parallelism (parallel/mesh.py::
    tp_state_shardings): FF hidden dims and spectral output channels
    sharded over a 'model' mesh axis, composed with batch data
    parallelism. The train step must match the unsharded step exactly and
    the UPDATED params/opt state must keep their channel sharding (the
    optimizer runs distributed — that's the memory win). No reference
    analog (SURVEY.md §2.7: the reference is single-device)."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from fourierflow_tpu.parallel.mesh import tp_state_shardings

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))

    # width 16 / factor 4: hidden 64 and channels 16 divide the model axis.
    routine = _markov_routine(
        lr=1e-3, n_steps=4, width=16, factor=4, share_weight=False
    )
    rng = np.random.RandomState(0)
    batch = {
        "x": np.asarray(rng.randn(4, 32, 32, 1), np.float32),
        "y": np.asarray(rng.randn(4, 32, 32, 1), np.float32),
    }
    state0 = routine.init(jax.random.PRNGKey(0), batch)
    state0 = routine.accumulate_step(state0, batch)

    s_ref, m_ref = jax.jit(routine.train_step)(state0, batch, jax.random.PRNGKey(1))

    specs = tp_state_shardings(state0, mesh)
    n_sharded = sum(
        1 for s in jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, NamedSharding))
        if s.spec != P()
    )
    assert n_sharded >= 12  # 4 fourier + 4 ff kernels in params + mu + nu

    tp_state = jax.device_put(state0, specs)
    bsh = NamedSharding(mesh, P("data"))
    tp_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    s_tp, m_tp = jax.jit(routine.train_step)(tp_state, tp_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m_ref["train_loss"]), float(m_tp["train_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # The updated spectral weight must still be column-sharded (the step
    # didn't silently replicate the distributed state).
    w = s_tp.params["params"]["layers_0_fourier_weight_x"]
    spec = tuple(w.sharding.spec)  # XLA may trim trailing Nones
    assert len(spec) >= 2 and spec[0] is None and spec[1] == "model"


def test_tp_shardings_downgrade_on_indivisible_dims():
    """Channel dims that don't divide the model axis fall back to
    replicated instead of producing an invalid NamedSharding (width 12 on
    an 8-way model axis: fourier weights replicate, the 48-wide FF hidden
    stays sharded)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from fourierflow_tpu.parallel.mesh import make_tp_mesh, tp_state_shardings

    model = FNOFactorized2DBlock(
        modes=3, width=12, input_dim=3, n_layers=1,
        share_weight=True, factor=4, ff_weight_norm=True,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 16, 16, 3)))
    mesh = make_tp_mesh(8)
    specs = tp_state_shardings(params, mesh)
    by_spec = {}
    for (path, leaf), s in zip(
        jax.tree_util.tree_flatten_with_path(params)[0], jax.tree.leaves(specs)
    ):
        by_spec[jax.tree_util.keystr(path)] = s.spec
    assert by_spec["['params']['fourier_weight_x']"] == P()  # 12 % 8 != 0
    assert (
        by_spec["['params']['layers_0_backcast_ff']['WNLinear_0']['kernel']"]
        == P(None, "model")
    )
    jax.device_put(params, specs)  # must not raise


def test_make_tp_mesh_edge_cases():
    """make_tp_mesh drops non-dividing devices (with a warning) and
    rejects tensor_parallel larger than the device count."""
    import pytest as _pytest

    from fourierflow_tpu.parallel.mesh import make_tp_mesh

    mesh = make_tp_mesh(3)  # 8 devices -> 2x3 mesh, 2 dropped
    assert dict(mesh.shape) == {"data": 2, "model": 3}
    with _pytest.raises(ValueError):
        make_tp_mesh(9)


def test_tensor_parallel_zongyi_dense_weights():
    """The TP rule also shards the Zongyi dense spectral weights
    [C_in, C_out, M, M, 2] by output channel; one sharded train step
    matches the unsharded step."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from fourierflow_tpu.parallel.mesh import make_tp_mesh, tp_state_shardings

    model = FNOZongyi2DBlock(modes1=4, modes2=4, width=16, input_dim=3, n_layers=2)
    routine = Grid2DMarkovRoutine(
        model,
        n_steps=4,
        max_accumulations=100,
        noise_std=0.0,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(1e-3, 10, 500), weight_decay=1e-4
        ),
    )
    rng = np.random.RandomState(0)
    batch = {
        "x": np.asarray(rng.randn(4, 32, 32, 1), np.float32),
        "y": np.asarray(rng.randn(4, 32, 32, 1), np.float32),
    }
    state = routine.init(jax.random.PRNGKey(0), batch)
    state = routine.accumulate_step(state, batch)
    _, m_ref = jax.jit(routine.train_step)(state, batch, jax.random.PRNGKey(1))

    mesh = make_tp_mesh(2)
    specs = tp_state_shardings(state, mesh)
    assert sum(1 for s in jax.tree.leaves(specs) if s.spec != P()) == 12
    tp_state = jax.device_put(state, specs)
    tp_batch = {
        k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()
    }
    _, m_tp = jax.jit(routine.train_step)(tp_state, tp_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_ref["train_loss"]), float(m_tp["train_loss"]), rtol=1e-5
    )


def test_graft_entry_dryrun_multichip(monkeypatch):
    """Run the driver's multichip dryrun exactly as shipped so the suite
    fails whenever the dryrun would (VERDICT r1: it shipped never-run)."""
    import __graft_entry__

    # The dryrun re-execs in a subprocess, which doesn't see conftest's
    # jax.config compilation-cache setting — share it via the env so the
    # child's compiles hit the suite's persistent cache (~50 s -> ~15 s).
    monkeypatch.setenv(
        "JAX_COMPILATION_CACHE_DIR", str(jax.config.jax_compilation_cache_dir)
    )
    monkeypatch.setenv("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
    monkeypatch.setenv("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    __graft_entry__.dryrun_multichip(8)


def test_reduced_resolution_correlation_metric():
    """Reference protocol (grid_2d_markov.py:353-370): rollout predictions
    are spectrally downsampled to the corr trajectory's grid (32^2 for
    Kolmogorov) and correlated against it, yielding reduced_time_until."""
    from fourierflow_tpu.utils.spectral import downsample_vorticity

    routine = _markov_routine(n_steps=4)
    rng = np.random.RandomState(0)
    b, s, t = 2, 32, 4
    preds = np.asarray(rng.randn(b, s, s, t), np.float32)
    yy = preds + 0.01 * np.asarray(rng.randn(b, s, s, t), np.float32)
    step_losses = np.zeros((t,), np.float32)

    # corr trajectory = exact downsample of preds -> rho_2(t) == 1.
    corr_yy = np.asarray(jax.jit(lambda p: downsample_vorticity(p, 16))(preds))
    m = routine.compute_losses(preds, step_losses, yy, corr_yy)
    assert m["reduced_correlations"].shape == (t,)
    np.testing.assert_allclose(np.asarray(m["reduced_correlations"]), 1.0, atol=1e-5)
    assert float(m["reduced_time_until"]) == t * routine.step_size

    # same-size corr data: no downsampling, plain correlation against it.
    m_same = routine.compute_losses(preds, step_losses, yy, preds.copy())
    np.testing.assert_allclose(np.asarray(m_same["reduced_correlations"]), 1.0,
                               atol=1e-6)

    # decorrelated corr trajectory -> early reduced divergence while the
    # full-resolution metric stays healthy.
    corr_bad = np.asarray(rng.randn(b, 16, 16, t), np.float32)
    m_bad = routine.compute_losses(preds, step_losses, yy, corr_bad)
    assert float(m_bad["reduced_time_until"]) == 0.0
    assert float(m_bad["time_until"]) == t * routine.step_size

    # valid_step plumbs batch['corr_data'] through (trailing-horizon slice),
    # jitted as the trainer/campaign use it.
    routine2 = _markov_routine(n_steps=3)
    data = np.asarray(rng.randn(b, 16, 16, 6), np.float32)
    corr = np.asarray(rng.randn(b, 8, 8, 6), np.float32)
    state = routine2.init(
        jax.random.PRNGKey(0), {"x": data[..., 0][..., None], "y": data[..., 1][..., None]}
    )
    state = routine2.accumulate_step(
        state, {"x": data[..., 0][..., None], "y": data[..., 1][..., None]}
    )
    val = jax.jit(routine2.valid_step)(state, {"data": data, "corr_data": corr})
    assert val["reduced_correlations"].shape == (3,)
    assert np.isfinite(float(val["reduced_time_until"]))


def test_sparse_validation_records_valid_epoch(synthetic_dataset, tmp_path):
    """With check_val_every_n_epoch > 1 the logs keep the last valid_*
    values between validations; valid_epoch must record the epoch the
    validation actually ran at so JSONL rows can't be misattributed
    (ADVICE r3 / VERDICT r3 weak #1)."""
    import json

    from fourierflow_tpu.trainers.callbacks import JSONLogger

    builder = NSMarkovBuilder(
        synthetic_dataset, train_size=16, test_size=8, ssr=1, batch_size=8
    )
    routine = _markov_routine(lr=3e-3, noise_std=0.0)
    log_path = tmp_path / "metrics.jsonl"
    trainer = Trainer(
        max_epochs=5, seed=0, data_parallel=False,
        check_val_every_n_epoch=2,
        callbacks=[JSONLogger(str(log_path))],
    )
    trainer.fit(routine, builder)

    rows = [json.loads(l) for l in log_path.read_text().splitlines()]
    assert len(rows) == 5
    # Validation runs at epochs 1 and 3 (0-based, every 2nd epoch).
    by_epoch = {r["epoch"]: r for r in rows}
    assert "valid_loss" not in by_epoch[0]
    assert by_epoch[1]["valid_epoch"] == 1
    assert by_epoch[2]["valid_epoch"] == 1  # stale values, attributed
    assert by_epoch[3]["valid_epoch"] == 3
    assert by_epoch[4]["valid_epoch"] == 3
