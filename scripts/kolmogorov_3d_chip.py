"""3D Kolmogorov on the chip (VERDICT r2 #3): generate, write, train.

Mirrors reference:data/kolmogorov/three_dimensions/trajectories/train.yaml
semantics (finite-volume projection method, semi-implicit NS, turbulence
forcing wavenumber 4, linear drag -0.1, snapshots every ``inner`` ODE
steps, downsampled velocity outputs) at chip-feasible scale:

1. probe ms/projection-step at 64^3 and 128^3 (and extrapolate 512^3, the
   reference's production shape, by cell count — like the 2048^2 2D
   table in RESULTS);
2. generate a 64^3 trajectory set through the production pipeline
   (commands.generate.kolmogorov -> HDF5, vx/vy/vz + vorticity-free
   velocity outputs at 64^3 and 32^3);
3. train one epoch of the 3D factorized model (FNOFactorizedMesh3D) on
   one-step velocity pairs from that dataset and report the loss curve.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kolmogorov_3d_chip.py
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import yaml

TWO_PI = 2 * np.pi


def probe_step_time(size, n_steps, results):
    """Time the jitted 3D projection step at ``size``^3."""
    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.utils import Grid
    from fourierflow_tpu.utils.finite_volume import (
        filtered_velocity_field_3d,
        kolmogorov_forcing_fv,
        semi_implicit_navier_stokes,
    )

    grid = Grid((size,) * 3, domain=((0, TWO_PI),) * 3)
    # stable_time_step(max_velocity 7, courant 0.5) ~ h / (2 * 7)
    dt = 0.5 * grid.step[0] / 7.0
    step = semi_implicit_navier_stokes(
        density=1.0, viscosity=1e-3, dt=dt, grid=grid,
        forcing=kolmogorov_forcing_fv(
            grid, constant_magnitude=1.0, constant_wavenumber=4,
            linear_coefficient=-0.1,
        ),
    )

    @jax.jit
    def run(vel):
        def body(v, _):
            return step(v), None

        out, _ = jax.lax.scan(body, vel, None, length=n_steps)
        return out

    # IC build must run under jit: its spectral filtering would otherwise
    # dispatch eagerly (slow on axon, and complex ops are UNIMPLEMENTED
    # eagerly on this backend).
    vel = jax.jit(
        lambda k: filtered_velocity_field_3d(k, grid)
    )(jax.random.PRNGKey(0))
    out = run(vel)
    _ = float(out[0][0, 0, 0])  # compile + settle
    t0 = time.perf_counter()
    out = run(out)
    _ = float(out[0][0, 0, 0])
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    finite = jax.jit(lambda vs: jnp.all(jnp.stack([jnp.isfinite(v).all() for v in vs])))
    assert bool(finite(out))
    print(f"[probe] {size}^3 projection step: {ms:.2f} ms (dt {dt:.2e})",
          flush=True)
    results[f"step_ms_{size}"] = round(ms, 3)
    return ms


def gen_cfg(n_traj, seed, size, inner, outer, warmup):
    return {
        "domain": [[0, TWO_PI]] * 3,
        "sim_grid": {"_target_": "fourierflow_tpu.utils.Grid",
                     "shape": [size] * 3, "domain": "${domain}"},
        "time_step": {"_target_": "jax_cfd.base.equations.stable_time_step",
                      "max_velocity": 7.0, "max_courant_number": 0.5,
                      "viscosity": 1e-3, "grid": "${sim_grid}"},
        "method": "projection",
        "step_fn": {"_target_": "jax_cfd.base.equations.semi_implicit_navier_stokes",
                    "density": 1, "viscosity": 1e-3, "dt": "${time_step}",
                    "grid": "${sim_grid}",
                    "forcing": {"_target_": "jax_cfd.base.forcings.simple_turbulence_forcing",
                                "grid": "${sim_grid}",
                                "constant_magnitude": 1,
                                "constant_wavenumber": 4,
                                "linear_coefficient": -0.1}},
        "downsample_fn": "${get_method:fourierflow.builders.kolmogorov.downsample_velocity}",
        "out_sizes": [{"size": s, "k": 1}
                      for s in dict.fromkeys([size, 32]) if s <= size],
        "n_trajectories": n_traj, "density": 1, "max_velocity": 7.0,
        "peak_wavenumber": 4.0, "seed": seed,
        "inner_steps": inner, "outer_steps": outer, "warmup_steps": warmup,
        "generation_batch": 2,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/kol3d")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--n-traj", type=int, default=6)
    p.add_argument("--inner", type=int, default=16)
    p.add_argument("--outer", type=int, default=40)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--width", type=int, default=24)
    p.add_argument("--n-layers", type=int, default=4)
    p.add_argument("--skip-probe", action="store_true")
    args = p.parse_args()

    import jax
    import optax

    from fourierflow_tpu.commands.generate import kolmogorov as gen
    from fourierflow_tpu.models import FNOFactorizedMesh3D
    from fourierflow_tpu.routines import StructuredMeshRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.schedulers import cosine_with_warmup
    from fourierflow_tpu.trainers import Trainer

    results = {}
    if not args.skip_probe:
        probe_step_time(64, 50, results)
        ms128 = probe_step_time(128, 20, results)
        # 512^3 = 64x the cells of 128^3; the FV step is bandwidth-bound
        # stencils + DFT-matmul Poisson, so scale by cell count (the same
        # extrapolation RESULTS uses for the 2048^2 2D table).
        results["step_ms_512_extrapolated"] = round(ms128 * 64, 1)
        print(f"[probe] 512^3 extrapolated: {results['step_ms_512_extrapolated']:.0f} "
              f"ms/step (x64 cells over 128^3)", flush=True)

    d = args.data_dir
    os.makedirs(d, exist_ok=True)
    h5_path = os.path.join(d, f"traj3d_{args.size}_1.h5")
    if not os.path.exists(h5_path):
        cfg = gen_cfg(args.n_traj, 97820, args.size, args.inner, args.outer,
                      args.warmup)
        ypath = os.path.join(d, "traj3d.yaml")
        with open(ypath, "w") as f:
            yaml.safe_dump(cfg, f)
        t0 = time.time()
        gen(ypath)
        results["generation_s"] = round(time.time() - t0, 1)
        print(f"[gen] {args.n_traj} trajectories x {args.outer} snapshots "
              f"at {args.size}^3 in {results['generation_s']}s", flush=True)

    import h5py

    with h5py.File(h5_path, "r") as f:
        vel = np.stack([f["vx"][...], f["vy"][...], f["vz"][...]], axis=-1)
    # vel: [S, T, X, Y, Z, 3]; sanity: trajectories must evolve.
    assert np.isfinite(vel).all()
    assert np.abs(vel[0, 1] - vel[0, 0]).max() > 0, "constant trajectory!"
    s, t = vel.shape[:2]
    x = vel[:, :-1].reshape(s * (t - 1), *vel.shape[2:])
    y = vel[:, 1:].reshape(s * (t - 1), *vel.shape[2:])
    n_train = int(0.8 * len(x))

    class _B:
        batch_size = args.batch
        train_data = {"x": x[:n_train], "y": y[:n_train]}
        valid_data = {"x": x[n_train:], "y": y[n_train:]}
        test_data = valid_data

        def sample_batch(self):
            return {k: v[: args.batch] for k, v in self.train_data.items()}

        def train_batches(self, rng=None):
            idx = np.arange(len(self.train_data["x"]))
            if rng is not None:
                rng.shuffle(idx)
            for i in range(0, len(idx) - args.batch + 1, args.batch):
                j = idx[i : i + args.batch]
                yield {k: v[j] for k, v in self.train_data.items()}

        def val_batches(self):
            yield {k: v[: args.batch] for k, v in self.valid_data.items()}

        def test_batches(self):
            yield from self.val_batches()

    model = FNOFactorizedMesh3D(
        modes_x=8, modes_y=8, modes_z=8, width=args.width,
        input_dim=6, output_dim=3, n_layers=args.n_layers,
        share_weight=True, factor=2, ff_weight_norm=True, padding=0,
    )
    steps = args.epochs * (n_train // args.batch)
    routine = StructuredMeshRoutine(
        model,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(1e-3, 50, max(steps, 100)),
            weight_decay=1e-4,
        ),
    )
    trainer = Trainer(max_epochs=args.epochs, data_parallel=False, seed=0)
    t0 = time.time()
    trainer.fit(routine, _B())
    train_s = time.time() - t0
    results["train_loss"] = float(trainer.logs["train_loss"])
    results["valid_loss"] = float(trainer.logs["valid_loss"])
    results["train_steps"] = steps
    results["train_ms_per_step"] = round(train_s / max(steps, 1) * 1e3, 1)
    results["train_time_s"] = round(train_s, 1)
    print(json.dumps(results), flush=True)
    with open(os.path.join(d, "kol3d_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
