"""Super-resolution rollout evaluation of a campaign checkpoint.

The F-FNO is resolution-invariant: trained at one grid size, it evaluates
at others by re-running the spectral transforms at the new size
(reference routines/base.py:89-102 strips per-resolution buffers to allow
this; here state is resolution-independent by construction, so the same
checkpoint restores directly). This script generates a small held-out
test set at several resolutions (one batched dispatch per resolution
set) and runs the trained model's autoregressive rollout at each.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/superres_eval.py \
      --data-dir /root/data/quality512 --ckpt /root/data/quality512/last.ckpt
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

import numpy as np
import yaml

TWO_PI = 2 * np.pi


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/quality512")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--sizes", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--sim-size", type=int, default=128)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--outer", type=int, default=80)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--dt", type=float, default=2e-3)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--n-steps", type=int, default=20)
    p.add_argument("--n-layers", type=int, default=24)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.builders.kolmogorov import KolmogorovTrajectoryDataset
    from fourierflow_tpu.commands.generate import kolmogorov as gen
    from fourierflow_tpu.models import FNOFactorized2DBlock
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.schedulers import cosine_with_warmup
    from fourierflow_tpu.trainers.callbacks import load_state

    d = args.data_dir
    ckpt = args.ckpt or os.path.join(d, "last.ckpt")

    # Multi-resolution test set from one generation run (same seed =>
    # same trajectories as the campaign's held-out set).
    sr_dir = os.path.join(d, "superres")
    os.makedirs(sr_dir, exist_ok=True)
    out_sizes = [{"size": s, "k": 1} for s in args.sizes]
    base = {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {"_target_": "fourierflow_tpu.utils.Grid",
                     "shape": [args.sim_size, args.sim_size],
                     "domain": "${domain}"},
        "time_step": args.dt, "method": "pseudo_spectral",
        "step_fn": {"_target_": "jax_cfd.spectral.time_stepping.crank_nicolson_rk4",
                    "equation": {"_target_": "fourierflow.utils.equations.NavierStokes2D",
                                 "grid": "${sim_grid}", "viscosity": 1e-3,
                                 "drag": 0.1, "smooth": True,
                                 "forcing_fn": {"_target_": "functools.partial",
                                                "_args_": ["${get_method:jax_cfd.base.forcings.simple_turbulence_forcing}"],
                                                "constant_magnitude": 1,
                                                "constant_wavenumber": 4,
                                                "linear_coefficient": 0}},
                    "time_step": "${time_step}"},
        "downsample_fn": "${get_method:fourierflow.builders.kolmogorov.downsample_vorticity}",
        "n_trajectories": args.n_test, "max_velocity": 7.0,
        "peak_wavenumber": 4.0, "seed": 99881,
        "inner_steps": args.inner, "outer_steps": args.outer,
        "warmup_steps": args.warmup, "out_sizes": out_sizes,
        "generation_batch": 8,
    }
    if not os.path.exists(os.path.join(sr_dir, f"sr_{args.sizes[-1]}_1.h5")):
        init = dict(base)
        init.update(outer_steps=0)
        for stem, cfg in [("sr", base), ("sr_init", init)]:
            path = os.path.join(sr_dir, f"{stem}.yaml")
            with open(path, "w") as f:
                yaml.safe_dump(cfg, f)
            gen(path)

    model = FNOFactorized2DBlock(
        modes=16, width=64, input_dim=5, n_layers=args.n_layers,
        share_weight=True, factor=4, ff_weight_norm=True, gain=0.1,
        dtype=jnp.bfloat16,
    )
    routine = Grid2DMarkovRoutine(
        model, n_steps=args.n_steps, use_velocity=True,
        max_accumulations=1000, noise_std=0.01,
        step_size=args.dt * args.inner * args.k,
        optimizer=make_optimizer(schedule=cosine_with_warmup(2.5e-3, 500, 1000),
                                 weight_decay=1e-4),
    )

    results = {}
    state = None
    for size in args.sizes:
        ds = KolmogorovTrajectoryDataset(
            init_path=os.path.join(sr_dir, f"sr_init_{size}.h5"),
            path=os.path.join(sr_dir, f"sr_{size}_1.h5"),
            corr_path=os.path.join(sr_dir, f"sr_{min(args.sizes)}_1.h5"),
            k=args.k,
        )
        batch = ds.sample(np.arange(args.n_test))
        batch = {"data": jnp.asarray(batch["data"])}
        if state is None:
            # init at the first size; the state is resolution-independent
            sample = {"data": batch["data"][:2]}
            state = routine.init(jax.random.PRNGKey(0), sample)
            state = load_state(ckpt, state)
        val = jax.jit(routine.valid_step)(state, batch)
        results[size] = {
            "loss": round(float(val["loss"]), 4),
            "corr": round(float(val["corr"]), 4),
            "time_until": round(float(val["time_until"]), 3),
            # per-step rho(t) for the reference's per-grid correlation
            # figure (reference plot.py:341-456)
            "correlations": [round(float(c), 4)
                             for c in np.asarray(val["correlations"])],
            "times": [round(args.dt * args.inner * args.k * (i + 1), 4)
                      for i in range(args.n_steps)],
        }
        print(f"[superres] eval@{size}: corr {results[size]['corr']} "
              f"time_until {results[size]['time_until']}", flush=True)

    out_path = os.path.join(sr_dir, "superres_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
