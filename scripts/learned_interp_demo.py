"""Learned-interpolation CFD demo (Kochkov et al. 2021 reproduction).

Generates fine-stride 64^2 DNS velocity data with the native
pseudo-spectral solver, trains the learned-interpolation correction with
an unrolled loss, and scores a coarse-step rollout against the 32^2 DNS
reference — end to end on one chip.

The model advances dt_model = 32x the 2048^2-stable DNS step
(0.00701 = 32 * 0.000219, the paper's speedup setting); the DNS data is
generated at dt_model/8 and snapshotted every model step.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/learned_interp_demo.py \
      --data-dir /root/data/li_demo
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

import numpy as np
import yaml

TWO_PI = 2 * np.pi
DT_MODEL = 0.007012483601762931  # 32x the 2048^2-stable step


def _cfg(n_traj, seed, args, warmup_only=False):
    return {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {"_target_": "fourierflow_tpu.utils.Grid",
                     "shape": [args.size, args.size], "domain": "${domain}"},
        "time_step": DT_MODEL / args.substeps,
        "method": "pseudo_spectral",
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
        "n_trajectories": n_traj, "max_velocity": 7.0, "peak_wavenumber": 4.0,
        "seed": seed, "inner_steps": args.substeps,
        "outer_steps": 0 if warmup_only else args.outer,
        "warmup_steps": args.warmup,
        "out_sizes": [{"size": args.size, "k": 1}, {"size": 32, "k": 1}],
        "generation_batch": 8,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/li_demo")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--substeps", type=int, default=8,
                   help="DNS steps per model step (data stride)")
    p.add_argument("--outer", type=int, default=300)
    p.add_argument("--warmup", type=int, default=40)
    p.add_argument("--n-train", type=int, default=8)
    p.add_argument("--n-test", type=int, default=4)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--unroll", type=int, default=8)
    p.add_argument("--rollout", type=int, default=40)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args()

    import jax

    from fourierflow_tpu.builders import KolmogorovBuilder
    from fourierflow_tpu.builders.kolmogorov import (
        KolmogorovVelocityDataset,
        KolmogorovVelocityTrajectoryDataset,
    )
    from fourierflow_tpu.commands.generate import kolmogorov as gen
    from fourierflow_tpu.routines import LearnedInterpolatorRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.schedulers import cosine_with_warmup
    from fourierflow_tpu.trainers import Trainer

    d = args.data_dir
    os.makedirs(d, exist_ok=True)
    jobs = [("train", _cfg(args.n_train, 524, args)),
            ("test", _cfg(args.n_test, 9917, args)),
            ("test_init", _cfg(args.n_test, 9917, args, warmup_only=True))]
    for stem, cfg in jobs:
        done = os.path.join(
            d, f"{stem}_{args.size}_1.h5" if cfg["outer_steps"] else f"{stem}_{args.size}.h5")
        if not os.path.exists(done):
            path = os.path.join(d, f"{stem}.yaml")
            with open(path, "w") as f:
                yaml.safe_dump(cfg, f)
            gen(path)

    train_ds = KolmogorovVelocityDataset(
        os.path.join(d, f"train_{args.size}_1.h5"), k=1,
        unroll_length=args.unroll)
    eval_ds = KolmogorovVelocityTrajectoryDataset(
        init_path=os.path.join(d, f"test_init_{args.size}.h5"),
        corr_path=os.path.join(d, "test_32_1.h5"),
        k=1, outer_steps=args.rollout)
    builder = KolmogorovBuilder(train_ds, eval_ds, eval_ds, batch_size=args.batch)

    steps = args.epochs * (len(train_ds) // args.batch)
    routine = LearnedInterpolatorRoutine(
        size=args.size, dt=DT_MODEL, inner_steps=1, outer_steps=args.rollout,
        unroll_length=args.unroll,
        optimizer=make_optimizer(schedule=cosine_with_warmup(args.lr, 50, steps)),
    )
    trainer = Trainer(max_epochs=args.epochs, data_parallel=False)
    t0 = time.time()
    state = trainer.fit(routine, builder)
    out = {k: (float(v) if np.ndim(v) == 0 else [round(float(c), 4) for c in v])
           for k, v in trainer.logs.items() if k.startswith("valid") or k == "train_loss"}
    out["train_time_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    with open(os.path.join(d, "li_results.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
