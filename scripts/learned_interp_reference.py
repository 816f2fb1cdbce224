"""Learned-interpolation CFD at the REFERENCE protocol (VERDICT r2 #2).

Reproduces reference:experiments/torus_kochkov/learned_interpolation/
rollout/x64/config.yaml semantics end to end on one chip:

- model step dt = 0.007012483601762931 (32x the 2048^2-stable DNS step),
  FusedLearnedInterpolation-style 6-layer/64-feature CNN correction
  (routines/learned_interpolator.py:48-62 analog);
- TRAINING: 32-step unrolled cumulative l2 loss
  (reference routines/learned_interpolator.py:109-122), batch 4, AdamW
  (b1 0.9, b2 0.99, wd 1e-4) with warmup-cosine peak 1e-3 / warmup 500 /
  decay 40k (the reference's optimizer block), 10 epochs;
- VALIDATION: 100 outer snapshots x 16 model steps each (11.2 sim-s),
  predictions downsampled (staggered) to the 32^2 DNS reference,
  vorticity correlation rho(t) and valid_reduced_time_until (rho >= 0.95
  horizon) — reference :124-184.

Data: the reference trains on 2048^2 DNS downsampled to 64^2 at the
model cadence. Here the native pseudo-spectral solver generates at
--sim-size (default 512^2, the fidelity-validated generator from the
RESULTS "DNS fidelity matters" study) with dt_model/8 substeps, records
frames at the model cadence, and downsamples snapshots to 64^2 (+32^2
reference). Train trajectories carry 200 frames -> (200-32) windows x 32
trajectories = 5,376 unroll-32 samples, matching the reference's
train_64_1.nc epoch structure (its k=2 windows over 200 frames at half
the cadence).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/learned_interp_reference.py --data-dir /root/data/li_ref
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
    # sitecustomize pins the axon TPU platform before this script runs;
    # honor an explicit JAX_PLATFORMS (CPU smoke tests) the way
    # tests/conftest.py does.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import yaml

TWO_PI = 2 * np.pi
DT_MODEL = 0.007012483601762931  # reference x64 routine dt
SUBSTEPS = 8  # DNS steps per model-cadence frame (dt_DNS = 8.77e-4)


def _cfg(n_traj, seed, outer, warmup, args, warmup_only=False):
    return {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {"_target_": "fourierflow_tpu.utils.Grid",
                     "shape": [args.sim_size, args.sim_size],
                     "domain": "${domain}"},
        "time_step": DT_MODEL / SUBSTEPS,
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
        "seed": seed, "inner_steps": SUBSTEPS,
        "outer_steps": 0 if warmup_only else outer,
        "warmup_steps": warmup,
        "out_sizes": [{"size": 64, "k": 1}, {"size": 32, "k": 1}],
        "generation_batch": 8,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/li_ref")
    p.add_argument("--sim-size", type=int, default=512)
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--train-frames", type=int, default=200)
    p.add_argument("--warmup", type=int, default=400,
                   help="warmup frames (x SUBSTEPS DNS steps each, ~2.8 sim-s)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--steps-per-epoch", type=int, default=4000,
                   help="limit_train_batches; the reference budget is 10 "
                   "epochs x 4000 = 40k steps. Smaller epochs (x more of "
                   "them) keep the same step/schedule semantics but "
                   "checkpoint + log more often — the LR schedule is "
                   "step-based (decay 40k) and epoch-independent.")
    p.add_argument("--val-every", type=int, default=1)
    p.add_argument("--unroll", type=int, default=32)
    p.add_argument("--inner", type=int, default=16)
    p.add_argument("--outer", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--trial", type=int, default=0)
    p.add_argument("--decay-steps", type=int, default=40000,
                   help="cosine decay budget; the reference protocol is "
                   "40k. The round-5 data-volume test runs a complete "
                   "half-budget cosine (20k) instead of truncating the "
                   "40k schedule mid-decay, since round 4 measured "
                   "quality convergence by ~16k steps")
    p.add_argument("--resume", action="store_true",
                   help="continue from <data-dir>/ckpt/last.ckpt; the "
                   "restored optimizer step positions the LR schedule and "
                   "the remaining epoch count (epoch-granularity, like "
                   "commands/train.py --resume)")
    p.add_argument("--fine-inner", type=int, default=4,
                   help="inner steps for the final fine-cadence rho(t) "
                   "eval (the per-epoch protocol stays at --inner; this "
                   "only de-quantizes the reported horizon, which at "
                   "inner=16 is locked to 0.112 sim-s multiples)")
    args = p.parse_args()

    import jax
    import optax

    from fourierflow_tpu.builders import KolmogorovBuilder
    from fourierflow_tpu.builders.kolmogorov import (
        KolmogorovVelocityDataset,
        KolmogorovVelocityTrajectoryDataset,
    )
    from fourierflow_tpu.commands.generate import kolmogorov as gen
    from fourierflow_tpu.routines import LearnedInterpolatorRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers import Trainer

    d = args.data_dir
    os.makedirs(d, exist_ok=True)
    eval_frames = args.outer * args.inner  # 1600 model-cadence frames
    jobs = [
        ("train", _cfg(args.n_train, 524, args.train_frames, args.warmup, args)),
        ("test", _cfg(args.n_test, 9917, eval_frames, args.warmup, args)),
        ("test_init", _cfg(args.n_test, 9917, 0, args.warmup, args,
                           warmup_only=True)),
    ]
    for stem, cfg in jobs:
        done = os.path.join(
            d, f"{stem}_64_1.h5" if cfg["outer_steps"] else f"{stem}_64.h5")
        if os.path.exists(done):
            print(f"[data] {done} exists, skipping", flush=True)
            continue
        path = os.path.join(d, f"{stem}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        t0 = time.time()
        gen(path)
        print(f"[data] {stem}: {cfg['n_trajectories']} traj in "
              f"{time.time() - t0:.0f}s", flush=True)

    train_ds = KolmogorovVelocityDataset(
        os.path.join(d, "train_64_1.h5"), k=1, unroll_length=args.unroll)
    eval_ds = KolmogorovVelocityTrajectoryDataset(
        init_path=os.path.join(d, "test_init_64.h5"),
        corr_path=os.path.join(d, "test_32_1.h5"),
        k=1, inner_steps=args.inner, outer_steps=args.outer)
    builder = KolmogorovBuilder(train_ds, eval_ds, eval_ds,
                                batch_size=args.batch)
    print(f"[data] {len(train_ds)} unroll-{args.unroll} train samples, "
          f"{len(eval_ds)} eval trajectories", flush=True)

    # Reference optimizer block (adamw + warmup-cosine, config
    # torus_kochkov/learned_interpolation/rollout/x64) with one stability
    # deviation: global-norm grad clipping at 1.0. The 32-step unrolled
    # loss NaN'd an unclipped full-budget run at step 18,176 (epoch 3);
    # clipping is the standard mitigation for backprop-through-solver
    # training and does not change the reference's LR/decay schedule.
    routine = LearnedInterpolatorRoutine(
        size=64, dt=DT_MODEL, inner_steps=args.inner, outer_steps=args.outer,
        unroll_length=args.unroll,
        optimizer=make_optimizer(optimizer=optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    0.0, 1e-3, warmup_steps=500,
                    decay_steps=args.decay_steps, end_value=0.0),
                b1=0.9, b2=0.99, weight_decay=1e-4))),
    )
    # limit_train_batches=4000: the reference trains 10 epochs x 4000
    # batches = 40k steps, exactly the cosine decay budget (config
    # trainer.limit_train_batches: 4000).
    from fourierflow_tpu.trainers.callbacks import (JSONLogger, ModelCheckpoint,
                                                    load_state)

    ckpt = ModelCheckpoint(dirpath=os.path.join(d, "ckpt"),
                           monitor="valid_reduced_time_until", mode="max")
    trainer = Trainer(max_epochs=args.epochs, data_parallel=False,
                      seed=7231 + args.trial,
                      limit_train_batches=args.steps_per_epoch,
                      check_val_every_n_epoch=args.val_every,
                      callbacks=[ckpt,
                                 JSONLogger(os.path.join(d, "epochs.jsonl"))])

    import jax as _jax

    init_state = routine.init(_jax.random.PRNGKey(0), builder.sample_batch())
    epoch_offset = 0
    resume_path = os.path.join(d, "ckpt", "last.ckpt")
    if args.resume and os.path.exists(resume_path):
        # Epoch-granularity resume: last.ckpt carries the full TrainState
        # (params + AdamW moments + step), so the warmup-cosine schedule
        # continues from the restored step; only the remaining epochs run.
        init_state = load_state(resume_path, init_state)
        done_steps = int(init_state.step)
        epoch_offset = done_steps // args.steps_per_epoch
        trainer.max_epochs = max(args.epochs - epoch_offset, 0)
        trainer.logs["epoch_offset"] = epoch_offset
        # Decorrelate the resumed shuffle stream: Trainer.fit restarts its
        # rng from the seed, which would replay epochs 0..k's batch order.
        trainer.seed = trainer.seed + 1000 * epoch_offset
        print(f"[resume] {resume_path}: step {done_steps} -> "
              f"{trainer.max_epochs} epochs remain", flush=True)
    elif args.resume:
        print(f"[resume] no checkpoint at {resume_path}; fresh run", flush=True)

    # Un-learned control: the correction head is zero-initialized, so the
    # freshly init'd model IS the plain 64^2 FV DNS — the baseline Kochkov
    # et al. claim to beat (reference data config
    # re_1000/learned_interpolation/control.yaml). Skipped on resume (the
    # restored state is no longer the control; the fresh-run record keeps
    # it in control.json / the original epochs.jsonl).
    control_out = {}
    if epoch_offset == 0:
        control = trainer.evaluate(routine, builder, init_state, split="valid")
        control_out = {f"control_{k}": v for k, v in control.items()}
        print(json.dumps({k: (float(v) if np.ndim(v) == 0 else None)
                          for k, v in control_out.items()}), flush=True)

    t0 = time.time()
    try:
        state = trainer.fit(routine, builder, state=init_state)
    except FloatingPointError as e:
        # Per-epoch checkpoints + epochs.jsonl already persist progress;
        # report what completed instead of losing the run.
        print(f"[warn] training aborted: {e}", flush=True)
        trainer.logs["aborted"] = str(e)
        state = None
    trainer.logs.update(control_out)

    # Final fine-cadence rho(t): same total model steps (inner*outer), but
    # correlations scored every --fine-inner model steps so the horizon
    # metric is not quantized to the validation snapshot cadence
    # (VERDICT r3 weak #1: at inner=16 time_until moves in 0.112 sim-s
    # jumps — 3 snapshots and 3.9 snapshots read identically).
    if state is not None and args.fine_inner and args.fine_inner < args.inner:
        fine_outer = args.outer * args.inner // args.fine_inner
        fine_ds = KolmogorovVelocityTrajectoryDataset(
            init_path=os.path.join(d, "test_init_64.h5"),
            corr_path=os.path.join(d, "test_32_1.h5"),
            k=1, inner_steps=args.fine_inner, outer_steps=fine_outer)
        fine_builder = KolmogorovBuilder(fine_ds, fine_ds, fine_ds,
                                         batch_size=args.batch)
        fine_routine = LearnedInterpolatorRoutine(
            size=64, dt=DT_MODEL, inner_steps=args.fine_inner,
            outer_steps=fine_outer, unroll_length=args.unroll)
        fine = trainer.evaluate(fine_routine, fine_builder, state,
                                split="valid")
        trainer.logs.update({f"fine_{k}": v for k, v in fine.items()})
        print(f"[fine] rho {float(fine['valid_rho']):.4f} "
              f"time_until {float(fine['valid_reduced_time_until']):.4f} "
              f"(cadence {DT_MODEL * args.fine_inner:.4f} sim-s)", flush=True)

    out = {k: (float(v) if np.ndim(v) == 0
               else [round(float(c), 4) for c in np.asarray(v).ravel()])
           for k, v in trainer.logs.items()
           if k.startswith(("valid", "control", "fine"))
           or k in ("train_loss", "epoch_time")}
    out["train_time_s"] = round(time.time() - t0, 1)
    out["step_size"] = DT_MODEL * args.inner
    # Protocol identity (ADVICE r3: an unroll-8 fallback run previously
    # wrote a JSON indistinguishable from the reference-protocol one).
    out.update(unroll=args.unroll, steps_per_epoch=args.steps_per_epoch,
               epochs=args.epochs, batch=args.batch, inner=args.inner,
               outer=args.outer, epoch_offset=epoch_offset,
               final_step=int(state.step) if state is not None else None)
    print(json.dumps(out), flush=True)
    with open(os.path.join(d, f"li_reference_trial{args.trial}.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
