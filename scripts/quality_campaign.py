"""Flagship quality campaign: generate Kolmogorov data on-chip, train the
24-layer F-FNO, and evaluate autoregressive rollouts on held-out
trajectories.

This is the committed, resumable version of the recipe behind the
RESULTS.md quality table (16 -> 32 -> 80 -> 128 trajectories); it scales
the data axis further (quality was shown to be data-limited). Everything
runs on one chip end to end: DNS generation (native IMEX CN-RK4
pseudo-spectral solver at --sim-size, spectrally downsampled to the model
grid and a 32^2 correlation reference), device-resident scanned training
(bench.py fast path), and a 20-step rollout eval.

Resumable: checkpoints (atomic) + a sidecar epoch counter; re-running the
same command continues where it left off.

Usage (defaults reproduce the 512-trajectory campaign):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_campaign.py \
      --data-dir /root/data/quality512 --n-train 512 --epochs 120
"""

import argparse
import json
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

TWO_PI = 2 * np.pi


def _data_config(n_traj, seed, args, warmup_only=False):
    cfg = {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {
            "_target_": "fourierflow_tpu.utils.Grid",
            "shape": [args.sim_size, args.sim_size],
            "domain": "${domain}",
        },
        "time_step": args.dt,
        "method": "pseudo_spectral",
        "step_fn": {
            "_target_": "jax_cfd.spectral.time_stepping.crank_nicolson_rk4",
            "equation": {
                "_target_": "fourierflow.utils.equations.NavierStokes2D",
                "grid": "${sim_grid}",
                "viscosity": 1e-3,
                "drag": 0.1,
                "smooth": True,
                "forcing_fn": {
                    "_target_": "functools.partial",
                    "_args_": [
                        "${get_method:jax_cfd.base.forcings.simple_turbulence_forcing}"
                    ],
                    "constant_magnitude": 1,
                    "constant_wavenumber": 4,
                    "linear_coefficient": 0,
                },
            },
            "time_step": "${time_step}",
        },
        "downsample_fn": "${get_method:fourierflow.builders.kolmogorov.downsample_vorticity}",
        "n_trajectories": n_traj,
        "max_velocity": 7.0,
        "peak_wavenumber": 4.0,
        "seed": seed,
        "inner_steps": args.inner,
        "outer_steps": 0 if warmup_only else args.outer,
        "warmup_steps": args.warmup,
        "out_sizes": [
            {"size": args.out_size, "k": 1},
            {"size": args.corr_size, "k": 1},
        ],
        # vmap-batched generation: one dispatch per gen_batch trajectories
        # (measured 5.4x over sequential at 128^2 on one v5e chip).
        "generation_batch": args.gen_batch,
    }
    return cfg


def ensure_data(args):
    from fourierflow_tpu.commands.generate import kolmogorov as gen

    d = args.data_dir
    os.makedirs(d, exist_ok=True)
    jobs = [
        ("train", _data_config(args.n_train, 8231, args)),
        ("test", _data_config(args.n_test, 99881, args)),
        ("test_init", _data_config(args.n_test, 99881, args, warmup_only=True)),
    ]
    for stem, cfg in jobs:
        done = os.path.join(
            d,
            f"{stem}_{args.out_size}_1.h5" if cfg["outer_steps"] else f"{stem}_{args.out_size}.h5",
        )
        if os.path.exists(done):
            print(f"[data] {done} exists, skipping", flush=True)
            continue
        path = os.path.join(d, f"{stem}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        t0 = time.time()
        gen(path)
        print(f"[data] generated {stem} ({cfg['n_trajectories']} traj) "
              f"in {time.time() - t0:.0f}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/quality512")
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--sim-size", type=int, default=128)
    p.add_argument("--out-size", type=int, default=64)
    p.add_argument("--corr-size", type=int, default=32)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--outer", type=int, default=80)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--dt", type=float, default=2e-3)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--batch", type=int, default=19)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--eval-every", type=int, default=5)
    p.add_argument("--n-steps", type=int, default=20, help="rollout horizon")
    p.add_argument("--lr", type=float, default=2.5e-3)
    p.add_argument("--warmup-steps", type=int, default=500)
    p.add_argument("--max-acc", type=int, default=None,
                   help="normalizer accumulation cap (default: one epoch of "
                        "batches, the reference's setting)")
    p.add_argument("--clip-val", type=float, default=None,
                   help="gradient value clipping (reference clip_val)")
    p.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--gen-batch", type=int, default=8)
    p.add_argument("--n-layers", type=int, default=24)
    p.add_argument("--noise-std", type=float, default=0.01,
                   help="training-noise injection std (reference markov "
                        "configs use 0.01; the paper credits it for "
                        "rollout stability)")
    p.add_argument("--subset", type=int, default=None,
                   help="train on only the first N trajectories of the "
                        "generated dataset (data-scaling ablations)")
    p.add_argument("--arch", default="ffno", choices=["ffno", "zongyi", "ffno_plus"],
                   help="ffno = flagship factorized model; zongyi = original-FNO "
                        "reproduction (torus_li/ablation/zongyi_markov); ffno_plus "
                        "= non-factorized weights in the F-FNO block structure")
    p.add_argument("--tag", default=None,
                   help="subdirectory for checkpoints/logs (default: arch name; "
                        "keeps ablations on one shared dataset apart)")
    p.add_argument("--chunk-steps", default="auto",
                   help="max train steps per XLA dispatch ('auto' calibrates "
                        "to ~30s dispatches; the relay kills dispatches "
                        "over ~1 min). An int pins the size; 0 disables.")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.builders.kolmogorov import (
        KolmogorovMarkovDataset,
        KolmogorovTrajectoryDataset,
    )
    from fourierflow_tpu.models import FNOFactorized2DBlock
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.schedulers import cosine_with_warmup
    from fourierflow_tpu.trainers.callbacks import load_state, save_state
    from fourierflow_tpu.trainers.trainer import make_scan_epoch_indexed

    print(f"[setup] devices: {jax.devices()}", flush=True)
    ensure_data(args)
    d = args.data_dir

    train_ds = KolmogorovMarkovDataset(
        os.path.join(d, f"train_{args.out_size}_1.h5"), k=args.k)
    if args.subset:
        train_ds.w = train_ds.w[: args.subset]
        train_ds.vx = train_ds.vx[: args.subset]
        train_ds.vy = train_ds.vy[: args.subset]
        train_ds.B = args.subset
    eval_ds = KolmogorovTrajectoryDataset(
        init_path=os.path.join(d, f"test_init_{args.out_size}.h5"),
        path=os.path.join(d, f"test_{args.out_size}_1.h5"),
        corr_path=os.path.join(d, f"test_{args.corr_size}_1.h5"),
        k=args.k,
    )
    n_items = len(train_ds)
    steps_per_epoch = n_items // args.batch
    total_steps = args.epochs * steps_per_epoch
    print(f"[setup] {n_items} training pairs, {steps_per_epoch} steps/epoch, "
          f"{total_steps} total", flush=True)

    dtype = jnp.bfloat16 if args.precision == "bf16" else None
    if args.arch == "ffno":
        model = FNOFactorized2DBlock(
            modes=16, width=64, input_dim=5, n_layers=args.n_layers,
            share_weight=True, factor=4, ff_weight_norm=True, gain=0.1,
            dtype=dtype,
        )
    elif args.arch == "zongyi":
        from fourierflow_tpu.models import FNOZongyi2DBlock

        model = FNOZongyi2DBlock(
            modes1=16, modes2=16, width=64, input_dim=5,
            n_layers=args.n_layers, dropout=0.0)
    else:
        from fourierflow_tpu.models import FNOPlus2DBlock

        model = FNOPlus2DBlock(
            modes=16, width=64, input_dim=5, n_layers=args.n_layers,
            share_weight=True, factor=4, ff_weight_norm=True, gain=0.1)
    routine = Grid2DMarkovRoutine(
        model, n_steps=args.n_steps, use_velocity=True,
        # Reference: accumulate stats over exactly one epoch of batches
        # (torus_kochkov config max_accumulations = batches/epoch).
        max_accumulations=args.max_acc or steps_per_epoch,
        noise_std=args.noise_std,
        step_size=args.dt * args.inner * args.k,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(args.lr, args.warmup_steps, total_steps),
            weight_decay=1e-4,
            clip_val=args.clip_val,
        ),
    )

    sample = train_ds.sample(np.arange(args.batch))
    state = routine.init(jax.random.PRNGKey(0), sample)

    # Run artifacts live per-tag so several archs/ablations can share one
    # dataset; a pre-existing top-level checkpoint (legacy layout) wins for
    # the default run so old campaigns keep resuming.
    tag = args.tag or (args.arch + (f"_n{args.subset}" if args.subset else ""))
    if tag == "ffno" and args.tag is None and os.path.exists(os.path.join(d, "last.ckpt")):
        run_dir = d
    else:
        run_dir = os.path.join(d, "runs", tag)
        os.makedirs(run_dir, exist_ok=True)
    ckpt = os.path.join(run_dir, "last.ckpt")
    meta_path = os.path.join(run_dir, "campaign_meta.json")
    start_epoch = 0
    if os.path.exists(ckpt) and os.path.exists(meta_path):
        with open(meta_path) as f:
            start_epoch = json.load(f)["epoch"] + 1
        state = load_state(ckpt, state)
        print(f"[resume] from epoch {start_epoch}", flush=True)

    data, sample_fn, _ = train_ds.device_train_data(fields=("w",))
    data = jax.tree.map(jnp.asarray, data)
    chunk = args.chunk_steps
    if chunk != "auto":
        chunk = int(chunk) or None
    train_epoch = make_scan_epoch_indexed(
        routine, args.batch, n_items, sample_fn, accumulate=False,
        chunk_steps=chunk)
    acc_epoch = make_scan_epoch_indexed(
        routine, args.batch, n_items, sample_fn, accumulate=True,
        chunk_steps=chunk)
    valid_step = jax.jit(routine.valid_step)
    eval_batch = eval_ds.sample(np.arange(args.n_test))
    eval_batch = {k: jnp.asarray(v) for k, v in eval_batch.items()
                  if k in ("data", "corr_data")}

    key = jax.random.PRNGKey(7231)
    log_path = os.path.join(run_dir, "campaign_log.jsonl")

    if start_epoch == 0:
        t0 = time.time()
        state, _ = acc_epoch(state, data, key)
        print(f"[epoch 0] normalizer accumulation ({time.time() - t0:.0f}s)",
              flush=True)

    for epoch in range(max(start_epoch, 1), args.epochs + 1):
        t0 = time.time()
        state, metrics = train_epoch(state, data, jax.random.fold_in(key, epoch))
        train_loss = float(metrics["train_loss"])
        dt_e = time.time() - t0
        if train_loss != train_loss:
            raise FloatingPointError(f"NaN at epoch {epoch}")
        rec = {
            "epoch": epoch,
            "train_loss": round(train_loss, 6),
            "steps_per_sec": round(steps_per_epoch / dt_e, 1),
        }
        if epoch % args.eval_every == 0 or epoch == args.epochs:
            val = valid_step(state, eval_batch)
            rec.update(
                valid_loss=round(float(val["loss"]), 4),
                valid_corr=round(float(val["corr"]), 4),
                valid_time_until=round(float(val["time_until"]), 3),
            )
            rec["correlations"] = [round(float(c), 4) for c in np.asarray(val["correlations"])]
            if "reduced_time_until" in val:
                # Reference protocol: rho against the independently-solved
                # 32^2 trajectory (grid_2d_markov.py:353-370).
                rec["valid_corr_rho32"] = round(float(val["reduced_corr"]), 4)
                rec["valid_reduced_time_until"] = round(
                    float(val["reduced_time_until"]), 3)
        save_state(ckpt, state)
        with open(meta_path, "w") as f:
            json.dump({"epoch": epoch}, f)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[epoch {epoch}] {rec}", flush=True)


if __name__ == "__main__":
    main()
