"""torus_vis / torus_vis_force full-depth reproduction (VERDICT r2 #7).

Round 2 validated these conditioning workflows with a 4-layer/6-epoch
smoke; this study runs the REFERENCE configuration — 24-layer F-FNO,
input features (vorticity ⊕ positions ⊕ forcing ⊕ viscosity), 1
accumulation + 10 training epochs, batch 19, cosine to 100k
(reference:experiments/torus_vis*/0*/config.yaml) — including the
conditioning ablation (02_no_mu drops the viscosity channel, 03_no_mu_force
drops forcing too), on regenerated data.

Data: the reference generates 1000+200+200 trajectories at 256² (random
2-cycle forcing, per-sample μ ∈ [1e-5, 1e-4], δt 1e-4, 200 snapshots over
20 sim-units; 14-21 h on a V100, README.md:85-98) and trains at ssr=4
(64²). Here the native CN solver generates --n-train trajectories at 64²
directly (ssr=1), same forcing/μ/δt/cadence — the round-2 fidelity study
(RESULTS "DNS fidelity matters") quantifies the direct-vs-downsampled
difference separately.

Resumable via study.json like torus_li_study.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/torus_vis_study.py
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

JOBS = [
    ("vis_01_baseline", "torus_vis/01_baseline", "vis"),
    ("vis_02_no_mu", "torus_vis/02_no_mu", "vis"),
    ("vis_03_no_mu_force", "torus_vis/03_no_mu_force", "vis"),
    ("force_01_baseline", "torus_vis_force/01_baseline", "force"),
]


def generate(path, varying_force, args):
    from fourierflow_tpu.commands.generate import navier_stokes

    if os.path.exists(path):
        print(f"[data] {path} exists, skipping", flush=True)
        return
    t0 = time.time()
    navier_stokes(
        path=path, n_train=args.n_train, n_valid=args.n_eval,
        n_test=args.n_eval, s=64, t=args.t_end, steps=args.steps,
        mu_min=1e-5, mu_max=1e-4, seed=48397 if varying_force else 48396,
        delta=args.delta, batch_size=args.gen_batch, force="random",
        cycles=2, varying_force=varying_force,
    )
    print(f"[data] {path}: {args.n_train}+2x{args.n_eval} traj in "
          f"{time.time() - t0:.0f}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/torus_vis")
    p.add_argument("--n-train", type=int, default=400)
    p.add_argument("--n-eval", type=int, default=50)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--t-end", type=float, default=20.0)
    p.add_argument("--delta", type=float, default=1e-4)
    p.add_argument("--gen-batch", type=int, default=50)
    p.add_argument("--val-every", type=int, default=5)
    p.add_argument("--max-epochs-override", type=int, default=0)
    p.add_argument("--layers-override", type=int, default=0)
    p.add_argument("--trials", type=int, default=1,
                   help="independent seeds per job (trial t keys the "
                   "study as <name>_trial<t> for t>0; trial 0 keeps the "
                   "bare <name> so existing single-trial studies resume)")
    p.add_argument("--only", default="",
                   help="comma-separated job-name filter, e.g. "
                   "vis_01_baseline,vis_03_no_mu_force")
    args = p.parse_args()

    os.makedirs(args.data_dir, exist_ok=True)
    results_path = os.path.join(args.data_dir, "study.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)

    vis = os.path.join(args.data_dir, "torus_vis.h5")
    forced = os.path.join(args.data_dir, "torus_vis_force.h5")
    only = {n for n in args.only.split(",") if n}

    def will_run(name):
        """True if any trial of this job is still to do under --only."""
        if only and name not in only:
            return False
        return any((name if t == 0 else f"{name}_trial{t}") not in results
                   for t in range(args.trials))

    if any(will_run(name) for name, _, d in JOBS if d == "vis"):
        generate(vis, False, args)
    if any(will_run(name) for name, _, d in JOBS if d == "force"):
        generate(forced, True, args)

    from fourierflow_tpu.commands import train as train_cmd
    for name, config, dset in JOBS:
        if only and name not in only:
            continue
        for trial in range(args.trials):
            key = name if trial == 0 else f"{name}_trial{trial}"
            if key in results:
                print(f"[job] {key} already done, skipping", flush=True)
                continue
            overrides = [
                f"builder.data_path={vis if dset == 'vis' else forced}",
                "builder.ssr=1",  # data is generated at 64^2 directly
                f"trainer.check_val_every_n_epoch={args.val_every}",
            ]
            if args.max_epochs_override:
                overrides.append(
                    f"trainer.max_epochs={args.max_epochs_override}")
            if args.layers_override:
                overrides.append(
                    f"routine.conv.n_layers={args.layers_override}")
            t0 = time.time()
            trainer, _ = train_cmd.main(config, overrides=overrides,
                                        trial=trial, force=True)
            out = {k: float(v) for k, v in trainer.logs.items()
                   if np.ndim(v) == 0}
            corr = trainer.logs.get("test_correlations")
            if corr is not None:
                out["test_mean_rho"] = float(np.mean(corr))
            out["wall_s"] = round(time.time() - t0, 1)
            results[key] = out
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2)
            print(f"[job] {key}: "
                  f"test_loss {out.get('test_loss', float('nan')):.4f} "
                  f"test_corr {out.get('test_corr', float('nan')):.4f} "
                  f"({out['wall_s']:.0f}s)", flush=True)

    print(json.dumps({n: {k: round(v, 4) for k, v in r.items()}
                      for n, r in results.items()}, indent=1), flush=True)


if __name__ == "__main__":
    main()
