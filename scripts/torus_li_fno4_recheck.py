"""Regenerate raw in-repo evidence for the torus_li FNO-4 cells.

The round-4 multi-trial torus_li study completed on chip but its raw
artifacts (study.json, per-run metrics.jsonl) lived on the data disk,
which was wiped between rounds — RESULTS.md's headline table is marked
"as recorded". This re-runs ONLY the cheap cells of that table (the
original-FNO baseline at the budget-matched 101-epoch leg, ~5 min/trial,
and optionally the 500-epoch leg) on a freshly regenerated seeded
dataset, so at least part of the table is re-verified with raw artifacts
that live in the repo. The expensive F-FNO-24 cells (~50 min/trial) are
out of scope here — run scripts/torus_li_study.py for the full grid.

Reference protocol: torus_li/zongyi/4_layers (reference
experiments/torus_li/zongyi/4_layers/config.yaml; budgets per
reference:fourierflow/commands/train.py:56-58 trial seeding).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/torus_li_fno4_recheck.py --trials 3
"""

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import logging

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

import numpy as np

from torus_li_study import generate, run_job  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/torus_li")
    p.add_argument("--n-traj", type=int, default=1200)
    p.add_argument("--gen-batch", type=int, default=60)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--val-every", type=int, default=25)
    p.add_argument("--ckpt-every", type=int, default=10)
    p.add_argument("--max-epochs-override", type=int, default=0)
    p.add_argument("--t-end", type=float, default=20.0)
    p.add_argument("--base-delta", type=float, default=1e-4)
    p.add_argument("--include-e500", action="store_true",
                   help="also run the 500-epoch baseline leg (~23 min/trial)")
    args = p.parse_args()

    os.makedirs(args.data_dir, exist_ok=True)
    results_path = os.path.join(args.data_dir, "study.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)

    base = os.path.join(args.data_dir, "li64_dt1e-4.h5")
    generate(base, args.base_delta, args)

    jobs = [("fno4_e101", "torus_li/zongyi/4_layers",
             ["trainer.max_epochs=101"])]
    if args.include_e500:
        jobs.append(("fno4", "torus_li/zongyi/4_layers", []))

    for model, config, extra in jobs:
        for trial in range(args.trials):
            name = f"{model}_trial{trial}"
            if name in results:
                print(f"[job] {name} already done, skipping", flush=True)
                continue
            results[name] = run_job(name, config, trial, base, args, extra)
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2)

    for model, _, _ in jobs:
        losses = [results[f"{model}_trial{t}"]["test_loss"]
                  for t in range(args.trials)
                  if f"{model}_trial{t}" in results]
        if losses:
            print(f"[summary] {model}: test_loss {np.mean(losses):.4f} "
                  f"± {np.std(losses):.4f} over {len(losses)} trials",
                  flush=True)


if __name__ == "__main__":
    main()
