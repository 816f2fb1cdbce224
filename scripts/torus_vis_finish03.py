"""Finish torus_vis/03_no_mu_force (VERDICT r3 #3).

The round-3 study (scripts/torus_vis_study.py) was killed at epoch 8 of
the 1+10-epoch reference budget by the round deadline; last.ckpt from
that run sits under torus_vis/03_no_mu_force/checkpoints/. This resumes
it for the 2 remaining training epochs (epoch-granularity resume: epoch 0
of the resumed fit re-accumulates normalizer statistics from the same
data — a no-op on the running stats — then 2 training epochs complete
the 10-epoch budget; the cosine schedule is step-based and continues
from the restored optimizer step), runs the final test rollout, and
writes the study.json row the round-3 record is missing.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/torus_vis_finish03.py --data-dir /root/data/torus_vis
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/torus_vis")
    p.add_argument("--epochs", type=int, default=3,
                   help="1 normalizer re-accumulation epoch + remaining "
                   "training epochs (round 3 finished 8 of 10)")
    args = p.parse_args()

    from fourierflow_tpu.commands import train as train_cmd

    vis = os.path.join(args.data_dir, "torus_vis.h5")
    if not os.path.exists(vis):
        raise FileNotFoundError(f"{vis} — regenerate with torus_vis_study.py")

    t0 = time.time()
    trainer, _ = train_cmd.main(
        "torus_vis/03_no_mu_force",
        overrides=[
            f"builder.data_path={vis}",
            "builder.ssr=1",
            f"trainer.max_epochs={args.epochs}",
            "trainer.check_val_every_n_epoch=1",
        ],
        trial=0, resume=True)

    out = {k: float(v) for k, v in trainer.logs.items() if np.ndim(v) == 0}
    corr = trainer.logs.get("test_correlations")
    if corr is not None:
        out["test_mean_rho"] = float(np.mean(corr))
    out["wall_s"] = round(time.time() - t0, 1)
    out["resumed_from_epoch"] = 8
    results_path = os.path.join(args.data_dir, "study.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    results["vis_03_no_mu_force"] = out
    with open(results_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[job] vis_03_no_mu_force: test_loss {out.get('test_loss', float('nan')):.4f} "
          f"test_corr {out.get('test_corr', float('nan')):.4f} "
          f"({out['wall_s']:.0f}s)", flush=True)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
