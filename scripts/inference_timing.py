"""Per-run inference timing for the performance-tradeoff figure.

The reference's Figure-1-style tradeoff plots
(reference:fourierflow/commands/plot.py:1026-1083) chart N-MSE against
inference runtime / training time per model variant, pulling both from
wandb. Here the quality-campaign runs (scripts/quality_campaign.py) hold
the loss side in ``runs/<tag>/campaign_log.jsonl``; this script measures
the runtime side on the real chip — the jitted autoregressive rollout
(same code path as ``commands/predict.py``) per sample per
simulation-second — and appends one JSON line per run to
``<data-dir>/runs/inference_times.jsonl`` for ``plot tradeoff``.

Usage (flagship kochkov512 campaign runs):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/inference_timing.py \
      --data-dir /root/data/kochkov512 --k 20 --inner 16 --dt 8.75e-4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_RUNS = ["ffno_ref=ffno:24", "ffno4=ffno:4",
                "zongyi24=zongyi:24", "zongyi4=zongyi:4"]


def build_model(arch: str, n_layers: int, precision: str):
    """Same flagship hyperparameters as scripts/quality_campaign.py."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if precision == "bf16" else None
    if arch == "ffno":
        from fourierflow_tpu.models import FNOFactorized2DBlock

        return FNOFactorized2DBlock(
            modes=16, width=64, input_dim=5, n_layers=n_layers,
            share_weight=True, factor=4, ff_weight_norm=True, gain=0.1,
            dtype=dtype,
        )
    if arch == "zongyi":
        from fourierflow_tpu.models import FNOZongyi2DBlock

        return FNOZongyi2DBlock(
            modes1=16, modes2=16, width=64, input_dim=5,
            n_layers=n_layers, dropout=0.0)
    if arch == "ffno_plus":
        from fourierflow_tpu.models import FNOPlus2DBlock

        return FNOPlus2DBlock(
            modes=16, width=64, input_dim=5, n_layers=n_layers,
            share_weight=True, factor=4, ff_weight_norm=True, gain=0.1)
    raise ValueError(f"unknown arch {arch!r}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/kochkov512")
    p.add_argument("--run", action="append", default=None,
                   help="tag=arch:n_layers (repeatable); default: the four "
                        "architecture-ablation runs")
    p.add_argument("--out-size", type=int, default=64)
    p.add_argument("--corr-size", type=int, default=32)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--inner", type=int, default=16)
    p.add_argument("--dt", type=float, default=8.75e-4)
    p.add_argument("--n-steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.builders.kolmogorov import KolmogorovTrajectoryDataset
    from fourierflow_tpu.routines import Grid2DMarkovRoutine
    from fourierflow_tpu.routines.base import make_optimizer
    from fourierflow_tpu.trainers.callbacks import load_inference_state

    d = args.data_dir
    eval_ds = KolmogorovTrajectoryDataset(
        init_path=os.path.join(d, f"test_init_{args.out_size}.h5"),
        path=os.path.join(d, f"test_{args.out_size}_1.h5"),
        corr_path=os.path.join(d, f"test_{args.corr_size}_1.h5"),
        k=args.k,
    )
    raw = eval_ds.sample(np.arange(args.batch))
    batch = {"data": jnp.asarray(raw["data"])}
    step_size = args.dt * args.inner * args.k
    out_path = os.path.join(d, "runs", "inference_times.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    for spec in args.run or DEFAULT_RUNS:
        tag, model_spec = spec.split("=")
        arch, n_layers = model_spec.split(":")
        ckpt = os.path.join(d, "runs", tag, "last.ckpt")
        if not os.path.exists(ckpt) and tag == "ffno":
            # legacy campaign layout (quality_campaign.py keeps the default
            # run's artifacts at the data-dir root)
            ckpt = os.path.join(d, "last.ckpt")
        if not os.path.exists(ckpt):
            print(f"[skip] {tag}: no checkpoint at {ckpt}", flush=True)
            continue
        model = build_model(arch, int(n_layers), args.precision)
        routine = Grid2DMarkovRoutine(
            model, n_steps=args.n_steps, use_velocity=True,
            step_size=step_size, optimizer=make_optimizer(lr=1e-3),
        )
        state = routine.init(jax.random.PRNGKey(0), raw)
        state = load_inference_state(ckpt, state)
        rollout = jax.jit(lambda s, b: routine.rollout(s, b)[0])
        preds = rollout(state, batch)
        _ = float(jnp.sum(preds))  # compile + real fetch (relay-safe timing)

        times = []
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            preds = rollout(state, batch)
            _ = float(jnp.sum(preds))
            times.append(time.perf_counter() - t0)
        elapsed = min(times)
        sim_seconds = args.n_steps * step_size
        rec = {
            "tag": tag,
            "arch": arch,
            "n_layers": int(n_layers),
            "n_params": int(routine.n_params(state)),
            "batch": args.batch,
            "n_steps": args.n_steps,
            "step_size": step_size,
            "elapsed_s": round(elapsed, 5),
            "inference_time": elapsed / args.batch / sim_seconds,
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{tag}] {rec}", flush=True)


if __name__ == "__main__":
    main()
