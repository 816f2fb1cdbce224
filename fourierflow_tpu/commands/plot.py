"""``plot`` command: paper-style figures and tables from local run logs.

Equivalent of reference:fourierflow/commands/plot.py (1,485 LoC) with one
deliberate design change: the reference pulls every number from the
author's Weights & Biases account at plot time (plot.py:759-802), so its
plots are irreproducible without that account. Here all numbers come from
the ``metrics.jsonl`` files the JSONLogger callback writes into each run's
checkpoint directory, so figures regenerate from local artifacts.

Subcommands mirror the reference's figure families:
  - ``layers``: test loss vs depth per experiment group (Fig. 3-style)
  - ``correlation``: vorticity correlation rho(t) curves (Fig. 4-style)
  - ``table``: final metrics per experiment as a markdown table (Tab. A.*)
  - ``heatmap``: prediction/target vorticity heatmaps from a sample.pkl
"""

import glob
import json
import logging
import os
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["collect_runs", "layers", "correlation", "table", "heatmap"]


def _read_metrics(run_dir: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def collect_runs(root: str, pattern: str = "**/checkpoints/trial-*"):
    """Find run dirs under `root` and load their logged metrics."""
    runs = {}
    for run_dir in sorted(glob.glob(os.path.join(root, pattern), recursive=True)):
        records = _read_metrics(run_dir)
        if records:
            rel = os.path.relpath(run_dir, root)
            runs[rel] = records
    return runs


def _final_scalars(records):
    out = {}
    for rec in records:
        for k, v in rec.items():
            if isinstance(v, (int, float)):
                out[k] = v
    return out


def table(root: str = "configs", keys: Optional[List[str]] = None,
          out_path: Optional[str] = None) -> str:
    """Markdown table of final metrics per run (reference plot.py:617-731
    rebuilt from local logs)."""
    runs = collect_runs(root)
    keys = keys or ["test_loss", "valid_loss", "test_time_until", "train_loss"]
    lines = ["| run | " + " | ".join(keys) + " |",
             "|---|" + "---|" * len(keys)]
    for name, records in runs.items():
        finals = _final_scalars(records)
        row = [f"{finals[k]:.5g}" if k in finals else "—" for k in keys]
        lines.append(f"| {name} | " + " | ".join(row) + " |")
    text = "\n".join(lines)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    print(text)
    return text


def layers(root: str = "configs", metric: str = "test_loss",
           out_path: str = "layers.png"):
    """Metric vs layer count, one series per experiment family."""
    runs = collect_runs(root)
    series = {}
    for name, records in runs.items():
        finals = _final_scalars(records)
        if metric not in finals:
            continue
        parts = name.split(os.sep)
        depth = next((p for p in parts if p.endswith("_layers")), None)
        if depth is None:
            continue
        family = os.sep.join(p for p in parts if not p.endswith("_layers"))[:60]
        series.setdefault(family, []).append((int(depth.split("_")[0]), finals[metric]))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print(json.dumps(series, indent=2, default=float))
        return series
    fig, ax = plt.subplots(figsize=(5, 4))
    for family, pts in sorted(series.items()):
        pts = sorted(pts)
        ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", label=family)
    ax.set_xlabel("layers")
    ax.set_ylabel(metric)
    ax.set_yscale("log")
    ax.legend(fontsize=6)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def correlation(root: str = "configs", out_path: str = "correlation.png"):
    """rho(t) curves from logged per-time correlations."""
    runs = collect_runs(root)
    curves = {}
    for name, records in runs.items():
        for rec in records:
            if isinstance(rec.get("test_correlations"), list):
                curves[name] = (rec.get("test_times"), rec["test_correlations"])
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print(json.dumps(curves, indent=2, default=float))
        return curves
    fig, ax = plt.subplots(figsize=(5, 4))
    for name, (times, rho) in sorted(curves.items()):
        xs = times if times is not None else list(range(len(rho)))
        ax.plot(xs, rho, label=name[:50])
    ax.axhline(0.95, color="grey", ls="--", lw=0.8)
    ax.set_xlabel("simulation time")
    ax.set_ylabel("vorticity correlation")
    ax.legend(fontsize=6)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def heatmap(sample_path: str, step: int = -1, out_prefix: str = "field"):
    """Prediction vs target heatmaps from a ``sample`` command pickle."""
    import pickle

    from ..viz.heatmap import log_imshow

    with open(sample_path, "rb") as f:
        batch, preds = pickle.load(f)
    preds = np.asarray(preds)
    pred = preds[0, ..., step] if preds.ndim == 4 else preds[0]
    outs = [log_imshow(pred, "prediction", f"{out_prefix}_pred.png")]
    data = batch.get("data") if isinstance(batch, dict) else None
    if data is not None:
        outs.append(log_imshow(np.asarray(data)[0, ..., step], "target",
                               f"{out_prefix}_target.png"))
    return outs
