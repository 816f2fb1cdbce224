"""``plot`` command: paper-style figures and tables from local run logs.

Equivalent of reference:fourierflow/commands/plot.py (1,485 LoC) with one
deliberate design change: the reference pulls every number from the
author's Weights & Biases account at plot time (plot.py:759-802), so its
plots are irreproducible without that account. Here all numbers come from
the ``metrics.jsonl`` files the JSONLogger callback writes into each run's
checkpoint directory (``<group>/checkpoints/trial-{n}-{ts}/``), so every
figure and table regenerates from local artifacts.

Coverage of the reference surface:
  - ``table torus_li|airfoil|elasticity|plasticity|pipe`` — the paper's
    Tables A.3-A.6 (reference plot.py:617-731): per model family x depth,
    parameter count, N-MSE (%) mean/min/max over trials, train hours.
    Emitted as markdown and (with --latex) the reference's LaTeX rows.
  - ``table`` (no dataset) — generic final-metrics table over all runs.
  - ``layers`` — N-MSE vs depth per family with min/max band (reference
    plot_performance_vs_layer + plot_ablation, :854-918).
  - ``correlation`` — vorticity correlation rho(t) curves incl. campaign
    logs (reference plot_correlation_over_time, :173-254).
  - ``step-losses`` — per-rollout-step N-MSE curves (reference
    plot_step_loss_curves, :936-951).
  - ``parameters`` — parameter count vs depth (reference plot_parameters,
    :969-995).
  - ``heatmap`` — prediction/target vorticity fields from a sample.pkl
    (reference heatmaps, :596-614).
  - ``energy`` — shell-averaged kinetic energy spectra k^5 E(k) of
    predictions/DNS trajectories (reference plot_energy_spectrum,
    :256-307).
  - ``flows`` — vorticity snapshot grid, rows = trajectories/models,
    cols = times (reference flows, :139-170).
  - ``superresolution`` — rollout metrics vs evaluation grid for a
    fixed-resolution checkpoint (reference superresolution /
    plot_correlation_vs_time_of_different_grid_sizes, :66-75, :341-456),
    fed by ``scripts/superres_eval.py`` output.
  - ``tradeoff`` — N-MSE vs inference runtime per model family/depth with
    DNS baseline points (reference
    plot_pde_inference_performance_tradeoff, :1026-1054), fed by
    ``scripts/inference_timing.py`` output.
  - ``stepsize`` — stable-rollout horizon vs step size, F-FNO k-sweep
    line + DNS dt-multiple line (reference plot_varying_step_size,
    :458-525), fed by campaign logs and ``scripts/stepsize_dns.py``
    output.

Not ported verbatim: the reference's ``context`` (:98-138) and
``poster`` (:753-758) hardcode the author's wandb numbers into the
script; ``coordinates``/``resolution``/``torus_li_performance``/
``complexity`` are fixed page-layout compositions of the same helpers
covered above. Their data comes out of this module's generic ``table``
/ ``layers`` / ``correlation`` over the corresponding experiment groups
(e.g. ``table --root configs/torus_vis`` reproduces the context-ablation
comparison from local runs).
"""

import glob
import json
import logging
import os
import re
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "collect_runs",
    "collect_groups",
    "layers",
    "correlation",
    "step_losses",
    "parameters",
    "table",
    "reference_table",
    "heatmap",
    "energy",
    "flows",
    "superresolution",
    "ablation",
    "tradeoff",
    "stepsize",
]

# The reference's Tables A.3-A.6 (plot.py:617-731): rows are (display
# name, registry family, depths). Registry families carry the reference's
# exact group names (experiments.py).
_LAYERS_SHORT = [4, 8, 12, 16, 20]
_LAYERS_FULL = [4, 8, 12, 16, 20, 24]
_GEO_ROWS = [
    ("geo-FNO (reproduced)", "geo-fno", [4, 8, 12]),
    ("F-FNO (with weight sharing)", "ffno-shared", _LAYERS_FULL),
    ("F-FNO (without weight sharing)", "ffno", _LAYERS_FULL),
]
REFERENCE_TABLES = {
    # Table A.3
    "torus_li": [
        ("FNO (reproduced)", "zongyi", _LAYERS_SHORT),
        ("FNO-TF (FNO with teacher forcing)", "ablation/teacher_forcing", _LAYERS_SHORT),
        ("FNO-M (FNO-TF with Markov assumption)", "ablation/zongyi_markov", _LAYERS_SHORT),
        ("FNO-R (FNO-M with improved residuals)", "ablation/zongyi_markov_residual", _LAYERS_FULL),
        ("FNO++ (FNO-R with bags of tricks)", "ablation/no_factorization", _LAYERS_FULL),
        ("F-FNO (FNO++ with Fourier factorization)", "ablation/no_sharing", _LAYERS_FULL),
        ("F-FNO-WS (F-FNO with weight sharing)", "markov", _LAYERS_FULL),
    ],
    # Tables A.4-A.6 share one structure
    "airfoil": _GEO_ROWS,
    "elasticity": _GEO_ROWS,
    "plasticity": _GEO_ROWS,
    "pipe": _GEO_ROWS,
}


def _read_metrics(run_dir: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def collect_runs(root: str, pattern: str = "**/checkpoints/trial-*"):
    """Find run dirs under `root` and load their logged metrics,
    keyed by the run dir path relative to root."""
    runs = {}
    for run_dir in sorted(glob.glob(os.path.join(root, pattern), recursive=True)):
        records = _read_metrics(run_dir)
        if records:
            runs[os.path.relpath(run_dir, root)] = records
    return runs


def collect_groups(root: str):
    """Group runs by experiment (the config dir above ``checkpoints/``),
    mapping group -> {trial: records}."""
    groups = {}
    for rel, records in collect_runs(root).items():
        parts = rel.split(os.sep)
        # <group...>/checkpoints/trial-{n}-{ts}
        try:
            ci = parts.index("checkpoints")
        except ValueError:
            continue
        group = "/".join(parts[:ci])
        m = re.match(r"trial-(\d+)-", parts[ci + 1])
        trial = int(m.group(1)) if m else 0
        groups.setdefault(group, {})[trial] = records
    return groups


def _final_scalars(records):
    out = {}
    for rec in records:
        for k, v in rec.items():
            if isinstance(v, (int, float)):
                out[k] = v
    return out


def _group_summary(trials):
    """Aggregate one experiment group over its trials the way the
    reference's get_summary does (plot.py:759-802): N-MSE x100
    mean/min/max, parameter count, mean train hours."""
    losses, params, hours = [], [], []
    extras = {}
    for records in trials.values():
        finals = _final_scalars(records)
        loss = finals.get("test_loss", finals.get("valid_loss"))
        if loss is not None:
            losses.append(loss * 100.0)
        if "n_params" in finals:
            params.append(int(finals["n_params"]))
        times = [r["time"] for r in records if "time" in r]
        if len(times) >= 2:
            hours.append((times[-1] - times[0]) / 3600.0)
        for k in ("test_time_until", "valid_time_until", "test_corr"):
            if k in finals:
                extras.setdefault(k, []).append(finals[k])
    if not losses:
        return None
    out = {
        "n_trials": len(losses),
        "nmse_mean": float(np.mean(losses)),
        "nmse_std": float(np.std(losses)),
        "nmse_min": float(np.min(losses)),
        "nmse_max": float(np.max(losses)),
        "n_params": params[0] if params else 0,
        "train_hours": float(np.mean(hours)) if hours else float("nan"),
    }
    for k, v in extras.items():
        out[k] = float(np.mean(v))
    return out


def reference_table(dataset: str, root: str = "configs",
                    out_path: Optional[str] = None, latex: bool = False) -> str:
    """One of the paper's Tables A.3-A.6 from local runs (reference
    plot.py:617-731). Rows with no local results render as em-dashes so
    the table shape always matches the reference's."""
    if dataset not in REFERENCE_TABLES:
        raise SystemExit(
            f"unknown table {dataset!r}; one of {sorted(REFERENCE_TABLES)}")
    groups = collect_groups(root)
    lines = []
    if not latex:
        lines += [
            f"### {dataset} (reference Table A.x layout)",
            "| model | layers | params | N-MSE mean±std (%) | min | max | train h |",
            "|---|---|---|---|---|---|---|",
        ]
    for display, family, depths in REFERENCE_TABLES[dataset]:
        if latex:
            lines.append(f"\\multirow{{{len(depths)}}}{{*}}{{{display}}}")
        for d in depths:
            group = f"{dataset}/{family}/{d}_layers"
            s = _group_summary(groups.get(group, {}))
            if latex:
                if s is None:
                    lines.append(f" & {d} & --- & --- & --- & --- & --- \\\\")
                else:
                    h = s["train_hours"]
                    ht = "---" if np.isnan(h) else (f"{h:.1f}" if h < 1 else f"{h:.0f}")
                    lines.append(
                        f" & {d} & {s['n_params']:,} & {s['nmse_mean']:.2f} & "
                        f"{s['nmse_min']:.2f} & {s['nmse_max']:.2f} &  {ht} \\\\")
            else:
                if s is None:
                    lines.append(f"| {display} | {d} | — | — | — | — | — |")
                else:
                    h = s["train_hours"]
                    ht = "—" if np.isnan(h) else f"{h:.2g}"
                    mean = (f"{s['nmse_mean']:.2f} ± {s['nmse_std']:.2f}"
                            if s["n_trials"] > 1 else f"{s['nmse_mean']:.2f}")
                    lines.append(
                        f"| {display} | {d} | {s['n_params']:,} | "
                        f"{mean} | {s['nmse_min']:.2f} | "
                        f"{s['nmse_max']:.2f} | {ht} |")
        if latex:
            lines.append("\\midrule")
    if latex and lines and lines[-1] == "\\midrule":
        lines.pop()
    text = "\n".join(lines)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
        logger.info("wrote %s", out_path)
    print(text)
    return text


def table(root: str = "configs", keys: Optional[List[str]] = None,
          out_path: Optional[str] = None, dataset: Optional[str] = None,
          latex: bool = False) -> str:
    """With ``dataset``: the corresponding reference table (A.3-A.6).
    Without: a generic markdown table of final metrics per run."""
    if dataset:
        return reference_table(dataset, root, out_path=out_path, latex=latex)
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


def _depth_series(root, value_fn):
    """{family: [(depth, value)]} over all `<family>/<d>_layers` groups."""
    series = {}
    for group, trials in collect_groups(root).items():
        m = re.match(r"(.+)/(\d+)_layers$", group)
        if not m:
            continue
        v = value_fn(trials)
        if v is None:
            continue
        series.setdefault(m.group(1), []).append((int(m.group(2)), v))
    return {k: sorted(v) for k, v in series.items()}


def _pyplot():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def layers(root: str = "configs", metric: str = "test_loss",
           out_path: str = "layers.png"):
    """N-MSE (%) vs depth per family, mean line + min/max band over trials
    (reference plot_performance_vs_layer / plot_ablation, plot.py:854-918)."""

    def stats(trials):
        s = _group_summary(trials)
        if s is None:
            return None
        return (s["nmse_mean"], s["nmse_min"], s["nmse_max"])

    series = _depth_series(root, stats)
    plt = _pyplot()
    if plt is None:
        print(json.dumps(series, indent=2, default=float))
        return series
    fig, ax = plt.subplots(figsize=(5, 4))
    for family, pts in sorted(series.items()):
        xs = [p[0] for p in pts]
        mean = [p[1][0] for p in pts]
        lo = [p[1][1] for p in pts]
        hi = [p[1][2] for p in pts]
        (line,) = ax.plot(xs, mean, marker="o", label=family[:50])
        ax.fill_between(xs, lo, hi, alpha=0.15, color=line.get_color())
    ax.set_xlabel("Number of layers")
    ax.set_ylabel("Normalized MSE (%)")
    ax.set_yscale("log")
    ax.set_xticks([0, 4, 8, 12, 16, 20, 24])
    ax.legend(fontsize=6)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def parameters(root: str = "configs", out_path: str = "parameters.png"):
    """Parameter count vs depth per family (reference plot_parameters,
    plot.py:969-995)."""

    def count(trials):
        s = _group_summary(trials)
        return s["n_params"] if s and s["n_params"] else None

    series = _depth_series(root, count)
    plt = _pyplot()
    if plt is None:
        print(json.dumps(series, indent=2, default=float))
        return series
    fig, ax = plt.subplots(figsize=(5, 4))
    for family, pts in sorted(series.items()):
        ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o",
                label=family[:50])
    ax.set_xlabel("Number of layers")
    ax.set_ylabel("Parameter count")
    ax.set_yscale("log")
    ax.set_xticks([0, 4, 8, 12, 16, 20, 24])
    ax.legend(fontsize=6)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def _correlation_curves(root):
    """rho(t) per run from trainer logs AND quality-campaign logs."""
    curves = {}
    for name, records in collect_runs(root).items():
        for rec in records:
            for key, tkey in (("test_correlations", "test_times"),
                              ("valid_correlations", "valid_times")):
                if isinstance(rec.get(key), list):
                    curves[name] = (rec.get(tkey), rec[key])
    # quality_campaign logs (scripts/quality_campaign.py)
    for path in sorted(glob.glob(os.path.join(root, "**/campaign_log.jsonl"),
                                 recursive=True)):
        with open(path) as f:
            last = None
            for line in f:
                rec = json.loads(line)
                if isinstance(rec.get("correlations"), list):
                    last = rec["correlations"]
        if last:
            curves[os.path.relpath(path, root)] = (None, last)
    return curves


def correlation(root: str = "configs", out_path: str = "correlation.png"):
    """rho(t) curves from logged per-time correlations (reference
    plot_correlation_over_time, plot.py:173-254)."""
    curves = _correlation_curves(root)
    plt = _pyplot()
    if plt is None:
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


def step_losses(root: str = "configs", out_path: str = "step_losses.png"):
    """Per-rollout-step N-MSE (%) curves (reference plot_step_loss_curves,
    plot.py:936-951)."""
    curves = {}
    for name, records in collect_runs(root).items():
        for rec in records:
            for key in ("test_step_losses", "valid_step_losses"):
                if isinstance(rec.get(key), list):
                    curves[name] = rec[key]
    plt = _pyplot()
    if plt is None:
        print(json.dumps(curves, indent=2, default=float))
        return curves
    fig, ax = plt.subplots(figsize=(5, 4))
    for name, ls in sorted(curves.items()):
        ax.plot(range(1, len(ls) + 1), np.asarray(ls) * 100.0, label=name[:50])
    ax.set_xlabel("Rollout step")
    ax.set_ylabel("Normalized MSE (%)")
    ax.legend(fontsize=6)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def _load_vorticity(path: str):
    """Vorticity [sample, x, y, time] from either HDF5 layout: rollout
    predictions (save_predictions: vorticity/vx/vy [sample,x,y,time],
    with ``x``/``y`` axis vectors) or generated Kolmogorov trajectories
    (generate.py: vorticity [traj,time,x,y] + ``elapsed``). Returns
    (vorticity, vx, vy) with vx/vy possibly None."""
    import h5py

    with h5py.File(path, "r") as f:
        w = np.asarray(f["vorticity"])
        vx = np.asarray(f["vx"]) if "vx" in f else None
        vy = np.asarray(f["vy"]) if "vy" in f else None
        t_len = f["time"].shape[0] if "time" in f else None
        # Writer fingerprints beat shape heuristics (time == grid size is
        # ambiguous): generate.py always writes `elapsed`, the predictions
        # writer always writes `x`/`y` axes.
        if "elapsed" in f:
            time_first = True
        elif "x" in f:
            time_first = False
        else:
            time_first = (w.ndim == 4 and t_len is not None
                          and w.shape[1] == t_len != w.shape[-1])
    if time_first:
        w = np.moveaxis(w, 1, -1)
        vx = np.moveaxis(vx, 1, -1) if vx is not None else None
        vy = np.moveaxis(vy, 1, -1) if vy is not None else None
    return w, vx, vy


def _energy_spectrum(w, vx=None, vy=None):
    """Shell-averaged kinetic energy spectrum E(k), mean over samples and
    times. Velocities recovered spectrally from vorticity when absent
    (periodic torus: u_hat = i k_perp w_hat / k^2). Host-side analysis —
    np.fft, never on the TPU path."""
    n = w.shape[1]
    kx = np.fft.fftfreq(n, 1.0 / n)[:, None]
    ky = np.fft.fftfreq(n, 1.0 / n)[None, :]
    if vx is None or vy is None:
        k2 = kx**2 + ky**2
        k2[0, 0] = 1.0
        w_hat = np.fft.fftn(w, axes=(1, 2))
        psi_hat = w_hat / k2[None, :, :, None]
        u_hat = 1j * ky[None, :, :, None] * psi_hat
        v_hat = -1j * kx[None, :, :, None] * psi_hat
    else:
        u_hat = np.fft.fftn(vx, axes=(1, 2))
        v_hat = np.fft.fftn(vy, axes=(1, 2))
    # E(kx,ky) per sample/time, normalized so E is grid-size independent
    e2d = 0.5 * (np.abs(u_hat) ** 2 + np.abs(v_hat) ** 2) / n**4
    shell = np.round(np.sqrt(kx**2 + ky**2)).astype(int)
    n_shells = n // 2
    e_mean = e2d.mean(axis=(0, 3))  # over samples and times
    spectrum = np.bincount(shell.ravel(), weights=e_mean.ravel(),
                           minlength=n_shells)[:n_shells]
    return np.arange(n_shells), spectrum


def energy(inputs: List[str], out_path: str = "energy.png", tail: int = 80,
           scale_power: int = 5):
    """Scaled energy spectra k^scale_power * E(k) for a set of
    ``name=path.h5`` trajectory/prediction files (reference
    plot_energy_spectrum, plot.py:256-307: F-FNO at several resolutions
    vs DNS baselines, log-log, k^5 scaling, trailing-time mean)."""
    if not inputs:
        raise ValueError("plot energy requires --inputs name=path.h5 ...")
    curves = {}
    for spec in inputs:
        name, _, path = spec.partition("=")
        if not path:
            name, path = os.path.basename(spec), spec
        while name in curves:  # duplicate display names must not drop curves
            name += "'"
        w, vx, vy = _load_vorticity(path)
        sl = slice(-tail, None) if tail else slice(None)
        w = w[..., sl]
        vx = vx[..., sl] if vx is not None else None
        vy = vy[..., sl] if vy is not None else None
        k, e = _energy_spectrum(w, vx, vy)
        curves[name] = (k[1:], (k[1:] ** float(scale_power)) * e[1:])
    plt = _pyplot()
    if plt is None:
        print(json.dumps({n: c[1].tolist() for n, c in curves.items()}))
        return curves
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, (k, e) in curves.items():
        style = "-" if "dns" in name.lower() else "--"
        ax.plot(k, e, style, label=name, linewidth=2)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("Wavenumber")
    ax.set_ylabel(f"Scaled energy spectrum $k^{scale_power} E(k)$")
    ax.legend(fontsize=7)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def flows(inputs: List[str], out_path: str = "samples.png", sample: int = 0,
          times: Optional[List[int]] = None):
    """Vorticity snapshot grid — rows are trajectories/models, columns are
    times (reference flows, plot.py:139-170: DNS 2048^2 vs F-FNO vs DNS
    at the model grid, times [0, 10, 21])."""
    if not inputs:
        raise ValueError("plot flows requires --inputs name=path.h5 ...")
    rows = []
    for spec in inputs:
        name, _, path = spec.partition("=")
        if not path:
            name, path = os.path.basename(spec), spec
        w, _, _ = _load_vorticity(path)
        rows.append((name, w[sample]))
    times = times or [0, 10, 21]
    plt = _pyplot()
    if plt is None:
        return rows
    fig, axes = plt.subplots(len(rows), len(times),
                             figsize=(2.3 * len(times), 2.3 * len(rows)),
                             squeeze=False)
    for i, (name, w) in enumerate(rows):
        vmax = np.percentile(np.abs(w), 98)
        for j, t in enumerate(times):
            t_idx = min(t, w.shape[-1] - 1)
            ax = axes[i][j]
            ax.imshow(w[..., t_idx].T, cmap="RdBu_r", vmin=-vmax, vmax=vmax,
                      origin="lower")
            ax.set_xticks([])
            ax.set_yticks([])
            if i == 0:
                ax.set_title(f"t = {t_idx}", fontsize=8)
        axes[i][0].set_ylabel(name, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    logger.info("wrote %s", out_path)
    return out_path


def _final_campaign_metrics(path: str, metrics: List[str]) -> dict:
    """Last recorded value of each metric in a campaign_log.jsonl."""
    final = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            for m in metrics:
                if m in r:
                    final[m] = r[m]
    return final


def ablation(inputs: List[str], out_path: str = "ablation.png",
             xlabel: str = "parameter",
             metrics: Optional[List[str]] = None):
    """Sweep figure: final campaign metrics vs a swept scalar (reference
    plot_varying_step_size, plot.py:458-525 — there pulling
    `valid_time_until` per step-size group from wandb; here from local
    ``campaign_log.jsonl`` files).

    ``inputs`` are ``value=path`` pairs, e.g.
    ``0.28=/root/data/kochkov512/runs/ffno_ref/campaign_log.jsonl``.
    Plots each requested metric's final value against the swept value
    (default: valid_time_until and train_loss) and prints the table.
    """
    metrics = metrics or ["valid_time_until", "train_loss"]
    rows = []
    for item in inputs:
        val, path = item.split("=", 1)
        rows.append((float(val), _final_campaign_metrics(path, metrics)))
    rows.sort(key=lambda r: r[0])

    print("| " + xlabel + " | " + " | ".join(metrics) + " |")
    print("|" + "---|" * (len(metrics) + 1))
    for val, final in rows:
        cells = [f"{final.get(m, float('nan')):.4g}" for m in metrics]
        print(f"| {val:g} | " + " | ".join(cells) + " |")

    plt = _pyplot()
    if plt is None:
        logger.warning("matplotlib unavailable; table printed only")
        return None
    fig, axes = plt.subplots(
        1, len(metrics), figsize=(4 * len(metrics), 3.2), squeeze=False
    )
    xs = [r[0] for r in rows]
    for ax, m in zip(axes[0], metrics):
        ys = [r[1].get(m, float("nan")) for r in rows]
        ax.plot(xs, ys, "o-", color="#335C81")
        ax.set_xlabel(xlabel)
        ax.set_ylabel(m)
        if len(xs) > 2 and xs[0] > 0 and xs[-1] / xs[0] >= 8:
            ax.set_xscale("log")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    logger.info("wrote %s", out_path)
    return out_path


def stepsize(inputs: List[str], dns_path: Optional[str] = None,
             out_path: str = "stepsize.png", threshold: float = 0.95):
    """The varying-step-size figure (reference plot_varying_step_size,
    plot.py:458-525): stable-rollout horizon (time until correlation <
    threshold) against the step size, one line for the F-FNO surrogate
    (``inputs`` are ``step_size=campaign_log.jsonl`` pairs from the k
    sweep), one for the pseudo-spectral DNS at growing dt multiples
    (``dns_path`` is the ``stepsize_dns.json`` that
    ``scripts/stepsize_dns.py`` writes).
    """
    model_rows = []
    for item in inputs:
        val, path = item.split("=", 1)
        final = _final_campaign_metrics(path, ["valid_time_until"])
        if "valid_time_until" in final:
            model_rows.append((float(val), final["valid_time_until"]))
    model_rows.sort()

    dns_rows = []
    if dns_path:
        with open(dns_path) as f:
            for r in json.load(f):
                dns_rows.append((r["step_size"], r["time_until"]))
        dns_rows.sort()

    print("| source | step size (sim-s) | time_until (sim-s) |")
    print("|---|---|---|")
    for s, t in model_rows:
        print(f"| F-FNO | {s:g} | {t:g} |")
    for s, t in dns_rows:
        print(f"| DNS | {s:g} | {t:g} |")

    plt = _pyplot()
    if plt is None:
        logger.warning("matplotlib unavailable; table printed only")
        return None
    fig, ax = plt.subplots(figsize=(4.2, 3.4))
    if model_rows:
        ax.plot([r[0] for r in model_rows], [r[1] for r in model_rows],
                "o-", color="#335C81", label="F-FNO")
    if dns_rows:
        ax.plot([r[0] for r in dns_rows], [r[1] for r in dns_rows],
                "x-", color="#2E933C", label="DNS (pseudo-spectral)")
    ax.set_xscale("log")
    ax.set_xlabel("Step size (sim-s)")
    ax.set_ylabel(f"Time until correlation < {threshold:g}")
    ax.grid(alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    logger.info("wrote %s", out_path)
    return out_path


def tradeoff(data_dir: str, out_path: str = "tradeoff.png",
             dns: Optional[List[str]] = None, metric: str = "valid_loss"):
    """Inference performance-tradeoff figure: final rollout N-MSE (%)
    vs inference runtime per sample per simulation-second, one line per
    model family across depths (reference
    plot_pde_inference_performance_tradeoff, plot.py:1026-1054 — there
    pulling both axes from wandb; here joining each campaign run's
    ``campaign_log.jsonl`` with the on-chip timings that
    ``scripts/inference_timing.py`` appends to
    ``<data_dir>/runs/inference_times.jsonl``).

    ``dns`` entries are ``label=runtime`` pairs (s/sample/sim-second) for
    numerical-solver baselines, drawn at N-MSE 0 like the reference's
    scatter point (plot.py:1048).
    """
    times_path = os.path.join(data_dir, "runs", "inference_times.jsonl")
    runs = []
    with open(times_path) as f:
        for line in f:
            line = line.strip()
            if line:
                runs.append(json.loads(line))
    # last timing per tag wins (the file is append-only)
    by_tag = {r["tag"]: r for r in runs}

    rows = []
    for tag, rec in sorted(by_tag.items()):
        log_path = os.path.join(data_dir, "runs", tag, "campaign_log.jsonl")
        if not os.path.exists(log_path) and tag == "ffno":
            # legacy campaign layout: the default run's artifacts live at
            # the data-dir root (quality_campaign.py keeps resuming it)
            log_path = os.path.join(data_dir, "campaign_log.jsonl")
        if not os.path.exists(log_path):
            logger.warning("no campaign log for %s; skipped", tag)
            continue
        final = _final_campaign_metrics(log_path, [metric])
        if metric not in final:
            continue
        rows.append({
            "tag": tag,
            "arch": rec["arch"],
            "n_layers": rec["n_layers"],
            "nmse_pct": 100.0 * final[metric],
            "inference_time": rec["inference_time"],
        })

    print("| run | arch | layers | N-MSE (%) | s / sample / sim-s |")
    print("|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r["arch"], r["n_layers"])):
        print(f"| {r['tag']} | {r['arch']} | {r['n_layers']} | "
              f"{r['nmse_pct']:.2f} | {r['inference_time']:.4g} |")
    for item in dns or []:
        label, val = item.split("=", 1)
        print(f"| {label} (DNS) | — | — | 0 | {float(val):.4g} |")

    plt = _pyplot()
    if plt is None:
        logger.warning("matplotlib unavailable; table printed only")
        return None
    fig, ax = plt.subplots(figsize=(4.2, 3.4))
    palette = {"ffno": "#335C81", "zongyi": "#A23B72", "ffno_plus": "#E08E45"}
    for arch in sorted({r["arch"] for r in rows}):
        pts = sorted((r for r in rows if r["arch"] == arch),
                     key=lambda r: r["n_layers"])
        ax.plot([p["nmse_pct"] for p in pts],
                [p["inference_time"] for p in pts],
                "o-", color=palette.get(arch, "#444444"), label=arch)
        for p in pts:
            ax.annotate(str(p["n_layers"]),
                        (p["nmse_pct"], p["inference_time"]),
                        textcoords="offset points", xytext=(4, 4), fontsize=7)
    for item in dns or []:
        label, val = item.split("=", 1)
        ax.scatter([0], [float(val)], marker="x", color="#2E933C")
        ax.annotate(label, (0, float(val)),
                    textcoords="offset points", xytext=(4, 4), fontsize=7)
    ax.set_xlabel("Normalized MSE (%)")
    ax.set_ylabel("Runtime per sim-second (s)")
    ax.set_yscale("log")
    ax.grid(alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    logger.info("wrote %s", out_path)
    return out_path


def superresolution(results_path: str,
                    out_path: str = "superresolution.png",
                    train_size: int = 64):
    """Super-resolution transfer figure: rollout correlation and
    stable-horizon (time_until rho>=0.95) vs evaluation grid size for a
    checkpoint trained at one resolution (reference superresolution /
    plot_correlation_vs_time_of_different_grid_sizes, plot.py:66-75,
    341-456 — there driven from wandb; here from the
    ``superres_results.json`` that ``scripts/superres_eval.py`` writes).
    """
    with open(results_path) as f:
        results = json.load(f)
    sizes = sorted(int(s) for s in results)
    corr = [results[str(s)]["corr"] for s in sizes]
    tu = [results[str(s)]["time_until"] for s in sizes]

    print("| eval grid | rollout corr | time_until (rho>=0.95) |")
    print("|---|---|---|")
    for s, c, t in zip(sizes, corr, tu):
        mark = " (train)" if s == train_size else ""
        print(f"| {s}²{mark} | {c:.3f} | {t:.2f} sim-s |")

    plt = _pyplot()
    if plt is None:
        logger.warning("matplotlib unavailable; table printed only")
        return None
    has_curves = all("correlations" in results[str(s)] for s in sizes)
    n_panels = 3 if has_curves else 2
    fig, axes = plt.subplots(1, n_panels, figsize=(4 * n_panels, 3.2))
    ax1, ax2 = axes[0], axes[1]
    for ax, ys, label in ((ax1, corr, "mean rollout correlation"),
                          (ax2, tu, "time until rho<0.95 (sim-s)")):
        ax.plot(sizes, ys, "o-", color="#335C81")
        ax.axvline(train_size, color="#888", ls="--", lw=1,
                   label=f"training res {train_size}²")
        ax.set_xscale("log", base=2)
        ax.set_xticks(sizes)
        ax.set_xticklabels([f"{s}²" for s in sizes])
        ax.set_xlabel("evaluation grid")
        ax.set_ylabel(label)
        ax.grid(alpha=0.3)
    if has_curves:
        # The reference's per-grid rho(t) panel
        # (plot_correlation_vs_time_of_different_grid_sizes).
        ax3 = axes[2]
        palette = ["#2E933C", "#335C81", "#B4656F", "#E0A458", "#6B4E9B"]
        for i, s in enumerate(sizes):
            r = results[str(s)]
            ts = r.get("times") or list(range(1, len(r["correlations"]) + 1))
            ax3.plot(ts, r["correlations"], color=palette[i % len(palette)],
                     label=f"{s}²" + (" (train)" if s == train_size else ""))
        ax3.axhline(0.95, color="#888", ls=":", lw=1)
        ax3.set_xlabel("rollout time (sim-s)")
        ax3.set_ylabel("vorticity correlation rho(t)")
        ax3.grid(alpha=0.3)
        ax3.legend(frameon=False, fontsize=8)
    ax1.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    logger.info("wrote %s", out_path)
    return out_path


def heatmap(sample_path: str, step: int = -1, out_prefix: str = "field"):
    """Prediction vs target heatmaps from a ``sample`` command pickle
    (reference heatmaps, plot.py:596-614)."""
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
