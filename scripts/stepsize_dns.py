"""DNS side of the varying-step-size figure.

The reference's plot_varying_step_size (plot.py:458-525) charts
"time until correlation < 95%" against the solver/model step size: the
F-FNO points come from the ``ffno/step_sizes`` runs, the DNS line from the
``data/kolmogorov/re_1000/time_steps/x{mult}`` sweep — pseudo-spectral
runs at dt = mult x the stable step, correlated against the finest run.

This script produces that DNS line on one chip: shared warmed-up 64²
initial conditions, one simulation per dt multiple (same recording
cadence where possible; coarser-than-cadence multiples compare on strided
frames, like the reference's ``isel(time=slice(1, None, 2))``), vorticity
correlation on the 32² outputs, and a ``stepsize_dns.json`` consumed by
``plot stepsize``.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/stepsize_dns.py \
      --data-dir /root/data/stepsize_dns
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

TWO_PI = 2 * np.pi
# stable_time_step for the re_1000 2048² simulation — the reference's
# sweep unit (experiments.py KOCH_STEP; reference time_steps/*.yaml).
BASE_DT = 0.0002191401125550916


def _config(args, mult=None, warmup_only=False):
    if warmup_only:
        dt, inner = BASE_DT, 32
        outer, warmup = 0, int(round(args.warmup_sim_s / (BASE_DT * 32)))
        out_sizes = [{"size": args.sim_size, "k": 1}]
        init_path = None
    else:
        dt = BASE_DT * mult
        inner = max(1, args.cadence_mult // mult)
        cadence = dt * inner
        outer = int(round(args.horizon / cadence))
        warmup = 0
        out_sizes = [{"size": args.corr_size, "k": 1}]
        init_path = os.path.join(args.data_dir, f"init_{args.sim_size}.h5")
    cfg = {
        "domain": [[0, TWO_PI], [0, TWO_PI]],
        "sim_grid": {
            "_target_": "fourierflow_tpu.utils.Grid",
            "shape": [args.sim_size, args.sim_size],
            "domain": "${domain}",
        },
        "time_step": dt,
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
        "downsample_fn":
            "${get_method:fourierflow.builders.kolmogorov.downsample_vorticity}",
        "n_trajectories": args.n_traj,
        "max_velocity": 7.0,
        "peak_wavenumber": 4.0,
        "seed": 83816,
        "inner_steps": inner,
        "outer_steps": outer,
        "warmup_steps": warmup,
        "out_sizes": out_sizes,
        "generation_batch": args.n_traj,
    }
    if init_path:
        cfg["init_path"] = init_path
    return cfg


def _run(args, stem, cfg):
    from fourierflow_tpu.commands.generate import kolmogorov as gen

    size_k = (f"{cfg['out_sizes'][0]['size']}_1" if cfg["outer_steps"]
              else str(cfg["out_sizes"][0]["size"]))
    done = os.path.join(args.data_dir, f"{stem}_{size_k}.h5")
    if os.path.exists(done):
        print(f"[data] {done} exists, skipping", flush=True)
        return done
    path = os.path.join(args.data_dir, f"{stem}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    t0 = time.time()
    gen(path)
    print(f"[data] {stem} in {time.time() - t0:.0f}s", flush=True)
    return done


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/stepsize_dns")
    p.add_argument("--sim-size", type=int, default=64)
    p.add_argument("--corr-size", type=int, default=32)
    p.add_argument("--n-traj", type=int, default=4)
    p.add_argument("--mults", type=int, nargs="+",
                   default=[1, 2, 4, 8, 16, 32, 64, 128])
    p.add_argument("--horizon", type=float, default=12.0,
                   help="sim-seconds simulated/compared")
    p.add_argument("--warmup-sim-s", type=float, default=10.0)
    p.add_argument("--cadence-mult", type=int, default=32,
                   help="recording cadence = BASE_DT * this (multiples "
                        "above it compare on strided frames)")
    p.add_argument("--threshold", type=float, default=0.95)
    args = p.parse_args()
    os.makedirs(args.data_dir, exist_ok=True)

    # Every run must land its frames exactly on ground-truth frames: a
    # multiple either divides the recording cadence (same cadence, stride
    # 1) or is a whole number of cadences (strided comparison). Anything
    # else silently misaligns frames, so reject it up front.
    gt_mult = min(args.mults)
    gt_cadence_steps = gt_mult * max(1, args.cadence_mult // gt_mult)
    for m in args.mults:
        cadence_steps = m * max(1, args.cadence_mult // m)
        if (args.cadence_mult % m and m % args.cadence_mult) or \
                cadence_steps % gt_cadence_steps:
            raise SystemExit(
                f"--mults {m}: cadence ({cadence_steps} base steps) does "
                f"not align with the ground-truth cadence "
                f"({gt_cadence_steps}); use divisors or whole multiples "
                f"of --cadence-mult {args.cadence_mult}")

    import h5py

    from fourierflow_tpu.utils.spectral import grid_correlation

    # shared initial conditions (warmed-up turbulence at the sim grid)
    _run(args, "init", _config(args, warmup_only=True))

    files = {}
    for m in sorted(args.mults):
        files[m] = _run(args, f"x{m}", _config(args, mult=m))

    with h5py.File(files[gt_mult], "r") as f:
        gt = f["vorticity"][...]  # [S, T, 32, 32]

    rows = []
    for m in sorted(args.mults):
        with h5py.File(files[m], "r") as f:
            w = f["vorticity"][...]
        # coarser-than-cadence multiples land on every gt_stride-th frame
        gt_stride = (m * max(1, args.cadence_mult // m)) // gt_cadence_steps
        g = gt[:, gt_stride - 1::gt_stride]
        n = min(len(w[0]), len(g[0]))
        w, g = w[:, :n], g[:, :n]
        cadence = BASE_DT * m * max(1, args.cadence_mult // m)
        rho = np.asarray(grid_correlation(w, g))  # [S, T]
        rho = np.nan_to_num(rho, nan=-1.0).mean(axis=0)  # diverged -> -1
        below = rho < args.threshold
        # frame i sits at time (i+1)*cadence; surviving up to (not incl.)
        # the first below-threshold frame k means k*cadence sim-seconds
        t_idx = int(np.argmax(below)) if below.any() else len(rho)
        rec = {
            "mult": m,
            "step_size": BASE_DT * m,
            "cadence": cadence,
            "time_until": t_idx * cadence,
            "frames": int(n),
            "final_rho": float(rho[-1]),
        }
        rows.append(rec)
        print(f"[x{m}] {rec}", flush=True)

    out = os.path.join(args.data_dir, "stepsize_dns.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[done] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
