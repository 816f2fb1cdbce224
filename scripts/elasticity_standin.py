"""Elasticity (Geo-FNO) trained to the full budget on a SYNTHETIC
stand-in dataset (VERDICT r3 #7).

The real Geo-FNO `Random_UnitCell_*_10.npy` files (2000 unit cells with a
random star-shaped void, 972 mesh points, plane-stress sigma targets from
a FEM solve; reference:fourierflow/builders/elasticity.py:8-90) are not
obtainable in this environment (no egress). This generates a documented
stand-in with the exact array layout and a physically-motivated target,
trains the registry config `elasticity/ffno/4_layers` to its full budget,
and records the test N-MSE. **Absolute N-MSE is NOT comparable to the
paper's** (different target field); what it demonstrates is the full
pipeline — geometry params -> point cloud -> IPhi-deformed spectral
operator -> stress field — learning a geometry-conditioned PDE-like
operator at the reference's scale and budget.

Stand-in construction (per sample, seeded):
- rr [42]: smooth random radial control points of the void boundary
  (circularly Gaussian-smoothed N(0,1), scaled to 0.2 +- ~0.06, clipped
  to [0.08, 0.35]) — same role/shape as the reference's geometry params.
- xy [972, 2]: a structured 27-ring x 36-angle mesh between the void
  boundary r(theta) and the unit-square edge, graded toward the void
  (where the reference's FEM mesh concentrates).
- sigma [972, 1]: Kirsch-type hoop-stress magnitude for a hole under
  uniaxial tension (sigma_inf = 100, tension along y), evaluated with the
  LOCAL void radius a = r(theta):
      sigma(rho, theta) = sigma_inf/2 * [(1 + a^2/rho^2)
                          + (1 + 3 a^4/rho^4) * cos(2 theta)]
  — the classical stress-concentration solution (factor 3 at the hole
  equator), so the target is a nontrivial smooth functional of BOTH the
  geometry params and the query point, like the real dataset.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/elasticity_standin.py --data-dir /root/data/elasticity
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

N_CTRL = 42
N_RING, N_ANG = 27, 36  # 27 * 36 = 972 points, the reference's cloud size
SIGMA_INF = 100.0


def generate(n_samples, seed):
    rng = np.random.default_rng(seed)
    # Smooth periodic radii: circular Gaussian smoothing of white noise.
    noise = rng.standard_normal((n_samples, N_CTRL))
    k = np.arange(N_CTRL)
    kern = np.exp(-0.5 * (np.minimum(k, N_CTRL - k) / 3.0) ** 2)
    kern /= kern.sum()
    sm = np.real(np.fft.ifft(np.fft.fft(noise, axis=1)
                             * np.fft.fft(kern)[None], axis=1))
    rr = np.clip(0.2 + 0.06 * sm / sm.std(), 0.08, 0.35)  # [n, 42]

    theta_c = 2 * np.pi * np.arange(N_CTRL) / N_CTRL
    theta = 2 * np.pi * np.arange(N_ANG) / N_ANG  # mesh angles
    # Periodic linear interpolation of r(theta) at the mesh angles.
    r_b = np.stack([np.interp(theta, theta_c, rr[i], period=2 * np.pi)
                    for i in range(n_samples)])  # [n, 36]

    # Distance from the center (0.5, 0.5) to the unit-square edge along
    # each angle.
    r_max = 0.5 / np.maximum(np.abs(np.cos(theta)), np.abs(np.sin(theta)))
    # Radial grading: s^1.5 concentrates rings toward the void boundary.
    s = ((np.arange(N_RING) + 0.5) / N_RING) ** 1.5  # [27]
    rho = r_b[:, None, :] + s[None, :, None] * (
        r_max[None, None, :] - r_b[:, None, :])  # [n, 27, 36]
    x = 0.5 + rho * np.cos(theta)[None, None, :]
    y = 0.5 + rho * np.sin(theta)[None, None, :]
    xy = np.stack([x, y], axis=-1).reshape(n_samples, -1, 2)  # [n, 972, 2]

    # Kirsch hoop stress with the local void radius as the hole radius.
    a = r_b[:, None, :]
    ar2 = (a / rho) ** 2
    sigma = 0.5 * SIGMA_INF * ((1 + ar2)
                               + (1 + 3 * ar2**2) * np.cos(2 * theta)[None, None, :])
    sigma = sigma.reshape(n_samples, -1, 1)  # [n, 972, 1]
    return rr, xy, sigma


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/elasticity")
    p.add_argument("--n-samples", type=int, default=2000)
    p.add_argument("--config", default="elasticity/ffno/4_layers")
    p.add_argument("--val-every", type=int, default=25)
    p.add_argument("--seed", type=int, default=90210)
    p.add_argument("--override", action="append", default=[],
                   help="extra dotted config overrides (smoke runs: "
                   "builder.train_size=40 trainer.max_epochs=2 ...)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest last.ckpt instead of "
                   "restarting (epoch granularity; lets a killed stage "
                   "pick up where it stopped)")
    args = p.parse_args()

    d = args.data_dir
    os.makedirs(d, exist_ok=True)
    paths = {k: os.path.join(d, f"standin_{k}.npy") for k in ("rr", "xy", "sigma")}
    if not all(os.path.exists(v) for v in paths.values()):
        rr, xy, sigma = generate(args.n_samples, args.seed)
        # Reference file orientation (builders/elasticity.py transposes):
        # rr [42, n], sigma [972, n], xy [972, 2, n].
        np.save(paths["rr"], rr.T.astype(np.float32))
        np.save(paths["sigma"], sigma[..., 0].T.astype(np.float32))
        np.save(paths["xy"], xy.transpose(1, 2, 0).astype(np.float32))
        print(f"[data] stand-in written: rr {rr.T.shape} sigma "
              f"{sigma[..., 0].T.shape} xy {xy.transpose(1, 2, 0).shape}",
              flush=True)

    from fourierflow_tpu.commands import train as train_cmd

    t0 = time.time()
    trainer, _ = train_cmd.main(
        args.config,
        overrides=[
            f"builder.sigma_path={paths['sigma']}",
            f"builder.xy_path={paths['xy']}",
            f"builder.rr_path={paths['rr']}",
            f"trainer.check_val_every_n_epoch={args.val_every}",
            *args.override,
        ],
        trial=0, force=not args.resume, resume=args.resume,
        config_dir=os.path.join(d, "runs", args.config.replace("/", "_")))
    out = {k: float(v) for k, v in trainer.logs.items() if np.ndim(v) == 0}
    out["wall_s"] = round(time.time() - t0, 1)
    out["config"] = args.config
    out["standin"] = True
    with open(os.path.join(d, "elasticity_standin.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"[job] {args.config} on stand-in data: "
          f"test_loss {out.get('test_loss', float('nan')):.4f} ({out['wall_s']:.0f}s)",
          flush=True)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
