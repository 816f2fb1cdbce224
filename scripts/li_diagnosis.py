"""Diagnose the learned-interpolation horizon cap (VERDICT r3 #1).

The LI reference run converged to a ~0.39 sim-s stable horizon (3.5x its
unlearned FV control, but an order below Kochkov-class multi-sim-second
horizons). This measures where the ceiling comes from by running the
NATIVE PSEUDO-SPECTRAL solver at 64^2 — same equation, same initial
conditions, same 11.2 sim-s protocol — against the same 32^2-downsampled
512^2 reference the LI validation uses:

- dt = DT_MODEL (0.007012, the exact step the LI base solver takes):
  "how well can ANY well-implemented 64^2 solver at this step track the
  512^2 reference?" If this also dies at ~0.4 sim-s, the cap is the 64^2
  information/chaos limit of the protocol; if it tracks for seconds, the
  FV base solver (Van Leer upwind advection, forward-Euler projection —
  chosen for unconditional robustness, PARITY deviation) is the
  bottleneck and the learned correction is fighting its dissipation.
- dt = DT_MODEL/8 (time-converged): isolates time discretization.

Runs on CPU (the 64^2 spectral step is cheap) or chip.

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/li_diagnosis.py --data-dir /root/data/li_ref
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

DT_MODEL = 0.007012483601762931
SNAPSHOT_MODEL_STEPS = 16  # validation cadence: 16 model steps/snapshot
N_SNAPSHOTS = 100


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/li_ref")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp
    from functools import partial

    from fourierflow_tpu.utils import Grid
    from fourierflow_tpu.utils.equations import NavierStokes2D, crank_nicolson_rk4
    from fourierflow_tpu.utils.forcings import simple_turbulence_forcing
    from fourierflow_tpu.utils.spectral import downsample_vorticity, grid_correlation
    from fourierflow_tpu.ops.fourier import irfft2, rfft2

    d = args.data_dir
    with h5py.File(os.path.join(d, "test_init_64.h5"), "r") as f:
        w0 = f["vorticity"][...].astype(np.float32)  # [8, 64, 64]
    with h5py.File(os.path.join(d, "test_32_1.h5"), "r") as f:
        ref = f["vorticity"][...].astype(np.float32)  # [8, 1600, 32, 32]
    # Reference frames at the validation cadence (every 16th model frame).
    ref_snap = ref[:, SNAPSHOT_MODEL_STEPS - 1::SNAPSHOT_MODEL_STEPS][:, :N_SNAPSHOTS]

    grid = Grid((64, 64), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    eq = NavierStokes2D(
        viscosity=1e-3, grid=grid, drag=0.1, smooth=True,
        forcing_fn=partial(simple_turbulence_forcing,
                           constant_magnitude=1.0, constant_wavenumber=4,
                           linear_coefficient=0.0),
    )

    results = {}
    for label, substeps in (("spectral64_dt_model", 1),
                            ("spectral64_dt_model_over_8", 8)):
        step = crank_nicolson_rk4(eq, DT_MODEL / substeps)

        # Complex arrays only ever live under jit here (eager complex is
        # UNIMPLEMENTED on the axon backend; under jit it is fine).
        @jax.jit
        def run(w):
            what = rfft2(w, axes=(-2, -1))

            def snapshot(carry, _):
                def inner(c, _):
                    return step(c), None

                c, _ = jax.lax.scan(
                    inner, carry, None,
                    length=SNAPSHOT_MODEL_STEPS * substeps)
                w32 = downsample_vorticity(
                    irfft2(c, s=(64, 64), axes=(-2, -1))[..., None],
                    32)[..., 0]
                return c, w32

            _, snaps = jax.lax.scan(snapshot, what, None, length=N_SNAPSHOTS)
            return snaps  # [100, 8, 32, 32]

        t0 = time.time()
        snaps = np.asarray(run(jnp.asarray(w0)))
        wall = time.time() - t0
        preds = np.moveaxis(snaps, 0, 1)  # [8, 100, 32, 32]
        rho = np.asarray(grid_correlation(
            jnp.asarray(preds), jnp.asarray(ref_snap), axes=(-2, -1)))
        rho = np.nan_to_num(rho).mean(axis=0)  # [100]
        diverged = np.concatenate([rho < 0.95, [True]])
        horizon = float(np.argmax(diverged) * DT_MODEL * SNAPSHOT_MODEL_STEPS)
        results[label] = {
            "mean_rho": round(float(rho.mean()), 4),
            "time_until": round(horizon, 4),
            "rho_t": [round(float(r), 4) for r in rho],
            "wall_s": round(wall, 1),
        }
        print(f"[diag] {label}: mean rho {rho.mean():.4f} "
              f"horizon {horizon:.3f} sim-s ({wall:.0f}s)", flush=True)

    out = args.out or os.path.join(d, "li_diagnosis.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "rho_t"}
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
