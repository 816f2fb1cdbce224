"""Measured 256^3 / 512^3 3D projection steps (VERDICT r3 #4).

Round 3 extrapolated the 512^3 production step cost (x64 the cells of a
measured 128^3 step); this measures it. The reference's 3D production
config is 512^3 (reference:data/kolmogorov/three_dimensions/trajectories/
train.yaml). Results merge into kol3d_results.json incrementally (the
512^3 probe runs LAST: a compile-time OOM on the relay wedges the TPU
worker for ~30 min, so the 256^3 row must already be on disk).

HBM accounting at 512^3 f32: the velocity state is 3 x 512^3 x 4 B =
1.61 GB; the projection step's transient peak (advection fluxes + the
DFT-matmul Poisson solve's per-axis intermediates) is a small multiple of
one 537 MB component field — comfortably inside the 16 GB v5e, but the
COMPILE may still over-allocate; hence the ordering above.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/kol3d_highres.py --results /root/data/kol3d/kol3d_results.json
"""

import argparse
import json
import logging
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

TWO_PI = 2 * np.pi


def merge(path, results):
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.update(results)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, path)


def probe(size, n_steps, path, dtype_name="f32"):
    import jax
    import jax.numpy as jnp

    from fourierflow_tpu.utils import Grid
    from fourierflow_tpu.utils.finite_volume import (
        filtered_velocity_field_3d,
        potential_noise_3d,
        velocity_from_potential_3d,
        kolmogorov_forcing_fv,
        semi_implicit_navier_stokes,
    )

    grid = Grid((size,) * 3, domain=((0, TWO_PI),) * 3)
    dt = 0.5 * grid.step[0] / 7.0
    step = semi_implicit_navier_stokes(
        density=1.0, viscosity=1e-3, dt=dt, grid=grid,
        forcing=kolmogorov_forcing_fv(
            grid, constant_magnitude=1.0, constant_wavenumber=4,
            linear_coefficient=-0.1,
        ),
    )

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    # Donate the carry: at 512^3 the state tuple alone is 1.61 GB and the
    # step's transients (per-axis advection fluxes + the spectral Poisson
    # solve's half-spectrum pairs) already press the 16 GB HBM — aliasing
    # input and output buffers is the cheapest 1.6 GB back.
    @partial(jax.jit, donate_argnums=0)
    def run(vel):
        def body(v, _):
            return step(v), None

        out, _ = jax.lax.scan(body, vel, None, length=n_steps)
        return out

    t_ic = time.perf_counter()
    if size >= 512:
        # Bounded per-component dispatches: the fused IC graph at 256^3
        # already costs ~44 s compile+execute, and a single >~1 min
        # dispatch kills the TPU worker. Same keys, same result as the
        # fused filtered_velocity_field_3d.
        pn = jax.jit(lambda k: potential_noise_3d(k, grid))
        a = []
        for k in jax.random.split(jax.random.PRNGKey(0), 3):
            f = pn(k)
            _ = float(f[0, 0, 0])
            a.append(f)
        vel = jax.jit(lambda aa: velocity_from_potential_3d(aa, grid))(a)
        del a, f  # 3 x 537 MB of potential components must not stay live
    else:
        vel = jax.jit(lambda k: filtered_velocity_field_3d(k, grid))(
            jax.random.PRNGKey(0))
    _ = float(vel[0][0, 0, 0])
    if dtype != jnp.float32:
        vel = jax.jit(lambda v: jax.tree.map(lambda x: x.astype(dtype), v),
                      donate_argnums=0)(vel)
    print(f"[probe] {size}^3 IC build {time.perf_counter() - t_ic:.1f}s "
          f"({dtype_name})", flush=True)
    t_c = time.perf_counter()
    out = run(vel)
    _ = float(out[0][0, 0, 0])  # compile + settle
    print(f"[probe] {size}^3 compile+first {time.perf_counter() - t_c:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    out = run(out)
    _ = float(out[0][0, 0, 0])
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    finite = jax.jit(
        lambda vs: jnp.all(jnp.stack([jnp.isfinite(v).all() for v in vs])))
    assert bool(finite(out))
    bytes_per = 2 if dtype_name == "bf16" else 4
    state_gb = 3 * size**3 * bytes_per / 1e9
    suffix = "" if dtype_name == "f32" else f"_{dtype_name}"
    print(f"[probe] {size}^3 projection step: {ms:.2f} ms (dt {dt:.2e}, "
          f"state {state_gb:.2f} GB, {dtype_name})", flush=True)
    merge(path, {f"step_ms_{size}{suffix}": round(ms, 3),
                 f"state_gb_{size}{suffix}": round(state_gb, 3)})
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="/root/data/kol3d/kol3d_results.json")
    p.add_argument("--skip-512", action="store_true")
    p.add_argument("--only-512-bf16", action="store_true",
                   help="internal: bf16 512^3 leg, run in a fresh process "
                   "(a raised device error can poison a JAX process on "
                   "this relay)")
    args = p.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.results)), exist_ok=True)

    def measured(size):
        if not os.path.exists(args.results):
            return False
        with open(args.results) as f:
            return f"step_ms_{size}" in json.load(f)

    # One production trajectory = 200 snapshots x 64 inner steps
    # (reference train.yaml).
    def record_traj(ms, key):
        traj_min = ms * 200 * 64 / 1e3 / 60
        merge(args.results, {key: round(traj_min, 1)})
        print(f"[probe] one 512^3 production trajectory (12,800 steps): "
              f"{traj_min:.0f} min/chip", flush=True)

    if args.only_512_bf16:
        record_traj(probe(512, 8, args.results, dtype_name="bf16"),
                    "traj_512_minutes_measured_bf16")
        return

    if not measured(256):
        probe(256, 20, args.results)
    if not args.skip_512 and not measured(512):
        try:
            record_traj(probe(512, 8, args.results),
                        "traj_512_minutes_measured")
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print("[probe] 512^3 f32 OOM (16 GB HBM); retrying with a "
                  "bf16 state in a fresh process", flush=True)
            merge(args.results, {"oom_512_f32": True})
            import subprocess

            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--results", args.results, "--only-512-bf16"],
                check=True)


if __name__ == "__main__":
    main()
