"""Measured HBM bandwidth roofline (VERDICT r3 #5).

RESULTS.md prices the spectral-chain roofline at the v5e's SPEC 819 GB/s;
this measures the achievable streaming bandwidth on the actual chip with
STREAM-style kernels, so the "forward sits at the roofline" claim cites a
measured number:

- scale:  x <- a*x + b        (read N + write N per iteration)
- triad:  x <- x + c*y        (read 2N + write N per iteration)

Each measurement is ONE jitted lax.scan of --iters iterations over a
resident array (per-dispatch wall ~2-6 s, far under the relay's ~60 s
kill threshold; the loop keeps relay dispatch latency out of the
numerator). Buffers are donated so the update is in-place in HBM.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/probe_hbm_bandwidth.py --out /root/data/hbm_bandwidth.json
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


def measure(dtype_name, n_mib, iters, results):
    import jax
    import jax.numpy as jnp

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    itemsize = 2 if dtype_name == "bf16" else 4
    n = n_mib * 2**20 // itemsize
    # 2D shape: keep the trailing dim lane-friendly.
    shape = (n // 1024, 1024)
    nbytes = shape[0] * shape[1] * itemsize

    @jax.jit
    def scale(x):
        def body(x, _):
            return x * jnp.asarray(1.0000001, dtype) + jnp.asarray(1e-9, dtype), None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    @jax.jit
    def triad(x, y):
        def body(x, _):
            return x + y * jnp.asarray(1e-9, dtype), None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    x = jnp.ones(shape, dtype)
    y = jnp.ones(shape, dtype)

    for name, fn, args, traffic in (
        ("scale", scale, (x,), 2 * nbytes),
        ("triad", triad, (x, y), 3 * nbytes),
    ):
        out = fn(*args)
        _ = float(out[0, 0])  # compile + settle (real value fetch)
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out[0, 0])
        dt = time.perf_counter() - t0
        gbps = traffic * iters / dt / 1e9
        key = f"{name}_{dtype_name}_{n_mib}mib"
        results[key] = round(gbps, 1)
        print(f"[hbm] {key}: {gbps:.0f} GB/s "
              f"({iters} iters, {dt:.2f} s/dispatch)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/root/data/hbm_bandwidth.json")
    p.add_argument("--iters", type=int, default=1000)
    args = p.parse_args()

    import jax

    print(f"[hbm] devices: {jax.devices()}", flush=True)
    results = {}
    # 256 MiB resident arrays: big enough to defeat any cache, small
    # enough that scan carry duplication can't approach HBM capacity.
    for dtype_name in ("bf16", "f32"):
        measure(dtype_name, 256, args.iters, results)
    # A smaller working set closer to the spectral chain's per-layer
    # activations (batch 19 x 64^2 x 64ch bf16 ~ 9.5 MiB).
    measure("bf16", 16, args.iters * 4, results)

    results["spec_gbps_v5e"] = 819.0
    best = max(v for k, v in results.items() if isinstance(v, float)
               and not k.startswith("spec"))
    results["best_measured_gbps"] = best
    print(f"[hbm] best measured: {best:.0f} GB/s "
          f"({best / 819 * 100:.0f}% of the 819 GB/s spec)", flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
