"""Benchmark: F-FNO flagship training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference flagship experiment
(experiments/torus_li/markov/24_layers/config.yaml): 24-layer factorized
FNO, width 64, 16 modes, batch 19 on the 64x64 torus, AdamW + cosine
warmup, full train_step (features + normalizer + fwd + bwd + update).

Baseline: the reference repo stores no absolute throughput numbers
(BASELINE.md). Its training budget is 100k steps in <=48h on a V100
(~0.58 steps/s floor); a PyTorch eager A100 estimate for this model is
~10 steps/s. vs_baseline is reported against that 10 steps/s estimate.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fourierflow_tpu.models import FNOFactorized2DBlock
from fourierflow_tpu.routines import Grid2DMarkovRoutine
from fourierflow_tpu.routines.base import make_optimizer
from fourierflow_tpu.schedulers import cosine_with_warmup

BASELINE_STEPS_PER_SEC = 10.0  # estimated torch A100 (see module docstring)

# TPU v5e (the chip behind the axon tunnel): 197 TFLOP/s peak bf16 MXU.
PEAK_FLOPS = 197e12


def flops_per_train_step(batch, n, width, modes, n_layers, factor, input_dim):
    """Analytic matmul FLOPs of one flagship train step (fwd + bwd + update,
    bwd counted as 2x fwd — the standard rule for linear layers).

    Counts the ops of ops/spectral.py::spectral_mix_axis (3 matmuls per
    branch: truncated rDFT [n, 2M], per-mode 2Cx2C block mixing, inverse
    [2M, n]) plus the backcast FeedForward and the input/output heads.
    Elementwise work (residuals, normalizer, noise, loss, AdamW) is
    excluded — it is bandwidth-, not FLOPs-bound.
    """
    m2 = 2 * modes
    c2 = 2 * width
    rows = batch * n  # per branch: batch x the non-transformed spatial axis
    dft_f = 2 * rows * width * n * m2        # x[B,X,n,C] @ basis[n,2M]
    mix_f = 2 * rows * modes * c2 * c2       # per-mode [rows,2C] @ [2C,2C]
    inv_f = 2 * rows * width * m2 * n        # y[...,2M,C] @ basis[2M,n]
    spectral = 2 * (dft_f + mix_f + inv_f)   # two separable branches
    px = batch * n * n
    ff = 2 * px * width * (factor * width) * 2   # C -> 4C -> C
    per_layer = spectral + ff
    head = 2 * px * (input_dim * width + width * 128 + 128 * 1)
    fwd = n_layers * per_layer + head
    return 3 * fwd


def _wait_for_healthy_device(attempts=8, probe_timeout=240, sleep_s=240):
    """Wait (bounded) for the TPU relay to answer a tiny matmul.

    A wedged axon relay HANGS rather than erroring, and a hang in this
    process would eat the caller's whole timeout — so the probe runs in a
    subprocess that can be killed. This process only touches the device
    after a probe succeeds (or after all attempts are exhausted, in which
    case we proceed anyway — no worse than probing nothing). The default
    window (8 x 240 s probes + 7 x 240 s sleeps ~ 56 min) outlasts the
    relay's measured 30+ min wedge after a worker fault, and the per-probe
    timeout covers the measured round-5 cold-connection cost (the first
    compile of a NEW client process took 120-240 s — a 120 s probe window
    failed repeatedly while a 240 s one passed). No-op off the TPU relay
    (cpu/gpu platforms answer immediately).
    """
    last_err = ""
    probe = (
        # sitecustomize pins the axon platform regardless of env vars;
        # honor an explicit JAX_PLATFORMS the way tests/conftest.py does
        # so the probe exercises the same platform the bench will use.
        "import os\n"
        "import jax\n"
        "if os.environ.get('JAX_PLATFORMS'):\n"
        "    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])\n"
        "import jax.numpy as jnp\n"
        "y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256), jnp.bfloat16))\n"
        "print(float(y[0, 0]))\n"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
                env=dict(os.environ),
            )
            if r.returncode == 0:
                return
            last_err = (r.stderr or "").strip()[-500:]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {probe_timeout}s (relay hang)"
        if i < attempts - 1:
            print(
                f"bench: device probe {i + 1}/{attempts} failed; "
                f"retrying in {sleep_s}s",
                file=sys.stderr,
            )
            time.sleep(sleep_s)
    print(
        f"bench: device never answered after {attempts} probes; last error: "
        f"{last_err or 'none captured'}; proceeding anyway",
        file=sys.stderr,
    )


def main():
    batch, n = 19, 64
    _wait_for_healthy_device()
    model = FNOFactorized2DBlock(
        modes=16,
        width=64,
        input_dim=3,
        n_layers=24,
        share_weight=True,
        factor=4,
        ff_weight_norm=True,
        gain=0.1,
        # Mixed precision: bf16 activations/matmuls, f32 params + loss.
        dtype=jnp.bfloat16,
    )
    routine = Grid2DMarkovRoutine(
        model,
        n_steps=10,
        max_accumulations=1000,
        noise_std=0.01,
        optimizer=make_optimizer(
            schedule=cosine_with_warmup(0.0025, 500, 100000), weight_decay=1e-4
        ),
    )
    from fourierflow_tpu.trainers.trainer import make_scan_epoch

    # Device-resident dataset, the size of one real epoch shard; batches are
    # gathered and shuffled on device (the production fast loop).
    n_samples = 950  # ~ one torus_li epoch: 1000 trajs x 18 pairs / 19 batch
    rng = np.random.RandomState(0)
    data = {
        "x": jnp.asarray(rng.randn(n_samples, n, n, 1).astype(np.float32)),
        "y": jnp.asarray(rng.randn(n_samples, n, n, 1).astype(np.float32)),
    }
    sample = {k: v[:batch] for k, v in data.items()}
    state = routine.init(jax.random.PRNGKey(0), sample)
    state = routine.accumulate_step(state, sample)

    train_epoch = make_scan_epoch(routine, batch, accumulate=False)
    n_batches = n_samples // batch
    key = jax.random.PRNGKey(1)

    # warmup/compile (also warms the D2H transfer path)
    state, metrics = train_epoch(state, data, jax.random.fold_in(key, 0))
    _ = float(metrics["train_loss"])

    # NOTE: on the axon relay backend block_until_ready() returns before
    # compute finishes; only an actual value transfer guarantees
    # completion, so the timed region ends with float().
    n_epochs = 3
    t0 = time.perf_counter()
    for i in range(1, n_epochs + 1):
        state, metrics = train_epoch(state, data, jax.random.fold_in(key, i))
    _ = float(metrics["train_loss"])
    elapsed = time.perf_counter() - t0
    steps_per_sec = n_epochs * n_batches / elapsed

    flops = flops_per_train_step(
        batch=batch, n=n, width=64, modes=16, n_layers=24, factor=4, input_dim=3
    )
    mfu = steps_per_sec * flops / PEAK_FLOPS
    print(
        json.dumps(
            {
                "metric": "ffno24_torus64_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
                "mfu": round(mfu, 4),
                "flops_per_step": flops,
            }
        )
    )


if __name__ == "__main__":
    main()
