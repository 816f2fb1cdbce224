"""``generate`` commands: create datasets with the native solvers.

TPU-native equivalent of reference:fourierflow/commands/generate.py. The
``navier-stokes`` subcommand writes the torus_vis h5 layout
(train/valid/test splits with a, u, f, mu — generate.py:229-303) using the
batched solver; each batch is one XLA program, no dask needed.
"""

import logging
import os

import h5py
import jax
import numpy as np

from ..builders.synthetic import gaussian_random_field, solve_navier_stokes_2d

logger = logging.getLogger(__name__)

__all__ = ["navier_stokes"]


def navier_stokes(
    path: str,
    n_train: int = 1000,
    n_valid: int = 200,
    n_test: int = 200,
    s: int = 256,
    t: float = 20.0,
    steps: int = 20,
    mu: float = 1e-5,
    mu_min: float = 1e-5,
    mu_max: float = 1e-5,
    seed: int = 23893,
    delta: float = 1e-4,
    batch_size: int = 50,
    force: str = "li",
    cycles: int = 2,
    scaling: float = 0.1,
    t_scaling: float = 0.2,
    varying_force: bool = False,
):
    key = jax.random.PRNGKey(seed)
    rng = np.random.RandomState(seed + 1234)
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)

    with h5py.File(path, "a") as data_f:
        for split, n in [("train", n_train), ("valid", n_valid), ("test", n_test)]:
            if n == 0:
                continue
            logger.info("generating split %s (%d samples)", split, n)
            data_f.create_dataset(f"{split}/a", (n, s, s), np.float32)
            if varying_force:
                data_f.create_dataset(f"{split}/f", (n, s, s, steps), np.float32)
            else:
                data_f.create_dataset(f"{split}/f", (n, s, s), np.float32)
            data_f.create_dataset(f"{split}/u", (n, s, s, steps), np.float32)
            data_f.create_dataset(f"{split}/mu", (n,), np.float32)
            b = min(n, batch_size)
            c = 0
            for j in range(n // b):
                key, k_ic, k_force = jax.random.split(key, 3)
                w0 = np.asarray(gaussian_random_field(k_ic, b, s, n_dims=2, alpha=2.5, tau=7.0))

                mu_j = mu
                if mu_min != mu_max:
                    mu_j = rng.rand(b).astype(np.float32) * (mu_max - mu_min) + mu_min

                sol, f = solve_navier_stokes_2d(
                    w0,
                    mu_j,
                    t,
                    delta,
                    steps,
                    cycles,
                    scaling,
                    t_scaling,
                    force,
                    varying_force,
                    key=k_force,
                )
                data_f[f"{split}/a"][c : c + b] = w0
                data_f[f"{split}/u"][c : c + b] = sol
                if force == "random":
                    data_f[f"{split}/f"][c : c + b] = f
                data_f[f"{split}/mu"][c : c + b] = (
                    mu_j if np.ndim(mu_j) else np.full(b, mu_j, np.float32)
                )
                c += b
                logger.info("  batch %d/%d done", j + 1, n // b)
