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

__all__ = ["navier_stokes", "kolmogorov"]


def kolmogorov(config_path: str, overrides=None):
    """Generate Kolmogorov-flow datasets from a data config YAML
    (reference:fourierflow/commands/generate.py:34-226). Trajectories are
    simulated sequentially (one chip; no dask) with streaming HDF5 writes:
    files ``{stem}_{size}_{k}.h5`` (trajectories) or ``{stem}_{size}.h5``
    (warmup-only initial conditions)."""
    from ..builders.kolmogorov import generate_kolmogorov
    from ..config import instantiate, load_config

    cfg = load_config(config_path, overrides)
    config_dir = os.path.dirname(os.path.abspath(config_path))
    if not os.path.isfile(config_path):
        # Registry name (e.g. data/kolmogorov/re_1000/baselines/32):
        # outputs land under the matching directory in the CWD.
        config_dir = os.path.dirname(os.path.abspath(config_path))
        os.makedirs(config_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(config_path))[0]

    sim_grid = instantiate(cfg["sim_grid"])
    out_vorticity = cfg.get("out_vorticity", True)
    dt = cfg["time_step"]
    if not isinstance(dt, float):
        dt = instantiate(dt)

    n_traj = cfg["n_trajectories"]
    inner_steps = cfg["inner_steps"]
    outer_steps = cfg["outer_steps"]
    warmup_steps = cfg.get("warmup_steps", 0)
    keys = jax.random.split(jax.random.PRNGKey(cfg["seed"]), n_traj)

    downsample_fn = instantiate(cfg["downsample_fn"])
    step_cfg = cfg["step_fn"]

    init_path = cfg.get("init_path")
    init_file = None
    if init_path:
        init_path = os.path.splitext(os.path.expandvars(init_path))[0] + ".h5"
        init_file = h5py.File(init_path, "r")

    # Open output files and pre-create datasets for streaming writes.
    files = {}
    final_paths = {}
    completed = False
    ndim = sim_grid.ndim
    fields = ["vx", "vy", "vz"][:ndim] + (
        ["vorticity"] if (out_vorticity and ndim == 2) else []
    )
    for o in cfg["out_sizes"]:
        key = (o["size"], o["k"])
        size, k = key
        if outer_steps > 0:
            path = os.path.join(config_dir, f"{stem}_{size}_{k}.h5")
            t_len = outer_steps // k
            shape = (n_traj, t_len) + (size,) * ndim
            times = dt * inner_steps * k * np.arange(1, t_len + 1)
        else:
            path = os.path.join(config_dir, f"{stem}_{size}.h5")
            shape = (n_traj,) + (size,) * ndim
            times = None
        # Stream into a temp name; rename on completion so an interrupted
        # run can never masquerade as a finished dataset (partially-filled
        # files would otherwise train on silent zeros on resume).
        f = h5py.File(path + ".tmp", "w")
        for name in fields:
            f.create_dataset(name, shape, np.float32)
        if times is not None:
            f.create_dataset("time", data=times.astype(np.float32))
        f.create_dataset("elapsed", (n_traj,), np.float32)
        f.attrs["dt"] = dt
        f.attrs["inner_steps"] = inner_steps
        files[key] = f
        final_paths[key] = path

    # Trajectories per vmapped dispatch: amortizes relay latency and fills
    # the MXU at small sim grids; 1 preserves the sequential path (large
    # grids / mesh sharding).
    gen_batch = max(1, int(cfg.get("generation_batch", 1)))
    # Compiled chunk functions persist across trajectory batches (same
    # config): avoids re-paying multi-minute XLA compiles per batch.
    gen_fn_cache = {}
    try:
        for start in range(0, n_traj, gen_batch):
            bsz = min(gen_batch, n_traj - start)
            idx = slice(start, start + bsz)
            initial_field = None
            if init_file is not None:
                initial_field = {
                    name: init_file[name][idx] if bsz > 1 else init_file[name][start]
                    for name in (["vorticity"] if ndim == 2 else []) + fields
                    if name in init_file
                }
            outs, elapsed = generate_kolmogorov(
                sim_grid=sim_grid,
                out_sizes=cfg["out_sizes"],
                method=cfg.get("method", "pseudo_spectral"),
                step_fn=step_cfg,
                downsample_fn=downsample_fn,
                seed=keys[idx] if bsz > 1 else keys[start],
                initial_field=initial_field,
                peak_wavenumber=cfg.get("peak_wavenumber", 4.0),
                max_velocity=cfg.get("max_velocity", 7.0),
                inner_steps=inner_steps,
                outer_steps=outer_steps,
                warmup_steps=warmup_steps,
                out_vorticity=out_vorticity,
                chunk_outer=cfg.get("generation_chunk", "auto"),
                fn_cache=gen_fn_cache,
            )
            for key, f in files.items():
                k = key[1]
                for name in fields:
                    arr = outs[key][name]
                    if bsz == 1:
                        arr = arr[None]
                    # subsample snapshots by k (generate.py:155-166)
                    out = arr[:, k - 1 :: k] if outer_steps > 0 else arr
                    # Exact-shape write: h5py would silently BROADCAST a
                    # time-less snapshot across the time axis otherwise.
                    want = f[name].shape[1:]
                    if out.shape[1:] != want:
                        raise ValueError(
                            f"{name}: generated shape {out.shape[1:]} != "
                            f"dataset shape {want}")
                    f[name][idx] = out
                f["elapsed"][idx] = elapsed / bsz
            logger.info(
                "trajectories %d-%d/%d done in %.1fs",
                start + 1, start + bsz, n_traj, elapsed,
            )
        completed = True
    finally:
        for f in files.values():
            f.close()
        if init_file is not None:
            init_file.close()
        for key, path in final_paths.items():
            if completed:
                os.replace(path + ".tmp", path)
            else:
                try:
                    os.remove(path + ".tmp")
                except OSError:
                    pass


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
