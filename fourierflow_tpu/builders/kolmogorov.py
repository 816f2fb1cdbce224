"""Kolmogorov flow data pipeline: native pseudo-spectral generation and
dataset builders.

TPU-native equivalent of reference:fourierflow/builders/kolmogorov.py,
with jax-cfd fully replaced by the native equation/stepper/downsampling
stack (fourierflow_tpu.utils.{equations,spectral,forcings}).

Storage note: the reference writes xarray/netCDF; xarray is not available
in this environment, so datasets are plain HDF5 with the same dimension
layout — datasets ``vorticity``/``vx``/``vy`` of shape
[sample, time, x, y] (or [sample, x, y] for initial conditions), a
``time`` coordinate vector, per-sample ``elapsed`` seconds, and a ``dt``
attribute.
"""

import logging
import time
from typing import Callable, Dict, List, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import irfft2, rfft2
from ..utils.equations import repeated, trajectory
from ..utils.grids import Grid, fft_mesh
from ..utils.spectral import (
    downsample_staggered_velocity,
    downsample_vorticity_hat,
    velocity_to_vorticity_fd,
    vorticity_to_velocity_solve,
)
from .base import Builder

logger = logging.getLogger(__name__)

__all__ = [
    "filtered_velocity_field",
    "generate_kolmogorov",
    "downsample_vorticity_snapshot",
    "downsample_velocity_snapshot",
    "KolmogorovMarkovDataset",
    "KolmogorovTrajectoryDataset",
    "KolmogorovBuilder",
]


def filtered_velocity_field(
    key: jax.Array, grid: Grid, maximum_velocity: float = 1.0, peak_wavenumber: float = 3.0
):
    """Random divergence-free velocity field with its energy spectrum
    peaked near ``peak_wavenumber``, normalized to ``maximum_velocity``.

    Native stand-in for jax-cfd's ``filtered_velocity_field`` (used at
    reference builders/kolmogorov.py:360-364): a random streamfunction is
    shaped so |v(k)| ~ (k/kp)^2 exp(-(k/kp)^2 / 2) (energy peak at kp),
    velocities are spectral derivatives of psi (exactly divergence-free),
    and the field is rescaled so max speed == maximum_velocity. The
    spectral shaping differs from jax-cfd in detail but matches in peak
    location and smoothness; warmup decorrelates the difference.
    """
    nx, ny = grid.shape
    kx, ky = fft_mesh(grid.shape, grid.domain)
    kmag = jnp.sqrt(kx**2 + ky**2)
    # wavenumbers are in cycles/length; express kp in the same units.
    kp = peak_wavenumber / (grid.domain[0][1] - grid.domain[0][0])

    # |psi(k)| such that |v(k)| = 2*pi*k*|psi(k)| has the target shape.
    vel_amp = (kmag / kp) ** 2 * jnp.exp(-((kmag / kp) ** 2) / 2.0)
    psi_amp = jnp.where(kmag > 0, vel_amp / (2 * jnp.pi * jnp.maximum(kmag, 1e-12)), 0.0)

    kr, ki = jax.random.split(key)
    noise = jax.random.normal(kr, (nx, ny)) + 1j * jax.random.normal(ki, (nx, ny))
    psi_hat_full = psi_amp * noise

    # Hermitian-symmetrize by taking the real part of psi, then
    # differentiate spectrally in the half-spectrum.
    two_pi_i = 2j * jnp.pi
    psi = jnp.real(_ifft2_full(psi_hat_full))
    psi_hat = rfft2(psi, axes=(0, 1))
    from ..utils.grids import rfft_mesh as _rfft_mesh

    rkx, rky = _rfft_mesh(grid.shape, grid.domain)
    vx = irfft2(two_pi_i * rky * psi_hat, s=grid.shape, axes=(0, 1))
    vy = irfft2(-two_pi_i * rkx * psi_hat, s=grid.shape, axes=(0, 1))

    speed = jnp.sqrt(vx**2 + vy**2)
    scale = maximum_velocity / jnp.maximum(jnp.max(speed), 1e-12)
    return vx * scale, vy * scale


def _ifft2_full(z):
    from ..ops.fourier import ifftn

    return ifftn(z, axes=(0, 1))


def downsample_vorticity_snapshot(sim_grid, out_grids, velocity_solve, out_vorticity, vorticity_hat):
    """Per-snapshot downsampling callback for the pseudo-spectral method
    (reference builders/kolmogorov.py:408-428). Runs inside the scanned
    trajectory, so every output resolution is produced in one XLA program."""
    outs = {}
    for key, out_grid in out_grids.items():
        size = key[0]
        if size == sim_grid.shape[0]:
            vxhat, vyhat = velocity_solve(vorticity_hat)
            out = {
                "vx": irfft2(vxhat, s=sim_grid.shape, axes=(-2, -1)),
                "vy": irfft2(vyhat, s=sim_grid.shape, axes=(-2, -1)),
                "vorticity": irfft2(vorticity_hat, s=sim_grid.shape, axes=(-2, -1)),
            }
        else:
            out = downsample_vorticity_hat(vorticity_hat, velocity_solve, sim_grid, out_grid)
        if not out_vorticity:
            out.pop("vorticity", None)
        outs[key] = out
    return outs


def downsample_velocity_snapshot(sim_grid, out_grids, velocity_solve, out_vorticity, u):
    """Velocity-state variant (projection method,
    reference builders/kolmogorov.py:431-452). Supports 2D (vx, vy) and
    3D (vx, vy, vz) staggered states; vorticity output is 2D-only."""
    names = ["vx", "vy", "vz"][: len(u)]
    outs = {}
    for key, out_grid in out_grids.items():
        size = key[0]
        if size == sim_grid.shape[0]:
            comps = tuple(u)
            grid = sim_grid
        else:
            comps = downsample_staggered_velocity(sim_grid, out_grid, u)
            grid = out_grid
        out = dict(zip(names, comps))
        if out_vorticity and len(u) == 2:
            out["vorticity"] = velocity_to_vorticity_fd(comps[0], comps[1], grid)
        outs[key] = out
    return outs


def generate_kolmogorov(
    sim_grid: Grid,
    out_sizes: List[Dict[str, int]],
    method: str,
    step_fn,
    downsample_fn: Callable,
    seed: jax.Array,
    initial_field: Optional[Dict[str, np.ndarray]] = None,
    peak_wavenumber: float = 4.0,
    max_velocity: float = 7.0,
    inner_steps: int = 25,
    outer_steps: int = 200,
    warmup_steps: int = 40,
    out_vorticity: bool = True,
    mesh=None,
    spatial_axis: str = "spatial",
    chunk_outer="auto",
    fn_cache: Optional[dict] = None,
):
    """Simulate one Kolmogorov trajectory and downsample snapshots to all
    requested output grids (reference builders/kolmogorov.py:328-405).

    Returns ``(outs, elapsed)`` where outs maps (size, k) to dicts of
    stacked snapshot arrays [outer_steps, size, size] (or single fields
    when only warming up).

    Passing a stacked ``seed`` of shape [B, 2] (with initial fields, if
    any, carrying a matching leading batch dim) simulates B trajectories
    in one vmapped program; every output gains a leading batch dim.

    For very large sim grids (the reference generates at 2048^2,
    data/kolmogorov/re_1000/trajectories/train.yaml) pass a
    ``jax.sharding.Mesh``: the spectral state is sharded along its first
    spatial axis and the matmul-DFT formulation lets XLA insert the
    all-gather/reduce-scatter collectives for the cross-axis transforms
    over ICI — no code changes in the solver (SURVEY.md §2.7: the
    reference instead fans out whole trajectories with dask-cuda).
    """
    if method not in ("pseudo_spectral", "projection"):
        raise NotImplementedError(f"unknown method {method!r}")
    if isinstance(step_fn, dict):
        from ..config import instantiate

        step_fn = instantiate(step_fn)

    # Batched generation: a [B, 2] stack of PRNG keys (and/or leading-batch
    # initial fields) simulates B independent trajectories in ONE vmapped
    # XLA program — one dispatch and one host transfer per batch instead of
    # per trajectory, which amortizes the relay latency and fills the MXU
    # at small sim grids (the reference fans out whole processes with
    # dask-cuda instead, commands/generate.py:47-50).
    batched = getattr(seed, "ndim", 1) == 2
    if batched and mesh is not None:
        raise ValueError("batched generation and mesh sharding are exclusive")
    vwrap = jax.vmap if batched else (lambda f: f)

    # The spectral vorticity->velocity solve only exists in 2D; the 3D
    # projection path carries velocities directly.
    velocity_solve = (
        vorticity_to_velocity_solve(sim_grid) if sim_grid.ndim == 2 else None
    )
    out_grids = {}
    for o in out_sizes:
        out_grids[(o["size"], o["k"])] = Grid(
            shape=(o["size"],) * sim_grid.ndim, domain=sim_grid.domain
        )
    downsample = lambda state: downsample_fn(
        sim_grid, out_grids, velocity_solve, out_vorticity, state
    )

    # The IC build and initial transform run under jit: eagerly dispatched
    # complex arithmetic is UNIMPLEMENTED on the axon TPU backend.
    if method == "projection":
        # Velocity-tuple state, finite-volume stepper
        # (utils/finite_volume.semi_implicit_navier_stokes).
        if initial_field is None:
            if sim_grid.ndim == 3:
                from ..utils.finite_volume import filtered_velocity_field_3d

                state = jax.jit(vwrap(
                    lambda k: filtered_velocity_field_3d(
                        k, sim_grid, max_velocity, peak_wavenumber)
                ))(seed)
            else:
                state = jax.jit(vwrap(
                    lambda k: filtered_velocity_field(
                        k, sim_grid, max_velocity, peak_wavenumber)
                ))(seed)
        else:
            names = ["vx", "vy", "vz"][: sim_grid.ndim]
            state = tuple(jnp.asarray(initial_field[n]) for n in names)
    elif initial_field is None:
        def make_state(seed):
            vx, vy = filtered_velocity_field(seed, sim_grid, max_velocity, peak_wavenumber)
            w0 = velocity_to_vorticity_fd(vx, vy, sim_grid)
            return rfft2(w0, axes=(0, 1))

        state = jax.jit(vwrap(make_state))(seed)
    else:
        vorticity0 = jnp.asarray(initial_field["vorticity"])
        state = jax.jit(lambda w: rfft2(w, axes=(-2, -1)))(vorticity0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(
            state, NamedSharding(mesh, PartitionSpec(spatial_axis, None))
        )
    outer_step_fn = repeated(step_fn, inner_steps)

    # Warmup evolves the state without recording; with outer_steps == 0 the
    # run is warmup-only and returns the single warmed snapshot (the
    # reference's initial_conditions configs). With outer_steps > 0 the
    # recorded trajectory starts AFTER the warmup. (Historical footgun:
    # warmup>0 used to early-return the snapshot even when a trajectory
    # was requested, and the HDF5 writer silently broadcast it over the
    # time axis — now warmup composes with trajectory recording, and the
    # writer asserts the time dimension.)
    start = time.time()

    # ---- Chunked simulation: the relay kills any single XLA dispatch
    # running longer than ~1 minute (see trainers/trainer.py), and one
    # whole-trajectory scan at large sim grids runs for minutes. Warmup
    # and recording are split into bounded dispatches; 'auto' calibrates
    # the chunk length from a timed probe dispatch (the probes advance the
    # state, so they double as the first warmup steps). chunk_outer=None/0
    # keeps the historical single-dispatch behavior.
    time_axis = 1 if batched else 0
    # Callers generating many trajectory batches with the SAME config pass
    # a persistent dict here: the jitted chunk functions (and their XLA
    # compilations, ~minutes each at large sim grids) are then reused
    # across generate_kolmogorov calls instead of recompiled per batch.
    # jit retraces automatically for a differently-sized final batch.
    if fn_cache is None:
        fn_cache = {}

    def traj_chunk(k):
        # Keyed by (k, batched): a shared cache across generate_kolmogorov
        # calls may see both vmapped batches and an unbatched remainder
        # trajectory (n_trajectories % generation_batch == 1); reusing a
        # vmapped chunk fn on unbatched state crashes the scan with a
        # carry-shape mismatch and discards the whole run.
        key = (k, batched)
        if key not in fn_cache:
            fn_cache[key] = jax.jit(vwrap(trajectory(outer_step_fn, k, downsample)))
        return fn_cache[key]

    def sync(tree):
        # Wholesale fetch of one (small, downsampled) leaf: no eager
        # device ops (leaf.ravel()[0] would dispatch an eager gather —
        # pathologically slow on the relay and it would poison the probe
        # timing that sizes every later chunk).
        _ = np.asarray(jax.device_get(jax.tree.leaves(tree)[0]))

    if outer_steps == 0 and warmup_steps == 0:
        pass
    elif not chunk_outer:
        if warmup_steps > 0:
            state = jax.jit(vwrap(repeated(outer_step_fn, warmup_steps)))(state)
        if outer_steps > 0:
            state, trajs = traj_chunk(outer_steps)(state)
            trajs = jax.tree.map(np.asarray, trajs)
            elapsed = np.float32(time.time() - start)
            return trajs, elapsed
    else:
        target_s = 25.0
        rate = None  # outer steps per second, measured
        warm_left = warmup_steps
        rec_parts = []
        rec_left = outer_steps

        def run_chunk(state, k, record):
            nonlocal warm_left, rec_left
            state, outs = traj_chunk(k)(state)
            if record:
                rec_parts.append(outs)
                rec_left -= k
            else:
                warm_left -= k
            return state, outs

        if chunk_outer == "auto" and "__chunk__" in fn_cache:
            # A previous batch with this cache already calibrated; reuse
            # its chunk so every compiled chunk length cache-hits.
            chunk = fn_cache["__chunk__"]
        elif chunk_outer == "auto":
            # Probe twice with ONE outer step: the first pays the compile,
            # the second is timed clean. One step keeps even a 2048² probe
            # dispatch (~2 s) far below the kill threshold; the dispatch
            # overhead folded into the measurement only makes the chunk
            # size conservative. Probes advance the simulation, so they
            # consume warmup steps first and only record once warmup is
            # fully done (ordering is semantic: the recorded trajectory
            # starts AFTER the burn-in).
            for attempt in range(2):
                if warm_left > 0:
                    record = False
                elif rec_left > 0:
                    record = True
                else:
                    break
                state, outs = run_chunk(state, 1, record=record)
                t0 = time.time()
                sync(outs)
                if attempt == 1:
                    rate = 1.0 / max(time.time() - t0 + 1e-9, 1e-3)
            if rate is not None:
                from ..utils.chunking import rate_to_chunk

                chunk = rate_to_chunk(rate, target_s)
            else:
                chunk = max(1, warm_left + rec_left)
            fn_cache["__chunk__"] = chunk
        else:
            chunk = int(chunk_outer)

        from ..utils.chunking import bounded_schedule

        def schedule(total):
            return bounded_schedule(total, chunk)

        for k in schedule(warm_left):
            state, outs = run_chunk(state, k, record=False)
        for k in schedule(rec_left):
            state, outs = run_chunk(state, k, record=True)

        if outer_steps > 0:
            rec_parts = [jax.tree.map(np.asarray, p) for p in rec_parts]
            trajs = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=time_axis), *rec_parts
            )
            elapsed = np.float32(time.time() - start)
            return trajs, elapsed

    # Warmup-only (initial-conditions configs): return the warmed snapshot.
    outs = jax.jit(vwrap(downsample))(state)
    outs = jax.tree.map(np.asarray, outs)
    elapsed = np.float32(time.time() - start)
    return outs, elapsed


# ---------------------------------------------------------------------------
# Datasets / builder over the generated HDF5 files.
# ---------------------------------------------------------------------------


class KolmogorovMarkovDataset:
    """One-step (t, t+k) training pairs with velocity channels
    (reference KolmogorovTorchDataset, builders/kolmogorov.py:111-139)."""

    def __init__(self, path: str, k: int = 1, in_memory: bool = True):
        self.k = k
        with h5py.File(_resolve_data_path(path), "r") as f:
            self.w = f["vorticity"][...]  # [S, T, X, Y]
            self.vx = f["vx"][...]
            self.vy = f["vy"][...]
            self.times = f["time"][...] if "time" in f else None
        self.B = self.w.shape[0]
        self.T = self.w.shape[1] - k

    def __len__(self):
        return self.B * self.T

    def sample(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        b = idx // self.T
        t = idx % self.T
        k = self.k
        return {
            "x": self.w[b, t][..., None],
            "vx": self.vx[b, t][..., None],
            "vy": self.vy[b, t][..., None],
            "y": self.w[b, t + k][..., None],
        }

    def device_train_data(self, fields=("w", "vx", "vy")):
        """Device-resident view for the trainer's scanned fast path: the
        raw [S, T, X, Y] arrays live on device once; per-step batches are
        gathered inside the epoch scan (2.7x over host-streamed batches
        measured on the axon relay).

        ``fields``: which arrays to put on device. The Markov routine with
        ``use_velocity`` recovers velocities spectrally from vorticity, so
        ``fields=("w",)`` uploads a third of the bytes (significant over
        the relay for multi-hundred-MB datasets).
        """
        data = {f: getattr(self, f) for f in fields}
        k, T = self.k, self.T

        def sample_fn(arrays, idx):
            b = idx // T
            t = idx % T
            out = {
                "x": arrays["w"][b, t][..., None],
                "y": arrays["w"][b, t + k][..., None],
            }
            for f in ("vx", "vy"):
                if f in arrays:
                    out[f] = arrays[f][b, t][..., None]
            return out

        return data, sample_fn, len(self)


class KolmogorovTrajectoryDataset:
    """Whole-trajectory evaluation items: initial condition prepended,
    plus a 32^2 reference trajectory for reduced-resolution correlation
    (reference KolmogorovTrajectoryDataset, builders/kolmogorov.py:177-212)."""

    def __init__(self, init_path: str, path: str, corr_path: str, k: int = 1,
                 end: Optional[int] = None, in_memory: bool = True):
        self.k = k
        init_path = _resolve_data_path(init_path)
        path = _resolve_data_path(path)
        corr_path = _resolve_data_path(corr_path)
        with h5py.File(path, "r") as f:
            w = f["vorticity"][...]  # [S, T, X, Y]
            vx = f["vx"][...]
            vy = f["vy"][...]
            times = f["time"][...]
        with h5py.File(init_path, "r") as f:
            w0 = f["vorticity"][...]  # [S, X, Y]
            vx0 = f["vx"][...]
            vy0 = f["vy"][...]
        with h5py.File(corr_path, "r") as f:
            cw = f["vorticity"][...]

        def with_init(a0, a):
            return np.concatenate([a0[:, None], a], axis=1)

        sl = slice(None, end, k)
        # [S, T+1, X, Y] -> [S, X, Y, T'] with time last
        self.data = np.moveaxis(with_init(w0, w)[:, sl], 1, -1)
        self.vx = np.moveaxis(with_init(vx0, vx)[:, sl], 1, -1)
        self.vy = np.moveaxis(with_init(vy0, vy)[:, sl], 1, -1)
        self.times = np.concatenate([[0.0], times])[sl].astype(np.float32)
        # The corr file may or may not carry its own init; prepend the
        # direct downsample of the init if lengths differ by one.
        if cw.shape[1] == w.shape[1]:
            from ..utils.spectral import downsample_vorticity

            # jit: the spectral downsample dispatches complex arithmetic,
            # which is UNIMPLEMENTED when run eagerly on the axon backend.
            cw0 = np.asarray(
                jax.jit(lambda a: downsample_vorticity(a, cw.shape[-1]))(
                    w0[..., None]
                )[..., 0]
            )
            cw = with_init(cw0, cw)
        self.corr_data = np.moveaxis(cw[:, sl], 1, -1)
        self.B = self.data.shape[0]

    def __len__(self):
        return self.B

    def sample(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "data": self.data[idx],
            "vx": self.vx[idx],
            "vy": self.vy[idx],
            "corr_data": self.corr_data[idx],
            "times": np.broadcast_to(self.times, (len(idx), len(self.times))),
        }


def _resolve_data_path(path: str) -> str:
    """Expand env vars and fall back between .nc and .h5 extensions: the
    reference writes netCDF, our generator writes HDF5 with the same
    naming scheme; h5py reads netCDF4 files too, so either works when the
    file exists."""
    import os

    path = os.path.expandvars(os.path.expanduser(path))
    if not os.path.exists(path):
        stem, ext = os.path.splitext(path)
        alt = stem + (".h5" if ext == ".nc" else ".nc")
        if os.path.exists(alt):
            return alt
    return path


class KolmogorovVelocityDataset:
    """Unrolled-velocity training items for the learned-interpolation
    model (reference KolmogorovJAXDataset, builders/kolmogorov.py:71-108):
    each item is an initial (vx, vy) plus the next ``unroll_length``
    snapshots at stride ``k``, time-last."""

    def __init__(self, path: str, k: int = 2, unroll_length: int = 32,
                 inner_steps: Optional[int] = None, in_memory: bool = True):
        del inner_steps  # accepted for config parity; stride is `k`
        self.k = k
        self.L = unroll_length
        with h5py.File(_resolve_data_path(path), "r") as f:
            self.vx = f["vx"][...]  # [S, T, X, Y]
            self.vy = f["vy"][...]
        self.B = self.vx.shape[0]
        self.T = self.vx.shape[1] - self.k * self.L

    def __len__(self):
        return self.B * self.T

    def sample(self, idx: np.ndarray):
        b = idx // self.T
        t = idx % self.T
        k, L = self.k, self.L
        steps = np.arange(1, L + 1) * k  # [L]
        t_out = t[:, None] + steps[None, :]  # [batch, L]
        inputs = {"vx": self.vx[b, t], "vy": self.vy[b, t]}
        outputs = {
            "vx": np.moveaxis(self.vx[b[:, None], t_out], 1, -1),
            "vy": np.moveaxis(self.vy[b[:, None], t_out], 1, -1),
        }
        return inputs, outputs

    def device_train_data(self):
        """Device-resident view for the trainer's scanned fast path (see
        KolmogorovMarkovDataset.device_train_data)."""
        data = {"vx": self.vx, "vy": self.vy}
        k, L, T = self.k, self.L, self.T

        def sample_fn(arrays, idx):
            import jax.numpy as jnp

            b = idx // T
            t = idx % T
            steps = jnp.arange(1, L + 1) * k
            t_out = t[:, None] + steps[None, :]
            inputs = {"vx": arrays["vx"][b, t], "vy": arrays["vy"][b, t]}
            outputs = {
                "vx": jnp.moveaxis(arrays["vx"][b[:, None], t_out], 1, -1),
                "vy": jnp.moveaxis(arrays["vy"][b[:, None], t_out], 1, -1),
            }
            return inputs, outputs

        return data, sample_fn, len(self)


class KolmogorovVelocityTrajectoryDataset:
    """Whole-trajectory eval items for the learned-interpolation model
    (reference KolmogorovJAXTrajectoryDataset, builders/kolmogorov.py:
    215-255): initial staggered velocities plus the 32^2 reference
    vorticity trajectory for correlation scoring."""

    def __init__(self, init_path: str, corr_path: str, path: Optional[str] = None,
                 k: int = 1, end: Optional[int] = None, inner_steps: int = 1,
                 outer_steps: int = 100, in_memory: bool = True):
        init_path = _resolve_data_path(init_path)
        corr_path = _resolve_data_path(corr_path)
        with h5py.File(init_path, "r") as f:
            self.vx0 = f["vx"][...]  # [S, X, Y]
            self.vy0 = f["vy"][...]
        with h5py.File(corr_path, "r") as f:
            cw = f["vorticity"][...]  # [S, T, X, Y]
            times = f["time"][...]
        # Two-stage subsampling, matching the reference exactly
        # (builders/kolmogorov.py:242-253): the k-stride turns the file
        # cadence into the model cadence, then validation snapshots land
        # every `inner_steps` MODEL steps. The reference indexes the
        # k-strided array at s, 2s, ... AFTER prepending the initial
        # condition at index 0; without that prepend (the init lives in
        # its own file here) target i sits at raw index i*s*k - 1.
        s = inner_steps
        sl = slice(s * k - 1, end, s * k)
        cw = cw[:, sl]
        times = times[sl]
        n = min(outer_steps, cw.shape[1])
        self.targets = np.moveaxis(cw[:, :n], 1, -1)  # [S, 32, 32, n]
        self.times = times[:n].astype(np.float32)
        self.B = self.vx0.shape[0]

    def __len__(self):
        return self.B

    def sample(self, idx: np.ndarray):
        return {
            "vx": self.vx0[idx],
            "vy": self.vy0[idx],
            "targets": self.targets[idx],
            "times": np.broadcast_to(self.times, (len(idx), len(self.times))),
        }


class KolmogorovMultiDataset:
    """Round-robin multi-resolution training dataset
    (reference KolmogorovMultiTorchDataset, builders/kolmogorov.py:142-174):
    one-step datasets at several grid sizes, alternated per batch so the
    model sees every resolution each epoch. Because batches from different
    resolutions have different static shapes, each resolution gets its own
    XLA compilation — batches are grouped per-resolution, not mixed."""

    def __init__(self, paths, k: int = 1, batch_size: int = 32, in_memory: bool = True):
        self.datasets = [KolmogorovMarkovDataset(p, k=k, in_memory=in_memory) for p in paths]
        self.batch_size = batch_size

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def batches(self, shuffle=False, rng=None):
        """Interleave per-resolution batches round-robin."""
        rng = rng or np.random.default_rng()
        streams = []
        for ds in self.datasets:
            idx = np.arange(len(ds))
            if shuffle:
                rng.shuffle(idx)
            streams.append(
                [ds.sample(idx[s : s + self.batch_size])
                 for s in range(0, len(idx), self.batch_size)]
            )
        n_rounds = max(len(s) for s in streams)
        for i in range(n_rounds):
            for s in streams:
                if i < len(s):
                    yield s[i]


class KolmogorovBuilder(Builder):
    """Builder over generated Kolmogorov HDF5 files
    (reference KolmogorovBuilder, builders/kolmogorov.py:30-68)."""

    name = "kolmogorov"

    def __init__(self, train_dataset, valid_dataset, test_dataset,
                 batch_size: int = 32, **kwargs):
        self.batch_size = batch_size
        self.train_dataset = train_dataset
        self.valid_dataset = valid_dataset
        self.test_dataset = test_dataset

    def _batches(self, dataset, shuffle=False, rng=None):
        if hasattr(dataset, "batches"):  # multi-resolution round-robin
            yield from dataset.batches(shuffle=shuffle, rng=rng)
            return
        n = len(dataset)
        idx = np.arange(n)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(idx)
        for start in range(0, n, self.batch_size):
            yield dataset.sample(idx[start : start + self.batch_size])

    def train_batches(self, rng=None):
        return self._batches(self.train_dataset, shuffle=True, rng=rng)

    def device_train_data(self, **kwargs):
        # Raises AttributeError for datasets without the device protocol
        # (e.g. KolmogorovMultiDataset) — the Trainer then falls back to
        # the host-streamed loop. kwargs (e.g. ``fields``) pass through to
        # the dataset.
        return self.train_dataset.device_train_data(**kwargs)

    def val_batches(self):
        return self._batches(self.valid_dataset)

    def test_batches(self):
        return self._batches(self.test_dataset)

    @property
    def batches_per_epoch(self):
        return -(-len(self.train_dataset) // self.batch_size)

    def sample_batch(self):
        if hasattr(self.train_dataset, "sample"):
            return self.train_dataset.sample(
                np.arange(min(self.batch_size, len(self.train_dataset)))
            )
        return next(iter(self.train_batches()))

    def inference_data(self):
        ds = self.test_dataset
        return {"data": ds.data, "vx": ds.vx, "vy": ds.vy}
