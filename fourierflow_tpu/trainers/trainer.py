"""Training harness: a thin epoch loop over jit'd routine step functions.

TPU-native redesign of the reference's two trainers (pytorch_lightning
Trainer for torch, the hand-rolled JAXTrainer at
reference:fourierflow/trainers/jax_trainer.py:20-128): the routine's
step functions are pure, jit-compiled once, and batches are device_put
with the batch axis sharded over the device mesh (data parallelism via
XLA collectives — no DDP process groups).
"""

import inspect
import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (
    make_mesh,
    make_sp_mesh,
    make_tp_mesh,
    replicated,
    shard_batch,
    tp_state_shardings,
)
from ..routines.base import Routine, TrainState
from ..utils.chunking import bounded_schedule, rate_to_chunk

logger = logging.getLogger(__name__)

__all__ = ["Trainer", "make_scan_epoch", "make_scan_epoch_indexed"]


def make_scan_epoch(
    routine: Routine,
    batch_size: int,
    accumulate: bool = False,
    chunk_steps: Optional[int] = None,
    mesh=None,
):
    """Build a jitted whole-epoch function: ``lax.scan`` over on-device
    shuffled batches of a device-resident dataset.

    TPU-native fast path: one XLA dispatch per epoch, zero per-batch
    host<->device traffic (the relay's per-transfer latency otherwise
    dwarfs the ~ms step compute — see memory notes). Batches are gathered
    from the full dataset with a permutation computed on device; the
    trailing partial batch is dropped (fixed shapes, no retraces).

    With ``mesh`` set (pure data parallelism), the dataset stays
    replicated across devices and each gathered batch is
    sharding-constrained onto the ``data`` axis, so every train step in
    the scan runs data-parallel with XLA's gradient all-reduce — the same
    single-dispatch epoch, now over all chips. (Replicating the dataset
    costs HBM per chip; datasets too large for that should use the
    per-batch loop instead.)
    """

    return make_scan_epoch_indexed(
        routine,
        batch_size,
        n_items=None,
        sample_fn=lambda data, idx: {k: v[idx] for k, v in data.items()},
        accumulate=accumulate,
        chunk_steps=chunk_steps,
        mesh=mesh,
    )


def make_scan_epoch_indexed(
    routine: Routine,
    batch_size: int,
    n_items: Optional[int],
    sample_fn,
    accumulate: bool = False,
    chunk_steps: Optional[int] = None,
    mesh=None,
):
    """Generalized device-resident epoch: batches are produced by
    ``sample_fn(data, idx)`` on device from an arbitrary container (e.g.
    the Kolmogorov datasets index (trajectory, time) pairs virtually —
    a dict of flat aligned arrays is just the identity-gather case).

    ``chunk_steps`` bounds the number of train steps in a single XLA
    dispatch. The axon relay kills the TPU worker when one dispatch runs
    longer than ~1 minute (measured: a 2128-step/43 s epoch survives, an
    83 s one reproducibly dies with "TPU worker process crashed", and a
    faulted worker stays wedged for many minutes), so long epochs must be
    split. Chunks re-derive the SAME epoch permutation from the epoch key
    on device and slice out their range — no eager host work (eager
    dispatches are pathologically slow on the relay), a handful of
    compiled chunk lengths total, and per-step RNG/noise keys stay keyed
    to the global step exactly as in the single-dispatch path.

    ``chunk_steps='auto'`` self-calibrates: the first epoch starts with a
    small chunk (compile + run, untimed), times the second dispatch of
    the same size, and sizes subsequent chunks to target ~30 s per
    dispatch. That costs at most ~4 distinct compiled lengths per run and
    removes the need to know the model's step time up front.
    """

    # Calibration-chunk steps: small enough that even a slow model's probe
    # dispatch stays far below the ~1 min kill threshold (a 512² grid runs
    # ~0.5 s/step); the dispatch overhead folded into the timing only
    # makes the chosen chunk conservative.
    AUTO_PROBE = 32
    AUTO_TARGET_S = 30.0

    def _constrain(batch):
        # Data-parallel scan epochs: pin each gathered batch's leading
        # axis onto the mesh's 'data' axis so the step's compute (and
        # XLA's gradient all-reduce) runs sharded; leaves whose batch dim
        # doesn't divide stay replicated.
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape["data"]
        spec = NamedSharding(mesh, P("data"))

        def c(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
                return jax.lax.with_sharding_constraint(x, spec)
            return x

        return jax.tree.map(c, batch)

    def chunk_fn(state, data, kperm, kstep, start, size):
        # size is static (two distinct values per epoch at most).
        n = n_items if n_items is not None else len(next(iter(data.values())))
        n_batches = n // batch_size
        perm = jax.random.permutation(kperm, n)[: n_batches * batch_size]
        perm = perm.reshape(n_batches, batch_size)
        perm = jax.lax.dynamic_slice_in_dim(perm, start, size, axis=0)

        def body(state, idx):
            batch = _constrain(sample_fn(data, idx))
            if accumulate:
                return routine.accumulate_step(state, batch), {}
            step_key = jax.random.fold_in(kstep, state.step)
            return routine.train_step(state, batch, step_key)

        state, metrics = jax.lax.scan(body, state, perm)
        mean_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        return state, mean_metrics

    chunk_jit = jax.jit(chunk_fn, donate_argnums=(0,), static_argnums=(5,))
    auto = chunk_steps == "auto"
    state_box = {"rate": None}  # measured train steps/s (auto mode)

    def _sync(state, metrics):
        """Force completion of the last dispatch (block_until_ready lies on
        the relay; only a value fetch guarantees the compute finished)."""
        if metrics:
            float(next(iter(metrics.values())))
        else:
            # state.step is an int scalar; float() fetches it directly
            # (avoid eager cast ops — eager dispatch is slow on the relay).
            float(state.step)

    def _schedule(n_batches):
        """Chunk sizes covering n_batches with few distinct values. With
        no measured rate (epoch too small for an equal-size second probe,
        whose timing would otherwise include a fresh compile), fall back
        to probe-size chunks — always safely short."""
        if auto:
            rate = state_box["rate"]
            target = (
                rate_to_chunk(rate, AUTO_TARGET_S, minimum=16)
                if rate is not None
                else AUTO_PROBE
            )
        else:
            target = chunk_steps
        return bounded_schedule(n_batches, target)

    def epoch_fn(state, data, key):
        n = n_items if n_items is not None else len(next(iter(data.values())))
        n_batches = n // batch_size
        kperm, kstep = jax.random.split(key)
        if not chunk_steps or (not auto and n_batches <= chunk_steps):
            return chunk_jit(state, data, kperm, kstep, 0, n_batches)

        pos = 0
        parts = []

        def run(state, size):
            nonlocal pos
            state, m = chunk_jit(state, data, kperm, kstep, pos, size)
            parts.append((m, size))
            pos += size
            return state, m

        if auto and state_box["rate"] is None and n_batches >= 2 * AUTO_PROBE:
            # Two equal-size probes: the first pays the compile, the
            # second is timed clean (an unequal second probe would time a
            # fresh compile for its own static size — rate garbage).
            state, m = run(state, AUTO_PROBE)
            _sync(state, m)
            t0 = time.time()
            state, m = run(state, AUTO_PROBE)
            _sync(state, m)
            state_box["rate"] = AUTO_PROBE / max(time.time() - t0, 1e-3)
        if pos < n_batches:
            for size in _schedule(n_batches - pos):
                state, _ = run(state, size)

        if not parts or not parts[0][0]:
            return state, {}
        # Weighted host-side merge; fetches happen only here, after every
        # chunk has been dispatched.
        merged = {
            k: np.average(
                [float(m[k]) for m, _ in parts], weights=[w for _, w in parts]
            )
            for k in parts[0][0]
        }
        return state, merged

    return epoch_fn


def _state_is_sharded(state) -> bool:
    """True when any leaf of ``state`` carries a non-fully-replicated
    committed sharding (i.e. a caller already laid the state out)."""
    for leaf in jax.tree.leaves(state):
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not getattr(sh, "is_fully_replicated", True):
            return True
    return False


def _tree_nbytes(tree) -> int:
    """Total bytes of the array leaves of a pytree (host or device)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        nb = getattr(leaf, "nbytes", None)
        if nb is None and hasattr(leaf, "shape"):
            nb = int(np.prod(leaf.shape)) * getattr(
                getattr(leaf, "dtype", None), "itemsize", 4
            )
        total += int(nb or 0)
    return total


def _estimate_activation_bytes(model, sample_batch) -> Optional[int]:
    """Rough per-step saved-activation footprint of an F-FNO-family block
    under standard autodiff (no remat): ~1.3 saved layer-input-sized
    tensors per layer (``n_layers * batch * cells * width * 1.3 *
    itemsize``).

    The coefficient is calibrated to the measured compile-OOM boundary on
    a 16 GB v5e (RESULTS remat table: the 24-layer bf16 256² step trains
    unremat at batch 48 ≈ 12.6 GB under this accounting and OOMs at batch
    64 ≈ 16.8 GB) — the linear spectral/FF chain needs little beyond each
    layer's input (matmul backward reads weights + cotangents; the fused
    FF recomputes its hidden). Returns None for models that don't expose
    the F-FNO block attributes."""
    n_layers = getattr(model, "n_layers", None)
    width = getattr(model, "width", None)
    if not (n_layers and width):
        return None
    x = sample_batch.get("x") if hasattr(sample_batch, "get") else None
    if x is None or getattr(x, "ndim", 0) < 3:
        return None
    batch = int(x.shape[0])
    cells = int(np.prod(x.shape[1:-1]))
    itemsize = 2 if getattr(model, "dtype", None) is not None else 4
    return int(int(n_layers) * batch * cells * int(width) * 1.3 * itemsize)


def _device_hbm_bytes() -> int:
    """Per-device memory budget: live stats when the backend exposes them,
    else the v5e's 16 GB."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 - backends without memory_stats
        pass
    return 16 << 30


def _batch_count(batch) -> int:
    """Leading-dim size of a batch that may be a dict of arrays, a
    (inputs, outputs) tuple (the learned-interpolator loader), or a bare
    array."""
    if isinstance(batch, dict):
        return _batch_count(next(iter(batch.values())))
    if isinstance(batch, (tuple, list)):
        return _batch_count(batch[0])
    return len(batch)


def _weighted_merge(metric_list):
    """Weighted epoch-end aggregation (jax_trainer.py:84-102)."""
    if not metric_list:
        return {}
    total = sum(w for _, w in metric_list)
    out = {}
    for key in metric_list[0][0]:
        vals = [np.asarray(m[key]) * w for m, w in metric_list]
        out[key] = sum(vals) / total
    return out


class Trainer:
    def __init__(
        self,
        max_epochs: int = 1,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[int] = None,
        callbacks: Sequence = (),
        seed: int = 0,
        data_parallel: bool = True,
        log_every_n_steps: int = 100,
        check_val_every_n_epoch: int = 1,
        mesh=None,
        fast_loop: bool = True,
        chunk_steps="auto",
        tensor_parallel: int = 1,
        spatial_parallel: int = 1,
        auto_remat: bool = True,
    ):
        self.chunk_steps = chunk_steps
        self.max_epochs = max_epochs
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.callbacks = list(callbacks)
        self.seed = seed
        self.log_every_n_steps = log_every_n_steps
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.fast_loop = fast_loop
        self.auto_remat = auto_remat
        self.mesh = mesh
        # Meshes the Trainer builds itself (below) are known-safe for the
        # scanned-epoch DP fast path; an explicitly passed mesh may carry
        # caller-applied state shardings the fast path must not clobber.
        self._own_mesh = mesh is None
        self.tensor_parallel = tensor_parallel
        self.spatial_parallel = spatial_parallel
        if tensor_parallel > 1 and spatial_parallel > 1:
            raise ValueError(
                "tensor_parallel and spatial_parallel cannot be combined; "
                "pick one (each already composes with the data axis)"
            )
        if mesh is None and tensor_parallel > 1:
            # data x model mesh: batch on 'data', F-FNO channel dims on
            # 'model' (parallel/mesh.py::tp_state_shardings).
            self.mesh = make_tp_mesh(tensor_parallel)
        elif mesh is None and spatial_parallel > 1:
            # data x spatial mesh: batch on 'data', the grid's first
            # spatial dim on 'spatial' — the sequence-parallel analog for
            # grids too large for one chip's HBM (parallel/mesh.py::
            # make_sp_mesh; params/optimizer state stay replicated).
            self.mesh = make_sp_mesh(spatial_parallel)
        elif mesh is None and data_parallel and len(jax.devices()) > 1:
            self.mesh = make_mesh()
        if self.mesh is not None and fast_loop and (
            tensor_parallel > 1 or spatial_parallel > 1
        ):
            # The device-resident scanned-epoch fast path shards the
            # batch axis only; tensor/spatial-parallel runs go through
            # the per-batch loop (pure-DP meshes keep the fast path —
            # see make_scan_epoch's mesh support).
            logger.info(
                "tp/sp mesh %s set: device-resident scan-epoch fast path "
                "disabled, using the per-batch loop", dict(self.mesh.shape)
            )
        self.logs = {}
        self.current_epoch = 0
        self.global_step = 0

    # ------------------------------------------------------------------
    def _put(self, batch):
        if self.mesh is not None:
            spatial = "spatial" if self.spatial_parallel > 1 else None
            return shard_batch(batch, self.mesh, spatial_axis=spatial)
        return batch

    def _hook(self, name, routine=None, state=None, allow_replace=False):
        for cb in self.callbacks:
            fn = getattr(cb, name, None)
            if fn:
                ret = fn(self, routine, state)
                if allow_replace and ret is not None:
                    state = ret
        return state

    def _maybe_enable_remat(self, routine, builder):
        """HBM-cliff guard: estimate the step's saved-activation footprint
        and flip the model to per-layer remat (same parameter tree,
        models/ffno_grid_2d.py) before it hits the compile-OOM boundary.

        Trigger calibration (measured on a 16 GB v5e, RESULTS
        batch-scaling + remat tables): 24-layer bf16 256² trains unremat
        at batch 48 and compile-OOMs at 64, so the per-layer saved set is
        ~1 layer input per cell; the guard fires at 60% of device memory
        under that accounting. Remat costs 15-35% per step and measured
        strictly SLOWER at every sub-boundary batch probed (including the
        64² batch-76 scheduling cliff, scripts/probe_remat_cliff.py), so
        it is NOT enabled below the boundary."""
        model = getattr(routine, "model", None)
        if model is None or getattr(model, "remat", None) is not False:
            return
        try:
            sample = builder.sample_batch()
        except Exception:  # noqa: BLE001 - builders without sample_batch
            return
        est = _estimate_activation_bytes(model, sample)
        if est is None:
            return
        # Activations shard with the batch (data) and the grid (spatial).
        if self.mesh is not None:
            for ax in ("data", "spatial"):
                if ax in self.mesh.shape:
                    est //= self.mesh.shape[ax]
        budget = 0.6 * _device_hbm_bytes()
        if est > budget:
            logger.warning(
                "estimated saved-activation footprint ~%.1f GB exceeds "
                "~%.1f GB of per-device HBM budget: enabling per-layer "
                "rematerialization (+15-35%% step cost, unchanged parameter "
                "tree; set Trainer(auto_remat=False) or "
                "routine.conv.remat explicitly to override)",
                est / 2**30, budget / 2**30,
            )
            routine.model = model.clone(remat=True)

    # ------------------------------------------------------------------
    def fit(self, routine: Routine, builder, state: Optional[TrainState] = None):
        rng = np.random.default_rng(self.seed)
        base_key = jax.random.PRNGKey(self.seed)
        if self.auto_remat:
            self._maybe_enable_remat(routine, builder)

        if state is None:
            state = routine.init(jax.random.PRNGKey(self.seed), builder.sample_batch())
        if self.tensor_parallel > 1 and self.mesh is not None:
            # Distribute params + optimizer state over the 'model' axis;
            # jit'd steps then run tensor-parallel with XLA's collectives.
            state = jax.device_put(state, tp_state_shardings(state, self.mesh))
        logger.info("n_params = %d", routine.n_params(state))
        self.logs["n_params"] = routine.n_params(state)

        self._hook("on_fit_start", routine, state)
        normalizes = getattr(routine, "should_normalize", False)

        # Pure-DP meshes keep the device-resident scan-epoch fast path:
        # the dataset is replicated per chip and each scanned batch is
        # sharding-constrained onto the 'data' axis. TP/SP meshes (and
        # batch sizes the data axis doesn't divide) use the per-batch
        # loop.
        fast_dp = (
            self.mesh is not None
            and self.tensor_parallel == 1
            and self.spatial_parallel == 1
            and "data" in self.mesh.axis_names
            # A caller-passed mesh qualifies only when the incoming state
            # carries no committed shardings: the fast path replicates the
            # state, which would silently undo a caller-applied layout.
            and (self._own_mesh or not _state_is_sharded(state))
            and getattr(builder, "batch_size", 0) % self.mesh.shape["data"] == 0
        )
        fast_capable = self.mesh is None or fast_dp

        device_proto = None
        if self.fast_loop and fast_capable and self.limit_train_batches is None:
            try:
                # Indexed device-resident dataset (virtual (traj, time)
                # items); underlying datasets without the protocol (e.g.
                # the multi-resolution round-robin) raise AttributeError.
                proto_fn = getattr(builder, "device_train_data", None)
                if proto_fn is None:
                    device_proto = None
                else:
                    # Routines that rebuild everything from a subset of the
                    # arrays (e.g. Markov recovers velocities spectrally
                    # from vorticity) declare `device_data_fields` so only
                    # those arrays are uploaded over the relay.
                    fields = getattr(routine, "device_data_fields", None)
                    # Signature check instead of try/except TypeError: a
                    # TypeError raised INSIDE the dataset would otherwise be
                    # swallowed and silently fall back to uploading every
                    # field, defeating the vorticity-only transfer path.
                    takes_fields = False
                    if fields:
                        try:
                            sig = inspect.signature(proto_fn)
                            takes_fields = "fields" in sig.parameters or any(
                                p.kind is inspect.Parameter.VAR_KEYWORD
                                for p in sig.parameters.values()
                            )
                        except (TypeError, ValueError):
                            takes_fields = False
                    device_proto = (
                        proto_fn(fields=fields) if takes_fields else proto_fn()
                    )
            except AttributeError:
                device_proto = None
        use_fast = (
            self.fast_loop
            and fast_capable
            and self.limit_train_batches is None
            and (hasattr(builder, "train_data") or device_proto is not None)
        )
        scan_mesh = self.mesh if fast_dp else None
        if use_fast and scan_mesh is not None:
            # Multichip DP replicates the whole train set in every chip's
            # HBM (make_scan_epoch docstring). Guard against datasets that
            # won't fit: estimate bytes against the per-device budget and
            # fall back to the streaming per-batch loop when too large.
            est = _tree_nbytes(
                device_proto[0] if device_proto is not None
                else builder.train_data
            )
            budget = 0.6 * _device_hbm_bytes()
            if est > budget:
                logger.warning(
                    "dataset ~%.1f GB exceeds the per-device replication "
                    "budget (~%.1f GB of HBM): disabling the scanned-epoch "
                    "fast path, streaming batches instead (set "
                    "fast_loop=False to silence this)",
                    est / 2**30, budget / 2**30,
                )
                use_fast = False
                device_proto = None
                scan_mesh = None
        if use_fast and device_proto is not None:
            device_data, sample_fn, n_items = device_proto
            device_data = jax.tree.map(jnp.asarray, device_data)
            train_epoch = make_scan_epoch_indexed(
                routine, builder.batch_size, n_items, sample_fn,
                accumulate=False, chunk_steps=self.chunk_steps,
                mesh=scan_mesh)
            acc_epoch = make_scan_epoch_indexed(
                routine, builder.batch_size, n_items, sample_fn,
                accumulate=True, chunk_steps=self.chunk_steps,
                mesh=scan_mesh)
            fast_n_items = n_items
        elif use_fast:
            # Device-resident dataset + one jitted scan per epoch.
            device_data = {k: jnp.asarray(v) for k, v in builder.train_data.items()}
            train_epoch = make_scan_epoch(routine, builder.batch_size,
                                          accumulate=False, chunk_steps=self.chunk_steps,
                                          mesh=scan_mesh)
            acc_epoch = make_scan_epoch(routine, builder.batch_size,
                                        accumulate=True, chunk_steps=self.chunk_steps,
                                        mesh=scan_mesh)
            fast_n_items = len(next(iter(builder.train_data.values())))
        else:
            train_step = jax.jit(routine.train_step, donate_argnums=(0,))
            acc_step = jax.jit(routine.accumulate_step, donate_argnums=(0,))

        if use_fast and scan_mesh is not None:
            # Dataset + state live replicated on every mesh device; the
            # scan body reshards each gathered batch onto 'data'.
            repl = replicated(scan_mesh)
            device_data = jax.device_put(device_data, repl)
            state = jax.device_put(state, repl)

        for epoch in range(self.max_epochs):
            self.current_epoch = epoch
            t0 = time.time()
            train_metrics = []
            epoch_key = jax.random.fold_in(base_key, epoch)

            if use_fast:
                if epoch == 0 and normalizes:
                    state, _ = acc_epoch(state, device_data, epoch_key)
                else:
                    state, metrics = train_epoch(state, device_data, epoch_key)
                    n_b = fast_n_items // builder.batch_size
                    self.global_step += n_b
                    scalars = {k: float(v) for k, v in metrics.items()}
                    # NaN guard (reference grid_2d_markov.py:397-400).
                    for k, v in scalars.items():
                        if v != v:
                            raise FloatingPointError(
                                f"{k} is NaN at epoch {epoch} (step {self.global_step})"
                            )
                    self.logs.update(scalars)
            else:
                for i, batch in enumerate(builder.train_batches(rng)):
                    if self.limit_train_batches and i >= self.limit_train_batches:
                        break
                    batch = self._put(batch)
                    if epoch == 0 and normalizes:
                        # Epoch 0 only gathers normalizer statistics
                        # (grid_2d_markov.py:374-390).
                        state = acc_step(state, batch)
                    else:
                        step_key = jax.random.fold_in(base_key, self.global_step)
                        state, metrics = train_step(state, batch, step_key)
                        self.global_step += 1
                        train_metrics.append((metrics, _batch_count(batch)))
                        # Progress markers for long per-batch runs: the
                        # first step's value fetch marks "compile done"
                        # (the relay gives no compile progress signal),
                        # then a heartbeat every 500 steps. The marker is
                        # gated on the first step OVERALL — i==0 of later
                        # epochs hits the jit cache and compiles nothing.
                        if i == 0 or (i + 1) % 500 == 0:
                            loss = next(
                                (float(v) for k, v in metrics.items()
                                 if k.endswith("loss")), float("nan"))
                            logger.info(
                                "epoch %d step %d (global %d): loss %.4f"
                                + (" [first step: compile done]"
                                   if self.global_step == 1 else ""),
                                epoch, i + 1, self.global_step, loss)

            if train_metrics:
                merged = _weighted_merge(
                    [({k: float(v) for k, v in m.items()}, w) for m, w in train_metrics]
                )
                self.logs.update(merged)

            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                val_logs = self.evaluate(routine, builder, state, split="valid")
                self.logs.update(val_logs)
                # With sparse validation (check_val_every_n_epoch > 1) the
                # logs keep the last valid_* values between validations;
                # valid_epoch records which epoch they actually came from
                # so downstream harvesting never misattributes them.
                self.logs["valid_epoch"] = epoch

            self.logs["epoch"] = epoch
            self.logs["epoch_time"] = time.time() - t0
            state = self._hook("on_epoch_end", routine, state, allow_replace=True)

        state = self._hook("on_fit_end", routine, state, allow_replace=True)
        return state

    # ------------------------------------------------------------------
    def evaluate(self, routine: Routine, builder, state: TrainState, split: str = "valid"):
        # Jit the valid step ONCE per routine: a fresh jax.jit wrapper per
        # evaluate() call starts with an empty trace cache, so every epoch
        # re-traced and re-issued a remote compile over the relay (tens of
        # seconds per validation, and a window for relay faults mid-fit).
        if getattr(self, "_valid_step_routine", None) is not routine:
            self._valid_step_fn = jax.jit(routine.valid_step)
            self._valid_step_routine = routine
        valid_step = self._valid_step_fn

        # Device-resident evaluation set: builders exposing plain
        # valid_data/test_data dicts get their arrays uploaded ONCE and
        # sliced on device per batch — re-uploading the whole eval set
        # every epoch costs tens of seconds over the relay.
        batches = None
        pure_dp = self.tensor_parallel == 1 and self.spatial_parallel == 1
        if self.fast_loop and (self.mesh is None or pure_dp):
            data = getattr(builder, f"{split}_data", None)
            if isinstance(data, dict) and all(
                isinstance(v, np.ndarray) for v in data.values()
            ):
                cache = getattr(self, "_eval_device_cache", None)
                if cache is None:
                    cache = self._eval_device_cache = {}
                # Key by the builder object (not id()): ids can be reused
                # after GC, and the strong ref pins the arrays' owner for
                # the Trainer's lifetime.
                key = (builder, split)
                if key not in cache:
                    arrs = jax.tree.map(jnp.asarray, data)
                    if self.mesh is not None:
                        # Pure-DP mesh: cache the eval set replicated per
                        # chip. Eval compute runs replicated (redundant
                        # but communication-free) — still strictly better
                        # than re-uploading every epoch over the relay.
                        arrs = jax.device_put(arrs, replicated(self.mesh))
                    cache[key] = arrs
                dd = cache[key]
                n_items = len(next(iter(dd.values())))
                bs = builder.batch_size
                batches = (
                    {k: v[s : s + bs] for k, v in dd.items()}
                    for s in range(0, n_items, bs)
                )
        if batches is None:
            batches = (
                builder.val_batches() if split == "valid" else builder.test_batches()
            )
            batches = (self._put(b) for b in batches)
        metric_list = []
        for i, batch in enumerate(batches):
            if self.limit_val_batches and i >= self.limit_val_batches:
                break
            n = _batch_count(batch)
            metrics = valid_step(state, batch)
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            metric_list.append((metrics, n))
        merged = _weighted_merge(metric_list)
        out = {}
        for k, v in merged.items():
            if np.ndim(v) == 0:
                out[f"{split}_{k}"] = float(v)
            else:
                out[f"{split}_{k}"] = v
        return out

    def test(self, routine: Routine, builder, state: TrainState):
        logs = self.evaluate(routine, builder, state, split="test")
        self.logs.update(logs)
        self._hook("on_test_end", routine, state)
        return logs
