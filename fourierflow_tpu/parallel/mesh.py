"""Device-mesh scaling utilities.

The reference's only multi-device story is a vestigial Lightning DDPPlugin
(reference:fourierflow/commands/train.py:83-84, unused in all shipped
configs). Here scaling is TPU-native: a ``jax.sharding.Mesh`` with a
``data`` axis (pure data parallelism — gradient all-reduce rides ICI via
XLA collectives inserted by pjit) and an optional ``spatial`` axis used by
the large-grid data-generation path.

Design note (SURVEY.md §2.7): F-FNO models are small (<=70M params), so
params default to replicated; batch is sharded on ``data``. The separable
F-FNO structure makes spatial sharding natural for >=1024^2 grids: each
branch FFTs along a single axis, so sharding the *other* axis keeps
transforms device-local. For wide configs, ``tp_state_shardings`` adds
Megatron-style tensor parallelism over a ``model`` axis (FF hidden dims
and spectral output channels sharded; optimizer state stays distributed).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_tp_mesh",
    "make_sp_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "tp_state_shardings",
]


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_tp_mesh(tensor_parallel: int, n_devices: Optional[int] = None) -> Mesh:
    """data x model mesh: the model axis carries ``tensor_parallel``
    shards, the data axis everything else. Devices that don't fill a
    whole data row are dropped (with a log line)."""
    import logging

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) < tensor_parallel:
        raise ValueError(
            f"tensor_parallel={tensor_parallel} needs at least that many "
            f"devices; have {len(devices)}"
        )
    n = (len(devices) // tensor_parallel) * tensor_parallel
    if n < len(devices):
        logging.getLogger(__name__).warning(
            "make_tp_mesh: dropping %d of %d devices (not divisible by "
            "tensor_parallel=%d)", len(devices) - n, len(devices),
            tensor_parallel,
        )
    return Mesh(
        np.asarray(devices[:n]).reshape(-1, tensor_parallel),
        ("data", "model"),
    )


def make_sp_mesh(spatial_parallel: int, n_devices: Optional[int] = None) -> Mesh:
    """data x spatial mesh: the spatial axis carries ``spatial_parallel``
    shards of the grid's first spatial dimension, the data axis the rest.

    The separable F-FNO structure makes this the sequence-parallel analog
    (SURVEY.md §2.7): each spectral branch transforms along ONE axis, so
    with the x-axis sharded the y-branch's transform is device-local and
    XLA inserts the transpose-style collectives only around the x-branch.
    Devices that don't fill a whole data row are dropped (with a log line),
    mirroring ``make_tp_mesh``.
    """
    import logging

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) < spatial_parallel:
        raise ValueError(
            f"spatial_parallel={spatial_parallel} needs at least that many "
            f"devices; have {len(devices)}"
        )
    n = (len(devices) // spatial_parallel) * spatial_parallel
    if n < len(devices):
        logging.getLogger(__name__).warning(
            "make_sp_mesh: dropping %d of %d devices (not divisible by "
            "spatial_parallel=%d)", len(devices) - n, len(devices),
            spatial_parallel,
        )
    return Mesh(
        np.asarray(devices[:n]).reshape(-1, spatial_parallel),
        ("data", "spatial"),
    )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_spec(path: str, shape, axis: str):
    """PartitionSpec for one F-FNO parameter leaf under Megatron-style
    tensor parallelism on mesh axis ``axis``.

    Sharded leaves:
    - feed-forward kernels: the expansion matmul [C, factor*C] splits by
      output column, the contraction [factor*C, C] by input row, so the
      [rows, factor*C] hidden activations stay sharded end to end and
      GSPMD inserts one all-reduce per FF (the classic Megatron MLP cut);
    - spectral mixing weights [C_in, C_out, M, 2]: split by output
      channel — ops/spectral.py's per-mode bmm contracts over C_in, so
      the mixing output is column-sharded with no communication.
    Everything else (heads, biases, weight-norm g, normalizer, optimizer
    scalars) is replicated. Matching is by path suffix, so the same rule
    covers params and their Adam mu/nu clones inside opt_state.
    """
    leaf = path.rsplit("/", 1)[-1] if "/" in path else path
    if "fourier_weight" in leaf and len(shape) == 4:
        # factorized family: [C_in, C_out, M, 2]
        return P(None, axis, None, None)
    if "fourier_weight" in leaf and len(shape) == 5:
        # Zongyi dense family: [C_in, C_out, M, M, 2]
        return P(None, axis, None, None, None)
    if "_ff" in path and leaf == "kernel" and len(shape) == 2:
        if shape[1] > shape[0]:  # expansion C -> factor*C
            return P(None, axis)
        if shape[0] > shape[1]:  # contraction factor*C -> C
            return P(axis, None)
    return P()


def tp_state_shardings(state, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree (same treedef as ``state``) for a tensor-
    parallel TrainState: F-FNO channel dims sharded over mesh axis
    ``axis`` per ``_tp_spec``, everything else replicated.

    The reference has no TP (SURVEY.md §2.7); on TPU the width dimension
    shards naturally because every hot matmul contracts or produces it.
    Composes with the ``data`` axis: put the batch on ``data`` and the
    state through these shardings, then jit the usual train step — XLA
    emits the gradient all-reduce (data) and the Megatron pair (model).
    """
    def _name(entry):
        for attr in ("key", "name", "idx"):
            if hasattr(entry, attr):
                return str(getattr(entry, attr))
        return str(entry)

    n_model = mesh.shape[axis]

    def _valid(spec, shape):
        # Downgrade to replicated when a sharded dim doesn't divide the
        # model axis (e.g. odd widths on a large mesh) — a NamedSharding
        # with a non-dividing dim would make device_put raise.
        for dim, name in zip(shape, tuple(spec) + (None,) * len(shape)):
            if name == axis and dim % n_model != 0:
                return P()
        return spec

    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    shardings = []
    for path, leaf in leaves:
        shape = np.shape(leaf)
        spec = _tp_spec("/".join(_name(e) for e in path), shape, axis)
        shardings.append(NamedSharding(mesh, _valid(spec, shape)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_batch(batch, mesh: Mesh, axis: str = "data",
                spatial_axis: Optional[str] = None):
    """device_put a dict of host arrays with the batch axis sharded over
    the mesh's ``axis``. Arrays whose batch dim doesn't divide that axis
    are replicated instead (e.g. scalars/metadata). Divisibility is
    against the named axis size, not the whole mesh: on a 2D
    data x model mesh only the data extent matters.

    With ``spatial_axis`` set (a mesh axis name), grid-shaped arrays
    (``ndim >= 3``, i.e. [B, X, Y, ...]) additionally shard their dim 1 —
    the first grid dimension — over that axis when it divides; flat
    per-sample leaves (e.g. [B, k] metadata) keep the batch-only sharding.
    A grid whose batch dim does NOT divide the data axis (the primary SP
    use case: batch 1-2 at >=1024^2 grids) still shards spatially via
    ``P(None, spatial_axis)`` — full replication would defeat the HBM
    purpose of spatial parallelism. Large arrays that do end up fully
    replicated are logged."""
    import logging

    n = mesh.shape[axis]
    nsp = mesh.shape[spatial_axis] if spatial_axis is not None else 1
    sharded = batch_sharding(mesh, axis)
    sp_sharded = (
        NamedSharding(mesh, P(axis, spatial_axis))
        if spatial_axis is not None
        else sharded
    )
    repl = replicated(mesh)

    def put(x):
        if not (hasattr(x, "shape") and x.ndim >= 1):
            return jax.device_put(x, repl)
        batch_ok = x.shape[0] % n == 0
        # Grid batches are [B, X, Y, ...]; require ndim >= 3 so flat
        # per-sample leaves don't pick up a spatial spec (layout-safe but
        # it triggers needless reshard collectives inside the step).
        grid_ok = (
            spatial_axis is not None and x.ndim >= 3 and x.shape[1] % nsp == 0
        )
        if batch_ok and grid_ok:
            return jax.device_put(x, sp_sharded)
        if batch_ok:
            return jax.device_put(x, sharded)
        if grid_ok:
            return jax.device_put(x, NamedSharding(mesh, P(None, spatial_axis)))
        nbytes = getattr(x, "nbytes", 0) or (
            int(np.prod(x.shape)) * getattr(getattr(x, "dtype", None), "itemsize", 4)
        )
        if nbytes > (8 << 20):
            logging.getLogger(__name__).warning(
                "shard_batch: replicating a %.1f MB array of shape %s on "
                "every device (batch dim %d does not divide the '%s' axis "
                "size %d%s)",
                nbytes / 2**20, x.shape, x.shape[0], axis, n,
                f"; dim 1 {x.shape[1]} does not divide the '{spatial_axis}' "
                f"axis size {nsp}" if spatial_axis is not None and x.ndim >= 2
                else "",
            )
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)
