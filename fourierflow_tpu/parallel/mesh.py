"""Device-mesh scaling utilities.

The reference's only multi-device story is a vestigial Lightning DDPPlugin
(reference:fourierflow/commands/train.py:83-84, unused in all shipped
configs). Here scaling is TPU-native: a ``jax.sharding.Mesh`` with a
``data`` axis (pure data parallelism — gradient all-reduce rides ICI via
XLA collectives inserted by pjit) and an optional ``spatial`` axis used by
the large-grid data-generation path.

Design note (SURVEY.md §2.7): F-FNO models are small (<=70M params), so
params stay replicated; batch is sharded on ``data``. The separable F-FNO
structure makes spatial sharding natural for >=1024^2 grids: each branch
FFTs along a single axis, so sharding the *other* axis keeps transforms
device-local.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a dict of host arrays with the batch axis sharded over
    the mesh. Arrays whose batch dim doesn't divide the mesh are
    replicated instead (e.g. scalars/metadata)."""
    n = mesh.devices.size
    sharded = batch_sharding(mesh, axis)
    repl = replicated(mesh)

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)
