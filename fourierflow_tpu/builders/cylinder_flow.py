"""Cylinder-flow builder for MeshGraphNets (DeepMind meshgraphnets data,
converted from TFRecord to HDF5 — see commands/convert.py).

TPU-native equivalent of reference:fourierflow/builders/cylinder_flow.py:
training items are per-(trajectory, time) one-step pairs; eval items are
whole trajectories. Meshes are max-size padded at conversion time (cells
with -1, node arrays with NaN), giving static shapes for jit.
"""

import os
from typing import Dict, Optional

import numpy as np

from .base import Builder, iterate_batches, num_batches

__all__ = ["CylinderFlowBuilder"]

_KEYS = ("cells", "mesh_pos", "node_type", "velocity", "target_velocity",
         "n_cells", "n_nodes")


class _LazySplit:
    """Holds one HDF5 split in memory as numpy arrays."""

    def __init__(self, grp):
        for k in _KEYS:
            setattr(self, k, np.asarray(grp[k]))


class CylinderFlowBuilder(Builder):
    name = "cylinder_flow"

    def __init__(self, path: str, batch_size: int = 1, **kwargs):
        self.batch_size = batch_size
        import h5py

        data_path = os.path.expandvars(os.path.expanduser(path))
        with h5py.File(data_path, "r") as h5f:
            self.train = _LazySplit(h5f["train"])
            self.valid = _LazySplit(h5f["valid"])
            self.test = _LazySplit(h5f["test"])

    # Training: (b, t) one-step items (cylinder_flow.py:59-88).
    def _train_arrays(self) -> Dict[str, np.ndarray]:
        tr = self.train
        B, T = tr.velocity.shape[:2]
        b_idx = np.repeat(np.arange(B), T)
        t_idx = np.tile(np.arange(T), B)
        return {
            "cells": tr.cells[b_idx],
            "mesh_pos": tr.mesh_pos[b_idx],
            "node_type": tr.node_type[b_idx],
            "velocity": tr.velocity[b_idx, t_idx],
            "target_velocity": tr.target_velocity[b_idx, t_idx],
        }

    @staticmethod
    def _eval_arrays(sp) -> Dict[str, np.ndarray]:
        return {
            "cells": sp.cells,
            "mesh_pos": sp.mesh_pos,
            "node_type": sp.node_type,
            "velocity": sp.velocity,  # [b, t, n, 2]
            "target_velocity": sp.target_velocity,
        }

    def train_batches(self, rng: Optional[np.random.Generator] = None):
        return iterate_batches(
            self._train_arrays(), self.batch_size, shuffle=True, rng=rng
        )

    def val_batches(self):
        return iterate_batches(self._eval_arrays(self.valid), self.batch_size)

    def test_batches(self):
        return iterate_batches(self._eval_arrays(self.test), self.batch_size)

    @property
    def batches_per_epoch(self) -> int:
        B, T = self.train.velocity.shape[:2]
        return num_batches(B * T, self.batch_size)

    def sample_batch(self):
        return next(self.train_batches())
