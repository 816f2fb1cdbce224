"""Contextual Navier-Stokes builder (torus_vis / torus_vis_force h5): per
sample viscosity mu and constant or time-varying forcing f, one-step
training pairs with stride k
(reference:fourierflow/builders/ns_contextual.py)."""

import os

import h5py
import numpy as np

from .base import Builder

__all__ = ["NSContextualBuilder"]


class NSContextualBuilder(Builder):
    name = "ns_contextual"

    def __init__(self, data_path: str, ssr: int = 1, k: int = 1, batch_size: int = 32, **kwargs):
        self.batch_size = batch_size
        data_path = os.path.expandvars(data_path)
        with h5py.File(data_path, "r") as h5f:
            self.train_data = self._training_pairs(h5f["train"], ssr, k)
            self.valid_data = self._eval_set(h5f["valid"], ssr, k)
            self.test_data = self._eval_set(h5f["test"], ssr, k)

    @staticmethod
    def _training_pairs(split, ssr, k):
        """All (t, t+k) pairs flattened (ns_contextual.py:45-72)."""
        u = split["u"][:, ::ssr, ::ssr]  # [B, X, Y, T]
        f = split["f"][...]
        mu = split["mu"][...]
        constant_force = f.ndim == 3
        if not constant_force:
            f = f[:, ::ssr, ::ssr]
        else:
            f = f[:, ::ssr, ::ssr]
        b, sx, sy, t_total = u.shape
        t_pairs = t_total - k

        xs = np.moveaxis(u[..., :t_pairs], -1, 1).reshape(-1, sx, sy, 1)
        ys = np.moveaxis(u[..., k:], -1, 1).reshape(-1, sx, sy, 1)
        mus = np.repeat(mu, t_pairs).astype(np.float32)
        if constant_force:
            fs = np.repeat(f[:, None], t_pairs, axis=1).reshape(-1, sx, sy)
        else:
            # f at time t + k for pair t (ns_contextual.py:63-66)
            fsel = f[..., k:]
            fs = np.moveaxis(fsel, -1, 1).reshape(-1, sx, sy)
        return {"x": xs.astype(np.float32), "y": ys.astype(np.float32),
                "mu": mus, "f": fs.astype(np.float32)}

    @staticmethod
    def _eval_set(split, ssr, k):
        u = split["u"][:, ::ssr, ::ssr, ::k]
        f = split["f"][...]
        constant_force = f.ndim == 3
        if constant_force:
            f = f[:, ::ssr, ::ssr]
        else:
            f = f[:, ::ssr, ::ssr, ::k]
        mu = split["mu"][...].astype(np.float32)
        times = np.arange(0, 20, 0.1 * k, dtype=np.float32)
        times = np.tile(times[: u.shape[-1]], (u.shape[0], 1))
        return {
            "data": u.astype(np.float32),
            "f": f.astype(np.float32),
            "mu": mu,
            "times": times,
        }

    def inference_data(self):
        """Test-split inputs for inference timing (the reference leaves
        this as a `return None  # TODO` stub; here it is implemented)."""
        return {k: v[:512] for k, v in self.test_data.items()}
