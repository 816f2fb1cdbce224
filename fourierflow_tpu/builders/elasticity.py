"""Elasticity point-cloud builder (Geo-FNO dataset): rr geometry params,
sigma stress targets, xy point coords
(reference:fourierflow/builders/elasticity.py)."""

import numpy as np

from .base import Builder

__all__ = ["ElasticityBuilder"]


class ElasticityBuilder(Builder):
    name = "elasticity"

    def __init__(
        self,
        sigma_path: str,
        xy_path: str,
        rr_path: str,
        train_size: int,
        valid_size: int,
        test_size: int,
        batch_size: int = 20,
        **kwargs,
    ):
        self.batch_size = batch_size
        rr = np.load(rr_path).astype(np.float32).transpose(1, 0)  # [2000, 42]
        sigma = np.load(sigma_path).astype(np.float32).transpose(1, 0)[..., None]
        # sigma: [2000, 972, 1]
        xy = np.load(xy_path).astype(np.float32).transpose(2, 0, 1)  # [2000, 972, 2]

        def split(a, lo, hi):
            return a[lo:hi] if hi is not None else a[lo:]

        eval_size = valid_size + test_size
        self.train_data = {
            "rr": rr[:train_size], "sigma": sigma[:train_size], "xy": xy[:train_size]
        }
        self.valid_data = {
            "rr": rr[-eval_size:-test_size],
            "sigma": sigma[-eval_size:-test_size],
            "xy": xy[-eval_size:-test_size],
        }
        self.test_data = {
            "rr": rr[-test_size:], "sigma": sigma[-test_size:], "xy": xy[-test_size:]
        }

    def inference_data(self):
        """Test-split inputs for inference timing (the reference leaves
        this as a `return None  # TODO` stub; here it is implemented)."""
        return {k: v[:512] for k, v in self.test_data.items()}
