"""Structured 2D mesh builder (airfoil / pipe, Geo-FNO datasets): stacked
(X, Y) coordinate inputs, one output channel selected from Q
(reference:fourierflow/builders/structured_mesh_2d.py). The split ordering
train/test/valid matches the Geo-FNO paper (:38-46)."""

import numpy as np

from .base import Builder

__all__ = ["StructuredMesh2DBuilder"]


class StructuredMesh2DBuilder(Builder):
    name = "structured_mesh_2d"

    def __init__(
        self,
        x1_path: str,
        x2_path: str,
        sigma_path: str,
        output_dim: int,
        train_size: int,
        valid_size: int,
        test_size: int,
        batch_size: int = 20,
        **kwargs,
    ):
        self.batch_size = batch_size
        x1 = np.load(x1_path).astype(np.float32)
        x2 = np.load(x2_path).astype(np.float32)
        x = np.stack([x1, x2], axis=-1)  # [N, 221, 51, 2]
        y = np.load(sigma_path)[:, output_dim].astype(np.float32)

        i = train_size
        j = train_size + test_size
        k = train_size + test_size + valid_size
        self.train_data = {"x": x[:i], "y": y[:i]}
        self.test_data = {"x": x[i:j], "y": y[i:j]}
        self.valid_data = {"x": x[j:k], "y": y[j:k]}

    def inference_data(self):
        """Test-split inputs for inference timing (the reference leaves
        this as a `return None  # TODO` stub; here it is implemented)."""
        return {k: v[:512] for k, v in self.test_data.items()}
