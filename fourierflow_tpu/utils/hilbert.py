"""Hilbert-curve ordering of scattered 2D points.

Capability-parity stand-in for reference:fourierflow/modules/hilbert.py
(a recursive quadtree curve builder, dead code in the reference). Instead
of the reference's recursive object tree, we compute the classic iterative
xy -> Hilbert-index map on a 2^order x 2^order lattice and argsort — O(N)
per point, vectorized in numpy, and directly usable to reorder point
clouds / mesh nodes for spatial locality (e.g. before batching NUDFT
points so nearby points share VMEM tiles).
"""

import numpy as np

__all__ = ["hilbert_index", "hilbert_sort"]


def hilbert_index(xs: np.ndarray, ys: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert curve index of integer lattice coords on a 2^order grid.

    Standard iterative rotate-and-accumulate d2xy inverse: walk the
    quadrant bits from the top, accumulating the sub-square offset and
    applying the reflection/transpose that maps each quadrant back onto
    the canonical orientation.
    """
    x = np.asarray(xs, dtype=np.int64).copy()
    y = np.asarray(ys, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # Rotate the quadrant: reflect when ry == 0, swap x/y.
        flip = ry == 0
        swap_mask = flip & (rx == 1)
        x = np.where(swap_mask, s - 1 - x, x)
        y = np.where(swap_mask, s - 1 - y, y)
        x2 = np.where(flip, y, x)
        y2 = np.where(flip, x, y)
        x, y = x2, y2
        s >>= 1
    return d


def hilbert_sort(mesh_pos: np.ndarray, order: int = 16) -> np.ndarray:
    """Return the permutation that orders 2D points along a Hilbert curve.

    Args:
      mesh_pos: ``[n_points, 2]`` float coordinates (any range).
      order: curve depth; 2^order lattice cells per axis.
    Returns:
      ``[n_points]`` int indices such that ``mesh_pos[perm]`` follows the
      curve (equivalent role to the reference's ``linearize().get_path()``).
    """
    pos = np.asarray(mesh_pos, dtype=np.float64)
    lo = pos.min(axis=0)
    hi = pos.max(axis=0)
    span = np.maximum(hi - lo, 1e-12)
    scale = (np.int64(1) << order) - 1
    quant = ((pos - lo) / span * scale).astype(np.int64)
    d = hilbert_index(quant[:, 0], quant[:, 1], order)
    return np.argsort(d, kind="stable")
