"""Midpoint-normalized heatmap rendering (equivalent of
reference:fourierflow/viz/heatmap.py, which logs vorticity heatmaps to
wandb with a diverging colormap centered at zero)."""

from typing import Optional

import numpy as np

__all__ = ["midpoint_norm", "log_imshow"]


def midpoint_norm(x: np.ndarray, midpoint: float = 0.0):
    """Normalize to [0, 1] with ``midpoint`` mapped to 0.5 — the two-slope
    normalization the reference builds from matplotlib's TwoSlopeNorm."""
    x = np.asarray(x, dtype=np.float64)
    lo = min(float(x.min()), midpoint - 1e-12)
    hi = max(float(x.max()), midpoint + 1e-12)
    out = np.empty_like(x)
    below = x <= midpoint
    out[below] = 0.5 * (x[below] - lo) / (midpoint - lo)
    out[~below] = 0.5 + 0.5 * (x[~below] - midpoint) / (hi - midpoint)
    return out


def log_imshow(field: np.ndarray, title: str = "", out_path: Optional[str] = None,
               scale: Optional[float] = None):
    """Render a zero-centered diverging heatmap of a 2D field.

    With matplotlib available, writes a PNG (returns the path); otherwise
    returns the normalized array (still useful for logging pipelines).
    ``scale`` clips to [-scale, scale] first (the reference's
    ``heatmap_scale`` routine option).
    """
    field = np.asarray(field)
    if scale is not None:
        field = np.clip(field, -scale, scale)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return midpoint_norm(field)

    fig, ax = plt.subplots(figsize=(4, 4))
    lim = max(abs(float(field.min())), abs(float(field.max())), 1e-12)
    im = ax.imshow(field.T, cmap="RdBu_r", vmin=-lim, vmax=lim, origin="lower")
    ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.colorbar(im, ax=ax, fraction=0.046)
    out_path = out_path or "heatmap.png"
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path
