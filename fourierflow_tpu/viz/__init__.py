from .heatmap import log_imshow, midpoint_norm

__all__ = ["log_imshow", "midpoint_norm"]
