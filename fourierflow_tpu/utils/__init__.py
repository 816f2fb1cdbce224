from .grids import Grid, fft_mesh, laplacian_hat, rfft_mesh, velocity_from_vorticity
from .spectral import (
    circular_filter_2d,
    downsample_staggered_velocity,
    downsample_vorticity,
    downsample_vorticity_hat,
    grid_correlation,
    velocity_to_vorticity_fd,
    vorticity_to_velocity_solve,
)

__all__ = [
    "Grid",
    "fft_mesh",
    "laplacian_hat",
    "rfft_mesh",
    "velocity_from_vorticity",
    "circular_filter_2d",
    "downsample_staggered_velocity",
    "downsample_vorticity",
    "downsample_vorticity_hat",
    "grid_correlation",
    "velocity_to_vorticity_fd",
    "vorticity_to_velocity_solve",
]
