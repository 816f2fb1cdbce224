from .grids import fft_mesh, laplacian_hat, rfft_mesh, velocity_from_vorticity

__all__ = ["fft_mesh", "laplacian_hat", "rfft_mesh", "velocity_from_vorticity"]
