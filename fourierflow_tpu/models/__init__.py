from .ffno_grid_2d import FNOFactorized2DBlock, SpectralConv2d

__all__ = ["FNOFactorized2DBlock", "SpectralConv2d"]
