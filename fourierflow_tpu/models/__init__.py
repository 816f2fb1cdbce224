from .ffno_grid_2d import FNOFactorized2DBlock, SpectralConv2d
from .zongyi_fno_2d import FNOZongyi2DBlock, ZongyiSpectralConv2d

__all__ = [
    "FNOFactorized2DBlock",
    "SpectralConv2d",
    "FNOZongyi2DBlock",
    "ZongyiSpectralConv2d",
]
