from .ffno_grid_2d import FNOFactorized2DBlock, SpectralConv2d
from .ffno_mesh_2d import FNOFactorizedMesh2D
from .ffno_mesh_3d import FNOFactorizedMesh3D
from .ffno_point_cloud_2d import FNOFactorizedPointCloud2D
from .iphi import IPhi
from .zongyi_fno_2d import FNOZongyi2DBlock, ZongyiSpectralConv2d

__all__ = [
    "FNOFactorized2DBlock",
    "SpectralConv2d",
    "FNOFactorizedMesh2D",
    "FNOFactorizedMesh3D",
    "FNOFactorizedPointCloud2D",
    "IPhi",
    "FNOZongyi2DBlock",
    "ZongyiSpectralConv2d",
]
