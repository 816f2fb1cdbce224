from .base import Routine, TrainState, make_optimizer
from .grid_2d_markov import Grid2DMarkovRoutine
from .grid_2d_rollout import Grid2DRolloutRoutine
from .learned_interpolator import LearnedInterpolatorRoutine
from .meshgraphnet import MeshGraphNetRoutine
from .point_cloud import PointCloudRoutine
from .structured_mesh import StructuredMeshRoutine

__all__ = [
    "Routine",
    "TrainState",
    "make_optimizer",
    "Grid2DMarkovRoutine",
    "Grid2DRolloutRoutine",
    "LearnedInterpolatorRoutine",
    "MeshGraphNetRoutine",
    "PointCloudRoutine",
    "StructuredMeshRoutine",
]
