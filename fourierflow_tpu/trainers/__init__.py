from .callbacks import (
    Callback,
    JSONLogger,
    ModelCheckpoint,
    StochasticWeightAveraging,
)
from .trainer import Trainer

__all__ = [
    "Callback",
    "JSONLogger",
    "ModelCheckpoint",
    "StochasticWeightAveraging",
    "Trainer",
]
