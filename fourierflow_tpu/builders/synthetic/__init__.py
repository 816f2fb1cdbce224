from .ns_2d import Force, solve_navier_stokes_2d
from .random_fields import gaussian_random_field

__all__ = ["Force", "solve_navier_stokes_2d", "gaussian_random_field"]
