"""Trajectory/landmark writers and evaluation metrics."""

from .traj import ate_position_error, load_trajectory  # noqa: F401
from .writers import write_landmarks, write_trajectory  # noqa: F401
