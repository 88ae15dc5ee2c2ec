"""SLAM engine: the imperative shell orchestrating the jitted kernels."""

from .slam import Slam  # noqa: F401
from .state import Edge, Keyframe, Landmark, MapState  # noqa: F401
