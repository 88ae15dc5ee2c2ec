"""slslam-tpu: a TPU-native stereo line-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cleinc/slslam
(reference mounted at /root/reference): stereo line-track replay or live
line front-end, Plücker-line triangulation, RANSAC line visual odometry,
windowed local bundle adjustment with the orthonormal 4-DoF line
parameterization (Schur complement, Levenberg–Marquardt), loop closure with
vocabulary-tree place recognition, and pose-graph optimization — with the hot
math running as batched jitted kernels and scaling over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .config import CameraConfig, SequenceConfig, SlamConfig  # noqa: F401
