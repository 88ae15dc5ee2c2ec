"""Trajectory evaluation: the reference's ATE metric.

Port of matlab_script/calc_traj_err.m:27-40: unaligned mean per-row position
error between two trajectory files (no SE(3) alignment).  Note the MATLAB
script slices columns 1:3, which on the 7-column save_trajectory format
includes the index column — we compare position columns explicitly and also
expose the literal cols-1:3 variant for bit-parity with the script.
"""

from __future__ import annotations

import numpy as np


def load_trajectory(path: str) -> np.ndarray:
    return np.loadtxt(path)


def ate_position_error(traj_a: np.ndarray, traj_b: np.ndarray,
                       cols=(1, 2, 3)) -> float:
    """Mean per-row Euclidean error over the shared prefix.

    cols: which columns hold positions.  (1, 2, 3) matches the
    save_trajectory format (t_z, -t_x, -t_y).
    """
    n = min(len(traj_a), len(traj_b))
    d = traj_a[:n][:, list(cols)] - traj_b[:n][:, list(cols)]
    return float(np.mean(np.linalg.norm(d, axis=1)))


def ate_matlab_literal(traj_a: np.ndarray, traj_b: np.ndarray) -> float:
    """The literal calc_traj_err.m computation (columns 1:3 MATLAB,
    i.e. 0:3 python — includes the frame-index column)."""
    n = min(len(traj_a), len(traj_b))
    d = traj_a[:n, 0:3] - traj_b[:n, 0:3]
    return float(np.mean(np.linalg.norm(d, axis=1)))
