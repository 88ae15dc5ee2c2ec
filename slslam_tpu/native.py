"""ctypes bindings for the native runtime library (native/slslam_native.cpp).

Auto-builds with g++ on first use if the shared library is missing (a
source-only checkout stays usable); all entry points have pure-Python
fallbacks in their calling modules, so import failures degrade gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libslslam_native.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "slslam_native.cpp")

_lib = None
_tried = False


def _build() -> bool:
    """Compile to a temp file and atomically rename into place.

    A direct `g++ -o LIB_PATH` overwrites the file another process may be
    mid-dlopen on (or mid-write from a concurrent rebuild), yielding
    partially-written libraries; os.replace swaps a fully-built file in
    one atomic step, and an exclusive lock file serializes concurrent
    builders (ADVICE r2).
    """
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    lock = _LIB_PATH + ".lock"
    fd = None
    try:
        import fcntl
        # flock (not O_EXCL) so the lock dies with the process: a builder
        # killed mid-compile must not orphan the lock forever (ADVICE r3).
        # The lock file itself is left in place between builds.
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            # another process is building: wait for its lock, then use
            # whatever it produced
            import time
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                return os.path.exists(_LIB_PATH)
            # holder finished (or died): fall through holding the lock —
            # re-check staleness so a completed build is not redone
            if os.path.exists(_LIB_PATH) and os.path.getmtime(
                    _LIB_PATH) >= os.path.getmtime(_SRC_PATH):
                return True
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC_PATH],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
        if fd is not None:
            os.close(fd)   # closing releases the flock


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = (os.path.exists(_SRC_PATH)
             and (not os.path.exists(_LIB_PATH)
                  or os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)))
    if stale and not _build():
        if not os.path.exists(_LIB_PATH):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    try:
        lib.slslam_parse_obs_file
        lib.slslam_metric_embedding
        lib.slslam_lsd_detect
    except AttributeError:
        # stale binary missing a symbol: force a rebuild once (atomic
        # replace gives this process a fresh inode to dlopen)
        try:
            if not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.slslam_lsd_detect
        except Exception:
            return None

    lib.slslam_parse_obs_file.restype = ctypes.c_int
    lib.slslam_parse_obs_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    lib.slslam_metric_embedding.restype = ctypes.c_int
    lib.slslam_metric_embedding.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_double),
    ]
    lib.slslam_lsd_detect.restype = ctypes.c_int
    lib.slslam_lsd_detect.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_obs_file(path: str, max_rows: int = 4096
                   ) -> Optional[Dict[int, np.ndarray]]:
    """Native loader; returns None if the library is unavailable or the
    file cannot be opened."""
    lib = _load()
    if lib is None:
        return None
    ids = np.zeros(max_rows, np.int32)
    obs = np.zeros((max_rows, 8), np.float64)
    n = lib.slslam_parse_obs_file(
        path.encode(), ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows)
    if n < 0:
        return None
    return {int(ids[k]): obs[k].copy() for k in range(n)}


def lsd_detect(mag: np.ndarray, angle: np.ndarray, mag_threshold: float,
               angle_tol: float, min_length: float, min_density: float,
               max_segments: int = 4096
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native LSD-style region growing (frontend/detector.py hot loop).

    Returns (segments (N, 4), grad_dirs (N, 2)) or None if the library is
    unavailable.  Semantics mirror the Python fallback in detector.py
    (cross-checked in tests/test_native.py)."""
    lib = _load()
    if lib is None:
        return None
    mag = np.ascontiguousarray(mag, np.float32)
    angle = np.ascontiguousarray(angle, np.float32)
    H, W = mag.shape
    segs = np.zeros((max_segments, 4), np.float64)
    grads = np.zeros((max_segments, 2), np.float64)
    n = lib.slslam_lsd_detect(
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        angle.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, mag_threshold, angle_tol, min_length, min_density,
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        grads.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_segments)
    return segs[:n].copy(), grads[:n].copy()


def metric_embedding(n_kfs: int, edge_i: np.ndarray, edge_j: np.ndarray,
                     edge_T: np.ndarray, root: int
                     ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native graph walk.  edge_T: (E, 12) row-major (R, t) per directed
    edge.  Returns (order, T_out (n,12), valid) or None."""
    lib = _load()
    if lib is None:
        return None
    edge_i = np.ascontiguousarray(edge_i, np.int32)
    edge_j = np.ascontiguousarray(edge_j, np.int32)
    edge_T = np.ascontiguousarray(edge_T, np.float64)
    order = np.zeros(n_kfs, np.int32)
    T_out = np.zeros((n_kfs, 12), np.float64)
    valid = np.zeros(n_kfs, np.uint8)
    dist = np.zeros(n_kfs, np.float64)
    n = lib.slslam_metric_embedding(
        n_kfs, len(edge_i),
        edge_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        edge_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        edge_T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        root,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        T_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return order[:n], T_out, dist[:n]
