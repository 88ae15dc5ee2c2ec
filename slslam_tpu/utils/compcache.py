"""Persistent XLA compilation cache.

The big device kernels (the batch-replay scan, the CG Schur solver) cost
10-340 s to compile over the TPU tunnel (CLAUDE.md).  XLA can cache
compiled executables on disk keyed by HLO + compile options; enabling the
cache makes every process after the first start warm (~1-3 s deserialize
instead of minutes of compilation) — including the driver's end-of-round
bench run.

The reference has no analog (Ceres JIT-compiles nothing); this is the
TPU-native equivalent of shipping prebuilt binaries.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a writable on-disk directory.

    Idempotent.  Honors SLSLAM_CACHE_DIR; set SLSLAM_CACHE_DIR=0 to
    disable.  Returns the cache dir, or None when disabled/unavailable.

    Note: XLA:CPU cache entries are AOT objects stamped with host
    machine features; reloading them across differing compile flags
    warns about possible SIGILL.  The win is on the TPU anyway (10-340 s
    tunnel compiles), so callers forcing the CPU backend should simply
    not call this.
    """
    global _enabled
    env = os.environ.get("SLSLAM_CACHE_DIR")
    if env == "0":
        return None
    d = path or env or _DEFAULT_DIR
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every kernel that takes >=1 s to compile (the default);
        # drop the min-entry-size gate so small-but-slow tunnel compiles
        # are kept too
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    _enabled = True
    return d
