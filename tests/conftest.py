"""Test configuration: force an 8-device CPU mesh and float64.

Tests run on a virtual 8-device CPU topology
(xla_force_host_platform_device_count) so all sharding/mesh code paths are
exercised without TPU hardware; numeric tests use x64 for tight tolerances.
"""

import os

_REAL_DEVICE = os.environ.get("SLSLAM_TPU_TESTS") == "1"

if not _REAL_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _REAL_DEVICE:
    # The environment's site customization force-registers a TPU plugin
    # that overrides JAX_PLATFORMS from the env; jax.config wins over it.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache stays OFF for the (CPU) suite —
# XLA:CPU AOT entries record host machine features and reloading them
# warns "could lead to execution errors such as SIGILL" when compile
# flags differ; the TPU surfaces (bench.py, tools/*) enable it.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU segfaults inside backend_compile once a process has
    accumulated enough compiled executables (reproduced twice at the
    ~55% mark of the full suite, each time in whichever test compiled
    the next fresh kernel — LLVM JIT resource exhaustion, not a kernel
    bug).  Dropping the compiled-executable caches at module boundaries
    keeps the accumulation bounded; module-scoped fixtures still share
    compiles within their module."""
    yield
    jax.clear_caches()
    # engine-level compiled-scan cache holds executables too
    try:
        from slslam_tpu.engine.batch import BatchSlam
        BatchSlam._runner_cache.clear()
    except Exception:
        pass
