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

# Persistent compilation cache for the suite (r5; SLSLAM_TEST_CACHE=0 to
# disable).  The suite wall is XLA:CPU compile-bound (the four heaviest
# e2e tests are ~10 min of compiles, VERDICT r4 item 4); disk-cached
# executables make re-runs on the same box start warm.  The XLA:CPU AOT
# SIGILL caveat (entries record host machine features) applies to
# reloading entries on a DIFFERENT machine/flags; the cache dir lives
# under the repo and never travels, and the flags below are fixed by this
# conftest, so entries are only ever reloaded where they were built.
if not _REAL_DEVICE and os.environ.get("SLSLAM_TEST_CACHE") != "0":
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tests")
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

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
