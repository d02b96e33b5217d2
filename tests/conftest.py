"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (the standard JAX recipe for
validating Mesh/pjit programs without real chips).

Note: this environment pre-imports jax via sitecustomize (the axon TPU
platform), so ``JAX_PLATFORMS`` env vars are too late — we must switch the
platform through ``jax.config`` before any backend initializes. TPU perf
runs happen via bench.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# BT_TPU_TESTS=1 opts OUT of the CPU forcing so the live-backend golden
# checks (tests/test_goldens.py::TestTpuFusedGoldens) can run on the chip
if os.environ.get("BT_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Keep the persistent compilation cache OFF for the whole test session.
# test_entrypoints runs bench.main(), which points the cache at
# .jax_cache for the driver's sake; with hundreds of CPU executables in
# one process, PJRT's LoadedExecutable.serialize() has segfaulted on a
# later cache write (observed on the multi-view shard_map step), killing
# the run. Tests compile small CPU programs — the cache buys nothing
# here, and bench.main only sets the cache *dir*, so this enable flag
# stays authoritative. (Live-TPU goldens never used JAX's cache either:
# the axon backend routes compiles through its own sidechannel.)
jax.config.update("jax_enable_compilation_cache", False)

# --- VMA guard -------------------------------------------------------------
# Root cause of the intermittent late-suite segfaults (r05 diagnosis):
# every live XLA:CPU executable holds ~10 small mmap'd JIT-code regions,
# and a full-suite run accumulates executables until the process hits the
# kernel's per-process mapping limit (vm.max_map_count, default 65530 —
# observed 45k and climbing minutes before the crash). When mmap starts
# failing, XLA's code emission segfaults instead of erroring. Measured:
# releasing executables (del / jax.clear_caches()) returns the mappings.
# So: after each test, if the map count nears the limit, drop JAX's
# global caches — later tests recompile (slower, correct) instead of
# crashing the whole run.

_VMA_SOFT_LIMIT = 40_000


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux fallback: never trigger
        return 0


def pytest_runtest_teardown(item):
    if _map_count() > _VMA_SOFT_LIMIT:
        import gc

        jax.clear_caches()
        gc.collect()
