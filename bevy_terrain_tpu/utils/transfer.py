"""Host<->device transfer health probe.

Some TPU attach points (tunneled single-chip test rigs) have pathological
device->host bandwidth (measured 4 MB in ~75 s, ~50 KB/s, while H2D runs
at >100 MB/s). Compute paths that round-trip bulk data — the device
preprocess pipeline pulls whole stitched lod stacks back for saving —
must fall back to host compute there, while true deployments (fast PCIe/
ICI-attached hosts) keep the device path.

The probe times one small device_get and caches the verdict per process.
"""

from __future__ import annotations

import time

_D2H_FAST: bool | None = None

# The device preprocess path must stream whole stitched lod stacks back
# (tens-hundreds of MB); it only beats host-numpy compute when readback
# sustains >= ~20 MB/s. Tunneled rigs measure 0.05-15 MB/s depending on
# contention — both fail this probe.
_PROBE_BYTES = 1 << 20
_THRESHOLD_S = 0.05


def d2h_is_fast() -> bool:
    """True when device->host readback is usable for bulk data."""
    global _D2H_FAST
    if _D2H_FAST is None:
        import jax
        import numpy as np

        if jax.default_backend() == "cpu":
            _D2H_FAST = True
        else:
            x = jax.device_put(np.zeros(_PROBE_BYTES // 4, np.float32))
            x.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(jax.device_get(x))
            _D2H_FAST = (time.perf_counter() - t0) < _THRESHOLD_S
    return _D2H_FAST


_DISPATCH_FAST: bool | None = None

# Preprocess-style pipelines sync the device once per lod stack; on a
# PCIe/ICI-attached host that round trip is ~50 us, while tunneled rigs
# measure 25-30 ms per sync — enough to erase a 13x compute advantage at
# ~100 dispatches per dataset. 5 ms cleanly separates the two regimes.
_DISPATCH_THRESHOLD_S = 5e-3


def dispatch_is_fast() -> bool:
    """True when a dispatch+sync round trip is cheap enough for per-stage
    device pipelines (vs batching everything into one giant program)."""
    global _DISPATCH_FAST
    if _DISPATCH_FAST is None:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() == "cpu":
            _DISPATCH_FAST = True
        else:
            f = jax.jit(lambda x: x + 1.0)
            x = jnp.zeros((8,), jnp.float32)
            f(x).block_until_ready()  # compile outside the timed window
            t0 = time.perf_counter()
            f(x).block_until_ready()
            _DISPATCH_FAST = (time.perf_counter() - t0) < _DISPATCH_THRESHOLD_S
    return _DISPATCH_FAST


def _reset_probe() -> None:  # test hook
    global _D2H_FAST, _DISPATCH_FAST
    _D2H_FAST = None
    _DISPATCH_FAST = None
