"""Timing harness: HONEST device benchmarks.

The reference has no instrumentation beyond println (SURVEY.md section 5);
the north-star metric here is microseconds/frame, so measurement is
first-class — and on this environment it is subtle: the axon TPU tunnel's
``block_until_ready`` can return before device execution finishes
(optimistic async), making naive wall-clock loops report fantasy numbers.
Two honest methods are provided:

* :func:`device_time_ms` — ground truth from a profiler trace (duration of
  the jit event on device). Use for benchmarks.
* :func:`benchmark` — wall-clock with a host fetch of output bytes each
  iteration (data dependency forces real completion). Use when the
  profiler is unavailable; slightly pessimistic (adds one D2H round trip).
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import time
from dataclasses import dataclass, field

import jax
import numpy as np


def device_time_ms(fn, *args, label: str = "bench", trace_dir: str = "/tmp/bt_prof",
                   runs: int = 5) -> float:
    """Median device duration of the jitted step over ``runs`` profiled
    executions (one trace). A single profiled sample varies ~2% run to
    run; the median is the honest, stable figure."""
    jax.block_until_ready(fn(*args))  # compile + warm
    d = f"{trace_dir}_{label}"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(runs):
            jax.block_until_ready(fn(*args))
    files = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
    if not files:
        raise RuntimeError("no profiler trace produced")
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = [
        e
        for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and str(e.get("name", "")).startswith("jit")
    ]
    if not events:
        raise RuntimeError("no jit events in trace")
    # group by name, take the step with the largest total (the frame jit),
    # then the median duration across its executions
    from collections import defaultdict

    by_name = defaultdict(list)
    for e in events:
        by_name[e["name"]].append(e["dur"])
    durs = max(by_name.values(), key=lambda v: sum(v))
    return float(np.median(durs)) / 1e3


def _fetch(out) -> None:
    """Force a real host round trip on (part of) a pytree output."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))


def benchmark(fn, *args, n: int = 20, warmup: int = 2) -> dict[str, float]:
    """Wall-clock benchmark with per-iteration host fetch (cannot lie)."""
    for _ in range(warmup):
        _fetch(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    return {
        "min_ms": float(ts.min()),
        "median_ms": float(np.median(ts)),
        "mean_ms": float(ts.mean()),
    }


@dataclass
class Timer:
    """Accumulating section timer for host-side frame phases."""

    sections: dict = field(default_factory=dict)

    def measure(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                timer.sections.setdefault(name, []).append(
                    time.perf_counter() - self.t0
                )

        return _Ctx()

    def summary(self) -> dict[str, float]:
        return {k: float(np.median(v) * 1e3) for k, v in self.sections.items()}
