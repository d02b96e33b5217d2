"""Driver entry points must keep working: __graft_entry__ and the bench
frame construction (compile-checked on CPU; the driver runs them on TPU)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.block_until_ready(jax.jit(fn)(*args))
        positions, heights, count = out
        assert positions.ndim == 3 and positions.shape[-1] == 3
        assert heights.shape == positions.shape[:2]
        assert int(count) > 0
        assert not np.isnan(np.asarray(positions)).any()

    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(min(8, len(jax.devices())))


class TestBenchPath:
    def test_bench_frame_builds(self, monkeypatch):
        """The bench's frame function must compile and produce a plausible
        tile count on CPU (the driver measures it on TPU)."""
        import io
        import json
        from contextlib import redirect_stdout

        import bench

        # shrink the workload so the CPU run stays fast
        monkeypatch.setattr(
            "bevy_terrain_tpu.utils.timing.device_time_ms",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("no profiler")),
        )
        monkeypatch.setattr(
            "bevy_terrain_tpu.utils.timing.benchmark",
            lambda fn, *a, n=20: {"median_ms": 1.0, "min_ms": 1.0, "mean_ms": 1.0},
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench.main()
        line = buf.getvalue().strip().splitlines()[-1]
        payload = json.loads(line)
        assert payload["unit"] == "us"
        assert payload["value"] > 0
        assert "vs_baseline" in payload
