"""TPU rasterizer timing on the bench.py 8k^2 scene.

Rows (profiler-traced device time, min of N):
  raster_only   rasterize_grid at the given resolution (binning + sort +
                scan + resolve) on the frame's mesh
  render_pixel  full render_view: skirts + raster + perspective-correct
                interpolation + per-pixel PBR
  render_debug  a debug view (vertex colors interpolated per pixel)

The raster path is the CAPTURE path (MIGRATING.md capability delta) —
not part of the production per-vertex frame — so its budget is "fast
enough to iterate", not the 1 ms frame bar.

Usage: python tools/raster_bench.py [--cpu] [--size 1024]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    size = 1024
    if "--size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--size") + 1])
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_bench import build_scene

    from bevy_terrain_tpu.math import frustum
    from bevy_terrain_tpu.ops import meshgen, refinement
    from bevy_terrain_tpu.ops.pallas_kernels import block_format
    from bevy_terrain_tpu.render.material import StandardMaterial
    from bevy_terrain_tpu.render.raster import rasterize_grid, render_view
    from bevy_terrain_tpu.utils.timing import device_time_ms

    cfg, plan, blocks, u1, _ = build_scene()
    blocks = jax.device_put(blocks, block_format())
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        # the profiler-trace helper is TPU-specific; CPU rows are
        # wall-clock min-of-N (structure check, not a perf claim)
        import time as _time

        def device_time_ms(fn, *args, label="bench", runs=3):
            jax.block_until_ready(fn(*args))
            best = float("inf")
            for _ in range(runs):
                t0 = _time.perf_counter()
                jax.block_until_ready(fn(*args))
                best = min(best, _time.perf_counter() - t0)
            return best * 1000.0

    @jax.jit
    def frame(block_array, u):
        tiles = refinement.refine_tiles(u, cfg)
        if cfg.pallas_sampling:
            raw, tiles = meshgen.generate_mesh_fused(
                tiles, block_array, u, cfg, plan, 65535.0
            )
            mesh = meshgen.fused_to_grid(raw, tiles, cfg, u)
        else:
            mesh, tiles = meshgen.generate_mesh_grid(
                tiles, block_array, u, cfg, plan, 65535.0
            )
        return tiles, mesh

    tiles, mesh = frame(blocks, u1)
    jax.block_until_ready(mesh.positions)
    n = int(tiles.tile_count)
    print(f"scene: {n} tiles, image {size}x{size}")

    # the exact camera the scene's frustum culling used
    # (multi_view_bench.build_scene's u1: toward (1000, -40, 300))
    view = np.asarray(u1.view_world_position)
    vp = frustum.view_projection(
        view, view + np.array([1000.0, -40.0, 300.0]), np.pi / 3, 16 / 9
    )
    vp32 = jnp.asarray(vp, jnp.float32)
    knobs = dict(bin_px=32, bin_cap=512, chunk=16)

    r = rasterize_grid(
        mesh.positions, mesh.tile_mask, vp32, size, size, **knobs
    )
    cov = float(np.asarray(r.covered).mean())
    print(
        f"coverage {cov:.2f}, bin_overflow {int(r.bin_overflow)}, "
        f"near_culled {int(r.near_culled)}"
    )

    ms = device_time_ms(
        lambda: rasterize_grid(
            mesh.positions, mesh.tile_mask, vp32, size, size, **knobs
        ).depth,
        label="raster_only",
    )
    print(f"raster_only      {ms * 1000:8.1f} us")

    material = StandardMaterial(metallic=0.05, perceptual_roughness=0.9)

    def pixel():
        img, _ = render_view(
            mesh, tiles, u1, cfg, vp32, size, size, material=material,
            shade_mode="pixel", **knobs,
        )
        return img

    ms = device_time_ms(pixel, label="render_pixel")
    print(f"render_pixel     {ms * 1000:8.1f} us")

    def dbg():
        img, _ = render_view(
            mesh, tiles, u1, cfg, vp32, size, size,
            debug_view="geometry_lod", **knobs,
        )
        return img

    ms = device_time_ms(dbg, label="render_debug")
    print(f"render_debug     {ms * 1000:8.1f} us")


if __name__ == "__main__":
    main()
