"""Profile the bench frame and print the top device ops by self time."""
import glob
import gzip
import json
import shutil
import sys
from collections import defaultdict

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from functools import partial

    from bevy_terrain_tpu.config import TerrainViewConfig
    from bevy_terrain_tpu.math import TerrainModel, TerrainModelApproximation
    from bevy_terrain_tpu.ops import meshgen, patch_sampling, refinement
    from bevy_terrain_tpu.ops import tile_tree as tile_tree_ops
    from bevy_terrain_tpu.ops.params import StaticTerrainConfig, make_frame_uniforms

    TEXTURE_SIZE, BORDER = 512, 2
    LOD_COUNT = 5
    SIDE = 8000.0
    model = TerrainModel.planar(np.zeros(3), SIDE, 0.0, 250.0)
    vc = TerrainViewConfig(tile_capacity=8192)
    cfg = StaticTerrainConfig(
        spherical=False, side_count=1, lod_count=LOD_COUNT, tree_size=vc.tree_size,
        grid_size=vc.grid_size, refinement_count=vc.refinement_count,
        queue_capacity=8192, tile_capacity=vc.tile_capacity, origin_lod=vc.origin_lod,
        pallas_sampling=True,
    )
    view = np.array([SIDE * 0.03, 120.0, -SIDE * 0.02])
    origins, vt_int, vt_frac = tile_tree_ops.compute_view_anchors(model, view, LOD_COUNT, vc.tree_size)
    approx = TerrainModelApproximation.compute(model, view, vc.origin_lod, 125.0)
    rng = np.random.default_rng(0)
    S, L, T = 1, LOD_COUNT, vc.tree_size
    entries = np.zeros((S, L, T, T, 2), np.int32)
    entries[..., 0] = rng.integers(0, 1024, (S, L, T, T))
    entries[..., 1] = np.arange(L)[None, :, None, None]
    uniforms = make_frame_uniforms(model, view, approx, origins, entries, vt_int, vt_frac, vc)
    plan = patch_sampling.make_patch_plan(TEXTURE_SIZE, 4, BORDER)
    blocks = jnp.asarray(
        rng.integers(0, 65535, (1024 * plan.total_blocks_per_slot, 32, 128)).astype(np.int32)
    )
    from bevy_terrain_tpu.ops.pallas_kernels import block_format

    fmt = block_format()
    blocks = jax.device_put(blocks, fmt)

    def _frame(block_array, u):
        tiles = refinement.refine_tiles(u, cfg)
        mesh, tiles = meshgen.generate_mesh_grid(tiles, block_array, u, cfg, plan, 65535.0)
        return tiles, mesh

    frame = jax.jit(_frame, in_shardings=(fmt, None))
    jax.block_until_ready(frame(blocks, uniforms))
    d = "/tmp/bt_census"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        jax.block_until_ready(frame(blocks, uniforms))
    files = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    # find the jit_ event pids/tids on device and sum op self-times
    ops = defaultdict(float)
    longs = {}
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = str(e.get("name", ""))
        if name.startswith("jit__frame"):
            total = max(total, e["dur"] / 1e3)
    # device op events live under "XLA Ops" style tracks; group by name prefix
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        if "long_name" in args or "hlo_op" in args or "hlo_category" in args:
            name = str(e.get("name", ""))[:60]
            ops[name] += e["dur"] / 1e3
            long = str(args.get("long_name", args.get("hlo_op", "")))
            if long and name not in longs:
                longs[name] = long[:500]
    print(f"jit__frame total: {total:.3f} ms")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.3f} ms  {name}")
        if name in longs:
            print(f"             {longs[name]}")


if __name__ == "__main__":
    main()
