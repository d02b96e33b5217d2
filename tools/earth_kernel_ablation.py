"""Attribute the Earth fused-kernel step cost by static ablation.

Builds the exact earth_frame_bench scene (60 km, lod 13, culled, 1512
tiles at capacity 2048), then times generate_mesh_fused with named kernel
pieces statically removed (ops/pallas_kernels.py `ablate`):

  full        the production spherical kernel
  no_taylor   both hp Taylor chains + HP scratch traffic removed
  reuse_far   position from the unmorphed geometry (removes the SECOND
              far_geom + morphed Taylor chain) — the upper bound of any
              "evaluate far_geom once" scheme
  no_smooth   blend smoothing slabs + second interp9 removed
  no_phase_a  resample dots/stores removed (DMA + tents + phase B remain)

Differences between rows attribute the ~45 us/step spherical surcharge
(planar is ~18 us/step) — run on the real chip.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bevy_terrain_tpu as bt
    from bevy_terrain_tpu.formats.tiff import array_to_source
    from bevy_terrain_tpu.math.coordinate import local_position_from_side_uv
    from bevy_terrain_tpu.math.frustum import view_projection
    from bevy_terrain_tpu.models import height_attachment
    from bevy_terrain_tpu.ops import meshgen, refinement
    from bevy_terrain_tpu.ops.pallas_kernels import block_format
    from bevy_terrain_tpu.terrain_data import TileAtlas
    from bevy_terrain_tpu.utils.timing import device_time_ms

    R, MAXH, LODS, DATA_LODS = 6_371_000.0, 9_000.0, 13, 3
    CAPACITY, QUEUE = 2048, 2048

    def planet(p):
        return np.clip(
            0.5 + 0.3 * np.sin(3 * p[..., 0]) * np.cos(2 * p[..., 2]), 0.05, 1.0
        )

    tmp = Path(tempfile.mkdtemp(prefix="earth_abl_"))
    n = 256
    uv = (np.arange(n) + 0.5) / n
    uu, vv = np.meshgrid(uv, uv, indexing="xy")
    grid_uv = np.stack([uu, vv], axis=-1)
    paths = []
    for side in range(6):
        p = local_position_from_side_uv(side, grid_uv)
        path = tmp / f"f{side}.png"
        array_to_source(planet(p), path)
        paths.append(str(path))

    config = bt.TerrainConfig(
        lod_count=LODS,
        model=bt.TerrainModel.sphere(np.zeros(3), R, 0.0, MAXH),
        atlas_size=512, path="earth", assets_root=str(tmp / "assets"),
        attachments=(height_attachment(texture_size=512, mips=4),),
    )
    atlas = TileAtlas(config)
    bt.Preprocessor(atlas).clear_attachment(0).preprocess_spherical(
        bt.SphericalDataset(attachment_index=0, paths=paths,
                            lod_range=range(0, DATA_LODS))
    ).run(verbose=False)

    terrain = bt.Terrain(config)
    terrain.add_view("cam", bt.TerrainViewConfig(tile_capacity=CAPACITY),
                     queue_capacity=QUEUE, culling=True)
    view = np.array([0.0, 0.0, R + 60e3])
    vp = view_projection(view, view * 0.5, np.pi / 3, 16 / 9)
    for i in range(200):
        terrain.update({"cam": view}, {"cam": vp})
        if i > 3 and not terrain.atlas.state.to_load and not any(
            a.loading for a in terrain.atlas.attachments
        ):
            break
        time.sleep(0.01)
    terrain.update({"cam": view}, {"cam": vp})

    # frame inputs exactly as the pipeline's jitted step sees them
    from bevy_terrain_tpu.math.approximation import TerrainModelApproximation
    from bevy_terrain_tpu.ops.params import (
        pack_frame_uniforms, unpack_frame_uniforms,
    )

    cfg = terrain._last_cfgs["cam"]
    height = terrain.atlas.attachments[0]
    plan = height.patch_plan
    max_value = height.config.format.max_value
    tree = terrain.tile_trees["cam"]
    approx = TerrainModelApproximation.compute(
        config.model, view, tree.origin_lod, tree.approximate_height
    )
    blob = pack_frame_uniforms(
        config.model, view, approx, tree.origins, tree.entries,
        tree.view_tile_int, tree.view_tile_frac,
        terrain.view_configs["cam"], view_proj=vp,
    )
    blocks = jax.device_put(height.block_array, block_format())
    blob_d = jax.device_put(np.asarray(blob))

    VARIANTS = [
        ("full", frozenset()),
        ("no_taylor", frozenset({"no_taylor"})),
        ("reuse_far", frozenset({"reuse_far"})),
        ("no_smooth", frozenset({"no_smooth"})),
        ("no_phase_a", frozenset({"no_phase_a"})),
        ("reuse+notaylor", frozenset({"reuse_far", "no_taylor"})),
    ]
    results = {}
    for name, abl in VARIANTS:
        def step(block_array, b, abl=abl):
            u = unpack_frame_uniforms(
                b, cfg.side_count, cfg.lod_count, cfg.tree_size
            )
            tiles = refinement.refine_tiles(u, cfg)
            raw, tiles = meshgen.generate_mesh_fused(
                tiles, block_array, u, cfg, plan, max_value, ablate=abl
            )
            return tiles.tile_count, raw

        j = jax.jit(step, in_shardings=(block_format(), None))
        cnt, _ = jax.block_until_ready(j(blocks, blob_d))
        ms = device_time_ms(j, blocks, blob_d, label=f"abl_{name}")
        results[name] = ms
        print(f"{name:16s} {ms * 1e3:8.1f} us  (tiles {int(cnt)})", flush=True)

    full = results["full"]
    print("\nattribution (deltas vs full):")
    for name, _ in VARIANTS[1:]:
        print(f"  {name:16s} -{(full - results[name]) * 1e3:7.1f} us")


if __name__ == "__main__":
    main()
