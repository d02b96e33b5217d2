"""Profile the Earth flagship frame and print the top device ops.

Same scene as tools/earth_frame_bench.py (compile-cache-compatible);
prints the per-op device-time breakdown of the settled frame so the
spherical surplus over the planar headline can be attributed.
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import sys
import tempfile
import time
from collections import defaultdict
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
    from bevy_terrain_tpu.terrain_data import TileAtlas

    R = 6_371_000.0
    MAXH = 9_000.0
    LODS = 13
    DATA_LODS = 3

    def planet(p):
        return np.clip(
            0.5 + 0.3 * np.sin(3 * p[..., 0]) * np.cos(2 * p[..., 2]), 0.05, 1.0
        )

    tmp = Path(tempfile.mkdtemp(prefix="earth_census_"))
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
        atlas_size=512,
        path="earth",
        assets_root=str(tmp / "assets"),
        attachments=(height_attachment(texture_size=512, mips=4),),
    )
    atlas = TileAtlas(config)
    bt.Preprocessor(atlas).clear_attachment(0).preprocess_spherical(
        bt.SphericalDataset(attachment_index=0, paths=paths,
                            lod_range=range(0, DATA_LODS))
    ).run(verbose=False)

    terrain = bt.Terrain(config)
    terrain.add_view(
        "cam", bt.TerrainViewConfig(tile_capacity=2048),
        queue_capacity=2048, culling=True,
    )

    view = np.array([0.0, 0.0, R + 60e3])
    vp = view_projection(view, view * 0.5, np.pi / 3, 16 / 9)
    for i in range(200):
        terrain.update({"cam": view}, {"cam": vp})
        if i > 3 and not terrain.atlas.state.to_load and not any(
            a.loading for a in terrain.atlas.attachments
        ):
            break
        time.sleep(0.01)
    jax.block_until_ready(
        terrain.update({"cam": view}, {"cam": vp})["cam"].mesh.positions
    )

    d = "/tmp/bt_earth_census"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        jax.block_until_ready(
            terrain.update({"cam": view}, {"cam": vp})["cam"].mesh.positions
        )
    files = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    ops = defaultdict(float)
    longs = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        if "long_name" in args or "hlo_op" in args or "hlo_category" in args:
            name = str(e.get("name", ""))[:70]
            ops[name] += e["dur"] / 1e3
            long = str(args.get("long_name", args.get("hlo_op", "")))
            if long and name not in longs:
                longs[name] = long[:300]
    print(f"device total: {sum(ops.values()):.3f} ms")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.3f} ms  {name}")
        if name in longs:
            print(f"             {longs[name]}")


if __name__ == "__main__":
    main()
