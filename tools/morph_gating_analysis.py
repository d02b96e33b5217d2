"""Empirical morph-gating analysis for the earth bench frame (CPU).

For each live tile of the settled 60 km frame, decide whether ANY vertex
can morph (mr > 0 at some uv): mr = 0 iff lod + morph_range <=
log2(2*morph_dist) - log2(d). Tiles are checked at their 3x3 uv corner
grid distances (max d governs). Then group the canonical (quad-sorted)
tile list into 64-tile kernel steps and count fully-morph-free steps —
the steps a per-step flag could skip the second far_geom for.
"""
import sys, tempfile, time
from pathlib import Path
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
jax.config.update("jax_platforms", "cpu")

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
    return np.clip(0.5 + 0.3 * np.sin(3 * p[..., 0]) * np.cos(2 * p[..., 2]), 0.05, 1.0)

tmp = Path(tempfile.mkdtemp(prefix="morph_an_"))
n = 256
uvg = (np.arange(n) + 0.5) / n
uu, vv = np.meshgrid(uvg, uvg, indexing="xy")
grid_uv = np.stack([uu, vv], axis=-1)
paths = []
for side in range(6):
    p = local_position_from_side_uv(side, grid_uv)
    path = tmp / f"f{side}.png"
    array_to_source(planet(p), path)
    paths.append(str(path))

config = bt.TerrainConfig(
    lod_count=LODS, model=bt.TerrainModel.sphere(np.zeros(3), R, 0.0, MAXH),
    atlas_size=512, path="earth", assets_root=str(tmp / "assets"),
    attachments=(height_attachment(texture_size=512, mips=4),),
)
atlas = TileAtlas(config)
bt.Preprocessor(atlas).clear_attachment(0).preprocess_spherical(
    bt.SphericalDataset(attachment_index=0, paths=paths, lod_range=range(0, DATA_LODS))
).run(verbose=False)

terrain = bt.Terrain(config)
terrain.add_view("cam", bt.TerrainViewConfig(tile_capacity=2048),
                 queue_capacity=2048, culling=True)
view = np.array([0.0, 0.0, R + 60.0 * 1e3])
vp = view_projection(view, view * 0.5, np.pi / 3, 16 / 9)
for i in range(200):
    out = terrain.update({"cam": view}, {"cam": vp})
    if i > 3 and not terrain.atlas.state.to_load and not any(
        a.loading for a in terrain.atlas.attachments):
        break
    time.sleep(0.01)
out = terrain.update({"cam": view}, {"cam": vp})["cam"]
tiles = out.tiles
cnt = int(np.asarray(tiles.tile_count))
F = 2048
side = np.asarray(tiles.tile_side)[:F]
lod = np.asarray(tiles.tile_lod)[:F]
xy = np.asarray(tiles.tile_xy)[:F]
live = np.arange(F) < cnt

u = terrain._last_uniform_objs["cam"] if hasattr(terrain, "_last_uniform_objs") else None
# pull morph scalars from the view config / uniforms the robust way:
vc = terrain.view_configs["cam"] if hasattr(terrain, "view_configs") else None
# fall back: recompute from TerrainViewConfig defaults
from bevy_terrain_tpu.config import TerrainViewConfig
tvc = TerrainViewConfig(tile_capacity=2048)
morph_distance = tvc.morph_distance * config.model.scale
morph_range = tvc.morph_range
print("morph_distance (world)", morph_distance, "morph_range", morph_range)

model = config.model
happrox = float(np.asarray(out.mesh.heights).max()) * 0.0  # use 0.5*MAXH below
h_mid = 0.5 * MAXH

corners = [(cx, cy) for cx in (0.0, 0.5, 1.0) for cy in (0.0, 0.5, 1.0)]
scale = 1.0 / (2.0 ** lod.astype(np.float64))
dmax = np.zeros(F)
for cx, cy in corners:
    s = (xy[:, 0] + cx) * scale
    t = (xy[:, 1] + cy) * scale
    suv = np.stack([s, t], axis=-1)
    # world position at mid height, per tile (vectorized per side)
    pos = np.zeros((F, 3))
    for sd in range(6):
        m = side == sd
        if not m.any():
            continue
        local = local_position_from_side_uv(sd, suv[m])
        unit = local / np.linalg.norm(local, axis=-1, keepdims=True)
        pos[m] = (R + h_mid) * unit  # sphere at origin
    d = np.linalg.norm(pos - view[None, :], axis=-1)
    dmax = np.maximum(dmax, d)

target_at_dmax = np.log2(2.0 * morph_distance) - np.log2(np.maximum(dmax, 1e-9))
morphing = (lod > 0) & (lod + morph_range > target_at_dmax) & live

T = 64
steps = F // T
livemask = live.reshape(steps, T)
morphmask = morphing.reshape(steps, T)
live_steps = livemask.any(axis=1)
morph_free_steps = live_steps & ~morphmask.any(axis=1)
print(f"tiles: {cnt} live; morphing tiles: {int(morphing.sum())} "
      f"({100*morphing.sum()/max(cnt,1):.1f}% of live)")
print(f"steps: {int(live_steps.sum())} live of {steps}; "
      f"fully-morph-free live steps: {int(morph_free_steps.sum())} "
      f"({100*morph_free_steps.sum()/max(live_steps.sum(),1):.1f}%)")
# distribution of morphing tiles per live step
mcounts = morphmask.sum(axis=1)[live_steps]
print("morphing tiles per live step:", np.percentile(mcounts, [0, 25, 50, 75, 100]))
