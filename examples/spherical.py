"""Cube-sphere planet: preprocess six faces and orbit a camera.

Twin of reference examples/spherical.rs + preprocess_spherical.rs. With no
arguments it synthesizes six 1024^2 faces of an analytic planet first.

    python examples/spherical.py [--assets DIR] [--frames N]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_terrain_tpu import (
    AttachmentConfig,
    AttachmentFormat,
    Preprocessor,
    SphericalDataset,
    Terrain,
    TerrainConfig,
    TerrainModel,
    TerrainViewConfig,
)
from bevy_terrain_tpu.debug import ApproachCamera
from bevy_terrain_tpu.formats.tiff import array_to_source
from bevy_terrain_tpu.math.coordinate import local_position_from_side_uv, sigmoid_warp_forward
from bevy_terrain_tpu.terrain_data import TileAtlas

PATH = "terrains/spherical"


def dataclasses_replace_path(config, path):
    import dataclasses

    return dataclasses.replace(config, path=path)
RADIUS = 6.371e6
MIN_HEIGHT, MAX_HEIGHT = 0.0, 9000.0
LOD_COUNT = 4
TEXTURE_SIZE = 512


def planet_height(p):
    """Analytic normalized planet heights from a unit-sphere position."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    h = (
        0.45
        + 0.25 * np.sin(3 * x + 1) * np.cos(4 * y)
        + 0.18 * np.sin(5 * z + 2) * np.sin(2 * x * y + 0.5)
        + 0.08 * np.cos(11 * (x + y + z))
    )
    return np.clip(h, 0.02, 1.0)


def synthesize_faces(out_dir: Path, n: int = 1024) -> list[str]:
    paths = []
    uv = (np.arange(n) + 0.5) / n
    uu, vv = np.meshgrid(uv, uv, indexing="xy")
    grid_uv = np.stack([uu, vv], axis=-1)
    for side in range(6):
        p = local_position_from_side_uv(side, grid_uv)
        path = out_dir / f"face{side}.png"
        if not path.exists():
            array_to_source(planet_height(p), path)
        paths.append(str(path))
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="assets")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument(
        "--ellipsoid", action="store_true",
        help="WGS84-like ellipsoid (reference examples/spherical.rs:6-11) "
        "instead of a sphere; the approach descends to 3 km so deep "
        "geometry lods + the Taylor relative path are exercised",
    )
    ap.add_argument("--lods", type=int, default=None,
                    help="lod_count override (ellipsoid default 16)")
    args = ap.parse_args()

    if args.ellipsoid:
        model = TerrainModel.ellipsoid(
            np.zeros(3), 6_378_137.0, 6_356_752.3, MIN_HEIGHT, MAX_HEIGHT
        )
        lod_count = args.lods or 16
    else:
        model = TerrainModel.sphere(np.zeros(3), RADIUS, MIN_HEIGHT, MAX_HEIGHT)
        lod_count = args.lods or LOD_COUNT
    config = TerrainConfig(
        lod_count=lod_count,
        model=model,
        atlas_size=2048,
        path=PATH,
        assets_root=args.assets,
    ).add_attachment(
        AttachmentConfig(
            name="height", texture_size=TEXTURE_SIZE, border_size=2,
            mip_level_count=4, format=AttachmentFormat.R16,
        )
    )

    PATH_ACTUAL = PATH + ("_ellipsoid" if args.ellipsoid else "")
    config = dataclasses_replace_path(config, PATH_ACTUAL)
    manifest = Path(args.assets) / PATH_ACTUAL / "config.tc"
    if not manifest.exists():
        src_dir = Path(args.assets) / "source"
        src_dir.mkdir(parents=True, exist_ok=True)
        print("synthesizing six cube faces...")
        paths = synthesize_faces(src_dir)
        atlas = TileAtlas(config)
        Preprocessor(atlas).clear_attachment(0).preprocess_spherical(
            SphericalDataset(
                attachment_index=0, paths=paths,
                lod_range=range(0, min(lod_count, LOD_COUNT)),
            )
        ).run()

    terrain = Terrain(config)
    terrain.add_view("camera", TerrainViewConfig(tile_capacity=8192),
                     queue_capacity=32768, culling=True)
    terrain.set_shading(lighting=True)

    from bevy_terrain_tpu.math.frustum import view_projection

    cam = ApproachCamera(
        target=np.zeros(3), start_distance=3.0 * RADIUS,
        end_distance=RADIUS + (3_000.0 if args.ellipsoid else 20_000.0),
    )
    times = []
    for i, view in enumerate(cam.path(args.frames)):
        # 60-degree frustum looking at the planet: out-of-view subtrees
        # are culled inside refinement (the reference declares but never
        # populates its culling planes)
        vp = view_projection(view, np.zeros(3), np.pi / 3, 16 / 9)
        t0 = time.perf_counter()
        out = terrain.update({"camera": view}, {"camera": vp})["camera"]
        times.append(time.perf_counter() - t0)
        if i % 10 == 0:
            print(
                f"frame {i:3d}: dist={np.linalg.norm(view) - RADIUS:12.0f} m "
                f"tiles={out.tile_count:5d} resident={len(terrain.atlas.state.tile_states):4d} "
                f"wall={times[-1] * 1e3:8.2f} ms"
            )
    steady = np.median(times[len(times) // 2 :]) * 1e3
    print(f"steady-state frame: {steady:.2f} ms wall")

    # batched device-side surface queries under the final camera
    d = view / np.linalg.norm(view)
    pts = np.outer(np.linspace(0.999, 1.001, 8), d * RADIUS)
    hs = np.asarray(terrain.query_heights("camera", pts))
    print(f"query_heights along the boresight: {hs.round(1)}")


if __name__ == "__main__":
    main()
