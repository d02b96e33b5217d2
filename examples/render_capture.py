"""Render terrain views to PNG images with the TPU-native rasterizer.

The reference's examples open a bevy window and rasterize on the GPU;
this is the same visual result as files — per-pixel PBR shading plus the
debug views (debug.wgsl's palette) — produced entirely by
``bevy_terrain_tpu.render.raster`` (binning + MXU edge functions +
perspective-correct resolve).

    python examples/render_capture.py [--assets DIR] [--out DIR] [--size N]
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
    StandardMaterial,
    Terrain,
    TerrainConfig,
    TerrainModel,
    TerrainViewConfig,
    render_view,
)
from bevy_terrain_tpu.math.frustum import view_projection
from bevy_terrain_tpu.utils.synthetic import generate_planar_dataset

SIZE = 1000.0
HEIGHT = 180.0


def terrain_height(u, v):
    ridge = np.abs(np.sin(2 * np.pi * 1.5 * u) * np.cos(2 * np.pi * 1.0 * v))
    bowl = ((u - 0.5) ** 2 + (v - 0.5) ** 2) * 1.2
    return np.clip(0.25 + 0.55 * ridge - bowl, 0.02, 1.0)


def save_png(img, path):
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr, "RGBA").save(path)
    print(f"wrote {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="assets")
    ap.add_argument("--out", default="captures")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    Path(args.out).mkdir(parents=True, exist_ok=True)

    att = AttachmentConfig(
        name="height", texture_size=512, border_size=2, mip_level_count=4,
        format=AttachmentFormat.R16,
    )
    generate_planar_dataset(
        "terrains/capture", 3, att, height_fn=terrain_height,
        root=args.assets,
    )
    config = TerrainConfig(
        lod_count=3,
        model=TerrainModel.planar(np.zeros(3), SIZE, 0.0, HEIGHT),
        atlas_size=64, path="terrains/capture", attachments=(att,),
        assets_root=args.assets,
    )
    terrain = Terrain(config)
    # density matched to the capture resolution (see rasterize_grid's
    # sizing note): ~size/128 tiles of 16x16 quads across the view
    terrain.add_view(
        "cam",
        TerrainViewConfig(tile_capacity=2048, morph_distance=8.0),
        queue_capacity=4096,
    )

    eye = np.array([-320.0, 260.0, -420.0])
    target = np.array([60.0, 0.0, 40.0])
    out = None
    for _ in range(60):
        out = terrain.update({"cam": eye})["cam"]
        if not terrain.atlas.state.to_load and not any(
            a.loading for a in terrain.atlas.attachments
        ):
            break
        time.sleep(0.02)
    out = terrain.update({"cam": eye})["cam"]
    print(f"tiles={out.tile_count} overflow={out.overflow}")

    vp = view_projection(
        eye=eye, target=target, fov_y=np.radians(55.0),
        aspect=1.0, near=0.5,
    )
    uniforms, cfg = terrain.frame_inputs("cam")
    import jax.numpy as jnp

    vp32 = jnp.asarray(vp, jnp.float32)
    W = H = args.size
    knobs = dict(bin_px=16, bin_cap=512)

    from bevy_terrain_tpu import DirectionalLight, gradient_material

    # PBR radiometric output is unexposed linear light (bevy tonemaps);
    # boost illuminance + ambient so the raw capture reads well
    material = StandardMaterial(
        base_color=gradient_material(),
        metallic=0.05, perceptual_roughness=0.85,
        lights=(DirectionalLight(illuminance=3.0),),
        ambient=(0.18, 0.18, 0.2),
    )
    t0 = time.perf_counter()
    img, raster = render_view(
        out.mesh, out.tiles, uniforms, cfg, vp32, W, H,
        material=material,
        shade_mode="pixel", background=(0.35, 0.55, 0.9, 1.0), **knobs,
    )
    img.block_until_ready()
    print(
        f"per-pixel PBR {W}x{H}: {time.perf_counter() - t0:.2f}s wall "
        f"(incl. compile), coverage {float(np.asarray(raster.covered).mean()):.2f}, "
        f"bin_overflow {int(raster.bin_overflow)}"
    )
    save_png(img, Path(args.out) / "terrain_pbr.png")

    for view in ("geometry_lod", "uv"):
        img_d, _ = render_view(
            out.mesh, out.tiles, uniforms, cfg, vp32, W, H,
            debug_view=view, background=(0.1, 0.1, 0.12, 1.0), **knobs,
        )
        save_png(img_d, Path(args.out) / f"terrain_{view}.png")


if __name__ == "__main__":
    main()
