"""Preprocess six cube-face sources into a spherical tile dataset.

Twin of reference examples/preprocess_spherical.rs. Thin wrapper around the
preprocessing half of examples/spherical.py (which also renders).

    python examples/preprocess_spherical.py [--assets DIR]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_terrain_tpu import (
    AttachmentConfig,
    AttachmentFormat,
    Preprocessor,
    SphericalDataset,
    TerrainConfig,
    TerrainModel,
)
from bevy_terrain_tpu.terrain_data import TileAtlas
from spherical import LOD_COUNT, MAX_HEIGHT, MIN_HEIGHT, PATH, RADIUS, TEXTURE_SIZE, synthesize_faces


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="assets")
    args = ap.parse_args()

    config = TerrainConfig(
        lod_count=LOD_COUNT,
        model=TerrainModel.sphere(np.zeros(3), RADIUS, MIN_HEIGHT, MAX_HEIGHT),
        atlas_size=2048,
        path=PATH,
        assets_root=args.assets,
    ).add_attachment(
        AttachmentConfig(
            name="height", texture_size=TEXTURE_SIZE, border_size=2,
            mip_level_count=4, format=AttachmentFormat.R16,
        )
    )
    src_dir = Path(args.assets) / "source"
    src_dir.mkdir(parents=True, exist_ok=True)
    paths = synthesize_faces(src_dir)
    atlas = TileAtlas(config)
    Preprocessor(atlas).clear_attachment(0).preprocess_spherical(
        SphericalDataset(attachment_index=0, paths=paths, lod_range=range(0, LOD_COUNT))
    ).run()
    print(f"dataset at {args.assets}/{PATH} ({len(atlas.state.existing_tiles)} tiles)")


if __name__ == "__main__":
    main()
