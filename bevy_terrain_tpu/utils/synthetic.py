"""Synthetic terrain dataset generation.

Writes reference-format tile payloads (raw ``.bin`` + ``config.tc``) for an
analytic height function, so the streaming/rendering stack can be exercised
and golden-tested without real imagery. The payload layout matches the
reference's disk format exactly (SURVEY.md section 2 "Tile payload files").
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np

from bevy_terrain_tpu.config import AttachmentConfig
from bevy_terrain_tpu.formats.tc import TC
from bevy_terrain_tpu.math.coordinate import TileCoordinate
from bevy_terrain_tpu.terrain_data.attachment import data_to_bytes


def default_height_fn(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Smooth analytic normalized height in [0, 1]: a few sine octaves."""
    h = (
        0.5
        + 0.25 * np.sin(2 * np.pi * 3 * u) * np.cos(2 * np.pi * 2 * v)
        + 0.15 * np.sin(2 * np.pi * 7 * (u + v))
        + 0.10 * np.cos(2 * np.pi * 5 * (u - 0.5) * (v - 0.5) * 4)
    )
    return np.clip(h, 0.02, 1.0)  # keep away from 0 (nodata sentinel)


def tile_payload(
    coordinate: TileCoordinate,
    attachment: AttachmentConfig,
    height_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] = default_height_fn,
) -> np.ndarray:
    """Evaluate the analytic field over one tile incl. its border texels."""
    size = attachment.texture_size
    b = attachment.border_size
    center = attachment.center_size
    count = TileCoordinate.count(coordinate.lod)
    p = np.arange(size)
    # texel centers; border texels sample outside the tile (clamped to the
    # terrain so edge tiles stay consistent with clamp-repeat stitching)
    tu = (p - b + 0.5) / center
    u = np.clip((coordinate.x + tu) / count, 0.0, 1.0)
    v = np.clip((coordinate.y + tu) / count, 0.0, 1.0)
    uu, vv = np.meshgrid(u, v, indexing="xy")  # row=v(y), col=u(x)
    h = height_fn(uu, vv)
    max_value = attachment.format.max_value
    return (h * max_value).astype(attachment.format.dtype)[..., None]


def generate_planar_dataset(
    path: str,
    lod_count: int,
    attachment: AttachmentConfig,
    height_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] = default_height_fn,
    root: str = "assets",
) -> list[TileCoordinate]:
    """Write all tiles of a planar terrain for lods 0..lod_count-1.

    Layout: ``{root}/{path}/data/{name}/{side}_{lod}_{x}_{y}.bin`` +
    ``{root}/{path}/config.tc`` (reference tile_atlas.rs:107-109,605-612).
    """
    data_dir = Path(root) / path / "data" / attachment.name
    data_dir.mkdir(parents=True, exist_ok=True)
    tiles = []
    for lod in range(lod_count):
        count = TileCoordinate.count(lod)
        for y in range(count):
            for x in range(count):
                c = TileCoordinate(0, lod, x, y)
                payload = tile_payload(c, attachment, height_fn)
                (data_dir / f"{c}.bin").write_bytes(data_to_bytes(payload))
                tiles.append(c)
    TC(sorted(tiles)).save_file(Path(root) / path / "config.tc")
    return tiles
