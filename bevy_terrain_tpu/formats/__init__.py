"""On-disk formats, bit-compatible with the reference for golden diffs.

* :mod:`tc`   — the ``config.tc`` tile manifest (bincode 2 "standard"
  encoding of ``TC { tiles: Vec<TileCoordinate> }``, reference
  src/formats/mod.rs:8-36)
* tile payloads — raw little-endian pixel bytes per (attachment, tile) at
  ``{path}/data/{name}/{side}_{lod}_{x}_{y}.bin`` (reference
  src/terrain_data/tile_atlas.rs:107-109,134-138); handled by
  terrain_data/attachment.py
* :mod:`tiff` — source imagery loader (reference src/formats/tiff.rs)
"""

from bevy_terrain_tpu.formats.tc import TC

__all__ = ["TC"]
