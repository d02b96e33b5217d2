"""Terrain data layer (L1/L2): TileTree + TileAtlas with device slabs.

See the reference's module docs (src/terrain_data/mod.rs:1-16): each
terrain has one TileAtlas (sparse streaming attachment store); each
(terrain, view) pair has a TileTree deciding which tiles to load and
providing best-loaded lookup. Here the GPU mirrors (gpu_tile_tree.rs,
gpu_tile_atlas.rs) collapse into device-resident jax arrays owned by the
same objects.
"""

from bevy_terrain_tpu.terrain_data.tile_atlas import (
    AtlasAttachment,
    AtlasTileAttachment,
    INVALID_ATLAS_INDEX,
    INVALID_LOD,
    TileAtlas,
    TileAtlasState,
)
from bevy_terrain_tpu.terrain_data.tile_tree import TileTree

__all__ = [
    "AtlasAttachment",
    "AtlasTileAttachment",
    "INVALID_ATLAS_INDEX",
    "INVALID_LOD",
    "TileAtlas",
    "TileAtlasState",
    "TileTree",
]
