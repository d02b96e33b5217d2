"""Math / geometry model (L0).

Pure math over the terrain shapes (planar / sphere / ellipsoid), the
cube-sphere coordinate mapping with the algebraic-sigmoid warp, tile
coordinate algebra, and the per-view second-order Taylor approximation.

Host code is numpy f64 (matching the reference's ``DVec3``/``DVec2`` CPU
math); device code is f32 jnp sharing the same formula helpers.

Reference: /root/reference/src/math/ (mod.rs, coordinate.rs,
terrain_model.rs, ellipsoid.rs).
"""

from bevy_terrain_tpu.math.coordinate import (
    C_SQR,
    Coordinate,
    TileCoordinate,
    INVALID_LOD,
    INVALID_TILE,
)
from bevy_terrain_tpu.math.terrain_model import TerrainModel
from bevy_terrain_tpu.math.approximation import TerrainModelApproximation
from bevy_terrain_tpu.math.ellipsoid import project_point_ellipsoid

__all__ = [
    "C_SQR",
    "Coordinate",
    "INVALID_LOD",
    "INVALID_TILE",
    "TerrainModel",
    "TerrainModelApproximation",
    "TileCoordinate",
    "project_point_ellipsoid",
]
