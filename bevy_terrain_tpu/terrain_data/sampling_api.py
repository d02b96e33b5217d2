"""Public CPU sampling API — gameplay/collision-style terrain queries.

Behavioral twin of ``sample_attachment`` / ``sample_height``
(/root/reference/src/terrain_data/mod.rs:267-307): project the query point
onto the surface, pick the blend lod from view distance, look up the best
loaded tile(s), bilinear-sample and blend. Host numpy f64 path; for batched
device queries use ops.sampling on the slabs directly.
"""

from __future__ import annotations

import numpy as np


def sample_attachment(tile_tree, tile_atlas, attachment_index: int, sample_world_position):
    """Reference terrain_data/mod.rs:267-295."""
    model = tile_atlas.model
    surface_position = model.surface_position(
        np.asarray(sample_world_position, np.float64),
        float(tile_tree.approximate_height),
    )
    lod, blend_ratio = tile_tree.compute_blend(surface_position)

    atlas_index, _, atlas_uv = tile_tree.lookup_tile(surface_position, lod)
    value = tile_atlas.sample_attachment_host(attachment_index, atlas_index, atlas_uv)

    if blend_ratio > 0.0:
        atlas_index2, _, atlas_uv2 = tile_tree.lookup_tile(surface_position, lod - 1)
        value2 = tile_atlas.sample_attachment_host(attachment_index, atlas_index2, atlas_uv2)
        value = value + (value2 - value) * blend_ratio
    return value


def sample_height(tile_tree, tile_atlas, sample_world_position) -> float:
    """Reference terrain_data/mod.rs:297-307."""
    model = tile_atlas.model
    h = sample_attachment(tile_tree, tile_atlas, 0, sample_world_position)[0]
    return float(model.min_height + (model.max_height - model.min_height) * h)
