"""CDLOD-morphed terrain mesh generation — vertex.wgsl twin.

The reference pulls vertices in the vertex shader from the compacted tile
list (one indirect draw, vertices_per_tile x tile_count threads;
/root/reference/src/shaders/render/vertex.wgsl:30-98). TPU version: one
batched kernel over (tile_capacity, vertices_per_tile) lanes producing the
vertex buffers as dense tensors. Lanes beyond the live tile count are
masked to zero.

Outputs use the same degenerate-strip vertex ordering as the reference
(functions.wgsl:64-71) so morphed meshes are comparable buffer-for-buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bevy_terrain_tpu.ops import coords, sampling
from bevy_terrain_tpu.ops.params import FrameUniforms, StaticTerrainConfig
from bevy_terrain_tpu.ops.refinement import RefinementOutput


class MeshOutput(NamedTuple):
    positions: jax.Array  # (F, V, 3) f32 world positions
    normals: jax.Array  # (F, V, 3) f32 world normals (geometric, pre-height)
    uvs: jax.Array  # (F, V, 2) f32 morphed tile-space uv
    heights: jax.Array  # (F, V) f32 sampled terrain height
    tile_mask: jax.Array  # (F,) bool — lanes below tile_count


def vertex_grid_uv(cfg: StaticTerrainConfig):
    """Static per-vertex grid uv table (functions.wgsl:64-71)."""
    vid = jnp.arange(cfg.vertices_per_tile, dtype=jnp.int32)
    return coords.compute_tile_uv(vid, cfg)  # (V, 2)


def generate_mesh(
    tiles: RefinementOutput,
    height_slab,
    uniforms: FrameUniforms,
    cfg: StaticTerrainConfig,
    attachment_scale: float,
    attachment_offset: float,
) -> MeshOutput:
    """Per-(tile, vertex) morphed world position + height (vertex.wgsl:30-98).

    ``height_slab`` is attachment 0's mip-0 slab (A, H, W, 1) uint16.
    """
    F = cfg.tile_capacity
    V = cfg.vertices_per_tile

    side = tiles.tile_side[:, None]  # (F, 1)
    lod = tiles.tile_lod[:, None]
    xy = tiles.tile_xy[:, None, :]  # (F, 1, 2)
    side = jnp.broadcast_to(side, (F, V))
    lod_b = jnp.broadcast_to(jnp.maximum(lod, 0), (F, V))
    xy = jnp.broadcast_to(xy, (F, V, 2))
    tile_uv = jnp.broadcast_to(vertex_grid_uv(cfg)[None], (F, V, 2))

    # --- approximate view distance (vertex.wgsl:34-38) ---
    local = coords.compute_local_position(side, lod_b, xy, tile_uv, cfg.spherical)
    world = coords.position_local_to_world(local, uniforms.world_from_local)
    normal = coords.normal_local_to_world(local, uniforms.normal_matrix, cfg.spherical)
    view_distance = jnp.linalg.norm(
        world + uniforms.approximate_height * normal - uniforms.view_world_position,
        axis=-1,
    )

    if cfg.high_precision:
        # vertex.wgsl:40-55: refine the distance with the Taylor relative
        # position below the precision threshold
        relative = coords.compute_relative_position(
            side, lod_b, xy, tile_uv, uniforms.taylor, cfg.origin_lod
        )
        hp_distance = jnp.linalg.norm(
            relative + uniforms.approximate_height * normal, axis=-1
        )
        high_precision = view_distance < uniforms.precision_threshold_distance
        view_distance = jnp.where(high_precision, hp_distance, view_distance)

    # --- morph (vertex.wgsl:52-57, functions.wgsl:35-49) ---
    morphed_uv = coords.compute_morph(lod_b, tile_uv, view_distance, uniforms, cfg)

    morph_local = coords.compute_local_position(side, lod_b, xy, morphed_uv, cfg.spherical)
    morph_world = coords.position_local_to_world(morph_local, uniforms.world_from_local)
    morph_normal = coords.normal_local_to_world(
        morph_local, uniforms.normal_matrix, cfg.spherical
    )

    if cfg.high_precision:
        hp_relative = coords.compute_relative_position(
            side, lod_b, xy, morphed_uv, uniforms.taylor, cfg.origin_lod
        )
        hp_world = uniforms.view_world_position + hp_relative
        morph_world = jnp.where(high_precision[..., None], hp_world, morph_world)
        morph_normal = jnp.where(high_precision[..., None], normal, morph_normal)

    # --- height sample with blend between two atlas lods (vertex.wgsl:85-98) ---
    blend_lod, blend_ratio = coords.compute_blend(view_distance, uniforms, cfg)

    a_idx, a_lod, a_xy, a_uv = coords.lookup_tile(
        uniforms.entries, side, lod_b, xy, morphed_uv, blend_lod, cfg, lod_offset=0
    )
    height = sampling.sample_height(
        height_slab, a_idx, a_uv, uniforms, attachment_scale, attachment_offset
    )
    if cfg.blend:
        a_idx2, a_lod2, a_xy2, a_uv2 = coords.lookup_tile(
            uniforms.entries, side, lod_b, xy, morphed_uv, blend_lod, cfg, lod_offset=1
        )
        height2 = sampling.sample_height(
            height_slab, a_idx2, a_uv2, uniforms, attachment_scale, attachment_offset
        )
        height = jnp.where(
            blend_ratio > 0.0, height + (height2 - height) * blend_ratio, height
        )

    positions = morph_world + height[..., None] * morph_normal

    tile_mask = jnp.arange(F, dtype=jnp.int32) < tiles.tile_count
    mask3 = tile_mask[:, None, None]
    return MeshOutput(
        positions=jnp.where(mask3, positions, 0.0),
        normals=jnp.where(mask3, morph_normal, 0.0),
        uvs=jnp.where(mask3, morphed_uv, 0.0),
        heights=jnp.where(tile_mask[:, None], height, 0.0),
        tile_mask=tile_mask,
    )
