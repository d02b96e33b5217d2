"""Level-synchronous UDLOD tile refinement — refine_tiles.wgsl twin.

The reference runs an atomics-based ping-pong work queue on the GPU
(/root/reference/src/shaders/tiling_prepass/refine_tiles.wgsl:5-44 with the
indirect-dispatch bookkeeping of prepare_prepass.wgsl:4-44 and the host loop
of src/render/tiling_prepass.rs:204-271). All tiles in the queue at pass k
have lod == k (roots seed at lod 0, each pass emits lod k+1 children), so
the algorithm is level-synchronous by construction.

TPU version: dense per-level tile tensors with masked lanes; prefix-sum
compaction replaces the atomic counters (removing the race surface
entirely, see SURVEY.md section 5); a bounded `lax.while_loop` replaces the
indirect dispatch chain. Static shapes: the queue holds `queue_capacity`
lanes, the final list `tile_capacity` (the reference's own hard cap is
geometry_tile_count, terrain_view.rs:23-25); overflow is masked, never
reallocated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bevy_terrain_tpu.ops import coords
from bevy_terrain_tpu.ops.params import FrameUniforms, StaticTerrainConfig


class RefinementOutput(NamedTuple):
    """Compacted final tile list (the reference's ``final_tiles`` buffer +
    indirect vertex count, prepare_prepass.wgsl:38-44)."""

    tile_side: jax.Array  # (tile_capacity,) i32
    tile_lod: jax.Array  # (tile_capacity,) i32
    tile_xy: jax.Array  # (tile_capacity, 2) i32
    tile_count: jax.Array  # () i32


def should_be_divided(side, lod, xy, uniforms: FrameUniforms, cfg: StaticTerrainConfig):
    """Subdivision predicate (refine_tiles.wgsl:17-22): the view distance to
    the closest point of the tile is below ``subdivision_distance / 2^lod``."""
    uv = coords.compute_subdivision_coordinate(
        side, lod, xy, uniforms.taylor, cfg.origin_lod
    )
    view_distance = coords.approximate_view_distance(side, lod, xy, uv, uniforms, cfg)
    return view_distance < uniforms.subdivision_distance / coords.tile_count(lod)


def refine_tiles(uniforms: FrameUniforms, cfg: StaticTerrainConfig) -> RefinementOutput:
    """Run the full refinement: seed roots, iterate subdivision, compact.

    Root seeding mirrors prepare_prepass.wgsl:4-23 (1 root planar, 6
    spherical); iteration count mirrors the host dispatch loop
    (tiling_prepass.rs:248-263, default refinement_count 30), with early
    exit once the queue drains.
    """
    Q = cfg.queue_capacity
    F = cfg.tile_capacity

    lane = jnp.arange(Q, dtype=jnp.int32)

    # seed roots (side s, lod 0, xy (0,0))
    queue_side = jnp.where(lane < cfg.side_count, lane, 0).astype(jnp.int32)
    queue_xy = jnp.zeros((Q, 2), jnp.int32)
    queue_count = jnp.int32(cfg.side_count)

    final_side = jnp.zeros((F,), jnp.int32)
    final_lod = jnp.full((F,), -1, jnp.int32)
    final_xy = jnp.zeros((F, 2), jnp.int32)
    final_count = jnp.int32(0)

    def cond(state):
        k, q_side, q_xy, q_count, f_side, f_lod, f_xy, f_count = state
        return (k < cfg.refinement_count) & (q_count > 0)

    def body(state):
        k, q_side, q_xy, q_count, f_side, f_lod, f_xy, f_count = state
        lod = jnp.full((Q,), 0, jnp.int32) + k
        active = lane < q_count

        divide = should_be_divided(q_side, lod, q_xy, uniforms, cfg) & active
        # on the last pass everything still in flight goes to the final list
        # (the reference issues one trailing refine_tiles dispatch whose
        # children never run, tiling_prepass.rs:259-263; emitting the parents
        # instead keeps coverage without cracks)
        divide = divide & (k + 1 < cfg.refinement_count)
        emit = active & ~divide

        # --- compact emitted tiles into the final list (replaces the
        # final_index atomic, refine_tiles.wgsl:13-15) ---
        emit_i = emit.astype(jnp.int32)
        emit_pos = f_count + jnp.cumsum(emit_i) - 1
        emit_pos = jnp.where(emit, emit_pos, F)  # F == out of range -> drop
        f_side = f_side.at[emit_pos].set(q_side, mode="drop")
        f_lod = f_lod.at[emit_pos].set(lod, mode="drop")
        f_xy = f_xy.at[emit_pos].set(q_xy, mode="drop")
        f_count = jnp.minimum(f_count + jnp.sum(emit_i), F)

        # --- expand children of divided tiles (replaces the child_index
        # atomic, refine_tiles.wgsl:5-7, :24-31) ---
        div_i = divide.astype(jnp.int32)
        base = (jnp.cumsum(div_i) - 1) * 4  # first child lane per parent
        child_sub = jnp.arange(4, dtype=jnp.int32)  # (4,)
        child_pos = base[:, None] + child_sub[None, :]  # (Q, 4)
        child_pos = jnp.where(divide[:, None], child_pos, Q)
        child_xy = (
            (q_xy[:, None, :] << 1)
            + jnp.stack([child_sub & 1, child_sub >> 1], axis=-1)[None]
        )  # (Q, 4, 2) — refine_tiles.wgsl:26
        new_side = jnp.zeros_like(q_side).at[child_pos.reshape(-1)].set(
            jnp.broadcast_to(q_side[:, None], (Q, 4)).reshape(-1), mode="drop"
        )
        new_xy = jnp.zeros_like(q_xy).at[child_pos.reshape(-1)].set(
            child_xy.reshape(-1, 2), mode="drop"
        )
        new_count = jnp.minimum(4 * jnp.sum(div_i), Q)

        return (k + 1, new_side, new_xy, new_count, f_side, f_lod, f_xy, f_count)

    state = (
        jnp.int32(0),
        queue_side,
        queue_xy,
        queue_count,
        final_side,
        final_lod,
        final_xy,
        final_count,
    )
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, f_side, f_lod, f_xy, f_count = state
    return RefinementOutput(f_side, f_lod, f_xy, f_count)
