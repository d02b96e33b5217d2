"""Data-parallel multi-view frame step over a device mesh.

Each view (camera, shadow-casting light, ...) is independent given the
shared atlas: the reference runs them serially on one GPU
(tiling_prepass.rs:228 per (terrain, view)); here the views axis shards
across devices with ``shard_map`` — the atlas slab and static config are
replicated, per-view uniforms and outputs are sharded. Collectives only
enter through the (optional) sharded-atlas path, so the step scales along
ICI without cross-device traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bevy_terrain_tpu.ops import meshgen, refinement
from bevy_terrain_tpu.ops.params import StaticTerrainConfig


def stack_uniforms(uniform_list):
    """Stack per-view FrameUniforms pytrees along a leading views axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *uniform_list)


def multi_view_frame_step(
    devices,
    cfg: StaticTerrainConfig,
    uniforms,
    slab,
    views_per_device: int = 1,
    attachment_scale: float = 124 / 128,
    attachment_offset: float = 2 / 128,
):
    """Run one frame step for ``len(devices) * views_per_device`` views.

    ``uniforms`` is a single view's FrameUniforms; it is tiled to all views
    (callers with real distinct views pass a pre-stacked pytree through
    :func:`stack_uniforms` instead — see ``MultiViewTerrain``).

    Returns (positions, heights, tile_counts) with a leading views axis
    sharded over the mesh.
    """
    n_views = len(devices) * views_per_device
    mesh = Mesh(np.asarray(devices), ("views",))

    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_views,) + x.shape), uniforms
    )
    stacked = jax.device_put(stacked, NamedSharding(mesh, P("views")))
    slab = jax.device_put(slab, NamedSharding(mesh, P()))

    def one_view(height_slab, u):
        tiles = refinement.refine_tiles(u, cfg)
        mesh_out = meshgen.generate_mesh(
            tiles, height_slab, u, cfg, attachment_scale, attachment_offset
        )
        return mesh_out.positions, mesh_out.heights, tiles.tile_count

    def sharded(height_slab, us):
        # us: (views_per_device, ...) local shard
        return jax.vmap(lambda u: one_view(height_slab, u))(us)

    step = jax.jit(
        jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(), P("views")),
            out_specs=P("views"),
            check_vma=False,
        )
    )
    return step(slab, stacked)
