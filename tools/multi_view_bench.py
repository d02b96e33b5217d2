"""Multi-view scale-out measurement (VERDICT r2 item 3).

Three measurements, all on the bench.py 8k^2 planar scene:

1. single-view fused frame (the headline path) — device time.
2. TWO distinct views on ONE chip, sharing one atlas block store, each
   running the fused Pallas kernel inside one jit — device time / 2 must
   be ~1x the single-view time (the kernel is step-serial; a second view
   adds its own steps and nothing else).
3. ``MultiViewTerrain`` with ``pallas_sampling=True`` on a 1-device mesh —
   proves the shard_map plumbing runs the fused kernel per mesh slot on
   the real backend (each device of a larger mesh runs this exact
   program; the views axis adds no cross-device traffic with a
   replicated atlas).

``--cpu`` instead checks the SCALING STRUCTURE on the virtual 8-device
mesh: the replicated-atlas multi-view step must compile to a program
with NO cross-device collectives (per-device cost is then independent
of mesh size — each chip runs the single-view program), while the
sharded-atlas step must show its psum/all-gather fetch. Wall-clock on
the virtual mesh is NOT evidence either way — the 8 "devices" share
one host's cores.

Usage: python tools/multi_view_bench.py [--cpu]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_scene(capacity=4096, queue=1024):
    import jax.numpy as jnp

    from bevy_terrain_tpu.config import TerrainViewConfig
    from bevy_terrain_tpu.math import TerrainModel, TerrainModelApproximation, frustum
    from bevy_terrain_tpu.ops import patch_sampling
    from bevy_terrain_tpu.ops import tile_tree as tile_tree_ops
    from bevy_terrain_tpu.ops.params import StaticTerrainConfig, make_frame_uniforms

    TEXTURE_SIZE, BORDER, LOD_COUNT, SIDE = 512, 2, 5, 8000.0
    model = TerrainModel.planar(np.zeros(3), SIDE, 0.0, 250.0)
    vc = TerrainViewConfig(tile_capacity=capacity)
    import jax

    cfg = StaticTerrainConfig(
        spherical=False, side_count=1, lod_count=LOD_COUNT,
        tree_size=vc.tree_size, grid_size=vc.grid_size,
        refinement_count=vc.refinement_count, queue_capacity=queue,
        tile_capacity=capacity, origin_lod=vc.origin_lod,
        pallas_sampling=jax.default_backend() == "tpu", culling=True,
    )

    def uniforms_for(view, toward):
        view_proj = frustum.view_projection(
            view, view + toward, np.pi / 3, 16 / 9
        )
        origins, vt_int, vt_frac = tile_tree_ops.compute_view_anchors(
            model, view, LOD_COUNT, vc.tree_size
        )
        approx = TerrainModelApproximation.compute(model, view, vc.origin_lod, 125.0)
        rng = np.random.default_rng(0)
        S, L, T = 1, LOD_COUNT, vc.tree_size
        entries = np.zeros((S, L, T, T, 2), np.int32)
        entries[..., 0] = rng.integers(0, 1024, (S, L, T, T))
        entries[..., 1] = np.arange(L)[None, :, None, None]
        return make_frame_uniforms(
            model, view, approx, origins, entries, vt_int, vt_frac, vc,
            view_proj=view_proj,
        )

    u1 = uniforms_for(
        np.array([SIDE * 0.03, 120.0, -SIDE * 0.02]),
        np.array([1000.0, -40.0, 300.0]),
    )
    u2 = uniforms_for(
        np.array([-SIDE * 0.11, 300.0, SIDE * 0.07]),
        np.array([-800.0, -60.0, 500.0]),
    )
    plan = patch_sampling.make_patch_plan(TEXTURE_SIZE, 4, BORDER)
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.integers(
            0, 65535, (1024 * plan.total_blocks_per_slot, 32, 128)
        ).astype(np.int32)
    )
    return cfg, plan, blocks, u1, u2


def main_tpu() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bevy_terrain_tpu.ops import meshgen, refinement
    from bevy_terrain_tpu.ops.pallas_kernels import block_format
    from bevy_terrain_tpu.utils.timing import device_time_ms

    cfg, plan, blocks, u1, u2 = build_scene()
    fmt = block_format()
    blocks = jax.device_put(blocks, fmt)

    def one_view(block_array, u):
        tiles = refinement.refine_tiles(u, cfg)
        raw, tiles = meshgen.generate_mesh_fused(
            tiles, block_array, u, cfg, plan, 65535.0
        )
        return tiles.tile_count, raw

    single = jax.jit(one_view, in_shardings=(fmt, None))

    def two_views(block_array, ua, ub):
        return one_view(block_array, ua), one_view(block_array, ub)

    double = jax.jit(two_views, in_shardings=(fmt, None, None))

    (c1, _), ((ca, _), (cb, _)) = (
        jax.block_until_ready(single(blocks, u1)),
        jax.block_until_ready(double(blocks, u1, u2)),
    )
    t1 = device_time_ms(single, blocks, u1, label="mv_single")
    t2 = device_time_ms(double, blocks, u1, u2, label="mv_double")
    print(
        f"single view: {t1 * 1e3:.1f} us ({int(c1)} tiles)\n"
        f"two views, one chip, shared atlas: {t2 * 1e3:.1f} us total, "
        f"{t2 / 2 * 1e3:.1f} us/view ({int(ca)}+{int(cb)} tiles) "
        f"-> per-view ratio {t2 / 2 / t1:.3f}x"
    )

    # shard_map plumbing proof: MultiViewTerrain with the fused kernel on a
    # 1-device mesh (each device of an N-mesh runs this same program)
    import tempfile

    from bevy_terrain_tpu.config import (
        AttachmentConfig, TerrainConfig, TerrainViewConfig,
    )
    from bevy_terrain_tpu.math import TerrainModel
    from bevy_terrain_tpu.parallel.multi_view import MultiViewTerrain
    from bevy_terrain_tpu.utils.synthetic import generate_planar_dataset

    root = tempfile.mkdtemp(prefix="mv_bench_")
    att = AttachmentConfig(
        name="height", texture_size=512, border_size=2, mip_level_count=4
    )
    generate_planar_dataset("terrains/mv", 3, att, root=root)
    config = TerrainConfig(
        lod_count=3,
        model=TerrainModel.planar(np.zeros(3), 8000.0, 0.0, 250.0),
        atlas_size=128, path="terrains/mv", attachments=(att,),
        assets_root=root,
    )
    mvt = MultiViewTerrain(
        config, ["cam"], devices=jax.devices()[:1],
        view_config=TerrainViewConfig(tile_capacity=1024),
        queue_capacity=1024,
    )
    assert mvt.cfg.pallas_sampling, "fused kernel not selected on TPU"
    positions = {"cam": np.array([240.0, 180.0, -160.0])}
    import time

    for _ in range(40):
        outs = mvt.update(positions)
        if not mvt.atlas.state.to_load and not any(
            a.loading for a in mvt.atlas.attachments
        ):
            break
        time.sleep(0.01)
    outs = mvt.update(positions)
    print(
        f"MultiViewTerrain fused-under-shard_map: ok, "
        f"{outs['cam'].tile_count} tiles"
    )


def main_cpu() -> None:
    import os

    # sitecustomize pre-imports jax (axon TPU platform); switch before the
    # backend initializes, as __graft_entry__.dryrun_multichip does
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, "virtual 8-device CPU mesh unavailable"
    import tempfile

    from bevy_terrain_tpu.config import (
        AttachmentConfig, TerrainConfig, TerrainViewConfig,
    )
    from bevy_terrain_tpu.math import TerrainModel
    from bevy_terrain_tpu.parallel.multi_view import MultiViewTerrain
    from bevy_terrain_tpu.utils.synthetic import generate_planar_dataset

    root = tempfile.mkdtemp(prefix="mv_struct_")
    att = AttachmentConfig(
        name="height", texture_size=512, border_size=2, mip_level_count=4
    )
    generate_planar_dataset("terrains/mvs", 3, att, root=root)
    config = TerrainConfig(
        lod_count=3,
        model=TerrainModel.planar(np.zeros(3), 8000.0, 0.0, 250.0),
        atlas_size=128, path="terrains/mvs", attachments=(att,),
        assets_root=root,
    )
    rng = np.random.default_rng(3)
    positions = {
        f"v{i}": np.array([
            rng.uniform(-300, 300), rng.uniform(80, 400), rng.uniform(-300, 300)
        ])
        for i in range(8)
    }

    COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
                   "all-to-all", "reduce-scatter")

    for shard_atlas in (False, True):
        mvt = MultiViewTerrain(
            config, list(positions), devices=jax.devices()[:8],
            view_config=TerrainViewConfig(
                tile_capacity=512, morph_distance=2.0, blend_distance=1.0
            ),
            queue_capacity=1024, shard_atlas=shard_atlas,
        )
        mvt.update(positions)
        # re-lower the exact dispatched step from the live instance's args
        hlo = mvt._step.lower(
            mvt._blocks, mvt._last_stacked
        ).compile().as_text()
        found = sorted({c for c in COLLECTIVES if c in hlo})
        label = "sharded-atlas" if shard_atlas else "replicated-atlas"
        if shard_atlas:
            assert found, "sharded-atlas step lost its collective fetch"
            print(f"{label}: collectives {found} (expected: the psum fetch)")
        else:
            assert not found, f"replicated-atlas step has collectives: {found}"
            print(
                f"{label}: NO cross-device collectives -> per-device cost "
                "is mesh-size-independent (each chip runs the single-view "
                "program; TPU per-view time measured in the default mode)"
            )


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main_cpu()
    else:
        main_tpu()
