"""Generate the committed golden fixtures (tests/goldens/*.npz).

SURVEY section 4 / BASELINE's bit-comparability north star: with cargo
unavailable, the anchor for cross-round regressions is a COMMITTED capture
of node-selection lists and strip-order mesh buffers on fixed camera
frames, produced by this script and compared exactly (integers) /
tightly (f32 buffers) by tests/test_goldens.py every run.

Regenerate ONLY when a change intentionally alters node selection or mesh
output, and say so in the commit: ``python tools/make_goldens.py``.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def node_selection_cases():
    """Pure-refinement cases: (name, model, view, lods, caps)."""
    from bevy_terrain_tpu.math import TerrainModel

    planar = TerrainModel.planar(np.array([0.0, -100.0, 0.0]), 1000.0, 0.0, 250.0)
    sphere = TerrainModel.sphere(np.zeros(3), 6.4e6, 0.0, 9000.0)
    return [
        ("nodes_planar_overview", planar, np.array([100.0, 50.0, -200.0]), 8),
        ("nodes_planar_ground", planar, np.array([-380.0, -70.0, 310.0]), 8),
        (
            "nodes_sphere_approach",
            sphere,
            sphere.position_local_to_world(
                np.array([0.35, 0.2, 0.91]) / np.linalg.norm([0.35, 0.2, 0.91]),
                3000.0,
            ),
            8,
        ),
    ]


def refine_nodes(model, view, lods):
    import jax

    from bevy_terrain_tpu.config import TerrainViewConfig
    from bevy_terrain_tpu.ops import refinement
    from tests.test_ops import build_frame

    vc = TerrainViewConfig(tile_capacity=32768)
    cfg, uniforms = build_frame(model, vc, view, lods, queue_capacity=32768)
    tiles = jax.jit(refinement.refine_tiles, static_argnames="cfg")(uniforms, cfg)
    n = int(tiles.tile_count)
    assert int(tiles.overflow) == 0
    nodes = np.stack(
        [
            np.asarray(tiles.tile_side[:n]),
            np.asarray(tiles.tile_lod[:n]),
            np.asarray(tiles.tile_xy[:n, 0]),
            np.asarray(tiles.tile_xy[:n, 1]),
        ],
        axis=-1,
    ).astype(np.int32)
    # a tile list is a set: canonicalize by lexicographic sort
    order = np.lexsort(nodes.T[::-1])
    return nodes[order]


def mesh_case(tmp_root):
    """Streamed planar frame -> (sorted nodes, strip-order heights/positions)."""
    from bevy_terrain_tpu import (
        AttachmentConfig, Terrain, TerrainConfig, TerrainModel, TerrainViewConfig,
    )
    from bevy_terrain_tpu.ops import meshgen
    from bevy_terrain_tpu.utils.synthetic import generate_planar_dataset

    att = AttachmentConfig(
        name="height", texture_size=512, border_size=2, mip_level_count=4
    )
    generate_planar_dataset("terrains/golden", 3, att, root=str(tmp_root))
    config = TerrainConfig(
        lod_count=3,
        model=TerrainModel.planar(np.zeros(3), 1000.0, 0.0, 100.0),
        atlas_size=128, path="terrains/golden", attachments=(att,),
        assets_root=str(tmp_root),
    )
    terrain = Terrain(config)
    terrain.add_view(
        "cam",
        TerrainViewConfig(tile_capacity=512, morph_distance=4.0, blend_distance=1.5),
        queue_capacity=2048,
    )
    view = np.array([-120.0, 90.0, 160.0])
    for _ in range(60):
        out = terrain.update({"cam": view})
        if not terrain.atlas.state.to_load and not any(
            a.loading for a in terrain.atlas.attachments
        ):
            break
        time.sleep(0.01)
    out = terrain.update({"cam": view})["cam"]
    n = out.tile_count
    assert out.overflow == 0
    nodes = np.stack(
        [
            np.asarray(out.tiles.tile_side[:n]),
            np.asarray(out.tiles.tile_lod[:n]),
            np.asarray(out.tiles.tile_xy[:n, 0]),
            np.asarray(out.tiles.tile_xy[:n, 1]),
        ],
        axis=-1,
    ).astype(np.int32)
    order = np.lexsort(nodes.T[::-1])
    cfg = terrain._static_cfgs["cam"]
    heights = meshgen.grid_to_strip_order(out.mesh.heights, cfg)[:n][order]
    positions = meshgen.grid_to_strip_order(out.mesh.positions, cfg)[:n][order]
    return nodes[order], heights.astype(np.float32), positions.astype(np.float32)


def main() -> None:
    # goldens are platform-pinned: generated AND compared on the CPU
    # backend (the tests run under conftest's CPU forcing; TPU f32 output
    # is validated against these separately with tolerances)
    import jax

    jax.config.update("jax_platforms", "cpu")
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for name, model, view, lods in node_selection_cases():
        nodes = refine_nodes(model, view, lods)
        np.savez_compressed(GOLDEN_DIR / f"{name}.npz", nodes=nodes)
        print(f"{name}: {len(nodes)} nodes")
    with tempfile.TemporaryDirectory() as tmp:
        nodes, heights, positions = mesh_case(Path(tmp))
    np.savez_compressed(
        GOLDEN_DIR / "mesh_planar_streamed.npz",
        nodes=nodes, heights=heights, positions=positions,
    )
    print(f"mesh_planar_streamed: {len(nodes)} tiles, strip {heights.shape}")


if __name__ == "__main__":
    main()
