"""Attribute the merged mesh+RGBA kernel's albedo cost by ablation.

The 4-channel albedo adds ~1.6 ms to the 0.74 ms mesh step (bench.py 8k^2
scene, 2582 live tiles). Per tile that is 4 unpacks (shift/mask + mean),
12 small MXU dots, 12 sub-lane (33, 17) stores, and 4 window interps.
This harness removes each class statically (ops/pallas_kernels.py
`ablate`) and prints the deltas, deciding which wall to attack:

  merged_full   production merged kernel
  alb_no_store  dots kept, the 12 stores/tile collapsed to 1/step
  alb_no_dots   stores kept, resample dots removed
  alb_no_unpack channels read the raw word (no shift/mask)
  alb_no_interp phase-B color interps removed
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from multi_view_bench import build_scene  # noqa: E402


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bevy_terrain_tpu.ops import meshgen, refinement
    from bevy_terrain_tpu.ops.pallas_kernels import block_format
    from bevy_terrain_tpu.utils.timing import device_time_ms

    cfg, plan, blocks, u1, _ = build_scene()
    fmt = block_format()
    blocks = jax.device_put(blocks, fmt)
    rng = np.random.default_rng(7)
    packed_np = rng.integers(0, 2**32, blocks.shape, dtype=np.uint64).astype(
        np.uint32
    )
    albedo_packed = jax.device_put(jnp.asarray(packed_np.view(np.int32)), fmt)

    VARIANTS = [
        ("merged_full", frozenset()),
        ("alb_no_store", frozenset({"alb_no_store"})),
        ("alb_no_dots", frozenset({"alb_no_dots"})),
        ("alb_no_unpack", frozenset({"alb_no_unpack"})),
        ("alb_no_interp", frozenset({"alb_no_interp"})),
        ("no_dots+store", frozenset({"alb_no_dots", "alb_no_store"})),
    ]
    results = {}
    for name, abl in VARIANTS:
        def step(block_array, ap, u, abl=abl):
            tiles = refinement.refine_tiles(u, cfg)
            raw, tiles = meshgen.generate_mesh_fused(
                tiles, block_array, u, cfg, plan, 65535.0,
                albedo_blocks=ap, albedo_channels=4, albedo_bits=8,
                ablate=abl,
            )
            return tiles.tile_count, raw

        j = jax.jit(step, in_shardings=(fmt, fmt, None))
        cnt, _ = jax.block_until_ready(j(blocks, albedo_packed, u1))
        ms = device_time_ms(j, blocks, albedo_packed, u1, label=f"mabl_{name}")
        results[name] = ms
        print(f"{name:16s} {ms * 1e3:8.1f} us (tiles {int(cnt)})", flush=True)

    full = results["merged_full"]
    print("\nattribution (deltas vs merged_full):")
    for name, _ in VARIANTS[1:]:
        print(f"  {name:16s} -{(full - results[name]) * 1e3:7.1f} us")


if __name__ == "__main__":
    main()
