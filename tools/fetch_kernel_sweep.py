"""Experiment: packed-block Pallas fetch kernel — correctness + timing.

Usage: python exp_tps.py <tiles_per_step>
Cross-checks fetch_resample against the XLA fallback on the same packed
storage, then prints device time for an 8192-tile fetch on the real TPU.
"""
import sys
import time

from pathlib import Path
import numpy as np
import sys as _sys
_sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    tps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    import bevy_terrain_tpu.ops.pallas_kernels as pk
    import bevy_terrain_tpu.ops.patch_sampling as ps
    from bevy_terrain_tpu.ops.params import StaticTerrainConfig
    from bevy_terrain_tpu.utils.timing import device_time_ms

    pk.TILES_PER_STEP = tps

    rng = np.random.default_rng(0)
    N, F = int(sys.argv[2]) if len(sys.argv) > 2 else 4096, 8192
    g = 8  # pretend one mip of g*g blocks per run for quad adjacency
    blocks = ps.quad_rows(
        rng.integers(0, 30000, size=(N, 32, 32)).astype(np.int32), g
    )
    tl = rng.integers(0, N - g - 2, size=(F,)).astype(np.int32)
    ids = np.stack([tl, tl + 1, tl + g, tl + g + 1], axis=-1).astype(np.int32)
    geom = np.concatenate(
        [
            rng.uniform(0, 30, size=(F, 2)).astype(np.float32),
            rng.uniform(0.5, 1.0, size=(F, 1)).astype(np.float32),
            np.ones((F, 1), np.float32),
            rng.uniform(0.0, 1.0, size=(F, 1)).astype(np.float32),  # blend ratio
            np.zeros((F, 3), np.float32),
        ],
        axis=1,
    )
    fmt = pk.block_format()
    blocks_d = jax.device_put(jnp.asarray(blocks), fmt)
    ids_d = jax.device_put(jnp.asarray(ids))
    geom_d = jax.device_put(jnp.asarray(geom))

    fn = jax.jit(
        pk.fetch_resample,
        static_argnames=("interpret",),
        in_shardings=(fmt, None, None),
    )
    t0 = time.time()
    out = np.asarray(jax.block_until_ready(fn(blocks_d, ids_d, geom_d)))
    print(f"tps={tps} compile+run wall: {time.time() - t0:.1f}s", file=sys.stderr)

    # correctness vs the XLA fallback (same packed storage)
    cfg_like = StaticTerrainConfig(
        spherical=False, side_count=1, lod_count=1, tree_size=1, grid_size=16,
        refinement_count=1, queue_capacity=8, tile_capacity=8, origin_lod=0,
    )
    patch = ps.fetch_patches_xla(jnp.asarray(blocks), jnp.asarray(ids))
    want = np.asarray(
        ps.halfgrid_resample(
            patch, jnp.asarray(geom[:, :2]), jnp.asarray(geom[:, 2]), cfg_like,
            ratio=jnp.asarray(geom[:, 4]),
        )
    )
    err = np.max(np.abs(out - want))
    print(f"tps={tps} max |pallas - xla| = {err:.6f}")
    assert err < 1e-2, "packed kernel mismatch"

    ms = device_time_ms(lambda: fn(blocks_d, ids_d, geom_d))
    print(f"tps={tps} device: {ms * 1000:.1f} us for F={F}")


if __name__ == "__main__":
    main()
