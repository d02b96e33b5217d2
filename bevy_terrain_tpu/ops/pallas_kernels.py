"""Hand-written Pallas TPU kernels for the frame hot path.

:func:`fetch_resample` fuses the per-tile patch fetch with the half-grid
tent resample (see ops/patch_sampling.py for the algorithm): one grid step
per tile DMAs the four (32, 32) atlas blocks of the tile's window straight
into VMEM (double-buffered across grid steps by the Pallas pipeline via
scalar-prefetched block indices), assembles the 64x64 patch, builds the
tent-weight matrices on the VPU, and runs the two small matmuls on the MXU
— the 33x33 half-grid leaves the kernel, the patch never touches HBM.

This replaces four XLA ``take`` ops whose per-slice overhead (~320 ns)
dominated the frame (measured 10.5 ms at 8192 tiles; the kernel halves
that). Known headroom: batching several tiles per grid step would amortize
the ~0.5 us per-step pipeline overhead, but Mosaic compile time explodes
for the many-ref variant on this stack — revisit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def block_format(device=None):
    """The Format the fetch kernel's block operand must carry.

    XLA's layout assignment otherwise picks a transposed {0,2,1} parameter
    layout and inserts a whole-array relayout copy per frame (measured
    2.9 ms for a 1024-slot atlas). Pin row-major on both the stored array
    and the jit parameter.
    """
    import jax as _jax
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    device = device or _jax.devices()[0]
    return Format(
        Layout(major_to_minor=(0, 1, 2)), SingleDeviceSharding(device)
    )

HG = 32  # half-grid intervals (grid_size 16); kernel is specialized for this
K = HG + 1  # 33 half-grid points
P = 64  # assembled patch extent

# Scalar-prefetch operands live in SMEM; grids beyond ~1024 tiles overflow
# it (observed compile failure at 2048 on v5e), so larger frames run the
# kernel over serial 1024-tile chunks via lax.map.
CHUNK = 1024


def _kernel(ids_ref, geom_ref, tl_ref, tr_ref, bl_ref, br_ref, out_ref):
    # geom: (1, 1, 4) f32 = p0x, p0y, dp, valid
    p0x = geom_ref[0, 0, 0]
    p0y = geom_ref[0, 0, 1]
    dp = geom_ref[0, 0, 2]
    valid = geom_ref[0, 0, 3]

    patch = jnp.concatenate(
        [
            jnp.concatenate([tl_ref[0], tr_ref[0]], axis=1),
            jnp.concatenate([bl_ref[0], br_ref[0]], axis=1),
        ],
        axis=0,
    ).astype(jnp.float32)  # (64, 64); blocks are stored i32 (layout-native)

    k = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (K, P), 1).astype(jnp.float32)

    px = jnp.clip(p0x + k * dp, 0.0, P - 1.0)
    py = jnp.clip(p0y + k * dp, 0.0, P - 1.0)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - r))  # (K, P)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - r))

    rows = jnp.dot(wy, patch, preferred_element_type=jnp.float32)  # (K, P)
    half = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)  # (K, K)
    out_ref[0] = half * valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_resample(block_array, ids, geom, interpret: bool = False):
    """Fused patch fetch + half-grid resample.

    Args:
      block_array: (N, 32, 32) int32 atlas blocks (unified mip layout;
        i32 keeps the Pallas-native (8,128) tiling — u16 would be copied).
      ids: (F, 4) i32 flat block indices (tl, tr, bl, br), pre-clamped.
      geom: (F, 4) f32 = (p0x, p0y, dp, valid) per tile.

    Returns (F, 33, 33) f32 half-grid values (raw texel scale).
    """
    F = ids.shape[0]
    if F > CHUNK:
        # unrolled chunk loop: a lax.map here makes XLA copy the whole
        # block_array into the while-loop's buffer domain every frame
        # (measured 2.9 ms); unrolled calls share the operand in place
        pad = (-F) % CHUNK
        ids_p = jnp.pad(ids, ((0, pad), (0, 0)))
        geom_p = jnp.pad(geom, ((0, pad), (0, 0)))
        chunks = [
            _fetch_resample_chunk(
                block_array,
                jax.lax.dynamic_slice_in_dim(ids_p, c * CHUNK, CHUNK),
                jax.lax.dynamic_slice_in_dim(geom_p, c * CHUNK, CHUNK),
                interpret,
            )
            for c in range((F + pad) // CHUNK)
        ]
        return jnp.concatenate(chunks, axis=0)[:F]
    return _fetch_resample_chunk(block_array, ids, geom, interpret)


def _fetch_resample_chunk(block_array, ids, geom, interpret: bool = False):
    F = ids.shape[0]

    def spec(q):
        return pl.BlockSpec(
            (1, 32, 32),
            lambda i, ids_ref: (ids_ref[i, q], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 4), lambda i, ids_ref: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            spec(0),
            spec(1),
            spec(2),
            spec(3),
        ],
        out_specs=pl.BlockSpec(
            (1, K, K), lambda i, ids_ref: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, K, K), jnp.float32),
        interpret=interpret,
    )(ids, geom.reshape(F, 1, 4), block_array, block_array, block_array, block_array)
