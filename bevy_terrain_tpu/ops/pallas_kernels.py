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
# 8 tiles/step amortizes the ~0.5us per-grid-step pipeline overhead; 16
# (65 block refs) sends Mosaic compile time unbounded on this stack
TILES_PER_STEP = 8

# Scalar-prefetch operands live in SMEM; grids beyond ~1024 tiles overflow
# it (observed compile failure at 2048 on v5e), so larger frames run the
# kernel over serial 1024-tile chunks.
CHUNK = 1024


def _kernel(ids_ref, geom_ref, *refs):
    out_ref = refs[-1]
    k = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (K, P), 1).astype(jnp.float32)
    for t in range(TILES_PER_STEP):
        tl, tr, bl, br = refs[4 * t : 4 * t + 4]
        patch = jnp.concatenate(
            [
                jnp.concatenate([tl[0], tr[0]], axis=1),
                jnp.concatenate([bl[0], br[0]], axis=1),
            ],
            axis=0,
        ).astype(jnp.float32)  # (64, 64); blocks are stored i32 (layout-native)
        p0x = geom_ref[0, t, 0]
        p0y = geom_ref[0, t, 1]
        dp = geom_ref[0, t, 2]
        valid = geom_ref[0, t, 3]
        px = jnp.clip(p0x + k * dp, 0.0, P - 1.0)
        py = jnp.clip(p0y + k * dp, 0.0, P - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - r))  # (K, P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - r))
        rows = jnp.dot(wy, patch, preferred_element_type=jnp.float32)  # (K, P)
        half = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)  # (K, K)
        out_ref[t] = half * valid


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
    T = TILES_PER_STEP
    if F % T:
        pad = (-F) % T
        ids = jnp.pad(ids, ((0, pad), (0, 0)))
        geom = jnp.pad(geom, ((0, pad), (0, 0)))
    Fp = ids.shape[0]
    steps = Fp // T

    def spec(t, q):
        return pl.BlockSpec(
            (1, 32, 32),
            lambda i, ids_ref, t=t, q=q: (ids_ref[i * T + t, q], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (1, T, 4), lambda i, ids_ref: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [spec(t, q) for t in range(T) for q in range(4)],
        out_specs=pl.BlockSpec(
            (T, K, K), lambda i, ids_ref: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Fp, K, K), jnp.float32),
        interpret=interpret,
    )(ids, geom.reshape(steps, T, 4), *([block_array] * (4 * T)))
    return out[:F] if Fp != F else out
