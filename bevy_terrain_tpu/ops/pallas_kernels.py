"""Hand-written Pallas TPU kernels for the frame hot path.

:func:`fetch_resample` fuses the per-tile patch fetch with the half-grid
tent resample (see ops/patch_sampling.py for the algorithm): each grid step
DMAs the four atlas blocks of several tiles' windows straight into VMEM
(double-buffered across grid steps by the Pallas pipeline via
scalar-prefetched block indices), assembles the 64x64 patches, builds the
tent-weight matrices on the VPU, and runs two small matmuls per tile on the
MXU — the 33x33 half-grid leaves the kernel, the patch never touches HBM.
Blocks are stored packed: a (32, 32) texel block lives as one dense
(8, 128) i32-native tile, which quarters the DMA traffic versus the
lane-padded T(8,128) layout XLA gives a (32, 32) minor shape.

This replaces four XLA ``take`` ops whose per-slice overhead (~320 ns)
dominated the frame (measured 10.5 ms at 8192 tiles). With packed blocks
the kernel runs 8192 tiles in 1.12 ms (was 2.0 ms unpacked) — now bounded
by the VPU unpack (12 lane-rolls + concats per tile) rather than DMA.
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
        Layout(major_to_minor=(0, 1, 2, 3)), SingleDeviceSharding(device)
    )

HG = 32  # half-grid intervals (grid_size 16); kernel is specialized for this
K = HG + 1  # 33 half-grid points
P = 64  # assembled patch extent
# 8 tiles/step is the measured optimum for the packed kernel (8192 tiles:
# 2 -> 2001us, 4 -> 1568, 8 -> 1118, 16 -> 1338, 32 -> 1638): fewer tiles
# per step under-amortize the pipeline overhead, more inflate the VMEM
# working set and degrade the DMA double-buffering overlap
TILES_PER_STEP = 8

# Scalar-prefetch operands live in SMEM; grids beyond ~1024 tiles overflow
# it (observed compile failure at 2048 on v5e), so larger frames run the
# kernel over serial 1024-tile chunks.
CHUNK = 1024


def _kernel(ids_ref, geom_ref, *refs):
    out_ref = refs[-1]
    k = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0).astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (K, P), 1)
    r = ri.astype(jnp.float32)
    # Blocks arrive packed (8, 128) — one dense i32-native tile instead of a
    # lane-padded (32, 32) (which DMAs 4x the bytes). Mosaic cannot
    # shape-cast (8, 128)->(32, 32), but four 32-lane slices concatenated
    # along sublanes recover the block with rows in the static permutation
    # sigma(i) = 4*(i&7) + (i>>3); folding sigma into wy's row indices makes
    # the permutation free (columns stay in texel order, so wx is untouched).
    rtau = (4 * (ri & 7) + ((ri >> 3) & 3) + 32 * (ri >> 5)).astype(jnp.float32)

    def unpack(ref, which):
        pb = ref[0, which]  # (8, 128) packed block `which` of the quad
        # lane-rotate each 32-lane group to offset 0 before slicing — Mosaic
        # cannot concat pieces whose lane offsets differ
        pieces = [
            (pltpu.roll(pb, 128 - 32 * j, 1) if j else pb)[:, :32] for j in range(4)
        ]
        return jnp.concatenate(pieces, axis=0)  # (32, 32), rows sigma-permuted

    for t in range(TILES_PER_STEP):
        quad = refs[t]  # (1, 4, 8, 128) quad ref: tl, tr, bl, br
        patch = jnp.concatenate(
            [
                jnp.concatenate([unpack(quad, 0), unpack(quad, 1)], axis=1),
                jnp.concatenate([unpack(quad, 2), unpack(quad, 3)], axis=1),
            ],
            axis=0,
        ).astype(jnp.float32)  # (64, 64); rows tau-permuted, columns in order
        p0x = geom_ref[0, t, 0]
        p0y = geom_ref[0, t, 1]
        dp = geom_ref[0, t, 2]
        valid = geom_ref[0, t, 3]
        px = jnp.clip(p0x + k * dp, 0.0, P - 1.0)
        py = jnp.clip(p0y + k * dp, 0.0, P - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - r))  # (K, P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - rtau))  # row-permuted tents
        # Default (bf16-pass) MXU precision: quantizes 16-bit height data by
        # ~0.2% of range, same as the XLA einsum fallback and within the
        # fast path's documented band-limit tolerance. Measured and
        # rejected: HIGHEST (3-pass f32) = 3.2x kernel cost; folding the
        # 1-2-1 blend smoothing in as two extra (33,33) dots per tile =
        # +0.52 ms (MXU fixed per-dot overhead dominates tiny dots) — the
        # XLA elementwise smoothing over HBM costs the same and keeps f32.
        rows = jnp.dot(wy, patch, preferred_element_type=jnp.float32)  # (K, P)
        half = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)  # (K, K)
        out_ref[t] = half * valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_resample(block_array, ids, geom, interpret: bool = False):
    """Fused patch fetch + half-grid resample.

    Args:
      block_array: (N, 4, 8, 128) int32 packed overlapping block quads
        (patch_sampling.quad_blocks): entry i holds the 2x2 block window
        (i, i+1, i+g, i+g+1) of its mip, each a (32, 32) texel block packed
        row-major into one dense i32-native (8, 128) tile. ONE 16 KB quad
        DMA fetches a tile's whole patch — the fetch is HBM random-access
        latency bound, so DMA count per tile is the entire cost.
      ids: (F, 4) i32 flat block indices (tl, tr, bl, br); quad adjacency
        (tr == tl+1, bl == tl+g) is guaranteed by patch_geometry's bx/by
        clamp, so only column 0 drives the loads.
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

    def spec(t):
        # one (1, 4, 8, 128) quad per tile, addressed by the tl id (col 0)
        return pl.BlockSpec(
            (1, 4, 8, 128),
            lambda i, ids_ref, t=t: (ids_ref[i * T + t, 0], 0, 0, 0),
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
        + [spec(t) for t in range(T)],
        out_specs=pl.BlockSpec(
            (T, K, K), lambda i, ids_ref: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Fp, K, K), jnp.float32),
        interpret=interpret,
    )(ids, geom.reshape(steps, T, 4), *([block_array] * T))
    return out[:F] if Fp != F else out
