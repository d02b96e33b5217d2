"""Hand-written Pallas TPU kernels for the frame hot path.

:func:`fetch_resample` fuses the per-tile patch fetch with the half-grid
tent resample (see ops/patch_sampling.py for the algorithm): each grid step
DMAs the four atlas blocks of several tiles' windows straight into VMEM
(double-buffered across grid steps by the Pallas pipeline via
scalar-prefetched block indices), assembles the 64x64 patches, builds the
tent-weight matrices on the VPU, and runs two small matmuls per tile on the
MXU — the 33x33 half-grid leaves the kernel, the patch never touches HBM.
Blocks are stored as row-interleaved overlapping quads: one dense
(32, 128) i32-native tile holds a tile's whole 2x2 block window, so the
patch is ONE 16 KB DMA and two lane slices — no padding, no unpack
shuffles. The fetch at production atlas sizes is HBM random-access
latency bound (DMA *count*, not bytes: 4 DMAs/tile = 2.16 ms, 2 = 1.56,
1 = 1.25 at 8192 tiles), which this layout takes to its floor.

This replaces four XLA ``take`` ops whose per-slice overhead (~320 ns)
dominated the frame (measured 10.5 ms at 8192 tiles).
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
# 64 tiles/step is the measured optimum for the row-interleaved quad
# kernel (8192 tiles, 344 MB atlas: 4 -> 1307us, 8 -> 1051, 16 -> 886,
# 32 -> 804, 64 -> 758, 128 -> 759 but 234 s Mosaic compile): one quad ref
# per tile keeps the VMEM working set small enough that wide steps only
# add DMA parallelism
TILES_PER_STEP = 64

# Scalar-prefetch operands live in SMEM; grids beyond ~1024 tiles overflow
# it (observed compile failure at 2048 on v5e), so larger frames run the
# kernel over serial 1024-tile chunks.
CHUNK = 1024


def _kernel(ids_ref, geom_ref, *refs):
    out_ref = refs[-1]
    k = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (K, P), 1).astype(jnp.float32)
    for t in range(TILES_PER_STEP):
        # quad ref (1, 32, 128): rows r, lanes 32q + c = block_q[r, c] —
        # the patch's top half [tl | tr] is the first 64 lanes, the bottom
        # [bl | br] the last 64 (lane-rotated to offset 0 for the concat;
        # Mosaic cannot concat pieces whose lane offsets differ)
        q = refs[t][0]
        patch = jnp.concatenate(
            [q[:, :64], pltpu.roll(q, 64, 1)[:, :64]], axis=0
        ).astype(jnp.float32)  # (64, 64) in natural texel order
        p0x = geom_ref[0, t, 0]
        p0y = geom_ref[0, t, 1]
        dp = geom_ref[0, t, 2]
        valid = geom_ref[0, t, 3]
        ratio = geom_ref[0, t, 4]

        # Blend toward the coarser data lod by crossfading the tent weights
        # with their 1-2-1-smoothed form (S@w has the closed form
        # 0.25 t(p-dp) + 0.5 t(p) + 0.25 t(p+dp), boundary rows duplicate)
        # — the coarse sample costs three extra tent evaluations on the VPU
        # instead of two extra MXU dots (+0.52 ms measured) or XLA
        # smoothing passes over the half-grid in HBM (~0.7 ms).
        def weights(p0):
            def tent(koff):
                p = jnp.clip(p0 + (k + koff) * dp, 0.0, P - 1.0)
                return jnp.maximum(0.0, 1.0 - jnp.abs(p - r))  # (K, P)

            w = tent(0.0)
            wm = jnp.where(k == 0.0, w, tent(-1.0))
            wp = jnp.where(k == K - 1.0, w, tent(1.0))
            w2 = 0.25 * wm + 0.5 * w + 0.25 * wp
            return w + (w2 - w) * ratio

        wx = weights(p0x)
        wy = weights(p0y)
        # Default (bf16-pass) MXU precision: quantizes 16-bit height data by
        # ~0.2% of range, same as the XLA einsum fallback and within the
        # fast path's documented band-limit tolerance. Measured and
        # rejected: HIGHEST (3-pass f32) = 3.2x kernel cost.
        rows = jnp.dot(wy, patch, preferred_element_type=jnp.float32)  # (K, P)
        half = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)  # (K, K)
        out_ref[t] = half * valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_resample(block_array, ids, geom, interpret: bool = False):
    """Fused patch fetch + half-grid resample.

    Args:
      block_array: (N, 32, 128) int32 row-interleaved overlapping block
        quads (patch_sampling.quad_rows): entry i holds the 2x2 block
        window (i, i+1, i+g, i+g+1) of its mip as Q[r, 32q+c] =
        block_q[r, c] — one dense i32-native tile. ONE 16 KB quad DMA
        fetches a tile's whole patch — the fetch is HBM random-access
        latency bound, so DMA count per tile is the entire cost — and the
        patch assembles from two plain lane slices.
      ids: (F, 4) i32 flat block indices (tl, tr, bl, br); quad adjacency
        (tr == tl+1, bl == tl+g) is guaranteed by patch_geometry's bx/by
        clamp, so only column 0 drives the loads.
      geom: (F, 8) f32 = (p0x, p0y, dp, valid, blend_ratio, 0, 0, 0) per
        tile; blend_ratio crossfades the resample weights toward their
        1-2-1-smoothed form (the coarser data lod's sample).

    Returns (F, 33, 33) f32 half-grid values (raw texel scale), already
    blend-crossfaded.
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
        # one (1, 32, 128) row-interleaved quad per tile, keyed by tl id
        return pl.BlockSpec(
            (1, 32, 128),
            lambda i, ids_ref, t=t: (ids_ref[i * T + t, 0], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (1, T, 8), lambda i, ids_ref: (i, 0, 0), memory_space=pltpu.VMEM
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
    )(ids, geom.reshape(steps, T, 8), *([block_array] * T))
    return out[:F] if Fp != F else out
