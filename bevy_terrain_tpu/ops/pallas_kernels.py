"""Hand-written Pallas TPU kernels for the frame hot path.

:func:`mesh_fused` is the headline kernel: the ENTIRE planar vertex stage
(vertex.wgsl:30-98 + the attachment height chain) in one pass — streaming
quad-cache patch fetch, half-grid tent resample on the MXU, 1-2-1
smoothing for the data-lod blend, CDLOD morph, 3x3-window vertex
interpolation, per-vertex blend crossfade, and world positions — with the
half-grid living only in VMEM ((.., 17)/(.., 33) minor-dim tensors are
lane-padded ~4-7x in HBM, which taxed every staged-XLA variant). Per-tile
scalars ride one (8, tiles) operand per step and are lane-expanded by 0/1
expander dots on the MXU.

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


# Streaming quad cache (fetch_resample_cached): unique quads live in a
# VMEM-resident ring of U_MAX slots (U_MAX * 16 KB; v5e VMEM ~16 MB/core).
# Slot of rank r is r % U_MAX; issuing rank r is safe once every tile of
# rank r - U_MAX is behind us, which the per-step issue horizon
# min(rank_lo[s] + U_MAX, rank_hi[s] + LOOKAHEAD) guarantees (a step's 64
# tiles span <= 64 <= U_MAX ranks). Waits lag issues by one step so DMAs
# overlap compute; step s only needs ranks <= rank_hi[s] < allowed(s-1).
U_MAX = 512
LOOKAHEAD = 128
# SMEM stores prefetched scalars at 64 B each (observed: a (8192, 8) f32
# operand allocates 4 MB against the 1 MB SMEM budget), so the unique-id
# list is capped. Frames with more than U_PAD distinct quads mask the
# overflow tiles to height 0 (plan_patch_batch zeroes their valid flag);
# the observed worst case is 612 uniques at the 8192-tile bench frame.
U_PAD = 4096


def _halfgrid_perm() -> "np.ndarray":
    """Evens-first half-grid row order: [0,2,..,32, 1,3,..,31].

    The per-vertex 3x3 interpolation windows read half-grid indices
    {max(2i-2,0)+a}; in this order every window term is a UNIT-stride
    slice of the even/odd block (XLA's stride-2 lane slices on the
    (F,33,33) half tensor cost up to ~1.1 ms each from forced relayouts).
    """
    import numpy as np

    return np.concatenate([np.arange(0, K, 2), np.arange(1, K, 2)])


def _smooth_matrix_permuted() -> "np.ndarray":
    """(K, K) f32: the 1-2-1 half-grid smoothing (boundary rows duplicate,
    matching the old closed-form weight crossfade) conjugated into the
    evens-first row order. Applying B = I + ratio*(A - I) on both sides of
    the PLAIN resample equals crossfading the tent weights toward their
    smoothed form ((A@w)@patch == A@(w@patch)), at one tent eval per axis
    instead of three."""
    import numpy as np

    A = np.zeros((K, K), np.float32)
    for i in range(K):
        lo, hi = max(i - 1, 0), min(i + 1, K - 1)
        A[i, lo] += 0.25
        A[i, i] += 0.5
        A[i, hi] += 0.25
    p = _halfgrid_perm()
    return A[np.ix_(p, p)]


def _resample_one(q, p0x, p0y, dp, valid, ratio):
    """One tile's patch assembly + tent resample (see _kernel docstring).

    Output rows/cols are in evens-first half-grid order (_halfgrid_perm).
    """
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0)
    # permuted half-grid position of output row k: 2k for k<17, 2k-33 after
    pos = jnp.where(kk < (K + 1) // 2, 2 * kk, 2 * kk - K).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (K, P), 1).astype(jnp.float32)
    patch = jnp.concatenate(
        [q[:, :64], pltpu.roll(q, 64, 1)[:, :64]], axis=0
    ).astype(jnp.float32)

    def weights(p0):
        p = jnp.clip(p0 + pos * dp, 0.0, P - 1.0)
        return jnp.maximum(0.0, 1.0 - jnp.abs(p - r))

    wx = weights(p0x)
    wy = weights(p0y)
    # Recentre before the bf16-pass dots: tent rows sum to 1 (up to 1 ulp),
    # so interpolating (patch - c) and adding c back is exact — the MXU's
    # bf16 quantization then scales with the tile's LOCAL height range
    # instead of the absolute height (random-data worst case unchanged,
    # smooth real terrain error drops orders of magnitude).
    c = jnp.mean(patch)
    rows = jnp.dot(wy, patch - c, preferred_element_type=jnp.float32)
    half = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)
    # blend toward the coarser data lod on the OUTPUT side: half ->
    # B half B^T with B = I + ratio (A - I), A = the 1-2-1 smoothing with
    # duplicated boundary rows (see _smooth_matrix_permuted; exact since
    # (A@w)@patch == A@(w@patch), and c passes through B's unit row sums).
    # A/I come from iota math (kernels cannot capture array constants) and
    # hoist as loop invariants. Measured alternatives: slice/concat VPU
    # smoothing +2.5 ms (per-tile Mosaic concats), HIGHEST precision dots
    # +2.5 ms; default-precision dots on the recentred half are ~free.
    ri = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    pr = jnp.where(ri < (K + 1) // 2, 2 * ri, 2 * ri - K)  # permuted -> natural
    pc = jnp.where(ci < (K + 1) // 2, 2 * ci, 2 * ci - K)
    eye = (pr == pc).astype(jnp.float32)
    A = (
        0.5 * eye
        + 0.25 * (jnp.abs(pr - pc) == 1).astype(jnp.float32)
        + 0.25 * ((pr == pc) & ((pr == 0) | (pr == K - 1))).astype(jnp.float32)
    )
    B = eye + ratio * (A - eye)
    half = jnp.dot(
        jnp.dot(B, half, preferred_element_type=jnp.float32), B.T,
        preferred_element_type=jnp.float32,
    )
    return (half + c) * valid


def _kernel_cached(uq_ref, slots_ref, rlo_ref, rhi_ref, nuq_ref, geom_ref,
                   hbm_ref, out_ref, cache, sem, cnt):
    """geom rides in VMEM per step (SMEM scalar padding is 16x); slots/uq
    live in SMEM because their values drive dynamic indexing."""
    s = pl.program_id(0)
    T = TILES_PER_STEP

    @pl.when(s == 0)
    def _():
        cnt[0] = 0
        cnt[1] = 0

    def transfer(r):
        return pltpu.make_async_copy(
            hbm_ref.at[uq_ref[r]], cache.at[r % U_MAX], sem
        )

    def wait_range(lo, hi):
        jax.lax.fori_loop(lo, hi, lambda r, c: (transfer(r).wait(), c)[1], 0)

    # wait for everything issued through previous steps (covers this step's
    # ranks: rank_hi[s] < allowed(s-1) by the lookahead invariant)
    @pl.when(s > 0)
    def _():
        wait_range(cnt[1], cnt[0])
        cnt[1] = cnt[0]

    issued = cnt[0]
    allowed = jnp.minimum(
        jnp.minimum(rlo_ref[s] + U_MAX, rhi_ref[s] + LOOKAHEAD), nuq_ref[0]
    )
    allowed = jnp.maximum(allowed, issued)
    jax.lax.fori_loop(issued, allowed, lambda r, c: (transfer(r).start(), c)[1], 0)
    cnt[0] = allowed

    @pl.when(s == 0)
    def _():
        wait_range(0, allowed)
        cnt[1] = allowed

    for t in range(T):
        slot = slots_ref[s * T + t]
        q = cache[slot % U_MAX]
        out_ref[t] = _resample_one(
            q,
            geom_ref[0, t, 0],
            geom_ref[0, t, 1],
            geom_ref[0, t, 2],
            geom_ref[0, t, 3],
            geom_ref[0, t, 4],
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_resample_cached(block_array, batch, interpret: bool = False):
    """Fused patch fetch + half-grid resample through a VMEM quad cache.

    Args:
      block_array: (N, 32, 128) int32 row-interleaved overlapping block
        quads (patch_sampling.quad_rows); stays in HBM — only the frame's
        unique quads are DMA'd, once each.
      batch: a patch_sampling.PatchBatch (tiles sorted by quad id + the
        streaming-cache schedule).

    Returns (Fp, 33, 33) f32 half-grid values (sorted tile order, already
    blend-crossfaded); callers slice [:F].

    The one-DMA-per-tile kernel (fetch_resample) was copy-issue bound:
    ~96 ns per issued block copy x 65 copies/step = ~1.05 ms at 8192 tiles
    regardless of locality (random vs constant ids measured identical).
    Issuing each unique quad once (~611/frame measured) removes that wall.
    """
    Fp = batch.slots.shape[0]
    steps = Fp // TILES_PER_STEP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (1, TILES_PER_STEP, 8), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILES_PER_STEP, K, K), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((U_MAX, 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _kernel_cached,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Fp, K, K), jnp.float32),
        interpret=interpret,
    )(batch.uq, batch.slots, batch.rank_lo, batch.rank_hi, batch.n_unique,
      batch.geom.reshape(steps, TILES_PER_STEP, 8), block_array)


# ---------------------------------------------------------------------------
# Fused mesh kernel (planar fast path)
# ---------------------------------------------------------------------------
# One kernel = cached patch fetch + half-grid resample + CDLOD morph + window
# interpolation + world positions (vertex.wgsl:30-98 end to end). Rationale:
# any (.., 17) / (.., 33) minor-dim tensor is physically padded to 128 lanes
# in HBM (a (8192, 33, 33) f32 half-grid is 167 MB on the wire), so the
# XLA-staged vertex pipeline pays multi-ms relayout/padding costs no matter
# how it is sliced. Here the half-grid lives only in VMEM scratch and the
# per-vertex stage runs once per grid step on (17, T*17)-batched shapes.
#
# Layouts: vertex row i = sublanes, lane = t*17 + j (tile-major columns).
# Outputs are a single (steps, 102, T*17) f32 tensor, rows packing
# [height, pos_x, pos_y, pos_z, morphed_u, morphed_v] x 17.
GV = 17  # vertices per axis (grid_size 16)
LANES = TILES_PER_STEP * GV
OUT_ROWS = 6 * GV  # planar: height, pos xyz, morphed uv
# spherical frames emit three extra normal rows: the kernel already has
# the blend-selected unit world normal in registers, and recomputing it
# downstream (compute_local_position + normalize on (F, 17, 17) grids)
# measured ~0.26 ms/frame at capacity 4096 on v5e
OUT_ROWS_SPH = 9 * GV

# frame-scalar vector layout (see pack_mesh_scalars)
FS_SIZE = 32


def pack_mesh_scalars(uniforms, cfg, max_value: float) -> jnp.ndarray:
    """(48,) f32 frame scalars for the fused mesh kernel.

    Layout: 0:12 world_from_local, 12:15 planar distance base, 15:18
    planar up normal, 18:27 morph/blend/height scalars, 27 precision
    threshold, 28 2^-origin_lod, 29 approximate_height, 30:39
    normal_matrix, 39:42 view_world_position.
    """
    m = uniforms.world_from_local  # (3, 4)
    n = uniforms.normal_matrix[:, 1]
    n = n / jnp.linalg.norm(n)
    base = m[:, 3] + uniforms.approximate_height * n - uniforms.view_world_position
    return jnp.concatenate([
        m.reshape(12),
        base,  # 12:15
        n,  # 15:18
        jnp.stack([
            2.0 * uniforms.morph_distance,  # 18
            uniforms.morph_range,  # 19
            uniforms.blend_distance,  # 20
            uniforms.blend_range,  # 21
            uniforms.min_height,  # 22
            (uniforms.max_height - uniforms.min_height) / max_value,  # 23
            jnp.float32(1.0 if cfg.morph else 0.0),  # 24
            jnp.float32(1.0 if cfg.blend else 0.0),  # 25
            jnp.float32(cfg.lod_count) - 0.00001,  # 26
            uniforms.precision_threshold_distance,  # 27
            jnp.float32(2.0 ** -cfg.origin_lod),  # 28
            uniforms.approximate_height,  # 29
        ]),
        uniforms.normal_matrix.reshape(9),  # 30:39
        uniforms.view_world_position,  # 39:42
        # 42: 1/radius — for SPHERES the world transform's uniform scale;
        # the kernel's normal-from-position shortcut divides the
        # pre-translation world position by it (exact: the rotated
        # radius-scaled unit cube-sphere point has length R).
        # 43/44: log2 of the morph/blend distance bases — the kernel
        # computes lod targets as log2(base) - 0.5*log2(dist^2), saving
        # the sqrt pass and one of the two log2 passes per step.
        # 45: precision threshold SQUARED (near test runs on dist^2).
        (1.0 / jnp.linalg.norm(m[:, 0]))[None],
        jnp.log2(2.0 * uniforms.morph_distance)[None],
        jnp.log2(uniforms.blend_distance)[None],
        (uniforms.precision_threshold_distance
         * uniforms.precision_threshold_distance)[None],
        # 46: terrain scale (in-kernel shade's normal spacing)
        jnp.asarray(uniforms.terrain_scale)[None],
        jnp.zeros((1,), jnp.float32),
    ]).astype(jnp.float32)


# gr operand rows (per tile, lane-expanded in-kernel; see mesh_fused):
# 0 p0x, 1 p0y, 2 dp, 3 live, 4 lodf, 5 xf, 6 yf, 7 valid — planar set;
# spherical adds: 8..25 Taylor rows c/c_s/c_t/c_ss/c_st/c_tt (side-selected
# per tile), 26..27 origin_xy - (tile re-anchor int part is per-vertex),
# 28..29 origin_uv, 30..38 world_rot3x3 @ SIDE_LOCAL_MATRICES[side]
# (row-major), 39..47 normal_matrix @ SIDE_LOCAL_MATRICES[side].
# Precomposing the per-side cube placement into the world/normal
# transforms on the host is EXACT (side matrices are signed
# permutations: each column has one ±1 entry, so W@M is a signed column
# permutation of W) and deletes the 15-compare/15-select per-side pick
# from both per-vertex geometry evaluations.
GR_ROWS = 48


C_SQR_F = 0.87 * 0.87  # cube-sphere warp constant (math/coordinate.py)


def _kernel_pbr_shade(shade, cols, height, px, py, pz, fs, gV, lane_shift,
                      j, sub):
    """The fragment stage (render/material.py::shade with a planar
    StandardMaterial + albedo base color) evaluated INSIDE the kernel on
    the (GV, LANES) registers: central-difference normals
    (attachments.wgsl:51-107, planar TBN), then bevy_pbr's Filament
    direct lighting (pbr_lighting.wgsl) for the static light list.

    ``shade`` = (perceptual_roughness, metallic, reflectance, emissive3,
    ambient3, lights, alb_max) — all Python statics, baked as constants.
    Returns [r, g, b, a] (GV, LANES) linear [0, 1] rows.
    """
    import numpy as _np

    pr_f, metallic, reflectance, emissive, ambient, lights, alb_max = shade
    inv_max = 1.0 / alb_max

    # --- normals from the blended world-unit heights (planar TBN) ---
    lodf = gV[4]
    spacing = (2.0 * fs[46]) * jnp.exp2(-lodf) * (1.0 / (GV - 1.0))

    def vshift(x, d):
        # lane neighbour within each tile's 17-lane block, clamped at
        # block edges (the (GV, LANES) twin of phase B's lane_shift)
        rolled = pltpu.roll(x, (-d) % LANES, 1)
        ok = (j + d >= 0) & (j + d <= GV - 1)
        return jnp.where(ok, rolled, x)

    hi_u = vshift(height, 1)
    lo_u = vshift(height, -1)
    dh_du = (hi_u - lo_u) / (2.0 * spacing)
    hi_v = jnp.concatenate(
        [jax.lax.slice_in_dim(height, 1, GV, axis=0),
         jax.lax.slice_in_dim(height, GV - 1, GV, axis=0)], axis=0)
    lo_v = jnp.concatenate(
        [jax.lax.slice_in_dim(height, 0, 1, axis=0),
         jax.lax.slice_in_dim(height, 0, GV - 1, axis=0)], axis=0)
    dh_dv = (hi_v - lo_v) / (2.0 * spacing)
    ninv = 1.0 / jnp.maximum(
        jnp.sqrt(dh_du * dh_du + 1.0 + dh_dv * dh_dv), 1e-8)
    nx, ny, nz = -dh_du * ninv, ninv, -dh_dv * ninv

    base = [cols[c] * inv_max for c in range(3)]
    # opaque materials sample 3 channels; alpha pins to 1 (never stored —
    # the caller writes len(cols) output rows)
    alpha = cols[3] * inv_max if len(cols) > 3 else jnp.ones_like(base[0])
    dc = [b * (1.0 - metallic) for b in base]
    f0 = [0.16 * reflectance * reflectance * (1.0 - metallic) + b * metallic
          for b in base]
    pr = float(_np.clip(pr_f, 0.089, 1.0))
    rough = pr * pr
    a2 = rough * rough

    vx, vy, vz = fs[39] - px, fs[40] - py, fs[41] - pz
    vinv = 1.0 / jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-8)
    vx, vy, vz = vx * vinv, vy * vinv, vz * vinv
    nov = jnp.maximum(nx * vx + ny * vy + nz * vz, 1e-4)

    out = [jnp.full_like(base[0], float(emissive[c])) for c in range(3)]
    for light in lights:
        kind = light[0]
        if kind == "dir":
            _, d3, c3, illum = light
            d = _np.asarray(d3, _np.float32)
            l3 = -d / _np.linalg.norm(d)
            lc = _np.asarray(c3, _np.float32) * _np.float32(illum)
            lx = jnp.full_like(base[0], float(l3[0]))
            ly = jnp.full_like(base[0], float(l3[1]))
            lz = jnp.full_like(base[0], float(l3[2]))
            rad = [float(lc[c]) for c in range(3)]
            rad_arr = None
        else:
            if kind == "spot":
                _, p3, d3, c3, inten, rng, inner, outer = light
            else:
                _, p3, c3, inten, rng = light
            tx = float(p3[0]) - px
            ty = float(p3[1]) - py
            tz = float(p3[2]) - pz
            d2l = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-4)
            dinv = 1.0 / jnp.sqrt(d2l)
            lx, ly, lz = tx * dinv, ty * dinv, tz * dinv
            inv_r2 = float(1.0 / (rng * rng))
            window = jnp.clip(1.0 - jnp.square(d2l * inv_r2), 0.0, 1.0)
            atten = jnp.square(window) / d2l
            if kind == "spot":
                sd = _np.asarray(d3, _np.float32)
                sd = sd / _np.linalg.norm(sd)
                cos_outer = float(_np.cos(outer))
                scale = float(1.0 / max(_np.cos(inner) - _np.cos(outer), 1e-4))
                cos_a = -(lx * float(sd[0]) + ly * float(sd[1])
                          + lz * float(sd[2]))
                atten = atten * jnp.square(
                    jnp.clip((cos_a - cos_outer) * scale, 0.0, 1.0))
            lc = _np.asarray(c3, _np.float32) * _np.float32(inten)
            rad = [float(lc[c]) for c in range(3)]
            rad_arr = atten

        hx, hy, hz = lx + vx, ly + vy, lz + vz
        hinv = 1.0 / jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-8)
        hx, hy, hz = hx * hinv, hy * hinv, hz * hinv
        nol = jnp.clip(nx * lx + ny * ly + nz * lz, 0.0, 1.0)
        noh = jnp.clip(nx * hx + ny * hy + nz * hz, 0.0, 1.0)
        loh = jnp.clip(hx * lx + hy * ly + hz * lz, 0.0, 1.0)
        f = noh * noh * (a2 - 1.0) + 1.0
        d_ggx = a2 / jnp.maximum(_np.float32(_np.pi) * f * f, 1e-8)
        lambda_v = nol * jnp.sqrt((nov - a2 * nov) * nov + a2)
        lambda_l = nov * jnp.sqrt((nol - a2 * nol) * nol + a2)
        v_smith = 0.5 / jnp.maximum(lambda_v + lambda_l, 1e-8)
        f90 = jnp.clip((f0[0] + f0[1] + f0[2]) * _np.float32(50.0 * 0.33),
                       0.0, 1.0)
        om = jnp.power(1.0 - loh, 5.0)
        fd90 = 0.5 + 2.0 * rough * loh * loh
        light_scatter = 1.0 + (fd90 - 1.0) * jnp.power(1.0 - nol, 5.0)
        view_scatter = 1.0 + (fd90 - 1.0) * jnp.power(1.0 - nov, 5.0)
        fd = light_scatter * view_scatter * _np.float32(1.0 / _np.pi)
        for c in range(3):
            fresnel = f0[c] + (f90 - f0[c]) * om
            spec = d_ggx * v_smith * fresnel
            contrib = (dc[c] * fd + spec) * rad[c] * nol
            if rad_arr is not None:
                contrib = contrib * rad_arr
            out[c] = out[c] + contrib
    for c in range(3):
        out[c] = out[c] + dc[c] * float(ambient[c])
    return [out[0], out[1], out[2], alpha]


def _make_mesh_kernel(spherical: bool, origin_lod: int, ellipsoidal: bool,
                      alb_channels: int = 0, alb_bits: int = 0,
                      u_max: int = U_MAX, ablate: frozenset = frozenset(),
                      shade=None, alb_fast: bool = True,
                      alb_combined: bool = False):
    """``alb_channels > 0`` fuses a packed multi-channel attachment fetch
    into the mesh kernel (the full material frame in ONE pass): a second
    quad stream rides the SAME schedule, and the albedo resample reuses
    the height tents and the phase-B window weights — the two per-tile
    costs the standalone attach kernel pays again.

    ``ablate`` (measurement harness ONLY, tools/earth_kernel_ablation.py)
    statically removes named kernel pieces to attribute step cost; empty
    (the default) generates exactly the production kernel."""

    def kernel(*refs):
        if alb_channels and alb_combined:
            # ONE combined quad stream: block rows 0:32 = heights,
            # 32:64 = packed albedo — one 32 KB DMA per tile serves the
            # whole material frame
            ins = refs[:10]  # 7 prefetched + gr8 + combined hbm + out
            if spherical:
                cache, S, SA, HP, sem, cnt = refs[10:]
            else:
                cache, S, SA, sem, cnt = refs[10:]
                HP = None
            albedo = (alb_channels, alb_bits, None, None, SA, None,
                      alb_fast)
            args = ins
        elif alb_channels:
            ins = refs[:11]  # 7 prefetched + gr8 + hbm + albedo hbm + out
            if spherical:
                cache, acache, S, SA, HP, sem, asem, cnt = refs[11:]
            else:
                cache, acache, S, SA, sem, asem, cnt = refs[11:]
                HP = None
            albedo = (alb_channels, alb_bits, ins[9], acache, SA, asem,
                      alb_fast)
            args = ins[:9] + (ins[10],)
        else:
            args = refs[:10]
            if spherical:
                cache, S, HP, sem, cnt = refs[10:]
            else:
                cache, S, sem, cnt = refs[10:]
                HP = None
            albedo = None
        _mesh_kernel_body(spherical, origin_lod, ellipsoidal, *args,
                          cache, S, HP, sem, cnt, albedo=albedo, u_max=u_max,
                          ablate=ablate, shade=shade)

    return kernel


def _mesh_kernel_body(spherical, origin_lod, ellipsoidal, uq_ref, slots_ref,
                      rlo_ref, rhi_ref, nuq_ref, fs_ref, hp_ref, gr8_ref,
                      hbm_ref, out_ref, cache, S, HP, sem, cnt, albedo=None,
                      u_max=U_MAX, ablate=frozenset(), shade=None):
    s = pl.program_id(0)
    T = TILES_PER_STEP

    # ---- streaming quad cache (same scheme as _kernel_cached) ----
    @pl.when(s == 0)
    def _():
        cnt[0] = 0
        cnt[1] = 0

    def transfer(r):
        return pltpu.make_async_copy(
            hbm_ref.at[uq_ref[r]], cache.at[r % u_max], sem
        )

    if albedo is not None and albedo[3] is not None:
        _, _, ahbm_ref, acache, _, asem, _ = albedo

        def atransfer(r):
            return pltpu.make_async_copy(
                ahbm_ref.at[uq_ref[r]], acache.at[r % u_max], asem
            )

        def start_rank(r):
            transfer(r).start()
            atransfer(r).start()

        def wait_rank(r):
            transfer(r).wait()
            atransfer(r).wait()
    else:
        def start_rank(r):
            transfer(r).start()

        def wait_rank(r):
            transfer(r).wait()

    def wait_range(lo, hi):
        jax.lax.fori_loop(lo, hi, lambda r, c: (wait_rank(r), c)[1], 0)

    @pl.when(s > 0)
    def _():
        wait_range(cnt[1], cnt[0])
        cnt[1] = cnt[0]

    issued = cnt[0]
    allowed = jnp.minimum(
        jnp.minimum(rlo_ref[s] + u_max, rhi_ref[s] + LOOKAHEAD), nuq_ref[0]
    )
    allowed = jnp.maximum(allowed, issued)
    jax.lax.fori_loop(issued, allowed, lambda r, c: (start_rank(r), c)[1], 0)
    cnt[0] = allowed

    @pl.when(s == 0)
    def _():
        wait_range(0, allowed)
        cnt[1] = allowed

    # ---- per-step live gating ----
    # dead-capacity lanes sort to a contiguous TAIL sharing one quad
    # (plan_patch_batch), so whole steps past ceil(tile_count / T) carry
    # zero live tiles: skip ALL their compute (resample dots, tents,
    # expanders, phase B) and just zero the out rows. Makes the kernel
    # cost track the LIVE tile count instead of the static capacity
    # (r03: planar 4096-cap/2582-live and Earth 2048-cap/1512-live both
    # pay only for live steps). Flag encoding: 0 dead, 1 live, 2 live+hp.
    live_on = hp_ref[s] > 0

    @pl.when(jnp.logical_not(live_on))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(live_on)
    def _live_step():
        _mesh_step_compute(spherical, origin_lod, ellipsoidal, s, uq_ref,
                           slots_ref, rlo_ref, rhi_ref, nuq_ref, fs_ref,
                           hp_ref, gr8_ref, hbm_ref, out_ref, cache, S, HP,
                           sem, cnt, albedo=albedo, u_max=u_max, ablate=ablate,
                           shade=shade)


def _mesh_step_compute(spherical, origin_lod, ellipsoidal, s, uq_ref,
                       slots_ref, rlo_ref, rhi_ref, nuq_ref, fs_ref, hp_ref,
                       gr8_ref, hbm_ref, out_ref, cache, S, HP, sem, cnt,
                       albedo=None, u_max=U_MAX, ablate=frozenset(),
                       shade=None):
    T = TILES_PER_STEP

    # ---- per-tile parameters expanded on the MXU ----
    # gr8 rows [p0x, p0y, dp, live, lodf, xf, yf, valid] are per TILE
    # (8, 64); lane-expanding them to the patch (x64) and vertex (x17)
    # layouts via 0/1 expander dots replaces two big host-side jnp.repeat
    # operands (20 MB/frame of traffic)
    PL = T * P
    g8 = gr8_ref[0]  # (GR_ROWS, T)
    # HIGHEST precision: a bf16-pass dot would quantize the VALUES being
    # broadcast (tile coordinates > 256 and Taylor coefficients lose
    # mantissa bits); exact f32 passes cost nothing at these shapes
    tid_P = jax.lax.broadcasted_iota(jnp.int32, (T, PL), 1) // P
    EP = (tid_P == jax.lax.broadcasted_iota(jnp.int32, (T, PL), 0)).astype(jnp.float32)
    gP = jnp.dot(g8, EP, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # (GR_ROWS, PL)
    tid_V = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1) // GV
    EV = (tid_V == jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)).astype(jnp.float32)
    gV = jnp.dot(g8, EV, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # (GR_ROWS, LANES)

    # ---- phase A: per-tile resample into the step slab ----
    # y tents: 33 rows in evens-first order (pos 2k / 2k-33); x tents: 51
    # rows, a-major (pos idx_a(j) = 0 if j == 0 else 2j-2+a) so the three
    # window slabs come out as contiguous 17-column blocks. Tents build
    # step-batched on (rows, T*64) (one big VPU pass instead of 64 small
    # ones: -100 us measured).
    # ONE (84, T*64) tent build for both families: rows 0..32 = y tents
    # (evens-first positions), rows 33..83 = x tents (a-major positions)
    NT = K + 3 * GV  # 84
    rl = (jax.lax.broadcasted_iota(jnp.int32, (NT, PL), 1) % P).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (NT, PL), 0)
    ky = rowi
    pos_y = jnp.where(ky < GV, 2 * ky, 2 * ky - K)
    qx = rowi - K
    axx, jxx = qx // GV, qx % GV
    pos_x = jnp.where(jxx == 0, 0, 2 * jxx - 2 + axx)
    pos = jnp.where(rowi < K, pos_y, pos_x).astype(jnp.float32)
    p0x_l = gP[0:1, :]  # (1, PL)
    p0y_l = gP[1:2, :]
    dp_l = gP[2:3, :]
    p0 = jnp.where(rowi < K, p0y_l, p0x_l)
    tents = jnp.maximum(
        0.0, 1.0 - jnp.abs(jnp.clip(p0 + pos * dp_l, 0.0, P - 1.0) - rl)
    )
    wy_all = tents[0:K]
    wx_all = tents[K:NT]

    if albedo is not None:
        alb_c, alb_bits, _, acache, SA, _, alb_fast = albedo
        alb_mask = jnp.int32((1 << alb_bits) - 1)
        use_alb_fast = alb_fast and not (ablate & {
            "alb_no_unpack", "alb_no_dots", "alb_no_store"})
        alb_combined = acache is None  # heights+albedo share one block

    # (tile-PAIR stores — concatenating two adjacent tiles' (33, 17)
    # slabs into one (33, 34) store — were MEASURED AND REJECTED: the
    # lane concat costs more than the store it saves; mesh-only frame
    # 740 -> 853 us, one-kernel material 1533 -> 1660 us.)
    for t in range(T):
        if "no_phase_a" in ablate:
            break
        slot = slots_ref[s * T + t]
        qfull = cache[slot % u_max]
        if albedo is not None and alb_combined:
            q = qfull[0:32].astype(jnp.float32)  # (32, 128) heights
        else:
            q = qfull.astype(jnp.float32)  # (32, 128)
        c = jnp.mean(q)
        qc = q - c
        wy = wy_all[:, t * P:(t + 1) * P]
        wx = wx_all[:, t * P:(t + 1) * P]
        # patch rows 0..31 live in lanes 0:64 of the quad, rows 32..63 in
        # lanes 64:128 — split the contraction instead of assembling the
        # (64, 64) patch (saves the per-tile roll+concat relayout)
        rows = jnp.dot(wy[:, 0:32], qc[:, 0:64],
                       preferred_element_type=jnp.float32) + jnp.dot(
            wy[:, 32:64], qc[:, 64:128], preferred_element_type=jnp.float32
        )  # (33, 64)
        half3 = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)  # (33, 51)
        base = t * GV
        S[0, :, base:base + GV] = half3[:, 0:GV] + c
        S[1, :, base:base + GV] = half3[:, GV:2 * GV] + c
        S[2, :, base:base + GV] = half3[:, 2 * GV:3 * GV] + c
        if albedo is not None:
            # packed attachment channels resampled with the SAME tents
            # (same plan/geometry as heights; attachments.wgsl:12-43).
            # ROW-concat was also measured and rejected
            # (tools/material_kernel_ablation.py): concatenating the five
            # products into one tall x-tent dot regressed 2096 -> 2874 us —
            # 33-row (sublane-misaligned) register concats cost more than
            # the stores they replace.
            qa_raw = qfull[32:64] if alb_combined else acache[slot % u_max]
            if use_alb_fast:
                # ---- fast path (default): 8/16-bit color needs
                # sampler-grade precision, not f32 — GPU bilinear units
                # filter with ~9-bit weights (the reference's anisotropy-16
                # sampler, terrain_bind_group.rs:124, is no more precise).
                # Tents and texel values run bf16 on the MXU (byte values
                # are exact in bf16; products accumulate f32; measured
                # error <= ~1 LSB of 8-bit color), mean-centering is
                # dropped, and the C channels' y contractions lane-stack
                # into TWO wide dots instead of 2C narrow ones.
                # (micro-variants measured and rejected: skipping ch0's
                # shift / the top channel's mask and hoisting one
                # (33, 256) bf16 cast of rows_all regressed the frame
                # 1534 -> 1824 us — Mosaic fuses the per-slice casts into
                # the x-dot operands; a standalone wide cast does not.)
                wyb = wy.astype(jnp.bfloat16)
                wxb = wx.astype(jnp.bfloat16)
                chans = [
                    (jax.lax.shift_right_logical(
                        qa_raw, jnp.int32(alb_bits * ch)) & alb_mask
                     ).astype(jnp.bfloat16)
                    for ch in range(alb_c)
                ]
                q0 = jnp.concatenate([c[:, 0:64] for c in chans], axis=1)
                q1 = jnp.concatenate([c[:, 64:128] for c in chans], axis=1)
                rows_all = jnp.dot(
                    wyb[:, 0:32], q0, preferred_element_type=jnp.float32
                ) + jnp.dot(
                    wyb[:, 32:64], q1, preferred_element_type=jnp.float32
                )  # (33, 64 * C)
                for ch in range(alb_c):
                    half3a = jnp.dot(
                        rows_all[:, 64 * ch:64 * (ch + 1)].astype(
                            jnp.bfloat16),
                        wxb.T, preferred_element_type=jnp.float32)
                    SA[3 * ch + 0, :, base:base + GV] = half3a[:, 0:GV]
                    SA[3 * ch + 1, :, base:base + GV] = half3a[:, GV:2 * GV]
                    SA[3 * ch + 2, :, base:base + GV] = half3a[:, 2 * GV:3 * GV]
            acc_abl = None
            for ch in range(0 if use_alb_fast else alb_c):
                if "alb_no_unpack" in ablate:
                    qa = qa_raw.astype(jnp.float32)
                else:
                    qa = (jax.lax.shift_right_logical(
                        qa_raw, jnp.int32(alb_bits * ch)) & alb_mask
                    ).astype(jnp.float32)
                ca = jnp.mean(qa)
                qac = qa - ca
                if "alb_no_dots" in ablate:
                    half3a = wy[:, 0:3 * GV] * 0.0 + ca
                else:
                    rows_a = jnp.dot(
                        wy[:, 0:32], qac[:, 0:64],
                        preferred_element_type=jnp.float32) + jnp.dot(
                        wy[:, 32:64], qac[:, 64:128],
                        preferred_element_type=jnp.float32
                    )
                    half3a = jnp.dot(rows_a, wx.T,
                                     preferred_element_type=jnp.float32)
                if "alb_no_store" in ablate:
                    # keep the dots alive, drop the 3 sub-lane stores
                    acc_abl = half3a if acc_abl is None else acc_abl + half3a
                else:
                    SA[3 * ch + 0, :, base:base + GV] = half3a[:, 0:GV] + ca
                    SA[3 * ch + 1, :, base:base + GV] = half3a[:, GV:2 * GV] + ca
                    SA[3 * ch + 2, :, base:base + GV] = half3a[:, 2 * GV:3 * GV] + ca
            if "alb_no_store" in ablate and acc_abl is not None:
                SA[0, :, 0:3 * GV] = acc_abl

    # ---- phase B: batched per-vertex stage on (GV, LANES) shapes ----
    E = GV  # even block size in the evens-first y order

    def ysel(x, b):
        # rows for vertex i, offset b: natural index 0 if i == 0 else 2i-2+b
        if b == 0:
            body = jax.lax.slice_in_dim(x, 0, E - 1, axis=0)  # e[0..15]
        elif b == 1:
            body = jax.lax.slice_in_dim(x, E, K, axis=0)  # o[0..15]
        else:
            return jax.lax.slice_in_dim(x, 0, E, axis=0)  # e[0..16]
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=0), body], axis=0
        )

    lane = jax.lax.broadcasted_iota(jnp.int32, (GV, LANES), 1)
    j = lane % GV
    sub = jax.lax.broadcasted_iota(jnp.int32, (GV, LANES), 0)

    fs = fs_ref
    lodf = gV[4]
    xf = gV[5]
    yf = gV[6]
    valid = gV[7]  # atlas data present: zeroes heights (flat ground)
    live = gV[3]  # tile exists: zeroes every output lane

    # --- smoothed slabs (the coarser data lod): value-space 1-2-1 with
    # duplicated boundaries, on the (a, evens-first-y) structure ---
    s0, s1, s2 = S[0], S[1], S[2]

    jslab = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 1) % GV

    def lane_shift(x, d):
        # rolled[.., l] = x[.., l+d], within each tile's 17-lane block
        # (clamped at block edges); pltpu.roll requires non-negative shifts
        rolled = pltpu.roll(x, (-d) % LANES, 1)
        ok = (jslab + d >= 0) & (jslab + d <= GV - 1)
        return jnp.where(ok, rolled, x)

    def ysmooth(x):
        # natural-position 1-2-1 with duplicated boundaries as ONE constant
        # (33, 33) matrix on the MXU (built from iota — kernels cannot
        # capture array constants; hoists as a loop invariant). Replaces 6
        # slice+concats per slab: full_v2 vs v1 measured -400 us.
        ri = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        prn = jnp.where(ri < GV, 2 * ri, 2 * ri - K)  # permuted -> natural
        pcn = jnp.where(ci < GV, 2 * ci, 2 * ci - K)
        Ay = (
            0.5 * (prn == pcn).astype(jnp.float32)
            + 0.25 * (jnp.abs(prn - pcn) == 1).astype(jnp.float32)
            + 0.25 * ((prn == pcn) & ((prn == 0) | (prn == K - 1))).astype(jnp.float32)
        )
        return jnp.dot(Ay, x, preferred_element_type=jnp.float32)

    def xsmooth(a_idx, x0, x1, x2):
        # x positions idx_a(j) = 0 if j == 0 else 2j-2+a. Interior:
        # a=1 (pos 2j-1): neighbours a=0, a=2 at the same j;
        # a=0 (pos 2j-2): neighbours a=1 at j-1 and j (dup at pos 0);
        # a=2 (pos 2j): neighbours a=1 at j and j+1 (dup at pos 32).
        # All slabs alias position 0 at j == 0 (and a=0 also at j == 1):
        # there the smoothed value is 0.75 h(0) + 0.25 h(1), with h(1)
        # living at x1[j=1].
        sm_pos0 = 0.75 * x0 + 0.25 * lane_shift(x1, 1)
        if a_idx == 1:
            return jnp.where(jslab == 0, sm_pos0, 0.5 * x1 + 0.25 * (x0 + x2))
        if a_idx == 0:
            prev = lane_shift(x1, -1)  # (1, j-1)
            low = jnp.where(jslab <= 1, x0, prev)  # pos 0 dups itself
            return jnp.where(jslab == 0, sm_pos0, 0.5 * x0 + 0.25 * (low + x1))
        nxt = lane_shift(x1, 1)  # (1, j+1)
        hi = jnp.where(jslab >= GV - 1, x2, nxt)  # pos 32 dups itself
        return 0.5 * x2 + 0.25 * (x1 + hi)

    if "no_smooth" in ablate:
        sm0, sm1, sm2 = s0, s1, s2
    else:
        sm0 = ysmooth(xsmooth(0, s0, s1, s2))
        sm1 = ysmooth(xsmooth(1, s0, s1, s2))
        sm2 = ysmooth(xsmooth(2, s0, s1, s2))

    # --- per-vertex geometry (vertex.wgsl:30-71, planar) ---
    u = j.astype(jnp.float32) * (1.0 / (GV - 1.0))
    v = sub.astype(jnp.float32) * (1.0 / (GV - 1.0))
    inv_count = jnp.exp2(-lodf)

    def far_geom(uu, vv):
        """Cube-sphere world position + unit world normal at tile uv
        (uu, vv) — vertex.wgsl:30-55 + functions.wgsl:73-96 on
        (GV, LANES) lanes. The per-side cube placement is precomposed
        into the per-tile WM/NM rows (see GR_ROWS comment), and the
        cube-point norm is closed-form: the homogeneous point
        [pxs, pys, 1] permuted by a signed permutation always has
        squared norm 1 + pxs² + pys²."""
        uv01x = (xf + uu) * inv_count
        uv01y = (yf + vv) * inv_count
        wxp = 2.0 * uv01x - 1.0
        wyp = 2.0 * uv01y - 1.0
        pxs = wxp * jax.lax.rsqrt(1.0 + C_SQR_F - C_SQR_F * wxp * wxp)
        pys = wyp * jax.lax.rsqrt(1.0 + C_SQR_F - C_SQR_F * wyp * wyp)
        inv_n = jax.lax.rsqrt(1.0 + pxs * pxs + pys * pys)
        pxn = pxs * inv_n
        pyn = pys * inv_n
        sx = gV[30] * pxn + gV[31] * pyn + gV[32] * inv_n
        sy = gV[33] * pxn + gV[34] * pyn + gV[35] * inv_n
        sz = gV[36] * pxn + gV[37] * pyn + gV[38] * inv_n
        wx, wy, wz = sx + fs[3], sy + fs[7], sz + fs[11]
        if ellipsoidal:
            # world normal = normalize(normal_matrix @ local); the inv_n
            # factor is uniform per lane so it drops out in the normalize
            nx = gV[39] * pxs + gV[40] * pys + gV[41]
            ny = gV[42] * pxs + gV[43] * pys + gV[44]
            nz = gV[45] * pxs + gV[46] * pys + gV[47]
            ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
            return wx, wy, wz, nx * ninv, ny * ninv, nz * ninv
        # SPHERE: the pre-translation world point (sx, sy, sz) is the
        # rotated radius-scaled unit cube-sphere point, so the unit normal
        # is exactly it divided by the radius (fs[42] = 1/R) — drops the
        # 9-fma normal-matrix application and its rsqrt normalize from
        # BOTH per-step geometry evaluations
        return wx, wy, wz, sx * fs[42], sy * fs[42], sz * fs[42]

    def taylor_rel(uu, vv):
        """HIGH_PRECISION Taylor relative position
        (functions.wgsl:98-115): re-anchor the coordinate at origin_lod
        with INTEGER-exact cancellation, then evaluate the second-order
        polynomial. Only runs on hp-flagged steps (under pl.when)."""
        xi = xf.astype(jnp.int32)
        yi = yf.astype(jnp.int32)
        lodi = lodf.astype(jnp.int32)
        ol = origin_lod
        down = jnp.maximum(lodi - ol, 0)  # lod deeper than origin
        up = jnp.maximum(ol - lodi, 0)
        # down: oxy = xy >> d; ouv = ((xy & mask) + uv) * 2^-d
        maskx = (jnp.int32(1) << down) - 1
        scale_dn = jnp.exp2(-down.astype(jnp.float32))
        scale_up = jnp.exp2(up.astype(jnp.float32))
        ox_dn = jax.lax.shift_right_logical(xi, down)
        oy_dn = jax.lax.shift_right_logical(yi, down)
        oux_dn = ((xi & maskx).astype(jnp.float32) + uu) * scale_dn
        ouy_dn = ((yi & maskx).astype(jnp.float32) + vv) * scale_dn
        # up: scaled = uv * 2^d; oxy = (xy << d) + floor; ouv = frac
        sux = uu * scale_up
        suy = vv * scale_up
        fux = jnp.floor(sux)
        fuy = jnp.floor(suy)
        ox_up = jax.lax.shift_left(xi, up) + fux.astype(jnp.int32)
        oy_up = jax.lax.shift_left(yi, up) + fuy.astype(jnp.int32)
        is_dn = lodi >= ol
        oxi = jnp.where(is_dn, ox_dn, ox_up)
        oyi = jnp.where(is_dn, oy_dn, oy_up)
        oux = jnp.where(is_dn, oux_dn, sux - fux)
        ouy = jnp.where(is_dn, ouy_dn, suy - fuy)
        # integer parts cancel exactly against the per-tile origin anchor
        st_s = ((oxi - gV[26].astype(jnp.int32)).astype(jnp.float32)
                + (oux - gV[28])) * fs[28]
        st_t = ((oyi - gV[27].astype(jnp.int32)).astype(jnp.float32)
                + (ouy - gV[29])) * fs[28]
        rx = (gV[8] + gV[11] * st_s + gV[14] * st_t + gV[17] * st_s * st_s
              + gV[20] * st_s * st_t + gV[23] * st_t * st_t)
        ry = (gV[9] + gV[12] * st_s + gV[15] * st_t + gV[18] * st_s * st_s
              + gV[21] * st_s * st_t + gV[24] * st_t * st_t)
        rz = (gV[10] + gV[13] * st_s + gV[16] * st_t + gV[19] * st_s * st_s
              + gV[22] * st_s * st_t + gV[25] * st_t * st_t)
        return rx, ry, rz

    if spherical:
        hp_on = hp_ref[s] == 2
        wx0, wy0, wz0, nx0, ny0, nz0 = far_geom(u, v)
        # world-space view distance (SQUARED — the consumers are the
        # log2-based lod targets and the near compare, so the sqrt pass
        # is never needed) at the approximate height
        dwx = wx0 + fs[29] * nx0 - fs[39]
        dwy = wy0 + fs[29] * ny0 - fs[40]
        dwz = wz0 + fs[29] * nz0 - fs[41]
        d2_w0 = dwx * dwx + dwy * dwy + dwz * dwz

        if "no_taylor" not in ablate:
            @pl.when(hp_on)
            def _():
                rx0, ry0, rz0 = taylor_rel(u, v)
                dhx = rx0 + fs[29] * nx0
                dhy = ry0 + fs[29] * ny0
                dhz = rz0 + fs[29] * nz0
                HP[0] = dhx * dhx + dhy * dhy + dhz * dhz  # squared

            # hp_on gates the scratch read: a step whose flag is 0 is
            # conservatively guaranteed (plan-side closest-point bound) to
            # have no lane inside the precision threshold, so the where
            # never selects the (possibly stale) scratch row
            near = jnp.logical_and(d2_w0 < fs[45], hp_on)
            d2 = jnp.where(near, HP[0], d2_w0)
        else:
            near = jnp.zeros_like(d2_w0, jnp.bool_)
            d2 = d2_w0
    else:
        lx = (xf + u) * inv_count - 0.5
        lz = (yf + v) * inv_count - 0.5
        dx = fs[0] * lx + fs[2] * lz + fs[12]
        dy = fs[4] * lx + fs[6] * lz + fs[13]
        dz = fs[8] * lx + fs[10] * lz + fs[14]
        d2 = dx * dx + dy * dy + dz * dz

    # ONE log2 pass serves both the morph and blend targets:
    # log2(base/dist) == log2(base) - 0.5*log2(dist^2) (fs[43]/fs[44]
    # hold the host-precomputed log2 bases)
    log2_dist = 0.5 * jnp.log2(d2)
    target_lod = fs[43] - log2_dist
    mr = jnp.clip((lodf + fs[19] - target_lod) * (1.0 / fs[19]), 0.0, 1.0)
    mr = jnp.where(lodf == 0.0, 0.0, mr) * fs[24]
    even_u = ((j & ~1).astype(jnp.float32)) * (1.0 / (GV - 1.0))
    even_v = ((sub & ~1).astype(jnp.float32)) * (1.0 / (GV - 1.0))
    mu = u + (even_u - u) * mr
    mv = v + (even_v - v) * mr

    # --- window interpolation at the morphed uv (3x3 tents) ---
    # weights depend only on the morphed uv — ONE build shared by the
    # fine/smooth height slabs AND (when fused) every albedo channel
    lxw = mu * (2.0 * (GV - 1.0)) - jnp.maximum(2 * j - 2, 0).astype(jnp.float32)
    lyw = mv * (2.0 * (GV - 1.0)) - jnp.maximum(2 * sub - 2, 0).astype(jnp.float32)
    wyb3 = [jnp.maximum(0.0, 1.0 - jnp.abs(lyw - b)) for b in range(3)]
    wxa3 = [jnp.maximum(0.0, 1.0 - jnp.abs(lxw - a)) for a in range(3)]

    def interp9(sa0, sa1, sa2):
        h = jnp.zeros((GV, LANES), jnp.float32)
        for b in range(3):
            for a, slab in ((0, sa0), (1, sa1), (2, sa2)):
                h = h + wyb3[b] * wxa3[a] * ysel(slab, b)
        return h

    h_fine = interp9(s0, s1, s2)
    h_smooth = h_fine if "no_smooth" in ablate else interp9(sm0, sm1, sm2)

    # --- per-vertex blend crossfade (fragment.wgsl:51-62 semantics) ---
    btarget = jnp.minimum(fs[44] - log2_dist, fs[26])
    blod = jnp.maximum(btarget, 0.0).astype(jnp.int32).astype(jnp.float32)
    bratio = jnp.where(
        blod == 0.0, 0.0,
        jnp.clip((blod + fs[21] - btarget) * (1.0 / fs[21]), 0.0, 1.0),
    ) * fs[25]
    h_norm = (h_fine + (h_smooth - h_fine) * bratio) * valid
    height = (fs[22] + fs[23] * h_norm) * live

    # --- morphed world position + surface offset ---
    if spherical and "reuse_far" in ablate:
        # ABLATION: position from the unmorphed geometry (wrong where
        # mr > 0 — for cost attribution only)
        nx_f, ny_f, nz_f = nx0, ny0, nz0
        px = wx0 + height * nx_f
        py = wy0 + height * ny_f
        pz = wz0 + height * nz_f
    elif spherical:
        # vertex.wgsl:40-55: world position at the morphed uv; within the
        # precision threshold the Taylor relative position (view + rel)
        # replaces it and the UNMORPHED normal is kept (the staged path's
        # exact selection, meshgen.generate_mesh_grid). The morphed call
        # needs no distances, and its Taylor chain runs only on hp steps.
        wxm, wym, wzm, nxm, nym, nzm = far_geom(mu, mv)

        if "no_taylor" not in ablate:
            @pl.when(hp_on)
            def _():
                rxm_, rym_, rzm_ = taylor_rel(mu, mv)
                HP[1] = rxm_
                HP[2] = rym_
                HP[3] = rzm_

        nx_f = jnp.where(near, nx0, nxm)
        ny_f = jnp.where(near, ny0, nym)
        nz_f = jnp.where(near, nz0, nzm)
        px = jnp.where(near, fs[39] + HP[1], wxm) + height * nx_f
        py = jnp.where(near, fs[40] + HP[2], wym) + height * ny_f
        pz = jnp.where(near, fs[41] + HP[3], wzm) + height * nz_f
    else:
        mlx = (xf + mu) * inv_count - 0.5
        mlz = (yf + mv) * inv_count - 0.5
        px = fs[0] * mlx + fs[2] * mlz + fs[3] + height * fs[15]
        py = fs[4] * mlx + fs[6] * mlz + fs[7] + height * fs[16]
        pz = fs[8] * mlx + fs[10] * mlz + fs[11] + height * fs[17]

    out_ref[0, 0 * GV:1 * GV] = height
    out_ref[0, 1 * GV:2 * GV] = px * live
    out_ref[0, 2 * GV:3 * GV] = py * live
    out_ref[0, 3 * GV:4 * GV] = pz * live
    out_ref[0, 4 * GV:5 * GV] = mu * live
    out_ref[0, 5 * GV:6 * GV] = mv * live
    base_rows = 6
    if spherical:
        out_ref[0, 6 * GV:7 * GV] = nx_f * live
        out_ref[0, 7 * GV:8 * GV] = ny_f * live
        out_ref[0, 8 * GV:9 * GV] = nz_f * live
        base_rows = 9
    if albedo is not None:
        # fused albedo channels at the same morphed uvs, same window
        # weights (raw texel values; glue normalizes)
        cols = []
        for ch in range(alb_c):
            if "alb_no_interp" in ablate:
                col = SA[3 * ch + 1][0:GV]
            else:
                col = interp9(SA[3 * ch + 0], SA[3 * ch + 1], SA[3 * ch + 2])
            cols.append(col)
        if shade is None:
            for ch in range(alb_c):
                out_ref[0, (base_rows + ch) * GV:(base_rows + ch + 1) * GV] = (
                    cols[ch] * valid * live
                )
        else:
            # ---- in-kernel fragment stage (planar StandardMaterial +
            # albedo fast path): the full PBR shade on the registers
            # already holding albedo/height/position — saves the
            # ~7.5x-padded grid materializations + XLA shade pass
            # (measured ~0.39 ms/frame on the 8k^2 material bench) ----
            shaded = _kernel_pbr_shade(
                shade, cols, height, px, py, pz, fs, gV, lane_shift, j, sub,
            )
            for ch in range(alb_c):
                out_ref[0, (base_rows + ch) * GV:(base_rows + ch + 1) * GV] = (
                    shaded[ch] * valid * live
                )


@functools.partial(
    jax.jit,
    static_argnames=("spherical", "origin_lod", "interpret", "ellipsoidal",
                     "albedo_channels", "albedo_bits", "ablate", "shade",
                     "albedo_fast", "albedo_combined"),
)
def mesh_fused(block_array, batch, tile_params, fs, hp_steps=None,
               spherical: bool = False, origin_lod: int = 10,
               interpret: bool = False, ellipsoidal: bool = False,
               albedo_blocks=None, albedo_channels: int = 0,
               albedo_bits: int = 0, ablate: frozenset = frozenset(),
               shade=None, albedo_fast: bool = True,
               albedo_combined: bool = False):
    """Fused frame mesh: fetch + resample + morph + interpolate.

    Args:
      block_array: (N, 32, 128) int32 quad blocks (HBM-resident).
      batch: patch_sampling.PatchBatch (quad-sorted schedule).
      tile_params: (Fp, 4) f32 per-tile [live, lodf, xf, yf] in the sorted
        order, or (Fp, 45) with the spherical extras [side, taylor
        c/c_s/c_t/c_ss/c_st/c_tt (18), origin_xy(2), origin_uv(2),
        WM(9), NM(9)] appended (meshgen.generate_mesh_fused builds both).
      fs: (48,) f32 frame scalars (pack_mesh_scalars).
      hp_steps: (steps,) int32 STEP FLAGS: 0 = no live tile (the whole
        step's compute is skipped and its out rows zeroed — kernel cost
        tracks the live tile count, not the capacity), 1 = live,
        2 = live AND may contain a lane inside the precision threshold
        (conservative closest-point bound; the Taylor chains run only on
        2-flagged steps). None = everything on.

    Returns (steps, 102, LANES) f32 (planar) or (steps, 153, LANES)
    (spherical): rows = [height, pos_xyz, morphed uv (, normal_xyz)]
    x 17 vertex rows; lane = tile_in_step * 17 + vertex column.
    """
    Fp = batch.slots.shape[0]
    steps = Fp // TILES_PER_STEP
    if hp_steps is None:
        hp_steps = jnp.full((steps,), 2 if spherical else 1, jnp.int32)
    # ONE tiny per-tile operand (GR_ROWS, T)/step — the kernel lane-expands
    # it on the MXU (see _mesh_kernel_body's expander dots)
    rows = [
        batch.geom[:, 0], batch.geom[:, 1], batch.geom[:, 2],
        tile_params[:, 0], tile_params[:, 1], tile_params[:, 2],
        tile_params[:, 3], batch.geom[:, 3],
    ]
    if spherical:
        # rows 8..25 taylor, 26..27 origin_xy, 28..29 origin_uv,
        # 30..38 WM, 39..47 NM (see the GR_ROWS comment)
        rows += [tile_params[:, 5 + r] for r in range(18)]  # taylor (col-major xyz)
        rows += [tile_params[:, 23], tile_params[:, 24]]
        rows += [tile_params[:, 25], tile_params[:, 26]]
        rows += [tile_params[:, 27 + r] for r in range(18)]  # WM + NM
    while len(rows) < GR_ROWS:
        rows.append(jnp.zeros_like(rows[0]))
    gr8 = jnp.transpose(
        jnp.stack(rows).reshape(GR_ROWS, steps, TILES_PER_STEP),
        (1, 0, 2),
    )
    # the bf16 fast path is sampler-grade for 8-bit channels (byte values
    # exact in bf16); 16-bit channels (Rg16) would quantize to ~8 bits,
    # so they keep the exact f32 resample
    albedo_fast = albedo_fast and albedo_bits <= 8
    # the albedo stream doubles the VMEM cache footprint and adds the
    # 3*C slab scratch — shrink the ring to fit the 16 MB scoped-vmem
    # limit (256-slot pairs measured 680 KB over). 128 still covers a
    # step's 64-rank span with a full step of prefetch lookahead.
    u_max = 128 if albedo_channels else U_MAX
    if albedo_combined:
        # ONE ring of (64, 128) combined blocks (heights rows 0:32,
        # packed albedo rows 32:64): same 4 MB VMEM as the two separate
        # rings, HALF the DMA count — one 32 KB transfer per tile serves
        # the whole material frame
        assert albedo_channels and albedo_blocks is None
        scratch = [pltpu.VMEM((u_max, 64, 128), jnp.int32)]
    else:
        scratch = [pltpu.VMEM((u_max, 32, 128), jnp.int32)]
        if albedo_channels:
            scratch.append(pltpu.VMEM((u_max, 32, 128), jnp.int32))
    scratch.append(pltpu.VMEM((3, K, LANES), jnp.float32))
    if albedo_channels:
        scratch.append(
            pltpu.VMEM((3 * albedo_channels, K, LANES), jnp.float32))
    if spherical:
        scratch.append(pltpu.VMEM((4, GV, LANES), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    if albedo_channels and not albedo_combined:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    scratch.append(pltpu.SMEM((2,), jnp.int32))
    out_rows = (OUT_ROWS_SPH if spherical else OUT_ROWS) + albedo_channels * GV
    in_specs = [
        pl.BlockSpec((1, GR_ROWS, TILES_PER_STEP), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [block_array]
    if albedo_channels and not albedo_combined:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        operands.append(albedo_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, out_rows, LANES), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _make_mesh_kernel(spherical, origin_lod, ellipsoidal,
                          albedo_channels, albedo_bits, u_max, ablate, shade,
                          alb_fast=albedo_fast, alb_combined=albedo_combined),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((steps, out_rows, LANES), jnp.float32),
        interpret=interpret,
    )(batch.uq, batch.slots, batch.rank_lo, batch.rank_hi, batch.n_unique, fs,
      hp_steps, gr8, *operands)


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


# ---------------------------------------------------------------------------
# Fused attachment sampling (fragment-stage fetch for albedo/splat/...)
# ---------------------------------------------------------------------------
# Same streaming-cache fetch + MXU resample as the mesh kernel, but the
# vertex stage interpolates at GIVEN morphed uvs (the frame's mesh.uvs)
# and skips morph/blend/geometry entirely — attachments sample one data
# lod (attachments.wgsl:12-43 with the mip pinned by patch_geometry).


def _make_attach_kernel(channels: int, bits: int):
    """Fused attachment sampler kernel factory.

    ``channels=1, bits=0``: the block array holds ONE raw channel per
    int32 word (the height path and legacy planar storage). ``channels=C,
    bits=B``: each word packs C channels little-endian at B bits each
    (blocks_from_tile_packed) — ONE quad DMA serves every channel, and
    the per-channel unpack+resample runs from VMEM (the fetch is the
    DMA-count-bound cost, measured ~600 us/pass at 4096 tiles; packing
    amortizes it C-fold)."""

    def kernel(uq_ref, slots_ref, rlo_ref, rhi_ref, nuq_ref, live_ref,
               ga_ref, uv_ref, hbm_ref, out_ref, cache, S, sem, cnt):
        _attach_kernel_body(channels, bits, uq_ref, slots_ref, rlo_ref,
                            rhi_ref, nuq_ref, live_ref, ga_ref, uv_ref,
                            hbm_ref, out_ref, cache, S, sem, cnt)

    return kernel


def _attach_kernel_body(channels, bits, uq_ref, slots_ref, rlo_ref, rhi_ref,
                        nuq_ref, live_ref, ga_ref, uv_ref, hbm_ref, out_ref,
                        cache, S, sem, cnt):
    s = pl.program_id(0)
    T = TILES_PER_STEP

    @pl.when(s == 0)
    def _():
        cnt[0] = 0
        cnt[1] = 0

    def transfer(r):
        return pltpu.make_async_copy(
            hbm_ref.at[uq_ref[r]], cache.at[r % U_MAX], sem
        )

    def wait_range(lo, hi):
        jax.lax.fori_loop(lo, hi, lambda r, c: (transfer(r).wait(), c)[1], 0)

    @pl.when(s > 0)
    def _():
        wait_range(cnt[1], cnt[0])
        cnt[1] = cnt[0]

    issued = cnt[0]
    allowed = jnp.minimum(
        jnp.minimum(rlo_ref[s] + U_MAX, rhi_ref[s] + LOOKAHEAD), nuq_ref[0]
    )
    allowed = jnp.maximum(allowed, issued)
    jax.lax.fori_loop(issued, allowed, lambda r, c: (transfer(r).start(), c)[1], 0)
    cnt[0] = allowed

    @pl.when(s == 0)
    def _():
        wait_range(0, allowed)
        cnt[1] = allowed

    # per-step live gating (same scheme as the mesh kernel): dead-capacity
    # lanes sort to a contiguous tail, so whole steps past
    # ceil(tile_count / T) skip ALL compute and just zero their out rows —
    # the sampler's cost tracks the live tile count, not the capacity
    @pl.when(live_ref[s] == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(live_ref[s] > 0)
    def _():
        _attach_step_compute(channels, bits, s, slots_ref, ga_ref, uv_ref,
                             out_ref, cache, S)


def _attach_step_compute(channels, bits, s, slots_ref, ga_ref, uv_ref,
                         out_ref, cache, S):
    T = TILES_PER_STEP
    # per-tile params lane-expanded on the MXU (rows [p0x, p0y, dp, valid])
    PL = T * P
    g4 = ga_ref[0]  # (8, T)
    tid_P = jax.lax.broadcasted_iota(jnp.int32, (T, PL), 1) // P
    EP = (tid_P == jax.lax.broadcasted_iota(jnp.int32, (T, PL), 0)).astype(jnp.float32)
    gP = jnp.dot(g4, EP, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    tid_V = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1) // GV
    EV = (tid_V == jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)).astype(jnp.float32)
    gV = jnp.dot(g4, EV, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)

    # phase A: combined tent build + per-tile resample into slabs
    NT = K + 3 * GV
    rl = (jax.lax.broadcasted_iota(jnp.int32, (NT, PL), 1) % P).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (NT, PL), 0)
    pos_y = jnp.where(rowi < GV, 2 * rowi, 2 * rowi - K)
    qx = rowi - K
    axx, jxx = qx // GV, qx % GV
    pos_x = jnp.where(jxx == 0, 0, 2 * jxx - 2 + axx)
    pos = jnp.where(rowi < K, pos_y, pos_x).astype(jnp.float32)
    p0 = jnp.where(rowi < K, gP[1:2, :], gP[0:1, :])
    tents = jnp.maximum(
        0.0, 1.0 - jnp.abs(jnp.clip(p0 + pos * gP[2:3, :], 0.0, P - 1.0) - rl)
    )
    wy_all = tents[0:K]
    wx_all = tents[K:NT]
    mask = jnp.int32((1 << bits) - 1) if bits else None
    for t in range(T):
        slot = slots_ref[s * T + t]
        q_raw = cache[slot % U_MAX]
        wy = wy_all[:, t * P:(t + 1) * P]
        wx = wx_all[:, t * P:(t + 1) * P]
        base = t * GV
        for ch in range(channels):
            if bits:
                q = (jax.lax.shift_right_logical(q_raw, jnp.int32(bits * ch))
                     & mask).astype(jnp.float32)
            else:
                q = q_raw.astype(jnp.float32)
            c = jnp.mean(q)
            qc = q - c
            rows = jnp.dot(wy[:, 0:32], qc[:, 0:64],
                           preferred_element_type=jnp.float32) + jnp.dot(
                wy[:, 32:64], qc[:, 64:128], preferred_element_type=jnp.float32
            )
            half3 = jnp.dot(rows, wx.T, preferred_element_type=jnp.float32)
            S[3 * ch + 0, :, base:base + GV] = half3[:, 0:GV] + c
            S[3 * ch + 1, :, base:base + GV] = half3[:, GV:2 * GV] + c
            S[3 * ch + 2, :, base:base + GV] = half3[:, 2 * GV:3 * GV] + c

    # phase B: 3x3 window interpolation at the GIVEN uvs
    E = GV

    def ysel(x, b):
        if b == 0:
            body = jax.lax.slice_in_dim(x, 0, E - 1, axis=0)
        elif b == 1:
            body = jax.lax.slice_in_dim(x, E, K, axis=0)
        else:
            return jax.lax.slice_in_dim(x, 0, E, axis=0)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=0), body], axis=0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (GV, LANES), 1)
    j = lane % GV
    sub = jax.lax.broadcasted_iota(jnp.int32, (GV, LANES), 0)
    mu = uv_ref[0, 0:GV]
    mv = uv_ref[0, GV:2 * GV]
    lxw = mu * (2.0 * (GV - 1.0)) - jnp.maximum(2 * j - 2, 0).astype(jnp.float32)
    lyw = mv * (2.0 * (GV - 1.0)) - jnp.maximum(2 * sub - 2, 0).astype(jnp.float32)
    # the 3x3 tent weights depend only on the uvs — shared across channels
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(lyw - b)) for b in range(3)]
    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(lxw - a)) for a in range(3)]
    for ch in range(channels):
        h = jnp.zeros((GV, LANES), jnp.float32)
        for b in range(3):
            for a in range(3):
                h = h + wys[b] * wxs[a] * ysel(S[3 * ch + a], b)
        out_ref[0, ch * GV:(ch + 1) * GV] = h * gV[3]


def _attach_live_flags(batch, live_steps):
    """(steps,) int32 live-step flags; None = everything live."""
    steps = batch.slots.shape[0] // TILES_PER_STEP
    if live_steps is None:
        return jnp.ones((steps,), jnp.int32)
    return live_steps.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attach_sample_fused(block_array, batch, uvrows, live_steps=None,
                        interpret: bool = False):
    """Sample one attachment channel at given morphed uvs, fully fused.

    Args:
      block_array: (N, 32, 128) int32 quad blocks of the channel.
      batch: the frame's PatchBatch (assume_sorted schedule for this plan).
      uvrows: (steps, 2*GV, LANES) f32 — rows 0..16 = u per vertex row,
        rows 17..33 = v, in the mesh kernel's lane layout.
      live_steps: optional (steps,) flags — 0 skips the step's compute
        entirely (dead-capacity tail; same gating as mesh_fused).

    Returns (steps, GV, LANES) f32 raw texel values (caller normalizes).
    """
    Fp = batch.slots.shape[0]
    steps = Fp // TILES_PER_STEP
    ga = jnp.transpose(
        jnp.stack([
            batch.geom[:, 0], batch.geom[:, 1], batch.geom[:, 2],
            batch.geom[:, 3],
            jnp.zeros((Fp,), jnp.float32), jnp.zeros((Fp,), jnp.float32),
            jnp.zeros((Fp,), jnp.float32), jnp.zeros((Fp,), jnp.float32),
        ]).reshape(8, steps, TILES_PER_STEP),
        (1, 0, 2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 8, TILES_PER_STEP), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * GV, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, GV, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((U_MAX, 32, 128), jnp.int32),
            pltpu.VMEM((3, K, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _make_attach_kernel(1, 0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((steps, GV, LANES), jnp.float32),
        interpret=interpret,
    )(batch.uq, batch.slots, batch.rank_lo, batch.rank_hi, batch.n_unique,
      _attach_live_flags(batch, live_steps), ga, uvrows, block_array)


@functools.partial(
    jax.jit, static_argnames=("channels", "bits", "interpret")
)
def attach_sample_fused_packed(block_array, batch, uvrows, channels: int,
                               bits: int, live_steps=None,
                               interpret: bool = False):
    """Sample ALL channels of a packed multi-channel attachment at given
    morphed uvs in ONE fused pass.

    Args:
      block_array: (N, 32, 128) int32 quad blocks with ``channels``
        channels packed little-endian at ``bits`` bits each
        (patch_sampling.blocks_from_tile_packed) — Rgba8: 4 x 8, Rg16:
        2 x 16 (one texel == one word, as in the reference's texture
        formats, src/terrain_data/mod.rs:38-84).
      batch / uvrows: as :func:`attach_sample_fused`.

    Returns (steps, channels * GV, LANES) f32 raw texel values, channel-
    major rows (caller normalizes). The quad fetch happens ONCE for all
    channels — this is what makes a 4-channel albedo cost ~1 fused pass
    instead of 4 (the fetch is DMA-count bound; docs/perf_notes.md).
    """
    Fp = batch.slots.shape[0]
    steps = Fp // TILES_PER_STEP
    ga = jnp.transpose(
        jnp.stack([
            batch.geom[:, 0], batch.geom[:, 1], batch.geom[:, 2],
            batch.geom[:, 3],
            jnp.zeros((Fp,), jnp.float32), jnp.zeros((Fp,), jnp.float32),
            jnp.zeros((Fp,), jnp.float32), jnp.zeros((Fp,), jnp.float32),
        ]).reshape(8, steps, TILES_PER_STEP),
        (1, 0, 2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 8, TILES_PER_STEP), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * GV, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, channels * GV, LANES), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((U_MAX, 32, 128), jnp.int32),
            pltpu.VMEM((3 * channels, K, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _make_attach_kernel(channels, bits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (steps, channels * GV, LANES), jnp.float32),
        interpret=interpret,
    )(batch.uq, batch.slots, batch.rank_lo, batch.rank_hi, batch.n_unique,
      _attach_live_flags(batch, live_steps), ga, uvrows, block_array)
