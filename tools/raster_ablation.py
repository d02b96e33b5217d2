"""Where does rasterize_grid's time go at the bench scene's scale?

Stages timed independently (each as its own jit, profiler-traced):
  project   vertex projection + per-triangle screen data + bin keys
  sort      the (4T,) candidate sort (bin key + near-first depth key)
  table     rank/searchsorted + per-level scatter tables + gather-up
  scan      the per-bin candidate scan (edge dots + depth race)
  resolve   winner gathers + perspective-correct barycentrics

Because stage boundaries force materialization the sum exceeds the
fused end-to-end time; the ranking is what matters.

Usage: python tools/raster_ablation.py [--cpu] [--size 1024]
       [--bin-px 32] [--bin-cap 512] [--chunk 16]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    def arg(name, default):
        if name in sys.argv:
            return int(sys.argv[sys.argv.index(name) + 1])
        return default

    size = arg("--size", 1024)
    bin_px = arg("--bin-px", 32)
    bin_cap = arg("--bin-cap", 512)
    chunk = arg("--chunk", 16)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_bench import build_scene

    from bevy_terrain_tpu.math import frustum
    from bevy_terrain_tpu.ops import meshgen, refinement
    from bevy_terrain_tpu.ops.pallas_kernels import block_format
    from bevy_terrain_tpu.render import raster as R
    from bevy_terrain_tpu.utils.timing import device_time_ms

    cfg, plan, blocks, u1, _ = build_scene()
    blocks = jax.device_put(blocks, block_format())

    @jax.jit
    def frame(block_array, u):
        tiles = refinement.refine_tiles(u, cfg)
        raw, tiles = meshgen.generate_mesh_fused(
            tiles, block_array, u, cfg, plan, 65535.0
        )
        return tiles, meshgen.fused_to_grid(raw, tiles, cfg, u)

    tiles, mesh = frame(blocks, u1)
    jax.block_until_ready(mesh.positions)

    view = np.asarray(u1.view_world_position)
    vp = frustum.view_projection(
        view, view + np.array([1000.0, -40.0, 300.0]), np.pi / 3, 16 / 9
    )
    vp32 = jnp.asarray(vp, jnp.float32)

    positions, tile_mask = mesh.positions, mesh.tile_mask
    F, Rg, Cg = positions.shape[0], positions.shape[1], positions.shape[2]
    tri_vidx = jnp.asarray(R._triangle_vertex_indices(F, Rg, Cg))
    T = tri_vidx.shape[0]
    width = height = size
    nbx = -(-width // bin_px)
    nby = -(-height // bin_px)
    NB = nbx * nby
    levels = max(int(np.ceil(np.log2(max(nbx, nby)))), 0) + 1
    caps = R._level_caps(bin_cap, levels)
    nbx_l = [-(-nbx // (1 << L)) for L in range(levels)]
    nby_l = [-(-nby // (1 << L)) for L in range(levels)]
    nb_l = [a * b for a, b in zip(nbx_l, nby_l)]
    key_off = np.concatenate([[0], np.cumsum(nb_l)]).astype(np.int32)
    NKEYS = int(key_off[-1])
    total_cap = int(sum(caps))
    print(
        f"scene: T={T} tris, NB={NB} bins x {bin_px}px, levels={levels}, "
        f"caps={caps} (total {total_cap}), chunk={chunk}"
    )

    @jax.jit
    def stage_project(positions, tile_mask):
        sx, sy, sz, w = R._project(
            positions.reshape(-1, 3), vp32, width, height
        )
        vx, vy = sx[tri_vidx], sy[tri_vidx]
        vz, vw = sz[tri_vidx], w[tri_vidx]
        tile_of_tri = tri_vidx[:, 0] // (Rg * Cg)
        alive = tile_mask[tile_of_tri]
        in_front = jnp.all(vw > 1e-4, axis=-1)
        area = (vx[:, 1] - vx[:, 0]) * (vy[:, 2] - vy[:, 0]) - (
            vy[:, 1] - vy[:, 0]
        ) * (vx[:, 2] - vx[:, 0])
        valid = alive & in_front & (area != 0)
        minx = jnp.min(vx, axis=-1)
        maxx = jnp.max(vx, axis=-1)
        miny = jnp.min(vy, axis=-1)
        maxy = jnp.max(vy, axis=-1)
        offscreen = (
            (maxx < 0) | (minx >= width) | (maxy < 0) | (miny >= height)
        )
        valid = valid & ~offscreen
        px0 = jnp.clip(jnp.floor(minx).astype(jnp.int32), 0, width - 1)
        px1 = jnp.clip(jnp.floor(maxx).astype(jnp.int32), 0, width - 1)
        py0 = jnp.clip(jnp.floor(miny).astype(jnp.int32), 0, height - 1)
        py1 = jnp.clip(jnp.floor(maxy).astype(jnp.int32), 0, height - 1)
        cbx0, cbx1 = px0 // bin_px, px1 // bin_px
        cby0, cby1 = py0 // bin_px, py1 // bin_px
        d = jnp.maximum(cbx1 - cbx0, cby1 - cby0)
        lvl = jnp.clip(
            jnp.ceil(
                jnp.log2(jnp.maximum(d, 1).astype(jnp.float32))
            ).astype(jnp.int32),
            0,
            levels - 1,
        )
        bx0, bx1 = cbx0 >> lvl, cbx1 >> lvl
        by0, by1 = cby0 >> lvl, cby1 >> lvl
        lvl_nbx = jnp.asarray(nbx_l, jnp.int32)[lvl]
        lvl_off = jnp.asarray(key_off, jnp.int32)[lvl]
        e = jnp.arange(4, dtype=jnp.int32)
        ex = jnp.minimum(bx0[:, None] + (e & 1)[None, :], bx1[:, None])
        ey = jnp.minimum(by0[:, None] + (e >> 1)[None, :], by1[:, None])
        dup = ((e & 1)[None, :] > (bx1 - bx0)[:, None]) | (
            (e >> 1)[None, :] > (by1 - by0)[:, None]
        )
        pair_ok = valid[:, None] & ~dup
        key = jnp.where(
            pair_ok, lvl_off[:, None] + ey * lvl_nbx[:, None] + ex, NKEYS
        )
        zmax_tri = jnp.max(vz, axis=-1)
        znear_key = jnp.broadcast_to(
            -jax.lax.bitcast_convert_type(
                jnp.maximum(zmax_tri, 0.0), jnp.int32
            )[:, None],
            (T, 4),
        )
        return key.reshape(-1), znear_key.reshape(-1)

    key, zkey = stage_project(positions, tile_mask)
    jax.block_until_ready(key)
    ms = device_time_ms(
        lambda: stage_project(positions, tile_mask)[0], label="project"
    )
    print(f"project  {ms * 1000:10.1f} us")

    tri_id = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, 4)
    ).reshape(-1)

    @jax.jit
    def stage_sort(key, zkey):
        return jax.lax.sort(
            (key, zkey, tri_id), num_keys=2, is_stable=True
        )

    s_key, s_z, s_tri = stage_sort(key, zkey)
    jax.block_until_ready(s_key)
    ms = device_time_ms(lambda: stage_sort(key, zkey)[0], label="sort")
    print(f"sort     {ms * 1000:10.1f} us   ({key.shape[0]} elements, 2-key stable + payload)")

    # packed two-uint32-key variant (what rasterize_grid now uses)
    kbits = max(int(np.ceil(np.log2(NKEYS + 1))), 1)
    tbits = max(int(np.ceil(np.log2(max(T, 2)))), 1)

    @jax.jit
    def stage_sort_packed(key, zkey):
        dhi = 32 - kbits
        dlo = max(32 - tbits, 0)
        dprio = jax.lax.bitcast_convert_type(zkey, jnp.uint32) ^ jnp.uint32(
            0x80000000
        )
        high = (key.astype(jnp.uint32) << dhi) | (dprio >> kbits)
        d_rest = (dprio & jnp.uint32((1 << kbits) - 1)) >> max(
            kbits - dlo, 0
        )
        low = (d_rest << tbits) | tri_id.astype(jnp.uint32)
        return jax.lax.sort((high, low), num_keys=2)

    sp = stage_sort_packed(key, zkey)
    jax.block_until_ready(sp[0])
    ms = device_time_ms(
        lambda: stage_sort_packed(key, zkey)[0], label="sort_packed"
    )
    print(f"sortpack {ms * 1000:10.1f} us   (two packed uint32 keys)")

    @jax.jit
    def stage_table(s_key, s_tri):
        first = jnp.searchsorted(s_key, s_key, side="left")
        rank = jnp.arange(s_key.shape[0], dtype=jnp.int32) - first.astype(
            jnp.int32
        )
        b0 = jnp.arange(NB, dtype=jnp.int32)
        b0x, b0y = b0 % nbx, b0 // nbx
        tables = []
        for L in range(levels):
            in_level = (s_key >= int(key_off[L])) & (
                s_key < int(key_off[L + 1])
            )
            keep = in_level & (rank < caps[L])
            local = (s_key - int(key_off[L])).astype(jnp.int32)
            slot = jnp.where(keep, local * caps[L] + rank, nb_l[L] * caps[L])
            tab = jnp.full((nb_l[L] * caps[L] + 1,), -1, jnp.int32)
            tab = tab.at[slot].set(s_tri, mode="drop")
            tab = tab[: nb_l[L] * caps[L]].reshape(nb_l[L], caps[L])
            up = (b0y >> L) * nbx_l[L] + (b0x >> L)
            tables.append(tab[up])
        return jnp.concatenate(tables, axis=1)

    table = stage_table(s_key, s_tri)
    jax.block_until_ready(table)
    ms = device_time_ms(lambda: stage_table(s_key, s_tri), label="table")
    print(f"table    {ms * 1000:10.1f} us")

    sx, sy, sz, w = R._project(positions.reshape(-1, 3), vp32, width, height)
    sx, sy, sz = map(jax.block_until_ready, (sx, sy, sz))

    n_chunks = -(-total_cap // chunk)
    pad = n_chunks * chunk - total_cap
    if pad:
        table = jnp.concatenate(
            [table, jnp.full((NB, pad), -1, jnp.int32)], axis=1
        )

    @jax.jit
    def stage_scan(table, sx, sy, sz):
        px_local = jnp.arange(bin_px, dtype=jnp.float32) + 0.5
        lx = jnp.tile(px_local, bin_px)
        ly = jnp.repeat(px_local, bin_px)
        bins = jnp.arange(NB, dtype=jnp.int32)
        ox = (bins % nbx).astype(jnp.float32) * bin_px
        oy = (bins // nbx).astype(jnp.float32) * bin_px
        pix = jnp.stack(
            [
                ox[:, None] + lx[None, :],
                oy[:, None] + ly[None, :],
                jnp.ones((NB, bin_px * bin_px), jnp.float32),
            ],
            axis=-1,
        )

        def step(carry, c_idx):
            best_z, best_t = carry
            cand = jax.lax.dynamic_slice(
                table, (0, c_idx * chunk), (NB, chunk)
            )
            safe = jnp.maximum(cand, 0)
            cvi = tri_vidx[safe]
            cx, cy, cz = sx[cvi], sy[cvi], sz[cvi]
            a0, b0, c0 = R.edge_coef(
                cx[..., 1], cy[..., 1], cx[..., 2], cy[..., 2]
            )
            a1, b1, c1 = R.edge_coef(
                cx[..., 2], cy[..., 2], cx[..., 0], cy[..., 0]
            )
            a2, b2, c2 = R.edge_coef(
                cx[..., 0], cy[..., 0], cx[..., 1], cy[..., 1]
            )
            ar = a0 * cx[..., 0] + b0 * cy[..., 0] + c0
            s = jnp.where(ar < 0, -1.0, 1.0)
            inv_ar = s / jnp.maximum(jnp.abs(ar), 1e-20)
            za = (a0 * cz[..., 0] + a1 * cz[..., 1] + a2 * cz[..., 2]) * inv_ar
            zb = (b0 * cz[..., 0] + b1 * cz[..., 1] + b2 * cz[..., 2]) * inv_ar
            zc = (c0 * cz[..., 0] + c1 * cz[..., 1] + c2 * cz[..., 2]) * inv_ar
            coefs = jnp.stack(
                [
                    jnp.stack([a0 * s, b0 * s, c0 * s], -1),
                    jnp.stack([a1 * s, b1 * s, c1 * s], -1),
                    jnp.stack([a2 * s, b2 * s, c2 * s], -1),
                    jnp.stack([za, zb, zc], -1),
                ],
                axis=-2,
            ).reshape(NB, chunk * 4, 3)
            vals = jax.lax.dot_general(
                pix,
                coefs,
                ((((2,), (2,)), ((0,), (0,)))),
                preferred_element_type=jnp.float32,
            ).reshape(NB, bin_px * bin_px, chunk, 4)
            e0, e1, e2, z = (
                vals[..., 0],
                vals[..., 1],
                vals[..., 2],
                vals[..., 3],
            )
            tl0 = ((b0 * s) < 0) | (((b0 * s) == 0) & ((a0 * s) > 0))
            tl1 = ((b1 * s) < 0) | (((b1 * s) == 0) & ((a1 * s) > 0))
            tl2 = ((b2 * s) < 0) | (((b2 * s) == 0) & ((a2 * s) > 0))
            inside = (
                R.raster_coverage_rule(e0, tl0[:, None, :])
                & R.raster_coverage_rule(e1, tl1[:, None, :])
                & R.raster_coverage_rule(e2, tl2[:, None, :])
                & (cand >= 0)[:, None, :]
            )
            z = jnp.where(inside, z, -jnp.inf)
            zi = jnp.argmax(z, axis=-1)
            zmax = jnp.take_along_axis(z, zi[..., None], axis=-1)[..., 0]
            tbest = jnp.take_along_axis(
                cand[:, None, :], zi[..., None], axis=-1
            )[..., 0]
            better = zmax > best_z
            return (
                jnp.where(better, zmax, best_z),
                jnp.where(better, tbest, best_t),
            ), None

        init = (
            jnp.full((NB, bin_px * bin_px), -jnp.inf, jnp.float32),
            jnp.full((NB, bin_px * bin_px), -1, jnp.int32),
        )
        (best_z, best_t), _ = jax.lax.scan(
            step, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
        return best_z, best_t

    bz, bt = stage_scan(table, sx, sy, sz)
    jax.block_until_ready(bz)
    ms = device_time_ms(
        lambda: stage_scan(table, sx, sy, sz)[0], label="scan"
    )
    print(f"scan     {ms * 1000:10.1f} us   ({n_chunks} chunks of {chunk})")

    full = R.rasterize_grid(
        positions,
        tile_mask,
        vp32,
        width,
        height,
        bin_px=bin_px,
        bin_cap=bin_cap,
        chunk=chunk,
    )
    jax.block_until_ready(full.depth)
    print(
        f"end-to-end check: coverage "
        f"{float(np.asarray(full.covered).mean()):.3f}, "
        f"overflow {int(full.bin_overflow)}"
    )
    ms = device_time_ms(
        lambda: R.rasterize_grid(
            positions,
            tile_mask,
            vp32,
            width,
            height,
            bin_px=bin_px,
            bin_cap=bin_cap,
            chunk=chunk,
        ).depth,
        label="full",
    )
    print(f"full     {ms * 1000:10.1f} us")


if __name__ == "__main__":
    main()
