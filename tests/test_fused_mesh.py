"""Fused Pallas mesh kernel vs the staged XLA path (interpret mode).

The fused kernel (ops/pallas_kernels.mesh_fused) is the TPU headline
path; here it runs under the Pallas interpreter on CPU and must match
generate_mesh_grid with per-vertex blend (the same math it fuses) —
heights/positions/uvs per tile. Interpreter dots are exact f32, so the
comparison is tight (the TPU build additionally carries documented
bf16-pass MXU quantization).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bevy_terrain_tpu.config import TerrainViewConfig
from bevy_terrain_tpu.math import TerrainModel, TerrainModelApproximation
from bevy_terrain_tpu.ops import meshgen, patch_sampling, refinement
from bevy_terrain_tpu.ops import pallas_kernels as pk
from bevy_terrain_tpu.ops import tile_tree as tto
from bevy_terrain_tpu.ops.params import StaticTerrainConfig, make_frame_uniforms


@pytest.fixture(scope="module")
def small_frame():
    TEXTURE_SIZE, BORDER, LODS, SIDE = 512, 2, 3, 1000.0
    model = TerrainModel.planar(np.zeros(3), SIDE, 0.0, 100.0)
    vc = TerrainViewConfig(tile_capacity=64)
    view = np.array([30.0, 60.0, -20.0])
    origins, vt_int, vt_frac = tto.compute_view_anchors(model, view, LODS, 8)
    approx = TerrainModelApproximation.compute(model, view, vc.origin_lod, 50.0)
    rng = np.random.default_rng(1)
    entries = np.zeros((1, LODS, 8, 8, 2), np.int32)
    entries[..., 0] = rng.integers(0, 16, (1, LODS, 8, 8))
    entries[..., 1] = np.arange(LODS)[None, :, None, None]
    uniforms = make_frame_uniforms(
        model, view, approx, origins, entries, vt_int, vt_frac, vc
    )
    plan = patch_sampling.make_patch_plan(TEXTURE_SIZE, 4, BORDER)
    blocks = jnp.asarray(
        rng.integers(0, 65535, (16 * plan.total_blocks_per_slot, 32, 128)).astype(
            np.int32
        )
    )
    return model, vc, uniforms, plan, blocks


def _cfg(vc, **kw):
    return StaticTerrainConfig(
        spherical=False, side_count=1, lod_count=3, tree_size=vc.tree_size,
        grid_size=16, refinement_count=8, queue_capacity=256,
        tile_capacity=vc.tile_capacity, origin_lod=vc.origin_lod, **kw,
    )


class TestFusedKernelMatchesStagedPath:
    def test_heights_positions_uvs(self, small_frame):
        model, vc, uniforms, plan, blocks = small_frame
        cfg_ref = _cfg(vc, blend_per_vertex=True)
        cfg_fused = _cfg(vc)

        tiles0 = refinement.refine_tiles(uniforms, cfg_ref)
        assert int(tiles0.tile_count) > 0
        mesh_ref, tiles_ref = meshgen.generate_mesh_grid(
            tiles0, blocks, uniforms, cfg_ref, plan, 65535.0
        )
        raw, tiles_f = meshgen.generate_mesh_fused(
            refinement.refine_tiles(uniforms, cfg_fused), blocks, uniforms,
            cfg_fused, plan, 65535.0, interpret=True,
        )
        mesh_f = meshgen.fused_to_grid(raw, tiles_f, cfg_fused)

        n = int(tiles_ref.tile_count)
        assert int(tiles_f.tile_count) == n

        def rows(t):
            return {
                (int(l), int(x), int(y)): i
                for i, (l, (x, y)) in enumerate(zip(
                    np.asarray(t.tile_lod[:n]), np.asarray(t.tile_xy[:n])
                ))
            }

        ra, rb = rows(tiles_f), rows(tiles_ref)
        assert set(ra) == set(rb)
        hf = np.asarray(mesh_f.heights)
        hr = np.asarray(mesh_ref.heights)
        pf = np.asarray(mesh_f.positions)
        pr = np.asarray(mesh_ref.positions)
        uf = np.asarray(mesh_f.uvs)
        ur = np.asarray(mesh_ref.uvs)
        for key, i in ra.items():
            j = rb[key]
            np.testing.assert_allclose(hf[i], hr[j], atol=2e-2, err_msg=str(key))
            np.testing.assert_allclose(pf[i], pr[j], atol=2e-2, err_msg=str(key))
            np.testing.assert_allclose(uf[i], ur[j], atol=1e-6, err_msg=str(key))


class TestFusedSpherical:
    def test_spherical_hp_matches_staged(self):
        """Spherical fused kernel (cube-sphere world path + Taylor
        relative near-field) vs the staged hp path, interpret mode.
        origin_lod=2 makes the frame span BOTH re-anchor directions
        (tiles coarser and finer than the origin lod)."""
        R = 6.371e6
        model = TerrainModel.sphere(np.zeros(3), R, 0.0, 9000.0)
        vc = TerrainViewConfig(tile_capacity=128, origin_lod=2)
        anchor = np.array([0.3, 0.2, 0.93])
        anchor /= np.linalg.norm(anchor)
        view = model.position_local_to_world(anchor, 20_000.0)
        LODS = 4

        def cfgk(**kw):
            return StaticTerrainConfig(
                spherical=True, side_count=6, lod_count=LODS, tree_size=8,
                grid_size=16, refinement_count=6, queue_capacity=512,
                tile_capacity=128, origin_lod=2, high_precision=True, **kw,
            )

        origins, vt_int, vt_frac = tto.compute_view_anchors(model, view, LODS, 8)
        approx = TerrainModelApproximation.compute(model, view, 2, 4500.0)
        rng = np.random.default_rng(2)
        entries = np.zeros((6, LODS, 8, 8, 2), np.int32)
        entries[..., 0] = rng.integers(0, 16, (6, LODS, 8, 8))
        entries[..., 1] = np.minimum(np.arange(LODS), 2)[None, :, None, None]
        uniforms = make_frame_uniforms(
            model, view, approx, origins, entries, vt_int, vt_frac, vc
        )
        plan = patch_sampling.make_patch_plan(512, 4, 2)
        blocks = jnp.asarray(
            rng.integers(0, 65535, (16 * plan.total_blocks_per_slot, 32, 128)).astype(np.int32)
        )

        cfg_ref = cfgk(blend_per_vertex=True)
        cfg_fused = cfgk()
        tiles0 = refinement.refine_tiles(uniforms, cfg_ref)
        n = int(tiles0.tile_count)
        assert n > 6
        mesh_ref, tiles_ref = meshgen.generate_mesh_grid(
            tiles0, blocks, uniforms, cfg_ref, plan, 65535.0
        )
        raw, tiles_f = meshgen.generate_mesh_fused(
            refinement.refine_tiles(uniforms, cfg_fused), blocks, uniforms,
            cfg_fused, plan, 65535.0, interpret=True,
        )
        mesh_f = meshgen.fused_to_grid(raw, tiles_f, cfg_fused, uniforms)
        assert int(tiles_f.tile_count) == n

        def rows(t):
            return {
                (int(sd), int(l), int(x), int(y)): i
                for i, (sd, l, (x, y)) in enumerate(zip(
                    np.asarray(t.tile_side[:n]), np.asarray(t.tile_lod[:n]),
                    np.asarray(t.tile_xy[:n]),
                ))
            }

        ra, rb = rows(tiles_f), rows(tiles_ref)
        assert set(ra) == set(rb)
        hf, hr = np.asarray(mesh_f.heights), np.asarray(mesh_ref.heights)
        pf, pr = np.asarray(mesh_f.positions), np.asarray(mesh_ref.positions)
        uf, ur = np.asarray(mesh_f.uvs), np.asarray(mesh_ref.uvs)
        view_f = np.asarray(uniforms.view_world_position)
        for key, i in ra.items():
            j = rb[key]
            # the kernel computes lod targets via log2(base)-0.5*log2(d^2)
            # (one transcendental pass); vertices sitting within ~1e-6 of
            # an integer blend-lod boundary can flip floor(btarget) vs the
            # staged path and take the other (equally valid) crossfade arm
            # — observed <= 6 cm on the 9 km range at 3/289 vertices
            np.testing.assert_allclose(hf[i], hr[j], atol=1e-1, err_msg=str(key))
            np.testing.assert_allclose(uf[i], ur[j], atol=1e-6, err_msg=str(key))
            # positions at planet scale: compare view-relative (f32 world
            # quantization at 6.4e6 m is ~0.5 m per ulp; allow a few)
            np.testing.assert_allclose(
                pf[i] - view_f, pr[j] - view_f, atol=3.0, err_msg=str(key)
            )
        # the near-field (Taylor) vertices must agree tightly
        d = np.linalg.norm(pr.reshape(-1, 3) - view_f, axis=-1)
        nearmask = d < float(uniforms.precision_threshold_distance)
        if nearmask.any():
            np.testing.assert_allclose(
                pf.reshape(-1, 3)[nearmask], pr.reshape(-1, 3)[nearmask],
                atol=0.2,
            )

        # SPHERE normal shortcut (normal = (world - center)/R, no
        # normal-matrix pass) vs the full NM path on the same sphere: the
        # two kernel variants must agree to f32 rounding — the shortcut
        # is exact for spheres, only ellipsoids need NM
        cfg_nm = cfgk(ellipsoidal=True)
        raw_nm, tiles_nm = meshgen.generate_mesh_fused(
            refinement.refine_tiles(uniforms, cfg_nm), blocks, uniforms,
            cfg_nm, plan, 65535.0, interpret=True,
        )
        mesh_nm = meshgen.fused_to_grid(raw_nm, tiles_nm, cfg_nm, uniforms)
        np.testing.assert_allclose(
            np.asarray(mesh_f.normals)[:n], np.asarray(mesh_nm.normals)[:n],
            atol=1e-5,
        )
        # positions reassociate (sx + t vs fused fma chain): a few f32
        # ulps at planet scale (1 ulp = 0.5 m at 6.4e6 m)
        np.testing.assert_allclose(
            pf[:n] - view_f, np.asarray(mesh_nm.positions)[:n] - view_f,
            atol=2.0,
        )


class TestFusedAttachmentSampling:
    def test_matches_xla_fallback(self, small_frame):
        """attach_sample_fused (interpret mode) vs the XLA fallback
        channel sampler at the same morphed uvs."""
        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        tiles = refinement.refine_tiles(uniforms, cfg)
        tiles, batch = patch_sampling.plan_patch_batch(
            tiles, uniforms, cfg, plan, blocks.shape[0], pk.TILES_PER_STEP
        )
        F, G1 = cfg.tile_capacity, cfg.grid_size + 1
        rng = np.random.default_rng(4)
        uv = jnp.asarray(rng.uniform(0, 1, (F, G1, G1, 2)).astype(np.float32))
        geom = batch.geom.at[:, 4].set(0.0)
        batch = batch._replace(geom=geom)

        # XLA fallback
        patch = patch_sampling.fetch_patches_xla(blocks, batch.ids[:F, None])
        half = patch_sampling.halfgrid_resample(
            patch, batch.geom[:F, 0:2], batch.geom[:F, 2], cfg
        ) / 65535.0
        half = patch_sampling.permute_halfgrid(
            half * batch.geom[:F, 3][:, None, None])
        want = np.asarray(
            patch_sampling.vertex_values_from_halfgrid(half, uv, cfg))

        # fused kernel (interpret)
        T = pk.TILES_PER_STEP
        Fp = batch.slots.shape[0]
        steps = Fp // T
        pad_n = Fp - F

        def rows_of(comp):
            x = uv[..., comp]
            if pad_n:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad_n, G1, G1), x.dtype)], axis=0)
            x = x.reshape(steps, T, G1, G1)
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(steps, G1, T * G1)

        uvrows = jnp.concatenate([rows_of(0), rows_of(1)], axis=1)
        raw = pk.attach_sample_fused(blocks, batch, uvrows, interpret=True)
        got = np.asarray(
            jnp.transpose(raw.reshape(steps, G1, T, G1), (0, 2, 1, 3))
            .reshape(Fp, G1, G1)[:F]
        ) / 65535.0
        n = int(tiles.tile_count)
        np.testing.assert_allclose(got[:n], want[:n], atol=2e-3)


class TestPackedAttachmentSampling:
    def test_packed_matches_per_channel(self, small_frame):
        """attach_sample_fused_packed (one fetch, in-VMEM unpack) vs four
        independent attach_sample_fused passes on the planar channel
        arrays — the packed word IS the four channels (Rgba8 layout,
        reference src/terrain_data/mod.rs:38-84)."""
        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        tiles = refinement.refine_tiles(uniforms, cfg)
        tiles, batch = patch_sampling.plan_patch_batch(
            tiles, uniforms, cfg, plan, blocks.shape[0], pk.TILES_PER_STEP
        )
        F, G1 = cfg.tile_capacity, cfg.grid_size + 1
        rng = np.random.default_rng(11)
        chans = [
            rng.integers(0, 256, blocks.shape).astype(np.uint32)
            for _ in range(4)
        ]
        packed = chans[0].copy()
        for c in range(1, 4):
            packed |= chans[c] << (8 * c)
        packed = jnp.asarray(packed.view(np.int32))
        uv = jnp.asarray(rng.uniform(0, 1, (F, G1, G1, 2)).astype(np.float32))
        geom = batch.geom.at[:, 4].set(0.0)
        batch = batch._replace(geom=geom)

        T = pk.TILES_PER_STEP
        Fp = batch.slots.shape[0]
        steps = Fp // T
        pad_n = Fp - F

        def rows_of(comp):
            x = uv[..., comp]
            if pad_n:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad_n, G1, G1), x.dtype)], axis=0)
            x = x.reshape(steps, T, G1, G1)
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(steps, G1, T * G1)

        uvrows = jnp.concatenate([rows_of(0), rows_of(1)], axis=1)
        raw4 = pk.attach_sample_fused_packed(
            packed, batch, uvrows, 4, 8, interpret=True)
        n = int(tiles.tile_count)
        for c in range(4):
            want = pk.attach_sample_fused(
                jnp.asarray(chans[c].astype(np.int32)), batch, uvrows,
                interpret=True)
            got = raw4[:, c * G1:(c + 1) * G1]
            np.testing.assert_allclose(
                np.asarray(got).reshape(steps, G1, T, G1)
                .transpose(0, 2, 1, 3).reshape(Fp, G1, G1)[:n],
                np.asarray(want).reshape(steps, G1, T, G1)
                .transpose(0, 2, 1, 3).reshape(Fp, G1, G1)[:n],
                atol=1e-4,
            )

    def test_merged_mesh_albedo_kernel(self, small_frame):
        """The MERGED kernel (generate_mesh_fused with albedo_channels=4)
        must reproduce (a) the mesh products of the albedo-free kernel
        bit-for-bit* and (b) the standalone packed attach sampler's colors
        at the kernel's own morphed uvs (*interpret mode: exact f32 dots,
        identical op order)."""
        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        rng = np.random.default_rng(21)
        chans = [
            rng.integers(0, 256, blocks.shape).astype(np.uint32)
            for _ in range(4)
        ]
        packed_np = chans[0].copy()
        for c in range(1, 4):
            packed_np |= chans[c] << (8 * c)
        packed = jnp.asarray(packed_np.view(np.int32))

        tiles0 = refinement.refine_tiles(uniforms, cfg)
        # exact path (albedo_fast=False): f32 dots, identical op order
        raw_m, tiles_m = meshgen.generate_mesh_fused(
            tiles0, blocks, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_blocks=packed, albedo_channels=4, albedo_bits=8,
            albedo_fast=False,
        )
        raw_0, tiles_0 = meshgen.generate_mesh_fused(
            tiles0, blocks, uniforms, cfg, plan, 65535.0, interpret=True,
        )
        n = int(tiles_m.tile_count)
        assert n > 0 and int(tiles_0.tile_count) == n
        # (a) mesh rows identical
        base_rows = raw_0.shape[1]
        np.testing.assert_array_equal(
            np.asarray(raw_m[:, :base_rows]), np.asarray(raw_0))
        mesh_m = meshgen.fused_to_grid(raw_m, tiles_m, cfg)
        # (b) colors match the standalone packed sampler at the SAME uvs
        got = np.asarray(
            meshgen.fused_albedo_to_grid(raw_m, cfg, 4, 255.0))
        want = np.asarray(patch_sampling.sample_attachment_vertices(
            [packed], tiles_m, mesh_m.uvs, uniforms, cfg, plan, 255.0,
            packed_channels=4, packed_bits=8,
        ))
        # CPU routes sample_attachment_vertices through the XLA fallback
        # (different op order than the kernel's exact interpret dots)
        np.testing.assert_allclose(got[:n], want[:n], atol=2e-3)
        # (c) the production fast path (bf16 tents/texels, lane-stacked
        # channel dots) is sampler-grade: within 2 LSB of 8-bit color of
        # the exact path (measured max ~0.9 LSB), mesh rows bit-identical
        raw_f, tiles_f = meshgen.generate_mesh_fused(
            tiles0, blocks, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_blocks=packed, albedo_channels=4, albedo_bits=8,
            albedo_fast=True,
        )
        assert int(tiles_f.tile_count) == n
        np.testing.assert_array_equal(
            np.asarray(raw_f[:, :base_rows]), np.asarray(raw_0))
        got_f = np.asarray(
            meshgen.fused_albedo_to_grid(raw_f, cfg, 4, 255.0))
        np.testing.assert_allclose(got_f[:n], got[:n], atol=2.0 / 255.0)

    def test_in_kernel_shade_matches_staged(self, small_frame):
        """The in-kernel fragment stage (generate_mesh_fused with
        shade_spec) must match render.material.shade on the extracted
        grids — same albedo, same normals, same Filament lighting."""
        from bevy_terrain_tpu.render.material import (
            DirectionalLight, PointLight, StandardMaterial, albedo_material,
            kernel_shade_spec, shade,
        )

        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        rng = np.random.default_rng(31)
        chans = [
            rng.integers(0, 256, blocks.shape).astype(np.uint32)
            for _ in range(4)
        ]
        packed_np = chans[0].copy()
        for c in range(1, 4):
            packed_np |= chans[c] << (8 * c)
        packed = jnp.asarray(packed_np.view(np.int32))
        material = StandardMaterial(
            base_color=albedo_material(1),
            perceptual_roughness=0.6, metallic=0.2, reflectance=0.4,
            lights=(
                DirectionalLight(direction=(-0.3, -0.8, -0.5),
                                 color=(1.0, 0.9, 0.8), illuminance=0.9),
                PointLight(position=(120.0, 300.0, -80.0), range=3000.0,
                           intensity=0.5),
            ),
        )
        spec = kernel_shade_spec(material, 255.0)
        assert spec is not None

        tiles0 = refinement.refine_tiles(uniforms, cfg)
        raw_s, tiles_s = meshgen.generate_mesh_fused(
            tiles0, blocks, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_blocks=packed, albedo_channels=4, albedo_bits=8,
            shade_spec=spec,
        )
        got = np.asarray(meshgen.fused_albedo_to_grid(raw_s, cfg, 4, 1.0))

        raw_m, tiles_m = meshgen.generate_mesh_fused(
            tiles0, blocks, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_blocks=packed, albedo_channels=4, albedo_bits=8,
        )
        mesh_m = meshgen.fused_to_grid(raw_m, tiles_m, cfg)
        rgba = meshgen.fused_albedo_to_grid(raw_m, cfg, 4, 255.0)
        want = np.asarray(shade(
            mesh_m, tiles_m, uniforms, cfg, material=material, lighting=True,
            attachment_samples={1: rgba},
        ))
        n = int(tiles_s.tile_count)
        assert int(tiles_m.tile_count) == n and n > 0
        np.testing.assert_allclose(got[:n], want[:n], atol=2e-3)

    def test_combined_blocks_and_opaque_channels(self, small_frame):
        """(a) albedo_combined=True (heights rows 0:32 + packed albedo
        rows 32:64 in ONE block array, one DMA per tile) must be bitwise
        identical to the two-stream kernel. (b) An opaque material
        (albedo_channels=3) reproduces the 4-channel run's RGB rows."""
        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        rng = np.random.default_rng(41)
        chans = [
            rng.integers(0, 256, blocks.shape).astype(np.uint32)
            for _ in range(4)
        ]
        packed_np = chans[0].copy()
        for c in range(1, 4):
            packed_np |= chans[c] << (8 * c)
        packed = jnp.asarray(packed_np.view(np.int32))
        combined = jnp.concatenate(
            [blocks, jnp.asarray(packed_np.view(np.int32))], axis=1)

        tiles0 = refinement.refine_tiles(uniforms, cfg)
        raw_s, tiles_s = meshgen.generate_mesh_fused(
            tiles0, blocks, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_blocks=packed, albedo_channels=4, albedo_bits=8,
        )
        raw_c, tiles_c = meshgen.generate_mesh_fused(
            tiles0, combined, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_channels=4, albedo_bits=8, albedo_combined=True,
        )
        n = int(tiles_s.tile_count)
        assert n > 0 and int(tiles_c.tile_count) == n
        np.testing.assert_array_equal(np.asarray(raw_c), np.asarray(raw_s))

        raw_o, tiles_o = meshgen.generate_mesh_fused(
            tiles0, combined, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_channels=3, albedo_bits=8, albedo_combined=True,
        )
        assert int(tiles_o.tile_count) == n
        G1 = cfg.grid_size + 1
        base = raw_o.shape[1] - 3 * G1
        # BITWISE: the docs claim the opaque run's RGB is bit-identical
        # to the 4-channel run (the alpha channel's dots are simply
        # skipped); pin that claim, not just near-equality
        np.testing.assert_array_equal(
            np.asarray(raw_o[:, base:]),
            np.asarray(raw_s[:, base:base + 3 * G1]))
        np.testing.assert_array_equal(
            np.asarray(raw_o[:, :base]), np.asarray(raw_s[:, :base]))

    def test_opaque_alpha_pad_masks_dead_capacity(self, small_frame):
        """The opaque (3-channel) color extraction pads alpha per LIVE
        tile, matching the 4-channel in-kernel path's valid*live alpha
        masking for dead-capacity slots (render/pipeline._extract_colors);
        the residual live-but-invalid delta is documented there."""
        from bevy_terrain_tpu.render.pipeline import TerrainFrameOutput

        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        rng = np.random.default_rng(43)
        packed_np = rng.integers(0, 2**32, blocks.shape, dtype=np.uint64)
        combined = jnp.concatenate(
            [blocks, jnp.asarray(packed_np.astype(np.uint32).view(np.int32))],
            axis=1)

        tiles0 = refinement.refine_tiles(uniforms, cfg)
        raw_o, tiles_o = meshgen.generate_mesh_fused(
            tiles0, combined, uniforms, cfg, plan, 65535.0, interpret=True,
            albedo_channels=3, albedo_bits=8, albedo_combined=True,
        )
        # this fixture's view saturates capacity; report a truncated
        # tile_count so the frame has a dead-capacity tail for the alpha
        # pad to mask (the masking keys off tile_count, not buffer rows)
        n = int(tiles_o.tile_count) - 10
        assert 0 < n < cfg.tile_capacity  # needs dead-capacity tail
        out = TerrainFrameOutput(
            tiles=tiles_o._replace(tile_count=jnp.int32(n)),
            raw=raw_o, cfg=cfg, shaded_channels=3)
        c = np.asarray(out.colors)
        G1 = cfg.grid_size + 1
        assert c.shape == (cfg.tile_capacity, G1, G1, 4)
        np.testing.assert_array_equal(c[:n, ..., 3], 1.0)
        np.testing.assert_array_equal(c[n:, ..., 3], 0.0)

    def test_rg16_packed_matches_per_channel(self, small_frame):
        """2 x u16 packing (Rg16): 16-bit shift/mask unpack path, packed
        fused kernel vs two per-channel passes."""
        model, vc, uniforms, plan, blocks = small_frame
        cfg = _cfg(vc)
        tiles = refinement.refine_tiles(uniforms, cfg)
        tiles, batch = patch_sampling.plan_patch_batch(
            tiles, uniforms, cfg, plan, blocks.shape[0], pk.TILES_PER_STEP
        )
        F, G1 = cfg.tile_capacity, cfg.grid_size + 1
        rng = np.random.default_rng(12)
        chans = [
            rng.integers(0, 65536, blocks.shape).astype(np.uint32)
            for _ in range(2)
        ]
        packed = jnp.asarray((chans[0] | (chans[1] << 16)).view(np.int32))
        uv = jnp.asarray(rng.uniform(0, 1, (F, G1, G1, 2)).astype(np.float32))
        geom = batch.geom.at[:, 4].set(0.0)
        batch = batch._replace(geom=geom)

        T = pk.TILES_PER_STEP
        Fp = batch.slots.shape[0]
        steps = Fp // T
        pad_n = Fp - F

        def rows_of(comp):
            x = uv[..., comp]
            if pad_n:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad_n, G1, G1), x.dtype)], axis=0)
            x = x.reshape(steps, T, G1, G1)
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(steps, G1, T * G1)

        uvrows = jnp.concatenate([rows_of(0), rows_of(1)], axis=1)
        raw2 = pk.attach_sample_fused_packed(
            packed, batch, uvrows, 2, 16, interpret=True)
        n = int(tiles.tile_count)
        for c in range(2):
            want = pk.attach_sample_fused(
                jnp.asarray(chans[c].astype(np.int32)), batch, uvrows,
                interpret=True)
            got = raw2[:, c * G1:(c + 1) * G1]
            np.testing.assert_allclose(
                np.asarray(got).reshape(steps, G1, T, G1)
                .transpose(0, 2, 1, 3).reshape(Fp, G1, G1)[:n],
                np.asarray(want).reshape(steps, G1, T, G1)
                .transpose(0, 2, 1, 3).reshape(Fp, G1, G1)[:n],
                atol=3e-2,
            )
