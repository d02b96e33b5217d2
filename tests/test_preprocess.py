"""Preprocessing pipeline tests: split/downsample/stitch ops + the full
task graph, ending with a round trip through the streaming renderer."""

import numpy as np
import pytest

from bevy_terrain_tpu.config import AttachmentConfig, AttachmentFormat, TerrainConfig, TerrainViewConfig
from bevy_terrain_tpu.formats.tc import TC
from bevy_terrain_tpu.formats.tiff import array_to_source, load_source_image
from bevy_terrain_tpu.math import TerrainModel, TileCoordinate
from bevy_terrain_tpu.ops.preprocess import (
    downsample_tile,
    split_mosaic,
    stitch_tile,
)
from bevy_terrain_tpu.preprocess import PreprocessDataset, Preprocessor, SphericalDataset
from bevy_terrain_tpu.terrain_data import TileAtlas


ATT = AttachmentConfig(
    name="height", texture_size=40, border_size=2, mip_level_count=2,
    format=AttachmentFormat.R16,
)


def field(u, v):
    return 0.4 + 0.3 * np.sin(2 * np.pi * u) * np.cos(np.pi * v) + 0.2 * u


def make_source(n=256):
    u, v = np.meshgrid((np.arange(n) + 0.5) / n, (np.arange(n) + 0.5) / n, indexing="xy")
    return field(u, v).astype(np.float32)[..., None]


class TestSplitMosaic:
    def test_identity_resolution(self):
        src = make_source(72)  # == 2 * center(36)
        mosaic, valid = split_mosaic(src, 1, 36, (0.0, 0.0), (1.0, 1.0))
        assert mosaic.shape == (72, 72, 1)
        np.testing.assert_allclose(mosaic, src, atol=1e-5)
        assert valid.all()

    def test_upsample_matches_analytic(self):
        src = make_source(256)
        mosaic, _ = split_mosaic(src, 2, 36, (0.0, 0.0), (1.0, 1.0))  # 144 < 256
        P = mosaic.shape[0]
        u, v = np.meshgrid(
            (np.arange(P) + 0.5) / P, (np.arange(P) + 0.5) / P, indexing="xy"
        )
        np.testing.assert_allclose(mosaic[..., 0], field(u, v), atol=5e-3)

    def test_bounds_remap(self):
        # dataset covering only the left half of the terrain: uv 0.25 maps
        # to source center
        src = make_source(128)
        mosaic, _ = split_mosaic(src, 0, 36, (0.0, 0.0), (0.5, 1.0))
        u = (np.arange(36) + 0.5) / 36  # terrain uv
        su = u / 0.5  # source uv; beyond 1.0 the sampler clamps (reference
        # ClampToEdge semantics) so only compare in-bounds columns
        cols = su < 1.0 - 0.5 / 128
        expect = field(su[None, :], ((np.arange(36) + 0.5) / 36)[:, None])
        np.testing.assert_allclose(
            mosaic[:, cols, 0], expect[:, cols], atol=6e-3
        )

    def test_nodata_detection(self):
        src = make_source(64)
        src[10:20, 30:40] = 0.0
        _, valid = split_mosaic(src, 0, 64, (0.0, 0.0), (1.0, 1.0))
        assert not valid[12, 32]
        assert valid[0, 0]


class TestDownsample:
    def test_average_and_nodata(self):
        size, b = 8, 1
        center = 6
        children = []
        for i in range(4):
            t = np.full((size, size, 1), 100 * (i + 1), np.uint16)
            t[:b] = 0; t[-b:] = 0; t[:, :b] = 0; t[:, -b:] = 0
            children.append(t)
        parent = downsample_tile(children, size, b)
        # each parent quadrant averages one child's constant value
        assert parent[1, 1, 0] == 100  # child 0 quadrant
        assert parent[1, 6, 0] == 200  # child 1 (x+1)
        assert parent[6, 1, 0] == 300
        assert parent[6, 6, 0] == 400
        assert (parent[0] == 0).all()  # border zero

    def test_missing_child_is_nodata(self):
        size, b = 8, 1
        child = np.full((size, size, 1), 500, np.uint16)
        parent = downsample_tile([child, None, None, None], size, b)
        assert parent[1, 1, 0] == 500
        assert parent[6, 6, 0] == 0  # missing child quadrant -> 0


class TestStitch:
    def test_planar_borders_from_neighbours(self):
        size, b = 8, 2
        me = np.full((size, size, 1), 5, np.uint16)
        up = np.full((size, size, 1), 10, np.uint16)
        right = np.full((size, size, 1), 20, np.uint16)
        neighbours = [(0, up), (0, right)] + [(0, None)] * 6
        out = stitch_tile(me, 0, neighbours, b)
        assert (out[0:b, b : size - b] == 10).all()  # top border from 'up'
        assert (out[b : size - b, size - b :] == 20).all()  # right border
        # left border missing -> clamp-repeat own edge (center value 5)
        assert (out[b : size - b, 0:b] == 5).all()

    def test_neighbour_reads_center_strip(self):
        # top border must copy the BOTTOM center rows of the upper tile
        size, b = 8, 2
        cs = size - 2 * b
        up = np.zeros((size, size, 1), np.uint16)
        up[b + cs - 2 : b + cs, :] = 7  # its bottom center rows
        me = np.zeros((size, size, 1), np.uint16)
        out = stitch_tile(me, 0, [(0, up)] + [(0, None)] * 7, b)
        assert (out[0:b, b : b + cs] == 7).all()


@pytest.fixture()
def planar_setup(tmp_path):
    src = make_source(256)
    src_path = tmp_path / "source.png"
    array_to_source(src, src_path)
    config = TerrainConfig(
        lod_count=3,
        model=TerrainModel.planar(np.zeros(3), 1000.0, 0.0, 100.0),
        atlas_size=64,
        path="terrains/pp",
        attachments=(ATT,),
        assets_root=str(tmp_path / "assets"),
    )
    return tmp_path, src, src_path, config


class TestPreprocessorPipeline:
    def test_planar_end_to_end(self, planar_setup):
        tmp_path, src, src_path, config = planar_setup
        atlas = TileAtlas(config)
        dataset = PreprocessDataset(
            attachment_index=0, path=str(src_path), lod_range=range(0, 3)
        )
        Preprocessor(atlas).clear_attachment(0).preprocess_tile(dataset).run(verbose=False)

        # manifest lists all tiles of lods 0..2
        tc = TC.load_file(tmp_path / "assets" / "terrains/pp" / "config.tc")
        assert len(tc.tiles) == 1 + 4 + 16

        # a written tile matches the analytic field in its center
        from bevy_terrain_tpu.terrain_data.attachment import data_from_bytes

        raw = (tmp_path / "assets/terrains/pp/data/height/0_2_1_2.bin").read_bytes()
        tile = data_from_bytes(raw, ATT)
        b, c = ATT.border_size, ATT.center_size
        count = 4
        tu = (1 + (np.arange(c) + 0.5) / c) / count
        tv = (2 + (np.arange(c) + 0.5) / c) / count
        expect = field(tu[None, :], tv[:, None]) * 65535.0
        got = tile[b : b + c, b : b + c, 0].astype(np.float64)
        assert np.abs(got - expect).mean() < 600  # ~1% of u16 range

        # borders are stitched: interior tile's border equals neighbour data
        assert (tile[0, b : b + c] > 0).all()

    def test_preprocessed_dataset_streams_and_renders(self, planar_setup):
        tmp_path, src, src_path, config = planar_setup
        atlas = TileAtlas(config)
        Preprocessor(atlas).clear_attachment(0).preprocess_tile(
            PreprocessDataset(attachment_index=0, path=str(src_path), lod_range=range(0, 3))
        ).run(verbose=False)

        import time as _time

        from bevy_terrain_tpu.render.pipeline import Terrain

        terrain = Terrain(config)
        terrain.add_view("cam", TerrainViewConfig(tile_capacity=1024), queue_capacity=2048)
        view = np.array([100.0, 80.0, -50.0])
        for _ in range(40):
            out = terrain.update({"cam": view})
            if not terrain.atlas.state.to_load and not any(
                a.loading for a in terrain.atlas.attachments
            ):
                break
            _time.sleep(0.01)
        out = terrain.update({"cam": view})["cam"]
        mask = np.asarray(out.mesh.tile_mask)
        pos = np.asarray(out.mesh.positions)[mask]
        u = pos[..., 0] / 1000.0 + 0.5
        v = pos[..., 2] / 1000.0 + 0.5
        expect = field(u, v) * 100.0
        err = np.abs(pos[..., 1] - expect)
        assert np.median(err) < 2.5, float(np.median(err))

    def test_spherical_cross_face_stitching(self, tmp_path):
        # six constant-value faces: after stitching, border texels of face 0
        # carry the neighbouring faces' values
        paths = []
        for side in range(6):
            p = tmp_path / f"face{side}.png"
            array_to_source(np.full((64, 64), 0.1 * (side + 1), np.float32), p)
            paths.append(str(p))
        config = TerrainConfig(
            lod_count=2,
            model=TerrainModel.sphere(np.zeros(3), 100.0, 0.0, 10.0),
            atlas_size=64,
            path="terrains/sphere",
            attachments=(ATT,),
            assets_root=str(tmp_path / "assets"),
        )
        atlas = TileAtlas(config)
        Preprocessor(atlas).clear_attachment(0).preprocess_spherical(
            SphericalDataset(attachment_index=0, paths=paths, lod_range=range(0, 2))
        ).run(verbose=False)

        tc = TC.load_file(tmp_path / "assets/terrains/sphere/config.tc")
        assert len(tc.tiles) == 6 * (1 + 4)

        from bevy_terrain_tpu.terrain_data.attachment import data_from_bytes

        raw = (tmp_path / "assets/terrains/sphere/data/height/0_0_0_0.bin").read_bytes()
        tile = data_from_bytes(raw, ATT)
        b = ATT.border_size
        center_val = int(0.1 * 1 * 65535)
        assert abs(int(tile[b, b, 0]) - center_val) < 400
        # the x<0 edge of side 0 wraps to side 4 (NEIGHBOURING_SIDES[0][1]),
        # value 0.5
        left_border = tile[b + 5, 0, 0]
        assert abs(int(left_border) - int(0.1 * 5 * 65535)) < 400


class TestFastPathParity:
    """The optimized host pipeline (C++ split/quantize/downsample, cached
    stitch maps) must stay byte-identical to the pinned naive CPU-reference
    oracle (Preprocessor(naive=True)) — the baseline BASELINE.md's >10x
    preprocess target is measured against."""

    def test_naive_and_fast_paths_byte_identical(self, tmp_path):
        import hashlib

        n = 256
        u, v = np.meshgrid(
            (np.arange(n) + 0.5) / n, (np.arange(n) + 0.5) / n, indexing="xy"
        )
        src = field(u, v).astype(np.float32)
        src[40:60, 10:30] = 0.0  # nodata region exercises validity paths
        array_to_source(src, tmp_path / "src.png")
        model = TerrainModel.planar(np.zeros(3), 1000.0, 0.0, 100.0)

        def run(path, naive):
            config = TerrainConfig(
                lod_count=3, model=model, atlas_size=64, path=path,
                assets_root=str(tmp_path / "assets"), attachments=(ATT,),
            )
            atlas = TileAtlas(config)
            Preprocessor(atlas, device=False, naive=naive).clear_attachment(
                0
            ).preprocess_tile(
                PreprocessDataset(
                    attachment_index=0, path=str(tmp_path / "src.png"),
                    lod_range=range(0, 3),
                )
            ).run(verbose=False)
            h = hashlib.sha256()
            root = tmp_path / "assets" / path / "data" / "height"
            files = sorted(root.glob("*.bin"))
            assert files, "no tiles written"
            for f in files:
                h.update(f.name.encode())
                h.update(f.read_bytes())
            return h.hexdigest()

        assert run("fast", False) == run("naive", True)
