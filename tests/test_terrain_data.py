"""Data-layer tests: TC format, attachment payloads/mipmaps, atlas residency
(LRU, refcounts, slots), tile-tree diffing, and the full streaming pipeline
end-to-end on a synthetic dataset."""

import numpy as np
import pytest

from bevy_terrain_tpu.config import AttachmentConfig, AttachmentFormat, TerrainConfig, TerrainViewConfig
from bevy_terrain_tpu.formats.tc import TC
from bevy_terrain_tpu.math import TerrainModel, TileCoordinate
from bevy_terrain_tpu.terrain_data import (
    INVALID_ATLAS_INDEX,
    TileAtlas,
    TileAtlasState,
    TileTree,
)
from bevy_terrain_tpu.terrain_data.attachment import (
    data_from_bytes,
    data_to_bytes,
    generate_mipmaps,
    sample_bilinear_host,
)
from bevy_terrain_tpu.terrain_data.sampling_api import sample_height
from bevy_terrain_tpu.utils.synthetic import default_height_fn, generate_planar_dataset


class TestTC:
    def test_roundtrip(self):
        tiles = [
            TileCoordinate(0, 0, 0, 0),
            TileCoordinate(5, 3, 7, 2),
            TileCoordinate(1, 10, 1000, 65535),
            TileCoordinate(2, 16, 1 << 16, (1 << 20) + 3),
        ]
        enc = TC(tiles).encode()
        dec = TC.decode(enc)
        assert dec.tiles == tiles

    def test_varint_boundaries(self):
        # bincode standard varint: <251 one byte, then 0xFB/0xFC markers
        enc = TC([TileCoordinate(0, 250, 251, 65536)]).encode()
        assert enc[0] == 1  # length
        assert enc[1] == 0  # side
        assert enc[2] == 250  # lod, single byte
        assert enc[3] == 0xFB  # x marker u16
        assert enc[3 + 3] == 0xFC  # y marker u32

    def test_file_roundtrip(self, tmp_path):
        tc = TC([TileCoordinate(0, 1, 1, 0)])
        tc.save_file(tmp_path / "config.tc")
        assert TC.load_file(tmp_path / "config.tc").tiles == tc.tiles


class TestAttachmentData:
    CFG = AttachmentConfig(name="height", texture_size=8, border_size=1, mip_level_count=3)

    def test_bytes_roundtrip(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 65535, (8, 8, 1)).astype(np.uint16)
        back = data_from_bytes(data_to_bytes(data), self.CFG)
        np.testing.assert_array_equal(back, data)

    def test_bad_size_rejected(self):
        with pytest.raises(ValueError):
            data_from_bytes(b"\x00" * 10, self.CFG)

    def test_mipmaps_nodata_skip(self):
        # a 2x2 quad of (0, 0, 0, 400) must average to 400 (zeros skipped),
        # reference mod.rs:178-195
        data = np.zeros((4, 4, 1), np.uint16)
        data[1, 1, 0] = 400
        mips = generate_mipmaps(data, 2)
        assert mips[1][0, 0, 0] == 400
        assert mips[1][1, 1, 0] == 0  # all-nodata quad stays 0

    def test_mipmaps_rgba_plain_average(self):
        data = np.zeros((2, 2, 4), np.uint8)
        data[0, 0] = [4, 8, 12, 16]
        mips = generate_mipmaps(data, 2)
        np.testing.assert_array_equal(mips[1][0, 0], [1, 2, 3, 4])

    def test_bilinear_host_center(self):
        data = np.zeros((4, 4, 1), np.uint16)
        data[1, 1, 0] = 65535
        v = sample_bilinear_host(data, np.array([0.375, 0.375]), 65535.0)
        assert v[0] == pytest.approx(1.0)  # texel center (1,1) at uv (1.5/4)


def _state(atlas_size=4, attachments=1, existing=()):
    return TileAtlasState(atlas_size, attachments, existing)


class TestAtlasResidency:
    def test_request_release_refcount(self):
        t = TileCoordinate(0, 0, 0, 0)
        s = _state(existing=[t])
        s.request_tile(t)
        s.request_tile(t)  # second view
        assert s.tile_states[t].requests == 2
        assert len(s.to_load) == 1  # loaded once
        s.release_tile(t)
        assert t not in dict(s.unused_tiles.items()).values()
        s.release_tile(t)
        assert t in s.unused_tiles.values()  # now LRU-cached

    def test_nonexistent_ignored(self):
        s = _state(existing=[])
        s.request_tile(TileCoordinate(0, 0, 0, 0))
        assert not s.tile_states and not s.to_load

    def test_release_nonpresent_raises(self):
        t = TileCoordinate(0, 0, 0, 0)
        s = _state(existing=[t])
        with pytest.raises(RuntimeError, match="not present"):
            s.release_tile(t)

    def test_over_release_cached_guarded(self):
        """Over-releasing a cached (requests == 0) tile must not underflow
        the refcount — the reference's u32 wraps there in release builds
        (tile_atlas.rs:459-475); we guard + count instead."""
        t = TileCoordinate(0, 0, 0, 0)
        s = _state(existing=[t])
        s.request_tile(t)
        s.release_tile(t)  # now LRU-cached with requests == 0
        s.release_tile(t)  # over-release: guarded, counted, state intact
        assert s.release_underflows == 1
        assert s.tile_states[t].requests == 0
        assert t in s.unused_tiles.values()
        s.request_tile(t)  # revival still works after the guard
        assert s.tile_states[t].requests == 1
        assert t not in s.unused_tiles.values()

    def test_lru_reuse_order(self):
        tiles = [TileCoordinate(0, 1, x, 0) for x in range(2)]
        extra = TileCoordinate(0, 1, 0, 1)
        s = _state(atlas_size=2, existing=tiles + [extra])
        for t in tiles:
            s.request_tile(t)
        with pytest.raises(RuntimeError, match="out of indices"):
            s.allocate_tile()
        s.release_tile(tiles[0])  # slot of tiles[0] becomes LRU head
        s.request_tile(extra)
        assert s.tile_states[extra].atlas_index == 0  # reused slot 0
        assert tiles[0] not in s.tile_states  # evicted

    def test_cached_tile_revival(self):
        t = TileCoordinate(0, 0, 0, 0)
        s = _state(existing=[t])
        s.request_tile(t)
        s.release_tile(t)
        s.request_tile(t)  # revive from cache: no new load
        assert len(s.to_load) == 1
        assert s.tile_states[t].requests == 1

    def test_get_best_tiles_parent_walk(self):
        child = TileCoordinate(0, 3, 5, 6)
        parent = child.parent().parent()  # lod 1
        s = _state(atlas_size=8, existing=[parent])
        s.request_tile(parent)
        # simulate load completion
        s.loaded_tile_attachment(
            type("T", (), {"coordinate": parent, "atlas_index": s.tile_states[parent].atlas_index, "attachment_index": 0})()
        )
        idx, lod = s.get_best_tiles(
            np.array([0]), np.array([3]), np.array([5]), np.array([6])
        )
        assert lod[0] == 1 and idx[0] == s.tile_states[parent].atlas_index

    def test_get_best_tiles_nothing_loaded(self):
        s = _state()
        idx, lod = s.get_best_tiles(np.array([0]), np.array([2]), np.array([1]), np.array([1]))
        assert idx[0] == INVALID_ATLAS_INDEX


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    attachment = AttachmentConfig(
        name="height", texture_size=64, border_size=2, mip_level_count=3,
        format=AttachmentFormat.R16,
    )
    generate_planar_dataset("terrains/test", 3, attachment, root=str(root))
    return root, attachment


def make_terrain_config(root, attachment):
    model = TerrainModel.planar(np.array([0.0, 0.0, 0.0]), 1000.0, 0.0, 100.0)
    return TerrainConfig(
        lod_count=3, model=model, atlas_size=64, path="terrains/test",
        attachments=(attachment,), assets_root=str(root),
    )


class TestStreamingPipeline:
    def test_end_to_end_streaming(self, dataset):
        root, attachment = dataset
        config = make_terrain_config(root, attachment)
        atlas = TileAtlas(config)
        assert len(atlas.state.existing_tiles) == 1 + 4 + 16

        tree = TileTree(atlas, TerrainViewConfig())
        view = np.array([10.0, 50.0, -20.0])
        tree.compute_requests(view)
        assert tree.requested_tiles  # initial burst
        atlas.update(tree.released_tiles, tree.requested_tiles)

        # wait for IO to finish, then poll updates
        import time
        for _ in range(100):
            atlas.update()
            if not any(a.loading for a in atlas.attachments):
                break
            time.sleep(0.02)
        atlas.flush_uploads()
        tree.adjust_to_tile_atlas(atlas)
        # every *in-range* slot must now resolve to a loaded (ancestor) tile;
        # slots whose wrapped coordinate exceeds the per-lod tile count are
        # invalid in the reference too (tree_size 8 > 2^lod at coarse lods)
        counts = (1 << np.arange(3))[None, :, None, None, None]
        in_range = (tree.tile_xy < counts).all(axis=-1)
        assert (tree.entries[..., 0][in_range] >= 0).all()
        assert not (tree.entries[..., 0][~in_range] >= 0).any()

        # CPU sampling matches the analytic field (coarse tolerance: lod
        # resolution + bilinear)
        tree.update_approximate_height(atlas)
        for (u, v) in [(0.3, 0.7), (0.51, 0.49), (0.12, 0.88)]:
            world = np.array([(u - 0.5) * 1000.0, 0.0, (v - 0.5) * 1000.0])
            h = sample_height(tree, atlas, world)
            expect = default_height_fn(np.array(u), np.array(v)) * 100.0
            assert abs(h - float(expect)) < 8.0, (u, v, h, float(expect))

    def test_second_frame_stable(self, dataset):
        root, attachment = dataset
        config = make_terrain_config(root, attachment)
        atlas = TileAtlas(config)
        tree = TileTree(atlas, TerrainViewConfig())
        view = np.array([0.0, 100.0, 0.0])
        tree.compute_requests(view)
        n_first = len(tree.requested_tiles)
        atlas.update(tree.released_tiles, tree.requested_tiles)
        tree.compute_requests(view)  # same view: no new requests
        assert tree.requested_tiles == [] and tree.released_tiles == []
        assert n_first > 0

    def test_view_move_releases_far_tiles(self, dataset):
        root, attachment = dataset
        config = make_terrain_config(root, attachment)
        atlas = TileAtlas(config)
        tree = TileTree(atlas, TerrainViewConfig())
        tree.compute_requests(np.array([-400.0, 20.0, -400.0]))
        atlas.update(tree.released_tiles, tree.requested_tiles)
        tree.compute_requests(np.array([400.0, 20.0, 400.0]))
        assert tree.released_tiles and tree.requested_tiles
        atlas.update(tree.released_tiles, tree.requested_tiles)
        # refcounts never negative; total requests consistent
        for state in atlas.state.tile_states.values():
            assert state.requests >= 0
