"""Native (C++) terrain runtime: equivalence with the Python oracle.

The C++ residency machine must produce byte-identical decisions (atlas
indices, LRU evictions, best-tile walks, error conditions) for arbitrary
operation sequences; the IO pool must read files correctly and report
missing ones."""

import numpy as np
import pytest

from bevy_terrain_tpu import native
from bevy_terrain_tpu.math.coordinate import TileCoordinate
from bevy_terrain_tpu.terrain_data.tile_atlas import TileAtlasState, pack_keys

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


def key_of(c: TileCoordinate) -> int:
    return int(pack_keys(c.side, c.lod, c.x, c.y))


def make_pair(atlas_size=16, attachments=2, lods=4):
    tiles = [
        TileCoordinate(0, lod, x, y)
        for lod in range(lods)
        for x in range(1 << lod)
        for y in range(1 << lod)
    ]
    py = TileAtlasState(atlas_size, attachments, tiles)
    nat = native.NativeResidency(atlas_size, attachments)
    nat.add_existing(np.array([key_of(t) for t in tiles], np.int64))
    return py, nat, tiles


class TestEquivalence:
    def test_fuzz_sequences(self):
        rng = np.random.default_rng(42)
        py, nat, tiles = make_pair()
        held = []
        loading = {}  # coord -> remaining attachments

        for step in range(3000):
            op = rng.integers(0, 4)
            if op == 0 and len(held) < 14:  # request
                t = tiles[rng.integers(0, len(tiles))]
                before = t in py.tile_states
                py.request_tile(t)
                n_idx = nat.request(key_of(t))
                assert py.tile_states[t].atlas_index == n_idx, step
                if not before:
                    loading[t] = py.attachment_count
                held.append(t)
            elif op == 1 and held:  # release
                t = held.pop(rng.integers(0, len(held)))
                py.release_tile(t)
                nat.release(key_of(t))
            elif op == 2 and loading:  # one attachment load completes
                t = list(loading)[rng.integers(0, len(loading))]
                if t in py.tile_states:

                    class _T:
                        coordinate = t
                        atlas_index = py.tile_states[t].atlas_index
                        attachment_index = 0

                    py.load_slots -= 1  # loaded_tile_attachment refunds one
                    py.loaded_tile_attachment(_T())
                    nat.loaded(key_of(t))
                loading[t] -= 1
                if loading[t] == 0:
                    del loading[t]
            else:  # compare best tiles over a probe set
                side = np.zeros(64, np.int32)
                lod = rng.integers(0, 4, 64).astype(np.int32)
                x = rng.integers(0, 8, 64).astype(np.int32) % (1 << lod)
                y = rng.integers(0, 8, 64).astype(np.int32) % (1 << lod)
                pi, pl = py.get_best_tiles(side, lod, x, y)
                ni, nl = nat.best_tiles(side, lod, x, y)
                np.testing.assert_array_equal(pi, ni, err_msg=f"step {step}")
                np.testing.assert_array_equal(pl, nl, err_msg=f"step {step}")

        # drained load queues match in order
        pk = [(key_of(e.coordinate), e.atlas_index, e.attachment_index) for e in py.to_load]
        nk, ni, na = nat.drain_loads(8192)
        assert pk == list(zip(nk.tolist(), ni.tolist(), na.tolist()))

    def test_exhaustion_raises(self):
        py, nat, tiles = make_pair(atlas_size=2)
        lod1 = [t for t in tiles if t.lod == 1]
        nat.request(key_of(lod1[0]))
        nat.request(key_of(lod1[1]))
        with pytest.raises(RuntimeError, match="out of indices"):
            nat.request(key_of(lod1[2]))

    def test_double_release_raises(self):
        py, nat, tiles = make_pair()
        with pytest.raises(RuntimeError, match="not present"):
            nat.release(key_of(tiles[0]))

    def test_over_release_cached_parity(self):
        """Both backends guard (not underflow) an over-release of a
        cached tile and count it identically."""
        py, nat, tiles = make_pair()
        t = tiles[0]
        py.request_tile(t)
        nat.request(key_of(t))
        py.release_tile(t)
        nat.release(key_of(t))
        py.release_tile(t)  # over-release
        nat.release(key_of(t))
        assert py.release_underflows == 1
        assert nat.release_underflows == 1
        assert py.tile_states[t].requests == 0
        assert nat.requests_of(key_of(t)) == 0
        py.request_tile(t)
        idx = nat.request(key_of(t))
        assert py.tile_states[t].atlas_index == idx
        assert py.tile_states[t].requests == 1
        assert nat.requests_of(key_of(t)) == 1

    def test_lru_eviction_and_revival(self):
        py, nat, tiles = make_pair(atlas_size=3, attachments=1)
        lod1 = [t for t in tiles if t.lod == 1]
        a = nat.request(key_of(lod1[0]))
        b = nat.request(key_of(lod1[1]))
        nat.release(key_of(lod1[0]))
        # revival: re-request before eviction keeps the same slot
        assert nat.request(key_of(lod1[0])) == a
        nat.release(key_of(lod1[0]))
        nat.release(key_of(lod1[1]))
        # two allocations: first reuses lod1[0]'s slot (released first)
        c = nat.request(key_of(lod1[2]))
        assert c == 2  # fresh slot still available first? no: FIFO had [2, a, b]
        d = nat.request(key_of(lod1[3]))
        assert d == a  # evicted lod1[0]
        assert nat.index_of(key_of(lod1[0])) == -1


class TestNativeIo:
    def test_reads_files(self, tmp_path):
        pool = native.NativeIoPool(threads=2)
        payloads = {}
        for i in range(8):
            p = tmp_path / f"tile{i}.bin"
            data = np.random.default_rng(i).integers(0, 255, 1000, np.uint8)
            p.write_bytes(data.tobytes())
            payloads[pool.submit(str(p), 1000)] = data
        import time

        got = []
        for _ in range(200):
            got += pool.poll()
            if len(got) == 8:
                break
            time.sleep(0.005)
        assert len(got) == 8
        for job_id, size, buf in got:
            assert size == 1000
            np.testing.assert_array_equal(buf, payloads[job_id])

    def test_missing_file_reports_error(self, tmp_path):
        pool = native.NativeIoPool(threads=1)
        job = pool.submit(str(tmp_path / "nope.bin"), 100)
        import time

        for _ in range(200):
            done = pool.poll()
            if done:
                break
            time.sleep(0.005)
        assert done[0][0] == job and done[0][1] is None


class TestNativeRequestScan:
    """C++ tr_scan_requests vs the vectorized numpy oracle: identical slot
    state and identical release/request SETS over random camera walks
    (the interleaving of old/new releases within a frame may differ; a
    release list is consumed refcount-wise, so order is immaterial)."""

    @pytest.mark.parametrize("kind", ["planar", "sphere", "ellipsoid"])
    def test_fuzz_camera_walk(self, kind):
        if not native.available():
            pytest.skip("native runtime unavailable")
        from bevy_terrain_tpu.config import TerrainConfig, TerrainViewConfig
        from bevy_terrain_tpu.math import TerrainModel
        from bevy_terrain_tpu.terrain_data.tile_atlas import TileAtlas
        from bevy_terrain_tpu.terrain_data.tile_tree import TileTree

        rng = np.random.default_rng(17)
        spherical = kind != "planar"
        if kind == "sphere":
            model = TerrainModel.sphere(np.array([10.0, -5.0, 2.0]), 1000.0, 0.0, 50.0)
        elif kind == "ellipsoid":
            # distinct axes exercise the anisotropic world transform in the
            # C++ slot_world (the normal path uses the inverse-transpose)
            model = TerrainModel.ellipsoid(
                np.array([10.0, -5.0, 2.0]), 1000.0, 940.0, 0.0, 50.0)
        else:
            model = TerrainModel.planar(np.array([3.0, -100.0, 7.0]), 1000.0, 0.0, 250.0)
        config = TerrainConfig(lod_count=5, model=model, atlas_size=64, path="x")
        atlas = TileAtlas(config)
        vc = TerrainViewConfig()
        t_native = TileTree(atlas, vc)
        t_numpy = TileTree(atlas, vc)
        t_native._native_scan = True
        t_numpy._native_scan = False

        def key_set(tiles):
            return sorted((c.side, c.lod, c.x, c.y) for c in tiles)

        pos = np.array([120.0, 80.0, -60.0]) if not spherical else np.array([0.0, 0.0, 1400.0])
        for step in range(40):
            pos = pos + rng.normal(scale=60.0, size=3)
            if spherical:
                # keep the camera outside the planet
                r = np.linalg.norm(pos - model.translation)
                if r < 1050.0:
                    pos = model.translation + (pos - model.translation) * (1100.0 / r)
            t_native.compute_requests(pos)
            t_numpy.compute_requests(pos)
            np.testing.assert_array_equal(t_native.tile_xy, t_numpy.tile_xy, err_msg=str(step))
            np.testing.assert_array_equal(
                t_native.tile_requested, t_numpy.tile_requested, err_msg=str(step)
            )
            assert key_set(t_native.released_tiles) == key_set(t_numpy.released_tiles), step
            assert key_set(t_native.requested_tiles) == key_set(t_numpy.requested_tiles), step


class TestNativeTaylor:
    def test_matches_numpy_chain(self):
        """tr_taylor_spherical vs the numpy derivative chain, random views."""
        if not native.available():
            pytest.skip("native runtime unavailable")
        from bevy_terrain_tpu import TerrainModel
        from bevy_terrain_tpu.math import approximation as approx_mod
        from bevy_terrain_tpu.math.approximation import TerrainModelApproximation
        from bevy_terrain_tpu.math.coordinate import Coordinate, project_uv_to_side

        rng = np.random.default_rng(11)
        for _ in range(20):
            R = 6_371_000.0 * rng.uniform(0.4, 2.0)
            center = rng.normal(0, 1e5, 3)
            model = TerrainModel.sphere(center, R, 0.0, 9000.0)
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)
            view = center + d * R * rng.uniform(1.0001, 1.5)
            lod = int(rng.integers(2, 14))

            vc = Coordinate.from_world_position(np.asarray(view, np.float64), model)
            uv = project_uv_to_side(
                np.full(6, vc.side, np.int32), np.arange(6, dtype=np.int32),
                np.broadcast_to(np.asarray(vc.uv, np.float64), (6, 2)),
            )
            m = np.asarray(model.world_from_local, np.float64)[:3, :4]
            oxy, ouv, co = native.taylor_spherical(
                uv, np.asarray(view, np.float64), m, float(1 << lod)
            )
            # numpy oracle (force the pure-python branch)
            avail, native.available = native.available, lambda: False
            try:
                want = TerrainModelApproximation.compute(model, view, lod, 1000.0)
            finally:
                native.available = avail
            np.testing.assert_array_equal(oxy, want.origin_xy)
            np.testing.assert_allclose(ouv, want.origin_uv, atol=1e-6)
            for i, name in enumerate(["c", "c_s", "c_t", "c_ss", "c_st", "c_tt"]):
                np.testing.assert_allclose(
                    co[i], getattr(want, name), rtol=1e-5, atol=1e-3, err_msg=name
                )


class TestNativeBilinear:
    def test_matches_numpy_tap(self):
        """tr_sample_bilinear vs attachment.sample_bilinear_host, all dtypes."""
        if not native.available():
            pytest.skip("native runtime unavailable")
        from bevy_terrain_tpu.terrain_data.attachment import sample_bilinear_host

        rng = np.random.default_rng(7)
        cases = [
            (rng.integers(0, 65535, (64, 64, 1)).astype(np.uint16), 65535.0),
            (rng.integers(0, 255, (32, 32, 4)).astype(np.uint8), 255.0),
            (rng.integers(0, 65535, (16, 16, 2)).astype(np.uint16), 65535.0),
            (rng.random((48, 48, 1)).astype(np.float32), 1.0),
        ]
        for data, max_value in cases:
            for _ in range(40):
                uv = rng.uniform(-0.2, 1.2, 2)
                got = native.sample_bilinear(data, uv, max_value)
                want = sample_bilinear_host(data, uv, max_value)
                np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    def test_full_path_from_world(self):
        """tr_taylor_from_world (face pick + warp + projection + chain) vs
        the numpy oracle through TerrainModelApproximation.compute."""
        if not native.available():
            pytest.skip("native runtime unavailable")
        from bevy_terrain_tpu import TerrainModel
        from bevy_terrain_tpu.math.approximation import TerrainModelApproximation

        rng = np.random.default_rng(13)
        for _ in range(20):
            R = 6_371_000.0 * rng.uniform(0.4, 2.0)
            center = rng.normal(0, 1e5, 3)
            model = TerrainModel.sphere(center, R, 0.0, 9000.0)
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)
            view = center + d * R * rng.uniform(1.0001, 1.5)
            lod = int(rng.integers(2, 14))
            got = TerrainModelApproximation.compute(model, view, lod, 1000.0)
            avail, native.available = native.available, lambda: False
            try:
                want = TerrainModelApproximation.compute(model, view, lod, 1000.0)
            finally:
                native.available = avail
            np.testing.assert_array_equal(got.origin_xy, want.origin_xy)
            np.testing.assert_allclose(got.origin_uv, want.origin_uv, atol=1e-6)
            for name in ["c", "c_s", "c_t", "c_ss", "c_st", "c_tt"]:
                np.testing.assert_allclose(
                    getattr(got, name), getattr(want, name),
                    rtol=1e-5, atol=1e-3, err_msg=name,
                )


class TestNativeViewAnchors:
    def test_matches_numpy_anchors(self):
        """tr_project_view_uv + tr_view_anchors vs compute_view_anchors
        across all three model kinds and random views."""
        if not native.available():
            pytest.skip("native runtime unavailable")
        from bevy_terrain_tpu import TerrainModel, TerrainViewConfig
        from bevy_terrain_tpu.ops.tile_tree import compute_view_anchors
        from bevy_terrain_tpu.terrain_data.tile_tree import TileTree

        class _FakeAtlas:
            def __init__(self, model, lod_count):
                self.model = model
                self.lod_count = lod_count

        rng = np.random.default_rng(17)
        for trial in range(60):
            kind = trial % 3
            if kind == 0:
                model = TerrainModel.planar(
                    rng.normal(0, 100, 3), rng.uniform(100, 5000), 0.0, 100.0
                )
                view = np.asarray(rng.normal(0, 2000, 3))
            elif kind == 1:
                R = rng.uniform(1e3, 1e7)
                c = rng.normal(0, 1e3, 3)
                model = TerrainModel.sphere(c, R, 0.0, R * 0.01)
                d = rng.normal(size=3)
                d /= np.linalg.norm(d)
                view = c + d * R * rng.uniform(1.0001, 2.0)
            else:
                A = rng.uniform(1e6, 1e7)
                c = rng.normal(0, 1e3, 3)
                model = TerrainModel.ellipsoid(c, A, A * 0.97, 0.0, 9000.0)
                d = rng.normal(size=3)
                d /= np.linalg.norm(d)
                view = c + d * A * rng.uniform(1.001, 1.5)
            L = int(rng.integers(2, 12))
            T = int(rng.integers(2, 9))
            tree = TileTree(
                _FakeAtlas(model, L), TerrainViewConfig(tree_size=T)
            )
            tree.view_world_position = np.asarray(view, np.float64)
            tree._compute_anchors_native()
            o, i, f = compute_view_anchors(model, view, L, T)
            np.testing.assert_array_equal(tree.origins, o)
            np.testing.assert_array_equal(tree.view_tile_int, i)
            np.testing.assert_allclose(tree.view_tile_frac, f, atol=1e-6)


class TestPreprocessHelpers:
    """C++ preprocess hot loops vs their numpy oracles (bit-exact)."""

    def test_quantize_matches_numpy(self):
        native = pytest.importorskip("bevy_terrain_tpu.native")
        if not native.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(11)
        for dtype, mv in ((np.uint16, 65535.0), (np.uint8, 255.0)):
            src = (rng.random((257, 93, 2), np.float32) * 1.2 - 0.05).astype(
                np.float32
            )
            ref = np.clip(np.rint(src * mv), 0, mv).astype(dtype)
            got = native.quantize(src, mv, dtype)
            np.testing.assert_array_equal(ref, got)

    def test_downsample_matches_numpy(self):
        native = pytest.importorskip("bevy_terrain_tpu.native")
        if not native.available():
            pytest.skip("native runtime unavailable")
        from bevy_terrain_tpu.ops.preprocess import downsample_tile_numpy

        rng = np.random.default_rng(12)
        for trial in range(20):
            ts = int(rng.choice([16, 40, 128]))
            C = int(rng.choice([1, 2, 4]))
            dtype = np.uint16 if trial % 2 == 0 else np.uint8
            mv = 65535 if dtype == np.uint16 else 255
            children = []
            for _ in range(4):
                if rng.random() < 0.2:
                    children.append(None)
                    continue
                ch = rng.integers(0, mv + 1, (ts, ts, C)).astype(dtype)
                ch[rng.random((ts, ts)) < 0.3] = 0  # nodata texels
                children.append(ch)
            ref = downsample_tile_numpy(children, ts, 2)
            got = native.downsample(children, ts, 2, dtype, C)
            np.testing.assert_array_equal(
                np.asarray(ref, np.int64), np.asarray(got, np.int64)
            )
