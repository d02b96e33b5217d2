"""Unit tests for the math core (L0) against the reference's formulas.

Each test cites the reference formula it checks (SURVEY.md section 4 test
strategy: unit-test every math routine against the cited formulas)."""

import numpy as np
import pytest

from bevy_terrain_tpu.math import (
    C_SQR,
    Coordinate,
    TerrainModel,
    TerrainModelApproximation,
    TileCoordinate,
    project_point_ellipsoid,
)
from bevy_terrain_tpu.math.coordinate import (
    local_position_from_side_uv,
    pick_cube_face,
    project_uv_to_side,
    sigmoid_warp_forward,
    sigmoid_warp_inverse,
)


class TestSigmoidWarp:
    def test_roundtrip(self):
        # forward (coordinate.rs:96-97) and inverse (:112-114) must invert
        raw = np.linspace(-1.0, 1.0, 33)
        uv = sigmoid_warp_forward(raw)
        back = sigmoid_warp_inverse(uv)
        np.testing.assert_allclose(back, raw, atol=1e-12)

    def test_fixed_points(self):
        # center and corners are fixed: warp(0)=0.5, warp(±1)=0|1
        np.testing.assert_allclose(sigmoid_warp_forward(np.array(0.0)), 0.5)
        np.testing.assert_allclose(sigmoid_warp_forward(np.array(1.0)), 1.0)
        np.testing.assert_allclose(sigmoid_warp_forward(np.array(-1.0)), 0.0)

    def test_c_sqr(self):
        assert C_SQR == pytest.approx(0.87 * 0.87)


class TestCubeFace:
    def test_face_pick_axes(self):
        # axis directions map to the sides given in coordinate.rs:76-94
        cases = {
            (-1, 0, 0): 0,
            (0, 0, 1): 1,
            (0, 1, 0): 2,
            (1, 0, 0): 3,
            (0, 0, -1): 4,
            (0, -1, 0): 5,
        }
        for n, side in cases.items():
            assert int(pick_cube_face(np.array(n, np.float64))) == side

    def test_world_roundtrip_sphere(self):
        model = TerrainModel.sphere(np.zeros(3), 100.0, 0.0, 1.0)
        rng = np.random.default_rng(0)
        for _ in range(50):
            p = rng.normal(size=3)
            p = 100.0 * p / np.linalg.norm(p)
            coord = Coordinate.from_world_position(p, model)
            assert 0 <= coord.side < 6
            assert np.all(coord.uv >= -1e-12) and np.all(coord.uv <= 1 + 1e-12)
            back = coord.world_position(model, 0.0)
            np.testing.assert_allclose(back, p, atol=1e-9)

    def test_world_roundtrip_planar(self):
        model = TerrainModel.planar(np.array([10.0, -5.0, 3.0]), 1000.0, 0.0, 250.0)
        p = np.array([260.0, -5.0, -90.0])
        coord = Coordinate.from_world_position(p, model)
        assert coord.side == 0
        back = coord.world_position(model, 0.0)
        np.testing.assert_allclose(back, p, atol=1e-9)

    def test_local_position_batch_matches_scalar(self):
        rng = np.random.default_rng(1)
        sides = rng.integers(0, 6, size=20).astype(np.int32)
        uvs = rng.uniform(0.01, 0.99, size=(20, 2))
        batch = local_position_from_side_uv(sides, uvs)
        for i in range(20):
            single = local_position_from_side_uv(int(sides[i]), uvs[i])
            np.testing.assert_allclose(batch[i], single, atol=1e-13)
            np.testing.assert_allclose(np.linalg.norm(batch[i]), 1.0, atol=1e-13)

    def test_project_to_side_consistency(self):
        # projecting a coordinate to its own side is the identity
        # (coordinate.rs:44-52 index 0 => (PS, PT))
        uv = np.array([0.3, 0.8])
        for side in range(6):
            out = project_uv_to_side(np.int32(side), np.int32(side), uv)
            np.testing.assert_allclose(out, uv)

    def test_project_to_side_shared_edges(self):
        # A point on the shared edge of two faces must project to itself:
        # walk points along an edge of side s, project to the edge-neighbour
        # side, and compare world positions.
        model = TerrainModel.sphere(np.zeros(3), 1.0, 0.0, 1.0)
        for side in range(6):
            for t in np.linspace(0.05, 0.95, 7):
                for edge_uv in ([0.0, t], [1.0, t], [t, 0.0], [t, 1.0]):
                    c = Coordinate(side, np.array(edge_uv))
                    w = c.world_position(model, 0.0)
                    c2 = Coordinate.from_world_position(w, model)
                    if c2.side == side:
                        continue
                    proj = c.project_to_side(c2.side, model)
                    w2 = proj.world_position(model, 0.0)
                    np.testing.assert_allclose(w2, w, atol=1e-9)


class TestTileCoordinate:
    def test_count(self):
        assert TileCoordinate.count(0) == 1
        assert TileCoordinate.count(5) == 32

    def test_parent_children(self):
        t = TileCoordinate(2, 3, 5, 6)
        kids = list(t.children())
        assert kids == [
            TileCoordinate(2, 4, 10, 12),
            TileCoordinate(2, 4, 11, 12),
            TileCoordinate(2, 4, 10, 13),
            TileCoordinate(2, 4, 11, 13),
        ]
        for k in kids:
            assert k.parent() == t

    def test_neighbours_planar_interior(self):
        t = TileCoordinate(0, 3, 4, 4)
        ns = list(t.neighbours(False))
        assert TileCoordinate(0, 3, 4, 3) == ns[0]  # up
        assert TileCoordinate(0, 3, 5, 4) == ns[1]  # right
        assert all(n.is_valid for n in ns)

    def test_neighbours_planar_border(self):
        t = TileCoordinate(0, 2, 0, 0)
        ns = list(t.neighbours(False))
        # up, left, and all corner-ish neighbours out of bounds
        assert not ns[0].is_valid and not ns[3].is_valid

    def test_neighbours_spherical_edge_wrap(self):
        # crossing an edge lands on the NEIGHBOURING_SIDES side and the
        # projected position maps to the physically adjacent tile: verify by
        # comparing tile-center world positions of the two tiles are close.
        model = TerrainModel.sphere(np.zeros(3), 1.0, 0.0, 1.0)
        lod = 3
        n = TileCoordinate.count(lod)
        for side in range(6):
            t = TileCoordinate(side, lod, 0, 2)  # on x<0 edge
            left = t.neighbour_coordinate((-1, 2), True)
            assert left.is_valid and left.side != side
            # world positions of touching edges must coincide for some pair
            # of border uv points
            c_self = Coordinate(side, np.array([0.0, (2 + 0.5) / n]))
            w_self = c_self.world_position(model, 0.0)
            c_other = Coordinate.from_world_position(w_self, model)
            # the wrap must at least agree about which side is adjacent
            assert left.side in (c_other.side, side)

    def test_corner_invalid_spherical(self):
        t = TileCoordinate(0, 2, 0, 0)
        assert not t.neighbour_coordinate((-1, -1), True).is_valid

    def test_str_path(self):
        t = TileCoordinate(1, 2, 3, 4)
        assert str(t) == "1_2_3_4"
        assert t.path("/tmp/x", "bin") == "/tmp/x/1_2_3_4.bin"


class TestEllipsoid:
    def test_point_on_surface(self):
        e = np.array([3.0, 3.0, 2.0])  # (major, major, minor) pre-permuted
        p = project_point_ellipsoid(e, np.array([5.0, 1.0, 2.0]))
        # result lies on the ellipsoid x²/maj² + y²/min² + z²/maj² = 1
        val = (p[0] / 3.0) ** 2 + (p[1] / 2.0) ** 2 + (p[2] / 3.0) ** 2
        assert val == pytest.approx(1.0, abs=1e-12)

    def test_closest_point_sphere_degenerate(self):
        e = np.array([2.0, 2.0, 2.0])
        y = np.array([4.0, 4.0, 2.0])
        p = project_point_ellipsoid(e, y)
        np.testing.assert_allclose(p, 2.0 * y / np.linalg.norm(y), atol=1e-12)

    def test_interior_point(self):
        e = np.array([3.0, 3.0, 2.0])
        p = project_point_ellipsoid(e, np.array([0.1, 0.05, 0.1]))
        val = (p[0] / 3.0) ** 2 + (p[1] / 2.0) ** 2 + (p[2] / 3.0) ** 2
        assert val == pytest.approx(1.0, abs=1e-9)

    def test_axis_points(self):
        e = np.array([3.0, 3.0, 2.0])
        # on the +y (minor/polar) axis
        p = project_point_ellipsoid(e, np.array([0.0, 5.0, 0.0]))
        np.testing.assert_allclose(p, [0.0, 2.0, 0.0], atol=1e-12)

    def test_ellipsoid_model_roundtrip(self):
        model = TerrainModel.ellipsoid(np.zeros(3), 6378137.0, 6356752.3, 0.0, 1.0)
        p = np.array([4517590.0, 3083590.0, -2177350.0])
        local = model.position_world_to_local(p)
        np.testing.assert_allclose(np.linalg.norm(local), 1.0, atol=1e-12)
        # surface_position projects onto the ellipsoid: re-projecting is stable
        s = model.surface_position(p, 0.0)
        s2 = model.surface_position(s, 0.0)
        np.testing.assert_allclose(s, s2, atol=1e-6)


class TestTerrainModel:
    def test_scale(self):
        assert TerrainModel.planar(np.zeros(3), 1000.0, 0, 1).scale == 500.0
        assert TerrainModel.sphere(np.zeros(3), 50.0, 0, 1).scale == 50.0
        assert TerrainModel.ellipsoid(np.zeros(3), 10.0, 6.0, 0, 1).scale == 8.0

    def test_side_count(self):
        assert TerrainModel.planar(np.zeros(3), 1.0, 0, 1).side_count == 1
        assert TerrainModel.sphere(np.zeros(3), 1.0, 0, 1).side_count == 6

    def test_planar_local_world(self):
        model = TerrainModel.planar(np.array([5.0, 2.0, -3.0]), 100.0, 0.0, 10.0)
        w = model.position_local_to_world(np.array([0.5, 0.0, -0.5]), 7.0)
        np.testing.assert_allclose(w, [55.0, 9.0, -53.0])

    def test_sphere_height_along_normal(self):
        model = TerrainModel.sphere(np.array([1.0, 2.0, 3.0]), 10.0, 0.0, 1.0)
        local = np.array([1.0, 0.0, 0.0])
        w0 = model.position_local_to_world(local, 0.0)
        w5 = model.position_local_to_world(local, 5.0)
        np.testing.assert_allclose(w5 - w0, [5.0, 0.0, 0.0], atol=1e-12)


class TestApproximation:
    def _check(self, model, view, origin_lod=6):
        approx = TerrainModelApproximation.compute(model, view, origin_lod, 0.0)
        origin_count = float(1 << origin_lod)
        view_coord = Coordinate.from_world_position(view, model)
        # evaluate the series at several nearby st offsets and compare with
        # the exact f64 surface position (functions.wgsl:98-115 evaluation)
        for side in range(model.side_count):
            sc = view_coord.project_to_side(side, model)
            for ds, dt in [(0, 0), (1e-5, 0), (0, 1e-5), (1e-5, -1e-5), (1e-4, 1e-4)]:
                st = sc.uv + np.array([ds, dt])
                if np.any(st < 0) or np.any(st > 1):
                    continue
                exact = Coordinate(side, st).world_position(model, 0.0) - view
                s, t = ds, dt
                series = (
                    approx.c[side].astype(np.float64)
                    + approx.c_s[side].astype(np.float64) * s
                    + approx.c_t[side].astype(np.float64) * t
                    + approx.c_ss[side].astype(np.float64) * s * s
                    + approx.c_st[side].astype(np.float64) * s * t
                    + approx.c_tt[side].astype(np.float64) * t * t
                )
                # f32 coefficient rounding dominates; allow metre-scale atol
                # relative to planetary radius but require the *relative*
                # error of the offset to be tiny
                scale = max(1.0, np.linalg.norm(exact))
                assert np.linalg.norm(series - exact) / scale < 1e-5

    def test_sphere(self):
        model = TerrainModel.sphere(np.zeros(3), 6.4e6, 0.0, 9000.0)
        view = np.array([0.0, 0.0, 6.4e6 + 100.0])
        self._check(model, view)

    def test_sphere_off_axis(self):
        model = TerrainModel.sphere(np.array([100.0, -50.0, 3.0]), 6.4e6, 0.0, 9000.0)
        v = np.array([0.3, 0.8, 0.52])
        view = model.position_local_to_world(v / np.linalg.norm(v), 250.0)
        self._check(model, view)

    def test_origin_fields(self):
        model = TerrainModel.sphere(np.zeros(3), 1000.0, 0.0, 10.0)
        view = np.array([0.0, 0.0, 1001.0])
        approx = TerrainModelApproximation.compute(model, view, 4, 5.0)
        assert approx.origin_lod == 4
        assert approx.approximate_height == 5.0
        # view is on side 1 (+z); origin tile must be the center tile
        vc = Coordinate.from_world_position(view, model)
        scaled = vc.uv * 16
        np.testing.assert_array_equal(approx.origin_xy[vc.side], scaled.astype(int))
