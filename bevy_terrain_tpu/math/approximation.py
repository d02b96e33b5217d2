"""Per-view second-order Taylor approximation of the cube-sphere surface.

Behavioral twin of /root/reference/src/math/terrain_model.rs:222-360.

The approximation maps st coordinates relative to the view (at ``origin_lod``
resolution) to world positions *relative to the view* — this is what lets f32
device kernels compute sub-meter-accurate positions on a 6.4e6 m ellipsoid
(the reference's high-precision trick; consumed by
src/shaders/functions.wgsl:98-115). Computed on host in f64 once per frame
per view (6 sides, trivial cost), shipped to the device as small f32 arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from bevy_terrain_tpu.math.coordinate import C_SQR, Coordinate

# One matrix per side, shuffling the (a, b, c) basis into cube xyz
# (reference terrain_model.rs:14-21, DMat3::from_cols_array => column-major).
SIDE_MATRICES = np.stack(
    [
        np.array(cols, dtype=np.float64).reshape(3, 3, order="F")
        for cols in [
            [-1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0],
            [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0, -1.0, 0.0],
            [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0],
            [1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 1.0],
            [0.0, 0.0, -1.0, 0.0, -1.0, 0.0, 1.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0],
        ]
    ]
)


@dataclasses.dataclass
class TerrainModelApproximation:
    """Device-ready per-view Taylor parameters (reference terrain_model.rs:228-259).

    Arrays are stacked over the 6 sides; planar terrains only use side 0
    (and only ``origin_xy``/``origin_uv``, for the subdivision coordinate).
    """

    origin_lod: int
    approximate_height: float
    origin_xy: np.ndarray  # (6, 2) int32 — view tile index at origin_lod per side
    origin_uv: np.ndarray  # (6, 2) f32 — view uv within that tile
    c: np.ndarray  # (6, 3) f32 — constant coefficient
    c_s: np.ndarray  # (6, 3) f32
    c_t: np.ndarray  # (6, 3) f32
    c_ss: np.ndarray  # (6, 3) f32 (pre-multiplied by 0.5)
    c_st: np.ndarray  # (6, 3) f32
    c_tt: np.ndarray  # (6, 3) f32 (pre-multiplied by 0.5)

    @staticmethod
    def compute(
        model,
        view_world_position,
        origin_lod: int,
        approximate_height: float,
    ) -> "TerrainModelApproximation":
        """Reference terrain_model.rs:263-360 (analytic derivative chain)."""
        view_world_position = np.asarray(view_world_position, np.float64)
        origin_count = float(1 << origin_lod)
        view_coordinate = Coordinate.from_world_position(view_world_position, model)

        origin_xy = np.zeros((6, 2), np.int32)
        origin_uv = np.zeros((6, 2), np.float32)
        coeffs = {k: np.zeros((6, 3), np.float32) for k in ("c", "c_s", "c_t", "c_ss", "c_st", "c_tt")}

        m = model.world_from_local

        for side in range(6):
            sc = view_coordinate.project_to_side(side, model)
            scaled = sc.uv * origin_count
            origin_xy[side] = scaled.astype(np.int64)
            origin_uv[side] = (scaled % 1.0).astype(np.float32)

            s, t = float(sc.uv[0]), float(sc.uv[1])

            # u(s) = (2s-1)/sqrt(1-4Cs(s-1)), v(t) likewise
            # (reference terrain_model.rs:279-302)
            u_denom = np.sqrt(1.0 - 4.0 * C_SQR * s * (s - 1.0))
            u = (2.0 * s - 1.0) / u_denom
            u_ds = 2.0 * (C_SQR + 1.0) / u_denom**3
            u_dss = 12.0 * C_SQR * (C_SQR + 1.0) * (2.0 * s - 1.0) / u_denom**5

            v_denom = np.sqrt(1.0 - 4.0 * C_SQR * t * (t - 1.0))
            v = (2.0 * t - 1.0) / v_denom
            v_dt = 2.0 * (C_SQR + 1.0) / v_denom**3
            v_dtt = 12.0 * C_SQR * (C_SQR + 1.0) * (2.0 * t - 1.0) / v_denom**5

            # l(s,t) = sqrt(1 + u^2 + v^2) and derivatives
            # (reference terrain_model.rs:304-309)
            l = np.sqrt(1.0 + u * u + v * v)
            l_ds = u * u_ds / l
            l_dt = v * v_dt / l
            l_dss = (u * u_dss * l * l + (v * v + 1.0) * u_ds * u_ds) / l**3
            l_dst = -(u * v * u_ds * v_dt) / l**3
            l_dtt = (v * v_dtt * l * l + (u * u + 1.0) * v_dt * v_dt) / l**3

            # quotient-rule chains for a=1/l, b=u/l, c=v/l scaled by powers of l
            # (reference terrain_model.rs:311-330)
            a = 1.0
            a_ds = -l_ds
            a_dt = -l_dt
            a_dss = 2.0 * l_ds * l_ds - l * l_dss
            a_dst = 2.0 * l_ds * l_dt - l * l_dst
            a_dtt = 2.0 * l_dt * l_dt - l * l_dtt

            b = u
            b_ds = -u * l_ds + l * u_ds
            b_dt = -u * l_dt
            b_dss = 2.0 * u * l_ds * l_ds - l * (2.0 * u_ds * l_ds + u * l_dss) + u_dss * l * l
            b_dst = 2.0 * u * l_ds * l_dt - l * (u_ds * l_dt + u * l_dst)
            b_dtt = 2.0 * u * l_dt * l_dt - l * u * l_dtt

            c = v
            c_ds = -v * l_ds
            c_dt = -v * l_dt + l * v_dt
            c_dss = 2.0 * v * l_ds * l_ds - l * v * l_dss
            c_dst = 2.0 * v * l_ds * l_dt - l * (v_dt * l_ds + v * l_dst)
            c_dtt = 2.0 * v * l_dt * l_dt - l * (2.0 * v_dt * l_dt + v * l_dtt) + v_dtt * l * l

            sm = SIDE_MATRICES[side]

            def tp(vec, power):
                return model.transform_vector(m, sm @ np.asarray(vec) / l**power)

            p = model.transform_point(m, sm @ np.array([a, b, c]) / l)
            p_ds = tp([a_ds, b_ds, c_ds], 2)
            p_dt = tp([a_dt, b_dt, c_dt], 2)
            p_dss = tp([a_dss, b_dss, c_dss], 3)
            p_dst = tp([a_dst, b_dst, c_dst], 3)
            p_dtt = tp([a_dtt, b_dtt, c_dtt], 3)

            coeffs["c"][side] = (p - view_world_position).astype(np.float32)
            coeffs["c_s"][side] = p_ds.astype(np.float32)
            coeffs["c_t"][side] = p_dt.astype(np.float32)
            coeffs["c_ss"][side] = (p_dss / 2.0).astype(np.float32)
            coeffs["c_st"][side] = p_dst.astype(np.float32)
            coeffs["c_tt"][side] = (p_dtt / 2.0).astype(np.float32)

        return TerrainModelApproximation(
            origin_lod=origin_lod,
            approximate_height=float(approximate_height),
            origin_xy=origin_xy,
            origin_uv=origin_uv,
            **coeffs,
        )
