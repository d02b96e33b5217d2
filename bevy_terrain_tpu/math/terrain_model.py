"""Terrain shape model: planar / spherical / ellipsoidal (host f64).

Behavioral twin of /root/reference/src/math/terrain_model.rs:24-219.
World<->local transforms, surface projection, scale, and side count. All
host-side numpy f64 — this math only runs a handful of times per frame; the
per-vertex device math uses the f32 local->world affine + Taylor relative
path instead (see ops/meshgen.py).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import numpy as np

from bevy_terrain_tpu.math.ellipsoid import project_point_ellipsoid

TerrainKind = Literal["planar", "spherical", "ellipsoidal"]


def _affine(scale: np.ndarray, rotation: np.ndarray, translation: np.ndarray) -> np.ndarray:
    """4x4 world_from_local = T * R * S (column-vector convention)."""
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = rotation @ np.diag(scale)
    m[:3, 3] = translation
    return m


@dataclasses.dataclass
class TerrainModel:
    """The terrain's shape and placement (reference terrain_model.rs:40-50).

    Use the :meth:`planar`, :meth:`sphere`, :meth:`ellipsoid` constructors.
    """

    kind: TerrainKind
    min_height: float
    max_height: float
    translation: np.ndarray
    scale_vec: np.ndarray
    rotation: np.ndarray  # 3x3
    world_from_local: np.ndarray  # 4x4 f64
    local_from_world: np.ndarray  # 4x4 f64
    # kind parameters
    side_length: float = 0.0
    radius: float = 0.0
    major_axis: float = 0.0
    minor_axis: float = 0.0
    ellipsoid_from_world: np.ndarray | None = None

    # -- constructors (reference terrain_model.rs:84-128) --

    @staticmethod
    def _new(kind, scale, rotation, translation, min_height, max_height, **params):
        scale = np.asarray(scale, np.float64)
        translation = np.asarray(translation, np.float64)
        rotation = np.asarray(rotation, np.float64)
        world_from_local = _affine(scale, rotation, translation)
        return TerrainModel(
            kind=kind,
            min_height=float(min_height),
            max_height=float(max_height),
            translation=translation,
            scale_vec=scale,
            rotation=rotation,
            world_from_local=world_from_local,
            local_from_world=np.linalg.inv(world_from_local),
            **params,
        )

    @staticmethod
    def planar(position, side_length: float, min_height: float, max_height: float):
        """Reference terrain_model.rs:84-93."""
        return TerrainModel._new(
            "planar",
            np.full(3, side_length),
            np.eye(3),
            position,
            min_height,
            max_height,
            side_length=float(side_length),
        )

    @staticmethod
    def sphere(position, radius: float, min_height: float, max_height: float):
        """Reference terrain_model.rs:95-104."""
        return TerrainModel._new(
            "spherical",
            np.full(3, radius),
            np.eye(3),
            position,
            min_height,
            max_height,
            radius=float(radius),
        )

    @staticmethod
    def ellipsoid(
        position, major_axis: float, minor_axis: float, min_height: float, max_height: float
    ):
        """Reference terrain_model.rs:106-128 (identity rotation, like the reference)."""
        position = np.asarray(position, np.float64)
        ellipsoid_from_world = np.eye(4)
        ellipsoid_from_world[:3, 3] = -position
        return TerrainModel._new(
            "ellipsoidal",
            np.array([major_axis, minor_axis, major_axis]),
            np.eye(3),
            position,
            min_height,
            max_height,
            major_axis=float(major_axis),
            minor_axis=float(minor_axis),
            ellipsoid_from_world=ellipsoid_from_world,
        )

    # -- queries --

    @property
    def is_spherical(self) -> bool:
        """Reference terrain_model.rs:53-59 (ellipsoids count as spherical)."""
        return self.kind != "planar"

    @property
    def side_count(self) -> int:
        """6 cube faces for spheres, 1 for planes (reference terrain_model.rs:175-181)."""
        return 6 if self.is_spherical else 1

    @property
    def scale(self) -> float:
        """Characteristic scale used for distance knobs (reference terrain_model.rs:183-193)."""
        if self.kind == "planar":
            return self.side_length / 2.0
        if self.kind == "spherical":
            return self.radius
        return (self.major_axis + self.minor_axis) / 2.0

    def transform_point(self, m: np.ndarray, p: np.ndarray) -> np.ndarray:
        return m[:3, :3] @ p + m[:3, 3]

    def transform_vector(self, m: np.ndarray, v: np.ndarray) -> np.ndarray:
        return m[:3, :3] @ v

    def position_local_to_world(self, local_position, height: float) -> np.ndarray:
        """Reference terrain_model.rs:130-142."""
        local_position = np.asarray(local_position, np.float64)
        world_position = self.transform_point(self.world_from_local, local_position)
        local_normal = local_position if self.is_spherical else np.array([0.0, 1.0, 0.0])
        world_normal = self.transform_vector(self.world_from_local, local_normal)
        world_normal = world_normal / np.linalg.norm(world_normal)
        return world_position + height * world_normal

    def position_world_to_local(self, world_position) -> np.ndarray:
        """Reference terrain_model.rs:144-169."""
        world_position = np.asarray(world_position, np.float64)
        if self.kind == "planar":
            local = self.transform_point(self.local_from_world, world_position)
            return np.array([local[0], 0.0, local[2]])
        if self.kind == "spherical":
            local = self.transform_point(self.local_from_world, world_position)
            return local / np.linalg.norm(local)
        ellipsoid_position = self.transform_point(
            self.ellipsoid_from_world, world_position
        )
        surface = project_point_ellipsoid(
            np.array([self.major_axis, self.major_axis, self.minor_axis]),
            ellipsoid_position,
        )
        local = self.transform_point(self.local_from_world, surface)
        return local / np.linalg.norm(local)

    def surface_position(self, world_position, height: float) -> np.ndarray:
        """Project a world position onto the terrain surface at ``height``
        (reference terrain_model.rs:171-173)."""
        return self.position_local_to_world(
            self.position_world_to_local(world_position), height
        )
