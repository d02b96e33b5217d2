"""Debug subsystem: runtime toggles + camera drivers.

Twin of the reference's ``TerrainDebugPlugin`` (src/debug/mod.rs): the
``DebugTerrain`` resource's 17 keyboard toggles (mod.rs:66-214) become a
dataclass whose fields map onto pipeline-specialization flags (each change
recompiles the frame step, exactly like the reference's shader-def
specialization) and shading options; the debug fly camera (debug/camera.rs)
becomes deterministic camera-path drivers for examples and benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class DebugTerrain:
    """Runtime debug toggles (reference src/debug/mod.rs:24-88 defaults)."""

    wireframe: bool = False  # rasterizer concern; carried for API parity
    show_data_lod: bool = False
    show_geometry_lod: bool = False
    show_tile_tree: bool = False
    show_pixels: bool = False
    show_uv: bool = False
    show_normals: bool = False
    morph: bool = True
    blend: bool = True
    tile_tree_lod: bool = False
    lighting: bool = True
    sample_grad: bool = True
    high_precision: bool = True
    freeze: bool = False
    test1: bool = False
    test2: bool = False
    test3: bool = False

    @property
    def debug_view(self) -> Optional[str]:
        if self.show_geometry_lod:
            return "geometry_lod"
        if self.show_tile_tree:
            return "tile_tree"
        if self.show_uv:
            return "uv"
        if self.show_normals:
            return "normals"
        return None

    def static_overrides(self) -> dict:
        """Flags that specialize the jitted frame step
        (reference terrain_material.rs:174-227)."""
        return {
            "morph": self.morph,
            "blend": self.blend,
            "tile_tree_lod": self.tile_tree_lod,
            "sample_grad": self.sample_grad,
        }


@dataclasses.dataclass
class OrbitCamera:
    """Deterministic flythrough driver (debug/camera.rs stand-in for
    benchmarks/goldens — SURVEY.md section 2 'camera-path driver')."""

    center: np.ndarray
    radius: float
    height: float
    height_amplitude: float = 0.0
    revolutions: float = 1.0

    def position(self, t: float) -> np.ndarray:
        angle = 2.0 * np.pi * self.revolutions * t
        return np.asarray(self.center) + np.array(
            [
                self.radius * np.cos(angle),
                self.height + self.height_amplitude * np.sin(3.0 * angle),
                self.radius * np.sin(angle),
            ]
        )

    def path(self, frames: int) -> list[np.ndarray]:
        return [self.position(i / max(frames - 1, 1)) for i in range(frames)]


@dataclasses.dataclass
class ApproachCamera:
    """Zoom-in path: far orbit to near-surface approach (stresses the
    streaming + LOD machinery like the swisstopo flythrough config)."""

    target: np.ndarray
    start_distance: float
    end_distance: float
    direction: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.3, 0.8, 0.52])
    )

    def position(self, t: float) -> np.ndarray:
        d = self.start_distance * (self.end_distance / self.start_distance) ** t
        dir_n = self.direction / np.linalg.norm(self.direction)
        return np.asarray(self.target) + d * dir_n

    def path(self, frames: int) -> list[np.ndarray]:
        return [self.position(i / max(frames - 1, 1)) for i in range(frames)]
