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

    # wireframe: the reference flips the rasterizer's polygon mode
    # (terrain_material.rs:299-303); here the shaded output gets a
    # tile-border/lattice darkening overlay (material.wireframe_overlay)
    wireframe: bool = False
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
    # pin every view's tile list (Terrain.set_debug): refinement is skipped
    # and the frozen list re-meshes from the moving camera — the reference
    # skips the tiling prepass the same way (debug/mod.rs:186-192,
    # tiling_prepass.rs:230-232)
    freeze: bool = False
    # TEST1-3 map to shader defs that NO shader in the reference snapshot
    # references (grep TEST1|TEST2|TEST3 over src/shaders/* is empty); they
    # exist purely as respecialization hooks (terrain_material.rs:93-97).
    # Kept with identical semantics: toggling them changes the static
    # config hash (forces a recompile) and nothing else.
    test1: bool = False
    test2: bool = False
    test3: bool = False

    @property
    def debug_view(self):
        """Active view(s) with fragment_debug's overwrite order
        (fragment.wgsl:69-87): uv/normals replace last (wiping the pixel
        overlay); otherwise show_pixels mixes 50% over whichever of
        data_lod/geometry_lod/tile_tree (or the plain material) is showing.
        Returns a view name, a tuple of them, or None — the shapes
        render/material.shade accepts."""
        if self.show_normals:
            return "normals"
        if self.show_uv:
            return "uv"
        base = (
            "tile_tree" if self.show_tile_tree
            else "geometry_lod" if self.show_geometry_lod
            else "data_lod" if self.show_data_lod
            else None
        )
        if self.show_pixels:
            return (base, "pixels") if base else "pixels"
        return base

    def static_overrides(self) -> dict:
        """Flags that specialize the jitted frame step
        (reference terrain_material.rs:174-227)."""
        return {
            "morph": self.morph,
            "blend": self.blend,
            "tile_tree_lod": self.tile_tree_lod,
            "sample_grad": self.sample_grad,
            "test1": self.test1,
            "test2": self.test2,
            "test3": self.test3,
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
