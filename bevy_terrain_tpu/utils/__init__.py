"""Utilities: synthetic dataset generation, timing harness."""

from bevy_terrain_tpu.utils.synthetic import generate_planar_dataset
from bevy_terrain_tpu.utils.timing import Timer, benchmark

__all__ = ["Timer", "benchmark", "generate_planar_dataset"]
