"""Offline preprocessing (L4): source imagery -> streamed tile datasets.

See :mod:`bevy_terrain_tpu.preprocess.preprocessor` (task-graph twin of
reference src/preprocess/) and :mod:`bevy_terrain_tpu.ops.preprocess`
(the split/downsample/stitch data ops)."""

from bevy_terrain_tpu.preprocess.preprocessor import (
    PreprocessDataset,
    Preprocessor,
    SphericalDataset,
    reset_directory,
)

__all__ = [
    "PreprocessDataset",
    "Preprocessor",
    "SphericalDataset",
    "reset_directory",
]
