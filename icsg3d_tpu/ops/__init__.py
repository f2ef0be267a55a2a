"""Device-side ops: voxelization, grid transforms, rotations, segmentation,
metrics, and the Pallas TPU kernels backing the hot paths."""

from icsg3d_tpu.ops.voxelize import (
    coordinate_grid,
    voxel_centers,
    voxelize,
    voxelize_batch,
)
from icsg3d_tpu.ops.grid import to_lattice_params, to_voxel_params
from icsg3d_tpu.ops.rotations import random_rotation_3d, rotate90

__all__ = [
    "coordinate_grid",
    "voxel_centers",
    "voxelize",
    "voxelize_batch",
    "to_lattice_params",
    "to_voxel_params",
    "random_rotation_3d",
    "rotate90",
]
