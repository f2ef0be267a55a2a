"""Device-side ops: voxelization, grid transforms, rotations, segmentation,
atom extraction, losses, metrics, and the Pallas TPU kernels."""

from icsg3d_tpu.ops.voxelize import (
    coordinate_grid,
    voxel_centers,
    voxelize,
    voxelize_batch,
)
from icsg3d_tpu.ops.grid import (
    to_lattice_params,
    to_voxel_params,
    voxel_to_cartesian,
)
from icsg3d_tpu.ops.rotations import random_rotation_3d, rotate90
from icsg3d_tpu.ops.segmentation import watershed_clustering
from icsg3d_tpu.ops.extract import extract_atoms, extract_atoms_batch
from icsg3d_tpu.ops.emd import earth_movers_distance

__all__ = [
    "coordinate_grid",
    "voxel_centers",
    "voxelize",
    "voxelize_batch",
    "to_lattice_params",
    "to_voxel_params",
    "voxel_to_cartesian",
    "random_rotation_3d",
    "rotate90",
    "watershed_clustering",
    "extract_atoms",
    "extract_atoms_batch",
    "earth_movers_distance",
]
