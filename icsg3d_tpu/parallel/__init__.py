"""Parallelism layer: device meshes, shardings, and spatial halo exchange.

Replaces the reference's only multi-process mechanism (mpi4py rank-striding
of the preprocessing loop, create_matrices.py:36-38,107) and adds what it
never had: data-parallel training over a TPU mesh and spatial partitioning
of large voxel grids with halo exchange — the conv-net analog of sequence
parallelism.
"""

from icsg3d_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from icsg3d_tpu.parallel.halo import halo_exchange, spatial_shard_conv3d

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "halo_exchange",
    "spatial_shard_conv3d",
]
