"""Device mesh construction and sharding helpers.

The training drivers shard batches over the ``data`` axis (DP) and can
optionally shard the grid depth dimension over ``spatial`` (see halo.py).
Parameters and optimizer state are replicated — at these model sizes
(~20M params max) FSDP-style sharding would only add collective latency.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: int = -1,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, spatial) mesh over the available devices.

    n_data=-1 uses all remaining devices on the data axis.  With a single
    device this degenerates to a 1x1 mesh, so all training code paths are
    mesh-based unconditionally — no separate single-chip branch.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {n_data * n_spatial} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a (B, D, H, W, ...) batch: batch over data, optionally
    one spatial dim over spatial."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [DATA_AXIS] + [None] * (spatial_dim - 1) + [SPATIAL_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
