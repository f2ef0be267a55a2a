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
    if n_spatial < 1:
        raise ValueError(f"n_spatial must be >= 1, got {n_spatial}")
    if n_data == -1:
        n_data = len(devices) // n_spatial
    if n_data < 1 or n_data * n_spatial > len(devices):
        # n_data can reach 0 via the -1 sentinel when n_spatial exceeds
        # the device count — an empty 0 x n mesh must not build silently
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {max(n_data, 1) * n_spatial} "
            f"devices, have {len(devices)}"
        )
    if len({d.platform for d in devices}) == 1 and devices[0].platform == "tpu":
        # topology-aware layout on real slices: a naive reshape can put
        # non-ICI-adjacent chips next to each other on the spatial axis,
        # taxing every halo exchange
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(
                (n_data, n_spatial), devices=devices[: n_data * n_spatial]
            )
            return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))
        except Exception:
            pass  # fall back to enumeration order
    grid = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a (B, D, H, W, ...) batch: batch over data, optionally
    one spatial dim over spatial."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    if spatial_dim < 1:
        # spatial_dim=0 would silently build the same spec as 1
        raise ValueError(f"spatial_dim must be >= 1, got {spatial_dim}")
    spec = [DATA_AXIS] + [None] * (spatial_dim - 1) + [SPATIAL_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Rank-0 leaves (a loss weight, a schedule scalar) replicate — P("data")
    needs rank >= 1 and used to abort the whole placement.
    """
    sharding = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, rep if np.ndim(x) == 0 else sharding
        ),
        batch,
    )
