"""Spatial partitioning of 3D convolutions with halo exchange.

For 64^3+ grids (BASELINE config 5) the activations of the U-Net/VAE no
longer fit comfortably replicated; the TPU-native answer is to shard the
depth axis of the (B, D, H, W, C) grids over the ``spatial`` mesh axis and
exchange 1-voxel halos between neighbor devices before each 3^3 conv —
a collective-permute ring over ICI, the conv-net analog of ring attention
(SURVEY.md section 2.4).

``halo_exchange`` runs inside shard_map: each device sends its first/last
depth slices to its neighbors and receives theirs, then a VALID conv over
the halo-padded slab equals the global SAME conv restricted to the shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from icsg3d_tpu.parallel import mesh as mesh_lib


def halo_exchange(x, axis_name: str, halo: int = 1, axis: int = 1):
    """Pad a depth-sharded slab with neighbor halos (zeros at the ends).

    x: per-device slab, e.g. (B, D_shard, H, W, C).  Returns the slab
    extended by ``halo`` on both sides of ``axis``.  Matches SAME/zero
    padding semantics at the global boundary.
    """
    if halo > x.shape[axis]:
        raise ValueError(
            f"halo {halo} exceeds the per-shard extent {x.shape[axis]} on "
            f"axis {axis}: one ppermute hop can only fetch the immediate "
            "neighbor's planes — use fewer shards or a smaller kernel"
        )
    n = jax.lax.psum(1, axis_name)

    lo = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    hi = jax.lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis], axis=axis)

    # Send my low slice to the left neighbor (it becomes their high halo)
    # and my high slice to the right neighbor (their low halo).  The perms
    # are intentionally PARTIAL — no wraparound pair across the ring seam:
    # ppermute delivers zeros to unlisted destinations, which is exactly
    # the global-boundary zero padding, with no seam traffic or masking.
    right = [(i, i + 1) for i in range(n - 1)]
    left = [(i, i - 1) for i in range(1, n)]
    from_left = jax.lax.ppermute(hi, axis_name, perm=right)   # left nbr's hi
    from_right = jax.lax.ppermute(lo, axis_name, perm=left)   # right nbr's lo
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def _conv3d_same(x, kernel):
    """Plain NDHWC SAME conv (the unsharded oracle)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv_ndcs_sharded(x, w, bias, hw, mesh: Mesh, interpret: bool = False):
    """Depth-sharded SAME conv on spatial-major (B, D, C, S) activations.

    The multi-chip form of the tap-packed Pallas conv (ops/lowc_conv.py):
    B shards over ``data``, D over ``spatial``.  Each shard halo-exchanges
    one depth plane with its ring neighbors (``ppermute`` over ICI, zeros
    at the global boundary) and runs the depth-VALID kernel on its padded
    slab — together exactly the global SAME conv.  Fully differentiable:
    JAX transposes the ppermutes (halo cotangents flow back to the
    neighbor shards) and shard_map psums the replicated w/bias
    cotangents across the mesh.

    w: (3,3,3,Cin,Cout) float32, bias: (Cout,) float32, hw = (H, W).
    """
    from icsg3d_tpu.ops.lowc_conv import conv_ndcs_valid

    def shard_fn(xs, ws, bs):
        xp = halo_exchange(xs, mesh_lib.SPATIAL_AXIS, halo=1, axis=1)
        return conv_ndcs_valid(xp, ws, bs, hw, interpret)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(mesh_lib.DATA_AXIS, mesh_lib.SPATIAL_AXIS),
            P(),
            P(),
        ),
        out_specs=P(mesh_lib.DATA_AXIS, mesh_lib.SPATIAL_AXIS),
        check_vma=False,  # pallas_call has no replication rule
    )
    return fn(x, w, bias)


def spatial_shard_conv3d(x, kernel, mesh: Mesh):
    """A cubic odd-sized SAME conv with depth sharded over the spatial axis.

    Demonstrates (and tests) the halo-exchange contract the spatially-sharded
    models build on: shard D over ``spatial``, halo-exchange, VALID conv.
    """
    kd, kh, kw = kernel.shape[:3]
    if not (kd == kh == kw and kd % 2 == 1):
        # the halo below is derived from the depth tap count and reused as
        # the H/W SAME padding — only valid for cubic odd kernels
        raise ValueError(
            f"kernel must be cubic with odd size, got {kernel.shape[:3]}"
        )
    halo = (kd - 1) // 2

    def shard_fn(xs, ks):
        padded = halo_exchange(xs, mesh_lib.SPATIAL_AXIS, halo=halo, axis=1)
        return jax.lax.conv_general_dilated(
            padded, ks, window_strides=(1, 1, 1),
            padding=((0, 0), (halo, halo), (halo, halo)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(mesh_lib.DATA_AXIS, mesh_lib.SPATIAL_AXIS),
            P(),
        ),
        out_specs=P(mesh_lib.DATA_AXIS, mesh_lib.SPATIAL_AXIS),
    )
    return fn(x, kernel)
