"""Pallas TPU kernel: fused Gaussian voxelization.

One kernel pass produces both the density and the species grid for a
structure without materializing the (voxels x sites) distance matrix in
HBM: voxel coordinates are generated in-register from the lattice lengths,
distances/exponentials/reductions all stay in VMEM.  The pure-JAX path
(ops/voxelize.py) materializes three (32768, S) temporaries between fused
regions; this kernel streams voxel tiles instead.

Semantics are identical to ops/voxelize.voxelize (same conflict rule for
species assignment, reference utils.py:120-131), with sites padded to a
lane-aligned static count (128).

Measured on v5e (batch 256 structures, 32^3, 128-site padding): this kernel
reaches 0.89x of the pure-JAX path — XLA's fusion of the matmul-form
distance + exp + matvec is already at the VPU exp roofline, so the XLA
implementation stays the default everywhere.  The kernel is kept as the
validated Pallas fast-path template (in-register coordinate generation, MXU
cross-term and reduction, zero HBM temporaries) for grids large enough that
the (voxels x sites) temporaries stop fitting on-chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icsg3d_tpu.config import GridSpec

_INV_TWO_PI_POW = float((2.0 * 3.141592653589793) ** -1.5)

SITE_LANES = 128   # site axis padded to one full lane tile
TILE_VOXELS = 2048  # voxels per grid step (8 sublane tiles of f32)


def _kernel(abc_ref, sites_ref, z_ref, sigma_ref, mask_ref,
            density_ref, species_ref, *, d: int, eps_frac: float,
            label_frac: float):
    t = pl.program_id(0)
    tile = density_ref.shape[0]  # TILE_VOXELS

    # Voxel coordinates for this tile, generated in-register.
    flat = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t * tile
    i = flat // (d * d)
    j = (flat // d) % d
    k = flat % d

    a = abc_ref[0, 0]
    b = abc_ref[0, 1]
    c = abc_ref[0, 2]
    # lower corner + half voxel (utils.py:105-115)
    dva = a * (1.0 + 2.0 * eps_frac) / d
    dvb = b * (1.0 + 2.0 * eps_frac) / d
    dvc = c * (1.0 + 2.0 * eps_frac) / d
    vx = -a * eps_frac + dva * i.astype(jnp.float32) + dva * 0.5
    vy = -b * eps_frac + dvb * j.astype(jnp.float32) + dvb * 0.5
    vz = -c * eps_frac + dvc * k.astype(jnp.float32) + dvc * 0.5

    # Pairwise squared distances via the |v|^2 + |s|^2 - 2 v.s matmul form:
    # the cross term runs on the MXU, leaving the VPU for the exp.
    v = jnp.concatenate([vx, vy, vz], axis=1)                   # (tile, 3)
    s_t = sites_ref[:, :].T                                     # (3, S)
    # Full f32 precision: the cancellation form can flip the species argmin
    # if the MXU runs the default bf16 passes (see ops/voxelize.py).
    cross = jax.lax.dot_general(
        v, s_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    v2 = vx * vx + vy * vy + vz * vz                            # (tile, 1)
    s2 = jnp.sum(sites_ref[:, :] * sites_ref[:, :], axis=1)[None, :]
    d2 = jnp.maximum(v2 + s2 - 2.0 * cross, 0.0)

    sigma = sigma_ref[0, :][None, :]
    mask = mask_ref[0, :][None, :]
    zval = z_ref[0, :][None, :]

    # Density: sum_s exp(-d2 / 2 sigma^2) * z / sigma^3 (utils.py:136-140),
    # the weighted reduction as an MXU matvec.
    kernel = jnp.exp(-d2 / (2.0 * sigma * sigma))
    weights = (zval / (sigma * sigma * sigma) * mask).T         # (S, 1)
    density_ref[:, :] = _INV_TWO_PI_POW * jax.lax.dot_general(
        kernel, weights, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # Species with the reference conflict rule (utils.py:120-131): inside
    # exactly one labeling radius -> that site; two or more -> globally
    # closest site; none -> background.
    big = jnp.float32(1e30)
    dist2_valid = jnp.where(mask > 0, d2, big)
    rad2 = (sigma * label_frac) * (sigma * label_frac)
    within = (d2 < rad2) & (mask > 0)
    n_within = jnp.sum(within.astype(jnp.int32), axis=1)

    min_d2 = jnp.min(dist2_valid, axis=1, keepdims=True)
    is_closest = dist2_valid <= min_d2            # one-hot-ish (ties -> both)
    # break ties toward the lowest site index like argmin
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    first_closest = jnp.min(
        jnp.where(is_closest, lane, SITE_LANES), axis=1, keepdims=True
    )
    closest_onehot = (lane == first_closest).astype(jnp.float32)
    first_within = jnp.min(
        jnp.where(within, lane, SITE_LANES), axis=1, keepdims=True
    )
    within_onehot = (lane == first_within).astype(jnp.float32)

    pick = jnp.where((n_within >= 2)[:, None], closest_onehot, within_onehot)
    label = jnp.sum(pick * zval, axis=1)
    species_ref[:, 0] = jnp.where(n_within > 0, label, 0.0)


@functools.partial(
    jax.jit, static_argnames=("grid", "label_frac", "interpret")
)
def voxelize_pallas(
    sites: jnp.ndarray,    # (S, 3) cartesian site coordinates (S <= 128)
    z: jnp.ndarray,        # (S,)
    sigma: jnp.ndarray,    # (S,)
    mask: jnp.ndarray,     # (S,)
    abc: jnp.ndarray,      # (3,)
    grid: GridSpec,
    label_frac: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-pass voxelization; same contract as ops.voxelize.voxelize."""
    d = grid.d
    n_vox = d * d * d
    if n_vox % TILE_VOXELS == 0:
        tile = TILE_VOXELS
    else:  # small grids: one tile
        tile = n_vox
    n_tiles = n_vox // tile

    S = sites.shape[0]
    if S > SITE_LANES:
        raise ValueError(f"at most {SITE_LANES} sites, got {S}")
    pad = SITE_LANES - S
    sites_p = jnp.pad(sites.astype(jnp.float32), ((0, pad), (0, 0)))
    z_p = jnp.pad(z.astype(jnp.float32), (0, pad))[None, :]
    sigma_p = jnp.pad(
        jnp.maximum(sigma.astype(jnp.float32), 1e-6), (0, pad),
        constant_values=1.0,
    )[None, :]
    mask_p = jnp.pad(mask.astype(jnp.float32), (0, pad))[None, :]
    abc_2d = abc.astype(jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _kernel, d=d, eps_frac=grid.eps_frac, label_frac=label_frac
    )
    density, species = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # abc
            pl.BlockSpec(memory_space=pltpu.VMEM),        # sites
            pl.BlockSpec(memory_space=pltpu.VMEM),        # z
            pl.BlockSpec(memory_space=pltpu.VMEM),        # sigma
            pl.BlockSpec(memory_space=pltpu.VMEM),        # mask
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_vox, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_vox, 1), jnp.float32),
        ),
        interpret=interpret,
    )(abc_2d, sites_p, z_p, sigma_p, mask_p)

    shape = grid.shape
    return density.reshape(shape), species.reshape(shape)


def voxelize_pallas_batch(
    sites, z, sigma, mask, abc, grid: GridSpec, label_frac: float = 1.0,
    interpret: bool = False,
):
    fn = functools.partial(
        voxelize_pallas, grid=grid, label_frac=label_frac, interpret=interpret
    )
    return jax.vmap(fn)(sites, z, sigma, mask, abc)
