"""Inverse grid transforms: decoded coordinate channels -> lattice geometry.

Reference: utils.py:160-190.  The decoder emits absolute-coordinate channels;
these recover the lattice lengths (a, b, c) and the voxel edge lengths from
them, batched and jittable.  Nothing here hardcodes the grid size — the
GridSpec is the single owner of d/eps_frac (the reference hardcoded 32 at
generate.py:211-213 and watershed.py:178-180).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from icsg3d_tpu.config import GridSpec


@functools.partial(jax.jit, static_argnames=("grid",))
def to_lattice_params(coords: jnp.ndarray, grid: GridSpec) -> jnp.ndarray:
    """Recover (a, b, c) from coordinate channels.

    coords: (B, d, d, d, 3).  Mirrors utils.py:160-178: per-channel span,
    un-padded by (1 + 2*eps), corrected for the half-open grid (d-1 steps
    span the range), then shrunk by 1/d.
    """
    span = jnp.max(coords, axis=(1, 2, 3)) - jnp.min(coords, axis=(1, 2, 3))
    lp = span / (1.0 + 2.0 * grid.eps_frac)
    lp = lp / (1.0 - 1.0 / grid.d)
    lp = lp - lp / grid.d
    return lp


@functools.partial(jax.jit, static_argnames=("grid",))
def to_voxel_params(lattice_params: jnp.ndarray, grid: GridSpec) -> jnp.ndarray:
    """Voxel edge lengths dv from lattice lengths.  utils.py:181-190."""
    return lattice_params * (1.0 + 2.0 * grid.eps_frac) / grid.d


def voxel_to_cartesian(mu: jnp.ndarray, lattice_params, dv, grid: GridSpec):
    """Voxel-space centroids -> cartesian coordinates.

    Reference: generate.py:237-241 — mu * dv - eps * l + dv/2.
    mu: (..., 3) voxel indices (possibly fractional centroids).
    """
    lattice_params = jnp.asarray(lattice_params)
    dv = jnp.asarray(dv)
    return mu * dv - grid.eps_frac * lattice_params + dv / 2.0
