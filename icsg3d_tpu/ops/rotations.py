"""Exact 90-degree rotation augmentation of voxel grids.

The reference rotates (M, S, p) three times by 90 degrees about random axes
using ``scipy.ndimage.rotate`` (utils.py:193-222) — an interpolating call
that, at exactly 90 degrees on a cubic grid, is a pure axis
permutation/flip.  Here it is ``jnp.rot90``, which XLA lowers to a
copy-free transpose+reverse: verified identical to the scipy convention
(rotate(x, 90, axes=(a,b), reshape=False) == rot90(x, k=1, axes=(a,b))).

Species labels are preserved exactly by construction (the reference had to
assert this after interpolation, utils.py:221).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

AXES_CHOICES: Tuple[Tuple[int, int], ...] = ((0, 1), (0, 2), (1, 2))


def rotate90(x: jnp.ndarray, axes: Tuple[int, int], k: int = 1) -> jnp.ndarray:
    """Rotate a (d,d,d) or (d,d,d,C) grid by k*90 degrees in plane ``axes``."""
    return jnp.rot90(x, k=k, axes=axes)


def random_rotation_3d(key, M, S, p, nrotations: int = 3):
    """Apply ``nrotations`` successive random-axis 90-degree rotations.

    Matches random_rotation_3d (utils.py:193-222): axes drawn uniformly from
    the three coordinate planes; same rotation applied to the density grid M
    (d,d,d), species grid S (d,d,d) and coordinate grid p (d,d,d,3).
    """
    choices = jax.random.randint(key, (nrotations,), 0, len(AXES_CHOICES))
    # Static unroll over the 3 rotations; lax.switch over the 3 plane choices
    # keeps everything shape-static under jit.
    for i in range(nrotations):
        branches = [
            (lambda arrs, ax=ax: tuple(jnp.rot90(a, 1, axes=ax) for a in arrs))
            for ax in AXES_CHOICES
        ]
        M, S, p = jax.lax.switch(choices[i], branches, (M, S, p))
    return M, S, p


def all_octahedral_rotations(x: jnp.ndarray) -> jnp.ndarray:
    """All 24 proper rotations of a cubic grid, stacked on a new axis 0.

    Useful for test-time augmentation / equivariance checks; the reference
    only sampled random compositions.
    """
    outs = []
    for k_z in range(4):
        r = jnp.rot90(x, k_z, axes=(0, 1))
        outs.append(r)
        outs.append(jnp.rot90(r, 1, axes=(1, 2)))
        outs.append(jnp.rot90(r, 2, axes=(1, 2)))
        outs.append(jnp.rot90(r, 3, axes=(1, 2)))
        outs.append(jnp.rot90(r, 1, axes=(0, 2)))
        outs.append(jnp.rot90(r, 3, axes=(0, 2)))
    return jnp.stack(outs)
