"""On-device Gaussian voxelization of crystal structures.

The reference builds its density/species grids on the host with a
``scipy.cdist`` call plus an O(voxels x sites) Python double loop per
structure, parallelized over MPI ranks (utils.py:98-144,
create_matrices.py:105-158).  Here the whole thing is pure JAX with static
padded shapes, so a batch of structures voxelizes as one XLA program:

- pairwise squared distances are a single MXU matmul
  (|v|^2 + |n|^2 - 2 v.n),
- the density is another matmul of the Gaussian kernel against z/sigma^3
  (the reference itself expresses it as ``D @ z`` at utils.py:136-139),
- the species assignment is a vectorized reduction replicating the exact
  conflict semantics of the reference loop (utils.py:120-131): a voxel
  inside exactly one site's labeling radius takes that site; inside two or
  more, the globally closest site wins; otherwise background.

Sites are padded to a static length with a mask, so ``vmap`` gives batched
voxelization and the op runs under ``jit`` on TPU with fixed shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from icsg3d_tpu.config import GridSpec

_INV_TWO_PI_POW = float((2.0 * 3.141592653589793) ** -1.5)


def _axis_points(length, d: int, eps_frac: float):
    """Voxel lower-corner coordinates along one axis.

    Reference: utils.py:109-111 — linspace(-a*eps, a + a*eps, d+1)[:-1].
    """
    lo = -length * eps_frac
    hi = length + length * eps_frac
    step = (hi - lo) / d
    return lo + step * jnp.arange(d, dtype=jnp.float32)


def voxel_centers(abc, grid: GridSpec) -> jnp.ndarray:
    """(d^3, 3) cartesian voxel-center coordinates for lattice lengths abc.

    Reference: utils.py:105-115 (bottom-left corners + dv/2).
    """
    abc = jnp.asarray(abc, dtype=jnp.float32)
    d = grid.d
    dv = abc * (1.0 + 2.0 * grid.eps_frac) / d
    axes = [_axis_points(abc[i], d, grid.eps_frac) + dv[i] / 2.0 for i in range(3)]
    X, Y, Z = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)


def coordinate_grid(abc, grid: GridSpec) -> jnp.ndarray:
    """(d, d, d, 3) grid of absolute coordinates in [0, l + 2*eps*l).

    Reference: utils.py:88-94 — linspace(0, l + 2*eps*l, d+1)[:-1] per axis.
    """
    abc = jnp.asarray(abc, dtype=jnp.float32)
    d = grid.d
    axes = []
    for i in range(3):
        hi = abc[i] * (1.0 + 2.0 * grid.eps_frac)
        axes.append(hi / d * jnp.arange(d, dtype=jnp.float32))
    X, Y, Z = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1)


def coordinate_grids_np(abc, grid: GridSpec) -> "np.ndarray":
    """Batched host-side coordinate grids: (B, 3) lattice lengths ->
    (B, d, d, d, 3) float32.

    Same math as :func:`coordinate_grid` (utils.py:88-94) but in numpy for
    dataset building — calling the eager jnp version once per structure
    dispatches dozens of tiny device ops per call, which over a remote TPU
    tunnel turns a trivial fill into minutes of round trips.
    """
    import numpy as np

    abc = np.asarray(abc, np.float32).reshape(-1, 3)
    d = grid.d
    ar = np.arange(d, dtype=np.float32)
    step = abc * (1.0 + 2.0 * grid.eps_frac) / d        # (B, 3)
    out = np.empty((abc.shape[0], d, d, d, 3), np.float32)
    out[..., 0] = (step[:, 0, None] * ar)[:, :, None, None]
    out[..., 1] = (step[:, 1, None] * ar)[:, None, :, None]
    out[..., 2] = (step[:, 2, None] * ar)[:, None, None, :]
    return out


@functools.partial(jax.jit, static_argnames=("grid",))
def voxelize(
    sites: jnp.ndarray,        # (S, 3) cartesian site coordinates
    z: jnp.ndarray,            # (S,) atomic numbers (0 for padding)
    sigma: jnp.ndarray,        # (S,) per-site Gaussian widths (>0, pads too)
    mask: jnp.ndarray,         # (S,) 1 for real sites, 0 for padding
    abc: jnp.ndarray,          # (3,) lattice lengths
    grid: GridSpec,
    label_frac: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Density grid M and species grid S for one (padded) structure.

    Returns M: (d,d,d) float32, S: (d,d,d) float32 of atomic numbers.
    """
    V = voxel_centers(abc, grid)                      # (nv, 3)
    sites = sites.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    sigma = jnp.maximum(sigma.astype(jnp.float32), 1e-6)
    zf = z.astype(jnp.float32)

    # Squared pairwise distances via one matmul (MXU-friendly).  The
    # cancellation form demands full f32 precision: TPU matmuls default to
    # bf16 inputs, which here produces O(0.5) absolute error in d^2 and can
    # flip the species argmin — hence Precision.HIGHEST.
    v2 = jnp.sum(V * V, axis=1, keepdims=True)        # (nv, 1)
    n2 = jnp.sum(sites * sites, axis=1)[None, :]      # (1, S)
    cross = jnp.matmul(V, sites.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(v2 + n2 - 2.0 * cross, 0.0)

    # Density: a * exp(-d^2 / 2 sigma^2) @ (z / sigma^3)  (utils.py:136-139)
    kernel = jnp.exp(-d2 / (2.0 * sigma * sigma)[None, :])
    weights = zf / (sigma ** 3) * mask_f
    M = _INV_TWO_PI_POW * jnp.matmul(
        kernel, weights, precision=jax.lax.Precision.HIGHEST
    )

    # Species assignment with the reference's conflict rule (utils.py:120-131).
    dist = jnp.sqrt(d2)
    big = jnp.float32(1e30)
    dist_valid = jnp.where(mask_f[None, :] > 0, dist, big)
    within = (dist < (sigma * label_frac)[None, :]) & (mask_f[None, :] > 0)
    n_within = jnp.sum(within, axis=1)
    closest = jnp.argmin(dist_valid, axis=1)           # global nearest site
    only = jnp.argmax(within, axis=1)                  # the single in-radius site
    site_idx = jnp.where(n_within >= 2, closest, only)
    label = jnp.where(n_within > 0, zf[site_idx], 0.0)

    shape = grid.shape
    return M.reshape(shape), label.reshape(shape)


@functools.partial(jax.jit, static_argnames=("grid",))
def voxelize_batch(sites, z, sigma, mask, abc, grid: GridSpec, label_frac: float = 1.0):
    """Batched voxelization: all leading args gain a batch dimension.

    Replaces the reference's per-file MPI loop (create_matrices.py:105-158)
    with one vmapped XLA program.
    """
    fn = functools.partial(voxelize, grid=grid, label_frac=label_frac)
    return jax.vmap(fn)(sites, z, sigma, mask, abc)


def pad_sites(N, z, sigma, site_pad: int):
    """Host helper: pad per-structure site arrays to a static length.

    Returns (sites, z, sigma, mask) ready for `voxelize`.
    """
    import numpy as np

    n = len(z)
    if n > site_pad:
        raise ValueError(f"{n} sites exceeds site_pad={site_pad}")
    sites = np.zeros((site_pad, 3), dtype=np.float32)
    zz = np.zeros(site_pad, dtype=np.float32)
    ss = np.ones(site_pad, dtype=np.float32)
    mm = np.zeros(site_pad, dtype=np.float32)
    sites[:n] = N
    zz[:n] = z
    ss[:n] = sigma
    mm[:n] = 1.0
    return sites, zz, ss, mm
