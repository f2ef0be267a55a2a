"""Synthetic crystal dataset generation.

The reference pipeline starts from Materials Project CIFs
(query_matproj.py); this environment has no network egress, so tests and
benchmarks build physically-plausible synthetic datasets instead: cubic
ABX3 perovskites and binary rocksalts with jittered lattice constants and
species drawn from curated element pools.  Voxelization runs through the
same on-device pipeline as real data (ops/voxelize.py), so everything
downstream — U-Net, VAE, watershed, CGCNN — exercises identical code paths.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.config import GridSpec, VoxelizerConfig
from icsg3d_tpu.crystal import elements
from icsg3d_tpu.crystal.lattice import Lattice
from icsg3d_tpu.crystal.structure import Site, Structure
from icsg3d_tpu.data.store import GridDataset
from icsg3d_tpu.ops.rotations import AXES_CHOICES
from icsg3d_tpu.ops.voxelize import coordinate_grids_np, pad_sites, voxelize_batch

# Element pools (atomic numbers) for plausible chemistry.
A_SITE = [3, 11, 19, 20, 37, 38, 55, 56, 57]           # alkali/alkaline/La
B_SITE = [13, 22, 23, 24, 25, 26, 27, 28, 31, 40, 41]  # Al + 3d/4d metals
X_SITE = [8, 9, 16, 17]                                # O, F, S, Cl
ROCKSALT_CATION = [3, 11, 12, 19, 20, 26, 28, 30, 38, 56]
ROCKSALT_ANION = [8, 9, 16, 17, 34, 35]


def perovskite(rng: np.random.Generator) -> Structure:
    """Cubic ABX3 perovskite with a jittered lattice constant."""
    a_z = int(rng.choice(A_SITE))
    b_z = int(rng.choice(B_SITE))
    x_z = int(rng.choice(X_SITE))
    a0 = float(rng.uniform(3.6, 4.6))
    lattice = Lattice.from_parameters(a0, a0, a0)
    sites = [
        Site(a_z, np.array([0.0, 0.0, 0.0])),
        Site(b_z, np.array([0.5, 0.5, 0.5])),
        Site(x_z, np.array([0.5, 0.5, 0.0])),
        Site(x_z, np.array([0.5, 0.0, 0.5])),
        Site(x_z, np.array([0.0, 0.5, 0.5])),
    ]
    return Structure(lattice, sites)


def rocksalt(rng: np.random.Generator) -> Structure:
    """Conventional-cell rocksalt AB (8 atoms)."""
    c_z = int(rng.choice(ROCKSALT_CATION))
    a_z = int(rng.choice(ROCKSALT_ANION))
    a0 = float(rng.uniform(4.0, 5.8))
    lattice = Lattice.from_parameters(a0, a0, a0)
    cat = [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)]
    ani = [(0.5, 0, 0), (0, 0.5, 0), (0, 0, 0.5), (0.5, 0.5, 0.5)]
    sites = [Site(c_z, np.array(f, dtype=float)) for f in cat] + [
        Site(a_z, np.array(f, dtype=float)) for f in ani
    ]
    return Structure(lattice, sites)


def random_structures(
    n: int, seed: int = 0, kinds: Tuple[str, ...] = ("perovskite",)
) -> List[Structure]:
    rng = np.random.default_rng(seed)
    makers = {"perovskite": perovskite, "rocksalt": rocksalt}
    return [makers[kinds[i % len(kinds)]](rng) for i in range(n)]


def synthetic_target(structure: Structure) -> float:
    """Deterministic pseudo formation energy for conditioning/regression.

    A smooth function of composition chemistry — electronegativity spread
    and mean ionic radius — so models have real signal to learn.
    """
    zs = structure.atomic_numbers
    en = elements.ELECTRONEGATIVITY[zs]
    en = en[~np.isnan(en)]
    r = elements.MEAN_IONIC_RADIUS_A[zs]
    spread = float(en.max() - en.min()) if len(en) else 0.0
    return -1.5 * spread - 0.8 * float(np.mean(r)) + 0.1 * len(zs)


def synthetic_band_gap(structure: Structure) -> float:
    """Second deterministic pseudo property (nonnegative, gap-like) so the
    multi-property generate->CGCNN loop (reference generate.py:280-286) can
    be exercised end-to-end with two independently-trained regressors.

    Chemically different signal from synthetic_target: mean
    electronegativity and ionization energy push the pseudo gap up, mean
    atomic number pulls it down; clamped at 0 like a real gap.
    """
    zs = structure.atomic_numbers
    if len(zs) == 0:
        return 0.0
    en = elements.ELECTRONEGATIVITY[zs]
    en = float(np.nanmean(en)) if not np.all(np.isnan(en)) else 1.5
    ie = elements.FIRST_IONIZATION_EV[zs]
    ie = float(np.nanmean(ie)) if not np.all(np.isnan(ie)) else 7.0
    return max(0.0, 1.2 * en + 0.35 * ie - 0.05 * float(np.mean(zs)) - 3.0)


def build_dataset(
    path: str,
    n: int = 32,
    seed: int = 0,
    cfg: VoxelizerConfig = VoxelizerConfig(),
    n_rot: int = 0,
    kinds: Tuple[str, ...] = ("perovskite",),
) -> GridDataset:
    """Generate, voxelize on device, and write a packed GridDataset.

    Rotation augmentations are exact 90-degree grid rotations (the
    reference's create_matrices.py:174-207 loop), stored as additional rows
    with `_rot_k` ids so data_split's grouping applies.
    """
    structures = random_structures(n, seed=seed, kinds=kinds)
    grid = cfg.grid

    sites_b, z_b, sig_b, mask_b, abc_b = [], [], [], [], []
    for s in structures:
        N, z, r = s.site_arrays()
        cart = s.lattice.cartesian(N)
        arr = pad_sites(cart, z, r * cfg.sigma_frac, cfg.site_pad)
        sites_b.append(arr[0]); z_b.append(arr[1]); sig_b.append(arr[2])
        mask_b.append(arr[3]); abc_b.append(np.array(s.lattice.abc, np.float32))

    # ground-truth site fields for evaluation (z=0 marks padding); the
    # voxelizer's sigma column is not stored — eval needs positions+species
    true_sites = np.stack(sites_b)
    true_z = np.stack(z_b) * np.stack(mask_b)

    # Voxelize in chunks: the (chunk, d^3, site_pad) f32 distance
    # intermediates are what bound device memory, not the outputs.  Scale
    # the chunk with grid volume — the old fixed 256 was sized for 32^3
    # and produced a 17 GB intermediate at 64^3 (larger than TPU HBM; it
    # also OOM-killed CPU builds of 64^3 datasets).
    chunk = max(8, int(256 * (32 / grid.d) ** 3))
    Ms, Ss = [], []
    for c0 in range(0, n, chunk):
        sl = slice(c0, c0 + chunk)
        Mc, Sc = voxelize_batch(
            jnp.asarray(np.stack(sites_b[sl])),
            jnp.asarray(np.stack(z_b[sl])),
            jnp.asarray(np.stack(sig_b[sl])),
            jnp.asarray(np.stack(mask_b[sl])),
            jnp.asarray(np.stack(abc_b[sl])),
            grid,
            label_frac=cfg.label_frac,
        )
        Ms.append(np.asarray(Mc, dtype=np.float32))
        Ss.append(np.asarray(Sc).astype(np.uint8))
    M = np.concatenate(Ms)
    S = np.concatenate(Ss)
    coords = coordinate_grids_np(np.stack(abc_b), grid)

    ids = [f"syn-{i}" for i in range(n)]
    lattice = np.stack(
        [np.array(s.lattice.parameters, np.float32) for s in structures]
    )
    target = np.array([synthetic_target(s) for s in structures], np.float32)

    if n_rot:
        rng = np.random.default_rng(seed + 1)
        all_M, all_S, all_C = [M], [S], [coords]
        all_ids = list(ids)
        all_lat, all_tgt = [lattice], [target]
        all_sites, all_z = [true_sites], [true_z]
        for i in range(n):
            for r in range(n_rot):
                m, s_, c = M[i], S[i], coords[i]
                for axes_i in rng.integers(0, len(AXES_CHOICES), size=3):
                    ax = AXES_CHOICES[axes_i]
                    m = np.rot90(m, 1, axes=ax)
                    s_ = np.rot90(s_, 1, axes=ax)
                    c = np.rot90(c, 1, axes=ax)
                all_M.append(m[None]); all_S.append(s_[None]); all_C.append(c[None])
                all_ids.append(f"{ids[i]}_rot_{r}")
                all_lat.append(lattice[i][None]); all_tgt.append(target[i][None])
                # site ground truth is stored in the UNROTATED frame; the
                # evaluation split uses n_rot=0 (eval.py:130-142 parity)
                all_sites.append(true_sites[i][None]); all_z.append(true_z[i][None])
        M = np.concatenate(all_M); S = np.concatenate(all_S)
        coords = np.concatenate(all_C)
        lattice = np.concatenate(all_lat); target = np.concatenate(all_tgt)
        true_sites = np.concatenate(all_sites); true_z = np.concatenate(all_z)
        ids = all_ids

    return GridDataset.write(
        path,
        ids,
        {
            "density": M,
            "coords": coords,
            "species": S,
            "lattice": lattice,
            "target": target,
            "sites": true_sites.astype(np.float32),
            "site_z": true_z.astype(np.float32),
        },
    )
