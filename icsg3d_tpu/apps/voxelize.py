"""Dataset builder: CIF directory (or synthetic) -> packed GridDataset.

Reference: create_matrices.py, which parsed CIFs and voxelized them in an
O(voxels x sites) host loop striped across MPI ranks.  Here:

- CIF parsing stays on the host (icsg3d_tpu.crystal.cif, no pymatgen);
- multi-host sharding uses jax.process_index()/process_count() striding —
  the functional replacement for the MPI rank stride
  (create_matrices.py:107) with the filesystem as the sink, no collectives;
- voxelization runs on device in batches: one vmapped XLA program per chunk
  (ops/voxelize.py) instead of a Python double loop per structure;
- rotation augmentations are exact 90-degree grid rotations.

Each process writes ``part-<k>/``; single-process runs write the dataset
directly.  Use ``merge_parts`` to combine.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from icsg3d_tpu.config import GridSpec, VoxelizerConfig
from icsg3d_tpu.crystal.cif import read_cif
from icsg3d_tpu.crystal.structure import Structure
from icsg3d_tpu.data.store import FIELDS, GridDataset
from icsg3d_tpu.ops.rotations import AXES_CHOICES
from icsg3d_tpu.ops.voxelize import (
    coordinate_grids_np,
    pad_sites,
    voxelize_batch,
)


def voxelize_structures(
    structures: Sequence[Structure],
    ids: Sequence[str],
    targets: Sequence[float],
    cfg: VoxelizerConfig = VoxelizerConfig(),
    n_rot: int = 0,
    seed: int = 0,
    chunk: int = 64,
) -> Tuple[List[str], Dict[str, np.ndarray]]:
    """Voxelize structures on device in chunks; returns (ids, field arrays)."""
    import jax.numpy as jnp

    grid = cfg.grid
    keep_idx, sites_b, z_b, sig_b, mask_b, abc_b = [], [], [], [], [], []
    for i, s in enumerate(structures):
        n = len(s)
        if n == 0 or n > cfg.max_sites or n > cfg.site_pad:
            continue  # skip over-large structures (cgcnn/data.py:161 analog)
        N, z, r = s.site_arrays()
        cart = s.lattice.cartesian(N)
        arr = pad_sites(cart, z, r * cfg.sigma_frac, cfg.site_pad)
        keep_idx.append(i)
        sites_b.append(arr[0]); z_b.append(arr[1]); sig_b.append(arr[2])
        mask_b.append(arr[3])
        abc_b.append(np.array(s.lattice.abc, np.float32))

    out_ids: List[str] = []
    Ms, Ss, Cs, Ls, Ts = [], [], [], [], []
    for c0 in range(0, len(keep_idx), chunk):
        sl = slice(c0, c0 + chunk)
        M, S = voxelize_batch(
            jnp.asarray(np.stack(sites_b[sl])),
            jnp.asarray(np.stack(z_b[sl])),
            jnp.asarray(np.stack(sig_b[sl])),
            jnp.asarray(np.stack(mask_b[sl])),
            jnp.asarray(np.stack(abc_b[sl])),
            grid,
            label_frac=cfg.label_frac,
        )
        Ms.append(np.asarray(M, np.float32))
        Ss.append(np.asarray(S).astype(np.uint8))
        ks = range(*sl.indices(len(keep_idx)))
        Cs.append(
            coordinate_grids_np(np.stack([abc_b[k] for k in ks]), grid)
        )
        for k in ks:
            i = keep_idx[k]
            Ls.append(
                np.array(structures[i].lattice.parameters, np.float32)
            )
            Ts.append(np.float32(targets[i]))
            out_ids.append(ids[i])

    if not out_ids:
        empty_shape = (0,) + grid.shape
        return [], {
            "density": np.zeros(empty_shape, np.float32),
            "coords": np.zeros(empty_shape + (3,), np.float32),
            "species": np.zeros(empty_shape, np.uint8),
            "lattice": np.zeros((0, 6), np.float32),
            "target": np.zeros((0,), np.float32),
            "sites": np.zeros((0, cfg.site_pad, 3), np.float32),
            "site_z": np.zeros((0, cfg.site_pad), np.float32),
        }

    M = np.concatenate(Ms)
    S = np.concatenate(Ss)
    C = np.concatenate(Cs)
    L = np.stack(Ls)
    T = np.asarray(Ts, np.float32)
    true_sites = np.stack(sites_b).astype(np.float32)
    true_z = (np.stack(z_b) * np.stack(mask_b)).astype(np.float32)

    if n_rot:
        rng = np.random.default_rng(seed + 1)
        aM, aS, aC = [M], [S], [C]
        aL, aT = [L], [T]
        aSites, aZ = [true_sites], [true_z]
        all_ids = list(out_ids)
        for i in range(len(out_ids)):
            for r in range(n_rot):
                m, s_, c = M[i], S[i], C[i]
                for axes_i in rng.integers(0, len(AXES_CHOICES), size=3):
                    ax = AXES_CHOICES[axes_i]
                    m = np.rot90(m, 1, axes=ax)
                    s_ = np.rot90(s_, 1, axes=ax)
                    c = np.rot90(c, 1, axes=ax)
                aM.append(m[None]); aS.append(s_[None]); aC.append(c[None])
                aL.append(L[i][None]); aT.append(T[i][None])
                # unrotated-frame ground truth (eval splits use n_rot=0)
                aSites.append(true_sites[i][None]); aZ.append(true_z[i][None])
                all_ids.append(f"{out_ids[i]}_rot_{r}")
        M, S, C = np.concatenate(aM), np.concatenate(aS), np.concatenate(aC)
        L, T = np.concatenate(aL), np.concatenate(aT)
        true_sites = np.concatenate(aSites); true_z = np.concatenate(aZ)
        out_ids = all_ids

    return out_ids, {
        "density": M, "coords": C, "species": S, "lattice": L, "target": T,
        "sites": true_sites, "site_z": true_z,
    }


def build_from_cifs(
    cif_dir: str,
    out_dir: str,
    targets_csv: Optional[str] = None,
    target_column: str = "formation_energy_per_atom",
    cfg: VoxelizerConfig = VoxelizerConfig(),
    n_rot: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> GridDataset:
    """Parse + voxelize every .cif in a directory into a packed dataset.

    Multi-host: each process takes files where i % process_count ==
    process_index and writes ``part-<index>/`` under out_dir.
    """
    import jax

    pidx = process_index if process_index is not None else jax.process_index()
    pcount = process_count if process_count is not None else jax.process_count()

    target_map: Dict[str, float] = {}
    if targets_csv:
        import csv

        with open(targets_csv) as f:
            for row in csv.DictReader(f):
                key = row.get("task_id") or row.get("id") or row.get("material_id")
                if key is not None and row.get(target_column) not in (None, ""):
                    target_map[key] = float(row[target_column])

    from icsg3d_tpu.utils.timeout import TimeoutError_, run_with_timeout

    files = sorted(
        f for f in os.listdir(cif_dir) if f.endswith(".cif")
    )
    structures, ids, targets = [], [], []
    for i, fname in enumerate(files):
        if i % pcount != pidx:
            continue  # create_matrices.py:107 rank stride
        sid = fname[: -len(".cif")]  # real suffix strip (not str.strip)
        try:
            # 120s parse budget like the reference's func_timeout guard
            # around create_crystal (utils.py:147)
            s = run_with_timeout(
                read_cif, 120.0, os.path.join(cif_dir, fname)
            )
        except (Exception, TimeoutError_):
            continue  # skip malformed files (create_matrices.py:211-214)
        structures.append(s)
        ids.append(sid)
        targets.append(target_map.get(sid, 0.0))

    out_ids, arrays = voxelize_structures(
        structures, ids, targets, cfg=cfg, n_rot=n_rot
    )
    dest = out_dir if pcount == 1 else os.path.join(out_dir, f"part-{pidx}")
    return GridDataset.write(dest, out_ids, arrays)


def merge_parts(out_dir: str) -> GridDataset:
    """Combine part-<k>/ datasets written by a multi-host run."""
    parts = sorted(
        d for d in os.listdir(out_dir) if d.startswith("part-")
    )
    if not parts:
        return GridDataset(out_dir)
    dsets = [GridDataset(os.path.join(out_dir, p), mmap=False) for p in parts]
    ids: List[str] = []
    arrays: Dict[str, np.ndarray] = {}
    for field in FIELDS:
        if all(field in d.arrays for d in dsets):
            arrays[field] = np.concatenate([d.arrays[field] for d in dsets])
    for d in dsets:
        ids.extend(d.ids)
    return GridDataset.write(out_dir, ids, arrays)


def main(argv=None):
    p = argparse.ArgumentParser(description="Build a voxel-grid dataset")
    p.add_argument("--cifs", default=None, help="directory of .cif files")
    p.add_argument("--targets-csv", default=None)
    p.add_argument("--target", default="formation_energy_per_atom")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic structures instead of CIFs")
    p.add_argument("--kinds", default="perovskite",
                   help="synthetic kinds, comma-separated")
    p.add_argument("--out", required=True)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--nrot", type=int, default=10)
    p.add_argument("--sigma-frac", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = VoxelizerConfig(grid=GridSpec(d=args.d), sigma_frac=args.sigma_frac)
    if args.synthetic:
        from icsg3d_tpu.data.synthetic import build_dataset

        ds = build_dataset(
            args.out, n=args.synthetic, seed=args.seed, cfg=cfg,
            n_rot=args.nrot, kinds=tuple(args.kinds.split(",")),
        )
    elif args.cifs:
        ds = build_from_cifs(
            args.cifs, args.out, targets_csv=args.targets_csv,
            target_column=args.target, cfg=cfg, n_rot=args.nrot,
        )
    else:
        p.error("one of --cifs or --synthetic is required")
    print(f"wrote {len(ds)} samples -> {args.out}")


if __name__ == "__main__":
    main()
