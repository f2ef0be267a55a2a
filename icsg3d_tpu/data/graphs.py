"""Crystal-graph featurization for the CGCNN property regressor.

Reference: cgcnn/data.py.  A structure becomes fixed-shape padded arrays so
batches of graphs run as one XLA program:

    atom_fea   (max_atoms, 93)                element feature vectors
    nbr_dist   (max_atoms, max_neighbors)     neighbor distances (Angstrom)
    nbr_idx    (max_atoms, max_neighbors)     neighbor site indices
    atom_mask  (max_atoms,)                   1 for real atoms

Differences from the reference, by design:
- The Gaussian basis expansion of distances (cgcnn/data.py:75-112) moves
  on-device (`gaussian_expand`, a jittable op) instead of being precomputed
  per sample on the host — it is pure elementwise math and fusing it into
  the model kernel removes a (50, 12, 41) float per sample of host traffic.
- The mask is a per-atom vector, not the reference's redundant
  (50, 12, 128) int tensor (cgcnn/data.py:241-248); the model broadcasts it.
- Under-coordinated sites pad with distance = radius + 1 and index 0,
  exactly like cgcnn/data.py:195-202.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.crystal.neighbors import neighbor_list
from icsg3d_tpu.crystal.structure import Structure
from icsg3d_tpu.data.atom_features import atom_feature_table


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    """Static graph shapes (reference: cgcnn/cgcnn.py:149-152 defaults)."""

    max_atoms: int = 50
    max_neighbors: int = 12
    radius: float = 8.0
    dmin: float = 0.0
    step: float = 0.2

    def __post_init__(self):
        # reference GaussianDistance.__init__ asserts these
        # (cgcnn/data.py:91-92); failing late means a (..., 0)-wide bond
        # basis silently trains with zero bond features
        if self.step <= 0:
            raise ValueError(f"step must be positive, got {self.step}")
        if self.dmin >= self.radius:
            raise ValueError(
                f"dmin {self.dmin} must be < radius {self.radius}"
            )
        if self.radius - self.dmin <= self.step:
            raise ValueError("radius - dmin must exceed step")

    @property
    def num_bond_features(self) -> int:
        # single source of truth: the actual basis width (a closed-form
        # round() disagreed with np.arange for non-commensurate
        # (radius-dmin)/step, e.g. radius=4 step=0.3 -> 15 centers, 14
        # claimed)
        return len(self.filter_centers)

    @property
    def filter_centers(self) -> np.ndarray:
        return np.arange(
            self.dmin, self.radius + self.step, self.step, dtype=np.float32
        )


def gaussian_expand(distances, spec: GraphSpec):
    """Expand distances on a Gaussian basis — jittable, runs on device.

    Matches GaussianDistance.expand (cgcnn/data.py:95-112): centers
    arange(dmin, dmax+step, step), variance = step**2 (sic: the reference
    divides by var^2 with var=step).
    """
    centers = jnp.asarray(spec.filter_centers)
    d = jnp.asarray(distances)[..., None]
    return jnp.exp(-((d - centers) ** 2) / (spec.step**2))


def featurize_structure(
    structure: Structure, spec: GraphSpec = GraphSpec()
) -> Dict[str, np.ndarray]:
    """One structure -> padded graph arrays (host side; neighbor search)."""
    n = len(structure)
    if n == 0 or n > spec.max_atoms:
        raise ValueError(f"structure has {n} sites, max {spec.max_atoms}")

    table = atom_feature_table()
    atom_fea = np.zeros((spec.max_atoms, table.shape[1]), dtype=np.float32)
    atom_fea[:n] = table[structure.atomic_numbers]

    nbr_dist = np.full(
        (spec.max_atoms, spec.max_neighbors), spec.radius + 1.0, dtype=np.float32
    )
    nbr_idx = np.zeros((spec.max_atoms, spec.max_neighbors), dtype=np.int32)
    # Padded atom rows point at the last slot like the reference
    # (cgcnn/data.py:237: idx_padding = pad_dim - 1).
    nbr_idx[n:] = spec.max_atoms - 1

    for i, nbrs in enumerate(neighbor_list(structure, spec.radius)):
        take = nbrs[: spec.max_neighbors]
        for j, (dist, idx) in enumerate(take):
            nbr_dist[i, j] = dist
            nbr_idx[i, j] = idx

    atom_mask = np.zeros(spec.max_atoms, dtype=np.float32)
    atom_mask[:n] = 1.0
    return {
        "atom_fea": atom_fea,
        "nbr_dist": nbr_dist,
        "nbr_idx": nbr_idx,
        "atom_mask": atom_mask,
    }


def featurize_batch(
    structures: Sequence[Structure], spec: GraphSpec = GraphSpec()
) -> Dict[str, np.ndarray]:
    """Stack per-structure graph arrays into batch arrays."""
    if not structures:
        raise ValueError(
            "featurize_batch got no structures (empty CIF dir, every "
            "structure filtered by max_atoms, or no target matches)"
        )
    feats: List[Dict[str, np.ndarray]] = [
        featurize_structure(s, spec) for s in structures
    ]
    return {k: np.stack([f[k] for f in feats]) for k in feats[0]}
