"""Structure and Site types.

Replaces the subset of pymatgen Structure the pipeline needs: site
coordinates/species access (utils.py:64-85), validity checking
(generate.py:262), formula/composition strings, and construction from
lattice params + cartesian coordinates (utils.py:225-239).
"""

from __future__ import annotations

import dataclasses
from collections import Counter
from typing import List, Sequence

import numpy as np

from icsg3d_tpu.crystal import elements
from icsg3d_tpu.crystal.lattice import Lattice


@dataclasses.dataclass
class Site:
    z: int                       # atomic number
    frac_coords: np.ndarray      # shape (3,)
    occupancy: float = 1.0

    @property
    def symbol(self) -> str:
        return elements.z_to_symbol(self.z)


class Structure:
    """A periodic crystal structure: a lattice plus sites."""

    def __init__(self, lattice: Lattice, sites: Sequence[Site]):
        self.lattice = lattice
        self.sites: List[Site] = list(sites)

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_cartesian(
        cls,
        lattice_abc,
        species_z,
        cart_coords,
        angles=(90.0, 90.0, 90.0),
    ) -> "Structure":
        """Build from lattice lengths + cartesian coords.

        Mirrors to_pymatgen_structure (utils.py:225-239): sites are placed by
        their cartesian coordinates in an orthogonal frame of the given
        lengths, then the cell angles are applied keeping fractional
        coordinates fixed.
        """
        ortho = Lattice.from_parameters(*lattice_abc, 90.0, 90.0, 90.0)
        frac = ortho.fractional(np.asarray(cart_coords, dtype=float))
        lattice = Lattice.from_parameters(*lattice_abc, *angles)
        sites = [Site(int(z), f) for z, f in zip(species_z, frac)]
        return cls(lattice, sites)

    # -- site accessors ------------------------------------------------------

    def __len__(self) -> int:
        return len(self.sites)

    @property
    def frac_coords(self) -> np.ndarray:
        if not self.sites:
            return np.zeros((0, 3))
        return np.stack([s.frac_coords for s in self.sites])

    @property
    def cart_coords(self) -> np.ndarray:
        return self.lattice.cartesian(self.frac_coords)

    @property
    def atomic_numbers(self) -> np.ndarray:
        return np.array([s.z for s in self.sites], dtype=int)

    def site_arrays(self):
        """(frac_coords translated so the min is at the origin, z, mean ionic
        radii) — the exact contract of get_sites (utils.py:64-85)."""
        N = self.frac_coords.copy()
        z = self.atomic_numbers.astype(float)
        r = np.array([elements.mean_ionic_radius(s.z) for s in self.sites])
        if len(N):
            N = N - N.min(axis=0)
        return N, z, r

    # -- chemistry -----------------------------------------------------------

    @property
    def composition(self) -> Counter:
        return Counter(s.symbol for s in self.sites)

    @property
    def formula(self) -> str:
        comp = self.composition
        return " ".join(f"{sym}{comp[sym]}" for sym in sorted(comp))

    @property
    def reduced_formula(self) -> str:
        comp = self.composition
        counts = np.array(list(comp.values()), dtype=int)
        g = int(np.gcd.reduce(counts)) if len(counts) else 1
        return "".join(
            f"{sym}{comp[sym] // g if comp[sym] // g > 1 else ''}"
            for sym in sorted(comp)
        )

    def anonymized_formula(self) -> str:
        comp = self.composition
        counts = sorted(comp.values())
        g = int(np.gcd.reduce(np.array(counts))) if counts else 1
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        parts = []
        for letter, n in zip(letters, counts):
            n = n // g
            parts.append(f"{letter}{n if n > 1 else ''}")
        return "".join(parts)

    def average_electronegativity(self) -> float:
        vals = [
            elements.ELECTRONEGATIVITY[s.z]
            for s in self.sites
            if not np.isnan(elements.ELECTRONEGATIVITY[s.z])
        ]
        return float(np.mean(vals)) if vals else float("nan")

    # -- geometry / validity -------------------------------------------------

    def min_interatomic_distance(self) -> float:
        """Minimum pairwise distance including periodic images.

        A single-site structure is NOT a special case: its minimum distance
        is the distance to its own periodic images (the shortest lattice
        translation), which the shift loop below computes.
        """
        if len(self.sites) == 0:
            return np.inf
        frac = self.frac_coords % 1.0
        shifts = np.array(
            [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
        )
        cart = self.lattice.cartesian(frac)
        best = np.inf
        for shift in shifts:
            other = self.lattice.cartesian(frac + shift)
            d = np.linalg.norm(cart[:, None, :] - other[None, :, :], axis=-1)
            if (shift == 0).all():
                np.fill_diagonal(d, np.inf)
            best = min(best, float(d.min()) if d.size else np.inf)
        return best

    def is_valid(self, tol: float = 0.5) -> bool:
        """True when all interatomic distances exceed ``tol`` Angstrom —
        pymatgen's Structure.is_valid contract (used at generate.py:262)."""
        if len(self.sites) == 0:
            return False
        return self.min_interatomic_distance() > tol

    def is_ordered(self) -> bool:
        return all(abs(s.occupancy - 1.0) < 1e-6 for s in self.sites)

    def order_sites(self, min_occupancy: float = 0.5) -> "Structure":
        """Deterministic ordering of a disordered structure: keep sites with
        occupancy >= ``min_occupancy`` at full occupancy.

        The reference applied pymatgen's OrderDisorderedStructureTransformation
        (utils.py:148-157); this is a simpler deterministic stand-in, flagged
        as a documented divergence for partially-occupied CIFs.
        """
        kept = [
            Site(s.z, s.frac_coords, 1.0)
            for s in self.sites
            if s.occupancy >= min_occupancy
        ]
        return Structure(self.lattice, kept)

    def __repr__(self):
        return f"Structure({self.formula}, {self.lattice!r}, n_sites={len(self)})"
