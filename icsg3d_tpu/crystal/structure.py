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
        """Per-symbol atom counts, occupancy-weighted (pymatgen's
        Composition semantics): an unordered Na0.7/K0.3 site contributes
        fractionally, so the formula agrees with the per-site occupancy
        column structure_to_cif writes.  Ordered structures (occupancy 1)
        give plain integer counts."""
        comp: Counter = Counter()
        for site in self.sites:
            comp[site.symbol] += site.occupancy
        return Counter(
            {k: int(v) if abs(v - round(v)) < 1e-6 else v
             for k, v in comp.items()}
        )

    @property
    def formula(self) -> str:
        comp = self.composition
        return " ".join(f"{sym}{comp[sym]:g}" for sym in sorted(comp))

    @property
    def reduced_formula(self) -> str:
        comp = self.composition
        vals = list(comp.values())
        if any(not isinstance(v, int) for v in vals):
            # fractional (unordered) compositions have no integer gcd
            return self.formula.replace(" ", "")
        counts = np.array(vals, dtype=int)
        g = int(np.gcd.reduce(counts)) if len(counts) else 1
        return "".join(
            f"{sym}{comp[sym] // g if comp[sym] // g > 1 else ''}"
            for sym in sorted(comp)
        )

    def anonymized_formula(self) -> str:
        comp = self.composition
        counts = sorted(comp.values())
        if any(not isinstance(v, int) for v in counts):
            counts = [max(1, int(round(v))) for v in counts]
        g = int(np.gcd.reduce(np.array(counts))) if counts else 1
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        parts = []
        for letter, n in zip(letters, counts):
            n = n // g
            parts.append(f"{letter}{n if n > 1 else ''}")
        return "".join(parts)

    def average_electronegativity(self) -> float:
        return elements.average_electronegativity(self.atomic_numbers)

    # -- geometry / validity -------------------------------------------------

    def _image_scan(self, cart: np.ndarray, n: np.ndarray) -> float:
        best = np.inf
        mat = self.lattice.matrix
        for i in range(-n[0], n[0] + 1):
            for j in range(-n[1], n[1] + 1):
                for k in range(-n[2], n[2] + 1):
                    other = cart + np.array([i, j, k], float) @ mat
                    d = np.linalg.norm(
                        cart[:, None, :] - other[None, :, :], axis=-1
                    )
                    if i == j == k == 0:
                        np.fill_diagonal(d, np.inf)
                    best = min(best, float(d.min()))
        return best

    def min_interatomic_distance(self) -> float:
        """Minimum pairwise distance including periodic images.

        A single-site structure is NOT a special case: its minimum distance
        is the distance to its own periodic images (the shortest lattice
        translation).  A first +-1-image scan gives an upper bound d0;
        highly skewed / non-reduced cells can hide a closer image beyond
        +-1, so the scan widens to ceil(d0 / h_i) images per axis (h_i =
        the cell's perpendicular heights), capped at 4 per axis.
        """
        if len(self.sites) == 0:
            return np.inf
        frac = self.frac_coords % 1.0
        cart = self.lattice.cartesian(frac)
        ones = np.ones(3, int)
        d0 = self._image_scan(cart, ones)
        heights = self.lattice.plane_spacings()
        n = np.minimum(np.ceil(d0 / heights).astype(int), 4)
        if (n <= 1).all():
            return d0
        return self._image_scan(cart, np.maximum(n, 1))

    def is_valid(self, tol: float = 0.5) -> bool:
        """True when all interatomic distances exceed ``tol`` Angstrom.

        Based on pymatgen's Structure.is_valid (generate.py:262), with two
        deliberate differences: a single-site structure is judged by its
        shortest lattice translation (pymatgen returns True
        unconditionally), and self-image distances count for every site —
        both stricter, never looser.
        """
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
        as a documented divergence for partially-occupied CIFs.  Sites that
        CO-OCCUPY one position (same coordinates within 1e-3, e.g. a
        Na0.5/K0.5 split site) collapse to the single highest-occupancy
        species — keeping both produced coincident atoms that double-
        deposit density and always fail is_valid.
        """
        # group co-occupying sites by wrapped position
        groups: dict = {}
        for idx, site in enumerate(self.sites):
            key = tuple(np.round(site.frac_coords % 1.0, 3))
            groups.setdefault(key, []).append(idx)
        kept = []
        for key in sorted(groups):
            members = groups[key]
            # highest occupancy wins; ties break on site order
            winner = max(members, key=lambda i: (self.sites[i].occupancy, -i))
            w = self.sites[winner]
            if w.occupancy >= min_occupancy:
                kept.append(Site(w.z, w.frac_coords.copy(), 1.0))
        return Structure(self.lattice, kept)

    def __repr__(self):
        return f"Structure({self.formula}, {self.lattice!r}, n_sites={len(self)})"
