"""Standalone crystal-structure stack.

The reference delegated structure handling to pymatgen (CIF parsing,
lattices, sites, neighbor lists: utils.py:148-157, cgcnn/data.py:187-210).
This package provides the equivalents natively so the framework has no
dependency on pymatgen: element property tables, lattice math, a Structure
type, CIF read/write, and periodic neighbor finding.
"""

from icsg3d_tpu.crystal import elements
from icsg3d_tpu.crystal.lattice import Lattice
from icsg3d_tpu.crystal.structure import Site, Structure
from icsg3d_tpu.crystal.cif import read_cif, write_cif
from icsg3d_tpu.crystal.neighbors import neighbor_list

__all__ = [
    "elements",
    "Lattice",
    "Site",
    "Structure",
    "read_cif",
    "write_cif",
    "neighbor_list",
]
