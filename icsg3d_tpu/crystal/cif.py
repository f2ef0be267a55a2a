"""Minimal CIF reader/writer.

Replaces pymatgen's CifParser/CifWriter for the pipeline's needs
(utils.py:148-157 parses CIFs into structures; generate.py:265-267 writes
generated structures back out).  Handles the symmetrized CIFs served by the
Materials Project: cell parameters, `_symmetry_equiv_pos_as_xyz` operator
loops (applied to the asymmetric unit with deduplication), and atom-site
loops with fractional coordinates and occupancies.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from icsg3d_tpu.crystal import elements
from icsg3d_tpu.crystal.lattice import Lattice
from icsg3d_tpu.crystal.structure import Site, Structure

_NUM_RE = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")
_SYMOP_ALLOWED = re.compile(r"^[xyz0-9+\-*/. ()]+$")


def _parse_number(token: str) -> float:
    """Parse a CIF numeric token, stripping uncertainty suffixes like 1.23(4)."""
    m = _NUM_RE.match(token.strip())
    if not m:
        raise ValueError(f"not a number: {token!r}")
    return float(m.group(0))


def _tokenize_line(line: str) -> List[str]:
    """Split a CIF data line into tokens, honoring quoted strings."""
    return re.findall(r"'[^']*'|\"[^\"]*\"|\S+", line)


def _unquote(tok: str) -> str:
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "'\"":
        return tok[1:-1]
    return tok


def parse_symop(expr: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse one symmetry operator like ``-y, x-y, z+1/2`` into (R, t) with
    new_frac = frac @ R.T + t."""
    parts = [p.strip().lower() for p in expr.split(",")]
    if len(parts) != 3:
        raise ValueError(f"bad symop: {expr!r}")
    R = np.zeros((3, 3))
    t = np.zeros(3)
    basis = np.eye(3)
    for i, p in enumerate(parts):
        if not _SYMOP_ALLOWED.match(p):
            raise ValueError(f"bad symop component: {p!r}")
        # Evaluate the affine expression at (0,0,0) for the translation and
        # at unit vectors for the rotation columns.
        def ev(x, y, z, _p=p):
            return eval(_p, {"__builtins__": {}}, {"x": x, "y": y, "z": z})
        t[i] = ev(0.0, 0.0, 0.0)
        for j in range(3):
            R[i, j] = ev(*basis[j]) - t[i]
    return R, t


def _collect_loops(lines: List[str]):
    """Yield (headers, rows) for each loop_ block plus a dict of scalar tags."""
    scalars: Dict[str, str] = {}
    loops = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.lower() == "loop_":
            i += 1
            headers = []
            while i < n and lines[i].strip().startswith("_"):
                headers.append(lines[i].strip().split()[0].lower())
                i += 1
            rows = []
            while i < n:
                row_line = lines[i].strip()
                if (not row_line or row_line.startswith("#")
                        or row_line.startswith("_")
                        or row_line.lower().startswith(("loop_", "data_"))):
                    break
                toks = _tokenize_line(row_line)
                # CIF rows may wrap; accumulate until we have enough tokens
                while len(toks) < len(headers) and i + 1 < n:
                    nxt = lines[i + 1].strip()
                    if (not nxt or nxt.startswith(("_", "#"))
                            or nxt.lower().startswith(("loop_", "data_"))):
                        break
                    i += 1
                    toks.extend(_tokenize_line(nxt))
                if len(toks) >= len(headers):
                    rows.append(toks[: len(headers)])
                i += 1
            loops.append((headers, rows))
        elif line.startswith("_"):
            toks = _tokenize_line(line)
            key = toks[0].lower()
            if len(toks) > 1:
                scalars[key] = _unquote(" ".join(toks[1:]))
            elif i + 1 < n:
                scalars[key] = _unquote(lines[i + 1].strip())
                i += 1
            i += 1
            continue
        else:
            i += 1
            continue
    return scalars, loops


def parse_cif(text: str, site_tol: float = 1e-3) -> Structure:
    """Parse CIF text into a Structure with all symmetry-equivalent sites."""
    lines = text.splitlines()
    scalars, loops = _collect_loops(lines)

    def cell(tag: str) -> float:
        return _parse_number(scalars[f"_cell_length_{tag}" if tag in "abc"
                                     else f"_cell_angle_{tag}"])

    lattice = Lattice.from_parameters(
        cell("a"), cell("b"), cell("c"),
        cell("alpha"), cell("beta"), cell("gamma"),
    )

    symops: List[Tuple[np.ndarray, np.ndarray]] = []
    site_loop = None
    for headers, rows in loops:
        if any(h.endswith(("equiv_pos_as_xyz", "space_group_symop_operation_xyz"))
               for h in headers):
            col = next(
                k for k, h in enumerate(headers)
                if h.endswith(("equiv_pos_as_xyz", "space_group_symop_operation_xyz"))
            )
            for row in rows:
                symops.append(parse_symop(_unquote(row[col])))
        if any(h == "_atom_site_fract_x" for h in headers):
            site_loop = (headers, rows)
    if not symops:
        symops = [(np.eye(3), np.zeros(3))]
    if site_loop is None:
        raise ValueError("CIF has no atom-site loop")

    headers, rows = site_loop

    def col(name: str) -> Optional[int]:
        try:
            return headers.index(name)
        except ValueError:
            return None

    c_sym = col("_atom_site_type_symbol")
    c_lab = col("_atom_site_label")
    c_x, c_y, c_z = (col(f"_atom_site_fract_{ax}") for ax in "xyz")
    c_occ = col("_atom_site_occupancy")

    sites: List[Site] = []
    positions: List[np.ndarray] = []
    for row in rows:
        raw_sym = _unquote(row[c_sym] if c_sym is not None else row[c_lab])
        sym = re.match(r"[A-Za-z]{1,2}", raw_sym)
        if not sym:
            continue
        try:
            z = elements.symbol_to_z(sym.group(0))
        except KeyError:
            # Two-letter match may shadow a one-letter element (e.g. "O1")
            z = elements.symbol_to_z(sym.group(0)[0])
        frac = np.array([_parse_number(row[c]) for c in (c_x, c_y, c_z)])
        occ = _parse_number(row[c_occ]) if c_occ is not None else 1.0
        for R, t in symops:
            new = (frac @ R.T + t) % 1.0
            new[new > 1.0 - site_tol] = 0.0
            if any(
                np.linalg.norm(((new - p + 0.5) % 1.0) - 0.5) < site_tol
                for p in positions
            ):
                continue
            positions.append(new)
            sites.append(Site(z, new, occ))
    return Structure(lattice, sites)


def read_cif(path: str, ordered: bool = True) -> Structure:
    """Read a CIF file; optionally order disordered structures.

    Mirrors create_crystal (utils.py:148-157): parse, and if not ordered,
    apply an ordering transformation.
    """
    with open(path) as f:
        structure = parse_cif(f.read())
    if ordered and not structure.is_ordered():
        structure = structure.order_sites()
    return structure


def structure_to_cif(structure: Structure, name: str = "generated") -> str:
    """Serialize a Structure to P1 CIF text (CifWriter equivalent)."""
    lat = structure.lattice
    a, b, c, alpha, beta, gamma = lat.parameters
    lines = [
        "# generated by icsg3d-tpu",
        f"data_{name.replace(' ', '_')}",
        "_symmetry_space_group_name_H-M   'P 1'",
        f"_cell_length_a   {a:.8f}",
        f"_cell_length_b   {b:.8f}",
        f"_cell_length_c   {c:.8f}",
        f"_cell_angle_alpha   {alpha:.8f}",
        f"_cell_angle_beta   {beta:.8f}",
        f"_cell_angle_gamma   {gamma:.8f}",
        "_symmetry_Int_Tables_number   1",
        f"_chemical_formula_sum   '{structure.formula}'",
        f"_cell_volume   {lat.volume:.8f}",
        "loop_",
        " _symmetry_equiv_pos_site_id",
        " _symmetry_equiv_pos_as_xyz",
        "  1  'x, y, z'",
        "loop_",
        " _atom_site_type_symbol",
        " _atom_site_label",
        " _atom_site_symmetry_multiplicity",
        " _atom_site_fract_x",
        " _atom_site_fract_y",
        " _atom_site_fract_z",
        " _atom_site_occupancy",
    ]
    counts: Dict[str, int] = {}
    for site in structure.sites:
        sym = site.symbol
        counts[sym] = counts.get(sym, 0) + 1
        f = site.frac_coords % 1.0
        lines.append(
            f"  {sym}  {sym}{counts[sym] - 1}  1  "
            f"{f[0]:.8f}  {f[1]:.8f}  {f[2]:.8f}  {site.occupancy:g}"
        )
    return "\n".join(lines) + "\n"


def write_cif(structure: Structure, path: str, name: str = "generated") -> None:
    with open(path, "w") as f:
        f.write(structure_to_cif(structure, name=name))
