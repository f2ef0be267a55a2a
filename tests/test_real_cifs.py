"""Realistic third-party CIF corpus: parse -> oracle -> voxelize -> dataset.

VERDICT r3 item 2: until now the in-house CIF parser had only ever been fed
its own writer's output or hand-authored P1 strings.  This suite runs it on
tests/fixtures/real_cifs/ — 20 published crystal structures transcribed
into genuine third-party formats (ICSD-style full symmetry-operator loops
with standard-uncertainty suffixes, Biso/ADP columns and semicolon text
fields; Materials-Project/pymatgen-style P1 files; disordered co-occupied
sites; oxidation-decorated symbols; label-only loops; unquoted packed
symops; a multi-block two-phase file) — and checks every parse against
hard crystallographic oracles: the known conventional-cell composition,
lattice constants, and nearest-neighbor bond lengths.

Corpus provenance/emitter: tools/make_real_cif_fixtures.py.
Reference behaviors matched: CifParser.get_structures()[0] multi-block
semantics, create_crystal ordering of disordered structures
(utils.py:148-157).
"""

import json
import os

import numpy as np
import pytest

from icsg3d_tpu.config import GridSpec, VoxelizerConfig
from icsg3d_tpu.crystal.cif import read_cif
from icsg3d_tpu.crystal.neighbors import neighbor_list
from icsg3d_tpu.data.voxel_build import voxelize_structures
from icsg3d_tpu.crystal.elements import symbol_to_z

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "real_cifs")
with open(os.path.join(FIXDIR, "oracles.json")) as f:
    ORACLES = json.load(f)
NAMES = sorted(n for n in ORACLES)


def _counts(structure):
    c = {}
    for s in structure.sites:
        c[s.symbol] = c.get(s.symbol, 0) + 1
    return c


class TestParseOracles:
    @pytest.mark.parametrize("name", NAMES)
    def test_composition_and_lattice(self, name):
        oracle = ORACLES[name]
        s = read_cif(os.path.join(FIXDIR, name), ordered=False)
        assert _counts(s) == oracle["counts"], name
        abc = np.linalg.norm(s.lattice.matrix, axis=1)
        assert abc[0] == pytest.approx(oracle["a"], abs=2e-3)
        if "c" in oracle:
            assert abc[2] == pytest.approx(oracle["c"], abs=2e-3)

    @pytest.mark.parametrize(
        "name",
        [n for n in NAMES if "ordered_counts" in ORACLES[n]],
    )
    def test_disordered_structures_order(self, name):
        """Partial-occupancy sites collapse like the reference's ordering
        transformation: highest occupancy wins, sub-0.5 vacancies drop."""
        oracle = ORACLES[name]
        s = read_cif(os.path.join(FIXDIR, name), ordered=False)
        assert not s.is_ordered()
        ordered = read_cif(os.path.join(FIXDIR, name), ordered=True)
        assert ordered.is_ordered()
        assert _counts(ordered) == oracle["ordered_counts"], name

    @pytest.mark.parametrize(
        "name", [n for n in NAMES if "nn" in ORACLES[n]]
    )
    def test_bond_lengths(self, name):
        """Nearest-neighbor distances match the published bond lengths —
        a geometry-level oracle (symops + lattice + dedup all correct)."""
        sym_a, sym_b, dist = ORACLES[name]["nn"]
        s = read_cif(os.path.join(FIXDIR, name))
        nl = neighbor_list(s, radius=3.5)
        checked = 0
        for i, site in enumerate(s.sites):
            if site.symbol != sym_a:
                continue
            partner = [
                d for d, j in nl[i] if s.sites[j].symbol == sym_b
            ]
            assert partner, f"{name}: no {sym_b} neighbor of {sym_a}"
            assert min(partner) == pytest.approx(dist, abs=5e-3), name
            checked += 1
        assert checked

    def test_polymorphs_differ(self):
        """Rutile and anatase (same formula, different structures) must
        produce different atom counts and densities."""
        rutile = read_cif(os.path.join(FIXDIR, "TiO2_rutile_icsd.cif"))
        anatase = read_cif(os.path.join(FIXDIR, "TiO2_anatase_mp.cif"))
        assert len(rutile) == 6 and len(anatase) == 12
        assert rutile.reduced_formula == anatase.reduced_formula

    def test_all_structures_valid(self):
        """Every (ordered) fixture passes the pipeline's physicality gate:
        no interatomic distance below 0.5 A."""
        for name in NAMES:
            s = read_cif(os.path.join(FIXDIR, name))
            assert s.is_valid(tol=0.5), name


class TestVoxelizeCorpus:
    def test_end_to_end_dataset(self, tmp_path):
        """parse -> voxelize -> packed GridDataset over the WHOLE corpus
        (the create_matrices.py flow on realistic data)."""
        structures, ids = [], []
        for name in NAMES:
            structures.append(read_cif(os.path.join(FIXDIR, name)))
            ids.append(name[: -len(".cif")])
        cfg = VoxelizerConfig(grid=GridSpec(d=16))
        out_ids, arrays = voxelize_structures(
            structures, ids, [0.0] * len(ids), cfg=cfg, n_rot=0
        )
        assert list(out_ids) == ids  # nothing dropped (all fixtures fit)
        dens = arrays["density"]
        spec = arrays["species"]
        assert np.isfinite(dens).all() and (dens >= 0).all()
        assert dens.max(axis=(1, 2, 3)).min() > 0  # every grid nonempty
        for k, name in enumerate(NAMES):
            allowed = {0} | {
                int(symbol_to_z(site.symbol))
                for site in structures[k].sites
            }
            got = set(np.unique(spec[k]).astype(int).tolist())
            assert got <= allowed, (name, got, allowed)
            assert len(got) > 1, f"{name}: species grid empty"
