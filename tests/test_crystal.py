"""Tests for the standalone crystal stack (elements, lattice, CIF, neighbors)."""

import numpy as np
import pytest

from icsg3d_tpu.crystal import Lattice, Site, Structure, elements
from icsg3d_tpu.crystal.cif import parse_cif, parse_symop, read_cif, structure_to_cif
from icsg3d_tpu.crystal.neighbors import neighbor_list


class TestElements:
    def test_symbol_roundtrip(self):
        for z in range(1, elements.MAX_Z + 1):
            assert elements.symbol_to_z(elements.z_to_symbol(z)) == z

    def test_symbol_with_oxidation_suffix(self):
        assert elements.symbol_to_z("Fe3+") == 26
        assert elements.symbol_to_z("O2-") == 8

    def test_groups_periods(self):
        assert elements.group(1) == 1 and elements.period(1) == 1
        assert elements.group(2) == 18
        assert elements.group(8) == 16 and elements.period(8) == 2
        assert elements.group(26) == 8 and elements.period(26) == 4
        assert elements.group(57) == 3 and elements.period(57) == 6  # La
        assert elements.group(72) == 4  # Hf
        assert elements.group(86) == 18  # Rn

    def test_blocks(self):
        assert elements.block(11) == "s"
        assert elements.block(6) == "p"
        assert elements.block(26) == "d"
        assert elements.block(60) == "f"

    def test_ionic_radius_fallback(self):
        # Noble gases without tabulated ionic radii fall back to 1.20
        assert elements.mean_ionic_radius(2) == pytest.approx(1.20)
        assert elements.mean_ionic_radius(26) < 1.0
        # all radii positive and physically sized
        r = elements.MEAN_IONIC_RADIUS_A[1:]
        assert np.all((r > 0.1) & (r < 2.5))


class TestLattice:
    def test_parameter_roundtrip(self):
        lat = Lattice.from_parameters(5.4, 6.1, 7.9, 88.0, 95.0, 102.0)
        a, b, c, al, be, ga = lat.parameters
        assert (a, b, c) == pytest.approx((5.4, 6.1, 7.9))
        assert (al, be, ga) == pytest.approx((88.0, 95.0, 102.0))

    def test_cartesian_fractional_roundtrip(self, rng):
        lat = Lattice.from_parameters(4.0, 5.0, 6.0, 80.0, 100.0, 110.0)
        frac = rng.random((10, 3))
        assert np.allclose(lat.fractional(lat.cartesian(frac)), frac)

    def test_orthorhombic_volume(self):
        lat = Lattice.from_parameters(2.0, 3.0, 4.0)
        assert lat.volume == pytest.approx(24.0)


class TestSymop:
    def test_identity(self):
        R, t = parse_symop("x, y, z")
        assert np.allclose(R, np.eye(3)) and np.allclose(t, 0)

    def test_rotation_translation(self):
        R, t = parse_symop("-y, x-y, z+1/2")
        frac = np.array([0.1, 0.2, 0.3])
        out = frac @ R.T + t
        assert out == pytest.approx([-0.2, 0.1 - 0.2, 0.8])

    def test_rejects_malicious(self):
        with pytest.raises(ValueError):
            parse_symop("__import__('os'), y, z")


PEROVSKITE_CIF = """\
data_SrTiO3
_symmetry_space_group_name_H-M   'P 1'
_cell_length_a   3.905
_cell_length_b   3.905
_cell_length_c   3.905
_cell_angle_alpha   90.0
_cell_angle_beta   90.0
_cell_angle_gamma   90.0
loop_
 _symmetry_equiv_pos_site_id
 _symmetry_equiv_pos_as_xyz
  1  'x, y, z'
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_symmetry_multiplicity
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 _atom_site_occupancy
  Sr  Sr0  1  0.0  0.0  0.0  1
  Ti  Ti1  1  0.5  0.5  0.5  1
  O   O2   1  0.5  0.5  0.0  1
  O   O3   1  0.5  0.0  0.5  1
  O   O4   1  0.0  0.5  0.5  1
"""

SYMMETRIZED_CIF = """\
data_test
_cell_length_a   4.0
_cell_length_b   4.0
_cell_length_c   4.0
_cell_angle_alpha   90.0
_cell_angle_beta   90.0
_cell_angle_gamma   90.0
loop_
 _symmetry_equiv_pos_site_id
 _symmetry_equiv_pos_as_xyz
  1  'x, y, z'
  2  '-x, -y, -z'
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_symmetry_multiplicity
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 _atom_site_occupancy
  Na  Na0  2  0.25  0.25  0.25  1
"""


class TestCif:
    def test_parse_perovskite(self):
        s = parse_cif(PEROVSKITE_CIF)
        assert len(s) == 5
        assert sorted(s.atomic_numbers.tolist()) == [8, 8, 8, 22, 38]
        assert s.lattice.a == pytest.approx(3.905)

    def test_symops_expand_sites(self):
        s = parse_cif(SYMMETRIZED_CIF)
        # 0.25 and 0.75 positions from the inversion operator
        assert len(s) == 2
        coords = np.sort(s.frac_coords, axis=0)
        assert coords[0] == pytest.approx([0.25, 0.25, 0.25])
        assert coords[1] == pytest.approx([0.75, 0.75, 0.75])

    def test_symop_power_rejected_not_evaled(self):
        # would pass a charset check and hang inside eval
        with pytest.raises(ValueError):
            parse_symop("9**9**9**9, y, z")

    def test_symop_nonaffine_rejected(self):
        with pytest.raises(ValueError):
            parse_symop("x*y, y, z")

    def test_symop_forms(self):
        R, t = parse_symop("1/2+x, -x+2/3, x/2")
        assert t == pytest.approx([0.5, 2.0 / 3.0, 0.0])
        assert R[0] == pytest.approx([1, 0, 0])
        assert R[1] == pytest.approx([-1, 0, 0])
        assert R[2] == pytest.approx([0.5, 0, 0])

    def test_uppercase_label_resolves_sodium(self):
        # 'NA1' must be sodium, not nitrogen (case-sensitive table +
        # first-letter fallback used to give Z=7)
        cif = PEROVSKITE_CIF.replace("  Sr  Sr0", "  NA1 Sr0")
        s = parse_cif(cif)
        assert 11 in s.atomic_numbers.tolist()

    def test_co_occupied_site_kept(self):
        # a second species at the same coords (disordered CIF) must not
        # be dropped by position-only dedup
        cif = PEROVSKITE_CIF.replace(
            "  Ti  Ti1  1  0.5  0.5  0.5  1",
            "  Ti  Ti1  1  0.5  0.5  0.5  0.5\n"
            "  Zr  Zr1  1  0.5  0.5  0.5  0.5",
        )
        s = parse_cif(cif, )
        zs = sorted(s.atomic_numbers.tolist())
        assert 22 in zs and 40 in zs

    def test_unknown_occupancy_marker_defaults(self):
        cif = PEROVSKITE_CIF.replace("  Sr  Sr0  1  0.0  0.0  0.0  1",
                                     "  Sr  Sr0  1  0.0  0.0  0.0  ?")
        s = parse_cif(cif)
        assert len(s) == 5

    def test_unquoted_symop_with_spaces(self):
        cif = SYMMETRIZED_CIF.replace("  2  '-x, -y, -z'", "  2  -x, -y, -z")
        s = parse_cif(cif)
        assert len(s) == 2

    def test_second_data_block_ignored(self):
        two = PEROVSKITE_CIF + "\ndata_other\n_cell_length_a 9.0\n"
        s = parse_cif(two)
        assert len(s) == 5 and s.lattice.a == pytest.approx(3.905)

    def test_semicolon_text_field_skipped(self):
        cif = PEROVSKITE_CIF.replace(
            "data_SrTiO3\n",
            "data_SrTiO3\n_journal_notes\n;\n_cell_length_a 99\nloop_\n;\n",
        )
        s = parse_cif(cif)
        assert s.lattice.a == pytest.approx(3.905)

    def test_missing_fract_column_clear_error(self):
        cif = PEROVSKITE_CIF.replace(" _atom_site_fract_x\n", "")
        with pytest.raises(ValueError, match="fract|atom-site"):
            parse_cif(cif)

    def test_roundtrip(self, tmp_path):
        s = parse_cif(PEROVSKITE_CIF)
        text = structure_to_cif(s, name="SrTiO3")
        s2 = parse_cif(text)
        assert len(s2) == len(s)
        assert np.allclose(
            np.sort(s2.frac_coords, axis=0), np.sort(s.frac_coords, axis=0), atol=1e-6
        )
        p = tmp_path / "x.cif"
        p.write_text(text)
        s3 = read_cif(str(p))
        assert len(s3) == 5


class TestStructure:
    def test_site_arrays_translates_to_origin(self):
        s = parse_cif(SYMMETRIZED_CIF)
        N, z, r = s.site_arrays()
        assert N.min(axis=0) == pytest.approx([0.0, 0.0, 0.0])
        assert set(z.tolist()) == {11.0}
        assert np.all(r > 0)

    def test_is_valid(self):
        lat = Lattice.from_parameters(4.0, 4.0, 4.0)
        good = Structure(lat, [Site(11, np.array([0.0, 0.0, 0.0])),
                               Site(17, np.array([0.5, 0.5, 0.5]))])
        assert good.is_valid()
        bad = Structure(lat, [Site(11, np.array([0.0, 0.0, 0.0])),
                              Site(17, np.array([0.01, 0.0, 0.0]))])
        assert not bad.is_valid()

    def test_formulas(self):
        s = parse_cif(PEROVSKITE_CIF)
        assert s.reduced_formula == "O3SrTi"
        assert s.anonymized_formula() == "ABC3"

    def test_from_cartesian(self):
        s = Structure.from_cartesian(
            (4.0, 4.0, 4.0), [11, 17], [[0, 0, 0], [2, 2, 2]]
        )
        assert np.allclose(s.frac_coords, [[0, 0, 0], [0.5, 0.5, 0.5]])


class TestNeighbors:
    def test_simple_cubic(self):
        # One atom in a cubic cell: 6 nearest neighbors at distance a
        lat = Lattice.from_parameters(3.0, 3.0, 3.0)
        s = Structure(lat, [Site(11, np.array([0.0, 0.0, 0.0]))])
        nbrs = neighbor_list(s, radius=3.5)
        assert len(nbrs) == 1
        dists = [d for d, _ in nbrs[0]]
        assert len(dists) == 6
        assert np.allclose(dists, 3.0)

    def test_rocksalt_counts(self):
        # NaCl rocksalt: each Na has 6 Cl at a/2
        a = 5.64
        lat = Lattice.from_parameters(a, a, a)
        sites = []
        na_fracs = [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)]
        cl_fracs = [(0.5, 0, 0), (0, 0.5, 0), (0, 0, 0.5), (0.5, 0.5, 0.5)]
        for f in na_fracs:
            sites.append(Site(11, np.array(f, dtype=float)))
        for f in cl_fracs:
            sites.append(Site(17, np.array(f, dtype=float)))
        s = Structure(lat, sites)
        nbrs = neighbor_list(s, radius=a / 2 + 0.1)
        for site_nbrs in nbrs:
            assert len(site_nbrs) == 6
            assert np.allclose([d for d, _ in site_nbrs], a / 2, atol=1e-6)

    def test_sorted_by_distance(self):
        lat = Lattice.from_parameters(4.0, 5.0, 6.0)
        s = Structure(lat, [Site(11, np.array([0.0, 0.0, 0.0])),
                            Site(17, np.array([0.5, 0.5, 0.5]))])
        nbrs = neighbor_list(s, radius=8.0)
        for site_nbrs in nbrs:
            d = [x[0] for x in site_nbrs]
            assert d == sorted(d)


class TestCIFEdgeCases:
    def test_uncertainty_suffixes(self):
        """CIF numbers like 1.23(4) carry uncertainty suffixes."""
        from icsg3d_tpu.crystal.cif import _parse_number

        assert _parse_number("1.23(4)") == 1.23
        assert _parse_number("-0.5(12)") == -0.5
        assert _parse_number("4.2e-1(3)") == 0.42

    def test_cif_with_uncertainties_parses(self):
        cif = """
data_test
_cell_length_a 4.20(3)
_cell_length_b 4.20(3)
_cell_length_c 4.20(3)
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _atom_site_type_symbol
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 _atom_site_occupancy
 Na 0.00(1) 0.0 0.0 1.0
 Cl 0.50(2) 0.5 0.5 1.0
"""
        from icsg3d_tpu.crystal.cif import parse_cif

        s = parse_cif(cif)
        assert len(s) == 2
        assert abs(s.lattice.a - 4.2) < 1e-6

    def test_partial_occupancy_ordering(self):
        cif = """
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _atom_site_type_symbol
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 _atom_site_occupancy
 Na 0.0 0.0 0.0 0.7
 K  0.0 0.0 0.0 0.3
 Cl 0.5 0.5 0.5 1.0
"""
        from icsg3d_tpu.crystal.cif import parse_cif

        s = parse_cif(cif)
        ordered = s.order_sites()
        # only the majority-occupancy Na and the full Cl survive ordering
        assert sorted(site.symbol for site in ordered.sites) == ["Cl", "Na"]


class TestCompositionStats:
    """Charge balance + electronegativity helpers (reference
    generate.py:288-296 composition stats)."""

    def test_charge_balance_known_compositions(self):
        from icsg3d_tpu.crystal.elements import is_charge_balanced

        assert is_charge_balanced([11, 17])              # NaCl
        assert is_charge_balanced([20, 22, 8, 8, 8])     # CaTiO3
        assert is_charge_balanced([26, 26, 8, 8, 8])     # Fe2O3
        # mixed valence: Fe3O4 = 2 Fe3+ + 1 Fe2+ (per-atom states)
        assert is_charge_balanced([26, 26, 26, 8, 8, 8, 8])
        assert not is_charge_balanced([11, 11, 17])      # Na2Cl
        assert not is_charge_balanced([2, 8])            # HeO
        assert not is_charge_balanced([])

    def test_average_electronegativity(self):
        from icsg3d_tpu.crystal.elements import average_electronegativity

        # Na 0.93, Cl 3.16 -> mean 2.045
        assert average_electronegativity([11, 17]) == pytest.approx(2.045, abs=0.01)

    def test_oxidation_states_fallback(self):
        from icsg3d_tpu.crystal.elements import oxidation_states

        assert oxidation_states(8) == (-2,)
        assert oxidation_states(999) == (0,)
