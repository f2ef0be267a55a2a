"""Device-side atom extraction tests: agreement with the host watershed on
Gaussian density fields, fixed-shape/vmap behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import GridSpec
from icsg3d_tpu.crystal.lattice import Lattice
from icsg3d_tpu.crystal.structure import Site, Structure
from icsg3d_tpu.ops.extract import extract_atoms, extract_atoms_batch
from icsg3d_tpu.ops.segmentation import watershed_clustering
from icsg3d_tpu.ops.voxelize import pad_sites, voxelize


def gaussian_blob(d, center, sigma=1.5):
    g = np.mgrid[:d, :d, :d].astype(float)
    d2 = sum((g[i] - center[i]) ** 2 for i in range(3))
    return np.exp(-d2 / (2 * sigma**2))


class TestExtractAtoms:
    def test_single_blob(self):
        d = 16
        M = gaussian_blob(d, (8, 8, 8))
        Sb = (M > 0.1).astype(np.int32)
        S = np.where(Sb, 26, 0).astype(np.int32)
        atoms, mu, valid = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=8
        )
        atoms, mu, valid = map(np.asarray, (atoms, mu, valid))
        assert valid.sum() == 1
        assert atoms[valid][0] == 26
        assert np.allclose(mu[valid][0], [8, 8, 8], atol=0.6)

    def test_two_blobs(self):
        d = 20
        M = gaussian_blob(d, (5, 5, 5)) + gaussian_blob(d, (14, 14, 14))
        Sb = (M > 0.1).astype(np.int32)
        S = np.where(Sb, 8, 0).astype(np.int32)
        atoms, mu, valid = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=8
        )
        atoms, mu, valid = map(np.asarray, (atoms, mu, valid))
        assert valid.sum() == 2
        got = sorted(mu[valid].tolist())
        assert np.allclose(got[0], [5, 5, 5], atol=0.8)
        assert np.allclose(got[1], [14, 14, 14], atol=0.8)

    def test_empty(self):
        z = jnp.zeros((8, 8, 8))
        atoms, mu, valid = extract_atoms(
            z, z.astype(jnp.int32), z.astype(jnp.int32), max_atoms=4
        )
        assert np.asarray(valid).sum() == 0

    def test_agrees_with_host_watershed_on_structure(self):
        """On a voxelized perovskite the device path and the host watershed
        find the same atoms at the same positions."""
        grid = GridSpec(d=32)
        a0 = 4.2
        lattice = Lattice.from_parameters(a0, a0, a0)
        structure = Structure(
            lattice,
            [
                Site(56, np.array([0.1, 0.1, 0.1])),
                Site(22, np.array([0.6, 0.6, 0.6])),
                Site(8, np.array([0.6, 0.6, 0.1])),
                Site(8, np.array([0.6, 0.1, 0.6])),
                Site(8, np.array([0.1, 0.6, 0.6])),
            ],
        )
        N, z, r = structure.site_arrays()
        cart = lattice.cartesian(N)
        s, zz, ss, mm = pad_sites(cart, z, r, 16)
        abc = np.array(lattice.abc, np.float32)
        M, S = voxelize(s, zz, ss, mm, jnp.asarray(abc), grid)
        M, S = np.asarray(M), np.asarray(S).astype(np.int32)
        Sb = (S != 0).astype(np.int32)

        atoms_h, mu_h = watershed_clustering(M, S, Sb)
        atoms_d, mu_d, valid = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=16
        )
        atoms_d = np.asarray(atoms_d)[np.asarray(valid)]
        mu_d = np.asarray(mu_d)[np.asarray(valid)]

        assert sorted(atoms_d.tolist()) == sorted(atoms_h.tolist())
        # positions agree within a voxel
        for m_h in mu_h:
            dmin = np.min(np.linalg.norm(mu_d - m_h, axis=1))
            assert dmin < 1.0

    def test_batch_vmap(self):
        d = 12
        M = np.stack([gaussian_blob(d, (6, 6, 6)), gaussian_blob(d, (3, 3, 3))])
        Sb = (M > 0.1).astype(np.int32)
        S = np.where(Sb, 13, 0).astype(np.int32)
        atoms, mu, valid = extract_atoms_batch(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=4
        )
        assert np.asarray(atoms).shape == (2, 4)
        assert np.asarray(valid).sum(axis=1).tolist() == [1, 1]


class TestPeakSplitting:
    """split_peaks=True: the device analog of the host watershed's
    erosion/marker split for touching SAME-species blobs
    (watershed.py:98-144) — the round-1 fused-path validity gap."""

    def test_same_species_dumbbell_splits(self):
        # the exact case the plain CC path merges: one connected
        # same-species region with two density maxima
        d = 24
        M = gaussian_blob(d, (8, 12, 12), 2.0) + gaussian_blob(d, (16, 12, 12), 2.0)
        Sb = (M > 0.08).astype(np.int32)
        S = np.where(Sb, 13, 0).astype(np.int32)

        atoms_h, mu_h = watershed_clustering(M, S, Sb, min_convexity=0.95)
        a_merged, _, v_merged = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=8
        )
        a_split, mu_split, v_split = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=8,
            split_peaks=True,
        )
        assert np.asarray(v_merged).sum() == 1        # the old gap
        assert np.asarray(v_split).sum() == len(atoms_h) == 2
        mu_d = np.asarray(mu_split)[np.asarray(v_split)]
        for m_h in mu_h:
            assert np.min(np.linalg.norm(mu_d - m_h, axis=1)) < 1.5

    def test_decoded_like_noisy_grids(self):
        """Parity on NOISY (decoder-like) grids, not clean voxelizer output:
        smooth multiplicative noise + ripples on the density, dilated
        species labels.  Host watershed and split device path must agree on
        atom count for both the merged-pair and the single-atom case."""
        rng = np.random.default_rng(3)
        d = 24
        cases = [
            (gaussian_blob(d, (8, 12, 12), 2.0)
             + gaussian_blob(d, (16, 12, 12), 2.0), 2),
            (gaussian_blob(d, (12, 12, 12), 2.5), 1),
        ]
        g = np.mgrid[:d, :d, :d].astype(float)
        for M0, n_true in cases:
            # low-frequency ripple (decoder artifacts), bounded at 5%
            ripple = sum(
                0.02 * np.sin(2 * np.pi * (g[i] / d) * f + p)
                for i, (f, p) in enumerate(
                    zip((2, 3, 2), rng.uniform(0, 6, 3))
                )
            )
            M = M0 * (1.0 + ripple) + 0.01 * rng.standard_normal((d, d, d))
            M = np.clip(M, 0, None)
            Sb = (M0 > 0.08).astype(np.int32)
            S = np.where(Sb, 13, 0).astype(np.int32)

            atoms_h, _ = watershed_clustering(M, S, Sb, min_convexity=0.95)
            _, _, v_split = extract_atoms(
                jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb),
                max_atoms=8, split_peaks=True,
            )
            assert len(atoms_h) == n_true
            assert np.asarray(v_split).sum() == n_true

    def test_split_keeps_well_separated_structure_parity(self):
        """split_peaks must not change the answer where the plain CC path
        already agreed with the host watershed (voxelized perovskite)."""
        grid = GridSpec(d=32)
        a0 = 4.2
        lattice = Lattice.from_parameters(a0, a0, a0)
        structure = Structure(
            lattice,
            [
                Site(56, np.array([0.1, 0.1, 0.1])),
                Site(22, np.array([0.6, 0.6, 0.6])),
                Site(8, np.array([0.6, 0.6, 0.1])),
                Site(8, np.array([0.6, 0.1, 0.6])),
                Site(8, np.array([0.1, 0.6, 0.6])),
            ],
        )
        N, z, r = structure.site_arrays()
        cart = lattice.cartesian(N)
        s, zz, ss, mm = pad_sites(cart, z, r, 16)
        abc = np.array(lattice.abc, np.float32)
        M, S = voxelize(s, zz, ss, mm, jnp.asarray(abc), grid)
        M, S = np.asarray(M), np.asarray(S).astype(np.int32)
        Sb = (S != 0).astype(np.int32)

        atoms_h, mu_h = watershed_clustering(M, S, Sb)
        atoms_d, mu_d, valid = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=16,
            split_peaks=True,
        )
        atoms_d = np.asarray(atoms_d)[np.asarray(valid)]
        mu_d = np.asarray(mu_d)[np.asarray(valid)]
        assert sorted(atoms_d.tolist()) == sorted(atoms_h.tolist())
        for m_h in mu_h:
            assert np.min(np.linalg.norm(mu_d - m_h, axis=1)) < 1.0

    def test_every_component_keeps_a_seed(self):
        """A small component adjacent to a taller blob of a DIFFERENT
        species must keep its own seed (same-component-masked local max),
        so splitting never loses atoms."""
        d = 20
        heavy = gaussian_blob(d, (8, 10, 10), 2.5) * 5.0
        light = gaussian_blob(d, (13, 10, 10), 1.5)
        M = heavy + light
        S = np.zeros((d, d, d), np.int32)
        S[np.where(heavy > 0.4)] = 22
        S[np.where(light > 0.3)] = 8   # light blob label wins where it's set
        Sb = (S != 0).astype(np.int32)
        atoms, _, valid = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=8,
            split_peaks=True,
        )
        atoms = np.asarray(atoms)[np.asarray(valid)]
        assert sorted(atoms.tolist()) == [8, 22]


class TestAbsorption:
    """absorb_min > 0: fringe species patches inside a larger blob merge
    into the large region — the device analog of the reference's
    binary-blob majority vote (watershed.py:56,158-167), and the measured
    fix for the fused path's overcounting on decoded grids."""

    def test_fringe_patch_absorbed(self):
        d = 24
        den = gaussian_blob(d, (12, 12, 12), 3.0)
        S = np.where(den > 0.1, 26, 0).astype(np.int32)
        S[9:11, 9:12, 9:11] = 8  # ~12-voxel mislabeled fringe
        Sb = (S > 0).astype(np.int32)
        a0, _, v0 = extract_atoms(
            jnp.asarray(den), jnp.asarray(S), jnp.asarray(Sb)
        )
        a1, mu1, v1 = extract_atoms(
            jnp.asarray(den), jnp.asarray(S), jnp.asarray(Sb), absorb_min=32
        )
        assert np.asarray(v0).sum() == 2      # the old overcount
        assert np.asarray(v1).sum() == 1
        assert np.asarray(a1)[np.asarray(v1)][0] == 26
        # centroid includes the absorbed voxels (host includes them too)
        assert np.allclose(
            np.asarray(mu1)[np.asarray(v1)][0], [12, 12, 12], atol=1.0
        )

    def test_isolated_small_atom_survives(self):
        d = 24
        S = np.zeros((d, d, d), np.int32)
        S[2:5, 2:5, 2:5] = 8                  # 27 voxels < absorb_min
        S[14:22, 14:22, 14:22] = 26
        den = gaussian_blob(d, (17, 17, 17), 3.0) + 0.3 * gaussian_blob(
            d, (3, 3, 3), 1.2
        )
        Sb = (S > 0).astype(np.int32)
        a, _, v = extract_atoms(
            jnp.asarray(den), jnp.asarray(S), jnp.asarray(Sb), absorb_min=32
        )
        assert sorted(np.asarray(a)[np.asarray(v)].tolist()) == [8, 26]

    def test_two_large_regions_both_kept(self):
        d = 24
        S = np.zeros((d, d, d), np.int32)
        S[4:12, 8:16, 8:16] = 22
        S[12:20, 8:16, 8:16] = 8
        den = gaussian_blob(d, (8, 12, 12)) + gaussian_blob(d, (16, 12, 12))
        Sb = (S > 0).astype(np.int32)
        a, _, v = extract_atoms(
            jnp.asarray(den), jnp.asarray(S), jnp.asarray(Sb), absorb_min=32
        )
        assert sorted(np.asarray(a)[np.asarray(v)].tolist()) == [8, 22]


class TestBinaryMethod:
    """method="binary": the host-pipeline mirror (binary-blob CC,
    erosion-marker splitting, majority-vote species) — the production
    fused-path method, measured at 1000/1000 atom-count parity with the
    host watershed on the campaign generation population."""

    def test_dumbbell_splits_like_host(self):
        d = 26
        M = gaussian_blob(d, (8, 13, 13), 2.0) + gaussian_blob(d, (17, 13, 13), 2.0)
        Sb = (M > 0.08).astype(np.int32)
        S = np.where(Sb, 13, 0).astype(np.int32)
        atoms_h, mu_h = watershed_clustering(M, S, Sb)
        a, mu, v = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb),
            method="binary", erosion_levels=3,
        )
        v = np.asarray(v)
        assert int(v.sum()) == len(atoms_h) == 2
        mu_d = np.asarray(mu)[v]
        for m_h in mu_h:
            assert np.min(np.linalg.norm(mu_d - m_h, axis=1)) < 1.5

    def test_species_confused_blob_majority_voted(self):
        """A single blob whose voxels the segmenter splits between two
        confusable species is ONE atom of the majority species — the
        reference's vote (watershed.py:158-167), and the measured cause of
        the round-1 fused overcounting."""
        d = 24
        M = gaussian_blob(d, (12, 12, 12), 3.0)
        Sb = (M > 0.08).astype(np.int32)
        S = np.where(Sb, 26, 0).astype(np.int32)
        rng = np.random.default_rng(0)
        S[(rng.random(S.shape) < 0.3) & (Sb > 0)] = 25
        atoms_h, _ = watershed_clustering(M, S, Sb)
        a, _, v = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb),
            method="binary", erosion_levels=3,
        )
        v = np.asarray(v)
        assert int(v.sum()) == len(atoms_h) == 1
        assert np.asarray(a)[v][0] == atoms_h[0] == 26

    def test_single_blob_never_oversplits(self):
        d = 24
        M = gaussian_blob(d, (12, 12, 12), 3.5)
        Sb = (M > 0.08).astype(np.int32)
        S = np.where(Sb, 8, 0).astype(np.int32)
        _, _, v = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb),
            method="binary", erosion_levels=3,
        )
        assert int(np.asarray(v).sum()) == 1

    def test_structure_parity(self):
        grid = GridSpec(d=32)
        a0 = 4.2
        lattice = Lattice.from_parameters(a0, a0, a0)
        structure = Structure(
            lattice,
            [
                Site(56, np.array([0.1, 0.1, 0.1])),
                Site(22, np.array([0.6, 0.6, 0.6])),
                Site(8, np.array([0.6, 0.6, 0.1])),
                Site(8, np.array([0.6, 0.1, 0.6])),
                Site(8, np.array([0.1, 0.6, 0.6])),
            ],
        )
        N, z, r = structure.site_arrays()
        cart = lattice.cartesian(N)
        s, zz, ss, mm = pad_sites(cart, z, r, 16)
        abc = np.array(lattice.abc, np.float32)
        M, S = voxelize(s, zz, ss, mm, jnp.asarray(abc), grid)
        M, S = np.asarray(M), np.asarray(S).astype(np.int32)
        Sb = (S != 0).astype(np.int32)
        atoms_h, mu_h = watershed_clustering(M, S, Sb)
        a, mu, v = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=16,
            method="binary", erosion_levels=3,
        )
        v = np.asarray(v)
        assert sorted(np.asarray(a)[v].tolist()) == sorted(atoms_h.tolist())
        mu_d = np.asarray(mu)[v]
        for m_h in mu_h:
            assert np.min(np.linalg.norm(mu_d - m_h, axis=1)) < 1.2


class TestModeFilter:
    def test_denoises_speckled_labels(self, rng=None):
        """Random label speckle inside a blob gets voted back to the majority;
        CC then finds one region instead of many fragments."""
        import numpy as np
        from icsg3d_tpu.ops.extract import extract_atoms

        rng = np.random.default_rng(0)
        d = 16
        M = gaussian_blob(d, (8, 8, 8), 2.5)
        Sb = (M > 0.1).astype(np.int32)
        S = np.where(Sb, 26, 0).astype(np.int32)
        # speckle 15% of blob voxels with a wrong label
        idx = np.argwhere(Sb > 0)
        flip = idx[rng.random(len(idx)) < 0.15]
        S[flip[:, 0], flip[:, 1], flip[:, 2]] = 8

        atoms_raw, _, valid_raw = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=16
        )
        atoms_sm, mu_sm, valid_sm = extract_atoms(
            jnp.asarray(M), jnp.asarray(S), jnp.asarray(Sb), max_atoms=16,
            smooth_classes=95,
        )
        assert np.asarray(valid_sm).sum() == 1
        assert np.asarray(atoms_sm)[np.asarray(valid_sm)][0] == 26
        # smoothing strictly reduces fragmentation
        assert np.asarray(valid_sm).sum() <= np.asarray(valid_raw).sum()

    def test_mode_filter_preserves_clean_labels(self):
        import numpy as np
        from icsg3d_tpu.ops.extract import mode_filter

        S = np.zeros((8, 8, 8), np.int32)
        S[2:5, 2:5, 2:5] = 13
        out = np.asarray(mode_filter(jnp.asarray(S), num_classes=20))
        # interior keeps its label; the filter may dilate by <=1 voxel at
        # edges (neighborhood majority) but never invents other labels
        assert set(np.unique(out)) <= {0, 13}
        assert np.all(out[3, 3, 3] == 13)
