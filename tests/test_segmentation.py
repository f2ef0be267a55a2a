"""Watershed atom-extraction tests on synthetic blobs and real voxelized
structures (round-trip recovery of atom positions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icsg3d_tpu.config import GridSpec, VoxelizerConfig
from icsg3d_tpu.crystal.structure import Site, Structure
from icsg3d_tpu.crystal.lattice import Lattice
from icsg3d_tpu.ops.grid import to_voxel_params, voxel_to_cartesian
from icsg3d_tpu.ops.segmentation import (
    ball,
    centroids,
    convexity,
    label_same_value,
    majority_vote,
    segment_nuclei,
    watershed_clustering,
    watershed_flood,
)
from icsg3d_tpu.ops.voxelize import pad_sites, voxelize


def gaussian_blob(d, center, sigma=1.5):
    g = np.mgrid[:d, :d, :d].astype(float)
    d2 = sum((g[i] - center[i]) ** 2 for i in range(3))
    return np.exp(-d2 / (2 * sigma**2))


class TestPrimitives:
    def test_ball(self):
        b = ball(1)
        assert b.shape == (3, 3, 3)
        assert b.sum() == 7  # center + 6 face neighbors
        assert b[1, 1, 1] == 1

    def test_label_same_value_separates_values(self):
        a = np.zeros((5, 5, 5), int)
        a[0, 0, 0] = 3
        a[0, 0, 1] = 3  # connected, same value -> one label
        a[0, 0, 2] = 7  # touching but different value -> new label
        a[4, 4, 4] = 3  # disconnected -> new label
        lab = label_same_value(a)
        labs = {lab[0, 0, 0], lab[0, 0, 1], lab[0, 0, 2], lab[4, 4, 4]}
        assert lab[0, 0, 0] == lab[0, 0, 1]
        assert len(labs) == 3

    def test_watershed_flood_partitions_by_nearest_marker(self):
        elev = np.zeros((1, 1, 10))
        markers = np.zeros((1, 1, 10), int)
        markers[0, 0, 0] = 2
        markers[0, 0, 9] = 3
        out = watershed_flood(elev, markers)
        assert np.all(out[0, 0, :5] == 2)
        assert np.all(out[0, 0, 5:] == 3)

    def test_convexity_solid_cube(self):
        m = np.zeros((8, 8, 8))
        m[2:6, 2:6, 2:6] = 1
        assert convexity(m) == pytest.approx(1.0, abs=0.05)

    def test_convexity_hollow_l_shape(self):
        m = np.zeros((10, 10, 10))
        m[1:9, 1:3, 1:3] = 1
        m[1:3, 1:9, 1:3] = 1  # L-shape: hull fills the corner
        assert convexity(m) < 0.8

    def test_majority_vote(self):
        S = np.zeros((4, 4, 4))
        R = np.zeros((4, 4, 4))
        R[:2] = 1
        S[0] = 8
        S[1, 0, 0] = 26
        assert majority_vote(S, R, 1) == 8
        assert majority_vote(S, R, 2) == 0


class TestSegmentNuclei:
    def test_single_blob_single_atom(self):
        d = 16
        M = gaussian_blob(d, (8, 8, 8))
        Sb = (M > 0.1).astype(int)
        S = np.where(Sb, 26, 0)
        R = segment_nuclei(Sb, S, M)
        labels = np.unique(R)
        assert len(labels) == 2  # background + one region
        atoms, means = centroids(S, R)
        assert atoms == [26]
        assert np.allclose(means[0], [8, 8, 8], atol=0.6)

    def test_two_separate_blobs(self):
        d = 20
        M = gaussian_blob(d, (5, 5, 5)) + gaussian_blob(d, (14, 14, 14))
        Sb = (M > 0.1).astype(int)
        S = np.where(Sb, 8, 0)
        atoms, means = watershed_clustering(M, S, Sb)
        assert len(atoms) == 2
        got = sorted(means.tolist())
        assert np.allclose(got[0], [5, 5, 5], atol=0.8)
        assert np.allclose(got[1], [14, 14, 14], atol=0.8)

    def test_dumbbell_splits(self):
        # two overlapping blobs along x: non-convex union must split
        d = 24
        M = gaussian_blob(d, (8, 12, 12), 2.0) + gaussian_blob(d, (16, 12, 12), 2.0)
        Sb = (M > 0.08).astype(int)
        S = np.where(Sb, 13, 0)
        atoms, means = watershed_clustering(M, S, Sb, min_convexity=0.95)
        assert len(atoms) >= 2
        xs = sorted(m[0] for m in means)
        assert xs[0] < 12 < xs[-1]

    def test_empty_grid(self):
        z = np.zeros((8, 8, 8))
        atoms, means = watershed_clustering(z, z, z)
        assert len(atoms) == 0


class TestRoundTrip:
    def test_voxelize_then_extract_recovers_sites(self):
        """Voxelize a perovskite, extract atoms, compare to true sites."""
        grid = GridSpec(d=32)
        a0 = 4.2
        lattice = Lattice.from_parameters(a0, a0, a0)
        structure = Structure(
            lattice,
            [
                Site(56, np.array([0.1, 0.1, 0.1])),       # Ba
                Site(22, np.array([0.6, 0.6, 0.6])),       # Ti
                Site(8, np.array([0.6, 0.6, 0.1])),        # O
                Site(8, np.array([0.6, 0.1, 0.6])),
                Site(8, np.array([0.1, 0.6, 0.6])),
            ],
        )
        N, z, r = structure.site_arrays()
        cart = lattice.cartesian(N)
        s, zz, ss, mm = pad_sites(cart, z, r, 16)
        abc = np.array(lattice.abc, np.float32)
        M, S = voxelize(s, zz, ss, mm, jnp.asarray(abc), grid)
        M, S = np.asarray(M), np.asarray(S)
        Sb = (S != 0).astype(int)

        atoms, mu = watershed_clustering(M, S, Sb)
        assert sorted(atoms.tolist()) == sorted(z.astype(int).tolist())

        # voxel centroids -> cartesian, compare against the true coords
        dv = np.asarray(to_voxel_params(abc[None], grid))[0]
        pred = np.asarray(
            voxel_to_cartesian(jnp.asarray(mu), abc, dv, grid)
        )
        # match each true site to nearest prediction
        for c_true in cart:
            dmin = np.min(np.linalg.norm(pred - c_true, axis=1))
            assert dmin < 0.6, f"site {c_true} recovered with error {dmin}"
