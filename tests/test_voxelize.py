"""Parity tests for the on-device voxelizer against a numpy oracle that
implements the reference math exactly (utils.py:88-144)."""

import numpy as np
import pytest
import scipy.ndimage
from itertools import product
from scipy.spatial.distance import cdist

import jax
import jax.numpy as jnp

from icsg3d_tpu.config import GridSpec
from icsg3d_tpu.ops import (
    coordinate_grid,
    random_rotation_3d,
    rotate90,
    to_lattice_params,
    to_voxel_params,
    voxel_centers,
    voxelize,
    voxelize_batch,
)
from icsg3d_tpu.ops.voxelize import pad_sites


# ---------------------------------------------------------------------------
# Oracle: the reference's density_matrix math, transcribed as a test fixture
# (utils.py:98-144) — cdist + the O(V*S) species double loop.
# ---------------------------------------------------------------------------

def oracle_density_matrix(N, z, l, dims=(16, 16, 16), sigma=None, label_frac=1.0,
                          eps_frac=0.25):
    a, b, c = l
    dv = np.array([(a + 2 * a * eps_frac) / dims[0],
                   (b + 2 * b * eps_frac) / dims[1],
                   (c + 2 * c * eps_frac) / dims[2]])
    xc = np.linspace(-a * eps_frac, a + a * eps_frac, dims[0] + 1)[:-1]
    yc = np.linspace(-b * eps_frac, b + b * eps_frac, dims[1] + 1)[:-1]
    zc = np.linspace(-c * eps_frac, c + c * eps_frac, dims[2] + 1)[:-1]
    V = np.array(list(product(xc, yc, zc))) + dv / 2
    D = cdist(V, N)
    S = np.zeros(D.shape)
    for v in range(D.shape[0]):
        for s in range(D.shape[1]):
            if D[v, s] < sigma[s] * label_frac:
                if S[v].sum() > 0:
                    S[v] = 0
                    S[v, np.argmin(D[v])] = 1
                else:
                    S[v, s] = 1
    S = (S @ z).reshape(dims)
    D2 = D ** 2
    zz = z / (sigma ** 3)
    M = ((2 * np.pi) ** -1.5) * (np.exp(-D2 / (2 * sigma ** 2)) @ zz)
    return M.reshape(dims), S


def oracle_coordinate_grid(l, dim=16, eps_frac=0.25):
    x = np.linspace(0, l[0] + 2 * eps_frac * l[0], dim + 1)[:-1]
    y = np.linspace(0, l[1] + 2 * eps_frac * l[1], dim + 1)[:-1]
    z = np.linspace(0, l[2] + 2 * eps_frac * l[2], dim + 1)[:-1]
    return np.array(list(product(x, y, z))).reshape(dim, dim, dim, 3)


def make_structure(rng, nsites=5, abc=(5.0, 6.0, 7.0)):
    N = rng.random((nsites, 3)) * np.array(abc)
    z = rng.integers(1, 90, nsites).astype(float)
    sigma = 0.4 + rng.random(nsites) * 0.8
    return N, z, sigma, np.array(abc)


GRID = GridSpec(d=16)


class TestVoxelCenters:
    def test_matches_oracle(self):
        abc = np.array([5.0, 6.0, 7.0])
        got = np.asarray(voxel_centers(abc, GRID))
        a, b, c = abc
        dv = abc * 1.5 / 16
        xc = np.linspace(-a * 0.25, a * 1.25, 17)[:-1]
        yc = np.linspace(-b * 0.25, b * 1.25, 17)[:-1]
        zc = np.linspace(-c * 0.25, c * 1.25, 17)[:-1]
        want = np.array(list(product(xc, yc, zc))) + dv / 2
        assert np.allclose(got, want, atol=1e-5)

    def test_coordinate_grid_matches_oracle(self):
        abc = [4.2, 5.1, 9.3]
        got = np.asarray(coordinate_grid(abc, GRID))
        want = oracle_coordinate_grid(abc, dim=16)
        assert np.allclose(got, want, atol=1e-5)


class TestVoxelize:
    def test_density_matches_oracle(self, rng):
        N, z, sigma, abc = make_structure(rng)
        M_want, S_want = oracle_density_matrix(N, z, abc, sigma=sigma)
        s, zz, ss, mm = pad_sites(N, z, sigma, site_pad=8)
        M_got, S_got = voxelize(s, zz, ss, mm, jnp.asarray(abc), GRID)
        assert np.allclose(np.asarray(M_got), M_want, rtol=2e-4, atol=1e-6)
        assert np.array_equal(np.asarray(S_got), S_want)

    def test_species_conflict_rule(self):
        # Two overlapping sites: voxels inside both radii take the closer
        # site; voxels inside exactly one radius take that site even when
        # the other site is closer (the reference's quirk, utils.py:120-131).
        N = np.array([[2.0, 2.0, 2.0], [3.2, 2.0, 2.0]])
        z = np.array([10.0, 20.0])
        sigma = np.array([1.5, 0.7])
        abc = np.array([4.0, 4.0, 4.0])
        M_want, S_want = oracle_density_matrix(N, z, abc, sigma=sigma)
        s, zz, ss, mm = pad_sites(N, z, sigma, site_pad=4)
        _, S_got = voxelize(s, zz, ss, mm, jnp.asarray(abc), GRID)
        assert np.array_equal(np.asarray(S_got), S_want)
        assert set(np.unique(S_want)) == {0.0, 10.0, 20.0}

    def test_padding_is_inert(self, rng):
        N, z, sigma, abc = make_structure(rng, nsites=3)
        s8 = pad_sites(N, z, sigma, site_pad=8)
        s32 = pad_sites(N, z, sigma, site_pad=32)
        M8, S8 = voxelize(*s8, jnp.asarray(abc), GRID)
        M32, S32 = voxelize(*s32, jnp.asarray(abc), GRID)
        assert np.allclose(np.asarray(M8), np.asarray(M32), rtol=1e-6)
        assert np.array_equal(np.asarray(S8), np.asarray(S32))

    def test_batched(self, rng):
        batch = []
        for _ in range(3):
            N, z, sigma, abc = make_structure(rng, nsites=4)
            batch.append((pad_sites(N, z, sigma, 8), abc))
        sites = jnp.stack([jnp.asarray(b[0][0]) for b in batch])
        zz = jnp.stack([jnp.asarray(b[0][1]) for b in batch])
        ss = jnp.stack([jnp.asarray(b[0][2]) for b in batch])
        mm = jnp.stack([jnp.asarray(b[0][3]) for b in batch])
        abcs = jnp.stack([jnp.asarray(b[1]) for b in batch])
        M, S = voxelize_batch(sites, zz, ss, mm, abcs, GRID)
        assert M.shape == (3, 16, 16, 16)
        for i, ((s, z_, sg, m), abc) in enumerate(batch):
            Mi, Si = voxelize(s, z_, sg, m, jnp.asarray(abc), GRID)
            assert np.allclose(np.asarray(M[i]), np.asarray(Mi))
            assert np.array_equal(np.asarray(S[i]), np.asarray(Si))

    def test_too_many_sites_raises(self, rng):
        N, z, sigma, _ = make_structure(rng, nsites=9)
        with pytest.raises(ValueError):
            pad_sites(N, z, sigma, site_pad=8)


class TestGridInverses:
    def test_to_lattice_params_matches_reference_math(self):
        # The reference's inverse (utils.py:160-178) recovers a*(1 - 1/d)
        # from an exact coordinate grid — mirrored faithfully here.
        abc = np.array([5.0, 6.0, 7.0])
        p = coordinate_grid(abc, GRID)[None]
        lp = np.asarray(to_lattice_params(p, GRID))
        assert np.allclose(lp[0], abc * (1 - 1 / GRID.d), rtol=1e-5)

    def test_to_voxel_params(self):
        lp = jnp.array([[4.0, 5.0, 6.0]])
        dv = np.asarray(to_voxel_params(lp, GRID))
        assert np.allclose(dv[0], np.array([4.0, 5.0, 6.0]) * 1.5 / 16)


class TestRotations:
    def test_rotate90_matches_scipy(self, rng):
        x = rng.random((8, 8, 8))
        for axes in [(0, 1), (0, 2), (1, 2)]:
            want = scipy.ndimage.rotate(x, 90, axes=axes, mode="nearest",
                                        reshape=False)
            got = np.asarray(rotate90(jnp.asarray(x), axes))
            assert np.allclose(got, want, atol=1e-12)

    def test_rotate90_4d_channels_preserved(self, rng):
        p = rng.random((8, 8, 8, 3))
        want = scipy.ndimage.rotate(p, 90, axes=(0, 1), mode="nearest",
                                    reshape=False)
        got = np.asarray(rotate90(jnp.asarray(p), (0, 1)))
        assert np.allclose(got, want, atol=1e-12)

    def test_random_rotation_preserves_labels_and_mass(self, rng):
        M = rng.random((8, 8, 8))
        S = rng.integers(0, 5, (8, 8, 8)).astype(float)
        p = rng.random((8, 8, 8, 3))
        key = jax.random.PRNGKey(0)
        M2, S2, p2 = random_rotation_3d(key, jnp.asarray(M), jnp.asarray(S),
                                        jnp.asarray(p))
        # exact-label preservation (the reference asserts this, utils.py:221)
        assert np.array_equal(np.unique(np.asarray(S2)), np.unique(S))
        assert np.isclose(float(jnp.sum(M2)), M.sum())
        assert np.isclose(float(jnp.sum(p2)), p.sum())

    def test_different_keys_give_different_rotations(self):
        M = jnp.arange(8.0 ** 3).reshape(8, 8, 8)
        S = jnp.zeros((8, 8, 8))
        p = jnp.zeros((8, 8, 8, 3))
        outs = set()
        for seed in range(8):
            M2, _, _ = random_rotation_3d(jax.random.PRNGKey(seed), M, S, p)
            outs.add(float(jnp.sum(M2 * jnp.arange(8.0 ** 3).reshape(8, 8, 8))))
        assert len(outs) > 1


class TestNaNRobustness:
    def test_voxelizer_finite_on_valid_input(self, rng):
        """NaN never leaks from padding rows (sigma forced positive)."""
        import jax.numpy as jnp
        from icsg3d_tpu.ops.voxelize import voxelize, pad_sites

        N = rng.random((3, 3)) * 4
        z = np.array([8.0, 26.0, 13.0])
        sigma = np.array([1.0, 0.7, 0.6])
        s, zz, ss, mm = pad_sites(N, z, sigma, 8)
        ss[5] = 0.0  # hostile zero sigma in padding
        M, S = voxelize(
            jnp.asarray(s), jnp.asarray(zz), jnp.asarray(ss), jnp.asarray(mm),
            jnp.asarray(np.array([4.0, 4.0, 4.0], np.float32)), GRID,
        )
        assert np.isfinite(np.asarray(M)).all()

    def test_grid_inverse_on_nan_input(self):
        """to_lattice_params propagates NaN (doesn't mask bad decodes)."""
        import jax.numpy as jnp
        from icsg3d_tpu.ops.grid import to_lattice_params

        coords = jnp.full((1, 16, 16, 16, 3), jnp.nan)
        out = np.asarray(to_lattice_params(coords, GRID))
        assert np.isnan(out).all()


class TestCoordinateGridsNp:
    def test_matches_device_coordinate_grid(self):
        from icsg3d_tpu.ops.voxelize import coordinate_grid, coordinate_grids_np

        grid = GridSpec(d=8)
        abc = np.array([[3.7, 4.2, 5.1], [4.0, 4.0, 4.0]], np.float32)
        host = coordinate_grids_np(abc, grid)
        assert host.shape == (2, 8, 8, 8, 3)
        for b in range(2):
            dev = np.asarray(coordinate_grid(abc[b], grid))
            np.testing.assert_allclose(host[b], dev, rtol=1e-6)

    def test_single_vector_reshape(self):
        from icsg3d_tpu.ops.voxelize import coordinate_grids_np

        grid = GridSpec(d=4)
        out = coordinate_grids_np(np.array([3.0, 4.0, 5.0]), grid)
        assert out.shape == (1, 4, 4, 4, 3)
