"""Pallas voxelizer kernel vs the pure-JAX reference implementation
(interpret mode on CPU; the real-TPU path is exercised by bench/TPU runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import GridSpec
from icsg3d_tpu.data.synthetic import random_structures
from icsg3d_tpu.ops.pallas_voxelize import voxelize_pallas, voxelize_pallas_batch
from icsg3d_tpu.ops.voxelize import pad_sites, voxelize


def _structure_arrays(seed, site_pad=128):
    s = random_structures(1, seed=seed, kinds=("perovskite", "rocksalt"))[0]
    N, z, r = s.site_arrays()
    cart = s.lattice.cartesian(N)
    arrs = pad_sites(cart, z, r, site_pad)
    abc = np.array(s.lattice.abc, np.float32)
    return (*arrs, abc)


GRID = GridSpec(d=16)


class TestPallasVoxelizer:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_jax_reference(self, seed):
        sites, z, sigma, mask, abc = _structure_arrays(seed)
        M_ref, S_ref = voxelize(
            jnp.asarray(sites), jnp.asarray(z), jnp.asarray(sigma),
            jnp.asarray(mask), jnp.asarray(abc), GRID,
        )
        M_pl, S_pl = voxelize_pallas(
            jnp.asarray(sites), jnp.asarray(z), jnp.asarray(sigma),
            jnp.asarray(mask), jnp.asarray(abc), GRID, interpret=True,
        )
        assert np.allclose(np.asarray(M_pl), np.asarray(M_ref), rtol=2e-4, atol=1e-6)
        assert np.array_equal(np.asarray(S_pl), np.asarray(S_ref))

    def test_batch(self):
        arrs = [_structure_arrays(s) for s in (3, 4)]
        stack = [jnp.asarray(np.stack([a[i] for a in arrs])) for i in range(5)]
        M, S = voxelize_pallas_batch(*stack, GRID, interpret=True)
        assert np.asarray(M).shape == (2, 16, 16, 16)
        for b in range(2):
            M_ref, S_ref = voxelize(
                *[jnp.asarray(arrs[b][i]) for i in range(5)], GRID
            )
            assert np.allclose(np.asarray(M[b]), np.asarray(M_ref), rtol=2e-4, atol=1e-6)
            assert np.array_equal(np.asarray(S[b]), np.asarray(S_ref))

    def test_32_grid_tiling(self):
        """32^3 = 32768 voxels -> 16 tiles of 2048; tiled path must agree."""
        grid = GridSpec(d=32)
        sites, z, sigma, mask, abc = _structure_arrays(7)
        M_ref, S_ref = voxelize(
            jnp.asarray(sites), jnp.asarray(z), jnp.asarray(sigma),
            jnp.asarray(mask), jnp.asarray(abc), grid,
        )
        M_pl, S_pl = voxelize_pallas(
            jnp.asarray(sites), jnp.asarray(z), jnp.asarray(sigma),
            jnp.asarray(mask), jnp.asarray(abc), grid, interpret=True,
        )
        assert np.allclose(np.asarray(M_pl), np.asarray(M_ref), rtol=2e-4, atol=1e-6)
        assert np.array_equal(np.asarray(S_pl), np.asarray(S_ref))

    def test_too_many_sites_raises(self):
        sites, z, sigma, mask, abc = _structure_arrays(0, site_pad=200)
        with pytest.raises(ValueError):
            voxelize_pallas(
                jnp.asarray(sites), jnp.asarray(z), jnp.asarray(sigma),
                jnp.asarray(mask), jnp.asarray(abc), GRID, interpret=True,
            )


class TestPallasConv:
    """Fused Conv3D+BN+ReLU kernel (ops/pallas_conv.py) vs the XLA
    composite — interpreter-mode correctness; perf is measured on hardware
    by tools/pallas_conv_bench.py."""

    def test_matches_xla_composite(self):
        from icsg3d_tpu.ops.pallas_conv import (
            conv3d_bn_relu_pallas,
            conv3d_bn_relu_xla,
        )

        rng = np.random.default_rng(0)
        B, D, H, W, C, Co = 2, 6, 8, 8, 8, 8
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Co)) * 0.1, jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, Co), jnp.float32)
        shift = jnp.asarray(rng.normal(size=Co) * 0.1, jnp.float32)
        want = conv3d_bn_relu_xla(x, w, scale, shift)
        got = conv3d_bn_relu_pallas(x, w, scale, shift, interpret=True)
        assert np.max(np.abs(np.asarray(got) - np.asarray(want))) < 1e-4

    def test_depth_boundaries_zero_padded(self):
        from icsg3d_tpu.ops.pallas_conv import (
            conv3d_bn_relu_pallas,
            conv3d_bn_relu_xla,
        )

        # all-ones input exposes padding mistakes at d=0 / d=D-1
        B, D, H, W, C = 1, 4, 8, 8, 8
        x = jnp.ones((B, D, H, W, C), jnp.float32)
        w = jnp.ones((3, 3, 3, C, C), jnp.float32) * 0.01
        scale = jnp.ones((C,), jnp.float32)
        shift = jnp.zeros((C,), jnp.float32)
        want = conv3d_bn_relu_xla(x, w, scale, shift)
        got = conv3d_bn_relu_pallas(x, w, scale, shift, interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)
