"""Mesh/sharding and halo-exchange tests on 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from icsg3d_tpu.parallel import (
    batch_sharding,
    halo_exchange,
    make_mesh,
    shard_batch,
    spatial_shard_conv3d,
)
from icsg3d_tpu.parallel.halo import _conv3d_same


class TestMesh:
    def test_default_mesh_uses_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("data", "spatial")

    def test_2d_mesh(self):
        mesh = make_mesh(n_data=4, n_spatial=2)
        assert mesh.shape["data"] == 4
        assert mesh.shape["spatial"] == 2

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(n_data=64, n_spatial=2)

    def test_shard_batch_places_batch_axis(self):
        mesh = make_mesh(n_data=8)
        batch = {"x": np.zeros((16, 4, 4, 4, 1), np.float32)}
        out = shard_batch(batch, mesh)
        shard_shape = out["x"].sharding.shard_shape(out["x"].shape)
        assert shard_shape[0] == 2  # 16 / 8 devices

    def test_batch_sharding_spatial_dim(self):
        mesh = make_mesh(n_data=4, n_spatial=2)
        s = batch_sharding(mesh, spatial_dim=1)
        assert s.spec == P("data", "spatial")
        s2 = batch_sharding(mesh, spatial_dim=2)
        assert s2.spec == P("data", None, "spatial")


class TestHaloExchange:
    def test_sharded_conv_matches_unsharded(self, rng):
        mesh = make_mesh(n_data=2, n_spatial=4)
        x = jnp.asarray(rng.normal(size=(4, 16, 8, 8, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
        want = _conv3d_same(x, k)
        got = spatial_shard_conv3d(x, k, mesh)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_halo_exchange_values(self):
        # 4 spatial shards of a length-8 depth axis; check halos line up.
        mesh = make_mesh(n_data=1, n_spatial=4)
        x = jnp.arange(8.0).reshape(1, 8, 1, 1, 1)
        from jax import shard_map

        fn = shard_map(
            lambda xs: halo_exchange(xs, "spatial", halo=1, axis=1),
            mesh=mesh,
            in_specs=P(None, "spatial"),
            out_specs=P(None, "spatial"),
        )
        out = np.asarray(fn(x))[0, :, 0, 0, 0]
        # each shard of 2 becomes 4 = [left halo, a, b, right halo]
        # shard 0: [0, 0, 1, 2]; shard 1: [1, 2, 3, 4]; shard 2: [3,4,5,6];
        # shard 3: [5, 6, 7, 0]
        want = [0, 0, 1, 2, 1, 2, 3, 4, 3, 4, 5, 6, 5, 6, 7, 0]
        assert np.allclose(out, want)
