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


class TestDataParallelEquivalence:
    """DP numerical oracle, mirroring test_spatial.py's pattern for the
    spatial axis: one train step on a 1x1 mesh (single device) must equal
    the same step on the 8x1 data-parallel mesh — same batch, allclose loss
    and updated parameters.  GSPMD's gradient psum is thereby PROVEN, not
    assumed."""

    def _run_step_on_mesh(self, step_fn, state, batch, mesh, extra=()):
        placed = shard_batch(batch, mesh)
        return step_fn(state, placed, *extra)

    def test_vae_train_step_dp_matches_single_device(self, rng):
        """SGD is used (not the driver's Adam) because the oracle compares
        UPDATED PARAMS: Adam's first step normalizes the update to
        ~lr*sign(g), amplifying 1e-7 reduction-order noise on near-zero
        grads into lr-scale param differences.  Under SGD updates stay
        proportional to grads, so allclose on params IS allclose on grads
        — which is the psum correctness being proven."""
        import optax

        from icsg3d_tpu.config import GridSpec, VAEConfig
        from icsg3d_tpu.models import ConditionalDFCVAE
        from icsg3d_tpu.train.state import ModelState
        from icsg3d_tpu.train.vae import make_vae_steps

        cfg = VAEConfig(
            grid=GridSpec(d=8), filters=(4, 8), latent_dim=8, dtype="float32"
        )
        model = ConditionalDFCVAE(cfg)
        x = rng.normal(size=(8, 8, 8, 8, 4)).astype(np.float32)
        cond = np.eye(10, dtype=np.float32)[rng.integers(0, 10, 8)]
        batch = {"x": x, "cond": cond}
        key = jax.random.key(42)

        def fresh_state():
            init = model.init(
                jax.random.key(0), jnp.asarray(x), jnp.asarray(cond),
                jax.random.key(1),
            )
            return ModelState.create(model.apply, init, optax.sgd(1e-2))

        train_step, _ = make_vae_steps(model)
        s1, m1 = self._run_step_on_mesh(
            train_step, fresh_state(), batch,
            make_mesh(n_data=1, n_spatial=1), extra=(key,),
        )
        s8, m8 = self._run_step_on_mesh(
            train_step, fresh_state(), batch,
            make_mesh(n_data=8, n_spatial=1), extra=(key,),
        )

        assert np.allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s8.params),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_cgcnn_train_step_dp_matches_single_device(self, rng):
        from icsg3d_tpu.config import CGCNNConfig, TrainConfig
        from icsg3d_tpu.models import CGCNN
        from icsg3d_tpu.train.cgcnn import create_cgcnn_state, make_cgcnn_steps

        cfg = CGCNNConfig(max_atoms=10, max_neighbors=4)
        tc = TrainConfig(batch_size=8, learning_rate=1e-3)
        _, state = create_cgcnn_state(cfg, tc, jax.random.key(0))
        train_step, _ = make_cgcnn_steps(CGCNN(cfg))

        n, A, K = 8, cfg.max_atoms, cfg.max_neighbors
        batch = {
            "atom_fea": rng.normal(size=(n, A, 93)).astype(np.float32),
            "nbr_dist": rng.uniform(0, 8, size=(n, A, K)).astype(np.float32),
            "nbr_idx": rng.integers(0, A, size=(n, A, K)).astype(np.int32),
            "atom_mask": (rng.uniform(size=(n, A)) > 0.3).astype(np.float32),
            "target": rng.normal(size=(n,)).astype(np.float32),
        }

        s1, m1 = self._run_step_on_mesh(
            train_step, state, batch, make_mesh(n_data=1, n_spatial=1)
        )
        _, state2 = create_cgcnn_state(cfg, tc, jax.random.key(0))
        s8, m8 = self._run_step_on_mesh(
            train_step, state2, batch, make_mesh(n_data=8, n_spatial=1)
        )

        assert np.allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s8.params),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
