"""Spatial (grid-dimension) sharding tests: GSPMD-partitioned model forward
equals the unsharded oracle, and the profiling utilities work."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import GridSpec, UNetConfig, VAEConfig
from icsg3d_tpu.models import ConditionalDFCVAE, UNet3D
from icsg3d_tpu.parallel import batch_sharding, make_mesh
from icsg3d_tpu.utils.profiling import StepTimer, flops_of_jitted
from icsg3d_tpu.utils.timeout import TimeoutError_, run_with_timeout


class TestGSPMDSpatialSharding:
    """Sharding the grid depth axis over the `spatial` mesh axis under plain
    jit: XLA's SPMD partitioner inserts the conv halo exchanges itself —
    this is the production path for 64^3 grids (BASELINE config 5); the
    manual halo module (parallel/halo.py) documents the mechanics."""

    def test_unet_forward_depth_sharded_matches(self, rng):
        cfg = UNetConfig(num_classes=8, dtype="float32")
        model = UNet3D(cfg)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 4)).astype(np.float32))
        variables = model.init(jax.random.key(0), x, train=False)

        want_soft, want_sig = model.apply(variables, x, train=False)

        mesh = make_mesh(n_data=2, n_spatial=4)
        xs = jax.device_put(x, batch_sharding(mesh, spatial_dim=1))
        fn = jax.jit(lambda v, a: model.apply(v, a, train=False))
        got_soft, got_sig = fn(variables, xs)

        assert np.allclose(
            np.asarray(got_soft), np.asarray(want_soft), atol=2e-4
        )
        assert np.allclose(np.asarray(got_sig), np.asarray(want_sig), atol=2e-4)

    def test_vae_forward_depth_sharded_matches(self, rng):
        cfg = VAEConfig(
            grid=GridSpec(d=16), filters=(4, 8), latent_dim=8, dtype="float32"
        )
        model = ConditionalDFCVAE(cfg)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 4)).astype(np.float32))
        cond = jnp.zeros((2, 10)).at[:, 1].set(1.0)
        variables = model.init(
            jax.random.key(0), x, cond, jax.random.key(1), train=False
        )
        key = jax.random.key(7)
        want, *_ = model.apply(variables, x, cond, key, train=False)

        mesh = make_mesh(n_data=2, n_spatial=4)
        xs = jax.device_put(x, batch_sharding(mesh, spatial_dim=1))
        got, *_ = jax.jit(
            lambda v, a, c, k: model.apply(v, a, c, k, train=False)
        )(variables, xs, cond, key)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-4)


class TestProfilingUtils:
    def test_step_timer(self):
        t = StepTimer(items_per_step=8, flops_per_step=1e9, warmup=1)
        assert t.tick() is None
        out = t.tick()
        assert out is not None
        assert out["items_per_sec"] > 0
        assert "mfu" in out

    def test_flops_of_jitted(self):
        f = jax.jit(lambda a, b: a @ b)
        x = jnp.ones((128, 128))
        flops = flops_of_jitted(f, x, x)
        # 2*M*N*K = 4.19e6 (cost analysis may count fused ops slightly differently)
        assert flops == 0.0 or flops > 1e6


class TestTimeout:
    def test_completes(self):
        assert run_with_timeout(lambda x: x + 1, 5.0, 41) == 42

    def test_times_out(self):
        import time

        with pytest.raises(TimeoutError_):
            run_with_timeout(time.sleep, 0.2, 2.0)

    def test_propagates_exception(self):
        def boom():
            raise ValueError("x")

        with pytest.raises(ValueError):
            run_with_timeout(boom, 1.0)
