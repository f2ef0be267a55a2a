"""Tap-packed low-channel Conv3D kernel (ops/lowc_conv.py).

Correctness runs through the Pallas interpreter on CPU against
lax.conv_general_dilated; shapes stay small (d=8/16) per the suite's CPU
budget.  The spatial-major VAE layout (VAEConfig.layout="ndcs") is
checked for parameter-tree identity and bit-exact fallback equivalence
against the NDHWC model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import GridSpec, UNetConfig, VAEConfig
from icsg3d_tpu.models.unet import UNet3D, unet_features
from icsg3d_tpu.models.vae import ConditionalDFCVAE
from icsg3d_tpu.ops.lowc_conv import (
    conv3d_lowc,
    conv3d_lowc_vjp,
    conv_ndcs,
    conv_ndcs_valid,
    from_ndcs,
    pack_weights,
    to_ndcs,
)


def _xla_conv(x, w, b=None):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b.reshape(1, 1, 1, 1, -1)
    return out


class TestLowCConvKernel:
    @pytest.mark.parametrize(
        "shape",
        [(2, 8, 8, 8, 5, 7), (1, 4, 8, 8, 1, 4), (2, 16, 8, 8, 14, 16)],
    )
    def test_forward_matches_xla(self, shape):
        B, D, H, W, C, Co = shape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, C, Co)) * 0.1, jnp.float32
        )
        b = jnp.asarray(rng.standard_normal(Co), jnp.float32)
        y = conv3d_lowc(x, w, b, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(_xla_conv(x, w, b)), atol=1e-4
        )

    def test_ndcs_roundtrip(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 5)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(from_ndcs(to_ndcs(x), 8, 8)), np.asarray(x)
        )

    def test_pack_weights_shape(self):
        w = jnp.zeros((3, 3, 3, 6, 10))
        assert pack_weights(w).shape == (90, 18)

    def test_vjp_matches_xla_autodiff(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 5)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, 5, 6)) * 0.1, jnp.float32
        )
        b = jnp.asarray(rng.standard_normal(6), jnp.float32)

        g_pal = jax.grad(
            lambda *a: jnp.sum(jnp.sin(conv3d_lowc_vjp(*a, True))),
            argnums=(0, 1, 2),
        )(x, w, b)
        g_xla = jax.grad(
            lambda *a: jnp.sum(jnp.sin(_xla_conv(*a))), argnums=(0, 1, 2)
        )(x, w, b)
        for name, a, c in zip(("dx", "dw", "db"), g_pal, g_xla):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=1e-3, err_msg=name
            )

    def test_conv_ndcs_vjp(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 3)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, 3, 5)) * 0.1, jnp.float32
        )
        b = jnp.asarray(rng.standard_normal(5), jnp.float32)

        def f_ndcs(x, w, b):
            y = conv_ndcs(to_ndcs(x), w, b, (8, 8), True)
            return jnp.sum(jnp.cos(from_ndcs(y, 8, 8)))

        def f_xla(x, w, b):
            return jnp.sum(jnp.cos(_xla_conv(x, w, b)))

        np.testing.assert_allclose(
            float(f_ndcs(x, w, b)), float(f_xla(x, w, b)), atol=1e-4
        )
        g1 = jax.grad(f_ndcs, argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
        for name, a, c in zip(("dx", "dw", "db"), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=1e-3, err_msg=name
            )


class TestNdcsVAELayout:
    """layout="ndcs" must be a drop-in: same parameter tree, same outputs
    (the CPU fallback path is the same XLA conv, so exact equality)."""

    def _models(self, d):
        grid = GridSpec(d=d)
        return (
            ConditionalDFCVAE(VAEConfig(grid=grid, dtype="float32")),
            ConditionalDFCVAE(
                VAEConfig(grid=grid, dtype="float32", layout="ndcs")
            ),
        )

    def test_param_tree_identical(self):
        m_h, m_s = self._models(16)
        x = jnp.zeros((1, 16, 16, 16, 4))
        cond = jnp.zeros((1, 10))
        k = jax.random.key(0)
        v_h = m_h.init(jax.random.key(1), x, cond, k, train=False)
        v_s = m_s.init(jax.random.key(1), x, cond, k, train=False)
        assert jax.tree_util.tree_structure(v_h) == (
            jax.tree_util.tree_structure(v_s)
        )
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: a.shape == b.shape, v_h, v_s
            )
        )

    def test_outputs_identical_with_shared_params(self):
        m_h, m_s = self._models(16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32)
        cond = jnp.asarray(
            np.eye(10, dtype=np.float32)[rng.integers(0, 10, 2)]
        )
        k = jax.random.key(0)
        v = m_h.init(jax.random.key(1), x, cond, k, train=False)
        out_h = m_h.apply(v, x, cond, k, train=False)
        out_s = m_s.apply(v, x, cond, k, train=False)
        for a, b in zip(out_h, out_s):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_mode_batch_stats(self):
        m_h, m_s = self._models(16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32)
        cond = jnp.asarray(np.eye(10, dtype=np.float32)[[0, 3]])
        k = jax.random.key(0)
        v = m_h.init(jax.random.key(1), x, cond, k, train=False)
        _, st_h = m_h.apply(
            v, x, cond, k, train=True, mutable=["batch_stats"]
        )
        _, st_s = m_s.apply(
            v, x, cond, k, train=True, mutable=["batch_stats"]
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            st_h,
            st_s,
        )


class TestPickDblk:
    """The depth-block picker must maximize planes per program within the
    VMEM budget (vpad scratch + double-buffered out block + f32 matmul
    result), and keep the legacy cap when called without geometry."""

    def test_production_shapes_get_16(self):
        from icsg3d_tpu.ops.lowc_conv import _pick_dblk

        # (d_out, C_padded, S, cout) for the VAE convs at 64^3 and 32^3
        for d, c, s, co in [
            (64, 16, 4096, 16), (64, 32, 4096, 16), (64, 16, 4096, 4),
            (32, 16, 1024, 16), (32, 64, 1024, 32), (16, 128, 256, 64),
        ]:
            assert _pick_dblk(d, c, s, co, 2) == 16, (d, c, s, co)

    def test_budget_limits_block(self):
        from icsg3d_tpu.ops.lowc_conv import _APRON, _pick_dblk

        # A fat shape where the budget binds: 64ch->32ch over 4096-lane
        # planes fits 4 planes per program, not 16
        d, c, s, co = 64, 64, 4096, 32
        dblk = _pick_dblk(d, c, s, co, 2)
        assert dblk == 4
        need = (
            (dblk + 2) * c * (s + 2 * _APRON) * 2
            + 2 * dblk * co * s * 2
            + 9 * co * (s + 2 * _APRON) * 4
            + 9 * co * 3 * c * 2
        )
        assert need <= 12 * 1024 * 1024
        assert d % dblk == 0

    def test_oversized_shape_floors_at_1(self):
        from icsg3d_tpu.ops.lowc_conv import _pick_dblk

        # The f32 matmul result alone exceeds the budget here; the picker
        # floors at one plane per program rather than erroring
        assert _pick_dblk(64, 256, 4096, 256, 2) == 1

    def test_legacy_no_geometry_caps_at_8(self):
        from icsg3d_tpu.ops.lowc_conv import _pick_dblk

        assert _pick_dblk(64) == 8
        assert _pick_dblk(6) == 2


class TestConvNdcsFits:
    """VMEM feasibility gate: big-channel convs must route to the XLA
    fallback instead of dying in the TPU compile helper with a
    scoped-vmem OOM (the round-3 d64/unet ndcs failure — the 768->512
    decoder conv's packed weights are 21 MB and its dw kernel's resident
    f32 gradient block 42 MB, past 16 MB VMEM at any depth block)."""

    def test_low_channel_production_shapes_fit(self):
        from icsg3d_tpu.ops.lowc_conv import conv_ndcs_fits

        # the VAE conv set (filters 16..128) at 32^3 and 64^3 planes —
        # these MUST stay on the Pallas path (they are its raison d'etre)
        for cin, cout, s in [
            (14, 16, 32), (16, 32, 32), (4, 16, 64), (16, 16, 64),
            (32, 64, 16), (64, 128, 16), (128, 128, 16), (128, 64, 16),
        ]:
            assert conv_ndcs_fits(cin, cout, s, s), (cin, cout, s)

    def test_big_channel_shapes_fall_back(self):
        from icsg3d_tpu.ops.lowc_conv import conv_ndcs_fits

        # the U-Net bottleneck/decoder shapes that OOM'd the compile
        # helper (d64_ndcs / unet32_ndcs, output/ns10k round-2 record)
        for cin, cout, s in [(768, 512, 16), (256, 256, 16), (384, 256, 16)]:
            assert not conv_ndcs_fits(cin, cout, s, s), (cin, cout, s)

    def test_unet_ndcs_models_init(self):
        """The d-64 U-Net in ndcs layout (the config that OOM'd) must at
        least trace/init with the gate in place; on CPU the gated convs
        all take the XLA path, so this exercises the routing, not Mosaic.
        """
        import jax
        import jax.numpy as jnp

        from icsg3d_tpu.config import UNetConfig
        from icsg3d_tpu.models.unet import UNet3D

        model = UNet3D(UNetConfig(layout="ndcs"))
        x = jnp.zeros((1, 64, 64, 64, 4), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x, train=False)
        )
        assert "params" in variables


class TestNdcsBf16Grads:
    """The production configs run bfloat16; the layout fallback conv once
    broke only under jax.grad with bf16 (preferred_element_type=f32 made
    the cotangent f32, which lax.conv's transpose fed back into a conv
    against the bf16 kernel — models/layers.py).  Exercise a full bf16
    DFC train step in the ndcs layout end-to-end."""

    def test_vae_train_step_bf16_ndcs(self):
        from icsg3d_tpu.config import TrainConfig, UNetConfig
        from icsg3d_tpu.train.unet import create_unet_state
        from icsg3d_tpu.train.vae import create_vae_state, make_vae_steps

        grid = GridSpec(d=16)
        tc = TrainConfig(batch_size=2, learning_rate=5e-4)
        vae, state = create_vae_state(
            VAEConfig(grid=grid, layout="ndcs"), tc, jax.random.key(0)
        )
        unet, ustate = create_unet_state(
            UNetConfig(layout="ndcs"), tc, jax.random.key(1), grid_d=16
        )
        step, _ = make_vae_steps(
            vae, unet,
            {"params": ustate.params, "batch_stats": ustate.batch_stats},
        )
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32),
            "cond": jnp.asarray(np.eye(10, dtype=np.float32)[[1, 4]]),
        }
        state, mets = step(state, batch, jax.random.key(2))
        assert np.isfinite(float(mets["loss"]))


class TestNdcsUNetLayout:
    """UNetConfig.layout="ndcs": same parameter tree, identical heads and
    perceptual taps (CPU fallback path = same XLA conv)."""

    def _models(self):
        return (
            UNet3D(UNetConfig(dtype="float32")),
            UNet3D(UNetConfig(dtype="float32", layout="ndcs")),
        )

    def test_heads_identical_with_shared_params(self):
        m_h, m_s = self._models()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32)
        v = m_h.init(jax.random.key(0), x, train=False)
        v_s = m_s.init(jax.random.key(0), x, train=False)
        assert jax.tree_util.tree_structure(v) == (
            jax.tree_util.tree_structure(v_s)
        )
        soft_h, sig_h = m_h.apply(v, x, train=False)
        soft_s, sig_s = m_s.apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(soft_h), np.asarray(soft_s))
        np.testing.assert_array_equal(np.asarray(sig_h), np.asarray(sig_s))

    def test_perceptual_taps_match(self):
        m_h, m_s = self._models()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32)
        v = m_h.init(jax.random.key(0), x, train=False)
        taps = (3, 5, 7, 9)
        f_h = unet_features(m_h, v, x, taps)
        f_s = unet_features(m_s, v, x, taps)
        for a, b in zip(f_h, f_s):
            if a.ndim == 5 and b.ndim == 4:  # ndcs-layout tap
                B, D, H, W, C = a.shape
                a = jnp.transpose(a, (0, 1, 4, 2, 3)).reshape(
                    B, D, C, H * W
                )
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestDepthValid:
    """conv_ndcs_valid: the depth-VALID kernel mode used by the
    halo-exchanged multi-chip path (parallel/halo.py)."""

    def _data(self):
        rng = np.random.default_rng(3)
        B, D, H, W, Cin, Cout = 2, 8, 8, 16, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, Cin, H * W)), jnp.float32)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, Cin, Cout)), jnp.float32
        ) * 0.2
        b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
        return x, w, b, (H, W)

    @staticmethod
    def _pad(x):
        B, _, C, S = x.shape
        z = jnp.zeros((B, 1, C, S), x.dtype)
        return jnp.concatenate([z, x, z], axis=1)

    def test_valid_on_padded_equals_same(self):
        x, w, b, hw = self._data()
        y_same = conv_ndcs(x, w, b, hw, True)
        y_valid = conv_ndcs_valid(self._pad(x), w, b, hw, True)
        np.testing.assert_allclose(
            np.asarray(y_valid), np.asarray(y_same), atol=1e-4
        )

    def test_grads_match_same_oracle(self):
        x, w, b, hw = self._data()

        def loss_valid(x, w, b):
            return jnp.sum(
                jnp.sin(conv_ndcs_valid(self._pad(x), w, b, hw, True))
            )

        def loss_same(x, w, b):
            return jnp.sum(jnp.sin(conv_ndcs(x, w, b, hw, True)))

        g_v = jax.grad(loss_valid, (0, 1, 2))(x, w, b)
        g_s = jax.grad(loss_same, (0, 1, 2))(x, w, b)
        for a, c in zip(g_v, g_s):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=2e-3, rtol=1e-4
            )


class TestShardedNdcsConv:
    """conv_ndcs_sharded: depth shards + halo exchange over the spatial
    mesh axis reproduce the unsharded conv, values AND gradients (the
    multi-chip form of the Pallas conv; mirrors test_spatial.py's GSPMD
    oracle pattern)."""

    def _setup(self):
        from icsg3d_tpu.parallel.halo import conv_ndcs_sharded
        from icsg3d_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(4)
        B, D, H, W, Cin, Cout = 4, 16, 8, 16, 4, 6
        x = jnp.asarray(rng.normal(size=(B, D, Cin, H * W)), jnp.float32)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, Cin, Cout)), jnp.float32
        ) * 0.2
        b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
        return conv_ndcs_sharded, make_mesh(4, 2), x, w, b, (H, W)

    def test_forward_matches_unsharded(self):
        sharded, mesh, x, w, b, hw = self._setup()
        y = sharded(x, w, b, hw, mesh, interpret=True)
        y_ref = conv_ndcs(x, w, b, hw, True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), atol=1e-4
        )

    def test_grads_match_unsharded(self):
        sharded, mesh, x, w, b, hw = self._setup()

        def loss_sh(x, w, b):
            return jnp.sum(
                jnp.sin(sharded(x, w, b, hw, mesh, interpret=True))
            )

        def loss_ref(x, w, b):
            return jnp.sum(jnp.sin(conv_ndcs(x, w, b, hw, True)))

        g_sh = jax.grad(loss_sh, (0, 1, 2))(x, w, b)
        g_rf = jax.grad(loss_ref, (0, 1, 2))(x, w, b)
        for a, c in zip(g_sh, g_rf):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=2e-3, rtol=1e-4
            )


class TestSpatialMeshModels:
    """spatial_mesh: the ndcs models running their convs through the
    halo-sharded Pallas path (shard_map over a (data, spatial) mesh)
    match the single-program ndcs models with shared params."""

    def _mesh(self):
        from icsg3d_tpu.parallel.mesh import make_mesh

        return make_mesh(2, 2, devices=jax.devices()[:4])

    def test_vae_outputs_match(self):
        grid = GridSpec(d=16)
        cfg = VAEConfig(grid=grid, dtype="float32", layout="ndcs")
        m = ConditionalDFCVAE(cfg)
        m_sh = ConditionalDFCVAE(cfg, spatial_mesh=self._mesh())
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32)
        cond = jnp.asarray(
            np.eye(10, dtype=np.float32)[rng.integers(0, 10, 2)]
        )
        k = jax.random.key(0)
        v = m.init(jax.random.key(1), x, cond, k, train=False)
        out = m.apply(v, x, cond, k, train=False)
        out_sh = m_sh.apply(v, x, cond, k, train=False)
        for a, b in zip(out, out_sh):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )

    def test_vae_grads_match(self):
        grid = GridSpec(d=16)
        cfg = VAEConfig(grid=grid, dtype="float32", layout="ndcs")
        m = ConditionalDFCVAE(cfg)
        m_sh = ConditionalDFCVAE(cfg, spatial_mesh=self._mesh())
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 4)), jnp.float32)
        cond = jnp.asarray(
            np.eye(10, dtype=np.float32)[rng.integers(0, 10, 2)]
        )
        k = jax.random.key(0)
        v = m.init(jax.random.key(1), x, cond, k, train=False)

        def loss(model, params):
            recon, z_mean, z_log_var, _ = model.apply(
                {**v, "params": params}, x, cond, k, train=False
            )
            return jnp.mean((recon - x) ** 2) + jnp.mean(z_mean**2)

        g = jax.grad(lambda p: loss(m, p))(v["params"])
        g_sh = jax.grad(lambda p: loss(m_sh, p))(v["params"])
        flat = jax.tree_util.tree_leaves_with_path(g)
        # dict of path->leaf keeps the comparison keyed, not positional
        flat_sh = {
            jax.tree_util.keystr(kp): l
            for kp, l in jax.tree_util.tree_leaves_with_path(g_sh)
        }
        for kp, a in flat:
            b = flat_sh[jax.tree_util.keystr(kp)]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=jax.tree_util.keystr(kp),
            )
