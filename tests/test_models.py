"""Model tests: shapes, dtypes, loss math vs numpy oracles, perceptual taps,
and jit-ability of forward passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import CGCNNConfig, GridSpec, UNetConfig, VAEConfig
from icsg3d_tpu.models import CGCNN, ConditionalDFCVAE, UNet3D
from icsg3d_tpu.models.layers import broadcast_condition, upsample_3d
from icsg3d_tpu.models.unet import unet_features
from icsg3d_tpu.models.vae import reparameterize
from icsg3d_tpu.ops import losses, metrics

GRID8 = GridSpec(d=8)
UNET_CFG = UNetConfig(num_classes=12, dtype="float32")
VAE_CFG = VAEConfig(grid=GRID8, filters=(4, 8, 16), latent_dim=16, dtype="float32")


def small_unet():
    model = UNet3D(UNET_CFG)
    x = jnp.zeros((2, 8, 8, 8, 4))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables, x


class TestUNet:
    def test_shapes(self):
        model, variables, x = small_unet()
        soft, sig = model.apply(variables, x, train=False)
        assert soft.shape == (2, 8, 8, 8, 12)
        assert sig.shape == (2, 8, 8, 8, 1)
        assert soft.dtype == jnp.float32

    def test_conv_count_and_channels(self):
        model, variables, _ = small_unet()
        params = variables["params"]
        convs = [k for k in params if k.startswith("conv")]
        assert len(convs) == 14  # 6 enc + 2 bottom + 6 dec
        assert params["conv1"]["kernel"].shape[-1] == 32
        assert params["conv7"]["kernel"].shape[-1] == 512
        assert params["conv14"]["kernel"].shape[-1] == 128

    def test_train_mode_updates_batch_stats(self):
        model, variables, x = small_unet()
        x = x + 1.0
        _, new_state = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        old = variables["batch_stats"]["bn1"]["mean"]
        new = new_state["batch_stats"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_perceptual_taps(self):
        model, variables, x = small_unet()
        feats = unet_features(model, variables, x, taps=(3, 5, 7, 9))
        # conv3: 64ch at 4^3; conv5: 128ch at 2^3; conv7: 512 at 1^3;
        # conv9 (decoder L3 first conv): 512 at 2^3
        assert feats[0].shape == (2, 4, 4, 4, 64)
        assert feats[1].shape == (2, 2, 2, 2, 128)
        assert feats[2].shape == (2, 1, 1, 1, 512)
        assert feats[3].shape == (2, 2, 2, 2, 512)
        # post-ReLU: non-negative
        for f in feats:
            assert np.all(np.asarray(f) >= 0)

    def test_jit_forward(self):
        model, variables, x = small_unet()
        fn = jax.jit(lambda v, a: model.apply(v, a, train=False))
        soft, sig = fn(variables, x)
        assert np.isfinite(np.asarray(soft)).all()


class TestVAE:
    def test_roundtrip_shapes(self):
        model = ConditionalDFCVAE(VAE_CFG)
        x = jnp.zeros((2, 8, 8, 8, 4))
        cond = jnp.zeros((2, 10)).at[:, 3].set(1.0)
        variables = model.init(
            jax.random.key(0), x, cond, jax.random.key(1), train=False
        )
        recon, z_mean, z_log_var, z = model.apply(
            variables, x, cond, jax.random.key(2), train=False
        )
        assert recon.shape == x.shape
        assert z_mean.shape == (2, 16)
        assert np.all(np.asarray(recon) >= 0)  # final BN+ReLU clamps

    def test_decoder_seed_shape_matches_reference_rule(self):
        # d=32, 4 filter blocks, latent 256 -> Dense(256) reshape (4,4,4,4)
        cfg = VAEConfig()
        start = cfg.grid.d // 2 ** (len(cfg.filters) - 1)
        assert start == 4
        assert max(cfg.latent_dim // start**3, 1) == 4

    def test_encode_decode_methods(self):
        model = ConditionalDFCVAE(VAE_CFG)
        x = jnp.ones((2, 8, 8, 8, 4))
        cond = jnp.zeros((2, 10)).at[:, 0].set(1.0)
        variables = model.init(
            jax.random.key(0), x, cond, jax.random.key(1), train=False
        )
        z_mean, z_log_var = model.apply(
            variables, x, cond, method=ConditionalDFCVAE.encode
        )
        out = model.apply(
            variables, z_mean, cond, method=ConditionalDFCVAE.decode
        )
        assert out.shape == x.shape

    def test_reparameterize_stats(self):
        mu = jnp.full((512, 4), 2.0)
        logvar = jnp.zeros((512, 4))
        z = reparameterize(jax.random.key(0), mu, logvar)
        assert np.asarray(z).mean() == pytest.approx(2.0, abs=0.1)
        assert np.asarray(z).std() == pytest.approx(1.0, abs=0.1)

    def test_condition_broadcast(self):
        cond = jnp.arange(20.0).reshape(2, 10)
        block = broadcast_condition(cond, (8, 8, 8))
        assert block.shape == (2, 8, 8, 8, 10)
        assert np.allclose(np.asarray(block[0, 3, 4, 5]), np.arange(10.0))
        block4 = broadcast_condition(cond, (8, 8, 8), repeat=4)
        assert block4.shape == (2, 8, 8, 8, 40)


class TestLayers:
    def test_upsample_matches_repeat(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 2, 2, 2, 3)).astype(np.float32))
        up = upsample_3d(x)
        want = np.repeat(np.repeat(np.repeat(np.asarray(x), 2, 1), 2, 2), 2, 3)
        assert np.array_equal(np.asarray(up), want)


class TestLosses:
    def test_weighted_cce_matches_numpy(self, rng):
        logits = rng.normal(size=(2, 4, 4, 4, 5)).astype(np.float32)
        labels = np.eye(5, dtype=np.float32)[rng.integers(0, 5, size=(2, 4, 4, 4))]
        w = np.array([0.0, 1.0, 2.0, 0.5, 1.5], np.float32)
        got = np.asarray(
            losses.weighted_categorical_crossentropy(
                jnp.asarray(logits), jnp.asarray(labels), w
            )
        )
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        p = np.clip(p, 1e-7, 1 - 1e-7)
        want = (-np.sum(labels * np.log(p) * w, -1)).mean(axis=(1, 2, 3))
        assert np.allclose(got, want, rtol=1e-5)

    def test_bce_from_logits_matches_probs_form(self, rng):
        logits = rng.normal(size=(3, 4, 4, 4, 1)).astype(np.float32)
        targets = (rng.random((3, 4, 4, 4, 1)) > 0.5).astype(np.float32)
        got = np.asarray(
            losses.binary_crossentropy_from_logits(
                jnp.asarray(logits), jnp.asarray(targets)
            )
        )
        p = 1 / (1 + np.exp(-logits))
        want = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
        want = want.reshape(3, -1).mean(-1)
        assert np.allclose(got, want, rtol=1e-4)

    def test_kld_zero_at_standard_normal(self):
        z_mean = jnp.zeros((2, 16))
        z_log_var = jnp.zeros((2, 16))
        assert np.allclose(np.asarray(losses.kld_gaussian(z_mean, z_log_var)), 0.0)

    def test_kld_positive_elsewhere(self):
        kld = losses.kld_gaussian(jnp.ones((1, 4)), jnp.ones((1, 4)))
        assert np.all(np.asarray(kld) > 0)

    def test_perceptual_loss(self, rng):
        f1 = [jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))]
        f2 = [jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))]
        got = np.asarray(losses.perceptual_feature_loss(f1, f2, [2.0]))
        want = 2.0 * np.mean(
            (np.asarray(f1[0]).reshape(2, -1) - np.asarray(f2[0]).reshape(2, -1))
            ** 2,
            axis=-1,
        )
        assert np.allclose(got, want, rtol=1e-5)

    def test_mse_flat(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 3)).astype(np.float32))
        y = jnp.zeros((2, 3, 3))
        got = np.asarray(losses.mse_flat(x, y))
        assert np.allclose(got, (np.asarray(x) ** 2).reshape(2, -1).mean(-1))


class TestMetrics:
    def test_f1_perfect(self):
        y = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 1, 2]])[None]
        assert float(metrics.f1_score(y, y)) == pytest.approx(1.0, abs=1e-5)

    def test_weighted_recall_ignores_background(self):
        # all-background truth: weighted recall denominator is 0 -> ~0
        y_true = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 0]])[None]
        y_pred = y_true
        assert float(metrics.weighted_recall(y_true, y_pred, 4)) < 1e-3

    def test_recall_counts_only_confident(self):
        y_true = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
        y_pred = jnp.asarray([[0.4, 0.6], [0.4, 0.6]])  # second sample wrong
        r = float(metrics.recall(y_true, y_pred))
        assert r == pytest.approx(0.5, abs=1e-4)


class TestCGCNN:
    def _graph_batch(self, rng, B=2):
        cfg = CGCNNConfig(max_atoms=6, max_neighbors=4)
        atom_fea = rng.random((B, 6, 93)).astype(np.float32)
        atom_fea[:, 4:] = 0.0  # padding atoms
        nbr_dist = rng.uniform(1, 5, (B, 6, 4)).astype(np.float32)
        nbr_idx = rng.integers(0, 4, (B, 6, 4)).astype(np.int32)
        mask = np.zeros((B, 6), np.float32)
        mask[:, :4] = 1.0
        return cfg, atom_fea, nbr_dist, nbr_idx, mask

    def test_forward_shape_and_finite(self, rng):
        cfg, af, nd, ni, m = self._graph_batch(rng)
        model = CGCNN(cfg)
        variables = model.init(
            jax.random.key(0), jnp.asarray(af), jnp.asarray(nd),
            jnp.asarray(ni), jnp.asarray(m),
        )
        out = model.apply(
            variables, jnp.asarray(af), jnp.asarray(nd), jnp.asarray(ni),
            jnp.asarray(m),
        )
        assert out.shape == (2,)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_invariance(self, rng):
        """Changing features of padded atoms must not change the output."""
        cfg, af, nd, ni, m = self._graph_batch(rng)
        model = CGCNN(cfg)
        variables = model.init(
            jax.random.key(0), jnp.asarray(af), jnp.asarray(nd),
            jnp.asarray(ni), jnp.asarray(m),
        )
        out1 = model.apply(
            variables, jnp.asarray(af), jnp.asarray(nd), jnp.asarray(ni),
            jnp.asarray(m),
        )
        af2 = af.copy()
        af2[:, 4:] = 77.0  # scribble on padding
        out2 = model.apply(
            variables, jnp.asarray(af2), jnp.asarray(nd), jnp.asarray(ni),
            jnp.asarray(m),
        )
        assert np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_grad_flows(self, rng):
        cfg, af, nd, ni, m = self._graph_batch(rng)
        model = CGCNN(cfg)
        variables = model.init(
            jax.random.key(0), jnp.asarray(af), jnp.asarray(nd),
            jnp.asarray(ni), jnp.asarray(m),
        )

        def loss_fn(params):
            out = model.apply(
                {"params": params}, jnp.asarray(af), jnp.asarray(nd),
                jnp.asarray(ni), jnp.asarray(m),
            )
            return jnp.sum(out**2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


class TestLabelFormEquivalence:
    """The integer-label loss/metric forms must equal the one-hot forms."""

    def test_wcce_label_form_matches_onehot(self, rng):
        from icsg3d_tpu.ops.losses import (
            weighted_categorical_crossentropy,
            weighted_categorical_crossentropy_from_labels,
        )

        logits = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 7)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 7, size=(2, 4, 4, 4)))
        w = jnp.asarray(rng.uniform(0, 2, 7).astype(np.float32))
        onehot = jax.nn.one_hot(labels, 7)
        a = weighted_categorical_crossentropy(logits, onehot, w)
        b = weighted_categorical_crossentropy_from_labels(logits, labels, w)
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    def test_metrics_label_forms_match(self, rng):
        from icsg3d_tpu.ops import metrics as m

        probs = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(2, 4, 4, 4, 7)).astype(np.float32)) * 3
        )
        labels = jnp.asarray(rng.integers(0, 7, size=(2, 4, 4, 4)))
        onehot = jax.nn.one_hot(labels, 7)
        assert float(m.f1_score(onehot, probs)) == pytest.approx(
            float(m.f1_score_from_labels(labels, probs)), rel=1e-5
        )
        assert float(m.weighted_recall(onehot, probs, 7)) == pytest.approx(
            float(m.weighted_recall_from_labels(labels, probs)), rel=1e-5
        )
        assert float(m.precision(onehot, probs)) == pytest.approx(
            float(m.precision_from_labels(labels, probs)), rel=1e-5
        )


class TestGraphPooling:
    """Reference pooling layers (cgcnn/cgcnn.py:106-142) as pure functions."""

    def test_max_pool(self, rng):
        from icsg3d_tpu.models.cgcnn import max_pool

        x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
        out = max_pool(x)
        assert out.shape == (2, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x).max(axis=1))
        act = max_pool(x, activation=jax.nn.softplus)
        np.testing.assert_allclose(
            np.asarray(act), np.asarray(jax.nn.softplus(out)), rtol=1e-6
        )

    def test_masked_mean_pool_ignores_padding(self, rng):
        from icsg3d_tpu.models.cgcnn import masked_mean_pool

        x = np.abs(rng.normal(size=(2, 6, 8))).astype(np.float32) + 0.1
        x[:, 4:] = 0.0  # zero feature rows = padding atoms
        out = np.asarray(masked_mean_pool(jnp.asarray(x)))
        np.testing.assert_allclose(out, x[:, :4].mean(axis=1), rtol=1e-5)
