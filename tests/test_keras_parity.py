"""Layer-semantics parity oracle vs the reference's Keras graph.

VERDICT r3 item 7: the math-level oracles (voxelizer, EMD, losses) pin the
pipeline's numerics, but "we kept Keras layer semantics" in the models was
an assertion.  This file converts it to proof: the reference encoder /
decoder stacks (vae/lattice_vae.py:160-230) are transcribed into plain
numpy with the exact Keras 2.3 defaults —

- Conv3D(padding="same"): cross-correlation, channels-last, zero padding
- BatchNormalization(momentum=0.99, epsilon=1e-3): inference uses moving
  stats; training normalizes with the BIASED batch variance and updates
  moving <- moving*momentum + batch*(1-momentum)
- LeakyReLU(alpha=0.3), ReLU, MaxPool3D(2), UpSampling3D(2) (nearest)
- the K.tile cond quirk: (B,1,1,1,10) tiled to a 4x channel-repeated
  (B,d,d,d,40) block (vae/lattice_vae.py:166-169; config.py cond_repeat)

— then fixed random weights are pushed through the numpy oracle and the
Flax modules and the outputs asserted allclose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icsg3d_tpu.config import GridSpec, VAEConfig
from icsg3d_tpu.models.vae import Decoder, Encoder

MOMENTUM = 0.99
EPSILON = 1e-3
LEAKY = 0.3


# ---------------------------------------------------------------- oracle ops
def np_conv3d_same(x, kernel, bias):
    """Keras Conv3D(padding='same'): cross-correlation, channels-last."""
    k = kernel.shape[0]
    p = k // 2
    b, d, h, w, _ = x.shape
    xp = np.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    out = np.zeros((b, d, h, w, kernel.shape[-1]), np.float64)
    for i in range(k):
        for j in range(k):
            for l in range(k):
                out += xp[:, i : i + d, j : j + h, l : l + w, :] @ kernel[
                    i, j, l
                ].astype(np.float64)
    return out + bias


def np_bn_inference(x, gamma, beta, moving_mean, moving_var):
    return gamma * (x - moving_mean) / np.sqrt(moving_var + EPSILON) + beta


def np_bn_train(x, gamma, beta, moving_mean, moving_var):
    """Returns (normalized, new_moving_mean, new_moving_var) — Keras
    training-mode BN: biased batch variance, moving-average update."""
    axes = tuple(range(x.ndim - 1))
    mean = x.mean(axis=axes)
    var = x.var(axis=axes)  # biased (tf.nn.moments)
    y = gamma * (x - mean) / np.sqrt(var + EPSILON) + beta
    return (
        y,
        moving_mean * MOMENTUM + mean * (1 - MOMENTUM),
        moving_var * MOMENTUM + var * (1 - MOMENTUM),
    )


def np_leaky(x):
    return np.where(x > 0, x, LEAKY * x)


def np_maxpool2(x):
    b, d, h, w, c = x.shape
    return x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).max(
        axis=(2, 4, 6)
    )


def np_upsample2(x):
    """Keras UpSampling3D(2): nearest-neighbor repeat."""
    return (
        x.repeat(2, axis=1).repeat(2, axis=2).repeat(2, axis=3)
    )


def np_tile_cond(cond, d, repeat):
    """The reference cond block: K.tile((B,1,1,1,10), n=(32,32,32,4)) with
    Keras's left-pad-multiples semantics -> channel-REPEATED (tile) block."""
    b, c = cond.shape
    tiled = np.tile(cond, (1, repeat))  # channel axis tiling, K.tile order
    return np.broadcast_to(
        tiled.reshape(b, 1, 1, 1, c * repeat), (b, d, d, d, c * repeat)
    )


def _fill(tree, rng):
    """Replace every leaf with fixed random values (var leaves positive)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, a: jnp.asarray(
            np.abs(rng.normal(size=a.shape)) * 0.5 + 0.5
            if "var" in str(path[-1]) or "scale" in str(path[-1])
            else rng.normal(size=a.shape) * 0.4
        ).astype(a.dtype),
        tree,
    )


CFG = VAEConfig(
    grid=GridSpec(d=16),
    filters=(4, 8),
    latent_dim=32,
    cond_repeat=4,  # the pinned reference encoder width (config.py)
    dtype="float32",
)


class TestEncoderOracle:
    def _setup(self):
        rng = np.random.default_rng(7)
        enc = Encoder(CFG)
        x = rng.normal(size=(2, 16, 16, 16, 4)).astype(np.float32)
        cond = np.eye(10, dtype=np.float32)[rng.integers(0, 10, 2)]
        v = enc.init(
            jax.random.key(0), jnp.asarray(x), jnp.asarray(cond), train=False
        )
        v = _fill(v, rng)
        return enc, v, x, cond

    def _oracle(self, params, stats, x, cond, train=False):
        p = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), params)
        s = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), stats)
        h = np.concatenate(
            [x.astype(np.float64), np_tile_cond(cond, 16, CFG.cond_repeat)],
            axis=-1,
        )
        new_stats = {}
        for i in range(2):
            c, bn = p[f"Conv_{i}"], p[f"BatchNorm_{i}"]
            h = np_conv3d_same(h, c["kernel"], c["bias"])
            if train:
                h, nm, nv = np_bn_train(
                    h, bn["scale"], bn["bias"],
                    s[f"BatchNorm_{i}"]["mean"], s[f"BatchNorm_{i}"]["var"],
                )
                new_stats[f"BatchNorm_{i}"] = {"mean": nm, "var": nv}
            else:
                h = np_bn_inference(
                    h, bn["scale"], bn["bias"],
                    s[f"BatchNorm_{i}"]["mean"], s[f"BatchNorm_{i}"]["var"],
                )
            h = np_maxpool2(np_leaky(h))
        h = np_leaky(
            np_conv3d_same(h, p["Conv_2"]["kernel"], p["Conv_2"]["bias"])
        )
        h = h.reshape(h.shape[0], -1)
        h = np.maximum(h @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"], 0)
        z_mean = h @ p["z_mean"]["kernel"] + p["z_mean"]["bias"]
        z_log_var = h @ p["z_log_var"]["kernel"] + p["z_log_var"]["bias"]
        return z_mean, z_log_var, new_stats

    def test_inference_forward_matches(self):
        enc, v, x, cond = self._setup()
        zm, zlv = enc.apply(v, jnp.asarray(x), jnp.asarray(cond), train=False)
        ozm, ozlv, _ = self._oracle(
            v["params"], v["batch_stats"], x, cond, train=False
        )
        np.testing.assert_allclose(np.asarray(zm), ozm, atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(zlv), ozlv, atol=2e-4, rtol=1e-4
        )

    def test_train_mode_bn_stats_match(self):
        """Training-mode semantics: biased batch variance in the
        normalization AND the Keras moving-average update rule."""
        enc, v, x, cond = self._setup()
        (zm, _), mut = enc.apply(
            v, jnp.asarray(x), jnp.asarray(cond), train=True,
            mutable=["batch_stats"],
        )
        ozm, _, new_stats = self._oracle(
            v["params"], v["batch_stats"], x, cond, train=True
        )
        np.testing.assert_allclose(np.asarray(zm), ozm, atol=2e-4, rtol=1e-4)
        for i in range(2):
            got = mut["batch_stats"][f"BatchNorm_{i}"]
            want = new_stats[f"BatchNorm_{i}"]
            np.testing.assert_allclose(
                np.asarray(got["mean"]), want["mean"], atol=1e-5, rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(got["var"]), want["var"], atol=1e-5, rtol=1e-5
            )


class TestDecoderOracle:
    def test_inference_forward_matches(self):
        rng = np.random.default_rng(11)
        dec = Decoder(CFG)
        z = rng.normal(size=(2, 32)).astype(np.float32)
        cond = np.eye(10, dtype=np.float32)[rng.integers(0, 10, 2)]
        v = dec.init(
            jax.random.key(0), jnp.asarray(z), jnp.asarray(cond), train=False
        )
        v = _fill(v, rng)
        out = dec.apply(v, jnp.asarray(z), jnp.asarray(cond), train=False)

        p = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), v["params"]
        )
        s = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), v["batch_stats"]
        )
        start = 16 // 2 ** (len(CFG.filters) - 1)
        h = np.concatenate([z, cond], axis=-1).astype(np.float64)
        h = h @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
        h = h.reshape(2, start, start, start, -1)
        for i, _f in enumerate(reversed(CFG.filters)):
            c, bn = p[f"Conv_{i}"], p[f"BatchNorm_{i}"]
            h = np_conv3d_same(h, c["kernel"], c["bias"])
            h = np_bn_inference(
                h, bn["scale"], bn["bias"],
                s[f"BatchNorm_{i}"]["mean"], s[f"BatchNorm_{i}"]["var"],
            )
            h = np_leaky(h)
            if i < len(CFG.filters) - 1:
                h = np_upsample2(h)
        c, bn = p["decoder_output"], p["output_bn"]
        h = np_conv3d_same(h, c["kernel"], c["bias"])
        h = np_bn_inference(
            h, bn["scale"], bn["bias"],
            s["output_bn"]["mean"], s["output_bn"]["var"],
        )
        h = np.maximum(h, 0)  # the BN+ReLU tail (vae/lattice_vae.py:225-226)

        assert out.shape == h.shape == (2, 16, 16, 16, 4)
        np.testing.assert_allclose(np.asarray(out), h, atol=2e-4, rtol=1e-4)
        assert np.all(np.asarray(out) >= 0)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
