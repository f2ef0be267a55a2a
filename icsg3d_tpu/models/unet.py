"""3D U-Net species segmenter.

Capability parity with the reference AtomUnet (unet/unet.py:272-355): a
3-level encoder-decoder over (B, d, d, d, 4) grids with skip concats and two
1x1x1 heads — `soft` (num_classes-way segmentation) and `sig` (binary
occupancy).  Channel plan (conv index in graph order):

    enc L1: c1=32,  c2=64     -> pool
    enc L2: c3=64,  c4=128    -> pool
    enc L3: c5=128, c6=256    -> pool
    bottom: c7=512, c8=512    -> up, concat c6
    dec L3: c9=512, c10=256   -> up, concat c4
    dec L2: c11=256, c12=128  -> up, concat c2
    dec L1: c13=128, c14=128  -> heads

TPU-first differences from the reference:
- returns *logits* for both heads (softmax/sigmoid fold into the fused
  loss; inference applies them explicitly), keeping the hot path in
  bfloat16 without precision loss in the loss;
- post-ReLU activations are ``sow``-ed per conv index so the VAE's
  deep-feature-consistent loss can tap them (reference built a Keras
  sub-Model over layers re_lu_2/4/6/8 = post-ReLU of convs 3/5/7/9,
  vae/lattice_vae.py:100,257-263) without a second network.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from icsg3d_tpu.config import UNetConfig
from icsg3d_tpu.models.layers import (
    SpatialMajorConv,
    max_pool_3d,
    max_pool_ndcs,
    upsample_3d,
    upsample_ndcs,
)
from icsg3d_tpu.ops.lowc_conv import from_ndcs, lowc_supported, to_ndcs


class UNet3D(nn.Module):
    cfg: UNetConfig = UNetConfig()
    # optional (data, spatial) Mesh for the explicit multi-chip Pallas
    # conv path (see models/layers.py SpatialMajorConv.spatial_mesh)
    spatial_mesh: object = None

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        max_conv: Optional[int] = None,
        sow_taps: Optional[Sequence[int]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, D, H, W, C) density+coordinate grid.

        Returns (soft_logits (B,D,H,W,num_classes), sig_logits (B,D,H,W,1)),
        both float32.

        max_conv: stop after this conv index (1-based) and return (None,
        None) — the perceptual feature path uses this so XLA never compiles
        the unused decoder tail (conv10-14 carry ~80% of the U-Net FLOPs at
        32^3 and the DFC taps only reach conv9).
        sow_taps: restrict which post-ReLU activations are sown; sowing
        every conv keeps all 14 activations live in the jaxpr and defeats
        dead-code elimination.  None sows all (inspection/debug use).
        """
        cfg = self.cfg
        x = x.astype(jnp.dtype(cfg.dtype))

        idx = 0
        skips = []
        ndcs_layout = cfg.layout == "ndcs"
        s = x.shape[1]
        in_ndcs = False

        def maybe_enter(h):
            # per-level layout entry: an unsupported entry plane (e.g.
            # d=128, past the lane apron) must not disable the Pallas
            # path for the deeper, supported levels
            nonlocal in_ndcs
            if ndcs_layout and not in_ndcs and lowc_supported(s, s):
                h = to_ndcs(h)
                in_ndcs = True
            return h

        x = maybe_enter(x)

        # The perceptual taps need post-ReLU (pre-BN) tensors, so the
        # conv/relu/bn sequence is inlined here rather than using ConvBlock.
        # In the spatial-major layout the sown taps are (B, D, C, S); both
        # DFC forwards use the same layout, so the feature-MSE consumer is
        # unaffected.
        def conv_relu_bn(h, features):
            nonlocal idx
            idx += 1
            if in_ndcs:
                h = SpatialMajorConv(
                    features, hw=(s, s), dtype=jnp.dtype(cfg.dtype),
                    name=f"conv{idx}", spatial_mesh=self.spatial_mesh,
                )(h)
            else:
                h = nn.Conv(
                    features,
                    (3, 3, 3),
                    padding="SAME",
                    dtype=jnp.dtype(cfg.dtype),
                    param_dtype=jnp.float32,
                    name=f"conv{idx}",
                )(h)
            h = nn.relu(h)
            if sow_taps is None or idx in sow_taps:
                self.sow("intermediates", f"relu{idx}", h)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=cfg.bn_momentum,
                epsilon=cfg.bn_epsilon,
                dtype=jnp.dtype(cfg.dtype),
                param_dtype=jnp.float32,
                axis=2 if in_ndcs else -1,
                name=f"bn{idx}",
            )(h)
            return h

        done = lambda: max_conv is not None and idx >= max_conv

        # Encoder
        for f1, f2 in cfg.enc_filters:
            x = maybe_enter(x)
            x = conv_relu_bn(x, f1)
            if done():
                return None, None
            x = conv_relu_bn(x, f2)
            if done():
                return None, None
            skips.append((x, in_ndcs, s))
            if in_ndcs and not lowc_supported(s // 2, s // 2):
                x = from_ndcs(x, s, s)
                in_ndcs = False
            x = max_pool_ndcs(x, (s, s)) if in_ndcs else max_pool_3d(x)
            s //= 2

        # Bottleneck
        x = maybe_enter(x)
        x = conv_relu_bn(x, cfg.bottom_filters[0])
        if done():
            return None, None
        x = conv_relu_bn(x, cfg.bottom_filters[1])
        if done():
            return None, None

        # Decoder
        for (f1, f2), (skip, skip_ndcs, skip_s) in zip(
            cfg.dec_filters, reversed(skips)
        ):
            x = upsample_ndcs(x, (s, s)) if in_ndcs else upsample_3d(x)
            s *= 2
            assert s == skip_s, (s, skip_s)  # loop accounting invariant
            if skip_ndcs and not in_ndcs:
                x = to_ndcs(x)
                in_ndcs = True
            elif in_ndcs and not skip_ndcs:
                # reachable when the entry plane is unsupported but
                # deeper levels ran ndcs (e.g. d=128)
                x = from_ndcs(x, s, s)
                in_ndcs = False
            x = jnp.concatenate(
                [skip, x.astype(skip.dtype)], axis=2 if in_ndcs else -1
            )
            x = conv_relu_bn(x, f1)
            if done():
                return None, None
            x = conv_relu_bn(x, f2)
            if done():
                return None, None

        if in_ndcs:
            x = from_ndcs(x, s, s)

        soft = nn.Conv(
            cfg.num_classes,
            (1, 1, 1),
            padding="SAME",
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head_soft",
        )(x.astype(jnp.float32))
        sig = nn.Conv(
            1,
            (1, 1, 1),
            padding="SAME",
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head_sig",
        )(x.astype(jnp.float32))
        return soft, sig


def apply_unet(model: UNet3D, variables, x, train: bool = False):
    """Forward pass returning (soft_logits, sig_logits) without intermediates.

    train=True runs batch-mode BN and discards the updated batch_stats
    (flax requires declaring the collection mutable to run at all).
    """
    if train:
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return out
    return model.apply(variables, x, train=False, mutable=False)


def unet_features(model: UNet3D, variables, x, taps: Sequence[int]):
    """Post-ReLU activations of the given conv indices (1-based).

    The DFC-VAE perceptual taps default to convs (3, 5, 7, 9)
    (config.VAEConfig.perceptual_taps).  Runs only through max(taps) and
    sows only the requested activations, so XLA compiles exactly the
    feature-extractor prefix.
    """
    _, state = model.apply(
        variables, x, train=False, mutable=["intermediates"],
        max_conv=max(taps), sow_taps=tuple(taps),
    )
    inter = state["intermediates"]
    return [inter[f"relu{i}"][0] for i in taps]
