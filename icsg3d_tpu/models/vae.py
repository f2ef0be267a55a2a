"""Conditional deep-feature-consistent VAE over voxel grids.

Capability parity with LatticeDFCVAE (vae/lattice_vae.py:69-270):

- Encoder: condition one-hot broadcast over the grid and concatenated as
  channels (vae/lattice_vae.py:166-169); 4 blocks of
  Conv(3^3) -> BN -> LeakyReLU(0.3) -> MaxPool(2) with filters
  (16, 32, 64, 128); Conv(4) -> LeakyReLU; Flatten -> Dense(latent, relu);
  Dense heads for (z_mean, z_log_var); reparameterization sample.
- Decoder: Dense(latent) over concat(z, cond) -> reshape (4,4,4,4); 4 blocks
  Conv -> BN -> LeakyReLU with reversed filters, 2x nearest upsampling
  between (vae/lattice_vae.py:211-217); final Conv(channels) -> BN -> ReLU
  (the BN+ReLU tail clamps outputs >= 0, vae/lattice_vae.py:225-226).
- Loss (ops/losses.py): MSE + alpha*DFC + beta*KLD with the DFC features
  taken from the U-Net's post-ReLU activations of convs (3,5,7,9)
  (vae/lattice_vae.py:241-270).

JAX-first deltas: the reparameterization RNG is an explicit key; the KLD is
a pure function of the returned (z_mean, z_log_var) rather than a graph
side-channel; grid geometry comes from GridSpec instead of hardcoded 32s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from icsg3d_tpu.config import VAEConfig
from icsg3d_tpu.models.layers import (
    SpatialMajorConv,
    broadcast_condition,
    max_pool_3d,
    max_pool_ndcs,
    upsample_3d,
    upsample_ndcs,
)
from icsg3d_tpu.ops.lowc_conv import from_ndcs, lowc_supported, to_ndcs


def _leaky(slope):
    return lambda x: nn.leaky_relu(x, negative_slope=slope)


class Encoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    # optional (data, spatial) Mesh for the explicit multi-chip Pallas
    # conv path (see models/layers.py SpatialMajorConv.spatial_mesh)
    spatial_mesh: object = None

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        """x: (B, d, d, d, C); cond: (B, cond_bins) one-hot.

        Returns (z_mean, z_log_var), both (B, latent_dim) float32.

        With cfg.layout == "ndcs" the large-grid blocks run in the
        spatial-major (B, D, C, H*W) layout on the tap-packed Pallas conv
        (ops/lowc_conv.py) and drop back to NDHWC once planes shrink below
        one 128-lane tile; parameter names/shapes are identical in both
        layouts, so checkpoints are interchangeable.
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = x.astype(dtype)
        ndcs = cfg.layout == "ndcs"
        s = x.shape[1]
        in_ndcs = False

        for i, f in enumerate(cfg.filters):
            # enter/exit the spatial-major layout per block: the entry
            # plane may be unsupported (e.g. d=128 exceeds the lane
            # apron) while deeper blocks are supported, and vice versa
            if ndcs and not in_ndcs and lowc_supported(s, s):
                x = to_ndcs(x)
                in_ndcs = True
            if in_ndcs and not lowc_supported(s, s):
                x = from_ndcs(x, s, s)
                in_ndcs = False
            if i == 0:
                # Append the condition channels in the CURRENT layout,
                # AFTER the layout entry: concatenating in NDHWC first
                # would materialize the wide (x + cond_repeat*bins)
                # lane-padded tensor that the spatial-major layout
                # exists to avoid — at 64^3 that concat alone is 8x the
                # bytes of its ndcs form.  Channel ORDER is identical in
                # both branches ([x..., cond...]; ndcs axis=2 is the
                # channel axis), so checkpoints stay layout-portable.
                cnd = cond.astype(dtype)
                if cfg.cond_repeat != 1:
                    cnd = jnp.tile(cnd, (1, cfg.cond_repeat))
                if in_ndcs:
                    b_, d_, _, s_ = x.shape
                    blk = jnp.broadcast_to(
                        cnd[:, None, :, None],
                        (b_, d_, cnd.shape[-1], s_),
                    )
                    x = jnp.concatenate([x, blk], axis=2)
                else:
                    x = jnp.concatenate(
                        [x, broadcast_condition(cnd, x.shape[1:-1])],
                        axis=-1,
                    )
            if in_ndcs:
                x = SpatialMajorConv(
                    f, hw=(s, s), dtype=dtype, name=f"Conv_{i}",
                    spatial_mesh=self.spatial_mesh,
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=cfg.bn_momentum,
                    epsilon=cfg.bn_epsilon,
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    axis=2,
                    name=f"BatchNorm_{i}",
                )(x)
                x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)
                x = max_pool_ndcs(x, (s, s))
            else:
                x = nn.Conv(
                    f, cfg.kernel_size, padding="SAME", dtype=dtype,
                    param_dtype=jnp.float32, name=f"Conv_{i}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=cfg.bn_momentum,
                    epsilon=cfg.bn_epsilon,
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    name=f"BatchNorm_{i}",
                )(x)
                x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)
                x = max_pool_3d(x)
            s //= 2
        if in_ndcs:
            x = from_ndcs(x, s, s)

        x = nn.Conv(
            4, cfg.kernel_size, padding="SAME", dtype=dtype,
            param_dtype=jnp.float32, name=f"Conv_{len(cfg.filters)}",
        )(x)
        x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)

        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(cfg.latent_dim, dtype=dtype, param_dtype=jnp.float32)(x))
        z_mean = nn.Dense(
            cfg.latent_dim, dtype=jnp.float32, param_dtype=jnp.float32,
            name="z_mean",
        )(x.astype(jnp.float32))
        z_log_var = nn.Dense(
            cfg.latent_dim, dtype=jnp.float32, param_dtype=jnp.float32,
            name="z_log_var",
        )(x.astype(jnp.float32))
        return z_mean, z_log_var


class Decoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    spatial_mesh: object = None

    @nn.compact
    def __call__(self, z, cond, train: bool = False):
        """z: (B, latent_dim); cond: (B, cond_bins).  Returns (B,d,d,d,C)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        # The decoder applies len(filters)-1 2x upsamplings, so the seed grid
        # is d / 2^(len-1) per axis; for the reference defaults (d=32, four
        # filter blocks, latent 256) this reproduces the Dense(256) ->
        # reshape (4,4,4,4) start (vae/lattice_vae.py:208-209).
        start = cfg.grid.d // 2 ** (len(cfg.filters) - 1)
        c0 = max(cfg.latent_dim // start**3, 1)
        ndcs = cfg.layout == "ndcs"
        x = jnp.concatenate([z, cond], axis=-1).astype(dtype)
        x = nn.Dense(
            start**3 * c0, dtype=dtype, param_dtype=jnp.float32,
            name="Dense_0",
        )(x)
        x = x.reshape(x.shape[0], start, start, start, c0)

        s = start
        in_ndcs = False
        for i, f in enumerate(reversed(cfg.filters)):
            if ndcs and not in_ndcs and lowc_supported(s, s):
                x = to_ndcs(x)
                in_ndcs = True
            if in_ndcs and not lowc_supported(s, s):
                # an upsample grew the plane past kernel support (e.g.
                # s=128 exceeds the lane apron) — drop back to NDHWC
                # rather than paying a transpose round-trip per conv
                x = from_ndcs(x, s, s)
                in_ndcs = False
            if in_ndcs:
                x = SpatialMajorConv(
                    f, hw=(s, s), dtype=dtype, name=f"Conv_{i}",
                    spatial_mesh=self.spatial_mesh,
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=cfg.bn_momentum,
                    epsilon=cfg.bn_epsilon,
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    axis=2,
                    name=f"BatchNorm_{i}",
                )(x)
                x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)
                if i < len(cfg.filters) - 1:
                    x = upsample_ndcs(x, (s, s))
                    s *= 2
            else:
                x = nn.Conv(
                    f, cfg.kernel_size, padding="SAME", dtype=dtype,
                    param_dtype=jnp.float32, name=f"Conv_{i}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=cfg.bn_momentum,
                    epsilon=cfg.bn_epsilon,
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    name=f"BatchNorm_{i}",
                )(x)
                x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)
                if i < len(cfg.filters) - 1:
                    x = upsample_3d(x)
                    s *= 2

        channels = cfg.grid.channels
        if in_ndcs:
            # The output conv runs in FLOAT32 in both layouts (NDHWC
            # branch below casts too): a bf16 output head here would make
            # the same checkpoint decode different grids depending on
            # layout.  BN+ReLU finish in f32 (vae/lattice_vae.py:225-226
            # clamps outputs >= 0).
            x = SpatialMajorConv(
                channels, hw=(s, s), dtype=jnp.float32,
                name="decoder_output", spatial_mesh=self.spatial_mesh,
            )(x.astype(jnp.float32))
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=cfg.bn_momentum,
                epsilon=cfg.bn_epsilon,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                axis=2,
                name="output_bn",
            )(x)
            return from_ndcs(nn.relu(x), s, s)
        x = nn.Conv(
            channels, cfg.kernel_size, padding="SAME", dtype=jnp.float32,
            param_dtype=jnp.float32, name="decoder_output",
        )(x.astype(jnp.float32))
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=cfg.bn_momentum,
            epsilon=cfg.bn_epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="output_bn",
        )(x)
        return nn.relu(x)


class ConditionalDFCVAE(nn.Module):
    """Encoder + reparameterized sample + decoder in one module."""

    cfg: VAEConfig = VAEConfig()
    spatial_mesh: object = None

    def setup(self):
        self.encoder = Encoder(self.cfg, spatial_mesh=self.spatial_mesh)
        self.decoder = Decoder(self.cfg, spatial_mesh=self.spatial_mesh)

    def __call__(self, x, cond, rng, train: bool = False):
        """Full VAE pass.

        Returns (reconstruction, z_mean, z_log_var, z).
        """
        z_mean, z_log_var = self.encoder(x, cond, train=train)
        z = reparameterize(rng, z_mean, z_log_var)
        recon = self.decoder(z, cond, train=train)
        return recon, z_mean, z_log_var, z

    def encode(self, x, cond):
        return self.encoder(x, cond, train=False)

    def decode(self, z, cond):
        return self.decoder(z, cond, train=False)


def reparameterize(rng, z_mean, z_log_var):
    """z = mu + exp(log_var / 2) * eps (vae/lattice_vae.py:53-66)."""
    eps = jax.random.normal(rng, z_mean.shape, dtype=z_mean.dtype)
    return z_mean + jnp.exp(0.5 * z_log_var) * eps


def sample_prior(model, variables, rng, n_samples: int, cond=None, var: float = 1.0):
    """Decode z ~ N(0, var) under given (or random) condition bins.

    Reference: sample_vae (vae/lattice_vae.py:349-357), minus its cond
    tiling bug (it tiled an (n,10) one-hot by (n,1) into (n^2,10); only
    plot_samples consumed it).  Returns (z, decoded grids).
    """
    cfg = model.cfg
    z_key, c_key = jax.random.split(rng)
    z = jax.random.normal(z_key, (n_samples, cfg.latent_dim)) * jnp.sqrt(var)
    if cond is None:
        bins = jax.random.randint(c_key, (n_samples,), 0, cfg.cond_bins)
        cond = jax.nn.one_hot(bins, cfg.cond_bins)
    out = model.apply(variables, z, cond, method=type(model).decode)
    return z, out
