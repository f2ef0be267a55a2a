"""Crystal graph convolutional network for property regression.

Capability parity with the reference CGCNN (cgcnn/cgcnn.py:21-160): gather
neighbor features, concat [self, neighbor, bond], one gated linear unit
(sigmoid filter x softplus core), masked batch-norm, residual softplus
update, masked global mean pool, Dense(128, softplus), Dense(1).

The reference's nonstandard masked batch-norm is replicated exactly
(cgcnn/cgcnn.py:76-98): mean/variance are computed over the *whole
batch-flattened tensor* with count-nonzero denominators, not per-feature —
and the second variance divides by count_nonzero of the squared differences
(sic).  These statistics are batch-computed at train AND inference time in
the reference (no moving averages); we do the same.

TPU-first deltas: the bond Gaussian expansion runs in-model from raw
distances (fused by XLA; the reference precomputed (50,12,41) host arrays,
cgcnn/data.py:212); masks are per-atom vectors broadcast in-kernel instead
of materialized (B,50,12,128) int tensors; the gather is one
jnp.take_along_axis.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from icsg3d_tpu.config import CGCNNConfig
from icsg3d_tpu.data.graphs import GraphSpec, gaussian_expand


def _masked_batch_stats(x, mask, count_from_values: bool = True):
    """Reference masked-BN statistics (cgcnn/cgcnn.py:79-81).

    mu = sum(x) / count_nonzero(x); var = sum((x-mu)^2 * mask) / denom.
    x is already masked (zeros at padding).
    """
    x = x.astype(jnp.float32)  # stats in f32 regardless of compute dtype
    mask = mask.astype(jnp.float32)
    count = jnp.maximum(jnp.count_nonzero(x).astype(jnp.float32), 1.0)
    mu = jnp.sum(x) / count
    diff_sq = jnp.square(x - mu) * mask
    if count_from_values:
        denom = count
    else:  # second BN divides by count_nonzero of diff_sq (cgcnn/cgcnn.py:95)
        denom = jnp.maximum(
            jnp.count_nonzero(diff_sq).astype(jnp.float32), 1.0
        )
    var = jnp.sum(diff_sq) / denom
    return mu, var


def max_pool(x, activation=None):
    """Global node-wise max pool (reference MaxPooling, cgcnn/cgcnn.py:106-122).

    Unused by the reference's CGCNN factory (it pools with MeanPooling) and
    unused here — provided for capability parity.  Matches the reference's
    unmasked reduce_max: padding rows are all-zero, so they only win a
    feature's max when every real atom's value is negative there.
    """
    pooled = jnp.max(x, axis=1)
    return activation(pooled) if activation is not None else pooled


def masked_mean_pool(x):
    """Masked mean pool (reference MeanPooling, cgcnn/cgcnn.py:125-142):
    sum over atoms / count of atoms with a nonzero feature-row sum."""
    row_nonzero = jnp.count_nonzero(jnp.sum(x, axis=-1), axis=1).astype(
        jnp.float32
    )
    return jnp.sum(x, axis=1) / jnp.maximum(row_nonzero, 1.0)[:, None]


class CrystalGraphConv(nn.Module):
    """One crystal-graph convolution with GLU gating and masked BN."""

    atom_fea_len: int
    nbr_fea_len: int
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, atom_fea, nbr_fea, nbr_idx, atom_mask):
        """atom_fea: (B, N, F); nbr_fea: (B, N, M, Fb); nbr_idx: (B, N, M)
        int; atom_mask: (B, N) float.  Returns (B, N, F)."""
        if nbr_fea.shape[-1] != self.nbr_fea_len:
            # validate instead of carrying a dead field: Dense would
            # silently infer whatever width arrives
            raise ValueError(
                f"bond features are {nbr_fea.shape[-1]}-wide, config "
                f"says {self.nbr_fea_len}"
            )
        B, N, F = atom_fea.shape
        M = nbr_idx.shape[-1]

        # Gather neighbor atom features: tf.gather(..., batch_dims=1).
        atom_nbr_fea = jnp.take_along_axis(
            atom_fea, nbr_idx.reshape(B, N * M)[:, :, None], axis=1
        ).reshape(B, N, M, F)
        self_fea = jnp.broadcast_to(atom_fea[:, :, None, :], (B, N, M, F))
        total = jnp.concatenate([self_fea, atom_nbr_fea, nbr_fea], axis=-1)

        gated = nn.Dense(
            2 * self.atom_fea_len, dtype=self.dtype, param_dtype=jnp.float32
        )(total)
        edge_mask = atom_mask[:, :, None, None]  # padding atoms contribute 0
        gated = gated * edge_mask

        # masked BN 1 over the whole tensor
        mask_b = jnp.broadcast_to(edge_mask, gated.shape)
        mu1, var1 = _masked_batch_stats(gated, mask_b, count_from_values=True)
        gamma1 = self.param("gamma1", nn.initializers.ones, (2 * self.atom_fea_len,))
        beta1 = self.param("beta1", nn.initializers.zeros, (2 * self.atom_fea_len,))
        gated = (gated - mu1) / jnp.sqrt(var1 + self.bn_epsilon) * gamma1 + beta1
        gated = gated * edge_mask

        nbr_filter, nbr_core = jnp.split(gated, 2, axis=-1)
        summed = jnp.sum(
            nn.sigmoid(nbr_filter) * nn.softplus(nbr_core), axis=2
        )
        node_mask = atom_mask[:, :, None]
        summed = summed * node_mask

        # masked BN 2
        mask_n = jnp.broadcast_to(node_mask, summed.shape)
        mu2, var2 = _masked_batch_stats(summed, mask_n, count_from_values=False)
        gamma2 = self.param("gamma2", nn.initializers.ones, (self.atom_fea_len,))
        beta2 = self.param("beta2", nn.initializers.zeros, (self.atom_fea_len,))
        summed = (summed - mu2) / jnp.sqrt(var2 + self.bn_epsilon) * gamma2 + beta2
        summed = summed * node_mask

        return nn.softplus(atom_fea + summed) * node_mask


class CGCNN(nn.Module):
    """Full property-regression model (cgcnn/cgcnn.py:145-160)."""

    cfg: CGCNNConfig = CGCNNConfig()

    @nn.compact
    def __call__(self, atom_fea, nbr_dist, nbr_idx, atom_mask):
        """atom_fea: (B, N, 93) element features; nbr_dist: (B, N, M)
        raw distances in Angstrom; nbr_idx: (B, N, M); atom_mask: (B, N).

        Returns (B,) predicted property values.
        """
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        spec = GraphSpec(
            max_atoms=cfg.max_atoms,
            max_neighbors=cfg.max_neighbors,
            radius=cfg.radius,
            dmin=cfg.dmin,
            step=cfg.step,
        )
        nbr_fea = gaussian_expand(nbr_dist, spec).astype(dt)

        x = nn.Dense(
            cfg.atom_fea_len, dtype=dt, param_dtype=jnp.float32
        )(atom_fea.astype(dt))
        for _ in range(cfg.n_conv):
            x = CrystalGraphConv(
                cfg.atom_fea_len, spec.num_bond_features, cfg.bn_epsilon,
                dtype=dt,
            )(x, nbr_fea, nbr_idx, atom_mask)

        # Masked mean pool (cgcnn/cgcnn.py:138): sum over atoms / count of
        # atoms with nonzero feature rows.
        pooled = nn.softplus(masked_mean_pool(x))

        h = nn.softplus(
            nn.Dense(cfg.hidden_dim, dtype=dt, param_dtype=jnp.float32)(
                pooled.astype(dt)
            )
        )
        out = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32)(
            h.astype(jnp.float32)
        )
        return out[:, 0]
