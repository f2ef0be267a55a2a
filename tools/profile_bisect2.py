"""Bisect the FINAL phase of binary extraction (rank/match/centroid/vote).

Builds on profile_bisect.py's result: cc+split = 42 ms but the full
extraction = 140 ms for a 128 batch, so ~97 ms hides in the final
reductions that microbenchmarks say should cost < 1 ms.  Times successive
suffixes appended to the full cc+split prefix.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

from icsg3d_tpu.apps import common
from icsg3d_tpu.config import GridSpec, PipelineConfig, UNetConfig, VAEConfig
from icsg3d_tpu.ops import extract as ex

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def chain_time(fn, args, n=10, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)

    def chain(a, o):
        lead = jax.tree_util.tree_leaves(o)[0]
        bump = (1e-30 * jnp.sum(lead)).astype(a[0].dtype)
        return (a[0] + bump,) + tuple(a[1:])

    for _ in range(warmup):
        args = chain(args, out)
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        args = chain(args, out)
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    bs = int(os.environ.get("PROFILE_BS", "128"))
    d = 32
    n_vox = d * d * d
    max_atoms = 64
    grid = GridSpec(d=d)
    vae_cfg = VAEConfig(grid=grid)
    unet_cfg = UNetConfig()
    pipe = PipelineConfig(grid=grid)

    vae, vae_vars = common.load_vae(
        vae_cfg, os.path.join(ROOT, "checkpoints/ns10k/vae")
    )
    unet, unet_vars = common.load_unet(
        unet_cfg, os.path.join(ROOT, "checkpoints/ns10k/unet"), grid_d=d
    )
    density = np.load(os.path.join(ROOT, "data/ns10k/density.npy"), mmap_mode="r")
    coords = np.load(os.path.join(ROOT, "data/ns10k/coords.npy"), mmap_mode="r")
    x_base = common.grid_input(
        np.asarray(density[0:1], np.float32), np.asarray(coords[0:1], np.float32)
    )
    cond = np.zeros((1, 10), np.float32)
    cond[0, 4] = 1.0
    encode = common.jit_vae_encode(vae, vae_vars)
    z_mu, _ = encode(jnp.asarray(x_base), jnp.asarray(cond))
    z_mu = np.asarray(z_mu)[0]
    rng = np.random.default_rng(0)
    z = jnp.asarray(
        rng.normal(z_mu, np.sqrt(0.5), size=(bs, len(z_mu))).astype(np.float32)
    )
    condb = jnp.asarray(np.tile(cond, (bs, 1)))

    @jax.jit
    def decode_segment(z, cond):
        M = vae.apply(vae_vars, z, cond, method=type(vae).decode)
        soft, sig = unet.apply(unet_vars, M, train=False)
        labels = jnp.argmax(soft, axis=-1).astype(jnp.int32)
        binary = (jax.nn.sigmoid(sig[..., 0]) > pipe.binary_threshold).astype(
            jnp.int32
        )
        return M[..., 0], jnp.where(binary > 0, labels, 0), binary

    den, labels_g, binary = jax.block_until_ready(decode_segment(z, condb))
    results = {"batch_size": bs}
    fgb = binary > 0

    def prefix(b):
        fg = b
        lab = ex.connected_components_same_value(b.astype(jnp.int32))
        er = ex.erode6(fg)
        lab = ex.split_by_erosion_cores(lab, er, fg, wmin=8)
        return lab, fg

    def stage(name, per_sample_fn, args):
        @jax.jit
        def run(*a):
            return jax.vmap(per_sample_fn)(*a)

        t = chain_time(run, args)
        results[name] = round(1000 * t, 2)
        print(name, results[name], flush=True)

    # G1: prefix + where + top_regions only
    def g1(b):
        lab, fg = prefix(b)
        labels = lab.reshape(-1)
        fg_f = fg.reshape(-1)
        labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
        top_idx, sizes, slot_valid = ex.top_regions_by_size(
            labels, max_atoms, 4, n_vox
        )
        return top_idx.sum() + sizes.sum()

    stage("G1_plus_rank", g1, (fgb,))

    # G2: + match + slot
    def g2(b):
        lab, fg = prefix(b)
        labels = lab.reshape(-1)
        fg_f = fg.reshape(-1)
        labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
        top_idx, _, slot_valid = ex.top_regions_by_size(
            labels, max_atoms, 4, n_vox
        )
        match = labels[:, None] == top_idx[None, :]
        match = match & slot_valid[None, :]
        in_any = jnp.any(match, axis=1)
        slot = jnp.where(in_any, jnp.argmax(match, axis=1), max_atoms)
        return slot.sum()

    stage("G2_plus_match", g2, (fgb,))

    # G3: + centroids (segment_sum, 65 segments)
    def g3(b):
        lab, fg = prefix(b)
        labels = lab.reshape(-1)
        fg_f = fg.reshape(-1)
        labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
        top_idx, _, slot_valid = ex.top_regions_by_size(
            labels, max_atoms, 4, n_vox
        )
        match = labels[:, None] == top_idx[None, :]
        match = match & slot_valid[None, :]
        in_any = jnp.any(match, axis=1)
        slot = jnp.where(in_any, jnp.argmax(match, axis=1), max_atoms)
        shape = (d, d, d)
        coords = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.float32, shape, 0).reshape(-1),
                jax.lax.broadcasted_iota(jnp.float32, shape, 1).reshape(-1),
                jax.lax.broadcasted_iota(jnp.float32, shape, 2).reshape(-1),
            ],
            axis=-1,
        )
        w = in_any.astype(jnp.float32)
        slot_counts = jax.ops.segment_sum(w, slot, num_segments=max_atoms + 1)
        sums = jax.ops.segment_sum(
            coords * w[:, None], slot, num_segments=max_atoms + 1
        )
        cent = sums[:max_atoms] / jnp.maximum(slot_counts[:max_atoms, None], 1.0)
        return cent.sum()

    stage("G3_plus_centroids", g3, (fgb,))

    # G4: + votes via segment_sum over one_hot (the production form)
    def g4(b, spec3):
        lab, fg = prefix(b)
        labels = lab.reshape(-1)
        fg_f = fg.reshape(-1)
        spec_f = jnp.where(fg_f, spec3.reshape(-1), 0)
        labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
        top_idx, _, slot_valid = ex.top_regions_by_size(
            labels, max_atoms, 4, n_vox
        )
        match = labels[:, None] == top_idx[None, :]
        match = match & slot_valid[None, :]
        in_any = jnp.any(match, axis=1)
        slot = jnp.where(in_any, jnp.argmax(match, axis=1), max_atoms)
        w = in_any.astype(jnp.float32)
        onehot = jax.nn.one_hot(spec_f, 95, dtype=jnp.float32)
        votes = jax.ops.segment_sum(
            onehot * w[:, None], slot, num_segments=max_atoms + 1
        )
        return votes.sum()

    stage("G4_plus_votes_segsum", g4, (fgb, labels_g))

    # G5: votes as matmul instead: match^T @ onehot
    def g5(b, spec3):
        lab, fg = prefix(b)
        labels = lab.reshape(-1)
        fg_f = fg.reshape(-1)
        spec_f = jnp.where(fg_f, spec3.reshape(-1), 0)
        labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
        top_idx, _, slot_valid = ex.top_regions_by_size(
            labels, max_atoms, 4, n_vox
        )
        match = (labels[:, None] == top_idx[None, :]) & slot_valid[None, :]
        onehot = jax.nn.one_hot(spec_f, 95, dtype=jnp.float32)
        votes = match.astype(jnp.float32).T @ onehot
        return votes.sum()

    stage("G5_votes_matmul", g5, (fgb, labels_g))

    # G6: centroids as matmul too: match^T @ coords
    def g6(b, spec3):
        lab, fg = prefix(b)
        labels = lab.reshape(-1)
        fg_f = fg.reshape(-1)
        spec_f = jnp.where(fg_f, spec3.reshape(-1), 0)
        labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
        top_idx, _, slot_valid = ex.top_regions_by_size(
            labels, max_atoms, 4, n_vox
        )
        match = (labels[:, None] == top_idx[None, :]) & slot_valid[None, :]
        mf = match.astype(jnp.float32)
        shape = (d, d, d)
        coords = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.float32, shape, 0).reshape(-1),
                jax.lax.broadcasted_iota(jnp.float32, shape, 1).reshape(-1),
                jax.lax.broadcasted_iota(jnp.float32, shape, 2).reshape(-1),
            ],
            axis=-1,
        )
        cent_sums = mf.T @ coords
        counts = jnp.sum(mf, axis=0)
        cent = cent_sums / jnp.maximum(counts[:, None], 1.0)
        onehot = jax.nn.one_hot(spec_f, 95, dtype=jnp.float32)
        votes = mf.T @ onehot
        return cent.sum() + votes.sum()

    stage("G6_all_matmul", g6, (fgb, labels_g))

    print(json.dumps(results, indent=1))
    with open(os.path.join(ROOT, "output", "ns10k", "profile_bisect2.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
