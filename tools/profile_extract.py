"""Micro-profile of ops/extract.py phases on REAL decoded grids.

Loads the campaign checkpoints (checkpoints/ns10k), decodes a batch of
latents around the base compound exactly like apps/generate.py, then times
each internal phase of the production binary-method extraction:

  cc        connected components of the binary occupancy (while-loop 1)
  split     erode6 + split_by_erosion_cores (CC #2 + segment sums + BFS)
  final     region ranking + slot match + centroid/vote reductions
  scatter   one bare 32769-segment segment_sum (the scatter primitive)
  extract   the whole production extract_atoms_batch

Chained-iteration timing throughout (axon async-dispatch trap).
Writes output/ns10k/profile_extract.json.
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


def chain_time(fn, args, n=10, warmup=2, chain=None):
    out = fn(*args)
    jax.block_until_ready(out)
    if chain is None:
        # default: nudge the first float arg by a zero-scaled reduction
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
    grid = GridSpec(d=d)
    pipe = PipelineConfig(grid=grid)
    vae_cfg = VAEConfig(grid=grid)
    unet_cfg = UNetConfig()

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

    den, labels, binary = jax.block_until_ready(decode_segment(z, condb))
    results = {"batch_size": bs, "mean_fg_voxels": float(jnp.mean(jnp.sum(binary, (1, 2, 3))))}

    # --- phase: CC of binary occupancy ---
    @jax.jit
    def cc_only(binary):
        return jax.vmap(
            lambda b: ex.connected_components_same_value(b.astype(jnp.int32))
        )(binary > 0)

    t = chain_time(
        cc_only, (binary,),
        chain=lambda a, o: (a[0] + 0 * o[:, 0, 0, 0][:, None, None, None],),
    )
    results["cc_ms"] = round(1000 * t, 2)
    lab3 = cc_only(binary)

    # --- phase: erosion split ---
    @jax.jit
    def split_only(lab3, binary):
        def one(l, b):
            fg = b > 0
            er = ex.erode6(fg)
            return ex.split_by_erosion_cores(l, er, fg, wmin=8)

        return jax.vmap(one)(lab3, binary)

    t = chain_time(
        split_only, (lab3, binary),
        chain=lambda a, o: (a[0] + 0 * o[:, 0, 0, 0][:, None, None, None], a[1]),
    )
    results["split_ms"] = round(1000 * t, 2)
    lab_split = split_only(lab3, binary)

    # --- phase: final reductions (rank + match + centroids + vote) ---
    n_vox = d * d * d
    max_atoms = 64

    @jax.jit
    def final_only(lab_split, labels, binary):
        def one(lab3, spec3, b):
            spec_f = jnp.where(b > 0, spec3, 0).reshape(-1)
            fg_f = (b > 0).reshape(-1)
            lab_f = lab3.reshape(-1)
            ones = fg_f.astype(jnp.float32)
            counts = jax.ops.segment_sum(ones, lab_f, num_segments=n_vox + 1)
            vox_idx = jnp.arange(n_vox, dtype=jnp.int32)
            is_root = (lab_f == vox_idx) & fg_f
            own_count = counts[:n_vox]
            root_score = jnp.where(is_root & (own_count >= 4), own_count, -jnp.inf)
            top_val, top_idx = jax.lax.top_k(root_score, max_atoms)
            slot_valid = jnp.isfinite(top_val)
            match = (lab_f[:, None] == top_idx[None, :]) & slot_valid[None, :]
            in_any = jnp.any(match, axis=1)
            slot = jnp.where(in_any, jnp.argmax(match, axis=1), max_atoms)
            coords3 = jnp.stack(
                [
                    jax.lax.broadcasted_iota(jnp.float32, (d, d, d), i).reshape(-1)
                    for i in range(3)
                ],
                axis=-1,
            )
            w = in_any.astype(jnp.float32)
            slot_counts = jax.ops.segment_sum(w, slot, num_segments=max_atoms + 1)
            sums = jax.ops.segment_sum(
                coords3 * w[:, None], slot, num_segments=max_atoms + 1
            )
            cent = sums[:max_atoms] / jnp.maximum(slot_counts[:max_atoms, None], 1.0)
            onehot = jax.nn.one_hot(spec_f, 95, dtype=jnp.float32)
            votes = jax.ops.segment_sum(
                onehot * w[:, None], slot, num_segments=max_atoms + 1
            )
            return cent, votes

        return jax.vmap(one)(lab_split, labels, binary)

    t = chain_time(
        final_only, (lab_split, labels, binary),
        chain=lambda a, o: (a[0] + 0 * jnp.sum(o[0]).astype(a[0].dtype), a[1], a[2]),
    )
    results["final_ms"] = round(1000 * t, 2)

    # --- bare scatter: one 32769-segment segment_sum, vmapped ---
    @jax.jit
    def scatter_only(lab_split, binary):
        def one(lab3, b):
            return jax.ops.segment_sum(
                (b > 0).reshape(-1).astype(jnp.float32),
                lab3.reshape(-1),
                num_segments=n_vox + 1,
            )

        return jax.vmap(one)(lab_split, binary)

    t = chain_time(
        scatter_only, (lab_split, binary),
        chain=lambda a, o: (a[0] + 0 * jnp.sum(o).astype(a[0].dtype), a[1]),
    )
    results["scatter32k_ms"] = round(1000 * t, 2)

    # --- full production extraction ---
    @jax.jit
    def extract_full(den, labels, binary):
        return ex.extract_atoms_batch(
            den, labels, binary, max_atoms=max_atoms, method="binary",
            erosion_levels=1, vote_classes=95,
        )

    t = chain_time(
        extract_full, (den, labels, binary),
        chain=lambda a, o: (a[0] + 0 * jnp.sum(o[1]).astype(a[0].dtype), a[1], a[2]),
    )
    results["extract_full_ms"] = round(1000 * t, 2)

    # while-loop trip counts on this population (host replication)
    fg0 = np.asarray(binary[0] > 0)
    lab = np.where(
        fg0, np.arange(n_vox, dtype=np.int64).reshape(d, d, d), n_vox
    )
    rounds = 0
    spec = fg0.astype(np.int64)
    while True:
        new = lab.copy()
        for axis in range(3):
            for shift in (1, -1):
                ln = np.roll(lab, shift, axis=axis)
                sn = np.roll(spec, shift, axis=axis)
                idx = np.arange(d)
                sl = [slice(None)] * 3
                sl[axis] = slice(0, 1) if shift == 1 else slice(d - 1, d)
                valid = sn == spec
                valid[tuple(sl)] = False
                new = np.minimum(new, np.where(valid, ln, n_vox))
        new = np.where(fg0, new, n_vox)
        if np.array_equal(new, lab):
            break
        lab = new
        rounds += 1
    results["cc_rounds_sample0"] = rounds

    print(json.dumps(results, indent=1))
    out_path = os.path.join(ROOT, "output", "ns10k", "profile_extract.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
