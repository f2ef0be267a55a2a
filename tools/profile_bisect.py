"""Bisect the production binary extraction: time successively longer
prefixes of extract_atoms to find where the milliseconds actually live.

Chained-iteration timing (axon async-dispatch trap).
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

    den, labels, binary = jax.block_until_ready(decode_segment(z, condb))
    den = den.astype(jnp.float32)
    results = {"batch_size": bs}

    def stage(name, per_sample_fn, args):
        @jax.jit
        def run(*a):
            return jax.vmap(per_sample_fn)(*a)

        t = chain_time(run, args)
        results[name] = round(1000 * t, 2)
        print(name, results[name], flush=True)

    fgb = binary > 0

    # A: CC only
    stage(
        "A_cc",
        lambda b: ex.connected_components_same_value(b.astype(jnp.int32)),
        (fgb,),
    )

    # B: CC + erode + cores CC (no top_regions, no BFS)
    def b_fn(b):
        lab = ex.connected_components_same_value(b.astype(jnp.int32))
        er = ex.erode6(b)
        cores = ex.connected_components_same_value(er.astype(jnp.int32))
        return lab + cores

    stage("B_cc_plus_coresCC", b_fn, (fgb,))

    # C: B + top_regions on cores + membership matrices (no BFS)
    def c_fn(b):
        lab = ex.connected_components_same_value(b.astype(jnp.int32))
        er = ex.erode6(b)
        cores = ex.connected_components_same_value(er.astype(jnp.int32))
        cores_f = cores.reshape(-1)
        lab_f = lab.reshape(-1)
        core_labels, _, core_ok = ex.top_regions_by_size(cores_f, 128, 8, n_vox)
        m_core = (cores_f[:, None] == core_labels[None, :]) & core_ok[None, :]
        valid_core_v = jnp.any(m_core, axis=1)
        core_region = jnp.where(
            core_ok, lab_f[jnp.minimum(core_labels, n_vox - 1)], jnp.int32(n_vox)
        )
        cores_in_region = jnp.sum(
            ((lab_f[:, None] == core_region[None, :]) & core_ok[None, :]).astype(
                jnp.int32
            ),
            axis=1,
        )
        return valid_core_v.astype(jnp.int32).sum() + cores_in_region.sum()

    stage("C_plus_topregions", c_fn, (fgb,))

    # D: full split (adds the BFS nearest_seed_labels)
    def d_fn(b):
        lab = ex.connected_components_same_value(b.astype(jnp.int32))
        er = ex.erode6(b)
        return ex.split_by_erosion_cores(lab, er, b, wmin=8)

    stage("D_full_split", d_fn, (fgb,))

    # E: D + final ranking/match/centroids/votes == full production
    @jax.jit
    def full(den, labels, binary):
        return ex.extract_atoms_batch(
            den, labels, binary, max_atoms=max_atoms, method="binary",
            erosion_levels=1, vote_classes=95,
        )

    t = chain_time(full, (den, labels, binary))
    results["E_full_extract"] = round(1000 * t, 2)
    print("E_full_extract", results["E_full_extract"], flush=True)

    # F: BFS alone on precomputed labels (how expensive is nearest_seed?)
    lab3 = jax.jit(
        lambda b: jax.vmap(
            lambda x: ex.connected_components_same_value(x.astype(jnp.int32))
        )(b)
    )(fgb)
    er3 = jax.jit(lambda b: jax.vmap(ex.erode6)(b))(fgb)

    def f_fn(lab, er, b):
        return ex.split_by_erosion_cores(lab, er, b, wmin=8)

    @jax.jit
    def runf(lab, er, b):
        return jax.vmap(f_fn)(lab, er, b)

    out = runf(lab3, er3, fgb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        lab3 = lab3 + (0 * out[:, 0, 0, 0]).astype(lab3.dtype)[:, None, None, None]
        out = runf(lab3, er3, fgb)
    jax.block_until_ready(out)
    results["F_split_given_cc"] = round(1000 * (time.perf_counter() - t0) / 10, 2)
    print("F_split_given_cc", results["F_split_given_cc"], flush=True)

    print(json.dumps(results, indent=1))
    with open(os.path.join(ROOT, "output", "ns10k", "profile_bisect.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
