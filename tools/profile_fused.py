"""Stage-level timing of the fused generation program on the real chip.

Times (chained-iteration, per the axon async-dispatch trap) each stage of
the fused decode -> segment -> extract pipeline separately:

  1. VAE decode                       (models/vae.py decode)
  2. U-Net forward + argmax/threshold (models/unet.py)
  3. device extraction                (ops/extract.py, production settings)
  4. the full fused program           (apps/generate.py fused_generate_fn)

so optimization effort lands on the stage that actually dominates.
Writes output/ns10k/profile_fused.json.
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

from icsg3d_tpu.config import GridSpec, PipelineConfig, TrainConfig, UNetConfig, VAEConfig
from icsg3d_tpu.train.unet import create_unet_state
from icsg3d_tpu.train.vae import create_vae_state


def chain_time(fn, args, chain, n=10, warmup=2):
    """Timed chained loop: `chain(args, out) -> args` forces each call onto
    the critical path (independent repeats measure bogus-fast over the
    tunnel)."""
    out = fn(*args)
    jax.block_until_ready(out)
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
    vae_cfg = VAEConfig(grid=grid)
    unet_cfg = UNetConfig()
    tc = TrainConfig(batch_size=bs, learning_rate=5e-4)

    vae, vstate = create_vae_state(vae_cfg, tc, jax.random.key(0))
    unet, ustate = create_unet_state(unet_cfg, tc, jax.random.key(1), grid_d=d)
    vae_vars = {"params": vstate.params, "batch_stats": vstate.batch_stats}
    unet_vars = {"params": ustate.params, "batch_stats": ustate.batch_stats}
    pipe = PipelineConfig(grid=grid)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(bs, vae_cfg.latent_dim)).astype(np.float32))
    cond = jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, bs)])

    results = {"batch_size": bs, "grid": d}

    # --- stage 1: decode ---
    @jax.jit
    def decode(z, cond):
        return vae.apply(vae_vars, z, cond, method=type(vae).decode)

    t = chain_time(
        decode, (z, cond),
        lambda a, out: (a[0] + 1e-30 * jnp.sum(out[:, 0, 0, 0, 0]), a[1]),
    )
    results["decode_ms"] = round(1000 * t, 2)
    M = decode(z, cond)

    # --- stage 2: unet fwd + argmax/threshold ---
    @jax.jit
    def segment(M):
        soft, sig = unet.apply(unet_vars, M, train=False)
        labels = jnp.argmax(soft, axis=-1)
        binary = (jax.nn.sigmoid(sig[..., 0]) > pipe.binary_threshold).astype(
            jnp.int32
        )
        return labels, binary

    t = chain_time(
        segment, (M,),
        lambda a, out: (a[0] + 1e-30 * jnp.sum(out[1][:, 0, 0, 0])[None, None, None, None, None].astype(a[0].dtype),),
    )
    results["segment_ms"] = round(1000 * t, 2)
    labels, binary = segment(M)

    # --- stage 3: extraction (production fused settings) ---
    from icsg3d_tpu.ops.extract import extract_atoms_batch

    @jax.jit
    def extract(den, lab, binary):
        return extract_atoms_batch(
            den, jnp.where(binary > 0, lab, 0), binary,
            max_atoms=64, method="binary", erosion_levels=1,
            vote_classes=unet_cfg.num_classes,
        )

    den = M[..., 0]
    t = chain_time(
        extract, (den, labels, binary),
        lambda a, out: (
            a[0] + 1e-30 * jnp.sum(out[1][:, 0, 0])[None, None, None].astype(a[0].dtype),
            a[1], a[2],
        ),
    )
    results["extract_ms"] = round(1000 * t, 2)

    # --- full fused program ---
    from icsg3d_tpu.apps.generate import fused_generate_fn

    step = fused_generate_fn(vae, vae_vars, unet, unet_vars, pipe, max_atoms=64)
    t = chain_time(
        step, (z, cond),
        lambda a, out: (a[0] + 1e-30 * jnp.sum(out[2]), a[1]),
    )
    results["fused_ms"] = round(1000 * t, 2)
    results["fused_samples_per_sec"] = round(bs / t, 1)

    print(json.dumps(results, indent=1))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "output", "ns10k", "profile_fused.json",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
