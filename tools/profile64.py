"""Decompose the 64^3 VAE train step: where do the milliseconds go?

Times, at a given batch size (chained iterations, axon async trap):
  vae_fwd        VAE encode+decode forward only
  unet_fwd       one frozen perceptual U-Net forward
  vae_step_only  full train step with unet=None (mse+kld fwd+bwd+adam)
  full_step      the production DFC step (2 perceptual forwards + bwd)

and reports each piece's XLA-counted FLOPs so MFU per piece is explicit.
Writes output/ns10k/profile64.json.  Env knobs: PROFILE_BS, PROFILE_D,
PROFILE_LAYOUT=ndhwc|ndcs (spatial-major Pallas conv path).
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

from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig, VAEConfig
from icsg3d_tpu.train.unet import create_unet_state
from icsg3d_tpu.train.vae import create_vae_state, make_vae_steps, _perceptual_features

PEAK = 197e12  # v5e bf16


def chain_time(fn, args, n=10, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)

    def chain(a, o):
        lead = None
        for leaf in jax.tree_util.tree_leaves(o):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                lead = leaf
                break
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


def flops_of(fn, *args):
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return None


def main():
    bs = int(os.environ.get("PROFILE_BS", "48"))
    d = int(os.environ.get("PROFILE_D", "64"))
    layout = os.environ.get("PROFILE_LAYOUT", "ndhwc")
    grid = GridSpec(d=d)
    vae_cfg = VAEConfig(grid=grid, layout=layout)
    unet_cfg = UNetConfig()
    tc = TrainConfig()

    rng = jax.random.PRNGKey(0)
    unet, ustate = create_unet_state(unet_cfg, tc, rng, grid_d=d)
    uvars = {"params": ustate.params, "batch_stats": ustate.batch_stats}
    vae, state = create_vae_state(vae_cfg, tc, rng)

    x = jnp.asarray(
        np.random.default_rng(0).random((bs, d, d, d, 4), np.float32)
    )
    cond = jnp.zeros((bs, vae_cfg.cond_bins), jnp.float32)
    batch = {
        "density": x[..., 0], "coords": x[..., 1:], "cond": cond,
    }
    key = jax.random.PRNGKey(1)
    results = {"bs": bs, "d": d, "layout": layout}

    # 1. VAE forward
    def vae_fwd(x, cond, key):
        out, _ = vae.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, cond, key, train=True, mutable=["batch_stats"],
        )
        return out[0]

    jf = jax.jit(vae_fwd)
    t = chain_time(jf, (x, cond, key))
    fl = flops_of(vae_fwd, x, cond, key)
    results["vae_fwd"] = {
        "ms": round(1e3 * t, 2), "gflops": round((fl or 0) / 1e9, 1),
        "mfu": round((fl or 0) / t / PEAK, 4),
    }
    print("vae_fwd", results["vae_fwd"], flush=True)

    # 2. one perceptual U-Net forward
    def unet_fwd(x):
        return _perceptual_features(unet, uvars, x, vae_cfg.perceptual_taps)

    ju = jax.jit(unet_fwd)
    t = chain_time(ju, (x,))
    fl = flops_of(unet_fwd, x)
    results["unet_fwd"] = {
        "ms": round(1e3 * t, 2), "gflops": round((fl or 0) / 1e9, 1),
        "mfu": round((fl or 0) / t / PEAK, 4),
    }
    print("unet_fwd", results["unet_fwd"], flush=True)

    # 3. plain VAE step (no perceptual)
    step_plain, _ = make_vae_steps(vae, None, None)
    s2 = jax.tree_util.tree_map(lambda a: a.copy(), state)
    out = step_plain(s2, batch, key)
    jax.block_until_ready(out)
    s2, _ = out
    t0 = time.perf_counter()
    for _ in range(10):
        s2, mets = step_plain(s2, batch, key)
    jax.block_until_ready(s2.params)
    t = (time.perf_counter() - t0) / 10
    results["vae_step_plain"] = {"ms": round(1e3 * t, 2)}
    print("vae_step_plain", results["vae_step_plain"], flush=True)

    # 4. full DFC step
    step_full, _ = make_vae_steps(vae, unet, uvars)
    s3 = jax.tree_util.tree_map(lambda a: a.copy(), state)
    out = step_full(s3, batch, key)
    jax.block_until_ready(out)
    s3, _ = out
    t0 = time.perf_counter()
    for _ in range(10):
        s3, mets = step_full(s3, batch, key)
    jax.block_until_ready(s3.params)
    t = (time.perf_counter() - t0) / 10

    def full_loss_like(state_params, batch, key):
        from icsg3d_tpu.train.vae import _vae_losses
        return _vae_losses(
            vae, unet, uvars, state_params, state.batch_stats, batch, key,
            train=True,
        )[0]

    fl = flops_of(
        lambda p, b, k: jax.grad(
            lambda pp: full_loss_like(pp, b, k)
        )(p),
        state.params, batch, key,
    )
    results["full_step"] = {
        "ms": round(1e3 * t, 2), "gflops": round((fl or 0) / 1e9, 1),
        "mfu": round((fl or 0) / t / PEAK, 4),
    }
    print("full_step", results["full_step"], flush=True)

    print(json.dumps(results, indent=1))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "output", "ns10k", "profile64.json",
        ),
        "w",
    ) as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
