"""AOT memory analysis of the whole-epoch lax.scan VAE program.

Reproduces the round-4 compile-OOM (24.07 G needed vs 15.75 G HBM,
output/ns10k/vaefb_scan.log) WITHOUT executing anything: builds the
flagship ns10k configuration's train_epoch program from
ShapeDtypeStructs, compiles it, and prints XLA's memory breakdown
(arguments / outputs / temporaries / peak).  Use to price structural
fixes (VERDICT r4 item 3) instead of burning chip HBM on trial runs.

  python tools/scan_mem_probe.py [--no-cache] [--steps N] [--n N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8000,
                   help="resident train-split samples (ns10k: 8000)")
    p.add_argument("--steps", type=int, default=None,
                   help="scan trip count (default n // batch)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--no-cache", action="store_true",
                   help="price the program without the feature cache")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="price with remat_perceptual=True")
    p.add_argument("--flat", action="store_true",
                   help="price the flat (N, K) resident-field layout "
                        "(the production epoch-scan path)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig, VAEConfig
    from icsg3d_tpu.train.unet import create_unet_state
    from icsg3d_tpu.train.vae import (
        _perceptual_features,
        create_vae_state,
        make_vae_epoch_fns,
    )

    d = args.d
    grid = GridSpec(d=d)
    vae_cfg = VAEConfig(grid=grid)
    unet_cfg = UNetConfig()
    tc = TrainConfig(batch_size=args.batch_size, learning_rate=5e-4)

    vae, state = create_vae_state(vae_cfg, tc, jax.random.key(0))
    unet, ustate = create_unet_state(
        unet_cfg, tc, jax.random.key(1), grid_d=d
    )
    # numpy-ify the closure-captured U-Net variables: lowering embeds them
    # as constants, and leaving them device-resident makes the lowering
    # fetch each one mid-trace (flaky while a campaign holds the chip)
    uvars = jax.tree_util.tree_map(
        np.asarray, {"params": ustate.params, "batch_stats": ustate.batch_stats}
    )
    n = args.n
    steps = args.steps or n // args.batch_size
    data = {
        "density": jax.ShapeDtypeStruct((n, d, d, d), jnp.float16),
        "abc": jax.ShapeDtypeStruct((n, 3), jnp.float32),
        "cond": jax.ShapeDtypeStruct((n, vae_cfg.cond_bins), jnp.float32),
    }
    if not args.no_cache:
        taps = jax.eval_shape(
            lambda xx: _perceptual_features(
                unet, uvars, xx, vae_cfg.perceptual_taps
            ),
            jax.ShapeDtypeStruct((1, d, d, d, grid.channels), jnp.float32),
        )
        for tap, t in zip(vae_cfg.perceptual_taps, taps):
            data[f"pfeat_{tap}"] = jax.ShapeDtypeStruct(
                (n,) + t.shape[1:], t.dtype
            )

    field_shapes = None
    if args.flat:
        field_shapes = {}
        flat = {}
        for k, v in data.items():
            if len(v.shape) >= 3:
                field_shapes[k] = v.shape[1:]
                flat[k] = jax.ShapeDtypeStruct(
                    (v.shape[0], int(np.prod(v.shape[1:]))), v.dtype
                )
            else:
                flat[k] = v
        data = flat
    train_epoch, _ = make_vae_epoch_fns(
        vae, unet, uvars, remat_perceptual=args.remat,
        field_shapes=field_shapes,
    )

    perm = jax.ShapeDtypeStruct((steps, args.batch_size), jnp.int32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    state_sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state
    )

    lowered = train_epoch.lower(state_sds, data, key, perm)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    GB = 1024 ** 3
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return
    print(f"platform: {jax.devices()[0].platform}")
    print(f"config: n={n} steps={steps} bs={args.batch_size} d={d} "
          f"cache={not args.no_cache} remat={args.remat}")
    for name in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, name, None)
        if v is not None:
            print(f"  {name}: {v / GB:.3f} GB")
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"  est peak (arg+out+temp-alias): {tot / GB:.3f} GB")


if __name__ == "__main__":
    main()
