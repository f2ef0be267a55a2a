"""64^3 single-chip optimization experiments (VERDICT round-1 item 3).

Times the full DFC-VAE train step at 64^3 under an option grid —
batch size x selective perceptual remat — and reports ms/step, grids/s,
and MFU from XLA's own cost analysis.  Optionally dumps a profiler trace
and per-component timings (VAE-only step, perceptual forward alone) so the
MFU gap decomposes into where the time actually goes.

    python tools/opt64.py                      # full sweep
    python tools/opt64.py --bs 16 --trace DIR  # one point + profile trace
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = {"v5e": 197e12, "v5p": 459e12, "v4": 275e12, "v6e": 918e12}


def time_step(step, state, batch, key, n_steps=10):
    for _ in range(2):
        state, mets = step(state, batch, key)
    jax.block_until_ready(mets["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, mets = step(state, batch, key)
    jax.block_until_ready(mets["loss"])
    return (time.perf_counter() - t0) / n_steps, state


def flops_of(step, *args):
    try:
        cost = step.lower(*args).compile().cost_analysis()
        return float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        return 0.0


def main(argv=None):
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig, VAEConfig
    from icsg3d_tpu.parallel import make_mesh, shard_batch
    from icsg3d_tpu.train.unet import create_unet_state
    from icsg3d_tpu.train.vae import (
        _perceptual_features,
        create_vae_state,
        make_vae_steps,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--bs", type=int, default=None,
                   help="single batch size instead of the sweep")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--layout", default="ndhwc", choices=("ndhwc", "ndcs"),
                   help="VAE conv layout: ndcs = spatial-major Pallas path")
    p.add_argument("--trace", default=None, help="profiler trace dir")
    p.add_argument("--components", action="store_true",
                   help="also time VAE-only and perceptual-only pieces")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    d = args.d
    grid = GridSpec(d=d)
    vae_cfg = VAEConfig(grid=grid, layout=args.layout)
    unet_cfg = UNetConfig()
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_FLOPS.get(gen, PEAK_FLOPS["v5e"])
    mesh = make_mesh()
    n_chips = len(jax.devices())
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    def build(bs, remat):
        tc = TrainConfig(batch_size=bs, learning_rate=5e-4)
        vae, state = create_vae_state(vae_cfg, tc, jax.random.key(0))
        unet, ustate = create_unet_state(
            unet_cfg, tc, jax.random.key(1), grid_d=d
        )
        uvars = {"params": ustate.params, "batch_stats": ustate.batch_stats}
        step, _ = make_vae_steps(vae, unet, uvars, remat_perceptual=remat)
        batch = shard_batch(
            {
                "x": rng.random((bs, d, d, d, 4)).astype(np.float32),
                "cond": np.eye(10, dtype=np.float32)[
                    rng.integers(0, 10, bs)
                ],
            },
            mesh,
        )
        return vae, unet, uvars, step, state, batch

    results = []
    points = (
        [(args.bs, args.remat)] if args.bs
        else [(bs, rm) for rm in (False, True) for bs in (8, 16, 24, 32, 48)]
    )
    for bs, remat in points:
        try:
            vae, unet, uvars, step, state, batch = build(bs, remat)
            flops = flops_of(step, state, batch, key)
            dt, state = time_step(step, state, batch, key)
            row = {
                "bs": bs, "remat": remat, "layout": args.layout,
                "ms_per_step": round(dt * 1e3, 2),
                "grids_per_sec": round(bs / dt / n_chips, 1),
                "mfu": round(flops / dt / (peak * n_chips), 4) if flops else None,
                "flops_per_step": flops,
            }
            if args.trace:
                with jax.profiler.trace(args.trace):
                    for _ in range(3):
                        state, mets = step(state, batch, key)
                    jax.block_until_ready(mets["loss"])
            print(json.dumps(row), flush=True)
            results.append(row)
        except Exception as e:
            row = {"bs": bs, "remat": remat, "error": str(e)[:200]}
            print(json.dumps(row), flush=True)
            results.append(row)

    if args.components:
        bs = args.bs or 16
        vae, unet, uvars, _, state, batch = build(bs, False)
        # VAE-only (no perceptual) train step
        step_novae, _ = make_vae_steps(vae, None, None)
        fl = flops_of(step_novae, state, batch, key)
        dt, _ = time_step(step_novae, state, batch, key)
        results.append({"component": "vae_only_step", "bs": bs,
                        "ms": round(dt * 1e3, 2),
                        "mfu": round(fl / dt / peak, 4) if fl else None})
        # single perceptual forward
        taps = vae_cfg.perceptual_taps

        @jax.jit
        def pf(x):
            return _perceptual_features(unet, uvars, x, taps)

        x = batch["x"]
        fl = flops_of(pf, x)
        for _ in range(2):
            out = pf(x)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = pf(x)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / 10
        results.append({"component": "perceptual_forward", "bs": bs,
                        "ms": round(dt * 1e3, 2),
                        "mfu": round(fl / dt / peak, 4) if fl else None})
        print(json.dumps(results[-2:]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
