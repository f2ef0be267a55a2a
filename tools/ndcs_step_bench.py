"""Full DFC-VAE train-step throughput: ndhwc (XLA convs) vs ndcs (Pallas).

The per-shape numbers (output/ns10k/lowc_shapes64.json) show the
tap-packed kernel beating XLA on the 64^3 decoder convs; this tool
answers the question that decides the production default: does the
whole jitted train step (VAE fwd+bwd + two frozen perceptual U-Net
forwards + Adam) get faster end-to-end in the spatial-major layout?

    python tools/ndcs_step_bench.py                  # both geometries
    NDCS_BENCH_CONFIGS=64 python tools/ndcs_step_bench.py

Timing is chained through the donated train state (the axon tunnel's
async dispatch makes independent repeated calls measure impossibly
fast — see utils/profiling.py), with a host fetch as the barrier.

Writes output/ns10k/ndcs_step.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

PEAK_BF16 = 197e12  # v5e

# (d, batch_size): the production 32^3 point and the BASELINE "scaled
# 64^3 grids" config at its measured-best batch (tools/opt64.py).
CONFIGS = {"32": (32, 128), "64": (64, 48)}


def bench_config(d: int, bs: int, layout: str, n_steps: int = 20):
    from icsg3d_tpu.config import GridSpec, TrainConfig, UNetConfig, VAEConfig
    from icsg3d_tpu.train.unet import create_unet_state
    from icsg3d_tpu.train.vae import create_vae_state, make_vae_steps

    grid = GridSpec(d=d)
    # "mixed" = VAE in the spatial-major Pallas layout (its own low-channel
    # convs are XLA's weak spot — 8.3% MFU at 64^3 per profile64), frozen
    # perceptual U-Net in ndhwc (where XLA already runs it at ~48%).  The
    # VAE emits NDHWC recon at its boundary, so the layouts compose freely.
    vae_layout = "ndcs" if layout == "mixed" else layout
    unet_layout = "ndhwc" if layout == "mixed" else layout
    vae_cfg = VAEConfig(grid=grid, layout=vae_layout)
    unet_cfg = UNetConfig(layout=unet_layout)
    tc = TrainConfig(batch_size=bs, learning_rate=5e-4)

    vae, state = create_vae_state(vae_cfg, tc, jax.random.key(0))
    unet, ustate = create_unet_state(unet_cfg, tc, jax.random.key(1), grid_d=d)
    train_step, _ = make_vae_steps(
        vae, unet, {"params": ustate.params, "batch_stats": ustate.batch_stats}
    )

    rng = np.random.default_rng(0)
    batch = {
        "x": jax.numpy.asarray(
            rng.random((bs, d, d, d, 4)).astype(np.float32)
        ),
        "cond": jax.numpy.asarray(
            np.eye(10, dtype=np.float32)[rng.integers(0, 10, bs)]
        ),
    }
    key = jax.random.key(0)

    try:
        cost = train_step.lower(state, batch, key).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops = 0.0

    for _ in range(3):  # compile + warm
        state, mets = train_step(state, batch, key)
    jax.device_get(mets["loss"])

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, mets = train_step(state, batch, key)
    jax.device_get(mets["loss"])  # host fetch = real barrier over the tunnel
    dt = (time.perf_counter() - t0) / n_steps

    return {
        "layout": layout,
        "d": d,
        "batch_size": bs,
        "step_ms": round(1e3 * dt, 2),
        "grids_per_sec": round(bs / dt, 1),
        "mfu": round(flops / dt / PEAK_BF16, 4) if flops else None,
        "flops_per_step": flops,
    }


def bench_unet(d: int, bs: int, layout: str, n_steps: int = 20):
    """U-Net train step (the perceptual net's own training config)."""
    from icsg3d_tpu.config import TrainConfig, UNetConfig
    from icsg3d_tpu.train.unet import create_unet_state, make_unet_steps

    unet_cfg = UNetConfig(layout=layout)
    tc = TrainConfig(batch_size=bs, learning_rate=3e-6)
    unet, state = create_unet_state(unet_cfg, tc, jax.random.key(1), grid_d=d)
    class_weights = np.ones(unet_cfg.num_classes, np.float32)
    train_step, _ = make_unet_steps(unet, jax.numpy.asarray(class_weights))

    rng = np.random.default_rng(0)
    batch = {
        "x": jax.numpy.asarray(rng.random((bs, d, d, d, 4), np.float32)),
        "labels": jax.numpy.asarray(
            rng.integers(0, 95, (bs, d, d, d)).astype(np.int32)
        ),
    }
    try:
        cost = train_step.lower(state, batch).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops = 0.0
    for _ in range(3):
        state, mets = train_step(state, batch)
    jax.device_get(mets["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, mets = train_step(state, batch)
    jax.device_get(mets["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    return {
        "layout": layout,
        "d": d,
        "batch_size": bs,
        "step_ms": round(1e3 * dt, 2),
        "grids_per_sec": round(bs / dt, 1),
        "mfu": round(flops / dt / PEAK_BF16, 4) if flops else None,
    }


def bench_generate(layout: str, d: int = 32, bs: int = 128, n: int = 10):
    """Fused decode->segment->extract generation program (bench.py's
    secondary headline), per layout."""
    import jax.numpy as jnp

    from icsg3d_tpu.apps.generate import fused_generate_fn
    from icsg3d_tpu.config import (
        GridSpec, PipelineConfig, TrainConfig, UNetConfig, VAEConfig,
    )
    from icsg3d_tpu.train.unet import create_unet_state
    from icsg3d_tpu.train.vae import create_vae_state

    grid = GridSpec(d=d)
    tc = TrainConfig(batch_size=bs, learning_rate=5e-4)
    vae, state = create_vae_state(
        VAEConfig(grid=grid, layout=layout), tc, jax.random.key(0)
    )
    unet, ustate = create_unet_state(
        UNetConfig(layout=layout), tc, jax.random.key(1), grid_d=d
    )
    gen_step = fused_generate_fn(
        vae, {"params": state.params, "batch_stats": state.batch_stats},
        unet, {"params": ustate.params, "batch_stats": ustate.batch_stats},
        PipelineConfig(grid=grid), max_atoms=64,
    )
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(bs, vae.cfg.latent_dim)).astype(np.float32))
    cond = jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, bs)])
    # the ONE shared generation-timing harness (bench.py uses the same);
    # round 2's hand-rolled loop here warmed only the gen program, so the
    # chain's eager-op compiles landed inside the timed region and this
    # tool read 2.2x slower than bench.py on the identical program
    from icsg3d_tpu.utils.profiling import generation_rate

    r = generation_rate(gen_step, z, cond, iters=n)
    return {
        "layout": layout, "model": "fused_generate", "d": d,
        "batch_size": bs, **r,
    }


LAYOUTS = tuple(
    s.strip()
    for s in os.environ.get("NDCS_BENCH_LAYOUTS", "ndhwc,ndcs").split(",")
)


def main():
    which = os.environ.get("NDCS_BENCH_CONFIGS", "32,64").split(",")
    bs_override = os.environ.get("NDCS_BENCH_BS")  # batch-size sweeps
    results = {"platform": jax.devices()[0].platform}
    prior = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "output", "ns10k", "ndcs_step.json",
    )
    if os.path.exists(prior):  # merge partial runs (layout/config filters)
        with open(prior) as f:
            stale = json.load(f)
        stale.pop("platform", None)  # never let a stale run's platform
        results.update(stale)        # masquerade as this run's
    for key in which:
        d, bs = CONFIGS[key.strip()]
        if bs_override:
            bs = int(bs_override)
        for layout in LAYOUTS:
            try:
                r = bench_config(d, bs, layout)
            except Exception as e:  # record, keep going
                r = {"layout": layout, "d": d, "error": repr(e)[:500]}
            name = f"d{d}_{layout}" if not bs_override else \
                f"d{d}_{layout}_bs{bs}"
            results[name] = r
            print(json.dumps(r), flush=True)
    if os.environ.get("NDCS_BENCH_UNET", "1") == "1":
        for layout in LAYOUTS:
            try:
                r = bench_unet(32, 128, layout)
            except Exception as e:
                r = {"layout": layout, "model": "unet", "error": repr(e)[:500]}
            results[f"unet32_{layout}"] = r
            print(json.dumps(r), flush=True)
    if os.environ.get("NDCS_BENCH_GEN", "1") == "1":
        for layout in LAYOUTS:
            try:
                r = bench_generate(layout)
            except Exception as e:
                r = {"layout": layout, "model": "fused_generate",
                     "error": repr(e)[:500]}
            results[f"gen32_{layout}"] = r
            print(json.dumps(r), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "output", "ns10k", "ndcs_step.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
