"""Pallas-vs-XLA benchmark for the fused decoder conv (VERDICT item 8).

Shapes: the U-Net's final decoder level (conv13/14) — 3^3 conv at full
32^3 resolution with 128->128 channels, the largest FLOP share of the
perceptual/segmentation forward — plus the 64^3 variant.

    python tools/pallas_conv_bench.py --out output/pallas_conv.json
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


def bench_chained(fn, x, w, scale, shift, n=20):
    """Time n CHAINED applications (x -> fn(x)) inside one jit program.

    Independent repeated calls measured absurd >100%-of-peak rates over the
    tunneled device (async dispatch artifact); chaining forces every
    iteration onto the critical path, so wall-clock/n is the true per-call
    latency.  Requires C == Cout."""

    @jax.jit
    def chain(x0):
        def body(_, xx):
            return fn(xx, w, scale, shift)

        return jax.lax.fori_loop(0, n, body, x0)

    out = chain(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from icsg3d_tpu.ops.pallas_conv import (
        conv3d_bn_relu_pallas,
        conv3d_bn_relu_xla,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_FLOPS.get(gen, PEAK_FLOPS["v5e"])
    rng = np.random.default_rng(0)
    rows = []
    # all square (C == Cout) so iterations can chain
    cases = [
        ("unet_dec_32c128", 16, 32, 128),
        ("unet_dec_32c128_bs32", 32, 32, 128),
        ("unet_enc_32c64", 16, 32, 64),
        ("vae_64c16", 16, 64, 16),
        ("unet_dec_64c128", 4, 64, 128),
    ]
    for name, B, d, C in cases:
        x = jnp.asarray(
            rng.normal(size=(B, d, d, d, C)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.bfloat16
        )
        scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
        shift = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
        flops = 2 * B * d**3 * 27 * C * C
        row = {"case": name, "B": B, "d": d, "C": C,
               "gflops": round(flops / 1e9, 1)}
        for label, fn in (
            ("xla", conv3d_bn_relu_xla), ("pallas", conv3d_bn_relu_pallas)
        ):
            try:
                dt = bench_chained(fn, x, w, scale, shift)
                row[f"{label}_ms"] = round(dt * 1e3, 3)
                row[f"{label}_pct_peak"] = round(100 * flops / dt / peak, 1)
            except Exception as e:
                row[f"{label}_error"] = str(e)[:160]
        if "xla_ms" in row and "pallas_ms" in row:
            row["pallas_speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
        print(json.dumps(row), flush=True)
        rows.append(row)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
