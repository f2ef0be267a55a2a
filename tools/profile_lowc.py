"""Per-layer cost of the low-channel 64^3 convs that dominate the VAE.

Times (chained, bs=PROFILE_BS or 48):
  enc1_bf16    conv 44->16 @ 64^3 bf16 (the encoder's first conv: 57% of
               VAE forward FLOPs)
  dec_bf16     conv 32->16 @ 64^3 bf16 (decoder's last hidden conv)
  out_f32      conv 16->4  @ 64^3 float32 (the f32 output head as-is)
  out_bf16     conv 16->4  @ 64^3 bf16 inputs (f32 accumulation)
  enc1_wpack   conv 44->16 @ 64^3 as a W-packed matmul in plain XLA:
               output lanes = (8 w-offsets x 16 cout) = 128, K = 3*3*10*44
               (the kernel-form candidate, measured in XLA first)

Writes output/ns10k/profile_lowc.json.
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

PEAK_BF16 = 197e12


def chain_time(fn, args, n=10, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)

    def chain(a, o):
        bump = (1e-30 * jnp.sum(o)).astype(a[0].dtype)
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


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def main():
    bs = int(os.environ.get("PROFILE_BS", "48"))
    d = 64
    rng = np.random.default_rng(0)
    results = {"bs": bs, "d": d}

    def bench(name, cin, cout, dtype, fn=None):
        x = jnp.asarray(rng.random((bs, d, d, d, cin), np.float32)).astype(dtype)
        w = jnp.asarray(
            rng.random((3, 3, 3, cin, cout), np.float32) * 0.1
        ).astype(dtype)
        f = jax.jit(fn if fn is not None else conv3d)
        t = chain_time(f, (x, w))
        gf = 2 * bs * d**3 * 27 * cin * cout / 1e9
        results[name] = {
            "ms": round(1e3 * t, 2),
            "gflops": round(gf, 1),
            "pct_bf16_peak": round(100 * gf / 1e9 * 1e18 / t / PEAK_BF16, 1),
        }
        print(name, results[name], flush=True)

    bench("enc1_bf16", 44, 16, jnp.bfloat16)
    bench("dec_bf16", 32, 16, jnp.bfloat16)
    bench("out_f32", 16, 4, jnp.float32)
    bench("out_bf16", 16, 4, jnp.bfloat16)

    # W-packed formulation in plain XLA: y[b,z,y,wt,(wo,co)] via one matmul
    # with K = 3*3*(8+2)*Cin.  Build the patch tensor with static slices of
    # a zero-padded input; let XLA decide fusion.  FLOP inflation 10/3.
    cin, cout, fw = 44, 16, 8

    def wpack(x, wp):
        # x: (B, D, H, W, Cin) bf16; wp: (K, fw*Cout) packed weights
        B = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        # patches: for each output (z,y,wt): input block (3, 3, fw+2, Cin)
        nwt = d // fw
        # gather strided width tiles: xp width index = wt*fw + (0..fw+1)
        xt = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(xp, i * fw, fw + 2, axis=3)
                for i in range(nwt)
            ],
            axis=3,
        )  # (B, D+2, H+2, nwt, fw+2, Cin)
        # build K = 3*3*(fw+2)*Cin patches per (z, y, wt)
        pz = jnp.stack([xt[:, i : i + d] for i in range(3)], axis=-3)
        # (B, D, H+2, nwt, 3, fw+2, Cin)
        py = jnp.stack([pz[:, :, i : i + d] for i in range(3)], axis=-3)
        # (B, D, H, nwt, 3, 3, fw+2, Cin)
        K = 3 * 3 * (fw + 2) * cin
        patches = py.reshape(B * d * d * nwt, K)
        y = patches @ wp
        return y.reshape(B, d, d, nwt * fw, cout)

    x = jnp.asarray(rng.random((bs, d, d, d, cin), np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.random((3, 3, 3, cin, cout), np.float32) * 0.1)
    # packed weights: (K, fw*Cout); entry ((kz,ky,wi,ci),(wo,co)) =
    # w[kz,ky,wi-wo,ci,co] when 0 <= wi-wo < 3 else 0
    K = 3 * 3 * (fw + 2) * cin
    wz = np.zeros((3, 3, fw + 2, cin, fw, cout), np.float32)
    wnp = np.asarray(w, np.float32)
    for wo in range(fw):
        wz[:, :, wo : wo + 3, :, wo, :] = wnp
    wp = jnp.asarray(wz.reshape(K, fw * cout)).astype(jnp.bfloat16)

    # correctness vs XLA conv
    y_ref = conv3d(x.astype(jnp.float32), w.astype(jnp.float32))
    y_w = jax.jit(wpack)(x, wp)
    err = float(
        jnp.max(jnp.abs(y_w.astype(jnp.float32) - y_ref))
        / jnp.max(jnp.abs(y_ref))
    )
    f = jax.jit(wpack)
    t = chain_time(f, (x, wp))
    gf = 2 * bs * d**3 * 27 * cin * cout / 1e9
    results["enc1_wpack"] = {
        "ms": round(1e3 * t, 2),
        "useful_gflops": round(gf, 1),
        "pct_bf16_peak_useful": round(100 * gf / 1e9 * 1e18 / t / PEAK_BF16, 1),
        "rel_err_vs_f32": err,
    }
    print("enc1_wpack", results["enc1_wpack"], flush=True)

    print(json.dumps(results, indent=1))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "output", "ns10k", "profile_lowc.json",
        ),
        "w",
    ) as fo:
        json.dump(results, fo, indent=1)


if __name__ == "__main__":
    main()
