"""Per-shape timing of the VAE's low-channel 3D convs: XLA vs Pallas.

The 64^3 profile decomposition (output/ns10k/profile64.json) shows the
VAE's own forward running at 8.3% MFU while the frozen perceptual U-Net
piece runs at 48% — the gap is the VAE's small channel counts (4..128)
underfilling the MXU's 128-wide lanes.  This tool times every conv shape
in the VAE encoder/decoder (at 32^3 and 64^3 geometry) individually so
the optimization target list is measured, not guessed.

    python tools/lowc_shapes_bench.py --bs 48 --d 64
    python tools/lowc_shapes_bench.py --pallas   # include the lowc kernel

Writes output/ns10k/lowc_shapes.json.
"""

from __future__ import annotations

import argparse
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

PEAK = 197e12


def vae_conv_shapes(d: int, cond_ch: int = 10):
    """(name, spatial, cin, cout) for every conv in the VAE fwd at grid d."""
    filters = (16, 32, 64, 128)
    shapes = []
    s = d
    cin = 4 + cond_ch
    for i, f in enumerate(filters):
        shapes.append((f"enc{i}", s, cin, f))
        cin = f
        s //= 2
    shapes.append(("enc_head", s, 128, 4))
    start = d // 2 ** (len(filters) - 1)
    c0 = max(256 // start**3, 1)
    s = start
    cin = c0
    for i, f in enumerate(reversed(filters)):
        shapes.append((f"dec{i}", s, cin, f))
        cin = f
        if i < len(filters) - 1:
            s *= 2
    shapes.append(("dec_out", s, filters[0], 4))
    return shapes


def chain_time(fn, x, *rest, n=20, warmup=1):
    """Time fn via an in-jit fori_loop chain: n dependent executions inside
    ONE dispatch, so the tunnel's multi-ms per-call overhead amortizes away
    (independent dispatches also measure bogusly fast — see CLAUDE.md).

    rest operands are jit ARGUMENTS, not closure constants: a closed-over
    multi-hundred-MB cotangent tensor gets embedded in the HLO and the
    remote compile helper rejects the request (HTTP 413)."""

    @jax.jit
    def loop(x, *rest):
        def body(_, x):
            out = fn(x, *rest)
            return x * (1 + 1e-30 * jnp.sum(out[..., :1]).astype(x.dtype))
        return jax.lax.fori_loop(0, n, body, x)

    y = loop(x, *rest)
    jax.device_get(y.ravel()[0])
    for _ in range(warmup):
        y = loop(y, *rest)
    jax.device_get(y.ravel()[0])
    t0 = time.perf_counter()
    y = loop(y, *rest)
    jax.device_get(y.ravel()[0])
    return (time.perf_counter() - t0 - 0.004) / n  # ~4ms dispatch floor


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def xla_conv_nopref(x, w):
    # no preferred_element_type: under jax.grad it would make the
    # cotangent f32 against a bf16 kernel (the lax.conv transpose-rule
    # dtype trap documented in models/layers.py)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def fwd_bwd(conv):
    """fn(x, w) -> dx (with dw kept live): times forward+dx+dw in one
    jitted program — the per-shape decomposition of the round-3 finding
    that the Pallas backward loses to XLA's kernel-gradient conv."""

    def f(x, w):
        dx, dw = jax.grad(
            lambda a, b: jnp.sum(conv(a, b).astype(jnp.float32)),
            argnums=(0, 1),
        )(x, w)
        return dx + (1e-30 * jnp.sum(dw)).astype(dx.dtype)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=48)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--raw", action="store_true",
                    help="also time the ndcs-layout kernel w/o transposes")
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+dx+dw: XLA kernel-grad conv vs the "
                         "Pallas custom-vjp (conv_ndcs) per shape")
    ap.add_argument("--passes", action="store_true",
                    help="time each pass (fwd/dx/dw) x each implementation "
                         "(pallas/xla-with-transposes) separately — the "
                         "measurement behind the per-pass dispatch table "
                         "(VERDICT r4 item 5)")
    ap.add_argument("--write-dispatch", action="store_true",
                    help="write the measured per-pass winners to "
                         "icsg3d_tpu/ops/conv_dispatch.json (implies "
                         "--passes)")
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--out", default="output/ns10k/lowc_shapes.json")
    args = ap.parse_args()

    if args.write_dispatch:
        args.passes = True

    rng = np.random.default_rng(0)
    rows = []
    for name, s, cin, cout in vae_conv_shapes(args.d):
        if args.only and args.only not in name:
            continue
        x = jnp.asarray(
            rng.standard_normal((args.bs, s, s, s, cin)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, jnp.float32
        )
        gf = 2 * args.bs * s**3 * 27 * cin * cout / 1e9
        row = {"name": name, "s": s, "cin": cin, "cout": cout,
               "gflops": round(gf, 2)}
        try:
            dt = chain_time(xla_conv, x, w)
            row["xla_ms"] = round(dt * 1e3, 3)
            row["xla_pct_peak"] = round(100 * gf / 1e3 / dt / (PEAK / 1e12), 1)
        except Exception as e:  # noqa: BLE001
            row["xla_error"] = str(e)[:200]
        if args.pallas:
            try:
                from icsg3d_tpu.ops.lowc_conv import conv3d_lowc

                fn = conv3d_lowc
                y_ref = jax.jit(xla_conv)(x, w)
                y = jax.jit(fn)(x, w)
                err = float(
                    jnp.max(jnp.abs(y.astype(jnp.float32)
                                    - y_ref.astype(jnp.float32)))
                )
                dt = chain_time(fn, x, w)
                row["pallas_ms"] = round(dt * 1e3, 3)
                row["pallas_pct_peak"] = round(
                    100 * gf / 1e3 / dt / (PEAK / 1e12), 1
                )
                row["pallas_max_err"] = err
                if "xla_ms" in row:
                    row["pallas_speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
            except Exception as e:  # noqa: BLE001
                row["pallas_error"] = str(e)[:300]
        if args.grad:
            gf3 = 3 * gf  # fwd + dx + dw, each ~the forward's FLOPs
            try:
                dt = chain_time(fwd_bwd(xla_conv_nopref), x, w)
                row["xla_grad_ms"] = round(dt * 1e3, 3)
                row["xla_grad_pct_peak"] = round(
                    100 * gf3 / 1e3 / dt / (PEAK / 1e12), 1
                )
            except Exception as e:  # noqa: BLE001
                row["xla_grad_error"] = str(e)[:200]
            try:
                from icsg3d_tpu.ops.lowc_conv import conv_ndcs, to_ndcs

                xt = to_ndcs(x)
                bz = jnp.zeros((cout,), jnp.float32)
                conv = lambda a, ww: conv_ndcs(a, ww, bz, (s, s))  # noqa: E731
                dt = chain_time(fwd_bwd(conv), xt, w)
                row["ndcs_grad_ms"] = round(dt * 1e3, 3)
                row["ndcs_grad_pct_peak"] = round(
                    100 * gf3 / 1e3 / dt / (PEAK / 1e12), 1
                )
                if "xla_grad_ms" in row:
                    row["grad_speedup"] = round(
                        row["xla_grad_ms"] / row["ndcs_grad_ms"], 3
                    )
            except Exception as e:  # noqa: BLE001
                row["ndcs_grad_error"] = str(e)[:300]
        if args.passes:
            from icsg3d_tpu.ops.lowc_conv import (
                _flip_w, _xla_conv_ndcs, _xla_dw_ndcs, conv3d_lowc_ndcs,
                conv3d_lowc_ndcs_dw, conv_pass_fits, lowc_supported,
                pack_weights,
            )

            if not lowc_supported(s, s):
                row["passes"] = "unsupported_plane"
            else:
                fits = conv_pass_fits(cin, cout, s, s)
                xt = jnp.asarray(
                    rng.standard_normal((args.bs, s, cin, s * s)),
                    jnp.bfloat16,
                )
                gt = jnp.asarray(
                    rng.standard_normal((args.bs, s, cout, s * s)),
                    jnp.bfloat16,
                )
                bz = jnp.zeros((cout,), jnp.float32)
                wt = pack_weights(w).astype(jnp.bfloat16)
                wft = pack_weights(_flip_w(w)).astype(jnp.bfloat16)
                bz2 = jnp.zeros((cout, 1), jnp.float32)
                bz2i = jnp.zeros((cin, 1), jnp.float32)
                cases = {
                    # fwd: x already resident in ndcs — no entry transpose
                    "fwd_pallas": (
                        (lambda a, ww: conv3d_lowc_ndcs(a, ww, bz2, W=s)),
                        (xt, wt), fits[0]),
                    "fwd_xla": (
                        (lambda a, ww: _xla_conv_ndcs(a, ww, bz, (s, s))),
                        (xt, w), True),
                    # dx: cotangent g in ndcs -> dx in ndcs
                    "dx_pallas": (
                        (lambda a, ww: conv3d_lowc_ndcs(a, ww, bz2i, W=s)),
                        (gt, wft), fits[1]),
                    "dx_xla": (
                        (lambda a, ww: _xla_conv_ndcs(a, ww, None, (s, s))),
                        (gt, _flip_w(w)), True),
                    # dw: (x, g) in ndcs -> (3,3,3,cin,cout)
                    "dw_pallas": (
                        (lambda a, gg: conv3d_lowc_ndcs_dw(a, gg, W=s)),
                        (xt, gt), fits[2]),
                    "dw_xla": (
                        (lambda a, gg: _xla_dw_ndcs(
                            a, gg, (3, 3, 3, cin, cout), (s, s))),
                        (xt, gt), True),
                }
                for cname, (fn, fargs, fit) in cases.items():
                    if not fit:
                        row[cname + "_ms"] = None
                        continue
                    try:
                        dt = chain_time(fn, *fargs)
                        row[cname + "_ms"] = round(dt * 1e3, 3)
                    except Exception as e:  # noqa: BLE001
                        row[cname + "_error"] = str(e)[:200]
                        row[cname + "_ms"] = None
                winners = []
                for p in ("fwd", "dx", "dw"):
                    pm = row.get(f"{p}_pallas_ms")
                    xm = row.get(f"{p}_xla_ms")
                    # prefer pallas within a 10% margin: the isolated
                    # xla timings include their own transposes, but
                    # in-graph they also break fusion around neighboring
                    # ndcs ops — marginal isolated wins did not survive
                    # the whole-step A/B (round-5 measurement)
                    if pm is not None and (xm is None or pm <= 1.1 * xm):
                        winners.append("pallas")
                    else:
                        winners.append("xla")
                row["pass_winners"] = winners
        if args.raw:
            try:
                from icsg3d_tpu.ops.lowc_conv import (
                    conv3d_lowc_ndcs, pack_weights,
                )

                xt = jnp.asarray(
                    rng.standard_normal((args.bs, s, cin, s * s)),
                    jnp.bfloat16,
                )
                wt = pack_weights(w).astype(jnp.bfloat16)
                bz = jnp.zeros((cout, 1), jnp.float32)
                fn = lambda a, ww: conv3d_lowc_ndcs(a, ww, bz, W=s)  # noqa: E731
                jax.jit(fn)(xt, wt)
                dt = chain_time(fn, xt, wt)
                row["raw_ms"] = round(dt * 1e3, 3)
                row["raw_pct_peak"] = round(
                    100 * gf / 1e3 / dt / (PEAK / 1e12), 1
                )
            except Exception as e:  # noqa: BLE001
                row["raw_error"] = str(e)[:200]
        rows.append(row)
        print(json.dumps(row))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)

    if args.write_dispatch:
        import datetime

        table = {}
        for row in rows:
            if "pass_winners" not in row:
                continue
            key = f"{row['cin']},{row['cout']},{row['s']},{row['s']}"
            table[key] = row["pass_winners"]
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "icsg3d_tpu", "ops", "conv_dispatch.json",
        )
        # merge: shapes measured at other -d values stay
        try:
            with open(path) as f:
                prev = json.load(f)["table"]
        except (OSError, ValueError, KeyError):
            prev = {}
        prev.update(table)
        with open(path, "w") as f:
            json.dump(
                {
                    "table": prev,
                    "meta": {
                        "bs": args.bs, "d": args.d,
                        "platform": jax.devices()[0].platform,
                        "written": datetime.datetime.now().isoformat(
                            timespec="seconds"),
                    },
                },
                f, indent=1,
            )
        print(f"dispatch table ({len(prev)} shapes) -> {path}")


if __name__ == "__main__":
    main()
