"""Primitive-level timings for the scatter-free extract redesign.

Times, vmapped over a 128 batch on the real chip:
  sort32k      jnp.sort of 32768 int32
  topk32k      lax.top_k(32769 f32, 64)
  match        (32768 x 64) equality matrix + any/argmax
  seg65        segment_sum with 65 segments, 32768 updates (small scatter)
  seg65x95     the production vote segment_sum (95-wide payload, 65 segs)
  votes_mm     the matmul replacement: match^T @ one_hot(spec, 95)
  gather32k    x[labels] voxel-space gather (32768 lookups)
  cumsum32k    inclusive cumsum over 32768 f32 (for sort-based run lengths)
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

BS = 128
N = 32768


def chain_time(fn, args, n=10, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)

    def chain(a, o):
        lead = jax.tree_util.tree_leaves(o)[0]
        bump = (0 * jnp.sum(lead)).astype(a[0].dtype)
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
    rng = np.random.default_rng(0)
    # realistic-ish labels: ~20 regions, root-voxel-index labels
    roots = np.sort(rng.choice(N, size=20, replace=False)).astype(np.int32)
    labels_np = roots[rng.integers(0, 20, (BS, N))].astype(np.int32)
    bg = rng.random((BS, N)) < 0.9  # 90% background
    labels_np = np.where(bg, N, labels_np)
    labels = jnp.asarray(labels_np)
    spec = jnp.asarray(rng.integers(0, 95, (BS, N)).astype(np.int32))
    scores = jnp.asarray(rng.random((BS, N + 1)).astype(np.float32))
    top_idx = jnp.asarray(
        np.tile(roots, (BS, 1))[:, :64]
        if len(roots) >= 64
        else np.pad(np.tile(roots, (BS, 1)), ((0, 0), (0, 64 - len(roots))))
    ).astype(jnp.int32)
    slot = jnp.asarray(rng.integers(0, 65, (BS, N)).astype(jnp.int32))
    w = jnp.asarray((rng.random((BS, N)) < 0.1).astype(np.float32))
    xf = jnp.asarray(rng.random((BS, N)).astype(np.float32))

    res = {}

    f = jax.jit(lambda l: jnp.sort(l, axis=-1))
    res["sort32k_ms"] = round(1000 * chain_time(f, (labels,)), 2)

    f = jax.jit(lambda s: jax.lax.top_k(s, 64))
    res["topk32k_ms"] = round(1000 * chain_time(f, (scores,)), 2)

    @jax.jit
    def match_fn(labels, top_idx):
        m = labels[:, :, None] == top_idx[:, None, :]
        in_any = jnp.any(m, axis=2)
        return jnp.where(in_any, jnp.argmax(m, axis=2), 64)

    res["match_ms"] = round(1000 * chain_time(match_fn, (labels, top_idx)), 2)

    @jax.jit
    def seg65(w, slot):
        return jax.vmap(
            lambda ww, ss: jax.ops.segment_sum(ww, ss, num_segments=65)
        )(w, slot)

    res["seg65_ms"] = round(1000 * chain_time(seg65, (w, slot)), 2)

    @jax.jit
    def seg65x95(w, slot, spec):
        def one(ww, ss, sp):
            oh = jax.nn.one_hot(sp, 95, dtype=jnp.float32)
            return jax.ops.segment_sum(oh * ww[:, None], ss, num_segments=65)

        return jax.vmap(one)(w, slot, spec)

    res["seg65x95_ms"] = round(
        1000 * chain_time(seg65x95, (w, slot, spec)), 2
    )

    @jax.jit
    def votes_mm(w, slot, spec):
        def one(ww, ss, sp):
            m = jax.nn.one_hot(ss, 65, dtype=jnp.bfloat16)  # (N, 65)
            oh = jax.nn.one_hot(sp, 95, dtype=jnp.bfloat16)
            return jax.lax.dot_general(
                m * ww[:, None].astype(jnp.bfloat16), oh,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return jax.vmap(one)(w, slot, spec)

    res["votes_mm_ms"] = round(
        1000 * chain_time(votes_mm, (w, slot, spec)), 2
    )

    f = jax.jit(lambda x, l: jnp.take_along_axis(x, jnp.minimum(l, N - 1), axis=1))
    res["gather32k_ms"] = round(1000 * chain_time(f, (xf, labels)), 2)

    f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    res["cumsum32k_ms"] = round(1000 * chain_time(f, (xf,)), 2)

    print(json.dumps(res, indent=1))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "output", "ns10k", "profile_prims.json",
    )
    with open(out, "w") as fo:
        json.dump(res, fo, indent=1)


if __name__ == "__main__":
    main()
