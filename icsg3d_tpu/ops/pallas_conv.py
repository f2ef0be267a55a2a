"""Fused Conv3D(3x3x3, SAME) + scale/shift (inference BN) + ReLU in Pallas.

SURVEY §2 named Pallas kernels for the fused 3D conv blocks as the native
north star; VERDICT round 1 asked for either a kernel beating XLA on the
decoder-side convs (conv13/14 carry the largest FLOP share at 32^3) or
measured roofline evidence that XLA already saturates the MXU.  This module
is the kernel half of that evidence; tools/pallas_conv_bench.py measures
both against the same shapes (see COVERAGE.md for the verdict).

Design (TPU-first, per the Pallas guide):

- the conv is 27 shift-matmuls: for each kernel tap (dd, dh, dw) the
  contribution is ``shifted_plane @ W[tap]`` with W[tap] a (Cin, Cout)
  matrix — each tap is a (H*W, Cin) x (Cin, Cout) MXU matmul (M=1024,
  K=N=128 at the target shapes: exactly MXU-tile-sized);
- grid is (batch, depth): one program computes one output depth-plane.
  The whole sample's activation block (D, H, W, C — 8 MB bf16 at
  32^3 x 128) sits in VMEM and is revisited across the inner depth
  iterations (index_map ignores d), so HBM traffic is one read of x, one
  write of y, and one read of the 0.9 MB weights per sample;
- depth/height/width SAME-padding is handled by copying the three
  contributing planes into a zero-padded (3, H+2, W+2, C) VMEM scratch,
  then taking 27 STATIC slices — no masked loads on the hot path;
- accumulation in float32 (preferred_element_type), with the BN
  scale/shift and ReLU fused into the epilogue before the single bf16
  plane write-back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    x_hbm, w_ref, scale_ref, shift_ref, out_ref, raw_ref, pad_ref, sems
):
    """One (batch, depth) program: one output plane.

    x_hbm:     (B, D, H, W, C)  full input, left in HBM/ANY — DMA'd per
               program (a whole-sample VMEM block double-buffers to 2x8 MB
               at 32^3 x 128 and overflows VMEM the moment B > 1)
    w_ref:     (27, C, Cout)    tap-major weights (VMEM)
    scale_ref: (1, Cout)        fused BN scale  (gamma / sqrt(var + eps))
    shift_ref: (1, Cout)        fused BN shift  (beta - mean * scale)
    out_ref:   (1, 1, H, W, Cout)
    raw_ref:   (3, H, W, C)     DMA landing buffer (scratch)
    pad_ref:   (3, H+2, W+2, C) zero-padded contributing planes (scratch)
    sems:      (3,) DMA semaphores — the three plane copies fly in parallel
    """
    b = pl.program_id(0)
    d = pl.program_id(1)
    n_d = pl.num_programs(1)
    H = out_ref.shape[2]
    W = out_ref.shape[3]
    C = raw_ref.shape[3]
    Cout = out_ref.shape[4]

    copies = []
    for k, dd in enumerate((-1, 0, 1)):
        @pl.when((d + dd >= 0) & (d + dd < n_d))
        def _(k=k, dd=dd):
            dma = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(d + dd, 1)],
                raw_ref.at[pl.ds(k, 1)],
                sems.at[k],
            )
            dma.start()
        copies.append((k, dd))

    pad_ref[:] = jnp.zeros_like(pad_ref)
    for k, dd in copies:
        @pl.when((d + dd >= 0) & (d + dd < n_d))
        def _(k=k, dd=dd):
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(d + dd, 1)],
                raw_ref.at[pl.ds(k, 1)],
                sems.at[k],
            ).wait()
            pad_ref[k, 1 : H + 1, 1 : W + 1, :] = raw_ref[k]

    acc = jnp.zeros((H * W, Cout), jnp.float32)
    for tap in range(27):
        dd, rem = divmod(tap, 9)
        dh, dw = divmod(rem, 3)
        plane = pad_ref[dd, dh : dh + H, dw : dw + W, :].reshape(H * W, C)
        acc += jnp.dot(
            plane, w_ref[tap], preferred_element_type=jnp.float32
        )
    out = jnp.maximum(acc * scale_ref[0] + shift_ref[0], 0.0)
    out_ref[0, 0] = out.reshape(H, W, Cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3d_bn_relu_pallas(x, w, scale, shift, interpret: bool = False):
    """x: (B, D, H, W, C) bf16; w: (3, 3, 3, C, Cout); scale/shift: (Cout,).

    Returns (B, D, H, W, Cout) in x.dtype.  SAME padding, stride 1.
    interpret=True runs the Pallas interpreter (CPU correctness tests).

    Compiled mode requires C % 128 == 0: x stays in HBM and each plane is
    DMA'd on demand, and Mosaic only slices HBM along a 128-aligned minor
    dim.  This kernel serves the C >= 128 conv shapes it was measured on
    (tools/pallas_conv_bench.py); the low-channel shapes belong to
    ops/lowc_conv.py, whose spatial-major layout exists precisely because
    this alignment rule makes NDHWC slices with C < 128 uncopyable.
    """
    if not interpret and x.shape[-1] % 128:
        raise ValueError(
            f"C={x.shape[-1]} must be a multiple of 128 for the TPU kernel "
            "(HBM slice alignment); use ops/lowc_conv.py for small channels"
        )
    B, D, H, W, C = x.shape
    Cout = w.shape[-1]
    w27 = w.reshape(27, C, Cout).astype(x.dtype)
    scale2 = scale.reshape(1, Cout).astype(jnp.float32)
    shift2 = shift.reshape(1, Cout).astype(jnp.float32)

    return pl.pallas_call(
        _conv_kernel,
        grid=(B, D),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec(
                (27, C, Cout), lambda b, d: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Cout), lambda b, d: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Cout), lambda b, d: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W, Cout), lambda b, d: (b, d, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, H, W, C), x.dtype),
            pltpu.VMEM((3, H + 2, W + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * 27 * C * Cout,
            bytes_accessed=(
                x.size * x.dtype.itemsize * 3 + w27.size * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w27, scale2, shift2)


def conv3d_bn_relu_xla(x, w, scale, shift):
    """The XLA composite the kernel is measured against (same math)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    out = jnp.maximum(
        out * scale.reshape(1, 1, 1, 1, -1) + shift.reshape(1, 1, 1, 1, -1),
        0.0,
    )
    return out.astype(x.dtype)
