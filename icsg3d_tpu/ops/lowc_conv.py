"""Tap-packed low-channel Conv3D (3x3x3, SAME) Pallas kernel.

Why this exists: XLA's TPU conv runs the VAE's small-channel 3D convs at
2-12% of peak (measured per-shape in tools/lowc_shapes_bench.py) because a
conv with Cin/Cout in the 4..64 range fills only a sliver of the MXU's
128-wide tiles — and because NDHWC activations with C < 128 are
lane-padded to 128 in HBM, taxing every byte moved.  The 64^3 profile
decomposition (output/ns10k/profile64.json) showed the whole VAE forward
at 8.3% MFU as a result.  The reference never met this problem class: its
Keras/cuDNN stack targeted GPUs (vae/lattice_vae.py:171-230 defines the
same 16/32/64/128-filter conv stacks this kernel serves).

Design — "spatial-major" layout with taps packed into the matmul:

  The kernel works on x transposed to (B, D, C, S) with S = H*W: the lane
  dimension holds a full spatial plane (S = 1024..4096, always a multiple
  of 128), so nothing is lane-padded, and Mosaic's DMA alignment rule
  (minor slice must be 128-aligned — the NDHWC form with C = 14..64 is
  uncopyable) is satisfied by construction.

  y[co, h, w] = sum_{dd,dh,dw,ci} x[d+dd-1, ci, (h+dh-1, w+dw-1)] * K[...]

  1. stack the 3 depth taps along sublanes:  X3 = [x[d-1]; x[d]; x[d+1]]
     of shape (3*Cin, 128 + S + 128) — the 128-lane zero aprons absorb the
     h-edge shifts below;
  2. pack the 9 in-plane taps into the matmul M dim:
         Wt[(dh,dw,co), (dd,ci)] = K[dd,dh,dw,ci,co]
  3. one MXU matmul per output plane:  P = Wt @ X3  (f32 accum), shape
     (9*Cout, 128+S+128): N = S is full 128-lane tiles, K = 3*Cin fills
     33-100% of the contraction dim (vs Cout/128 = 3-12% for the naive
     form);
  4. 9 VPU shift-adds collapse the in-plane taps: tap (dh,dw) reads the
     lane window offset by (dh-1)*W + (dw-1), with iota masks zeroing the
     two w-edge columns that a flat (h,w) lane index would wrap.

P never leaves VMEM — materializing it in HBM is what makes the same
trick slow in plain XLA.  The grid is (batch, D/dblk): each program DMAs
dblk+2 input planes and emits dblk output planes, so HBM traffic is
~(1 + 2/dblk) reads of x and one write of y, with none of the 128/C
lane-padding overhead of the NDHWC layout.

Gradients: dx is the same kernel with spatially-flipped, channel-swapped
weights (a transposed conv is itself a low-channel conv); dw has its own
Pallas kernel (_dw_kernel) that scatters the cotangent into the 9
tap-shifted lane windows and contracts over lanes on the MXU — the
(conv3d_lowc_vjp NDHWC wrapper still uses XLA's kernel-gradient conv).

``conv3d_lowc`` takes/returns ordinary NDHWC and transposes at the
boundary; use the ndcs-native entry points to keep whole networks in the
spatial-major layout and amortize the transposes away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_APRON = 128  # zero lanes on each side of the plane; absorbs h-edge shifts


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def pack_weights(w):
    """(3,3,3,Cin,Cout) -> (9*Cout, 3*Cin): rows (dh,dw,co), cols (dd,ci)."""
    _, _, _, cin, cout = w.shape
    return jnp.transpose(w, (1, 2, 4, 0, 3)).reshape(9 * cout, 3 * cin)


def _plane_dma(x_hbm, vpad_ref, sems, *, b, d0, dblk, D, S, valid, phases):
    """DMA input planes into the vpad scratch.

    In ``same`` mode plane k maps to global plane d0-1+k with zero
    (apron-initialised) planes outside [0, D); in ``valid`` mode the
    input is already depth-padded, so plane k is d0+k, always in range.
    The zero fill is unconditional: the 128-lane aprons flanking each
    plane are never DMA'd and must read as zero in either mode.

    ``phases`` selects what to run: ``("start",)`` zero-fills and starts
    all dblk+2 copies; ``("wait", k)`` waits on plane k only.  Splitting
    start/wait lets the compute loop wait per-plane, so the tail of the
    transfer overlaps the first planes' matmuls instead of serializing
    in front of the whole block.
    """
    if phases[0] == "start":
        vpad_ref[:] = jnp.zeros_like(vpad_ref)
    ks = range(dblk + 2) if phases[0] == "start" else (phases[1],)
    for k in ks:
        src = d0 + k if valid else d0 - 1 + k

        def _go(k=k, src=src):
            copy = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(src, 1)],
                vpad_ref.at[pl.ds(k, 1), :, pl.ds(_APRON, S)],
                sems.at[k],
            )
            copy.start() if phases[0] == "start" else copy.wait()

        if valid:
            _go()
        else:
            pl.when((src >= 0) & (src < D))(_go)


def _kernel(
    x_hbm, wt_ref, b_ref, out_ref, vpad_ref, sems, *, dblk, D, W, valid
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    d0 = t * dblk
    Cout = out_ref.shape[2]
    S = out_ref.shape[3]

    dma = functools.partial(
        _plane_dma, x_hbm, vpad_ref, sems,
        b=b, d0=d0, dblk=dblk, D=D, S=S, valid=valid,
    )
    dma(phases=("start",))

    # w-edge masks: a flat (h*W + w) lane shift by dw-1 wraps rows, so the
    # first (dw=0) / last (dw=2) column of each row must contribute zero.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) % W
    first_col = col == 0
    last_col = col == W - 1

    for j in range(dblk):
        # plane j consumes vpad rows j..j+2; wait only what's new so the
        # remaining transfers overlap this plane's matmul.
        for k in ((0, 1, 2) if j == 0 else (j + 2,)):
            dma(phases=("wait", k))
        x3 = jnp.concatenate(
            [vpad_ref[j + dd] for dd in range(3)], axis=0
        )
        p = jax.lax.dot_general(
            wt_ref[:], x3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = jnp.zeros((Cout, S), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                tap = dh * 3 + dw
                off = _APRON + (dh - 1) * W + (dw - 1)
                sl = p[tap * Cout : (tap + 1) * Cout, off : off + S]
                if dw == 0:
                    sl = jnp.where(first_col, 0.0, sl)
                elif dw == 2:
                    sl = jnp.where(last_col, 0.0, sl)
                acc = acc + sl
        acc = acc + b_ref[:]
        out_ref[0, j] = acc.astype(out_ref.dtype)


def _sublane_granule(dtype) -> int:
    return {1: 32, 2: 16, 4: 8}.get(jnp.dtype(dtype).itemsize, 8)


def _pad_channels(x, wt=None):
    """Pad the C dim of spatial-major x (B, D, C, S) to the sublane
    granule, and (if given) insert matching zero columns into the
    tap-packed weights (9Cout, 3C) -> (9Cout, 3Cp)."""
    B, D, C, S = x.shape
    Cp = _round_up(C, _sublane_granule(x.dtype))
    if Cp == C:
        return x, wt
    x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    if wt is not None:
        rows = wt.shape[0]
        wt = jnp.pad(
            wt.reshape(rows, 3, C), ((0, 0), (0, 0), (0, Cp - C))
        ).reshape(rows, 3 * Cp)
    return x, wt


def _pick_dblk(
    D: int, C: int = 0, S: int = 0, cout: int = 0, itemsize: int = 2,
    out_itemsize: int = 0,
) -> int:
    """Largest depth block that divides D and fits the VMEM budget.

    Bigger blocks amortize the 2-plane halo re-read (HBM traffic is
    (1 + 2/dblk)x of x) and the per-program prologue; the ceiling is
    VMEM: the vpad scratch, the double-buffered output block, and the
    per-plane f32 matmul result P must coexist in ~16 MB.
    """
    budget = 12 * 1024 * 1024
    out_itemsize = out_itemsize or itemsize
    sp = S + 2 * _APRON
    for cand in (16, 8, 4, 2, 1):
        if D % cand:
            continue
        if not S:  # no geometry given (legacy callers): keep the old cap
            if cand <= 8:
                return cand
            continue
        need = (
            (cand + 2) * C * sp * itemsize      # vpad scratch
            + 2 * cand * cout * S * out_itemsize  # out block, double-buffered
            + 9 * cout * sp * 4                 # P (f32 matmul result)
            + 9 * cout * 3 * C * itemsize       # packed weights
        )
        if need <= budget:
            return cand
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("W", "interpret", "dblk", "out_dtype", "depth_valid"),
)
def conv3d_lowc_ndcs(
    x, wt, bias, W: int, interpret: bool = False, dblk: int = 0,
    out_dtype=None, depth_valid: bool = False,
):
    """Raw spatial-major conv: x (B, D, C, S=H*W), wt = pack_weights(w)
    (9Cout, 3Cin), bias (Cout, 1) f32.  Returns (B, D, Cout, S).

    Compiled mode requires S % 128 == 0 and W+1 <= 128 (apron coverage).

    depth_valid=True treats x as already depth-padded (e.g. by a halo
    exchange over a spatial mesh axis, parallel/halo.py): the depth
    window becomes VALID, returning (B, D-2, Cout, S) with no zero
    boundary — the per-shard piece of a depth-sharded SAME conv.
    """
    B, D, C, S = x.shape
    cout = wt.shape[0] // 9
    d_out = D - 2 if depth_valid else D
    dblk = dblk or _pick_dblk(
        d_out, _round_up(C, _sublane_granule(x.dtype)), S, cout,
        x.dtype.itemsize,
        jnp.dtype(out_dtype).itemsize if out_dtype else x.dtype.itemsize,
    )
    if d_out % dblk:
        raise ValueError(f"dblk {dblk} must divide output depth {d_out}")
    if not interpret:
        if S % 128:
            raise ValueError(
                f"S={S} must be a multiple of 128 for the TPU kernel"
            )
        if W + 1 > _APRON:
            raise ValueError(f"W={W} exceeds the {_APRON}-lane apron")
    out_dtype = out_dtype or x.dtype

    # Mosaic needs the channel (second-minor) dim sublane-aligned: the
    # 3-deep row stack of a misaligned C (e.g. the VAE encoder's 14
    # input channels -> 42 rows) crashes the TPU compile helper.  Pad C
    # to the sublane granule with zero channels / zero weight columns;
    # the extra rows multiply zeros and change nothing.
    x, wt = _pad_channels(x, wt)
    C = x.shape[2]

    return pl.pallas_call(
        functools.partial(_kernel, dblk=dblk, D=D, W=W, valid=depth_valid),
        grid=(B, d_out // dblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                wt.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cout, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, dblk, cout, S), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, d_out, cout, S), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((dblk + 2, C, S + 2 * _APRON), x.dtype),
            pltpu.SemaphoreType.DMA((dblk + 2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d_out * 9 * cout * 3 * C * (S + 2 * _APRON),
            bytes_accessed=int(
                x.size * x.dtype.itemsize * (1 + 2 / dblk)
                + B * d_out * S * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wt, bias)


def _dw_kernel(x_hbm, g_ref, out_ref, vpad_ref, sems, *, dblk, D, W, valid):
    """Weight gradient: dWt[(dh,dw,co),(dd,ci)] accumulated over all
    (batch, plane) programs.

    Per output plane j the cotangent g[co, m] is scattered into the 9
    tap-shifted lane windows of G9 (with the same w-edge masks the
    forward applies), and one MXU contraction over lanes gives the
    plane's contribution:  dWt += G9 . X3^T.  The output block has a
    constant index map, so it lives across the sequential TPU grid and
    accumulates; the first program zeroes it.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    d0 = t * dblk
    Cout = g_ref.shape[2]
    S = g_ref.shape[3]
    SP = S + 2 * _APRON

    dma = functools.partial(
        _plane_dma, x_hbm, vpad_ref, sems,
        b=b, d0=d0, dblk=dblk, D=D, S=S, valid=valid,
    )
    dma(phases=("start",))

    @pl.when((b == 0) & (t == 0))
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) % W
    first_col = col == 0
    last_col = col == W - 1

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(dblk):
        for k in ((0, 1, 2) if j == 0 else (j + 2,)):
            dma(phases=("wait", k))
        x3 = jnp.concatenate(
            [vpad_ref[j + dd] for dd in range(3)], axis=0
        )
        g = g_ref[0, j]
        # Build the 9 tap-shifted lane windows with lane ROTATES of an
        # offset-0 buffer.  Mosaic has no lowering for the lane-offset
        # write a dynamic_update_slice into g9 would need, and refuses to
        # concatenate the lane-offset layouts an unaligned read slice
        # produces ("result/input offset mismatch on non-concat dim") —
        # pltpu.roll keeps every block at offset 0, so the sublane concat
        # and the single big MXU contraction survive.  gm sits at lane
        # _APRON of the SP buffer; tap (dh,dw) needs it at off, a rotate
        # by delta = (dh-1)*W + (dw-1); |delta| <= W+1 <= _APRON keeps the
        # rotate's wraparound inside the zero aprons.
        # Mosaic's rotate only handles 32-bit lanes — widen to f32 for
        # the roll (exact for bf16 values) and narrow back for the
        # bf16 MXU contraction.
        zero1 = jnp.zeros((Cout, _APRON), jnp.float32)
        gsp_by_dw = []
        for dw in range(3):
            gm = g
            if dw == 0:
                gm = jnp.where(first_col, jnp.zeros_like(g), g)
            elif dw == 2:
                gm = jnp.where(last_col, jnp.zeros_like(g), g)
            gsp_by_dw.append(
                jnp.concatenate([zero1, gm.astype(jnp.float32), zero1], axis=1)
            )
        blocks = []
        for dh in range(3):
            for dw in range(3):
                delta = (dh - 1) * W + (dw - 1)
                blocks.append(
                    pltpu.roll(gsp_by_dw[dw], delta % SP, axis=1)
                    .astype(g.dtype)
                )
        g9 = jnp.concatenate(blocks, axis=0)
        acc = acc + jax.lax.dot_general(
            g9, x3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("W", "interpret", "dblk", "depth_valid")
)
def conv3d_lowc_ndcs_dw(
    x, g, W: int, interpret: bool = False, dblk: int = 0,
    depth_valid: bool = False,
):
    """Weight gradient of the spatial-major conv.

    x: (B, D, Cin, S) input; g: (B, D_out, Cout, S) cotangent.  Returns
    the tap-packed gradient (9*Cout, 3*Cin) float32 (see pack_weights).
    With depth_valid=True, x is depth-padded (D = D_out + 2) and the
    depth window is VALID — the per-shard dw of a halo-exchanged conv.
    """
    B, D, C, S = x.shape
    cout = g.shape[2]
    d_out = D - 2 if depth_valid else D
    if g.shape[1] != d_out:
        raise ValueError(f"cotangent depth {g.shape[1]} != {d_out}")
    dblk = dblk or _pick_dblk(
        d_out, _round_up(C, _sublane_granule(x.dtype)), S, cout,
        x.dtype.itemsize,
    )
    if d_out % dblk:
        raise ValueError(f"dblk {dblk} must divide output depth {d_out}")
    if not interpret:
        if S % 128:
            raise ValueError(f"S={S} must be a multiple of 128")
        if W + 1 > _APRON:
            raise ValueError(f"W={W} exceeds the {_APRON}-lane apron")

    # Same sublane-alignment padding as the forward; the padded weight
    # gradient columns are exact zeros, sliced off below.
    x, _ = _pad_channels(x)
    Cp = x.shape[2]

    dwt_p = pl.pallas_call(
        functools.partial(_dw_kernel, dblk=dblk, D=D, W=W, valid=depth_valid),
        grid=(B, d_out // dblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, dblk, cout, S), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (9 * cout, 3 * Cp), lambda b, t: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((9 * cout, 3 * Cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dblk + 2, Cp, S + 2 * _APRON), x.dtype),
            pltpu.SemaphoreType.DMA((dblk + 2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d_out * 9 * cout * 3 * Cp * (S + 2 * _APRON),
            bytes_accessed=int(
                x.size * x.dtype.itemsize * (1 + 2 / dblk)
                + g.size * g.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, g)
    return dwt_p.reshape(9 * cout, 3, Cp)[:, :, :C].reshape(9 * cout, 3 * C)


def unpack_weight_grad(dwt, cin: int, cout: int):
    """(9*Cout, 3*Cin) tap-packed gradient -> (3,3,3,Cin,Cout)."""
    return dwt.reshape(3, 3, cout, 3, cin).transpose(3, 0, 1, 4, 2)


def to_ndcs(x):
    """(B, D, H, W, C) -> (B, D, C, H*W)."""
    B, D, H, W, C = x.shape
    return jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(B, D, C, H * W)


def from_ndcs(x, H: int, W: int):
    """(B, D, C, S) -> (B, D, H, W, C)."""
    B, D, C, _ = x.shape
    return jnp.transpose(x.reshape(B, D, C, H, W), (0, 1, 3, 4, 2))


def lowc_supported(H: int, W: int) -> bool:
    return (H * W) % 128 == 0 and W + 1 <= _APRON


def conv_ndcs_fits(
    cin: int, cout: int, H: int, W: int, dtype=jnp.bfloat16
) -> bool:
    """True when the differentiable tap-packed conv fits VMEM for these
    channel counts (fwd, dx AND dw kernels, each at its smallest depth
    block).

    The packed-weight block scales as Cin*Cout, so big-channel convs (the
    U-Net's 256..768-channel bottleneck/decoder layers) blow past the
    ~16 MB VMEM even at dblk=1 — the dw kernel's resident f32 gradient
    block (9*Cout, 3*Cin) alone reaches 42 MB at 768->512.  Those are
    exactly the MXU-friendly shapes XLA already runs at 40-60% of peak;
    this kernel exists for the LOW-channel shapes XLA runs at 2-12%.
    Callers (models/layers.py SpatialMajorConv) fall back to the XLA conv
    when this returns False instead of dying in the TPU compile helper
    with a scoped-vmem OOM.
    """
    it = jnp.dtype(dtype).itemsize
    gran = _sublane_granule(dtype)
    cp = _round_up(cin, gran)
    cop = _round_up(cout, gran)
    S = H * W
    sp = S + 2 * _APRON
    budget = 12 * 1024 * 1024  # same headroom as _pick_dblk
    # forward at dblk=1: vpad + double-buffered out + f32 P + weights
    fwd = 3 * cp * sp * it + 2 * cout * S * it + 9 * cout * sp * 4 \
        + 9 * cout * 3 * cp * it
    # dx = same kernel with channels swapped
    dx = 3 * cop * sp * it + 2 * cin * S * it + 9 * cin * sp * 4 \
        + 9 * cin * 3 * cop * it
    # dw at dblk=1: vpad + g block + resident f32 out + f32 acc + the
    # 9-tap rotate stack (g9 in g.dtype + 3 f32 widened dw-buffers)
    dw = 3 * cp * sp * it + 2 * cout * S * it + 2 * 9 * cout * 3 * cp * 4 \
        + 9 * cout * sp * it + 3 * cout * sp * 4
    return max(fwd, dx, dw) <= budget


def conv3d_lowc(x, w, bias=None, interpret: bool = False, dblk: int = 0):
    """Conv3D(3x3x3, stride 1, SAME) for small channel counts, NDHWC API.

    x: (B, D, H, W, Cin); w: (3, 3, 3, Cin, Cout); bias: (Cout,) or None.
    Computes in x.dtype (use bfloat16) with f32 accumulation; returns
    x.dtype.  Matches lax.conv_general_dilated(..., "SAME", NDHWC/DHWIO).
    Transposes to/from the spatial-major layout at the boundary; for
    back-to-back convs prefer conv3d_lowc_ndcs to keep the layout.
    """
    _, _, H, W, _ = x.shape
    cout = w.shape[-1]
    wt = pack_weights(w).astype(x.dtype)
    b = (
        jnp.zeros((cout, 1), jnp.float32)
        if bias is None
        else bias.reshape(cout, 1).astype(jnp.float32)
    )
    y = conv3d_lowc_ndcs(
        to_ndcs(x), wt, b, W=W, interpret=interpret, dblk=dblk
    )
    return from_ndcs(y, H, W)


def _flip_w(w):
    """Weights of the input-gradient (transposed) conv: spatial flip +
    channel swap."""
    return jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_ndcs(x, w, bias, hw, interpret: bool = False, dblk: int = 0):
    """Differentiable spatial-major conv: x (B, D, Cin, S) -> (B, D, Cout, S).

    w: (3,3,3,Cin,Cout) float32 (the nn.Conv parameter layout), bias
    (Cout,) float32, hw = (H, W) with H*W == S.  Forward, input-grad and
    weight-grad all run on tap-packed Pallas kernels (the dx conv uses
    spatially-flipped channel-swapped weights; dw uses _dw_kernel).
    """
    H, W = hw
    cout = w.shape[-1]
    return conv3d_lowc_ndcs(
        x,
        pack_weights(w).astype(x.dtype),
        bias.reshape(cout, 1).astype(jnp.float32),
        W=W,
        interpret=interpret,
        dblk=dblk,
    )


def _conv_ndcs_fwd(x, w, bias, hw, interpret, dblk):
    return conv_ndcs(x, w, bias, hw, interpret, dblk), (x, w)


def _conv_ndcs_bwd(hw, interpret, dblk, res, g):
    x, w = res
    H, W = hw
    wf = _flip_w(w)
    cin, cout = w.shape[-2], w.shape[-1]
    dx = conv3d_lowc_ndcs(
        g,
        pack_weights(wf).astype(g.dtype),
        jnp.zeros((cin, 1), jnp.float32),
        W=W,
        interpret=interpret,
        dblk=dblk,
    )
    dwt = conv3d_lowc_ndcs_dw(
        x, g.astype(x.dtype), W=W, interpret=interpret, dblk=dblk
    )
    dw = unpack_weight_grad(dwt, cin, cout)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3))
    return dx.astype(x.dtype), dw, db


conv_ndcs.defvjp(_conv_ndcs_fwd, _conv_ndcs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_ndcs_valid(xp, w, bias, hw, interpret: bool = False, dblk: int = 0):
    """Differentiable depth-VALID spatial-major conv.

    xp: (B, Dl+2, Cin, S) — a depth slab already padded with its two halo
    planes (neighbor planes from a halo exchange, or zeros at the global
    boundary).  Returns (B, Dl, Cout, S): exactly the shard's slice of
    the global SAME conv.  w (3,3,3,Cin,Cout) / bias (Cout,) float32 as
    in nn.Conv.  This is the per-shard building block of
    parallel.halo.conv_ndcs_sharded.
    """
    H, W = hw
    cout = w.shape[-1]
    return conv3d_lowc_ndcs(
        xp,
        pack_weights(w).astype(xp.dtype),
        bias.reshape(cout, 1).astype(jnp.float32),
        W=W,
        interpret=interpret,
        dblk=dblk,
        depth_valid=True,
    )


def _conv_ndcs_valid_fwd(xp, w, bias, hw, interpret, dblk):
    return conv_ndcs_valid(xp, w, bias, hw, interpret, dblk), (xp, w)


def _conv_ndcs_valid_bwd(hw, interpret, dblk, res, g):
    xp, w = res
    H, W = hw
    cin, cout = w.shape[-2], w.shape[-1]
    # dxp: zero-pad the cotangent by 2 planes each side, then the same
    # depth-valid kernel with flipped/channel-swapped weights emits all
    # Dl+2 input-plane gradients (halo-plane cotangents included — the
    # surrounding halo exchange transposes them back to the neighbors).
    B, Do, _, S = g.shape
    zeros = jnp.zeros((B, 2, cout, S), g.dtype)
    gp = jnp.concatenate([zeros, g, zeros], axis=1)
    # This conv's output depth is Do+2 (one plane per input incl. halos),
    # so a caller-chosen dblk that divides Do need not divide Do+2 —
    # auto-pick for it rather than inherit and crash.
    dxp = conv3d_lowc_ndcs(
        gp,
        pack_weights(_flip_w(w)).astype(g.dtype),
        jnp.zeros((cin, 1), jnp.float32),
        W=W,
        interpret=interpret,
        dblk=dblk if dblk and (Do + 2) % dblk == 0 else 0,
        depth_valid=True,
    )
    dwt = conv3d_lowc_ndcs_dw(
        xp, g.astype(xp.dtype), W=W, interpret=interpret, dblk=dblk,
        depth_valid=True,
    )
    dw = unpack_weight_grad(dwt, cin, cout)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3))
    return dxp.astype(xp.dtype), dw, db


conv_ndcs_valid.defvjp(_conv_ndcs_valid_fwd, _conv_ndcs_valid_bwd)


# ---------------------------------------------------------------------------
# per-pass implementation dispatch (VERDICT r4 item 5)
# ---------------------------------------------------------------------------
#
# The round-4 whole-step measurement (output/ns10k/ndcs_step.json) showed
# per-MODEL layout choice saturating at 33% MFU: the Pallas kernel wins
# the forward at low-channel shapes but its dx/dw lose to XLA's
# kernel-gradient convs at bigger channel counts — and vice versa.  The
# remedy is choosing the implementation PER SHAPE and PER PASS
# (fwd/dx/dw independently), from a table measured once per shape on
# hardware (tools/lowc_shapes_bench.py --passes).


def _xla_conv_ndcs(x, w, bias, hw):
    """XLA SAME conv on spatial-major input via an NDHWC round-trip."""
    H, W = hw
    xh = from_ndcs(x, H, W)
    y = jax.lax.conv_general_dilated(
        xh, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        y = y + bias.reshape(1, 1, 1, 1, -1)
    return to_ndcs(y.astype(x.dtype))


def _xla_dw_ndcs(x, g, w_shape, hw):
    """Weight gradient via XLA's kernel-gradient conv (all-f32 NDHWC;
    the large-M contraction XLA tiles well — conv3d_lowc_vjp note)."""
    H, W = hw
    xf = from_ndcs(x, H, W).astype(jnp.float32)
    gf = from_ndcs(g, H, W).astype(jnp.float32)

    def conv_w(weights):
        return jax.lax.conv_general_dilated(
            xf, weights, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    _, w_vjp = jax.vjp(conv_w, jnp.zeros(w_shape, jnp.float32))
    (dw,) = w_vjp(gf)
    return dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def conv_ndcs_mix(
    x, w, bias, hw,
    impls: tuple = ("pallas", "pallas", "pallas"),
    interpret: bool = False, dblk: int = 0,
):
    """Differentiable spatial-major conv with per-pass implementation
    choice: impls = (fwd, dx, dw), each "pallas" or "xla".

    Same math and API as conv_ndcs for every combination (tested in
    tests/test_lowc_conv.py); ("pallas","pallas","pallas") is exactly
    conv_ndcs, ("xla","xla","xla") is the NDHWC round-trip fallback.
    """
    H, W = hw
    cout = w.shape[-1]
    if impls[0] == "pallas":
        return conv3d_lowc_ndcs(
            x,
            pack_weights(w).astype(x.dtype),
            bias.reshape(cout, 1).astype(jnp.float32),
            W=W,
            interpret=interpret,
            dblk=dblk,
        )
    return _xla_conv_ndcs(x, w, bias, hw)


def _conv_ndcs_mix_fwd(x, w, bias, hw, impls, interpret, dblk):
    return conv_ndcs_mix(x, w, bias, hw, impls, interpret, dblk), (x, w)


def _conv_ndcs_mix_bwd(hw, impls, interpret, dblk, res, g):
    x, w = res
    H, W = hw
    cin, cout = w.shape[-2], w.shape[-1]
    if impls[1] == "pallas":
        dx = conv3d_lowc_ndcs(
            g,
            pack_weights(_flip_w(w)).astype(g.dtype),
            jnp.zeros((cin, 1), jnp.float32),
            W=W,
            interpret=interpret,
            dblk=dblk,
        )
    else:
        dx = _xla_conv_ndcs(g, _flip_w(w), None, hw)
    if impls[2] == "pallas":
        dwt = conv3d_lowc_ndcs_dw(
            x, g.astype(x.dtype), W=W, interpret=interpret, dblk=dblk
        )
        dw = unpack_weight_grad(dwt, cin, cout)
    else:
        dw = _xla_dw_ndcs(x, g, w.shape, hw)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3))
    return dx.astype(x.dtype), dw, db


conv_ndcs_mix.defvjp(_conv_ndcs_mix_fwd, _conv_ndcs_mix_bwd)


def conv_pass_fits(
    cin: int, cout: int, H: int, W: int, dtype=jnp.bfloat16
):
    """Per-pass VMEM-fit: (fwd_fits, dx_fits, dw_fits) — the decomposed
    form of conv_ndcs_fits, so the dispatcher can run a Pallas pass that
    fits even when a sibling pass would not."""
    it = jnp.dtype(dtype).itemsize
    gran = _sublane_granule(dtype)
    cp = _round_up(cin, gran)
    cop = _round_up(cout, gran)
    S = H * W
    sp = S + 2 * _APRON
    budget = 12 * 1024 * 1024
    fwd = 3 * cp * sp * it + 2 * cout * S * it + 9 * cout * sp * 4 \
        + 9 * cout * 3 * cp * it
    dx = 3 * cop * sp * it + 2 * cin * S * it + 9 * cin * sp * 4 \
        + 9 * cin * 3 * cop * it
    dw = 3 * cp * sp * it + 2 * cout * S * it + 2 * 9 * cout * 3 * cp * 4 \
        + 9 * cout * sp * it + 3 * cout * sp * 4
    return fwd <= budget, dx <= budget, dw <= budget


# Measured per-shape, per-pass implementation table.  Keys
# "cin,cout,H,W" -> ["pallas"|"xla", ...] for (fwd, dx, dw); produced by
# tools/lowc_shapes_bench.py --passes --write-dispatch on real hardware
# and shipped as ops/conv_dispatch.json.  Missing shapes fall back to
# the fit-check policy (Pallas where every pass fits).
_DISPATCH_TABLE = None


def _load_dispatch_table():
    global _DISPATCH_TABLE
    if _DISPATCH_TABLE is None:
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "conv_dispatch.json")
        try:
            with open(path) as f:
                _DISPATCH_TABLE = {
                    k: tuple(v) for k, v in json.load(f)["table"].items()
                }
        except (OSError, ValueError, KeyError):
            _DISPATCH_TABLE = {}
    return _DISPATCH_TABLE


def dispatch_impls(cin: int, cout: int, H: int, W: int, dtype=jnp.bfloat16):
    """(fwd, dx, dw) implementation choice for this conv shape.

    Measured table first; fit-gated per pass (a table entry saying
    "pallas" for a pass that no longer fits VMEM is overridden to
    "xla").  Unknown shapes: Pallas for every pass that fits — the
    pre-dispatch behavior.
    """
    fits = conv_pass_fits(cin, cout, H, W, dtype)
    table = _load_dispatch_table()
    entry = table.get(f"{cin},{cout},{H},{W}")
    if entry is None:
        entry = ("pallas",) * 3
    return tuple(
        e if (e == "xla" or fit) else "xla" for e, fit in zip(entry, fits)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_lowc_vjp(x, w, bias, interpret: bool = False):
    """conv3d_lowc with gradients: dx via the same Pallas kernel on
    flipped weights; dw/db via XLA (kernel-gradient conv is a large-M
    contraction XLA already tiles well)."""
    return conv3d_lowc(x, w, bias, interpret=interpret)


def _fwd(x, w, bias, interpret):
    return conv3d_lowc(x, w, bias, interpret=interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    dx = conv3d_lowc(g, _flip_w(w), None, interpret=interpret)

    # all-f32 vjp: mixing bf16 operands with a (preferred_element_type)
    # f32 cotangent makes lax.conv's transpose rule mix dtypes and raise
    xf = x.astype(jnp.float32)

    def xla_conv(weights):
        return jax.lax.conv_general_dilated(
            xf, weights.astype(jnp.float32), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    _, w_vjp = jax.vjp(xla_conv, w)
    (dw,) = w_vjp(g.astype(jnp.float32))
    # upcast before the 4-axis sum: accumulating millions of bf16 terms
    # in bf16 loses the sum (the sibling ndcs VJPs upcast the same way)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3))
    return dx.astype(x.dtype), dw, db


conv3d_lowc_vjp.defvjp(_fwd, _bwd)
