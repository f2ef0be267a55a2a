"""On-device atom extraction, fully jit/vmap-compatible with fixed shapes.

The host watershed (ops/segmentation.py) is the parity-exact
implementation of the reference's recursive skimage pipeline; it is also
the one piece of generate.py that forced a per-sample host round trip
(generate.py:228-248).  This module is the TPU-native fast path that makes
decode -> segment -> extract one XLA program.

THE PRODUCTION ALGORITHM — ``extract_atoms(..., method="binary")``, a
device mirror of the reference pipeline, used by the fused generation
path (apps/generate.py --fused).  Measured on the round-2 campaign
population: 1000/1000 valid structures, 100% atom-count parity with the
host watershed, 200/200 species-multiset parity:

1. Connected components of the BINARY occupancy mask — exactly what the
   reference labels (watershed.py:56) — via min-label propagation in a
   ``lax.while_loop``.  Plain neighbor-min iteration (rolls + wheres,
   pure VPU) needs O(region diameter) rounds but measured 62x FASTER on
   TPU than pointer-jumping variants: path-halving gathers are
   random-access and serialize on TPU, while a dozen extra roll/min
   rounds are nearly free.
2. Marker-erosion splitting of merged blobs: regions whose erosion
   leaves >= 2 cores of >= wmin voxels are BFS-relabeled to their
   nearest core — the device form of the reference's erosion/marker
   watershed (watershed.py:98-144).  Its convexity gate is provably
   redundant for the split decision (a convex blob's erosion stays
   connected, so it can never yield two cores).
3. Tiny regions (<= 3 voxels) dropped (watershed.py:58-61); the largest
   up-to-``max_atoms`` regions become atom slots; per-region
   MAJORITY-VOTE species (watershed.py:158-167) and centroid means via
   scatter-free sort/run-length ranking + MXU matmul reductions.

Design history — ``method="species"`` (the default for voxelizer-exact
grids, off the fused path): CC of the SPECIES grid, where same-species
neighbors connect.  On decoded/segmented grids it overcounted (fringe
mislabeled patches promoted to atoms, 223/1000 round-2 samples), and its
``split_peaks`` refinement — per-component density local maxima as BFS
seeds, motivated by the shoulder problem (a light atom on a heavy
neighbor's Gaussian shoulder has no global peak, but within one
same-species component every atom owns a local maximum) — made it worse
under decoder density ripples (896/1000).  Both are kept, tested and
documented for the clean-grid use case; the binary method above is what
ships.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _neighbor_min_labels(labels, species, big):
    """Min over the 6 face neighbors' labels, restricted to same species.

    labels/species: (d0, d1, d2).  Out-of-bounds and different-species
    neighbors contribute ``big``.
    """
    out = labels
    for axis in range(3):
        for shift in (1, -1):
            lab_n = jnp.roll(labels, shift, axis=axis)
            spe_n = jnp.roll(species, shift, axis=axis)
            # kill wraparound: the row that wrapped gets `big`
            d = labels.shape[axis]
            idx = jax.lax.broadcasted_iota(jnp.int32, labels.shape, axis)
            edge = (idx == 0) if shift == 1 else (idx == d - 1)
            valid = (spe_n == species) & ~edge
            out = jnp.minimum(out, jnp.where(valid, lab_n, big))
    return out


def connected_components_same_value(species: jnp.ndarray) -> jnp.ndarray:
    """CC labels of a nonzero-valued int grid; background (0) -> n_vox.

    Returns (d0, d1, d2) int32 labels where each component's label is the
    smallest flat voxel index it contains.
    """
    shape = species.shape
    n_vox = shape[0] * shape[1] * shape[2]
    big = jnp.int32(n_vox)
    species = species.astype(jnp.int32)
    fg = species > 0

    init = jnp.where(
        fg,
        (
            jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1] * shape[2]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * shape[2]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        ),
        big,
    )

    def body(state):
        labels, _ = state
        new = _neighbor_min_labels(labels, species, big)
        new = jnp.where(fg, new, big)
        changed = jnp.any(new != labels)
        return new, changed

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (init, jnp.bool_(True))
    )
    return labels



def density_peaks(
    density: jnp.ndarray,
    cc_labels: jnp.ndarray,
    fg: jnp.ndarray,
    window: int = 2,
) -> jnp.ndarray:
    """Per-component density local maxima (seed mask for splitting).

    A foreground voxel is a peak when no voxel of the SAME connected
    component within a (2*window+1)^3 neighborhood lexicographically
    dominates it on (density, flat index).  The index tie-break collapses
    flat plateaus NARROWER than the window to a single seed without
    epsilon hacks (a constant-density region wider than the window still
    yields one seed per window-separated extremity — one reason
    split_peaks measured worse than the binary method and stays off by
    default), and the
    same-component restriction means a component's own maximum can never be
    suppressed by a taller neighboring blob — every component keeps >= 1
    seed, so splitting never loses atoms.

    ``window=2`` (a 5^3 neighborhood) suppresses shallow decoder ripples
    within 2 voxels of a stronger peak while keeping genuine atom pairs
    (>= 5-10 voxels apart at 32^3 resolutions) separate.
    """
    shape = density.shape
    den = density.astype(jnp.float32)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1] * shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    )
    dominated = jnp.zeros(shape, bool)
    offsets = [
        (dx, dy, dz)
        for dx in range(-window, window + 1)
        for dy in range(-window, window + 1)
        for dz in range(-window, window + 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]
    for dx, dy, dz in offsets:
        den_n = den
        cc_n = cc_labels
        idx_n = idx
        in_bounds = jnp.ones(shape, bool)
        for axis, shift in ((0, dx), (1, dy), (2, dz)):
            if shift == 0:
                continue
            den_n = jnp.roll(den_n, shift, axis=axis)
            cc_n = jnp.roll(cc_n, shift, axis=axis)
            idx_n = jnp.roll(idx_n, shift, axis=axis)
            d = shape[axis]
            ax_idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
            edge = (ax_idx < shift) if shift > 0 else (ax_idx >= d + shift)
            in_bounds = in_bounds & ~edge
        same = in_bounds & (cc_n == cc_labels)
        dom = same & ((den_n > den) | ((den_n == den) & (idx_n > idx)))
        dominated = dominated | dom
    return fg & ~dominated


def nearest_seed_labels(
    seeds: jnp.ndarray,
    cc_labels: jnp.ndarray,
    fg: jnp.ndarray,
    seed_labels: jnp.ndarray = None,
) -> jnp.ndarray:
    """Relabel each foreground voxel to its nearest seed's label.

    Multi-source BFS (6-connectivity, restricted to each voxel's own
    ``cc_labels`` region) in a ``lax.while_loop`` — the same roll/min
    iteration pattern as the CC pass, converging in O(component diameter)
    rounds.  Equidistant ties resolve by the fixed neighbor-visit order
    (deterministic; the reference watershed's flood order is equally
    arbitrary at ties).  Background and unreached voxels get ``n_vox``.

    ``seed_labels`` gives each seed voxel's label (whole regions can act as
    one seed); default is each seed voxel's own flat index.
    """
    shape = seeds.shape
    n_vox = shape[0] * shape[1] * shape[2]
    big = jnp.int32(n_vox)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1] * shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    )
    if seed_labels is None:
        seed_labels = idx
    lab0 = jnp.where(seeds & fg, seed_labels, big)
    dist0 = jnp.where(seeds & fg, jnp.int32(0), big)

    def body(state):
        lab, dist, _ = state
        new_lab, new_dist = lab, dist
        for axis in range(3):
            for shift in (1, -1):
                lab_n = jnp.roll(new_lab, shift, axis=axis)
                dist_n = jnp.roll(new_dist, shift, axis=axis)
                cc_n = jnp.roll(cc_labels, shift, axis=axis)
                d = shape[axis]
                ax_idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
                edge = (ax_idx == 0) if shift == 1 else (ax_idx == d - 1)
                valid = fg & ~edge & (cc_n == cc_labels) & (lab_n != big)
                cand = jnp.where(valid, dist_n + 1, big)
                better = cand < new_dist
                new_lab = jnp.where(better, lab_n, new_lab)
                new_dist = jnp.where(better, cand, new_dist)
        changed = jnp.any(new_dist != dist)
        return new_lab, new_dist, changed

    lab, _, _ = jax.lax.while_loop(
        lambda s: s[2], body, (lab0, dist0, jnp.bool_(True))
    )
    return lab


def top_regions_by_size(
    labels_flat: jnp.ndarray,
    k: int,
    min_size: int,
    n_vox: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-``k`` region labels by voxel count, WITHOUT scatters.

    ``jax.ops.segment_sum`` with ~32k segments lowers to a scatter-add
    that costs ~50 ms for a 128-batch on TPU (measured,
    output/ns10k/profile_prims.json) — it was 3x the entire extraction
    budget.  Sorting the labels and ranking run lengths does the same
    histogram + top-k in ~0.3 ms: sort, run-start flags, next-start via a
    reversed cumulative min, run length = next start - this start.

    labels_flat: (n_vox,) int32 region labels where each region's label is
    a voxel index inside it and background carries >= n_vox.

    Returns (top_labels (k,) int32 — n_vox for empty slots,
             top_sizes (k,) float32,
             valid (k,) bool — region exists and has >= min_size voxels).
    Slot order is size-descending with ties broken by smaller label,
    matching the previous segment_sum + top_k ranking exactly.
    """
    s = jnp.sort(labels_flat)
    iota = jnp.arange(n_vox, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    start_idx = jnp.where(is_start, iota, jnp.int32(n_vox))
    # suffix min (inclusive) of start_idx, then shift for "next start
    # strictly after i"
    suffmin = jax.lax.cummin(start_idx, reverse=True)
    nxt = jnp.concatenate([suffmin[1:], jnp.full((1,), n_vox, jnp.int32)])
    run_len = (nxt - iota).astype(jnp.float32)
    score = jnp.where(
        is_start & (s < n_vox) & (run_len >= min_size), run_len, -jnp.inf
    )
    # top_k ties break toward the earlier position = smaller label (s is
    # ascending), the same preference the voxel-index ranking had.  k may
    # exceed n_vox on tiny debug grids (top_k requires k <= axis size);
    # clamp and pad the extra slots as invalid so caller shapes hold.
    k_eff = min(k, n_vox)
    top_sizes, top_pos = jax.lax.top_k(score, k_eff)
    valid = jnp.isfinite(top_sizes)
    top_labels = jnp.where(valid, s[top_pos], jnp.int32(n_vox))
    top_sizes = jnp.where(valid, top_sizes, 0.0)
    if k_eff < k:
        pad = k - k_eff
        top_labels = jnp.concatenate(
            [top_labels, jnp.full((pad,), n_vox, jnp.int32)]
        )
        top_sizes = jnp.concatenate([top_sizes, jnp.zeros((pad,))])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return top_labels, top_sizes, valid


def absorb_small_components(
    spec_cc: jnp.ndarray,
    mask: jnp.ndarray,
    absorb_min: int = 32,
    absorb_frac: float = 0.2,
) -> jnp.ndarray:
    """Merge spurious small species-components into adjacent large ones.

    The reference labels connected components of the BINARY occupancy and
    majority-votes the species per region (watershed.py:56,158-167), so a
    fringe patch of mislabeled voxels inside an atom's blob never becomes
    its own atom.  The device path's same-species CC would promote such
    patches to atom slots — measured on the round-1 campaign this was the
    entire fused-path validity gap: the device OVERcounted (never merged)
    on 223/1000 generated samples, +1..+5 spurious fringe atoms each.

    A species-component is "small" when its voxel count is below
    ``max(absorb_min, absorb_frac * largest component in its binary
    blob)``.  Small components' voxels are BFS-reassigned to the nearest
    large component within the same binary blob — the device analog of the
    reference's majority vote.  A blob containing ONLY small components
    (a genuinely small isolated atom) keeps them all: absorption only
    fires where a larger sibling exists.

    Scatter-free: sizes come from capped match matrices against the 128
    largest components/blobs (see top_regions_by_size for why).  A
    component outside the global top 128 reads size 0 and is absorbed when
    its blob holds a ranked sibling; a blob whose components are ALL
    outside the top 128 keeps them (largest reads 0) — both only reachable
    with >128 components, far past max_atoms-scale populations.
    """
    shape = spec_cc.shape
    n_vox = shape[0] * shape[1] * shape[2]
    k = 128
    fg = mask > 0
    blob_cc = connected_components_same_value(fg.astype(jnp.int32))

    cc_flat = spec_cc.reshape(-1)
    blob_flat = blob_cc.reshape(-1)
    fg_flat = fg.reshape(-1)
    comp_labels, comp_sizes, comp_ok = top_regions_by_size(
        jnp.where(fg_flat, cc_flat, jnp.int32(n_vox)), k, 1, n_vox
    )
    m_comp = (cc_flat[:, None] == comp_labels[None, :]) & comp_ok[None, :]
    size_v = jnp.sum(
        m_comp.astype(jnp.float32) * comp_sizes[None, :], axis=1
    )
    # each ranked component's blob = blob label at its root voxel; the
    # largest component per ranked blob is a (k x k) masked max
    comp_blob = jnp.where(
        comp_ok,
        blob_flat[jnp.minimum(comp_labels, n_vox - 1)],
        jnp.int32(n_vox),
    )
    blob_labels, _, blob_ok = top_regions_by_size(
        jnp.where(fg_flat, blob_flat, jnp.int32(n_vox)), k, 1, n_vox
    )
    same_blob = (comp_blob[:, None] == blob_labels[None, :]) & (
        comp_ok[:, None] & blob_ok[None, :]
    )
    largest_b = jnp.max(
        jnp.where(same_blob, comp_sizes[:, None], 0.0), axis=0
    )
    m_blob = (blob_flat[:, None] == blob_labels[None, :]) & blob_ok[None, :]
    largest_v = jnp.sum(
        m_blob.astype(jnp.float32) * largest_b[None, :], axis=1
    )
    thresh = jnp.maximum(
        jnp.float32(absorb_min), absorb_frac * largest_v
    )
    # a blob's largest component is never absorbed (strict <), so every
    # blob keeps at least one seed — an isolated small atom survives even
    # below absorb_min
    is_small = fg_flat & (size_v < thresh) & (size_v < largest_v)
    seeds = (fg_flat & ~is_small).reshape(shape)
    return nearest_seed_labels(
        seeds, blob_cc, fg, seed_labels=spec_cc
    )


def erode6(fg: jnp.ndarray) -> jnp.ndarray:
    """Binary erosion with the 6-neighbor ball(1) structuring element —
    exactly the reference's marker erosion (watershed.py:27-33, ball(1))."""
    out = fg
    for axis in range(3):
        for shift in (1, -1):
            n = jnp.roll(fg, shift, axis=axis)
            d = fg.shape[axis]
            ax_idx = jax.lax.broadcasted_iota(jnp.int32, fg.shape, axis)
            edge = (ax_idx == 0) if shift == 1 else (ax_idx == d - 1)
            out = out & jnp.where(edge, False, n)
    return out


def split_by_erosion_cores(
    labels: jnp.ndarray,
    eroded: jnp.ndarray,
    fg: jnp.ndarray,
    wmin: int = 8,
    max_cores: int = 128,
) -> jnp.ndarray:
    """One level of the reference's marker split: regions of ``labels``
    whose eroded mask holds >= 2 cores of >= wmin voxels are BFS-relabeled
    to their nearest core (the watershed flood analog, watershed.py:98-111);
    regions with < 2 valid cores are untouched.  Returns new region labels
    with the root invariant preserved (each region's label is a voxel index
    inside it).

    Scatter-free: per-core sizes and per-region core counts come from
    ``top_regions_by_size`` + match matrices against the (<= ``max_cores``)
    largest cores instead of 32k-segment segment_sums (the measured TPU
    scatter cliff — see top_regions_by_size).  Only the ``max_cores``
    largest cores can act as split markers; a sample would need more than
    ``max_cores`` simultaneously-valid cores (>= 2 per splitting region)
    for that cap to bite, which cannot happen at max_atoms-scale region
    counts."""
    shape = labels.shape
    n_vox = shape[0] * shape[1] * shape[2]
    cores = connected_components_same_value(eroded.astype(jnp.int32))
    cores_f = cores.reshape(-1)
    lab_f = labels.reshape(-1)
    fg_f = fg.reshape(-1)

    core_labels, _, core_ok = top_regions_by_size(
        cores_f, max_cores, wmin, n_vox
    )
    # (n_vox, max_cores) membership in a valid core — built and reduced in
    # one fused pass, never a scatter
    m_core = (cores_f[:, None] == core_labels[None, :]) & core_ok[None, :]
    valid_core_v = jnp.any(m_core, axis=1)

    # each valid core's region = labels at the core's root voxel
    core_region = jnp.where(
        core_ok,
        lab_f[jnp.minimum(core_labels, n_vox - 1)],
        jnp.int32(n_vox),
    )
    cores_in_region = jnp.sum(
        ((lab_f[:, None] == core_region[None, :]) & core_ok[None, :]).astype(
            jnp.int32
        ),
        axis=1,
    )
    region_splits = fg_f & (cores_in_region >= 2)

    # seeds: valid-core voxels of splitting regions keep their core label;
    # every voxel of a non-splitting region is its own seed (region label)
    seed = fg_f & (jnp.where(region_splits, valid_core_v, True))
    seed_labels = jnp.where(region_splits, cores_f, lab_f)
    new = nearest_seed_labels(
        seed.reshape(shape),
        labels,                      # BFS stays inside the old region
        fg,
        seed_labels=seed_labels.reshape(shape),
    )
    # a splitting region could strand voxels if some core was invalid and
    # unreachable — they come back as n_vox (background); regions always
    # retain their valid cores, so atoms are never lost, only trimmed
    return new


def mode_filter(species: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """3^3 majority vote over nonzero labels — denoises patchy segmenter
    output before connected components (a U-Net's per-voxel argmax speckles
    at blob boundaries, which would shatter same-species CC into fragments).
    Voxels whose neighborhood holds no nonzero labels become 0.

    One-hot + a single reduce_window over all classes at once — a per-class
    scan of box sums costs num_classes full-grid passes and doubled the
    fused generation pipeline at 95 classes.  Neighborhood counts are <= 27
    so bfloat16 holds them exactly; ties go to the lowest class index
    (argmax takes the first maximum), matching the sequential version.
    """
    species = species.astype(jnp.int32)
    onehot = jax.nn.one_hot(species, num_classes, dtype=jnp.bfloat16)
    counts = jax.lax.reduce_window(
        onehot, jnp.bfloat16(0), jax.lax.add,
        (3, 3, 3, 1), (1, 1, 1, 1), "SAME",
    )
    counts = counts.at[..., 0].set(0)  # background never wins the vote
    best = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    return jnp.where(jnp.max(counts, axis=-1) > 0, best, 0)


@functools.partial(
    jax.jit,
    # absorb_frac stays traced: it only feeds arithmetic, and making it
    # static would recompile the whole program per swept value
    static_argnames=("max_atoms", "min_voxels", "smooth_classes",
                     "split_peaks", "peak_window", "absorb_min",
                     "method", "erosion_levels", "wmin",
                     "vote_classes"),
)
def extract_atoms(
    density: jnp.ndarray,   # (d, d, d) float (drives peak splitting)
    species: jnp.ndarray,   # (d, d, d) int labels (0 = background)
    mask: jnp.ndarray,      # (d, d, d) binary occupancy
    max_atoms: int = 64,
    min_voxels: int = 4,
    smooth_classes: int = 0,
    split_peaks: bool = False,
    peak_window: int = 2,
    absorb_min: int = 0,
    absorb_frac: float = 0.2,
    method: str = "species",
    erosion_levels: int = 1,
    wmin: int = 8,
    vote_classes: int = 95,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape atom extraction.

    Returns (atoms (max_atoms,) int32 — 0 for empty slots,
             centroids (max_atoms, 3) float32 voxel coordinates,
             valid (max_atoms,) bool).

    method="binary" — THE PRODUCTION FUSED-PATH METHOD — mirrors the
    reference pipeline exactly instead of partitioning by species:
    connected components of the BINARY occupancy (watershed.py:56),
    `erosion_levels` rounds of marker-erosion splitting (regions with
    >= 2 eroded cores of >= wmin voxels BFS-split to their nearest core;
    the convexity gate is redundant for the split decision — a convex
    blob's erosion is connected, so it can never produce two cores),
    then MAJORITY-VOTE species per region over `vote_classes` classes
    (watershed.py:158-167).  It absorbs species-confused fringe patches
    the way the reference's vote does AND splits touching atoms the way
    its watershed does.

    The remaining options belong to the species-CC method (clean
    voxelizer grids; design history in the module docstring):

    smooth_classes > 0 applies the 3^3 mode filter with that class count
    before CC — use it when the species grid comes from a segmentation
    model rather than the voxelizer.

    absorb_min > 0 enables fringe-patch absorption (see
    absorb_small_components) — the device analog of the reference's
    binary-blob majority vote.

    split_peaks=True splits same-species components at their density local
    maxima — the analog of the host watershed's erosion/marker split for
    touching same-species atoms (watershed.py:98-144).  Off by default:
    on real decoded grids the merging it guards against was never
    observed, while decoder density ripples make peak splitting
    overcount (measured in round 2).
    """
    shape = species.shape
    n_vox = shape[0] * shape[1] * shape[2]
    spec = jnp.where(mask > 0, species.astype(jnp.int32), 0)
    if smooth_classes:
        spec = jnp.where(mask > 0, mode_filter(spec, smooth_classes), 0)
    if method == "binary":
        fg = mask > 0
        lab3 = connected_components_same_value(fg.astype(jnp.int32))
        er = fg
        for _ in range(erosion_levels):
            er = erode6(er)
            lab3 = split_by_erosion_cores(lab3, er, fg, wmin=wmin)
        labels = lab3.reshape(-1)
    else:
        fg = spec > 0
        cc = connected_components_same_value(spec)
        if absorb_min:
            # absorbed voxels now carry their large region's label;
            # background (and unreachable voxels) carries n_vox
            cc = absorb_small_components(
                cc, fg.astype(jnp.int32), absorb_min=absorb_min,
                absorb_frac=absorb_frac,
            )
        if split_peaks:
            seeds = density_peaks(density, cc, fg, window=peak_window)
            cc = nearest_seed_labels(seeds, cc, fg)
        labels = cc.reshape(-1)
    spec_f = spec.reshape(-1)
    fg_f = fg.reshape(-1)

    # Rank regions by size without a 32k-segment scatter (the measured TPU
    # cliff — see top_regions_by_size).  Background and BFS-unreached
    # voxels already carry n_vox; the extra where keeps that invariant for
    # every method path.
    labels = jnp.where(fg_f, labels, jnp.int32(n_vox))
    top_idx, _, slot_valid = top_regions_by_size(
        labels, max_atoms, min_voxels, n_vox
    )

    # Map every voxel's region label to a slot via a membership matrix and
    # reduce with MATMULS, not segment_sums: even the 65-segment scatters
    # cost 42-76 ms for a vmapped 128-batch on TPU (measured,
    # output/ns10k/profile_bisect2.json) while the (n_vox x max_atoms)^T
    # matmul reductions are < 1 ms on the MXU.  Every operand (0/1
    # membership, integer voxel coordinates, one-hot species) is exactly
    # representable and the MXU accumulates in f32, so the results are
    # bit-exact matches of the scatter form.
    match = labels[:, None] == top_idx[None, :]          # (n_vox, max_atoms)
    match = match & slot_valid[None, :]
    mf = match.astype(jnp.float32)

    coords = jnp.stack(
        [
            jax.lax.broadcasted_iota(jnp.float32, shape, 0).reshape(-1),
            jax.lax.broadcasted_iota(jnp.float32, shape, 1).reshape(-1),
            jax.lax.broadcasted_iota(jnp.float32, shape, 2).reshape(-1),
        ],
        axis=-1,
    )
    slot_counts = jnp.sum(mf, axis=0)                    # (max_atoms,)
    sums = mf.T @ coords                                 # (max_atoms, 3)
    centroids = sums / jnp.maximum(slot_counts[:, None], 1.0)

    if method == "binary":
        # majority-vote species per region over nonzero classes
        # (watershed.py:158-167)
        onehot = jax.nn.one_hot(spec_f, vote_classes, dtype=jnp.float32)
        votes = mf.T @ onehot                            # (max_atoms, classes)
        votes = votes.at[:, 0].set(0.0)
        atoms = jnp.where(
            slot_valid & (jnp.max(votes, axis=1) > 0),
            jnp.argmax(votes, axis=1),
            0,
        ).astype(jnp.int32)
    else:
        # species constant within a same-value component — read the root
        # voxel's value (empty slots carry n_vox; clamp before the gather)
        atoms = jnp.where(
            slot_valid, spec_f[jnp.minimum(top_idx, n_vox - 1)], 0
        ).astype(jnp.int32)
    valid = slot_valid & (slot_counts > 0) & (atoms > 0)
    atoms = jnp.where(valid, atoms, 0)
    centroids = jnp.where(valid[:, None], centroids, 0.0)
    return atoms, centroids, valid


def extract_atoms_batch(
    density, species, mask, max_atoms: int = 64, min_voxels: int = 4,
    smooth_classes: int = 0, split_peaks: bool = False, peak_window: int = 2,
    absorb_min: int = 0, absorb_frac: float = 0.2,
    method: str = "species", erosion_levels: int = 1, wmin: int = 8,
    vote_classes: int = 95,
):
    """vmapped extraction over a batch of grids."""
    fn = functools.partial(
        extract_atoms, max_atoms=max_atoms, min_voxels=min_voxels,
        smooth_classes=smooth_classes, split_peaks=split_peaks,
        peak_window=peak_window, absorb_min=absorb_min,
        absorb_frac=absorb_frac, method=method,
        erosion_levels=erosion_levels, wmin=wmin, vote_classes=vote_classes,
    )
    return jax.vmap(fn)(density, species, mask)
