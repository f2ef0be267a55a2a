"""On-device atom extraction: same-species connected components + segment
reductions, fully jit/vmap-compatible with fixed shapes.

The host watershed (ops/segmentation.py) is the parity-exact
implementation of the reference's recursive skimage pipeline; it is also
the one piece of generate.py that forced a per-sample host round trip
(generate.py:228-248).  This module is the TPU-native fast path that makes
decode -> segment -> extract one XLA program.

Algorithm:
1. Connected components of the species grid (6-connectivity, neighbors
   connect when they hold the SAME nonzero label — the semantics of
   skimage.measure.label the reference relies on, watershed.py:56) via
   min-label propagation in a ``lax.while_loop``.  Plain neighbor-min
   iteration (rolls + wheres, pure VPU) needs O(region diameter) rounds
   but measured 62x FASTER on TPU than pointer-jumping variants — the
   path-halving gathers are random-access and serialize on TPU, while a
   dozen extra roll/min rounds are nearly free.
2. Tiny regions (<= 3 voxels) are dropped, like the reference
   (watershed.py:58-61).
3. The up-to-``max_atoms`` largest regions become atom slots; centroids are
   masked segment means over voxel coordinates; the species of a region is
   its (constant) label value.

Raw density-peak finding alone does NOT work here: light atoms sitting on a
heavy neighbor's Gaussian shoulder have no local density maximum of their
own (an O next to Ti in a perovskite, for instance).  The species grid
already partitions voxels by nearest site, which is the signal the
reference's watershed recovers geometrically.  But WITHIN one same-species
component the shoulder problem disappears — equal species means equal
Gaussian weight and width, so every constituent atom contributes its own
local maximum.  Step 1b below therefore splits merged same-species
components by their density peaks: per-component local maxima become seeds,
and a bounded multi-source BFS relabels each component voxel to its
nearest seed (the device analog of the reference's erosion + marker
watershed split, watershed.py:98-144).  The host path
(ops/segmentation.py) remains the reference-parity implementation.
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
    flat plateaus to a single seed without epsilon hacks, and the
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
    """
    shape = spec_cc.shape
    n_vox = shape[0] * shape[1] * shape[2]
    fg = mask > 0
    blob_cc = connected_components_same_value(fg.astype(jnp.int32))

    cc_flat = spec_cc.reshape(-1)
    blob_flat = blob_cc.reshape(-1)
    fg_flat = fg.reshape(-1)
    ones = fg_flat.astype(jnp.float32)
    sizes = jax.ops.segment_sum(ones, cc_flat, num_segments=n_vox + 1)
    size_v = sizes[jnp.minimum(cc_flat, n_vox)]
    largest_in_blob = jax.ops.segment_max(
        jnp.where(fg_flat, size_v, 0.0), blob_flat, num_segments=n_vox + 1
    )
    largest_v = largest_in_blob[jnp.minimum(blob_flat, n_vox)]
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
) -> jnp.ndarray:
    """One level of the reference's marker split: regions of ``labels``
    whose eroded mask holds >= 2 cores of >= wmin voxels are BFS-relabeled
    to their nearest core (the watershed flood analog, watershed.py:98-111);
    regions with < 2 valid cores are untouched.  Returns new region labels
    with the root invariant preserved (each region's label is a voxel index
    inside it)."""
    shape = labels.shape
    n_vox = shape[0] * shape[1] * shape[2]
    cores = connected_components_same_value(eroded.astype(jnp.int32))
    cores_f = cores.reshape(-1)
    lab_f = labels.reshape(-1)
    fg_f = fg.reshape(-1)
    in_core = cores_f < n_vox

    core_size = jax.ops.segment_sum(
        in_core.astype(jnp.float32), cores_f, num_segments=n_vox + 1
    )
    vox_idx = jnp.arange(n_vox, dtype=jnp.int32)
    valid_core_v = in_core & (core_size[jnp.minimum(cores_f, n_vox)] >= wmin)
    is_core_root = valid_core_v & (cores_f == vox_idx)
    cores_per_region = jax.ops.segment_sum(
        is_core_root.astype(jnp.float32), lab_f, num_segments=n_vox + 1
    )
    region_splits = cores_per_region[jnp.minimum(lab_f, n_vox)] >= 2

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
    static_argnames=("max_atoms", "min_voxels", "smooth_classes",
                     "split_peaks", "peak_window", "absorb_min",
                     "absorb_frac", "method", "erosion_levels", "wmin",
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

    smooth_classes > 0 applies the 3^3 mode filter with that class count
    before CC — use it when the species grid comes from a segmentation
    model rather than the voxelizer.

    absorb_min > 0 enables fringe-patch absorption (see
    absorb_small_components) — the device analog of the reference's
    binary-blob majority vote, and the fix for the measured fused-path
    overcounting on decoded grids.  Use together with smooth_classes on
    segmenter output.

    split_peaks=True splits same-species components at their density local
    maxima (see module docstring) — the analog of the host watershed's
    erosion/marker split for touching same-species atoms
    (watershed.py:98-144).  Off by default: on real decoded grids the
    merging it guards against was never observed, while decoder density
    ripples make peak splitting overcount (measured in round 2).

    method="binary" mirrors the reference pipeline exactly instead of
    partitioning by species: connected components of the BINARY occupancy
    (watershed.py:56), `erosion_levels` rounds of marker-erosion splitting
    (regions with >= 2 eroded cores of >= wmin voxels BFS-split to their
    nearest core; the convexity gate is redundant for the split decision —
    a convex blob's erosion is connected, so it can never produce two
    cores), then MAJORITY-VOTE species per region over `vote_classes`
    classes (watershed.py:158-167).  This is the production fused-path
    method: it absorbs species-confused fringe patches the way the
    reference's vote does AND splits touching atoms the way its watershed
    does.
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

    # Region sizes; roots are voxels whose label equals their own index.
    ones = fg_f.astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, labels, num_segments=n_vox + 1)
    vox_idx = jnp.arange(n_vox, dtype=jnp.int32)
    is_root = (labels == vox_idx) & fg_f
    # counts indexed by voxel id == counts[:n_vox] (labels are voxel ids);
    # a slice, not a 32k-element gather (gathers serialize on TPU).
    own_count = counts[:n_vox]
    root_score = jnp.where(
        is_root & (own_count >= min_voxels), own_count, -jnp.inf
    )
    top_val, top_idx = jax.lax.top_k(root_score, max_atoms)
    slot_valid = jnp.isfinite(top_val)

    # Map every voxel's region label to a slot (or max_atoms = background).
    match = labels[:, None] == top_idx[None, :]          # (n_vox, max_atoms)
    match = match & slot_valid[None, :]
    in_any = jnp.any(match, axis=1)
    slot = jnp.where(in_any, jnp.argmax(match, axis=1), max_atoms)

    coords = jnp.stack(
        [
            jax.lax.broadcasted_iota(jnp.float32, shape, 0).reshape(-1),
            jax.lax.broadcasted_iota(jnp.float32, shape, 1).reshape(-1),
            jax.lax.broadcasted_iota(jnp.float32, shape, 2).reshape(-1),
        ],
        axis=-1,
    )
    w = in_any.astype(jnp.float32)
    slot_counts = jax.ops.segment_sum(w, slot, num_segments=max_atoms + 1)
    sums = jax.ops.segment_sum(
        coords * w[:, None], slot, num_segments=max_atoms + 1
    )
    centroids = sums[:max_atoms] / jnp.maximum(slot_counts[:max_atoms, None], 1.0)

    if method == "binary":
        # majority-vote species per region over nonzero classes
        # (watershed.py:158-167)
        onehot = jax.nn.one_hot(spec_f, vote_classes, dtype=jnp.float32)
        votes = jax.ops.segment_sum(
            onehot * w[:, None], slot, num_segments=max_atoms + 1
        )
        votes = votes.at[:, 0].set(0.0)
        atoms = jnp.where(
            slot_valid & (jnp.max(votes[:max_atoms], axis=1) > 0),
            jnp.argmax(votes[:max_atoms], axis=1),
            0,
        ).astype(jnp.int32)
    else:
        # species constant within a same-value component — read the root
        # voxel's value
        atoms = jnp.where(slot_valid, spec_f[top_idx], 0).astype(jnp.int32)
    valid = slot_valid & (slot_counts[:max_atoms] > 0) & (atoms > 0)
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
