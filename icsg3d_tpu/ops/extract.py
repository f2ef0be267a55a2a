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

Raw density-peak finding does NOT work here: light atoms sitting on a heavy
neighbor's Gaussian shoulder have no local density maximum of their own
(an O next to Ti in a perovskite, for instance).  The species grid already
partitions voxels by nearest site, which is the signal the reference's
watershed recovers geometrically.  Known divergence: two touching regions
of the SAME species merge into one slot here; the host path splits them by
erosion, and remains the canonical implementation for that case.
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
    jax.jit, static_argnames=("max_atoms", "min_voxels", "smooth_classes")
)
def extract_atoms(
    density: jnp.ndarray,   # (d, d, d) float (unused by CC; kept for tie-breaks)
    species: jnp.ndarray,   # (d, d, d) int labels (0 = background)
    mask: jnp.ndarray,      # (d, d, d) binary occupancy
    max_atoms: int = 64,
    min_voxels: int = 4,
    smooth_classes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape atom extraction.

    Returns (atoms (max_atoms,) int32 — 0 for empty slots,
             centroids (max_atoms, 3) float32 voxel coordinates,
             valid (max_atoms,) bool).

    smooth_classes > 0 applies the 3^3 mode filter with that class count
    before CC — use it when the species grid comes from a segmentation
    model rather than the voxelizer.
    """
    shape = species.shape
    n_vox = shape[0] * shape[1] * shape[2]
    spec = jnp.where(mask > 0, species.astype(jnp.int32), 0)
    if smooth_classes:
        spec = jnp.where(mask > 0, mode_filter(spec, smooth_classes), 0)
    labels = connected_components_same_value(spec).reshape(-1)
    spec_f = spec.reshape(-1)

    # Region sizes; roots are voxels whose label equals their own index.
    ones = (spec_f > 0).astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, labels, num_segments=n_vox + 1)
    vox_idx = jnp.arange(n_vox, dtype=jnp.int32)
    is_root = (labels == vox_idx) & (spec_f > 0)
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

    # Species per region: constant within a same-value component — read the
    # root voxel's value.
    atoms = jnp.where(slot_valid, spec_f[top_idx], 0).astype(jnp.int32)
    valid = slot_valid & (slot_counts[:max_atoms] > 0) & (atoms > 0)
    atoms = jnp.where(valid, atoms, 0)
    centroids = jnp.where(valid[:, None], centroids, 0.0)
    return atoms, centroids, valid


def extract_atoms_batch(
    density, species, mask, max_atoms: int = 64, min_voxels: int = 4,
    smooth_classes: int = 0,
):
    """vmapped extraction over a batch of grids."""
    fn = functools.partial(
        extract_atoms, max_atoms=max_atoms, min_voxels=min_voxels,
        smooth_classes=smooth_classes,
    )
    return jax.vmap(fn)(density, species, mask)
