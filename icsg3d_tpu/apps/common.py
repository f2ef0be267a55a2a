"""Shared helpers for the application CLIs: model/checkpoint loading and
batched inference functions."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icsg3d_tpu.config import CGCNNConfig, TrainConfig, UNetConfig, VAEConfig
from icsg3d_tpu.models import CGCNN, ConditionalDFCVAE, UNet3D
from icsg3d_tpu.train import (
    CheckpointManager,
    create_cgcnn_state,
    create_unet_state,
    create_vae_state,
)


def parse_filters(spec: str) -> Tuple[int, ...]:
    """Parse a comma-separated ``--filters`` flag ("16,32,64") to a tuple.

    Must match the filters the checkpoint was trained with; the default
    (16,32,64,128) needs a 16^3-or-larger grid (VAEConfig validates).
    """
    try:
        filters = tuple(int(t) for t in spec.split(",") if t.strip())
    except ValueError:
        raise SystemExit(f"--filters must be comma-separated ints, got {spec!r}")
    if not filters or any(f <= 0 for f in filters):
        raise SystemExit(
            f"--filters must name at least one positive block size, got {spec!r}"
        )
    return filters


def resolve_grid_d(arg_d, dataset) -> int:
    """Reconcile a --d flag with the dataset's actual grid resolution.

    The packed GridDataset knows its own d; a silently mismatched flag
    used to surface as a cryptic Flax param-shape error deep in the
    first train step (model built for d=32, batches shipped at d=16).
    Default (None) adopts the dataset's d; an explicit conflicting value
    is a hard error.
    """
    ds_d = int(dataset.d)
    if arg_d is None:
        return ds_d
    if int(arg_d) != ds_d:
        raise SystemExit(
            f"--d {arg_d} does not match the dataset's grid resolution "
            f"{ds_d} (from {dataset.path}); drop --d to use the "
            "dataset's value"
        )
    return int(arg_d)


def add_vae_flags(parser) -> None:
    """The VAE-checkpoint geometry flags shared by every consuming CLI."""
    parser.add_argument(
        "--latent", type=int, default=256,
        help="latent dim the VAE checkpoint was trained with",
    )
    parser.add_argument(
        "--filters", default="16,32,64,128",
        help="comma-separated VAE filter blocks of the checkpoint",
    )
    parser.add_argument(
        "--layout", default="ndhwc", choices=["ndhwc", "ndcs"],
        help="activation layout for the conv stacks (both models); "
             "parameter trees are layout-independent, so any checkpoint "
             "loads under either layout (ops/lowc_conv.py)",
    )
    parser.add_argument(
        "--cond-repeat", type=int, default=1,
        help="channel-repeat of the condition block; 4 reproduces the "
             "reference's Keras tile quirk (44-channel encoder input, "
             "vae/lattice_vae.py:166-169; config.VAEConfig docstring)",
    )


def vae_config_from_args(args, grid) -> VAEConfig:
    return VAEConfig(
        grid=grid, cond_bins=args.cond_bins, latent_dim=args.latent,
        filters=parse_filters(args.filters),
        layout=getattr(args, "layout", "ndhwc"),
        cond_repeat=getattr(args, "cond_repeat", 1),
    )


def checkpoint_if_exists(checkpoint_dir: Optional[str], which: str = "best"):
    """CheckpointManager when ``which`` exists under the dir, else None.

    Probes with a plain path check BEFORE constructing the manager: the
    CheckpointManager constructor mkdirs its directory, so probing a typo'd
    --*-ckpt path through it would silently create an empty directory.
    """
    if not checkpoint_dir:
        return None
    import os as _os
    import sys as _sys

    probe = _os.path.join(checkpoint_dir, which)
    if not _os.path.exists(probe) and any(
        _os.path.exists(probe + suf) for suf in (".new", ".old")
    ):
        # a kill inside CheckpointManager._save_swap's rename window left
        # a finalized sibling; the manager heals it on open
        return CheckpointManager(checkpoint_dir)
    if not _os.path.exists(probe):
        if _os.path.isdir(checkpoint_dir):
            print(
                f"warning: checkpoint dir {checkpoint_dir!r} has no "
                f"{which!r} checkpoint; using fresh weights",
                file=_sys.stderr,
            )
        return None
    return CheckpointManager(checkpoint_dir)


def load_unet(
    cfg: UNetConfig, checkpoint_dir: Optional[str], grid_d: int = 32,
    which: str = "best",
) -> Tuple[UNet3D, Dict]:
    """U-Net + variables, restored from a checkpoint when one exists.

    When restoring, the state skeleton is built abstractly (host zeros) —
    a real device init would compile and run the full model just to be
    overwritten, a multi-minute cost over a remote device link.
    """
    ckpt = checkpoint_if_exists(checkpoint_dir, which)
    model, state = create_unet_state(
        cfg, TrainConfig(), jax.random.key(0), grid_d=grid_d,
        abstract=ckpt is not None,
    )
    if ckpt is not None:
        state = ckpt.restore(state, which)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def load_vae(
    cfg: VAEConfig, checkpoint_dir: Optional[str], which: str = "best"
) -> Tuple[ConditionalDFCVAE, Dict]:
    ckpt = checkpoint_if_exists(checkpoint_dir, which)
    model, state = create_vae_state(
        cfg, TrainConfig(), jax.random.key(0), abstract=ckpt is not None
    )
    if ckpt is not None:
        state = ckpt.restore(state, which)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def load_cgcnn(
    cfg: CGCNNConfig, checkpoint_dir: Optional[str], which: str = "best"
) -> Tuple[CGCNN, Dict]:
    ckpt = checkpoint_if_exists(checkpoint_dir, which)
    model, state = create_cgcnn_state(
        cfg, TrainConfig(), jax.random.key(0), abstract=ckpt is not None
    )
    if ckpt is not None:
        state = ckpt.restore(state, which)
    return model, {"params": state.params}


def jit_vae_encode(model: ConditionalDFCVAE, variables):
    @jax.jit
    def encode(x, cond):
        return model.apply(variables, x, cond, method=ConditionalDFCVAE.encode)

    return encode


def jit_vae_decode(model: ConditionalDFCVAE, variables):
    @jax.jit
    def decode(z, cond):
        return model.apply(variables, z, cond, method=ConditionalDFCVAE.decode)

    return decode


def jit_vae_reconstruct(model: ConditionalDFCVAE, variables):
    @jax.jit
    def recon(x, cond, rng):
        out, z_mean, z_log_var, _ = model.apply(
            variables, x, cond, rng, train=False
        )
        return out, z_mean, z_log_var

    return recon


def jit_unet_segment(model: UNet3D, variables, binary_threshold: float = 0.8):
    """Segment grids: (species labels, binary occupancy, probs)."""

    @jax.jit
    def segment(x):
        soft, sig = model.apply(variables, x, train=False)
        probs = jax.nn.softmax(soft, axis=-1)
        labels = jnp.argmax(probs, axis=-1)
        binary = (jax.nn.sigmoid(sig[..., 0]) > binary_threshold).astype(
            jnp.int32
        )
        return labels, binary, probs

    return segment


def jit_cgcnn_predict(model: CGCNN, variables):
    @jax.jit
    def predict(atom_fea, nbr_dist, nbr_idx, atom_mask):
        return model.apply(
            variables, atom_fea, nbr_dist, nbr_idx, atom_mask
        )

    return predict


def grid_input(density: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """(B,d,d,d) + (B,d,d,d,3) -> (B,d,d,d,4) model input."""
    return np.concatenate(
        [density[..., None].astype(np.float32), coords.astype(np.float32)],
        axis=-1,
    )
