"""Training layer: train states, jitted DP train steps, drivers, checkpoints.

Replaces the reference's Keras fit_generator / train_on_batch loops
(unet/unet.py:357-381, vae/lattice_vae.py:272-342, train_cgcnn.py) with
mesh-sharded jitted steps, double-buffered host prefetch, and Orbax
best-validation checkpointing.
"""

from icsg3d_tpu.train.state import ModelState
from icsg3d_tpu.train.checkpoints import CheckpointManager
from icsg3d_tpu.train.unet import (
    create_unet_state,
    make_unet_steps,
    train_unet,
)
from icsg3d_tpu.train.vae import (
    create_vae_state,
    make_vae_steps,
    train_vae,
)
from icsg3d_tpu.train.cgcnn import (
    create_cgcnn_state,
    make_cgcnn_steps,
    train_cgcnn,
)

__all__ = [
    "ModelState",
    "CheckpointManager",
    "create_unet_state",
    "make_unet_steps",
    "train_unet",
    "create_vae_state",
    "make_vae_steps",
    "train_vae",
    "create_cgcnn_state",
    "make_cgcnn_steps",
    "train_cgcnn",
]
