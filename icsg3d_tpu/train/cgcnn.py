"""CGCNN training: jitted steps + driver loop.

Reference flow (train_cgcnn.py): MSE loss, MAE metric, Adam(1e-3),
best-val-MAE checkpointing.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icsg3d_tpu.config import CGCNNConfig, TrainConfig
from icsg3d_tpu.models.cgcnn import CGCNN
from icsg3d_tpu.ops import losses
from icsg3d_tpu.data.store import prefetch_to_device
from icsg3d_tpu.parallel import batch_sharding, make_mesh
from icsg3d_tpu.train.checkpoints import CheckpointManager
from icsg3d_tpu.train.state import ModelState


def create_cgcnn_state(
    cfg: CGCNNConfig, train_cfg: TrainConfig, rng, abstract: bool = False
) -> Tuple[CGCNN, ModelState]:
    """abstract=True builds a host-only zeros skeleton (no device init) —
    for states about to be overwritten by a checkpoint restore."""
    model = CGCNN(cfg)
    B, N, M = 1, cfg.max_atoms, cfg.max_neighbors
    init = lambda: model.init(
        rng,
        jnp.zeros((B, N, cfg.atom_input_dim)),
        jnp.full((B, N, M), cfg.radius),
        jnp.zeros((B, N, M), jnp.int32),
        jnp.ones((B, N)),
    )
    tx = optax.adam(train_cfg.learning_rate)
    if abstract:
        return model, ModelState.create_abstract(model.apply, init, tx)
    return model, ModelState.create(model.apply, init(), tx)


def _cgcnn_losses(model, params, batch):
    preds = model.apply(
        {"params": params},
        batch["atom_fea"], batch["nbr_dist"], batch["nbr_idx"],
        batch["atom_mask"],
    )
    loss = losses.mse_loss(preds, batch["target"])
    return loss, {"loss": loss, "mae": losses.mae(preds, batch["target"])}


def make_cgcnn_steps(model: CGCNN):
    def train_step(state: ModelState, batch):
        def loss_fn(params):
            return _cgcnn_losses(model, params, batch)

        grads, mets = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), mets

    def eval_step(state: ModelState, batch):
        _, mets = _cgcnn_losses(model, state.params, batch)
        return mets

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


from icsg3d_tpu.train.common import mean_metrics as _mean_metrics


def train_cgcnn(
    model: CGCNN,
    state: ModelState,
    train_batches: Callable[[], Iterable],
    val_batches: Callable[[], Iterable],
    epochs: int,
    checkpoint_dir: Optional[str] = None,
    mesh=None,
    log_fn=print,
    latest_every: int = 1,
):
    mesh = mesh or make_mesh()
    train_step, eval_step = make_cgcnn_steps(model)
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        sharding = batch_sharding(mesh)
        train_mets = []
        for b in prefetch_to_device(train_batches(), devices=sharding):
            state, m = train_step(state, b)
            train_mets.append(m)
        val_mets = [
            eval_step(state, b)
            for b in prefetch_to_device(val_batches(), devices=sharding)
        ]
        tm = _mean_metrics([jax.device_get(m) for m in train_mets])
        if not tm:
            raise ValueError(
                "no train batches: the train split is smaller than the "
                "batch size (remainders are dropped)"
            )
        vm = _mean_metrics([jax.device_get(m) for m in val_mets])
        if not vm:
            if epoch == 0:
                log_fn(
                    "warning: no val batches (val split smaller than the "
                    "batch size) — 'val' metrics below are TRAIN metrics "
                    "and best-checkpoint selection is overfitting-blind"
                )
            vm = tm
        history.append({"train": tm, "val": vm, "time": time.time() - t0})
        log_fn(
            f"epoch {epoch}: time {history[-1]['time']:.2f}s "
            f"train mse {tm['loss']:.4f} mae {tm['mae']:.4f} | "
            f"val mae {vm['mae']:.4f}"
        )
        if ckpt:
            ckpt.save_epoch(state, vm["mae"], epoch, latest_every=latest_every)
    if (ckpt and epochs > 0 and latest_every > 1
            and ckpt.last_latest_epoch != epochs - 1):
        ckpt.save_latest(state)  # final save so --resume continues from the end
    return state, history
