"""U-Net training: jitted DP steps + driver loop.

Reference flow (train_unet.py + unet/unet.py:357-381): weighted categorical
crossentropy on the `soft` head + binary crossentropy on the `sig` head,
Adam, best-val checkpointing, f1/weighted-recall metrics.

Note on the class weights: the reference had a bug where the computed
inverse-frequency weights were never used in-graph (it compiled the loss
with the integer num_classes as the weight vector, unet/unet.py:252-254).
Here the weights are applied for real; pass ``class_weights=None`` to train
unweighted.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icsg3d_tpu.config import TrainConfig, UNetConfig
from icsg3d_tpu.models.unet import UNet3D
from icsg3d_tpu.ops import losses, metrics
from icsg3d_tpu.data.store import prefetch_to_device
from icsg3d_tpu.parallel import batch_sharding, make_mesh
from icsg3d_tpu.train.checkpoints import CheckpointManager
from icsg3d_tpu.train.state import ModelState


def create_unet_state(
    cfg: UNetConfig,
    train_cfg: TrainConfig,
    rng,
    grid_d: int = 32,
    abstract: bool = False,
    spatial_mesh=None,
) -> Tuple[UNet3D, ModelState]:
    """abstract=True builds a host-only zeros skeleton (no device init) —
    for states about to be overwritten by a checkpoint restore.

    spatial_mesh routes ndcs-layout convs through the halo-sharded Pallas
    path (models/layers.py SpatialMajorConv.spatial_mesh)."""
    model = UNet3D(cfg, spatial_mesh=spatial_mesh)
    tx = optax.adam(train_cfg.learning_rate)

    def init():
        x = jnp.zeros(
            (1, grid_d, grid_d, grid_d, cfg.in_channels), jnp.float32
        )
        return model.init(rng, x, train=False)
    if abstract:
        return model, ModelState.create_abstract(model.apply, init, tx)
    return model, ModelState.create(model.apply, init(), tx)


def _unet_losses(model, params, batch_stats, batch, class_weights, train: bool):
    """Shared forward + loss for train/eval.

    Consumes integer species labels (batch["labels"]) — the one-hot and the
    binary occupancy derive on device, so the host->device transfer is int32
    labels (1/95th of the one-hot float planes the reference generators
    shipped per batch, unet/data.py:79-89).
    """
    from icsg3d_tpu.train.vae import _assemble_x

    batch = dict(batch)
    batch["x"] = _assemble_x(batch, None)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (soft, sig), new_state = model.apply(
            variables, batch["x"], train=True, mutable=["batch_stats"]
        )
        new_bs = new_state["batch_stats"]
    else:
        soft, sig = model.apply(variables, batch["x"], train=False)
        new_bs = batch_stats
    labels = batch["labels"]
    y_sig = (labels != 0).astype(jnp.float32)[..., None]
    l_soft = jnp.mean(
        losses.weighted_categorical_crossentropy_from_labels(
            soft, labels, class_weights
        )
    )
    l_sig = jnp.mean(losses.binary_crossentropy_from_logits(sig, y_sig))
    loss = l_soft + l_sig
    probs = jax.nn.softmax(soft, axis=-1)
    # Unweighted CE + per-class CE alongside the weighted loss: the weighted
    # loss VALUE scales with the class-weight vector (which depends on the
    # data build), so it is not comparable across builds — these are
    # (the round-3 U-Net loss-scale anomaly; tools/loss_scale_probe.py).
    nc = soft.shape[-1]
    p_true = jnp.clip(
        jnp.take_along_axis(probs, labels[..., None].astype(jnp.int32),
                            axis=-1)[..., 0],
        losses.KERAS_EPSILON, 1.0 - losses.KERAS_EPSILON,
    )
    nll = -jnp.log(p_true)
    flat_l = labels.ravel().astype(jnp.int32)
    cls_nll = jnp.zeros(nc, jnp.float32).at[flat_l].add(nll.ravel())
    cls_cnt = jnp.zeros(nc, jnp.float32).at[flat_l].add(1.0)
    mets = {
        "loss": loss,
        "loss_soft": l_soft,
        "loss_sig": l_sig,
        "ce": jnp.mean(nll),
        "ce_class_sum": cls_nll,   # ratio taken after batch averaging
        "class_count": cls_cnt,    # (train_unet history assembly)
        "f1": metrics.f1_score_from_labels(labels, probs),
        "weighted_recall": metrics.weighted_recall_from_labels(labels, probs),
    }
    return loss, (mets, new_bs)


def make_unet_steps(model: UNet3D, class_weights=None, resident: bool = False):
    """Build (train_step, eval_step), both jitted with donated state.

    resident=True builds steps for an HBM-resident dataset: they take
    (state, data, idx) where `data` is the whole split already on device
    and `idx` is the batch's row indices; the batch gathers INSIDE the
    jitted program (see train/vae.py make_vae_steps).
    """
    nc = model.cfg.num_classes
    cw = jnp.ones(nc) if class_weights is None else jnp.asarray(class_weights)

    def train_step(state: ModelState, batch):
        def loss_fn(params):
            return _unet_losses(
                model, params, state.batch_stats, batch, cw, train=True
            )

        grads, (mets, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), mets

    def eval_step(state: ModelState, batch):
        _, (mets, _) = _unet_losses(
            model, state.params, state.batch_stats, batch, cw, train=False
        )
        return mets

    if resident:
        def _gather(data, idx):
            return {k: v[idx] for k, v in data.items()}

        def train_step_resident(state, data, idx):
            return train_step(state, _gather(data, idx))

        def eval_step_resident(state, data, idx):
            return eval_step(state, _gather(data, idx))

        return (
            jax.jit(train_step_resident, donate_argnums=(0,)),
            jax.jit(eval_step_resident),
        )

    return (
        jax.jit(train_step, donate_argnums=(0,)),
        jax.jit(eval_step),
    )


def make_unet_epoch_fns(model: UNet3D, class_weights=None,
                        field_shapes=None):
    """Whole-epoch jitted programs for an HBM-resident split — the U-Net
    mirror of train/vae.py make_vae_epoch_fns (see there for the full
    rationale: one permutation upload + one metrics fetch per epoch,
    compiler-visible lax.scan control flow, single-process full-schedule
    runs over the leaky remote plugin; and for field_shapes — resident
    fields stored flat as (N, K) so XLA gathers them in place instead of
    relayouting multi-GB operands into padded temp copies).

    train_epoch(state, data, perm) -> (state, mean_metrics)
    val_epoch(state, data, idx) -> mean_metrics

    Metric means reduce over the STEP axis only, so the per-class
    (ce_class_sum, class_count) accumulator vectors keep their shape and
    _fold_per_class_ce works unchanged on the result.
    """
    nc = model.cfg.num_classes
    cw = jnp.ones(nc) if class_weights is None else jnp.asarray(class_weights)

    def _gather(data, idx):
        out = {}
        for k, v in data.items():
            g = v[idx]
            if field_shapes and k in field_shapes:
                g = g.reshape((idx.shape[0],) + tuple(field_shapes[k]))
            out[k] = g
        return out

    def _mean0(mets):
        return jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), mets)

    def train_epoch(state: ModelState, data, perm):
        def body(state, idx):
            def loss_fn(params):
                return _unet_losses(
                    model, params, state.batch_stats, _gather(data, idx),
                    cw, train=True,
                )

            grads, (mets, new_bs) = jax.grad(
                loss_fn, has_aux=True
            )(state.params)
            return state.apply_gradients(grads, new_batch_stats=new_bs), mets

        state, mets = jax.lax.scan(body, state, perm)
        return state, _mean0(mets)

    def val_epoch(state: ModelState, data, idx):
        def body(carry, rows):
            _, (mets, _) = _unet_losses(
                model, state.params, state.batch_stats,
                _gather(data, rows), cw, train=False,
            )
            return carry, mets

        _, mets = jax.lax.scan(body, 0, idx)
        return _mean0(mets)

    return (
        jax.jit(train_epoch, donate_argnums=(0,)),
        jax.jit(val_epoch),
    )


def prepare_unet_batch(
    batch: Dict[str, np.ndarray], num_classes: int,
    device_coords: bool = False,
    ship_dtype: str = "float32",
):
    """Raw store fields -> model inputs (host side, cheap).

    x = density channel + coordinate channels (unet/data.py:90-100);
    labels = integer species (the one-hot and the binary occupancy targets
    derive on device inside the jitted step).

    device_coords=True ships density + lattice lengths only; the coordinate
    channels rebuild on device (non-rotated datasets only — see
    train/vae.py prepare_vae_batch).  ship_dtype="float16" halves the
    density bytes (cast back to float32 on device); coordinate channels
    always ship float32 (lattice-regression targets downstream).
    """
    s = np.minimum(batch["species"].astype(np.int32), num_classes - 1)
    # integer species labels fit uint8 (95 classes) — 4x fewer label bytes
    # on the wire; one_hot/compare on device accept any integer dtype
    s = s.astype(np.uint8) if num_classes <= 256 else s
    dt = np.dtype(ship_dtype)
    if device_coords:
        return {
            "density": batch["density"].astype(dt),
            "abc": batch["lattice"][:, :3].astype(np.float32),
            "labels": s,
        }
    return {
        "density": batch["density"].astype(dt),
        "coords": batch["coords"].astype(np.float32),
        "labels": s,
    }


from icsg3d_tpu.train.common import mean_metrics as _mean_metrics


def _fold_per_class_ce(mets: dict) -> dict:
    """Replace the (ce_class_sum, class_count) accumulator vectors with the
    per-class mean CE — mean-of-sums / mean-of-counts over the epoch's
    batches == ratio of epoch totals, so classes absent from some batches
    are weighted correctly."""
    if "ce_class_sum" not in mets:
        return mets
    s = np.asarray(mets.pop("ce_class_sum"))
    c = np.asarray(mets.pop("class_count"))
    mets["ce_per_class"] = (s / np.maximum(c, 1.0)).tolist()
    return mets


@functools.lru_cache(maxsize=4)
def _plot_forward(model):
    """Jitted plot forward, built ONCE per model — a fresh jit per
    improvement epoch loads a new device executable each time and leaks
    HBM through the remote plugin (see train/vae.py _plot_forwards)."""
    return jax.jit(lambda v, xx: model.apply(v, xx, train=False))


def _save_best_plots(model, state, batch, plot_dir: str):
    """Best-val segmentation panels (the TrainingPlot callback,
    unet/unet.py:39-157): true vs predicted labels and binary masks."""
    import os

    from icsg3d_tpu import viz

    from icsg3d_tpu.train.vae import _assemble_x

    os.makedirs(plot_dir, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = dict(batch)
    batch["x"] = _assemble_x(batch, None)
    # forward only the 4 plotted samples, JITTED: an un-jitted apply
    # dispatches per-op over the tunnel with eager-op remote compiles —
    # see train/vae.py _save_best_plots for the measured cost
    n = min(4, len(batch["x"]))
    soft, sig = _plot_forward(model)(variables, batch["x"][:n])
    pred = np.asarray(jnp.argmax(soft, axis=-1), dtype=np.float32)[..., None]
    true = np.asarray(batch["labels"][:n], np.float32)[..., None]
    viz.plot_real_vs_pred(true[:n], pred[:n], f"{plot_dir}/segmentations_best.png")
    viz.plot_real_vs_pred(
        (true[:n] != 0).astype(np.float32),
        np.asarray(jax.nn.sigmoid(sig[:n])),
        f"{plot_dir}/segmentations_binary_best.png",
    )


def train_unet(
    model: UNet3D,
    state: ModelState,
    train_batches: Optional[Callable[[], Iterable]],
    val_batches: Optional[Callable[[], Iterable]],
    epochs: int,
    class_weights=None,
    checkpoint_dir: Optional[str] = None,
    mesh=None,
    log_fn=print,
    plot_dir: Optional[str] = None,
    latest_every: int = 1,
    resident_data=None,
    batch_size: Optional[int] = None,
    shuffle_seed: int = 0,
    epoch_scan: bool = False,
    plot_min_interval: int = 1,
):
    """Epoch loop with best-val checkpointing (and best-val segmentation
    plots when plot_dir is given).

    train_batches/val_batches: callables returning fresh epoch iterators of
    prepared batches (see prepare_unet_batch).  latest_every thins the
    per-epoch `latest` checkpoint (the full-state device fetch is expensive
    over a remote device link); a final save always runs after the last
    epoch so --resume continues from the true end.

    resident_data=(train_dict, val_dict) switches to the HBM-RESIDENT
    path: both splits upload to device once (replicated over the mesh)
    and batches gather on device inside the jitted step from a per-epoch
    host permutation — the only per-step host->device traffic is the
    index vector (see train/vae.py train_vae for the measured rationale).
    Requires `batch_size`; train_batches/val_batches are ignored.

    epoch_scan=True (resident only) runs each epoch as ONE jitted
    lax.scan program (make_unet_epoch_fns) — one permutation upload and
    one metrics fetch per epoch; batch order matches the per-step
    resident path exactly.
    """
    mesh = mesh or make_mesh()
    resident = resident_data is not None
    if epoch_scan and not resident:
        raise ValueError("epoch_scan requires resident_data")
    if epoch_scan:
        # built in the resident block below once the flat field shapes
        # are known (see make_unet_epoch_fns field_shapes)
        train_epoch_fn = val_epoch_fn = None
        train_step = eval_step = None
    else:
        train_step, eval_step = make_unet_steps(
            model, class_weights, resident=resident
        )
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    history = []
    last_val_batch = None
    _last_plot_epoch = [-plot_min_interval]  # epoch 0 may plot
    if resident:
        if not batch_size:
            raise ValueError("resident_data requires batch_size")
        from jax.sharding import NamedSharding, PartitionSpec

        t_host, v_host = resident_data
        repl = NamedSharding(mesh, PartitionSpec())
        # epoch-scan resident fields upload FLAT (host-side numpy views;
        # see train/vae.py — an eager device-side reshape transiently
        # doubles multi-GB fields)
        field_shapes = {}

        def _flatten_host(dd):
            out = {}
            for k, v in dd.items():
                if v.ndim >= 3:
                    field_shapes[k] = v.shape[1:]
                    out[k] = v.reshape(v.shape[0], -1)
                else:
                    out[k] = v
            return out

        t_up = _flatten_host(t_host) if epoch_scan else t_host
        v_up = (_flatten_host(v_host) if epoch_scan else v_host) \
            if v_host else None
        t_dev = jax.device_put(t_up, repl)
        v_dev = jax.device_put(v_up, repl) if v_up else None
        n_train = len(next(iter(t_host.values())))
        n_val = len(next(iter(v_host.values()))) if v_host else 0
        idx_sharding = batch_sharding(mesh)
        nb_val = n_val // batch_size
        nb_train = n_train // batch_size
        if nb_val:  # the plotted batch: the last full val batch, host-side
            rows = np.arange((nb_val - 1) * batch_size, nb_val * batch_size)
            last_val_batch = {k: np.asarray(v[rows]) for k, v in v_host.items()}
        if epoch_scan:
            if nb_train == 0:
                raise ValueError(
                    "no train batches: the train split is smaller than the "
                    "batch size (remainders are dropped)"
                )
            train_epoch_fn, val_epoch_fn = make_unet_epoch_fns(
                model, class_weights, field_shapes=field_shapes
            )
            perm_sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
            val_idx = (
                jax.device_put(
                    np.arange(nb_val * batch_size, dtype=np.int32).reshape(
                        nb_val, batch_size
                    ),
                    perm_sharding,
                )
                if nb_val
                else None
            )
    for epoch in range(epochs):
        t0 = time.time()
        sharding = batch_sharding(mesh)
        train_mets = []
        val_mets = []
        if resident and epoch_scan:
            perm = np.random.default_rng(
                (shuffle_seed, epoch)
            ).permutation(n_train).astype(np.int32)
            perm2d = jax.device_put(
                perm[: nb_train * batch_size].reshape(
                    nb_train, batch_size
                ),
                perm_sharding,
            )
            state, m = train_epoch_fn(state, t_dev, perm2d)
            train_mets.append(m)
            if nb_val:
                val_mets.append(val_epoch_fn(state, v_dev, val_idx))
        elif resident:
            perm = np.random.default_rng(
                (shuffle_seed, epoch)
            ).permutation(n_train).astype(np.int32)
            for i in range(n_train // batch_size):
                idx = jax.device_put(
                    perm[i * batch_size:(i + 1) * batch_size], idx_sharding
                )
                state, m = train_step(state, t_dev, idx)
                train_mets.append(m)
            for i in range(nb_val):
                idx = jax.device_put(
                    np.arange(i * batch_size, (i + 1) * batch_size,
                              dtype=np.int32),
                    idx_sharding,
                )
                val_mets.append(eval_step(state, v_dev, idx))
        else:
            for b in prefetch_to_device(train_batches(), devices=sharding):
                state, m = train_step(state, b)
                train_mets.append(m)
            for b in prefetch_to_device(val_batches(), devices=sharding):
                val_mets.append(eval_step(state, b))
                last_val_batch = b
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
        tm = _fold_per_class_ce(tm)
        vm = _fold_per_class_ce(vm)
        history.append({"train": tm, "val": vm, "time": time.time() - t0})
        log_fn(
            f"epoch {epoch}: time {history[-1]['time']:.2f}s "
            f"train loss {tm['loss']:.4f} ce {tm['ce']:.4f} "
            f"f1 {tm['f1']:.3f} | "
            f"val loss {vm['loss']:.4f} ce {vm['ce']:.4f} f1 {vm['f1']:.3f}"
        )
        if ckpt:
            t_save = time.time()
            improved = ckpt.save_epoch(
                state, vm["loss"], epoch, latest_every=latest_every
            )
            # plot_min_interval thins best-val plot refreshes: early
            # training improves val nearly every epoch, and each refresh
            # fetches device arrays through the leaky remote plugin and
            # renders matplotlib on the host (measured ~56 s/epoch on a
            # 1-vCPU box at 64^3) — see train/vae.py for the same fix
            if (improved and plot_dir and last_val_batch is not None
                    and epoch - _last_plot_epoch[0] >= plot_min_interval):
                _save_best_plots(model, state, last_val_batch, plot_dir)
                _last_plot_epoch[0] = epoch
            t_save = time.time() - t_save
            if t_save > 5:  # the remote-fetch/plot tax hides outside the
                # printed epoch time — see train/vae.py
                log_fn(f"  [post-epoch] ckpt+plots {t_save:.1f}s")
    if (ckpt and epochs > 0 and latest_every > 1
            and ckpt.last_latest_epoch != epochs - 1):
        ckpt.save_latest(state)  # final save so --resume continues from the end
    return state, history
