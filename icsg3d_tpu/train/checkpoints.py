"""Orbax checkpointing with a best-validation policy.

Reference behavior being replaced: Keras ModelCheckpoint(save_best_only,
monitor=val_loss) (unet/unet.py:361-367, train_cgcnn.py:90-96) and the
VAE's manual best-val save_weights (vae/lattice_vae.py:329-339).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Saves `best` and `latest` train states under a directory."""

    def __init__(self, directory: str, mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mode = mode
        self.best_metric: Optional[float] = None
        self.last_latest_epoch: Optional[int] = None  # set by save_epoch
        self._ckpt = ocp.PyTreeCheckpointer()
        meta = os.path.join(self.directory, "best_metric.json")
        if os.path.exists(meta):
            with open(meta) as f:
                self.best_metric = json.load(f)["metric"]

    def _is_better(self, metric: float) -> bool:
        if self.best_metric is None:
            return True
        return metric < self.best_metric if self.mode == "min" else metric > self.best_metric

    def _tree(self, state) -> Any:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def save_latest(self, state):
        path = os.path.join(self.directory, "latest")
        self._ckpt.save(path, jax.device_get(self._tree(state)), force=True)

    def save_epoch(
        self, state, metric: float, epoch: int, latest_every: int = 1
    ) -> bool:
        """Per-epoch best + latest saves with ONE device fetch.

        jax.device_get of the full train state (params + Adam moments) is
        the expensive part over a remote device link, so it runs at most
        once per epoch — and only when there is something to write: the
        metric improved, or the `latest` cadence is due.  Callers should
        still save_latest() once after the final epoch so resume continues
        from the true end.  Returns whether `best` improved.
        """
        improved = self._is_better(float(metric))
        due = latest_every <= 1 or (epoch + 1) % latest_every == 0
        if not improved and not due:
            return False
        self.last_latest_epoch = epoch
        tree = jax.device_get(self._tree(state))
        if improved:
            self.best_metric = float(metric)
            self._ckpt.save(
                os.path.join(self.directory, "best"), tree, force=True
            )
            with open(
                os.path.join(self.directory, "best_metric.json"), "w"
            ) as f:
                json.dump({"metric": self.best_metric}, f)
        self._ckpt.save(
            os.path.join(self.directory, "latest"), tree, force=True
        )
        return improved

    def restore(self, state, which: str = "best"):
        """Restore a saved tree into an existing state (shape template).

        The template only provides shapes/dtypes, so it is built as host
        zeros from leaf metadata — never device_get (which would round-trip
        the full dummy state through a possibly-remote device for nothing).
        """
        import numpy as np

        path = os.path.join(self.directory, which)
        template = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, x.dtype), self._tree(state)
        )
        tree = self._ckpt.restore(path, item=template)
        return state.replace(
            step=jax.numpy.asarray(tree["step"]),
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
        )

    def has(self, which: str = "best") -> bool:
        return os.path.exists(os.path.join(self.directory, which))
