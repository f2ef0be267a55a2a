"""Orbax checkpointing with a best-validation policy.

Reference behavior being replaced: Keras ModelCheckpoint(save_best_only,
monitor=val_loss) (unet/unet.py:361-367, train_cgcnn.py:90-96) and the
VAE's manual best-val save_weights (vae/lattice_vae.py:329-339).

Crash safety matters here more than usual: long trainings on this
environment run as chunked --resume processes that can be OOM-killed at
any point (CLAUDE.md), so saves swap directories atomically instead of
deleting the previous checkpoint before the replacement is durable.
"""

from __future__ import annotations

import json
import math
import os
import shutil
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
            try:
                with open(meta) as f:
                    data = json.load(f)
                self.best_metric = data["metric"]
                saved_mode = data.get("mode", "min")
                if saved_mode != mode:
                    raise ValueError(
                        f"checkpoint dir {directory} was written with "
                        f"mode={saved_mode!r}, reopened with {mode!r} — "
                        "the persisted best metric would be compared in "
                        "the wrong direction"
                    )
            except (json.JSONDecodeError, KeyError):
                # a kill mid-write leaves a truncated file; treat as no
                # prior best rather than refusing to start the chunk
                self.best_metric = None

    def _is_better(self, metric: float) -> bool:
        if not math.isfinite(metric):
            # NaN must never become "best": accepted once, no finite
            # metric ever compares better and best-saving wedges for the
            # rest of training (and across every --resume chunk)
            return False
        if self.best_metric is None or not math.isfinite(self.best_metric):
            return True
        return metric < self.best_metric if self.mode == "min" else metric > self.best_metric

    def _tree(self, state) -> Any:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def _infer_tree(self, state) -> Any:
        """The inference slice of the state: what `best` checkpoints hold.

        `best` exists to be loaded by eval/generate/interpolate — nobody
        resumes an optimizer from it (`--resume` reads `latest`).  The
        Adam moments are 2/3 of the state's bytes, and on a remote-device
        link the per-improvement jax.device_get is a measured wall-clock
        sink (early training improves val almost every epoch), so `best`
        skips them.  Reference analog: Keras ModelCheckpoint
        save_weights_only best-val saves (unet/unet.py:361-367) hold no
        optimizer state either.
        """
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
        }

    def _save_swap(self, name: str, tree) -> None:
        """Durable overwrite: finalize the new checkpoint next to the old
        one, then swap via renames.  Orbax's force=True instead DELETES
        the destination before writing — a kill mid-save would destroy
        the only copy of `latest` and silently discard the whole run on
        the next --resume chunk."""
        path = os.path.join(self.directory, name)
        new, old = path + ".new", path + ".old"
        shutil.rmtree(new, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        self._ckpt.save(new, tree, force=True)  # fully finalized here
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(new, path)
        shutil.rmtree(old, ignore_errors=True)

    def _heal(self, name: str) -> None:
        """Recover from a kill inside _save_swap's rename window: a
        finalized `.new` (or displaced `.old`) stands in for a missing
        checkpoint."""
        path = os.path.join(self.directory, name)
        if os.path.exists(path):
            return
        for cand in (path + ".new", path + ".old"):
            if os.path.exists(cand):
                os.rename(cand, path)
                return

    def _write_progress(self, step: int) -> None:
        """Sidecar recording what `latest` holds — campaign scripts derive
        remaining epochs as step // steps_per_epoch from it instead of
        history.json (which is only written on clean exit and undercounts
        after a crash; ADVICE r4).  step is cumulative across resume
        chunks, unlike the per-run epoch index."""
        meta = os.path.join(self.directory, "progress.json")
        tmp = meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"step": int(step)}, f)
        os.replace(tmp, meta)

    def save_latest(self, state):
        self._save_swap("latest", jax.device_get(self._tree(state)))
        self._write_progress(int(jax.device_get(state.step)))

    def save_epoch(
        self, state, metric: float, epoch: int, latest_every: int = 1
    ) -> bool:
        """Per-epoch best/latest saves with at most ONE device fetch.

        jax.device_get of the train state is the expensive part over a
        remote device link, so fetches are minimized: when the `latest`
        cadence is due the full state (params + Adam moments) fetches
        once and serves both files; when only the metric improved, just
        the inference slice fetches (see _infer_tree) and only `best` is
        written — `latest` waits for its cadence or for the train
        drivers' guarded save_latest() after the final epoch (see
        train/unet.py's loop tail), so a mid-chunk kill replays at most
        one cadence interval.  Returns whether `best` improved.
        """
        improved = self._is_better(float(metric))
        due = latest_every <= 1 or (epoch + 1) % latest_every == 0
        if not improved and not due:
            return False
        if due:  # one full fetch covers latest (and best, if improved)
            self.last_latest_epoch = epoch
            tree = jax.device_get(self._tree(state))
            infer = {k: tree[k] for k in ("step", "params", "batch_stats")}
        else:  # improved only: fetch the inference slice, skip the moments
            tree = None
            infer = jax.device_get(self._infer_tree(state))
        if improved:
            self.best_metric = float(metric)
            self._save_swap("best", infer)
            meta = os.path.join(self.directory, "best_metric.json")
            tmp = meta + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"metric": self.best_metric, "mode": self.mode}, f)
            os.replace(tmp, meta)  # atomic: no truncated json on kill
        if tree is not None:
            self._save_swap("latest", tree)
            self._write_progress(int(tree["step"]))
        return improved

    def restore(self, state, which: str = "best"):
        """Restore a saved tree into an existing state (shape template).

        The template only provides shapes/dtypes, so it is built as host
        zeros from leaf metadata — never device_get (which would round-trip
        the full dummy state through a possibly-remote device for nothing).
        """
        import numpy as np

        self._heal(which)
        path = os.path.join(self.directory, which)
        full = self._tree(state)
        if which == "best":
            # best holds the inference slice only (see _infer_tree); the
            # except arm reads pre-split full-state best dirs
            template = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype), self._infer_tree(state)
            )
            try:
                tree = self._ckpt.restore(path, item=template)
                return state.replace(
                    step=jax.numpy.asarray(tree["step"]),
                    params=tree["params"],
                    batch_stats=tree["batch_stats"],
                )
            except Exception:
                pass  # legacy full-state best: fall through
        template = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, x.dtype), full
        )
        tree = self._ckpt.restore(path, item=template)
        return state.replace(
            step=jax.numpy.asarray(tree["step"]),
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
        )

    def has(self, which: str = "best") -> bool:
        self._heal(which)
        return os.path.exists(os.path.join(self.directory, which))
