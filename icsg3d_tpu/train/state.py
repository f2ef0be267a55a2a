"""Train state: parameters, batch statistics, optimizer state.

One struct serves all three model families; models without batch_stats
(CGCNN) carry an empty dict.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class ModelState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, variables, tx):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    @classmethod
    def create_abstract(cls, apply_fn, init_fn, tx):
        """Host-only state skeleton: every leaf is a numpy zeros array.

        ``init_fn`` is the (un-executed) model init closure; its output
        shapes come from jax.eval_shape, so NO device compile, execution, or
        transfer happens.  Use when the state is about to be overwritten by
        a checkpoint restore — on a remote-tunneled device the real init
        costs a compile + a full-state device round trip for arrays that are
        immediately thrown away.
        """
        import numpy as np

        var_shapes = jax.eval_shape(init_fn)
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), tree
        )
        params = zeros(var_shapes["params"])
        batch_stats = zeros(var_shapes.get("batch_stats", FrozenDict()))
        opt_shapes = jax.eval_shape(tx.init, var_shapes["params"])
        return cls(
            step=np.zeros((), np.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=zeros(opt_shapes),
            tx=tx,
            apply_fn=apply_fn,
        )

    @property
    def variables(self):
        if self.batch_stats:
            return {"params": self.params, "batch_stats": self.batch_stats}
        return {"params": self.params}

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )
