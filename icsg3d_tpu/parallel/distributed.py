"""Multi-host initialization and work sharding.

The reference's only distribution was mpi4py rank striding with the
filesystem as sink (create_matrices.py:36-38,103,107).  The TPU-native
equivalents:

- ``initialize()``: jax.distributed.initialize for multi-host TPU pods
  (JAX auto-discovers coordinator/process ids on TPU VMs); safe no-op when
  already initialized or single-host.
- ``process_shard``: stride a host-side work list across processes — the
  direct functional replacement for the MPI rank stride; writers stay
  disjoint by construction, no collectives.
- barriers are implicit in collectives; for a host-side sync point use
  ``sync_hosts()`` (a tiny all-reduce).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

import jax
import numpy as np

T = TypeVar("T")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host; no-op otherwise."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process with no coordinator info
        pass


def process_shard(items: Sequence[T]) -> List[T]:
    """This process's stride of a work list (i % process_count == index)."""
    pidx, pcount = jax.process_index(), jax.process_count()
    return [x for i, x in enumerate(items) if i % pcount == pidx]


def sync_hosts() -> None:
    """Block until every host reaches this point (MPI Barrier equivalent,
    create_matrices.py:103)."""
    if jax.process_count() == 1:
        return
    # a tiny global psum forces a cross-host rendezvous
    x = jax.numpy.ones(())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            x[None].repeat(jax.local_device_count(), 0)
        )
    )
