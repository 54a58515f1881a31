"""Multi-host (multi-slice / DCN) support.

The reference has no communication backend at all (SURVEY.md §2.8). The
single-slice story lives in mesh.py (GSPMD over ICI). Across slices/hosts
the same programs run unchanged once `jax.distributed` is initialized and
the mesh is built over all global devices: data-parallel gradients then
all-reduce hierarchically (ICI within a slice, DCN across) — laid out by
GSPMD from the same 1-D batch mesh.

This module is the thin bring-up layer; it cannot be exercised in the
single-host build environment (documented in docs/STATUS.md), but keeps the
API whole:

    from bcnn_tpu.parallel import multihost
    multihost.initialize()                  # env-driven (TPU pods auto-detect)
    mesh = multihost.global_mesh()          # all hosts' devices
    step = make_dp_train_step(net, mesh)    # as on one host

Per-host data loading: `multihost.shard_loader(loader)` stripes the
sequential stream across processes (DataLoader.set_shard) so each host
reads only its slice of every global batch; feed the result to
`multihost.host_local_batch` to assemble the global batch-sharded arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import BATCH_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize, env-driven when args are None (TPU pods
    auto-detect via the metadata server)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = BATCH_AXIS) -> "jax.sharding.Mesh":
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(mesh, x: np.ndarray, y: np.ndarray):
    """Assemble a global batch-sharded array from each host's local slice
    of the batch (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(BATCH_AXIS))
    gx = jax.make_array_from_process_local_data(sh, x)
    gy = jax.make_array_from_process_local_data(sh, y)
    return {"input": gx, "label": gy}


def process_batch_slice(total_batch: int):
    """(start, size) of this host's share of the global batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = total_batch // n
    return i * per, per


def shard_loader(loader):
    """Stripe a streaming DataLoader across the processes of the cluster:
    each process reads its slice of every global batch and seeks past the
    others' (DataLoader.set_shard), so the cluster as a whole consumes the
    stream in exactly the single-process order. net.batch_size must be
    the per-host batch. Returns the loader for chaining."""
    loader.set_shard(jax.process_index(), jax.process_count())
    return loader
