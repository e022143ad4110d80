"""Single first-class mesh layer for data parallelism.

The reference's entire distribution story is single-process
``nn.DataParallel`` over 2 GPUs (SURVEY.md §2.3). The TPU-native equivalent:
one ``jax.sharding.Mesh`` axis ``data`` over all local/ICI-connected chips;
batches sharded over it, parameters replicated. Gradient all-reduce is
inserted by XLA from the shardings — no explicit collectives needed for DP.
The axis is DCN-ready for multi-host: ``jax.make_array_from_process_local_data``
composes with the same shardings.

Unlike DataParallel, batch norm statistics here are computed over the whole
global batch when the model is jitted over the mesh (XLA all-reduces the
batch moments) — strictly more consistent than the reference's per-replica
stats; documented determinism delta.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_for_batch(batch_size: int) -> Mesh:
    """Mesh over the largest device prefix whose size divides ``batch_size``
    (the fixed-shape analogue of DataParallel's uneven scatter — we instead
    keep shards even by shrinking the mesh)."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded.

    Leading dim of every leaf must divide by the mesh size.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_host_local_batch(batch: Any, mesh: Mesh) -> Any:
    """Multi-host variant of :func:`shard_batch`.

    Each process passes only its local shard of the global batch;
    ``jax.make_array_from_process_local_data`` assembles the global array
    over the (possibly DCN-spanning) data axis. On a single host this is
    identical to ``shard_batch``.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
