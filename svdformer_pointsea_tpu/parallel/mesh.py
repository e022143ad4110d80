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

Multi-chip TPU caveat (untestable on this 1-chip box): the Pallas fast
paths (VMEM FPS, fused NN-distance, flash attention) are gated on
``jax.default_backend() == "tpu"`` and are NOT GSPMD-partitionable — on a
real multi-chip TPU mesh XLA must all-gather their operands and run them
replicated. All multi-device validation here runs on the CPU backend,
where the XLA fallbacks (which GSPMD shards fine) are active. Before
deploying DP on a real pod, either wrap the train step in ``shard_map``
(each chip runs the Pallas kernels on its local batch shard — the natural
fix) or disable the Pallas paths; see also parallel/sp.py, which already
hands over to the XLA paths when token sharding is active.
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


def make_mesh_2d(
    n_sp: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D (data, sp) mesh: batch sharded over ``data``, SDG tokens over
    ``sp`` (parallel/sp.py). ``n_sp`` must divide the device count; the sp
    axis is innermost so its collectives ride neighbouring ICI links."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_sp != 0:
        raise ValueError(f"n_sp={n_sp} does not divide {n} devices")
    from svdformer_pointsea_tpu.parallel.sp import SP_AXIS

    return Mesh(
        np.asarray(devices).reshape(n // n_sp, n_sp), (DATA_AXIS, SP_AXIS)
    )


def make_mesh_for_batch(batch_size: int) -> Mesh:
    """Mesh over ALL devices. When ``batch_size`` does not divide the device
    count the caller pads the batch with :func:`pad_batch` (pad rows carry
    zero loss weight) — every chip stays busy, unlike the previous policy of
    silently shrinking the mesh, and unlike the reference's uneven
    DataParallel scatter (core/train_pcn.py:54)."""
    devices = jax.devices()
    n = len(devices)
    if batch_size % n != 0:
        import logging

        logging.info(
            "batch %d not divisible by %d devices: padding to %d "
            "(pad rows masked out of the loss)",
            batch_size, n, -(-batch_size // n) * n,
        )
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def pad_batch(batch: Any, mesh: Mesh) -> tuple[Any, np.ndarray]:
    """Pad every leaf's leading (batch) axis up to a multiple of the mesh
    size by repeating rows cyclically, and return ``(padded, weights)``
    where ``weights`` is 1.0 for real rows and 0.0 for pads — feed it to the
    loss so pad rows contribute nothing to the loss VALUE (the fixed-shape
    alternative to DataParallel's uneven scatter). On a 2-D (data, sp) mesh
    the batch only shards over the data axis, so pad to that size.

    BatchNorm note: the trainers also pass ``weights`` into a
    ``bn_row_weights`` scope (train/state.py, train/gan.py), so train-mode
    BatchNorm computes WEIGHTED batch moments — pad rows are excluded from
    the BN statistics exactly, and a padded step updates running stats like
    the unpadded batch would (tests/test_train_sharding.py::
    test_padded_bn_moments_exact). The reference has a BN inconsistency
    here instead — DataParallel keeps per-replica stats over uneven shards.
    Documented in docs/PARITY.md."""
    n = dict(mesh.shape).get(DATA_AXIS, mesh.devices.size)
    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    target = -(-b // n) * n
    weights = np.zeros((target,), np.float32)
    weights[:b] = 1.0
    if target == b:
        return batch, weights
    idx = np.arange(target) % b
    padded = jax.tree_util.tree_map(lambda x: x[idx], batch)
    return padded, weights


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
