"""Opt-in token-sharded (sequence-parallel, "SP") mesh axis.

The reference's entire distribution story is batch-only ``nn.DataParallel``
(SURVEY.md §2.3) — with batch 1 it has nothing to parallelise. This module
goes beyond that: a second mesh axis ``sp`` that shards the SDG refinement
*token* axes (the 512/2048 query tokens and the 2048/16384 upsampled output
points, the dominant compute of the model — docs/STATUS.md breakdown) across
chips, plus the output-point axis of the loss chamfer. Implemented the
idiomatic XLA way: ``jax.lax.with_sharding_constraint`` hints at the SDG
boundaries and GSPMD chooses the collectives (all-gather of attention K/V
over ICI, partial min-reductions in the chamfer). Use case: small-batch /
single-request completion latency, where DP cannot help.

Scope and honesty:
- Correctness is validated on a multi-device CPU mesh
  (tests/test_train_sharding.py::test_sp_*); this box has ONE physical TPU
  chip, so multi-chip wall-clock gains are not measurable here.
- When SP is active the Pallas fast paths (flash attention, fused
  NN-distance, VMEM FPS) hand over to their XLA equivalents:
  ``pallas_call`` is not partitionable by GSPMD, so keeping them would
  force full replication collectives around every kernel. XLA's partitioner
  shards the dense attention/matmul/distance ops it can see.
- TRACE-TIME switch with the same caveat as ``nn.set_flash_attention``:
  set it before the first trace of any function that runs the model; jit
  caches key on function identity, not on this flag.

Default OFF: zero overhead, nothing in the default path changes.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SP_AXIS = "sp"

_SP_MESH: Optional[Mesh] = None


def enable_sp(mesh: Mesh) -> None:
    """Enable token sharding over ``mesh``'s ``sp`` axis (trace-time switch;
    see module docstring). The mesh must have an ``sp`` axis — build one
    with :func:`svdformer_pointsea_tpu.parallel.make_mesh_2d`."""
    if SP_AXIS not in mesh.shape:
        raise ValueError(f"mesh has no '{SP_AXIS}' axis: {dict(mesh.shape)}")
    global _SP_MESH
    _SP_MESH = mesh


def disable_sp() -> None:
    global _SP_MESH
    _SP_MESH = None


def sp_active() -> bool:
    return _SP_MESH is not None


def shard_tokens(x: jax.Array, token_axis: int = 1) -> jax.Array:
    """Constrain ``x`` to be sharded over the SP axis along ``token_axis``
    (no-op when SP is disabled). The leading batch axis stays sharded over
    the mesh's ``data`` axis when it has one — a constraint of ``None``
    there would force an all-gather of the batch."""
    if _SP_MESH is None:
        return x
    spec = [None] * x.ndim
    spec[token_axis] = SP_AXIS
    if "data" in _SP_MESH.shape and token_axis != 0:
        spec[0] = "data"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_SP_MESH, P(*spec))
    )
