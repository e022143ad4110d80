"""Device mesh + sharding utilities."""

from svdformer_pointsea_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    make_mesh_for_batch,
    pad_batch,
    shard_host_local_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.parallel.sp import (
    SP_AXIS,
    disable_sp,
    enable_sp,
    shard_tokens,
    sp_active,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_for_batch",
    "pad_batch",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_host_local_batch",
    "SP_AXIS",
    "enable_sp",
    "disable_sp",
    "sp_active",
    "shard_tokens",
]
