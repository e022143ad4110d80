"""Device mesh + sharding utilities."""

from svdformer_pointsea_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    pad_batch,
    shard_host_local_batch,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "make_mesh_for_batch", "pad_batch", "batch_sharding", "replicated_sharding", "shard_batch", "shard_host_local_batch"]
