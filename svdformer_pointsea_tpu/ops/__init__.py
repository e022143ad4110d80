"""Point-cloud compute kernels for TPU.

Every op here has a pure ``jax.numpy`` oracle implementation (used on CPU and
in property tests) and, where the op is on a training hot path, a TPU-tuned
path (tiled XLA computation or a Pallas kernel). Semantics match the
reference CUDA ops, including their quirks (see each docstring).
"""

from svdformer_pointsea_tpu.ops.distances import (
    square_distance,
    query_knn,
    set_knn_mode,
    nearest_distances,
    nn_squared_distance,
    chamfer_distance,
    chamfer_distance_ref,
    three_nn,
    three_interpolate,
)
from svdformer_pointsea_tpu.ops.fps import (
    furthest_point_sample,
    furthest_point_sample_ref,
    gather_points,
    fps_subsample,
)
from svdformer_pointsea_tpu.ops.grouping import (
    grouping_operation,
    ball_query,
    index_points,
    sample_and_group_knn,
    sample_and_group_all,
    sample_and_group_ball,
    group_local,
)
from svdformer_pointsea_tpu.ops.metrics import fscore, density_aware_chamfer
from svdformer_pointsea_tpu.ops.emd import (
    earth_mover_distance,
    emd_convergence,
    emd_unassigned,
)

__all__ = [
    "square_distance",
    "query_knn",
    "set_knn_mode",
    "nearest_distances",
    "nn_squared_distance",
    "chamfer_distance",
    "chamfer_distance_ref",
    "three_nn",
    "three_interpolate",
    "furthest_point_sample",
    "furthest_point_sample_ref",
    "gather_points",
    "fps_subsample",
    "grouping_operation",
    "ball_query",
    "index_points",
    "sample_and_group_knn",
    "sample_and_group_all",
    "sample_and_group_ball",
    "group_local",
    "fscore",
    "density_aware_chamfer",
    "earth_mover_distance",
    "emd_convergence",
    "emd_unassigned",
]
