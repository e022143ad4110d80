"""Neighbourhood grouping ops: gather-by-index, ball query, sample-and-group.

Reference semantics:
- ``grouping_operation``: pointnet2 _ext-src/src/group_points_gpu.cu — gather
  (B, N, C) features at (B, S, K) indices -> (B, S, K, C); grad is a
  scatter-add (deterministic under XLA).
- ``ball_query``: _ext-src/src/ball_query_gpu.cu:9-54 — for each centre, scan
  the point set *in index order* and keep the first <= nsample points with
  squared distance < radius^2. The first hit pre-fills every slot, so queries
  with fewer than nsample in-radius points are padded with the first hit
  (quirk preserved). Centres with no in-radius point return index 0.
- ``sample_and_group_knn`` / ``sample_and_group_all``:
  models/model_utils.py:323-356,132-159.
- ``group_local``: models/model_utils.py:812-826 (self-kNN grouping for
  EdgeConv, include_self).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from svdformer_pointsea_tpu.ops.distances import query_knn, square_distance
from svdformer_pointsea_tpu.ops.fps import furthest_point_sample, gather_points

Array = jax.Array


def index_points(points: Array, idx: Array) -> Array:
    """Gather along the point axis with arbitrary trailing index dims.

    Args:
        points: (B, N, C)
        idx: (B, ...) int indices into N.
    Returns:
        (B, ..., C)
    """
    # Flattened single-axis gather: XLA lowers the batched (bidx, idx) form
    # into a slow per-row gather (6.8 ms at (32, 2048x16) on v5e); collapsing
    # the batch into the row index runs the identical access pattern 2.5x
    # faster (2.7 ms). The backward (scatter-add) flattens the same way.
    B, N, C = points.shape
    bshape = (B,) + (1,) * (idx.ndim - 1)
    offs = (jnp.arange(B, dtype=jnp.int32) * N).reshape(bshape)
    flat = (idx.astype(jnp.int32) + offs).reshape(-1)
    return points.reshape(B * N, C)[flat].reshape(idx.shape + (C,))


def grouping_operation(points: Array, idx: Array) -> Array:
    """(B, N, C) features + (B, S, K) indices -> (B, S, K, C)."""
    return index_points(points, idx)


def ball_query(radius: float, nsample: int, xyz: Array, new_xyz: Array) -> Array:
    """Fixed-radius neighbourhood query with pad-with-first semantics.

    Args:
        radius: ball radius.
        nsample: max neighbours per centre.
        xyz: (B, N, 3) point set (scanned in index order).
        new_xyz: (B, S, 3) query centres.
    Returns:
        (B, S, nsample) int32 indices.
    """
    N = xyz.shape[1]
    d2 = square_distance(new_xyz, xyz)  # (B, S, N)
    mask = d2 < radius * radius
    # Rank of each in-radius point among the hits for its centre, in index
    # order. Taking the nsample smallest "key = index if hit else N+index"
    # reproduces the CUDA first-come scan.
    ids = jnp.arange(N, dtype=jnp.int32)
    keys = jnp.where(mask, ids, N + ids)  # (B, S, N)
    # top_k of negated keys = ascending keys.
    neg_smallest, _ = lax.top_k(-keys, nsample)
    slots = -neg_smallest  # (B, S, nsample), ascending
    hit_counts = jnp.sum(mask, axis=-1)  # (B, S)
    first = slots[..., :1] % N  # first hit (or first point if no hits)
    slot_idx = jnp.where(
        jnp.arange(nsample) < hit_counts[..., None], slots % N, first
    )
    # No in-radius point at all: CUDA leaves the zero-initialised buffer.
    slot_idx = jnp.where(hit_counts[..., None] == 0, 0, slot_idx)
    return slot_idx.astype(jnp.int32)


def sample_and_group_knn(
    xyz: Array,
    points: Array | None,
    npoint: int,
    k: int,
    use_xyz: bool = True,
    idx: Array | None = None,
):
    """FPS-sample ``npoint`` centres, kNN-group ``k`` neighbours around each.

    Args:
        xyz: (B, N, 3) coordinates.
        points: (B, N, C) features or None.
    Returns:
        new_xyz: (B, npoint, 3)
        new_points: (B, npoint, k, 3 | C | C+3) — relative coords first when
            ``use_xyz`` (channel order matches models/model_utils.py:349-350).
        idx: (B, npoint, k) int32
        grouped_xyz: (B, npoint, k, 3) centre-relative coordinates.
    """
    fps_idx = furthest_point_sample(xyz, npoint)
    new_xyz = gather_points(xyz, fps_idx)  # (B, npoint, 3)
    if idx is None:
        idx = query_knn(k, xyz, new_xyz)
    grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = grouping_operation(points, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_ball(
    xyz: Array,
    points: Array | None,
    npoint: int,
    nsample: int,
    radius: float,
    use_xyz: bool = True,
):
    """FPS-sample centres, ball-query-group (models/model_utils.py:97-130)."""
    fps_idx = furthest_point_sample(xyz, npoint)
    new_xyz = gather_points(xyz, fps_idx)
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = grouping_operation(points, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: Array, points: Array | None, use_xyz: bool = True):
    """Single global group (models/model_utils.py:132-159).

    Returns:
        new_xyz: (B, 1, 3) zeros
        new_points: (B, 1, N, 3 | C | C+3)
        idx: (B, 1, N) int32 arange
        grouped_xyz: (B, 1, N, 3)
    """
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, 1, N))
    if points is not None:
        if use_xyz:
            new_points = jnp.concatenate([xyz, points], axis=-1)
        else:
            new_points = points
        new_points = new_points[:, None, :, :]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def group_local(xyz: Array, k: int = 20, return_idx: bool = False):
    """Self-kNN grouping of coordinates (EdgeConv neighbourhoods).

    Args:
        xyz: (B, N, 3)
    Returns:
        grouped: (B, N, k, 3) neighbour coordinates (absolute, like the
        reference's group_local — the caller forms edge features).
    """
    idx = query_knn(k, xyz, xyz, include_self=True)
    grouped = grouping_operation(xyz, idx)
    if return_idx:
        return grouped, idx
    return grouped
