"""Pairwise distances, kNN, chamfer, and 3-NN interpolation.

All point clouds are channels-last ``(B, N, 3)`` (or ``(B, N, C)`` for
features) — the natural layout for XLA, where the feature axis maps onto TPU
lanes and pairwise distances become MXU matmuls.

Reference semantics reproduced here:
- ``square_distance`` / ``query_knn``: models/model_utils.py:258-286 (argsort
  kNN in ascending distance order, optional self-exclusion via ``pad``).
- ``chamfer_distance``: metrics/CD/chamfer3D/chamfer3D.cu (squared distances
  + int32 argmin indices in both directions; backward scatters
  ``±2*g*(p-q)`` into both clouds).
- ``three_nn`` / ``three_interpolate``: pointnet2 _ext-src/src/interpolate.cpp
  (3 nearest neighbours with *sqrt* distances; inverse-distance interpolation).

The chamfer forward is tiled over query chunks so the full (N, M) distance
matrix is never materialised — required for the 16,384 x 16,384 loss-time
chamfer, and HBM-friendly everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# Cap on the materialised (B, chunk, M) distance-tile size (bytes, f32).
# Tiny chunks serialize the NN search into MXU-starved steps: at
# (B12, 16384x16384) a 128 MB budget meant 128 sequential 33 ms lax.map
# steps dominating the train step (68% of device time). 1.5 GB keeps the
# tile well under HBM while giving each step a dense 2048x16384 matmul.
_CHUNK_BYTES_BUDGET = 1536 * 1024 * 1024


def square_distance(src: Array, dst: Array) -> Array:
    """Pairwise squared euclidean distances.

    Args:
        src: (B, N, C)
        dst: (B, M, C)
    Returns:
        (B, N, M) squared distances.
    """
    # ||s||^2 + ||d||^2 - 2 s.d — one big MXU matmul plus rank-1 updates.
    # HIGHEST precision: metric distances are consumed at 1e-4 scale, far
    # below bf16-pass matmul error.
    inner = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)
    return s2[:, :, None] - 2.0 * inner + d2[:, None, :]


# kNN backend: "exact" (top_k full sort), "approx" (TPU approx_max_k,
# recall ~0.99), or "auto" (approx on TPU for large search sets). Trace-time
# setting; affects the model feature extractors only, never the metrics.
_KNN_MODE = "auto"
_APPROX_MIN_N = 1024


def set_knn_mode(mode: str) -> None:
    """Select the kNN backend: 'auto' | 'exact' | 'approx'."""
    global _KNN_MODE
    assert mode in ("auto", "exact", "approx"), mode
    _KNN_MODE = mode


def _use_approx_knn(n: int) -> bool:
    if _KNN_MODE == "exact":
        return False
    if _KNN_MODE == "approx":
        return True
    return jax.default_backend() == "tpu" and n >= _APPROX_MIN_N


def query_knn(nsample: int, xyz: Array, new_xyz: Array, include_self: bool = True) -> Array:
    """k nearest neighbours of ``new_xyz`` within ``xyz``.

    Matches models/model_utils.py:281-286: ascending-distance order, with the
    first (self) neighbour optionally skipped.

    Args:
        nsample: number of neighbours.
        xyz: (B, N, 3) search set.
        new_xyz: (B, S, 3) query set.
    Returns:
        (B, S, nsample) int32 indices into ``xyz``.
    """
    pad = 0 if include_self else 1
    d = square_distance(new_xyz, xyz)  # (B, S, N)
    if _use_approx_knn(xyz.shape[1]):
        # TPU fast path: lax.top_k lowers to a full variadic sort (53 ms at
        # (32, 2048, 2048) on v5e); approx_max_k is a partial reduction
        # (5.9 ms, measured recall 0.988 at the default 0.95 target —
        # tools/tpu_microbench.py). Exactness is only load-bearing for
        # op-level oracles, which run with exact mode / on CPU.
        _, idx = lax.approx_max_k(-d, nsample + pad)
        return idx[:, :, pad:].astype(jnp.int32)
    _, idx = lax.top_k(-d, nsample + pad)  # ascending distance
    return idx[:, :, pad:].astype(jnp.int32)


def nearest_distances(query: Array, target: Array) -> Array:
    """Per-query nearest euclidean distance (sqrt), (B, N) for (B,N,3)x(B,M,3)."""
    return jnp.sqrt(nn_squared_distance(query, target))


@jax.custom_vjp
def nn_squared_distance(query: Array, target: Array) -> Array:
    """Differentiable per-query min squared distance to ``target``.

    One direction of the chamfer op; gradients follow the CUDA kernel's
    formula (chamfer3D.cu:155-174): ±2·g·(q − t[argmin]) to query/target.
    Used inside the SDG structure-analysis path, where the reference lets
    gradients flow through the distance (models/SVDFormer.py:75).
    """
    d, _ = _nn_one_way(query, target)
    return d


def _flat_row_gather(points: Array, idx: Array) -> Array:
    """Gather rows of ``points`` (B, M, C) at ``idx`` (B, K) -> (B, K, C),
    as a flattened single-axis gather (see ops/grouping.py:index_points)."""
    B, M, C = points.shape
    flat = (idx.astype(jnp.int32) + (jnp.arange(B, dtype=jnp.int32) * M)[:, None]).reshape(-1)
    return points.reshape(B * M, C)[flat].reshape(B, idx.shape[1], C)


def _nnsq_fwd(query, target):
    d, idx = _nn_one_way(query, target)
    return d, (query, target, idx)


def _nnsq_bwd(res, g):
    query, target, idx = res
    nearest = _flat_row_gather(target, idx)
    diff = 2.0 * g[..., None] * (query - nearest)
    g_target = _batched_scatter_add(target.shape[1], idx, -diff)
    return diff, g_target


nn_squared_distance.defvjp(_nnsq_fwd, _nnsq_bwd)


def _largest_chunk(n: int, b: int, m: int) -> int:
    """Largest divisor of ``n`` keeping the (b, chunk, m) f32 tile in budget."""
    budget = max(1, _CHUNK_BYTES_BUDGET // max(1, 4 * b * m))
    chunk = 1
    for c in range(1, n + 1):
        if n % c == 0 and c <= budget:
            chunk = c
    return chunk


def _nn_one_way(a: Array, b: Array) -> tuple[Array, Array]:
    """min/argmin squared distance from each point of ``a`` to set ``b``.

    Tiled over chunks of ``a`` via lax.map so the (N, M) matrix never
    materialises in full. First-occurrence argmin matches the reference CUDA
    scan order (chamfer3D.cu keeps the first strict minimum).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    B, N, _ = a.shape
    M = b.shape[1]
    from svdformer_pointsea_tpu.parallel.sp import sp_active

    # sp_active: pallas_call is not GSPMD-partitionable — use the XLA tiled
    # path, which shards over the (token-sharded) query axis.
    if jax.default_backend() == "tpu" and N * M >= 256 * 256 and not sp_active():
        # Fused VMEM kernel — never materialises (N, M) tiles in HBM.
        # Only reached from custom_vjp-wrapped fronts (chamfer_distance,
        # nn_squared_distance), so no JVP rule is needed.
        from svdformer_pointsea_tpu.ops.nn_pallas import nn_one_way_pallas

        return nn_one_way_pallas(a, b)
    chunk = _largest_chunk(N, B, M)
    b_sq = jnp.sum(b**2, axis=-1)  # (B, M)

    def one_chunk(a_chunk: Array) -> tuple[Array, Array]:
        # a_chunk: (B, chunk, 3)
        inner = jnp.einsum(
            "bnc,bmc->bnm",
            a_chunk,
            b,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d = jnp.sum(a_chunk**2, axis=-1)[:, :, None] - 2.0 * inner + b_sq[:, None, :]
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    if chunk == N:
        dmin, idx = one_chunk(a)
    else:
        a_tiles = jnp.moveaxis(a.reshape(B, N // chunk, chunk, 3), 1, 0)
        dmin, idx = lax.map(one_chunk, a_tiles)
        dmin = jnp.moveaxis(dmin, 0, 1).reshape(B, N)
        idx = jnp.moveaxis(idx, 0, 1).reshape(B, N)
    # Squared distances can dip slightly negative from cancellation.
    return jnp.maximum(dmin, 0.0), idx


@jax.custom_vjp
def chamfer_distance(xyz1: Array, xyz2: Array) -> tuple[Array, Array, Array, Array]:
    """Bidirectional chamfer distance.

    Args:
        xyz1: (B, N, 3)
        xyz2: (B, M, 3)
    Returns:
        (d1, d2, idx1, idx2): squared nearest distances (B, N), (B, M) and
        int32 argmin indices, exactly the chamfer_3DDist contract
        (metrics/CD/chamfer3D/dist_chamfer_3D.py:67-74).
    """
    d1, idx1 = _nn_one_way(xyz1, xyz2)
    d2, idx2 = _nn_one_way(xyz2, xyz1)
    return d1, d2, idx1, idx2


def _chamfer_fwd(xyz1, xyz2):
    out = chamfer_distance(xyz1, xyz2)
    d1, d2, idx1, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _batched_scatter_add(n: int, idx: Array, updates: Array) -> Array:
    """Scatter-add ``updates`` (B, K, 3) into zeros (B, n, 3) at ``idx`` (B, K)."""
    B, K = idx.shape
    # Flattened single-axis scatter (same lowering win as the gathers,
    # ops/grouping.py:index_points).
    flat = (idx.astype(jnp.int32) + (jnp.arange(B, dtype=jnp.int32) * n)[:, None]).reshape(-1)
    out = jnp.zeros((B * n, 3), updates.dtype).at[flat].add(updates.reshape(B * K, 3))
    return out.reshape(B, n, 3)


def _chamfer_bwd(res, g):
    xyz1, xyz2, idx1, idx2 = res
    g1, g2, _, _ = g
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    n, m = xyz1.shape[1], xyz2.shape[1]
    # d1[i] = ||xyz1[i] - xyz2[idx1[i]]||^2
    diff1 = xyz1 - _flat_row_gather(xyz2, idx1)  # (B,N,3)
    diff2 = xyz2 - _flat_row_gather(xyz1, idx2)  # (B,M,3)
    w1 = 2.0 * g1[..., None] * diff1
    w2 = 2.0 * g2[..., None] * diff2
    grad1 = w1 + _batched_scatter_add(n, idx2, -w2)
    grad2 = w2 + _batched_scatter_add(m, idx1, -w1)
    return grad1, grad2


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_distance_ref(xyz1: Array, xyz2: Array) -> tuple[Array, Array, Array, Array]:
    """O(NM)-memory oracle (the analogue of metrics/CD/chamfer_python.py)."""
    d12 = square_distance(xyz1, xyz2)
    d1 = jnp.maximum(jnp.min(d12, axis=-1), 0.0)
    idx1 = jnp.argmin(d12, axis=-1).astype(jnp.int32)
    d21 = jnp.swapaxes(d12, 1, 2)
    d2 = jnp.maximum(jnp.min(d21, axis=-1), 0.0)
    idx2 = jnp.argmin(d21, axis=-1).astype(jnp.int32)
    return d1, d2, idx1, idx2


def three_nn(unknown: Array, known: Array) -> tuple[Array, Array]:
    """3 nearest neighbours of each ``unknown`` point among ``known``.

    Returns *sqrt* distances, matching pointnet2_utils.py:124-125.

    Args:
        unknown: (B, N, 3)
        known: (B, M, 3)
    Returns:
        dist: (B, N, 3) euclidean distances (ascending).
        idx: (B, N, 3) int32 indices.
    """
    d = square_distance(unknown, known)
    neg_top, idx = lax.top_k(-d, 3)
    return jnp.sqrt(jnp.maximum(-neg_top, 0.0)), idx.astype(jnp.int32)


def three_interpolate(points: Array, idx: Array, weight: Array) -> Array:
    """Weighted interpolation of per-point features from 3 neighbours.

    Args:
        points: (B, M, C) features of the known set.
        idx: (B, N, 3) neighbour indices.
        weight: (B, N, 3) interpolation weights.
    Returns:
        (B, N, C) interpolated features. Differentiable through ``points``
        (XLA emits the deterministic scatter-add gradient the CUDA version
        does with atomicAdd).
    """
    B, M, C = points.shape
    # Flattened single-axis gather (see ops/grouping.py:index_points).
    flat = (idx.astype(jnp.int32) + (jnp.arange(B, dtype=jnp.int32) * M)[:, None, None]).reshape(-1)
    gathered = points.reshape(B * M, C)[flat].reshape(idx.shape + (C,))  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)
