"""Furthest point sampling (FPS) and index gathering.

Reference semantics (pointnet2 _ext-src/src/sampling_gpu.cu:69-229):
- the first selected index is always 0;
- each round updates a per-point running min-distance to the selected set and
  picks the argmax;
- points with ``||p||^2 <= 1e-3`` are skipped entirely (they can never be
  selected) — near-origin points act as padding;
- indices are int32 and the op is non-differentiable w.r.t. coordinates.

Two implementations:
- ``furthest_point_sample_ref``: a ``lax.scan`` over selection rounds — one
  O(B*N) distance update + argmax per round. Compiles anywhere; used as the
  CPU oracle and fallback.
- ``furthest_point_sample``: a Pallas TPU kernel that keeps the coordinates
  and the running min-distance vector in VMEM for all ``m`` rounds, so the
  sequential selection loop never round-trips HBM. This is the hot op (4-6
  calls per train step, inside the model and the loss pyramids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdformer_pointsea_tpu.ops.vma import out_struct, vary_like as _vary_like

Array = jax.Array

_MAG_SKIP = 1e-3
_INIT_DIST = 1e10


def furthest_point_sample_ref(xyz: Array, npoint: int) -> Array:
    """FPS oracle via lax.scan. xyz (B, N, 3) -> (B, npoint) int32."""
    xyz = xyz.astype(jnp.float32)
    B, N, _ = xyz.shape
    valid = jnp.sum(xyz**2, axis=-1) > _MAG_SKIP  # (B, N)
    first = _vary_like(jnp.zeros((B,), jnp.int32), xyz)

    def body(carry, _):
        mindist, last = carry
        last_pt = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - last_pt) ** 2, axis=-1)
        mindist = jnp.minimum(mindist, d)
        # Skipped points are never candidates; if nothing is valid argmax
        # falls back to index 0 like the CUDA kernel's besti=0 default.
        cand = jnp.where(valid, mindist, -jnp.inf)
        nxt = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        return (mindist, nxt), nxt

    if npoint == 1:
        return first[:, None]
    init = (_vary_like(jnp.full((B, N), _INIT_DIST, jnp.float32), xyz), first)
    _, rest = lax.scan(body, init, None, length=npoint - 1)
    return jnp.concatenate([first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(xyz_ref, out_ref, mind_ref, *, npoint: int, n: int, npad: int):
    """Batch-vectorised FPS; coords + running min-dist stay in VMEM.

    xyz_ref: (3, B, npad) VMEM. out_ref: (B, npoint) int32 VMEM. mind_ref:
    (B, npad) VMEM scratch with the running min squared distance to the
    selected set. The per-round argmax is expressed as vector select + row
    reductions, and each selected index is committed with a full-array
    select (no dynamic stores — Mosaic-friendly).
    """
    x = xyz_ref[0]  # (B, npad)
    y = xyz_ref[1]
    z = xyz_ref[2]
    b = x.shape[0]
    ids = lax.broadcasted_iota(jnp.int32, (b, npad), 1)
    out_cols = lax.broadcasted_iota(jnp.int32, (b, npoint), 1)
    mag = x * x + y * y + z * z
    valid = jnp.logical_and(mag > _MAG_SKIP, ids < n)

    mind_ref[:, :] = jnp.full((b, npad), _INIT_DIST, jnp.float32)
    out_ref[:, :] = jnp.zeros((b, npoint), jnp.int32)  # slot 0 = index 0

    def body(j, last):
        # last: (B, 1) int32 — extract the coords of the last pick per row.
        sel = ids == last
        lx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        ly = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        lz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        cand = jnp.where(valid, mind, -jnp.inf)
        # First-occurrence argmax: min index among the maxima.
        best = jnp.max(cand, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(cand == best, ids, npad), axis=1, keepdims=True
        ).astype(jnp.int32)
        nxt = jnp.where(nxt >= n, 0, nxt)  # all-invalid fallback (besti=0)
        out_ref[:, :] = jnp.where(out_cols == j, nxt, out_ref[:, :])
        return nxt

    lax.fori_loop(1, npoint, body, jnp.zeros((b, 1), jnp.int32), unroll=False)


def _fps_batch_plan(B: int, npad: int) -> tuple[int, int]:
    """(padded batch, chunk) whose VMEM working set fits the 16 MB scoped
    limit: the kernel keeps coords (3 rows) plus ~7 (chunk, npad) f32
    temporaries live (mind/d/cand/ids/masks). At (B32, N16384) the
    un-chunked kernel needed 18.4 MB and failed to compile. Mosaic also
    requires the block's batch dim to be a multiple of 8 or the whole
    array, so when no divisor qualifies the batch is zero-padded (padding
    rows have mag 0 and sample index 0 everywhere — sliced off by the
    caller)."""
    cap = max(1, (12 * 1024 * 1024) // (40 * npad))
    if B <= cap:
        return B, B
    best = 0
    for c in range(8, min(B, cap) + 1, 8):
        if B % c == 0:
            best = c
    if best:
        return B, best
    bpad = _round_up(B, 8)
    best = 8
    for c in range(8, min(bpad, cap) + 1, 8):
        if bpad % c == 0:
            best = c
    return bpad, best


def _fps_pallas(xyz: Array, npoint: int) -> Array:
    B, N, _ = xyz.shape
    npad = _round_up(N, 128)
    bpad, chunk = _fps_batch_plan(B, npad)
    # Zero padding has mag 0 <= 1e-3, so the reference's origin-skip quirk
    # masks it out for free; the ids<n guard covers degenerate inputs.
    coords = jnp.zeros((3, bpad, npad), jnp.float32)
    coords = coords.at[:, :B, :N].set(
        jnp.moveaxis(xyz.astype(jnp.float32), -1, 0)
    )

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=N, npad=npad)
    out = pl.pallas_call(
        kernel,
        grid=(bpad // chunk,),
        in_specs=[
            pl.BlockSpec(
                (3, chunk, npad), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (chunk, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=out_struct((bpad, npoint), jnp.int32, xyz),
        scratch_shapes=[pltpu.VMEM((chunk, npad), jnp.float32)],
    )(coords)
    return out[:B]


def furthest_point_sample(xyz: Array, npoint: int) -> Array:
    """FPS: (B, N, 3) float -> (B, npoint) int32 indices.

    Dispatches to the Pallas kernel on TPU, the scan oracle elsewhere.
    Non-differentiable like the reference op (pointnet2_utils.py:56) — the
    stop_gradient also keeps grad tracing out of the Pallas call, which has
    no JVP rule.
    """
    xyz = jax.lax.stop_gradient(xyz)
    if npoint == 1:
        return _vary_like(jnp.zeros((xyz.shape[0], 1), jnp.int32), xyz)
    from svdformer_pointsea_tpu.parallel.sp import sp_active

    # Under sequence parallelism the Pallas kernel would force GSPMD to
    # replicate around the call (pallas_call is not partitionable); the
    # scan path stays shardable over the batch axis.
    if jax.default_backend() == "tpu" and not sp_active():
        return _fps_pallas(xyz, npoint)
    return furthest_point_sample_ref(xyz, npoint)


def gather_points(points: Array, idx: Array) -> Array:
    """Gather per-point features by index (pointnet2 ``gather_operation``).

    Args:
        points: (B, N, C)
        idx: (B, S) int32
    Returns:
        (B, S, C). Differentiable through ``points`` (scatter-add grad, as in
        sampling_gpu.cu:8-57, but deterministic under XLA).
    """
    # Flattened single-axis gather — 2.5x faster than the batched lowering
    # on TPU (see ops/grouping.py:index_points).
    B, N, C = points.shape
    flat = (idx.astype(jnp.int32) + (jnp.arange(B, dtype=jnp.int32) * N)[:, None]).reshape(-1)
    return points.reshape(B * N, C)[flat].reshape(idx.shape + (C,))


def fps_subsample(pcd: Array, n_points: int = 2048) -> Array:
    """FPS-resample a cloud to ``n_points`` (models/model_utils.py:489-499).

    pcd: (B, N, 3) -> (B, n_points, 3).
    """
    if pcd.shape[1] == n_points:
        return pcd
    idx = furthest_point_sample(pcd, n_points)
    return gather_points(pcd, idx)
