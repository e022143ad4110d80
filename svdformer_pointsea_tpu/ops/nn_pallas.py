"""Fused nearest-neighbour distance kernel (Pallas TPU).

The NN search behind chamfer distance (metrics/CD/chamfer3D/chamfer3D.cu)
is the training hot spot: the XLA formulation materialises (N, M) distance
tiles in HBM — at (B12, 16384, 16384) that is ~26 GB of traffic and ~66 ms
per direction on v5e. This kernel keeps each (TN, TM) tile in VMEM (the
same trick as the CUDA kernel's shared-memory chunks of 512 points,
chamfer3D.cu:13-134) and only writes the (N,) min/argmin, making the op
compute-bound.

Grid is (B,); per program the query set lives in VMEM and is swept in
(TN, TM) tiles: d = |a|^2 - 2 a.b + |b|^2 via the MXU, running
first-occurrence argmin in registers (ties resolve to the lowest index,
matching the CUDA scan order).

Negative result (measured 2026-08, chained-fori device timing on v5e): a
fused bidirectional kernel that reduces each tile along BOTH axes is
0.67-0.85x the speed of two one-way passes at loss shapes. The column
direction reduces across sublanes (slow on the VPU) while each one-way
pass reduces along lanes; recomputing the dx/dy/dz FMAs is cheaper than
the cross-sublane min+argmin. Keep chamfer as two one-way calls.

Negative result #2 (2026-08-18, tools/nn_mxu_probe.py): offloading the
cross term to the MXU (d' = |b|^2 - 2ab with the dot at
precision=HIGHEST, |a|^2 added after the min — exact to 1.5e-7, 6 argmin
flips in 196k) is 2.4x SLOWER (32 vs 13.5 ms at B12 16384^2): the K=3
f32-emulation matmul passes don't overlap the VPU min tracking. The
difference-form kernel sits ~25% above its own VPU roofline (~10 ms of
pure FMA+min throughput) — treat it as speed-of-light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdformer_pointsea_tpu.ops.vma import out_struct

Array = jax.Array

# Tile sizes bound the live VMEM temporaries ((tn, tm) f32 distance tile,
# iota, masks): 256x2048 keeps the kernel ~8 MB, safely under the 16 MB
# scoped limit even inside fused callers.
_TN = 256  # query rows per inner step
_TM = 2048  # target columns per VMEM tile
_PAD_DIST = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(at_ref, bt_ref, dmin_ref, idx_ref, *, m: int, tn: int, tm: int):
    # mask_tail statically drops the ids<m pad mask when every tile is full
    # (m % tm == 0 — true at the loss shapes 16384/2048): one fewer VPU op
    # per element on the hottest kernel in the train step.
    """at_ref (1, 3, Npad); bt_ref (1, 3, Mpad); outputs (1, 1, Npad).

    Both point sets come in coordinate-major (3, n) layout: an (n, 3) block
    would pad the 3-wide minor dim to 128 lanes (42x VMEM bloat — the cause
    of a scoped-VMEM OOM at 16k points).
    """
    npad = at_ref.shape[2]
    mpad = bt_ref.shape[2]
    n_qtiles = npad // tn
    n_ktiles = mpad // tm
    mask_tail = (m % tm) != 0  # static: pad columns exist only then

    base_ids = lax.broadcasted_iota(jnp.int32, (tn, tm), 1)

    def q_tile(i, _):
        a = jnp.transpose(at_ref[0, :, pl.ds(i * tn, tn)])  # (tn, 3)

        def body(j, carry):
            best, best_idx = carry
            bt = bt_ref[0, :, pl.ds(j * tm, tm)]  # (3, tm)
            # Exact f32 difference form, like chamfer3D.cu — the
            # |a|^2 - 2ab + |b|^2 matmul route runs at bf16 MXU precision
            # on TPU and corrupts ~1e-2 of the distance (wrong argmins).
            dx = a[:, 0:1] - bt[0:1, :]
            dy = a[:, 1:2] - bt[1:2, :]
            dz = a[:, 2:3] - bt[2:3, :]
            d = dx * dx + dy * dy + dz * dz
            ids = base_ids + j * tm
            if mask_tail:
                d = jnp.where(ids < m, d, _PAD_DIST)
            tile_min = jnp.min(d, axis=1, keepdims=True)  # (tn, 1)
            tile_arg = jnp.min(
                jnp.where(d == tile_min, ids, jnp.int32(2**30)),
                axis=1,
                keepdims=True,
            )
            take = tile_min < best  # strict: earlier tile wins ties
            best = jnp.where(take, tile_min, best)
            best_idx = jnp.where(take, tile_arg, best_idx)
            return best, best_idx

        init = (
            jnp.full((tn, 1), _PAD_DIST, jnp.float32),
            jnp.zeros((tn, 1), jnp.int32),
        )
        best, best_idx = lax.fori_loop(0, n_ktiles, body, init)
        dmin_ref[0, 0, pl.ds(i * tn, tn)] = best[:, 0]
        idx_ref[0, 0, pl.ds(i * tn, tn)] = best_idx[:, 0]
        return 0

    lax.fori_loop(0, n_qtiles, q_tile, 0)


def nn_one_way_pallas(a: Array, b: Array) -> tuple[Array, Array]:
    """min/argmin squared distance from each of ``a`` (B,N,3) to set ``b``
    (B,M,3). Returns ((B,N) f32, (B,N) int32)."""
    B, N, _ = a.shape
    M = b.shape[1]
    tn = min(_TN, _round_up(N, 8))
    tm = min(_TM, _round_up(M, 128))
    npad = _round_up(N, tn)
    mpad = _round_up(M, tm)

    at = jnp.zeros((B, 3, npad), jnp.float32)
    at = at.at[:, :, :N].set(jnp.swapaxes(a.astype(jnp.float32), 1, 2))
    bt = jnp.zeros((B, 3, mpad), jnp.float32)
    bt = bt.at[:, :, :M].set(jnp.swapaxes(b.astype(jnp.float32), 1, 2))

    kernel = functools.partial(_nn_kernel, m=M, tn=tn, tm=tm)
    dmin, idx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, npad), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mpad), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, npad), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((B, 1, npad), jnp.float32, a, b),
            out_struct((B, 1, npad), jnp.int32, a, b),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * npad * mpad * 4,
            bytes_accessed=4 * B * (npad * 3 + 3 * mpad + 2 * npad),
            transcendentals=0,
        ),
    )(at, bt)
    dmin = jnp.maximum(dmin[:, 0, :N], 0.0)  # cancellation can dip negative
    return dmin, idx[:, 0, :N]
