"""Probe: MXU-hybrid NN-distance kernel vs the shipped VPU difference-form.

The shipped kernel computes d = dx^2+dy^2+dz^2 on the VPU (~12 ops/pair,
measured 12 ms/direction at B12 16384^2 — VPU-bound). Hybrid: cross term
-2ab on the MXU at f32-emulation precision, then d' = |b|^2 - 2ab with a
single FMA + min/argmin tracking on the VPU (~5 ops/pair); |a|^2 is a
per-row constant that cannot change the argmin and is added once at the
end. Checks both value agreement and speed.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/nn_mxu_probe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdformer_pointsea_tpu.ops.nn_pallas import nn_one_way_pallas, _round_up

_PAD_DIST = 1e30


def _nn_mxu_kernel(at_ref, bt_ref, dmin_ref, idx_ref, *, m, tn, tm):
    npad = at_ref.shape[2]
    mpad = bt_ref.shape[2]
    n_qtiles = npad // tn
    n_ktiles = mpad // tm
    mask_tail = (m % tm) != 0

    base_ids = lax.broadcasted_iota(jnp.int32, (tn, tm), 1)

    def q_tile(i, _):
        a = jnp.transpose(at_ref[0, :, pl.ds(i * tn, tn)])  # (tn, 3)
        norma = jnp.sum(a * a, axis=1, keepdims=True)  # (tn, 1)

        def body(j, carry):
            best, best_idx = carry
            bt = bt_ref[0, :, pl.ds(j * tm, tm)]  # (3, tm)
            normb = jnp.sum(bt * bt, axis=0, keepdims=True)  # (1, tm)
            cross = jax.lax.dot_general(
                a, bt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )  # (tn, tm) on the MXU
            d = normb - 2.0 * cross  # one FMA; |a|^2 added at the end
            ids = base_ids + j * tm
            if mask_tail:
                d = jnp.where(ids < m, d, _PAD_DIST)
            tile_min = jnp.min(d, axis=1, keepdims=True)
            tile_arg = jnp.min(
                jnp.where(d == tile_min, ids, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            take = tile_min < best
            best = jnp.where(take, tile_min, best)
            best_idx = jnp.where(take, tile_arg, best_idx)
            return best, best_idx

        init = (
            jnp.full((tn, 1), _PAD_DIST, jnp.float32),
            jnp.zeros((tn, 1), jnp.int32),
        )
        best, best_idx = lax.fori_loop(0, n_ktiles, body, init)
        dmin_ref[0, 0, pl.ds(i * tn, tn)] = best[:, 0] + norma[:, 0]
        idx_ref[0, 0, pl.ds(i * tn, tn)] = best_idx[:, 0]
        return 0

    lax.fori_loop(0, n_qtiles, q_tile, 0)


def nn_one_way_mxu(a, b, tn=256, tm=2048):
    B, N, _ = a.shape
    M = b.shape[1]
    tn = min(tn, _round_up(N, 8))
    tm = min(tm, _round_up(M, 128))
    npad = _round_up(N, tn)
    mpad = _round_up(M, tm)
    at = jnp.zeros((B, 3, npad), jnp.float32)
    at = at.at[:, :, :N].set(jnp.swapaxes(a.astype(jnp.float32), 1, 2))
    bt = jnp.zeros((B, 3, mpad), jnp.float32)
    bt = bt.at[:, :, :M].set(jnp.swapaxes(b.astype(jnp.float32), 1, 2))
    kernel = functools.partial(_nn_mxu_kernel, m=M, tn=tn, tm=tm)
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
            jax.ShapeDtypeStruct((B, 1, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, npad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * npad * mpad * 4,
            bytes_accessed=4 * B * (npad * 3 + 3 * mpad + 2 * npad),
            transcendentals=0,
        ),
    )(at, bt)
    return jnp.maximum(dmin[:, 0, :N], 0.0), idx[:, 0, :N]


def chained_ms(fn, a, b, iters=20):
    @jax.jit
    def step(carry, a, b):
        d, i = fn(a + carry * 1e-30, b)
        return jnp.sum(d) * 1e-38 + jnp.sum(i).astype(jnp.float32) * 1e-38

    carry = jnp.float32(0.0)
    carry = step(carry, a, b)
    _ = float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry, a, b)
    _ = float(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    rng = np.random.RandomState(0)
    B, N, M = 12, 16384, 16384
    a = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    b = jnp.asarray(rng.rand(B, M, 3).astype(np.float32) - 0.5)

    d0, i0 = jax.jit(nn_one_way_pallas)(a, b)
    for tm in (2048, 4096):
        d1, i1 = jax.jit(functools.partial(nn_one_way_mxu, tm=tm))(a, b)
        derr = float(jnp.max(jnp.abs(d1 - d0)))
        iflip = int(jnp.sum(i1 != i0))
        print(f"tm={tm}: max|dd|={derr:.3e} argmin flips={iflip}/{B*N}")

    print(f"VPU difference-form: {chained_ms(nn_one_way_pallas, a, b):.2f} ms")
    for tm in (2048, 4096):
        ms = chained_ms(functools.partial(nn_one_way_mxu, tm=tm), a, b)
        print(f"MXU hybrid tm={tm}:  {ms:.2f} ms")


if __name__ == "__main__":
    main()
