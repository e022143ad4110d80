"""Flash attention with a lean dq-backward ``di`` layout.

The stock TPU flash attention (jax.experimental.pallas.ops.tpu.
flash_attention) broadcasts the backward term ``di = sum(o * do)`` to
``block_k_major`` lanes before calling the dq kernel
(flash_attention.py:1316), but the kernel's BlockSpec only ever reads
the first 128 lanes (``di_spec`` uses ``MIN_BLOCK_SIZE`` and the kernel
loads ``di_tile_ref[0, 0, :]`` -> [block_q_major, 128]).  At this
package's tuned ``block_k_major_dq=1024`` the broadcast materializes 8x
the bytes the kernel reads: f32[12, 8, 2048, 1024] = 805 MB per
2048-token attention site at B12, measured ~1.3 ms/site of pure HBM
writes across five sites in the PCN train step (tools/
trace_train_step.py; HLO shows the broadcasts feeding
``flash_mha_bwd_dq`` custom-calls).  The dkv path already broadcasts to
``MIN_BLOCK_SIZE`` (flash_attention.py:972) and needs no fix.

This wrapper reuses the upstream Pallas kernels UNCHANGED — same fwd,
same dkv backward, same ``_flash_attention_dq_kernel`` — and only
rebuilds the dq ``pallas_call`` plumbing so ``di`` (and nothing else)
is fed at the 128 lanes actually read.  Non-causal, no attention bias,
no segment ids: all this model family needs.

Gradient layout note: the wrapped primal is ``custom_vjp``'d here, so
grad tracing never reaches the upstream ``defvjp`` (whose dq path we
are replacing).  Numerics are identical to upstream by construction
(same kernels, same blocks) — asserted on-chip by
tools/flash_vjp_check.py and tests/test_flash_vjp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu import flash_attention as _fa

from svdformer_pointsea_tpu.ops.vma import inject_vma, out_struct

__all__ = ["flash_attention_di128"]

# Interpret-mode switch so tests/test_flash_vjp.py can exercise the dq
# pallas_call on the CPU backend (the integration path is TPU-only).
_INTERPRET = False


def _bwd_dq_di128(
    q,
    k,
    v,
    l,
    m,
    do,
    di,
    *,
    block_q_major: int,
    block_k_major: int,
    block_k: int,
    sm_scale: float,
):
    """Upstream ``_flash_attention_bwd_dq`` minus the dead-lane ``di``
    broadcast (and minus the ab/segment-id/causal branches we never
    take).  Kernel body is the upstream ``_flash_attention_dq_kernel``.
    """
    batch_size, num_heads, q_seq_len, head_dim = q.shape
    _, _, kv_seq_len, _ = k.shape
    _fa._verify_block("block_q_dq", "q_seq_len", block_q_major, q_seq_len)
    _fa._verify_block("block_k_major_dq", "kv_seq_len", block_k_major, kv_seq_len)
    _fa._verify_block("block_k_dq", "block_k", block_k, kv_seq_len)

    # Broadcast the per-row scalars to the 128 lanes the kernel reads.
    # Upstream broadcasts di to block_k_major here — the whole point of
    # this module is this one line.
    m = jnp.broadcast_to(m[..., None], (*m.shape, _fa.MIN_BLOCK_SIZE))
    l = jnp.broadcast_to(l[..., None], (*l.shape, _fa.MIN_BLOCK_SIZE))
    di = jnp.broadcast_to(di[..., None], (*di.shape, _fa.MIN_BLOCK_SIZE))

    grid = (
        batch_size,
        num_heads,
        q_seq_len // block_q_major,
        kv_seq_len // block_k_major,
    )

    def qo_index_map(b, h, qi, _):
        return (b, h, qi, 0)

    def kv_index_map(b, h, _, ki):
        return (b, h, ki, 0)

    qo_spec = pl.BlockSpec((1, 1, block_q_major, head_dim), qo_index_map)
    kv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), kv_index_map)
    lm_spec = pl.BlockSpec((1, 1, block_q_major, _fa.MIN_BLOCK_SIZE), qo_index_map)

    kernel = functools.partial(
        _fa._flash_attention_dq_kernel,
        sm_scale=sm_scale,
        causal=False,
        mask_value=_fa.DEFAULT_MASK_VALUE,
        block_k=block_k,
        kv_seq_len=kv_seq_len,
    )
    name_scope = (
        f"flash_mha_bwd_dq_di128_{block_q_major=}_{block_k_major=}_{block_k=}"
    )
    with jax.named_scope(name_scope):
        dq, _ = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                # Operand order mirrors the kernel signature:
                # q, k, v, ab, q_segment_ids, kv_segment_ids, l, m, do, di.
                in_specs=[
                    qo_spec,
                    kv_spec,
                    kv_spec,
                    None,
                    None,
                    None,
                    lm_spec,
                    lm_spec,
                    qo_spec,
                    lm_spec,
                ],
                out_specs=[qo_spec, None],
                scratch_shapes=[
                    pltpu.VMEM((block_q_major, head_dim), jnp.float32)
                ],
            ),
            out_shape=[out_struct(q.shape, q.dtype, q, k, v), None],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel",
                    "parallel",
                    "parallel",
                    "arbitrary",
                )
            ),
            interpret=_INTERPRET,
        )(q, k, v, None, None, None, l, m, do, di)
    return dq


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_di128(q, k, v, sm_scale, block_sizes):
    """Drop-in for the upstream ``flash_attention(q, k, v, sm_scale=...,
    block_sizes=...)`` (non-causal, no bias/segments) with the fixed
    backward.  ``block_sizes`` must carry the backward blocks."""
    with inject_vma(q, k, v):
        return _fa._flash_attention(
            q, k, v, None, None, False, False, sm_scale, block_sizes, False
        )


def _fwd(q, k, v, sm_scale, block_sizes):
    with inject_vma(q, k, v):
        o, l, m = _fa._flash_attention(
            q, k, v, None, None, True, False, sm_scale, block_sizes, False
        )
    return o, (q, k, v, o, l, m)


def _bwd(sm_scale, block_sizes, residuals, do):
    q, k, v, o, l, m = residuals
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    # dkv: upstream path verbatim (its di layout is already lean).
    with inject_vma(q, k, v, do):
        dk, dv = _fa._flash_attention_bwd_dkv(
            q,
            k,
            v,
            None,
            None,
            l,
            m,
            do,
            di,
            block_q_major=block_sizes.block_q_major_dkv,
            block_q=block_sizes.block_q_dkv,
            block_k_major=block_sizes.block_k_major_dkv,
            block_k=block_sizes.block_k_dkv,
            sm_scale=sm_scale,
            causal=False,
            mask_value=_fa.DEFAULT_MASK_VALUE,
            debug=False,
        )
    dq = _bwd_dq_di128(
        q,
        k,
        v,
        l,
        m,
        do,
        di,
        block_q_major=block_sizes.block_q_dq,
        block_k_major=block_sizes.block_k_major_dq,
        block_k=block_sizes.block_k_dq,
        sm_scale=sm_scale,
    )
    return dq, dk, dv


flash_attention_di128.defvjp(_fwd, _bwd)
