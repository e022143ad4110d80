"""Shared neural building blocks (flax.linen, channels-last).

Mapping to the reference (file:line refer to /root/reference):
- ``MLPConv``      <- models/model_utils.py:62-77 (MLP_CONV)
- ``MLPRes``       <- models/model_utils.py:79-95
- ``SharedMLP``    <- the Conv2d stacks used by the SA modules (:27-43)
- ``SelfAttentionBlock`` / ``CrossAttentionBlock``
                   <- models/model_utils.py:542-617 (pre-LN, q=k=x+pos,
                      value without pos, GELU FFN; the *same* input
                      projection applied to both streams in cross-attention)
- ``SDGDecoder``   <- models/model_utils.py:619-629
- ``EdgeConv``     <- models/model_utils.py:847-881 (dynamic feature-space
                      kNN graph, [edge||central] features, max over K)
- ``PCSA``         <- models/model_utils.py:358-429 (DCT-II gating along K)
- ``SinusoidalPositionalEmbedding`` <- models/model_utils.py:883-909
                      (interleaved sin/cos layout)
- ``PointNetSAModuleKNN`` <- models/model_utils.py:432-487
- ``PointNetSAModule``    <- models/model_utils.py:161-207 (ball query)
- ``PointNetFPModule``    <- models/model_utils.py:209-256

Dropout in the reference attention blocks is always constructed with p=0.0
in the three models, so it is omitted entirely (deterministic forward).
"""

from __future__ import annotations

import functools

from typing import Any, Optional, Sequence

import flax.linen as linen
import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_local,
    grouping_operation,
    sample_and_group_all,
    sample_and_group_ball,
    sample_and_group_knn,
)

Array = jax.Array

# Reference BatchNorms run with torch's default momentum 0.1, i.e. an EMA
# decay of 0.9 (flax's ``momentum``); flax's default 0.99 updates running
# stats 10x slower (caught by the train-mode oracle parity test).
#
# Cross-device moment sync: under the GSPMD (pjit) DP path batch moments are
# global automatically (XLA all-reduces the reductions). Under the shard_map
# DP path each device traces on its LOCAL batch shard, so BatchNorm must
# pmean its moments over the mesh axis to keep the two paths numerically
# identical. Trace-time switch with the usual caveat (set before the first
# trace; jit caches key on function identity — see set_flash_attention).
_BN_AXIS_NAME: Optional[str] = None


def set_bn_axis_name(name: Optional[str]) -> None:
    """Sync train-mode BatchNorm moments over mesh axis ``name`` (for the
    shard_map DP path; None restores purely-local moments)."""
    global _BN_AXIS_NAME
    _BN_AXIS_NAME = name


def bn_axis_name() -> Optional[str]:
    return _BN_AXIS_NAME


class bn_axis:
    """Context manager scoping :func:`set_bn_axis_name` to one trace region
    (the shard_map train-step body wraps ``model.apply`` in it, so traces
    outside shard_map in the same process keep local moments)."""

    def __init__(self, name: Optional[str]):
        self.name = name

    def __enter__(self):
        global _BN_AXIS_NAME
        self.prev = _BN_AXIS_NAME
        _BN_AXIS_NAME = self.name

    def __exit__(self, *exc):
        global _BN_AXIS_NAME
        _BN_AXIS_NAME = self.prev
        return False


# Pad-row exclusion from train-mode BN moments (VERDICT r2 next #8): when
# batch % devices != 0, parallel.pad_batch repeats rows cyclically to keep
# every chip busy; the loss masks them (weight 0) but plain BatchNorm would
# fold the repeats into its batch moments — permanently, via the running
# stats, for any config whose global batch doesn't divide the pod (the
# flagship PCN B12 on 8 chips). The train-step bodies scope the (B,) pad
# weights here (``bn_row_weights``), and ``BatchNorm`` switches to an
# exact weighted-moment implementation: pad rows (weight 0) contribute
# NOTHING to mean/var, so a padded step matches the unpadded step bit-for-
# tolerance (tests/test_train_sharding.py::test_padded_bn_moments_exact).
_BN_ROW_WEIGHTS: Optional[Array] = None


class bn_row_weights:
    """Context manager scoping the (B,) pad-row weights to one trace region
    (the train-step bodies wrap ``model.apply`` in it). ``None`` is a no-op
    — traces outside keep flax's stock BatchNorm bit-exactly."""

    def __init__(self, weights: Optional[Array]):
        self.weights = weights

    def __enter__(self):
        global _BN_ROW_WEIGHTS
        self.prev = _BN_ROW_WEIGHTS
        _BN_ROW_WEIGHTS = self.weights

    def __exit__(self, *exc):
        global _BN_ROW_WEIGHTS
        _BN_ROW_WEIGHTS = self.prev
        return False


class _WeightedBatchNorm(linen.Module):
    """BatchNorm with per-row weighted batch moments (pad-row exclusion).

    Same variable tree as ``linen.BatchNorm`` (params scale/bias, stats
    mean/var, feature axis -1) — and the class ``__name__`` is rebound to
    "BatchNorm" below so flax auto-naming produces identical scopes:
    checkpoints, the converter and the eval path are oblivious to which
    implementation traced a step.

    Weighted moments: with row weights w (captured from the
    ``bn_row_weights`` scope; the leading tensor dim may be an integer
    multiple k of len(w) — e.g. the image trunk's batch-major (B*3views)
    fold, nn/svdformer.py:89 — in which case each weight covers k
    consecutive rows), mean = sum(w*x)/sum(w*n_spatial) and var via the
    same pooled E[x^2]-mean^2 fast-variance formula flax uses. Under the
    shard_map DP path the three sums psum over the mesh axis, making the
    moments global and exact regardless of how pad rows distribute over
    shards (including all-pad shards, where the local sums are simply 0).
    """

    use_running_average: bool
    axis: int = -1
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    scale_init: Any = linen.initializers.ones
    bias_init: Any = linen.initializers.zeros

    @linen.compact
    def __call__(self, x: Array) -> Array:
        assert self.axis in (-1, x.ndim - 1), "feature axis must be last"
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        bias = self.param("bias", self.bias_init, (feat,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = _BN_ROW_WEIGHTS
            xf = x.astype(jnp.float32)
            k, rem = divmod(x.shape[0], w.shape[0])
            assert rem == 0, (x.shape, w.shape)
            wf = jnp.repeat(w.astype(jnp.float32), k)
            wb = wf.reshape((-1,) + (1,) * (x.ndim - 1))
            red = tuple(range(x.ndim - 1))
            n_spatial = 1
            for d in x.shape[1:-1]:
                n_spatial *= d
            s0 = jnp.sum(wf) * jnp.float32(n_spatial)
            s1 = jnp.sum(wb * xf, axis=red)
            s2 = jnp.sum(wb * jnp.square(xf), axis=red)
            axis = bn_axis_name()
            if axis is not None:
                s0, s1, s2 = (jax.lax.psum(s, axis) for s in (s0, s1, s2))
            mean = s1 / s0
            var = s2 / s0 - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        dt = self.dtype if self.dtype is not None else x.dtype
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dt)
        shift = (bias - mean * (jax.lax.rsqrt(var + self.epsilon) * scale)).astype(dt)
        return (x.astype(dt) * mul + shift).astype(dt)


# flax auto-names submodules by class __name__: rebind so unnamed call
# sites scope to "BatchNorm_N" exactly like linen.BatchNorm does.
_WeightedBatchNorm.__name__ = "BatchNorm"
_WeightedBatchNorm.__qualname__ = "BatchNorm"


def BatchNorm(**kwargs):
    """linen.BatchNorm with reference momentum and the mesh-axis switch;
    under a ``bn_row_weights`` scope, the weighted-moment implementation
    (pad-row exclusion) with an identical variable tree."""
    if _BN_ROW_WEIGHTS is not None:
        return _WeightedBatchNorm(**kwargs)
    return linen.BatchNorm(momentum=0.9, axis_name=_BN_AXIS_NAME, **kwargs)


class MLPConv(linen.Module):
    """Dense stack: ReLU between layers, no activation after the last."""

    features: Sequence[int]
    bn: bool = False

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, f in enumerate(self.features):
            x = linen.Dense(f, name=f"layer{i}")(x)
            if i < len(self.features) - 1:
                if self.bn:
                    x = BatchNorm(use_running_average=not train, axis=-1)(x)
                x = jax.nn.relu(x)
        return x


class MLPRes(linen.Module):
    """Residual 2-layer MLP with linear shortcut."""

    hidden: int
    out: int

    @linen.compact
    def __call__(self, x: Array) -> Array:
        shortcut = linen.Dense(self.out, name="shortcut")(x)
        h = jax.nn.relu(linen.Dense(self.hidden, name="fc1")(x))
        return linen.Dense(self.out, name="fc2")(h) + shortcut


class SharedMLP(linen.Module):
    """Per-point/per-neighbour Dense stack with optional BN and a
    configurable (non-)activation on the final layer — the SA-module pattern:
    ReLU on all but the last layer, last layer linear when ``last_act`` is
    False (models/model_utils.py:453-459)."""

    features: Sequence[int]
    if_bn: bool = True
    last_act: bool = True

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = linen.Dense(f, name=f"layer{i}")(x)
            is_last = i == n - 1
            if not is_last or self.last_act:
                if self.if_bn:
                    x = BatchNorm(
                        use_running_average=not train, axis=-1, name=f"bn{i}"
                    )(x)
                x = jax.nn.relu(x)
        return x


class MultiheadAttention(linen.Module):
    """Multi-head attention with separate query/key/value inputs.

    Equivalent wiring to torch ``nn.MultiheadAttention`` (packed in-proj +
    out-proj) but with explicit per-stream Dense layers; the checkpoint
    converter splits torch's packed weights accordingly. Shapes are
    channels-last ``(B, N, d)``.
    """

    d_model: int
    nhead: int

    @linen.compact
    def __call__(self, query: Array, key: Array, value: Array) -> Array:
        d, h = self.d_model, self.nhead
        assert d % h == 0, (d, h)
        dh = d // h
        q = linen.Dense(d, name="q_proj")(query)
        k = linen.Dense(d, name="k_proj")(key)
        v = linen.Dense(d, name="v_proj")(value)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, h, dh)

        q, k, v = split(q), split(k), split(v)
        out = _scaled_attention(q, k, v)  # (B, N, h, dh)
        out = out.reshape(out.shape[0], out.shape[1], d)
        return linen.Dense(d, name="out_proj")(out)


# Pallas flash attention is used when the shapes tile cleanly; measured on
# v5e at (B32, h8, 2048 tok): naive f32 18.8 ms -> flash 5.2-6.5 ms
# (tools/tpu_microbench.py). Inputs stay f32 (see the dtype note inside
# _scaled_attention); deviation vs the naive path is ~f32 round-off.
_FLASH_MIN_Q = 512
_FLASH_BLOCK = 512
_FLASH_HEAD_DIMS = (64, 96, 128, 256)
_FLASH_ENABLED = True


def set_flash_attention(enabled: bool) -> None:
    """Trace-time switch for the Pallas flash-attention fast path
    (parity debugging: the naive path is bit-faithful to the reference)."""
    global _FLASH_ENABLED
    _FLASH_ENABLED = enabled


def _flash_eligible(q, k) -> bool:
    from svdformer_pointsea_tpu.parallel.sp import sp_active

    # sp_active: pallas_call is not GSPMD-partitionable — the naive XLA
    # attention lets the partitioner shard Q tokens and all-gather K/V.
    if not _FLASH_ENABLED or jax.default_backend() != "tpu" or sp_active():
        return False
    qn, kn, dh = q.shape[1], k.shape[1], q.shape[-1]
    return (
        qn >= _FLASH_MIN_Q
        and qn % _FLASH_BLOCK == 0
        and kn % _FLASH_BLOCK == 0
        and dh in _FLASH_HEAD_DIMS
    )


def _flash_blocks(qn: int, kn: int) -> tuple:
    """(block_q, block_k) for the forward flash kernel. Blocks must DIVIDE
    the sequence lengths (flash_attention._verify_block raises otherwise);
    eligibility guarantees both are multiples of 512, so 512 always works —
    pick the largest tuned candidate that divides. Whole-array blocks on
    both axes crash the Mosaic compiler (seen at 2048/2048), so shrink
    block_q back to the base size in that case."""
    nq = min(qn, next(b for b in (1024, 512) if qn % b == 0 or b > qn))
    nk = min(kn, next(b for b in (2048, 1024, 512) if kn % b == 0 or b > kn))
    if nq == qn and nk == kn:
        nq = min(nq, _FLASH_BLOCK)
    return nq, nk


def _bwd_block(n: int) -> int:
    """Block size for the flash BACKWARD kernels (dkv/dq). Measured on v5e
    at (B12, h8, 2048 tok): widening 512 -> 1024 saves ~6% of an SDG-stage
    fwd+bwd; 2048 (whole-array on both axes) crashes Mosaic like the fwd
    case. Whole-array 1024 blocks at 1024-token sequences are avoided the
    same way."""
    if n % 1024 == 0 and n > 1024:
        return 1024
    return min(_FLASH_BLOCK, n)


def _scaled_attention(q: Array, k: Array, v: Array) -> Array:
    """softmax(q kᵀ / sqrt(dh)) v over (B, N, h, dh) tensors."""
    dh = q.shape[-1]
    if _flash_eligible(q, k):
        from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

        from svdformer_pointsea_tpu.nn.precision import mixed_precision_enabled

        dtype = q.dtype
        if mixed_precision_enabled():
            # Training throughput mode: bf16 kernel inputs (f32 accumulate
            # inside the kernel). ~11% off an SDG2 fwd+bwd; see
            # nn/precision.py for the parity trade-off.
            q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        # f32 inputs: measured on v5e, f32 flash costs only ~0-25% over bf16
        # (6.5 vs 5.2 ms at dh=64; 4.04 vs 3.99 at dh=128) while the
        # end-to-end completion deviation drops ~100x (bf16 inputs shifted a
        # random-init model's output by CD-L2 ~1.9e-4 — outside the
        # metric-parity budget).
        bq, bk, bv = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        # Tuned on v5e at (B32, h8, 2048 tok): wider k blocks cut the
        # streaming-softmax bookkeeping ~13% for both dh=64 and dh=128
        # (bq=1024, bk=2048); bq==bk==2048 crashes the Mosaic compiler.
        nq, nk = _flash_blocks(bq.shape[2], bk.shape[2])
        bs = BlockSizes(
            block_q=nq,
            block_k_major=nk,
            block_k=nk,
            block_b=1,
            block_q_major_dkv=_bwd_block(bq.shape[2]),
            block_k_major_dkv=_bwd_block(bk.shape[2]),
            block_k_dkv=_bwd_block(bk.shape[2]),
            block_q_dkv=_bwd_block(bq.shape[2]),
            block_k_major_dq=_bwd_block(bk.shape[2]),
            block_k_dq=_bwd_block(bk.shape[2]),
            block_q_dq=_bwd_block(bq.shape[2]),
        )
        # flash_attention_di128 == upstream flash_attention with a lean
        # dq-backward di layout (see nn/flash_vjp.py); same Pallas kernels.
        from svdformer_pointsea_tpu.nn.flash_vjp import flash_attention_di128

        out = flash_attention_di128(bq, bk, bv, 1.0 / np.sqrt(dh), bs)
        return jnp.swapaxes(out, 1, 2).astype(dtype)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


class SelfAttentionBlock(linen.Module):
    """Pre-LN self-attention block (models/model_utils.py:584-617).

    x (B, N, d_in), pos (B, N, d_out) or None -> (B, N, d_out).
    q = k = LN(proj(x)) + pos, value = LN(proj(x)); GELU FFN.
    """

    d_in: int
    d_out: int
    nhead: int = 4
    dim_feedforward: int = 1024

    @linen.compact
    def __call__(self, x: Array, pos: Optional[Array] = None) -> Array:
        src = linen.Dense(self.d_out, name="input_proj")(x)
        src = linen.LayerNorm(name="norm13")(src)
        qk = src if pos is None else src + pos
        attn = MultiheadAttention(self.d_out, self.nhead, name="attn")(qk, qk, src)
        src = src + attn
        src = linen.LayerNorm(name="norm12")(src)
        ff = linen.Dense(self.dim_feedforward, name="linear11")(src)
        ff = linen.Dense(self.d_out, name="linear12")(jax.nn.gelu(ff, approximate=False))
        return src + ff


class CrossAttentionBlock(linen.Module):
    """Pre-LN cross-attention block (models/model_utils.py:542-582).

    Note the reference applies the *same* input projection and the same
    pre-LN (norm13) to both streams — preserved here.
    """

    d_in: int
    d_out: int
    nhead: int = 4
    dim_feedforward: int = 1024

    @linen.compact
    def __call__(self, src1: Array, src2: Array, pos: Optional[Array] = None) -> Array:
        proj = linen.Dense(self.d_out, name="input_proj")
        norm13 = linen.LayerNorm(name="norm13")
        s1 = norm13(proj(src1))
        s2 = norm13(proj(src2))
        q = s1 if pos is None else s1 + pos
        attn = MultiheadAttention(self.d_out, self.nhead, name="attn")(q, s2, s2)
        s1 = s1 + attn
        s1 = linen.LayerNorm(name="norm12")(s1)
        ff = linen.Dense(self.dim_feedforward, name="linear11")(s1)
        ff = linen.Dense(self.d_out, name="linear12")(jax.nn.gelu(ff, approximate=False))
        return s1 + ff


class SelfAttentionBlockNoProj(linen.Module):
    """Self-attention block without the input projection
    (models_PointSea/model_utils.py:463-494). Input dim must equal d_out."""

    d_out: int
    nhead: int = 4
    dim_feedforward: int = 1024

    @linen.compact
    def __call__(self, x: Array, pos: Optional[Array] = None) -> Array:
        src = linen.LayerNorm(name="norm13")(x)
        qk = src if pos is None else src + pos
        attn = MultiheadAttention(self.d_out, self.nhead, name="attn")(qk, qk, src)
        src = src + attn
        src = linen.LayerNorm(name="norm12")(src)
        ff = linen.Dense(self.dim_feedforward, name="linear11")(src)
        ff = linen.Dense(self.d_out, name="linear12")(jax.nn.gelu(ff, approximate=False))
        return src + ff


class PointSeaSDGDecoder(linen.Module):
    """PointSea's decoder: two no-input-proj self-attention blocks at the
    hidden width; the pos argument the reference passes is ignored inside
    (models_PointSea/model_utils.py:496-509)."""

    hidden_dim: int

    @linen.compact
    def __call__(self, x: Array) -> Array:
        x = SelfAttentionBlockNoProj(self.hidden_dim, nhead=8, name="sa1")(x)
        return SelfAttentionBlockNoProj(self.hidden_dim, nhead=8, name="sa2")(x)


class SDGDecoder(linen.Module):
    """Two stacked self-attention blocks (models/model_utils.py:619-629).

    The PointSea variant is *called* with the positional embedding but its
    inner blocks ignore it (models_PointSea/model_utils.py:496-509), so no
    pos argument exists here.
    """

    hidden_dim: int
    channel: int
    ratio: int

    @linen.compact
    def __call__(self, x: Array) -> Array:
        x = SelfAttentionBlock(self.hidden_dim, self.hidden_dim, nhead=8, name="sa1")(x)
        return SelfAttentionBlock(
            self.hidden_dim, self.channel * self.ratio, nhead=8, name="sa2"
        )(x)


class EdgeConv(linen.Module):
    """DGCNN-style edge convolution (models/model_utils.py:847-881).

    kNN graph built in the input *feature* space; edge features
    ``[central - neighbour || central]``; shared MLP (BN + LeakyReLU(0.2) on
    the first two layers, linear last); max over neighbours.

    x (B, N, C_in) -> (B, N, C_out).
    """

    out_channels: int
    k: int

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        neigh = group_local(x, k=self.k)  # (B, N, K, C)
        central = jnp.repeat(x[:, :, None, :], self.k, axis=2)
        edge = central - neigh
        feat = jnp.concatenate([edge, central], axis=-1)
        half = self.out_channels // 2
        for i, (f, act) in enumerate([(half, True), (half, True), (self.out_channels, False)]):
            feat = linen.Dense(f, name=f"conv{i}")(feat)
            if act:
                feat = BatchNorm(
                    use_running_average=not train, axis=-1, name=f"bn{i}"
                )(feat)
                feat = jax.nn.leaky_relu(feat, negative_slope=0.2)
        # Max over neighbours. The ``central`` half is tied across all K,
        # but tie routing (torch: first index; jnp.max: even split) is
        # gradient-neutral here: tied positions carry equal values, so every
        # downstream aggregation weights them identically (verified by the
        # gradient oracle parity test).
        return jnp.max(feat, axis=2)


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (models/model_utils.py:389-398)."""
    x = np.arange(n, dtype=np.float64)[None, :]
    u = np.arange(n, dtype=np.float64)[:, None]
    mat = np.cos((np.pi / n) * (x + 0.5) * u) * np.sqrt(2.0 / n)
    mat[0, :] *= np.sqrt(0.5)
    return mat.astype(np.float32)  # orthonormal: inverse = transpose


class PCSA(linen.Module):
    """Point Cloud Spectral Adapter (models/model_utils.py:358-429).

    DCT-II along the neighbourhood axis, learned per-patch frequency gates
    from channel-averaged features, inverse DCT. x (B, S, K, C) -> same.
    """

    k: int

    @linen.compact
    def __call__(self, x: Array) -> Array:
        if self.k <= 0:
            return x
        dct = jnp.asarray(dct_matrix(self.k))  # (K, K): spec = dct @ sig
        hidden = max(8, self.k // 2)
        gate_in = jnp.mean(x, axis=-1)  # (B, S, K)
        g = linen.Dense(hidden, name="freq_fc1")(gate_in)
        g = linen.Dense(self.k, name="freq_fc2")(jax.nn.gelu(g, approximate=False))
        gates = jax.nn.sigmoid(g)  # (B, S, K) frequency gates
        spec = jnp.einsum("bskc,fk->bsfc", x, dct)
        spec = spec * gates[..., None]
        return jnp.einsum("bsfc,fk->bskc", spec, dct)


class SinusoidalPositionalEmbedding(linen.Module):
    """Interleaved sin/cos embedding of scalar indices, detached
    (models/model_utils.py:883-909): output layout
    [sin(w0 x), cos(w0 x), sin(w1 x), cos(w1 x), ...]."""

    d_model: int

    @linen.compact
    def __call__(self, emb_indices: Array) -> Array:
        assert self.d_model % 2 == 0
        div = np.exp(
            np.arange(0, self.d_model, 2, dtype=np.float32)
            * (-np.log(10000.0) / self.d_model)
        )
        omegas = emb_indices[..., None] * jnp.asarray(div)  # (..., d/2)
        emb = jnp.stack([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)
        emb = emb.reshape(emb_indices.shape + (self.d_model,))
        return jax.lax.stop_gradient(emb)


class PointNetSAModuleKNN(linen.Module):
    """Set-abstraction with kNN grouping (models/model_utils.py:432-487).

    xyz (B, N, 3), points (B, N, C) -> new_xyz (B, npoint, 3),
    new_points (B, npoint, mlp[-1]) [, idx].
    """

    npoint: Optional[int]
    nsample: Optional[int]
    mlp: Sequence[int]
    if_bn: bool = True
    group_all: bool = False
    use_xyz: bool = True
    if_idx: bool = False
    use_pcsa: bool = False

    @linen.compact
    def __call__(self, xyz: Array, points: Optional[Array], idx=None, train: bool = False):
        if self.group_all:
            new_xyz, new_points, idx, _ = sample_and_group_all(xyz, points, self.use_xyz)
        else:
            new_xyz, new_points, idx, _ = sample_and_group_knn(
                xyz, points, self.npoint, self.nsample, self.use_xyz, idx=idx
            )
        new_points = SharedMLP(
            self.mlp, if_bn=self.if_bn, last_act=False, name="mlp"
        )(new_points, train=train)
        if self.use_pcsa and not self.group_all:
            new_points = PCSA(self.nsample, name="pcsa")(new_points)
        new_points = jnp.max(new_points, axis=2)
        if self.if_idx:
            return new_xyz, new_points, idx
        return new_xyz, new_points


class PointNetSAModule(linen.Module):
    """Set-abstraction with ball-query grouping (models/model_utils.py:161-207).

    Capability-parity module (the three models use the kNN variant); note the
    reference applies ReLU+BN after *every* layer here, unlike the kNN one.
    """

    npoint: Optional[int]
    nsample: Optional[int]
    radius: Optional[float]
    mlp: Sequence[int]
    if_bn: bool = True
    group_all: bool = False
    use_xyz: bool = True

    @linen.compact
    def __call__(self, xyz: Array, points: Optional[Array], train: bool = False):
        if self.group_all:
            new_xyz, new_points, _, _ = sample_and_group_all(xyz, points, self.use_xyz)
        else:
            new_xyz, new_points, _, _ = sample_and_group_ball(
                xyz, points, self.npoint, self.nsample, self.radius, self.use_xyz
            )
        new_points = SharedMLP(
            self.mlp, if_bn=self.if_bn, last_act=True, name="mlp"
        )(new_points, train=train)
        new_points = jnp.max(new_points, axis=2)
        return new_xyz, new_points


class PointNetSAModuleMSG(linen.Module):
    """Multi-scale-grouping set abstraction (pointnet2_ops_lib/pointnet2_ops/
    pointnet2_modules.py:77-115 — dead code in the reference, imported only
    by its own package __init__; implemented for capability parity).

    FPS picks the centres ONCE; each scale ball-queries its own
    (radius, nsample) neighbourhood around the shared centres, runs its own
    MLP (ReLU+BN after every layer — build_shared_mlp semantics,
    pointnet2_modules.py:10-19), max-pools over the neighbourhood, and the
    per-scale descriptors concatenate along channels. With ``use_xyz`` the
    centred neighbour offsets prefix each scale's features
    (pointnet2_modules.py:110-112 mutates mlp_spec[0] += 3; here the Dense
    layers infer their input width, so no spec surgery is needed).

    Channels-last throughout: xyz (B, N, 3), points (B, N, C) ->
    new_xyz (B, npoint, 3), new_points (B, npoint, sum(mlp[-1] per scale)).
    """

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    if_bn: bool = True
    use_xyz: bool = True

    @linen.compact
    def __call__(self, xyz: Array, points: Optional[Array], train: bool = False):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is None:
            # GroupAll degenerate case (pointnet2_modules.py:106-108): one
            # centre, every scale sees the whole cloud.
            new_xyz = None
            scale_inputs = [
                sample_and_group_all(xyz, points, self.use_xyz)[1]
                for _ in self.radii
            ]
        else:
            fps_idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, fps_idx)
            scale_inputs = []
            for radius, nsample in zip(self.radii, self.nsamples):
                idx = ball_query(radius, nsample, xyz, new_xyz)
                grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
                if points is not None:
                    grouped = grouping_operation(points, idx)
                    grouped = (
                        jnp.concatenate([grouped_xyz, grouped], axis=-1)
                        if self.use_xyz
                        else grouped
                    )
                else:
                    grouped = grouped_xyz
                scale_inputs.append(grouped)
        outs = []
        for i, (grouped, mlp) in enumerate(zip(scale_inputs, self.mlps)):
            feats = SharedMLP(
                mlp, if_bn=self.if_bn, last_act=True, name=f"mlp{i}"
            )(grouped, train=train)
            outs.append(jnp.max(feats, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFeatureExtractor(linen.Module):
    """Vanilla PointNet global / per-point feature extractor
    (models/model_utils.py:631-805 — dead code in the reference, no model
    imports it; implemented for capability parity).

    Channels-last: input ``(B, N, in_channels)``. Each layer is a Dense
    (the reference's 1x1 Conv1d) + optional BatchNorm; ReLU on every layer
    except the last, which stays linear after its BN
    (model_utils.py:775-793). Max over the point axis gives the global
    feature ``(B, feat_size)``; with ``global_feat=False`` the global
    vector is broadcast back and concatenated (global first) with the
    post-activation FIRST-layer features (model_utils.py:797-805), giving
    ``(B, N, feat_size + layer_dims[0])``.

    ``layer_dims`` must be non-empty: the reference's degenerate
    zero-hidden-layer configuration applies its single conv twice (its
    first-layer and last-layer blocks alias), which is a bug we do not
    reproduce.
    """

    feat_size: int = 1024
    layer_dims: Sequence[int] = (64, 128)
    global_feat: bool = True
    batchnorm: bool = True

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        assert len(self.layer_dims) >= 1, "layer_dims must be non-empty"
        dims = (*self.layer_dims, self.feat_size)
        local = None
        for i, f in enumerate(dims):
            x = linen.Dense(f, name=f"conv{i}")(x)
            if self.batchnorm:
                x = BatchNorm(
                    use_running_average=not train, axis=-1, name=f"bn{i}"
                )(x)
            if i < len(dims) - 1:
                x = jax.nn.relu(x)
            if i == 0 and not self.global_feat:
                local = x
        g = jnp.max(x, axis=1)  # (B, feat_size)
        if self.global_feat:
            return g
        rep = jnp.broadcast_to(
            g[:, None, :], (x.shape[0], x.shape[1], self.feat_size)
        )
        return jnp.concatenate([rep, local], axis=-1)


class PointNetFPModule(linen.Module):
    """Feature propagation via inverse-distance 3-NN interpolation
    (models/model_utils.py:209-256)."""

    mlp: Sequence[int]
    use_points1: bool = False
    if_bn: bool = True

    @linen.compact
    def __call__(
        self,
        xyz1: Array,
        xyz2: Array,
        points1: Optional[Array],
        points2: Array,
        train: bool = False,
    ) -> Array:
        from svdformer_pointsea_tpu.ops import three_interpolate, three_nn

        dist, idx = three_nn(xyz1, xyz2)
        dist = jnp.maximum(dist, 1e-10)
        recip = 1.0 / dist
        weight = recip / jnp.sum(recip, axis=2, keepdims=True)
        interp = three_interpolate(points2, idx, weight)
        if self.use_points1:
            interp = jnp.concatenate([interp, points1], axis=-1)
        return SharedMLP(self.mlp, if_bn=self.if_bn, last_act=True, name="mlp")(
            interp, train=train
        )
