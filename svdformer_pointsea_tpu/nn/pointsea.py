"""PointSea: SVDFormer upgraded with a pretrained ResNet18 image encoder,
realistic voxel renderer inputs, two-stage view fusion, and gated
path-selection SDG refiners (models_PointSea/PointSea.py).

Deviation from the reference, by design: the reference pairs per-view image
tokens (batch-major view-minor, from ``repeat_interleave``) with point
features tiled view-major (``f_p.repeat(3,1,1)``,
models_PointSea/PointSea.py:217) — for batch>1 that mixes features across
samples. We pair them correctly (repeat_interleave semantics); identical for
batch=1, which is all the reference's own smoke test exercises.
"""

from __future__ import annotations

import flax.linen as linen
import jax
import jax.numpy as jnp

from svdformer_pointsea_tpu.nn.layers import (
    CrossAttentionBlock,
    EdgeConv,
    MLPConv,
    PointSeaSDGDecoder,
    SelfAttentionBlock,
    SinusoidalPositionalEmbedding,
)
from svdformer_pointsea_tpu.nn.resnet import ResNet18
from svdformer_pointsea_tpu.nn.svdformer import (
    FeatureExtractor,
    torch_channel_reshape,
)
from svdformer_pointsea_tpu.ops import furthest_point_sample, gather_points
from svdformer_pointsea_tpu.ops.distances import nn_squared_distance
from svdformer_pointsea_tpu.parallel.sp import shard_tokens

Array = jax.Array


class PointSeaSDG(linen.Module):
    """SDG with Path Selection (models_PointSea/PointSea.py:63-124).

    When ``use_prev`` is True this is the ``SDG_l`` variant (:126-186) whose
    path-selection gate is additionally conditioned on the previous stage's
    upsampled features.
    """

    ratio: int
    hidden_dim: int = 768
    channel: int = 128
    use_prev: bool = False
    sigma: float = 0.2

    @linen.compact
    def __call__(
        self,
        local_feat: Array,
        coarse: Array,
        f_g: Array,
        partial: Array,
        prev_f_l: Array | None = None,
        train: bool = False,
    ):
        B, N, _ = coarse.shape
        ch, hidden, ratio = self.channel, self.hidden_dim, self.ratio

        # Sequence-parallel hints, mirroring nn/svdformer.py::SDG — no-ops
        # unless parallel.enable_sp is active.
        coarse = shard_tokens(coarse)
        F = linen.Dense(64, name="conv_x")(coarse)
        F = linen.Dense(ch, name="conv_x1")(jax.nn.gelu(F, approximate=False))
        g = linen.Dense(256, name="conv_11")(f_g)
        g = linen.Dense(ch, name="conv_1")(jax.nn.gelu(g, approximate=False))
        F = jnp.concatenate([F, jnp.broadcast_to(g, (B, N, ch))], axis=-1)

        # The distance feeds only the sinusoidal embedding, which detaches
        # (models_PointSea/model_utils.py:612; our stop_gradient in
        # SinusoidalPositionalEmbedding) — identical gradient story to the
        # SVDFormer SDG: no gradient flows through this chamfer.
        half_cd = nn_squared_distance(coarse, partial) / self.sigma
        emb = SinusoidalPositionalEmbedding(hidden, name="embedding")(half_cd)
        pos = shard_tokens(jnp.swapaxes(emb.reshape(B, hidden, N), 1, 2))

        F_Q = SelfAttentionBlock(ch * 2, hidden, nhead=8, name="sa1")(F, pos=pos)
        F_Q_ = PointSeaSDGDecoder(hidden, name="decoder1")(F_Q)

        f_g_current = jnp.max(F_Q, axis=1, keepdims=True)  # (B, 1, hidden)

        lf = MLPConv((hidden,), name="mlpp")(local_feat)
        F_H = CrossAttentionBlock(hidden, hidden, nhead=8, name="cross1")(F_Q, lf)
        F_H_ = PointSeaSDGDecoder(hidden, name="decoder2")(F_H)

        # Path selection gate. The barrier is load-bearing: fusing the
        # attention/decoder producers into the gate's broadcast+concat
        # consumer SIGABRTs the TPU compiler (bisected empirically; the gate
        # alone and the producers alone compile fine). Semantically a no-op.
        F_Q_, F_H_, f_g_current = jax.lax.optimization_barrier(
            (F_Q_, F_H_, f_g_current)
        )
        gate_in = [
            F_Q_ + F_H_,
            jnp.broadcast_to(f_g_current, (B, N, hidden)),
            jnp.broadcast_to(g, (B, N, ch)),
        ]
        if self.use_prev:
            gate_in.insert(1, prev_f_l)
        score = MLPConv((hidden,), name="fusionMlp")(
            jnp.concatenate(gate_in, axis=-1)
        )
        score = jax.nn.sigmoid(score)
        F_L = score * F_Q_ + (1 - score) * F_H_

        F_L = linen.Dense(ch * ratio, name="conv_ps")(F_L)
        F_L = shard_tokens(torch_channel_reshape(F_L, ch, N * ratio))
        F_L = linen.Dense(ch, name="conv_delta")(F_L)
        O_L = linen.Dense(64, name="conv_out1")(F_L)
        O_L = linen.Dense(3, name="conv_out")(jax.nn.gelu(O_L, approximate=False))
        fine = shard_tokens(jnp.tile(coarse, (1, ratio, 1)) + O_L)
        return fine, F_L


class PointSeaSVFNet(linen.Module):
    """Two-stage view fusion encoder (models_PointSea/PointSea.py:188-229)."""

    view_distance: float
    channel: int = 64

    @linen.compact
    def __call__(self, points: Array, depth: Array, train: bool = False):
        """points (B, N, 3); depth (B*3, H, W, 3) realistic renders."""
        B, N, _ = points.shape
        V = depth.shape[0] // B
        fmap = ResNet18(name="img_trunk")(depth, train=train)  # (B*V, 7, 7, 512)
        BV, fh, fw, fc = fmap.shape
        f_v = fmap.reshape(BV, fh * fw, fc)  # (B*V, 49, 512) tokens

        f_p = FeatureExtractor(use_pcsa=False, name="point_fe")(points, train=train)

        d = self.view_distance
        view_point = jnp.asarray(
            [[0.0, 0.0, -d], [-d, 0.0, 0.0], [0.0, d, 0.0]], jnp.float32
        )
        view_point = jnp.broadcast_to(view_point[None], (B, 3, 3))
        view_feature = MLPConv((64, 256), name="posmlp")(view_point)

        # Stage 1: per-view token attention (f_p broadcast per sample —
        # repeat_interleave pairing, see module docstring).
        f_p_pv = jnp.repeat(f_p, V, axis=0)  # (B*V, 1, 256)
        fused = jnp.concatenate(
            [f_v, jnp.broadcast_to(f_p_pv, (BV, fh * fw, 256))], axis=-1
        )  # (B*V, 49, 768)
        f_v_ = SelfAttentionBlock(768, 512, name="viewattn1")(fused)
        f_v_ = f_v_.reshape(B, V, fh * fw, 512)
        f_v_ = jnp.max(f_v_, axis=2)  # (B, V, 512) max over spatial tokens

        # Stage 2: cross-view attention with positional (camera) embedding.
        fused2 = jnp.concatenate(
            [f_v_, jnp.broadcast_to(f_p, (B, V, 256))], axis=-1
        )  # (B, 3, 768)
        f_v_ = SelfAttentionBlock(768, 256, name="viewattn2")(fused2, pos=view_feature)
        f_v_ = jnp.max(f_v_, axis=1, keepdims=True)  # (B, 1, 256)
        f_g = jnp.concatenate([f_p, f_v_], axis=-1)  # (B, 1, 512)

        c = self.channel
        x = linen.Dense(c * 128, name="ps")(f_g[:, 0, :])
        x = jnp.swapaxes(x.reshape(B, c, 128), 1, 2)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.concatenate([x, jnp.broadcast_to(f_g, (B, 128, 512))], axis=-1)
        x = jax.nn.gelu(linen.Dense(c * 8, name="ps_refuse")(x), approximate=False)
        x2 = SelfAttentionBlock(c * 8, c * 8, name="sa")(x)
        # 128 seed tokens x 8c channels unfold to 256 coarse points x 4c —
        # the reference writes N//8 here, which equals 256 only because its
        # pipelines always feed N=2048 (models/SVDFormer.py:163); we use the
        # shape-derived constant so any N works.
        n_coarse = (128 * c * 8) // (c * 4)
        x2_d = torch_channel_reshape(x2, c * 4, n_coarse)
        h = jnp.concatenate([x2_d, jnp.broadcast_to(f_g, (B, n_coarse, 512))], axis=-1)
        h = jax.nn.gelu(linen.Dense(64, name="conv_out1")(h), approximate=False)
        coarse = linen.Dense(3, name="conv_out")(h)
        return f_g, coarse


class PointSeaLocalEncoder(linen.Module):
    """Three-level EdgeConv pyramid, 64+256+512=832 channels
    (models_PointSea/PointSea.py:231-248)."""

    local_points: int = 512

    @linen.compact
    def __call__(self, points: Array, train: bool = False) -> Array:
        x1 = EdgeConv(64, 16, name="gcn1")(points, train=train)
        idx = furthest_point_sample(points, self.local_points)
        x1 = gather_points(x1, idx)
        x2 = EdgeConv(256, 8, name="gcn2")(x1, train=train)
        x3 = EdgeConv(512, 4, name="gcn3")(x2, train=train)
        return jnp.concatenate([x1, x2, x3], axis=-1)  # (B, local, 832)


class PointSea(linen.Module):
    """Full PointSea (models_PointSea/PointSea.py:250-272).

    __call__(partial (B, N, 3), depth (B*3, H, W, 3)) -> (coarse, fine1, fine2).
    """

    step1: int = 4
    step2: int = 8
    merge_points: int = 512
    local_points: int = 512
    view_distance: float = 0.7

    @linen.compact
    def __call__(self, partial: Array, depth: Array, train: bool = False):
        feat_g, coarse = PointSeaSVFNet(self.view_distance, name="encoder")(
            partial, depth, train=train
        )
        local_feat = PointSeaLocalEncoder(self.local_points, name="localencoder")(
            partial, train=train
        )
        merged = jnp.concatenate([partial, coarse], axis=1)
        idx = furthest_point_sample(merged, self.merge_points)
        coarse_merge = gather_points(merged, idx)

        fine1, f_l1 = PointSeaSDG(self.step1, hidden_dim=768, name="refine1")(
            local_feat, coarse_merge, feat_g, partial, train=train
        )
        fine2, _ = PointSeaSDG(
            self.step2, hidden_dim=512, use_prev=True, name="refine2"
        )(local_feat, fine1, feat_g, partial, prev_f_l=f_l1, train=train)
        return coarse, fine1, fine2
