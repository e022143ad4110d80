"""GeoSpecNet: spectral-enhanced encoder + SDG refinement + GAN discriminator.

Re-architecture of models/GeoSpecNet.py: the DCT spectral adapters become
batched einsums against a fixed orthonormal basis (MXU-friendly), the
geometric attention a softmax over neighbour distances, and the
discriminator a PointNet stem + max pool.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as linen
import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.nn.layers import (
    BatchNorm,
    MLPConv,
    PointNetSAModuleKNN,
    SelfAttentionBlock,
    dct_matrix,
)
from svdformer_pointsea_tpu.nn.resnet import ImageTrunk
from svdformer_pointsea_tpu.nn.svdformer import (
    SDG,
    LocalEncoder,
    torch_channel_reshape,
)
from svdformer_pointsea_tpu.ops import (
    furthest_point_sample,
    gather_points,
    group_local,
    index_points,
)

Array = jax.Array


class SpectralAdapter(linen.Module):
    """DCT-basis spectral filter on local kNN patches
    (models/GeoSpecNet.py:32-109).

    Per-channel learnable frequency gates + geometric attention pooling over
    neighbours, then a channel-mixing projection.
    xyz (B, N, 3), feats (B, N, C) -> (B, N, out_channels).
    """

    in_channels: int
    out_channels: int
    k: int = 16
    reduction: int = 4

    @linen.compact
    def __call__(self, xyz: Array, feats: Array) -> Array:
        B, N, C = feats.shape
        dct = jnp.asarray(dct_matrix(self.k))  # (K, K) orthonormal

        group_xyz, idx = group_local(xyz, k=self.k, return_idx=True)
        # Reference groups *relative* positions? No — its group_local returns
        # absolute neighbour coords; distances below use their norms
        # (GeoSpecNet.py:88 uses torch.norm of group_xyz which are absolute).
        neigh = index_points(feats, idx)  # (B, N, K, C)

        dists = jnp.linalg.norm(group_xyz, axis=-1, keepdims=True)  # (B,N,K,1)
        a = linen.Dense(16, name="geo_fc1")(dists)
        a = linen.Dense(1, name="geo_fc2")(jax.nn.relu(a))  # (B, N, K, 1)
        attn = jax.nn.softmax(-a[..., 0], axis=-1)[..., None]  # (B, N, K, 1)

        # Reference multiplies by the *forward* DCT matrix on the right
        # (X @ W, GeoSpecNet.py:95) and by W^T on the way back.
        spec = jnp.einsum("bnkc,kf->bnfc", neigh, dct.T)
        gamma = self.param(
            "freq_gate",
            lambda key: 0.02 * jax.random.normal(key, (self.in_channels, self.k)),
        )
        spec = spec * jnp.swapaxes(gamma, 0, 1)[None, None, :, :]
        filt = jnp.einsum("bnfc,fk->bnkc", spec, dct)

        out = jnp.sum(filt * attn, axis=2)  # (B, N, C)
        hidden = max(self.in_channels // self.reduction, 16)
        out = linen.Dense(hidden, name="proj_fc1")(out)
        out = linen.Dense(self.out_channels, name="proj_fc2")(jax.nn.relu(out))
        return out


class MSGSpecConv(linen.Module):
    """Multi-scale spectral conv over several K with fusion
    (models/GeoSpecNet.py:112-129)."""

    in_channels: int
    out_channels: int
    k_list: Sequence[int] = (16, 32)

    @linen.compact
    def __call__(self, xyz: Array, feats: Array) -> Array:
        outs = [
            SpectralAdapter(
                self.in_channels, self.out_channels, k, name=f"branch{i}"
            )(xyz, feats)
            for i, k in enumerate(self.k_list)
        ]
        out = jnp.concatenate(outs, axis=-1)
        return jax.nn.relu(linen.Dense(self.out_channels, name="fuse")(out))


class SpectralFeatureExtractor(linen.Module):
    """SA stack with a spectral residual at the mid scale
    (models/GeoSpecNet.py:132-155)."""

    out_dim: int = 256

    @linen.compact
    def __call__(self, points: Array, train: bool = False) -> Array:
        l1_xyz, l1_points, _ = PointNetSAModuleKNN(
            512, 16, (64, 128), if_bn=False, if_idx=True, name="sa1"
        )(points, points, train=train)
        l2_xyz, l2_points, _ = PointNetSAModuleKNN(
            128, 16, (128, 256), if_bn=False, if_idx=True, name="sa2"
        )(l1_xyz, l1_points, train=train)
        spec = MSGSpecConv(256, 256, name="msg_spec")(l2_xyz, l2_points)
        l2_points = l2_points + spec
        _, l3_points = PointNetSAModuleKNN(
            None, None, (512, self.out_dim), if_bn=False, group_all=True, name="sa3"
        )(l2_xyz, l2_points, train=train)
        return l3_points


class SVFNetGS(linen.Module):
    """SVFNet variant with the spectral point encoder
    (models/GeoSpecNet.py:158-200). Same fusion/seed path as SVFNet."""

    view_distance: float
    channel: int = 64

    @linen.compact
    def __call__(self, points: Array, depth: Array, train: bool = False):
        B, N, _ = points.shape
        V = depth.shape[1]
        img = depth.reshape(B * V, depth.shape[2], depth.shape[3], 1)
        f_v = ImageTrunk(feat_size=16, name="img_trunk")(img, train=train)
        f_v = f_v.reshape(B, V, -1)
        f_p = SpectralFeatureExtractor(name="point_fe")(points, train=train)

        d = self.view_distance
        view_point = jnp.asarray(
            [[0.0, 0.0, -d], [-d, 0.0, 0.0], [0.0, d, 0.0]], jnp.float32
        )
        view_point = jnp.broadcast_to(view_point[None], (B, 3, 3))
        view_feature = MLPConv((64, 256), name="posmlp")(view_point)

        fused = jnp.concatenate(
            [f_v, jnp.broadcast_to(f_p, (B, V, f_p.shape[-1]))], axis=-1
        )
        f_v_ = SelfAttentionBlock(384, 256, name="viewattn")(fused, pos=view_feature)
        f_v_ = jnp.max(f_v_, axis=1, keepdims=True)
        f_g = jnp.concatenate([f_p, f_v_], axis=-1)

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


class GeoSpecNet(linen.Module):
    """Full GeoSpecNet generator (models/GeoSpecNet.py:203-232)."""

    step1: int = 4
    step2: int = 8
    merge_points: int = 512
    local_points: int = 512
    view_distance: float = 0.7
    sdg_decoder: bool = True

    @linen.compact
    def __call__(self, partial: Array, depth: Array, train: bool = False):
        feat_g, coarse = SVFNetGS(self.view_distance, name="encoder")(
            partial, depth, train=train
        )
        local_feat = LocalEncoder(self.local_points, name="localencoder")(
            partial, train=train
        )
        merged = jnp.concatenate([partial, coarse], axis=1)
        idx = furthest_point_sample(merged, self.merge_points)
        coarse_merge = gather_points(merged, idx)
        fine1 = SDG(
            self.step1, hidden_dim=768, sdg_decoder=self.sdg_decoder, name="refine1"
        )(local_feat, coarse_merge, feat_g, partial, train=train)
        fine2 = SDG(
            self.step2, hidden_dim=512, sdg_decoder=self.sdg_decoder, name="refine2"
        )(local_feat, fine1, feat_g, partial, train=train)
        return coarse, fine1, fine2


class SimplePointDiscriminator(linen.Module):
    """Lightweight point-set discriminator for the optional adversarial
    ShapeNet-55 training (core/train_55.py:21-46): shared MLP with
    LeakyReLU(0.2) (no norm), max-pool aggregate, 2-layer head.

    pcd (B, N, 3) -> logits (B, 1) (the reference head keeps the trailing
    singleton; BCE-with-logits broadcasts over it).
    """

    hidden: int = 128

    @linen.compact
    def __call__(self, pcd: Array) -> Array:
        x = pcd
        for i, act in ((0, True), (1, True), (2, False)):
            x = linen.Dense(self.hidden, name=f"mlp{i}")(x)
            if act:
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
        g = jnp.max(x, axis=1)  # (B, hidden)
        g = jax.nn.leaky_relu(
            linen.Dense(self.hidden, name="head0")(g), negative_slope=0.2
        )
        return linen.Dense(1, name="head1")(g)


class PointDiscriminator(linen.Module):
    """PointNet-stem discriminator (models/GeoSpecNet.py:235-257).

    pcd (B, N, 3) -> logits (B,).
    """

    feat_size: int = 256

    @linen.compact
    def __call__(self, pcd: Array, train: bool = False) -> Array:
        x = pcd
        for i, f in enumerate((64, 128, self.feat_size)):
            x = linen.Dense(f, name=f"stem{i}")(x)
            x = BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        x = jnp.max(x, axis=1)  # (B, feat)
        x = jax.nn.relu(linen.Dense(self.feat_size // 2, name="head0")(x))
        return linen.Dense(1, name="head1")(x)[:, 0]
