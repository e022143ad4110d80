"""Neural building blocks and model families (flax.linen, channels-last).

All modules operate on ``(B, N, C)`` tensors — features on the last axis map
onto TPU lanes, so every 1x1 "conv" is a Dense matmul on the MXU and XLA can
fuse the elementwise tails. The reference's channel-first Conv1d/Conv2d
stacks become Dense stacks; its ``nn.MultiheadAttention`` becomes an
explicit pre-LN multi-head attention with the same q/k/v/positional wiring.
"""

from svdformer_pointsea_tpu.nn.layers import (
    MLPConv,
    MLPRes,
    SharedMLP,
    MultiheadAttention,
    SelfAttentionBlock,
    CrossAttentionBlock,
    SDGDecoder,
    EdgeConv,
    PCSA,
    SinusoidalPositionalEmbedding,
    set_flash_attention,
    PointNetSAModuleKNN,
    PointNetSAModule,
    PointNetSAModuleMSG,
    PointNetFPModule,
    PointNetFeatureExtractor,
)
from svdformer_pointsea_tpu.nn.precision import (
    mixed_precision_enabled,
    set_mixed_precision,
)
from svdformer_pointsea_tpu.nn.resnet import ImageTrunk, ResNet18, set_trunk_bf16, set_trunk_s2d
from svdformer_pointsea_tpu.nn.svdformer import SVDFormer
from svdformer_pointsea_tpu.nn.geospecnet import (
    GeoSpecNet,
    PointDiscriminator,
    SimplePointDiscriminator,
)
from svdformer_pointsea_tpu.nn.pointsea import PointSea

__all__ = [
    "MLPConv",
    "MLPRes",
    "SharedMLP",
    "MultiheadAttention",
    "SelfAttentionBlock",
    "CrossAttentionBlock",
    "SDGDecoder",
    "EdgeConv",
    "PCSA",
    "SinusoidalPositionalEmbedding",
    "PointNetSAModuleKNN",
    "PointNetSAModule",
    "PointNetSAModuleMSG",
    "PointNetFPModule",
    "PointNetFeatureExtractor",
    "set_trunk_bf16",
    "set_trunk_s2d",
    "set_mixed_precision",
    "mixed_precision_enabled",
    "ImageTrunk",
    "ResNet18",
    "SVDFormer",
    "GeoSpecNet",
    "PointDiscriminator",
    "SimplePointDiscriminator",
    "PointSea",
]
