"""ResNet-18 trunks (flax.linen, NHWC).

Two variants, mirroring the reference's two image encoders:

- ``ImageTrunk``: SVDFormer's tiny depth-image encoder
  (models/SVDFormer.py:112-147 + models/resnet.py with feature_size=16):
  a stride-1 3x3 stem conv (1 -> feat_size) + BN + ReLU, then ResNet layers
  1-4 (the 7x7 stem and maxpool are *dropped*, so layer1 runs at full
  224x224 resolution), global average pool, squeeze -> (B, feat_size*8).

- ``ResNet18``: the standard torchvision ResNet-18 trunk used by PointSea's
  ``ResEncoder`` (models_PointSea/PointSea.py:37-61): 7x7/2 stem + maxpool +
  layers 1-4, returning the (B, H/32, W/32, 512) feature map. Weights can be
  seeded from torchvision's pretrained checkpoint via the converter in
  ``train/checkpoint.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as linen
import jax
import jax.numpy as jnp

Array = jax.Array

# torch BatchNorm momentum 0.1 == flax EMA decay 0.9 (see nn/layers.py).
BatchNorm = functools.partial(linen.BatchNorm, momentum=0.9)

# Optional bf16 compute for the image trunks at eval time (params stay f32;
# output cast back to f32), worth ~3 ms/it at bs32 on v5e. Default OFF:
# measured on TPU, bf16 trunk features shift the completion by CD-L2
# ~2.2e-3 (the global feature conditions every generated coordinate) —
# far outside the metric-parity budget. Serving deployments that tolerate
# it can flip set_trunk_bf16(True).
_TRUNK_BF16 = False


def set_trunk_bf16(enabled: bool) -> None:
    """Trace-time switch for bf16 eval-mode compute in the image trunks.

    Must be called BEFORE the first trace of any function using the trunks:
    jit caches key on function identity, not on this flag, so flipping it
    later silently leaves already-compiled executables at the old precision
    (same caveat as ``nn.set_flash_attention``). Clear caches (``.clear_cache()``
    or a fresh process) to change it mid-session.
    """
    global _TRUNK_BF16
    _TRUNK_BF16 = enabled


def _trunk_dtype(train: bool):
    from svdformer_pointsea_tpu.nn.precision import mixed_precision_enabled

    # Training throughput mode (nn/precision.py): the 16-channel 224^2
    # trunk convs are the single largest fwd+bwd block after SDG2 and run
    # 2x faster in bf16 (62 -> 31 ms at B12). Applies in both train and
    # eval traces while the switch is on (the in-training validation then
    # also runs a bf16 trunk — documented in precision.py).
    if mixed_precision_enabled():
        return jnp.bfloat16
    if _TRUNK_BF16 and not train and jax.default_backend() == "tpu":
        return jnp.bfloat16
    return None


class BasicBlock(linen.Module):
    """ResNet v1 basic block, NHWC."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        out = linen.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn1"
        )(out)
        out = jax.nn.relu(out)
        out = linen.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        # zero_init_residual: bn2 scale starts at 0 so each block starts as
        # the identity (models/SVDFormer.py:129, resnet.py:170-175).
        out = BatchNorm(
            use_running_average=not train, scale_init=linen.initializers.zeros,
            dtype=self.dtype, name="bn2",
        )(out)
        if self.downsample:
            identity = linen.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(x)
            identity = BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="down_bn"
            )(identity)
        return jax.nn.relu(out + identity)


class _Layer(linen.Module):
    planes: int
    blocks: int
    stride: int
    in_planes: int
    dtype: Any = None

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        need_down = self.stride != 1 or self.in_planes != self.planes
        x = BasicBlock(
            self.planes, self.stride, downsample=need_down,
            dtype=self.dtype, name="block0",
        )(x, train=train)
        for i in range(1, self.blocks):
            x = BasicBlock(
                self.planes, 1, dtype=self.dtype, name=f"block{i}"
            )(x, train=train)
        return x


class ImageTrunk(linen.Module):
    """SVDFormer depth-image encoder: (B, H, W, 1) -> (B, feat_size*8)."""

    feat_size: int = 16
    layers: Sequence[int] = (2, 2, 2, 2)

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        fs = self.feat_size
        dtype = _trunk_dtype(train)
        x = linen.Conv(
            fs, (3, 3), padding=1, use_bias=False, dtype=dtype, name="stem_conv"
        )(x)
        x = BatchNorm(
            use_running_average=not train, dtype=dtype, name="stem_bn"
        )(x)
        x = jax.nn.relu(x)
        in_planes = fs
        for i, (mult, stride) in enumerate(zip((1, 2, 4, 8), (1, 2, 2, 2))):
            x = _Layer(
                fs * mult, self.layers[i], stride, in_planes,
                dtype=dtype, name=f"layer{i + 1}",
            )(x, train=train)
            in_planes = fs * mult
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # avg pool + squeeze
        return x


class ResNet18(linen.Module):
    """Standard ResNet-18 trunk: (B, H, W, 3) -> (B, H/32, W/32, 512)."""

    layers: Sequence[int] = (2, 2, 2, 2)

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dtype = _trunk_dtype(train)
        x = linen.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=dtype, name="conv1",
        )(x)
        x = BatchNorm(use_running_average=not train, dtype=dtype, name="bn1")(x)
        x = jax.nn.relu(x)
        x = linen.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_planes = 64
        for i, (planes, stride) in enumerate(
            zip((64, 128, 256, 512), (1, 2, 2, 2))
        ):
            x = _Layer(
                planes, self.layers[i], stride, in_planes,
                dtype=dtype, name=f"layer{i + 1}",
            )(x, train=train)
            in_planes = planes
        return x.astype(jnp.float32)
