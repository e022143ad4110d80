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

# torch BatchNorm momentum 0.1 == flax EMA decay 0.9; shares nn/layers.py's
# factory so the shard_map DP moment-sync switch covers the trunks too.
from svdformer_pointsea_tpu.nn.layers import BatchNorm, bn_axis_name

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


# ---------------------------------------------------------------------------
# Exact space-to-depth execution of the 16-channel full-resolution stage.
#
# ImageTrunk's reference-quirk stride-1 stem keeps the stem conv + layer1 at
# 224^2 with only 16 channels: 16 of the TPU's 128 lanes do work on every
# conv/BN op there, and the stage costs 61 ms of the 218 ms f32 train step
# (docs/STATUS.md breakdown). Packing 2x2 pixel phases into channels
# (224^2 x 16ch -> 112^2 x 64ch) fills half the lanes; each 3x3 conv becomes
# a 3x3 "block conv" over packed channels whose kernel is a static,
# differentiable rearrangement (with structural zeros) of the ORIGINAL
# (3,3,ci,co) parameter — parameter trees, checkpoints and the converter are
# untouched, and BatchNorm runs on a (..., 4, C) view so its statistics
# aggregate the phases per original channel exactly like the unpacked op.
# Numerics differ from the unpacked path only by f32 reduction order
# (tests/test_resnet_convert.py::test_trunk_s2d_matches_unpacked).
#
# The packing pays +78% conv FLOPs to fill the lanes. In TRAIN mode that
# buys back the BN-stats HBM passes (fwd+bwd 61.3 -> 51.1 ms at B12); in
# EVAL mode BN is a fused affine, so the extra FLOPs are a pure loss
# (measured at bs40 inference: 143.1 -> 157.0 ms/call, -9% throughput,
# tools/s2d_eval_probe.py). Default "train": packed in train-mode traces
# only. Trace-time switch like set_trunk_bf16.
_TRUNK_S2D: Any = "train"


def set_trunk_s2d(enabled) -> None:
    """Trace-time switch for the packed space-to-depth ImageTrunk stage:
    ``"train"`` (default; packed in train-mode traces only), ``True``
    (packed in eval too — slower on chip, used by the equivalence tests),
    or ``False`` (same before-first-trace caveat as ``set_trunk_bf16``)."""
    global _TRUNK_S2D
    _TRUNK_S2D = enabled


def _s2d_active(train: bool) -> bool:
    return _TRUNK_S2D is True or (_TRUNK_S2D == "train" and train)


def _pack_s2d(x: Array) -> Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C); packed channel = (dy*2+dx)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _unpack_s2d(x: Array) -> Array:
    """Inverse of :func:`_pack_s2d`."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, 2 * H, 2 * W, C)


@functools.lru_cache(maxsize=None)
def _s2d_kernel_taps():
    """Static tap map for packing a stride-1 SAME 3x3 conv kernel.

    For output phase (py, px) and original tap (u, v), the input pixel
    (2a+py+u-1, 2b+px+v-1) lives in block (a+bu, b+bv) at phase (dy, dx):
    returns [(bu+1, bv+1, in_phase, out_phase, u, v), ...] (36 entries).
    """
    taps = []
    for py in range(2):
        for px in range(2):
            for u in range(3):
                for v in range(3):
                    iy, ix = py + u - 1, px + v - 1
                    bu, dy = (iy + 2) // 2 - 1, (iy + 2) % 2
                    bv, dx = (ix + 2) // 2 - 1, (ix + 2) % 2
                    taps.append(
                        (bu + 1, bv + 1, dy * 2 + dx, py * 2 + px, u, v)
                    )
    return tuple(taps)


def _pack_kernel(k: Array) -> Array:
    """(3, 3, ci, co) -> (3, 3, 4ci, 4co) block-conv kernel (differentiable:
    the VJP of the scatter is the corresponding gather)."""
    ci, co = k.shape[2], k.shape[3]
    kp = jnp.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    for tu, tv, pin, pout, u, v in _s2d_kernel_taps():
        kp = kp.at[tu, tv, pin * ci : (pin + 1) * ci, pout * co : (pout + 1) * co].set(
            k[u, v]
        )
    return kp


class PackedConv3x3(linen.Module):
    """Stride-1 SAME 3x3 conv executed in packed space-to-depth space.

    Declares the SAME ``kernel`` parameter (name, shape, init) as the
    ``linen.Conv`` it replaces, so checkpoints and the torch converter are
    oblivious to the packed execution."""

    features: int  # original out channels
    in_features: int  # original in channels
    dtype: Any = None

    @linen.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel",
            linen.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        kp = _pack_kernel(kernel)
        if self.dtype is not None:
            x, kp = x.astype(self.dtype), kp.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, kp, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PackedBatchNorm(linen.Module):
    """BatchNorm over the packed (B, H, W, 4C) tensor with statistics per
    ORIGINAL channel.

    A first cut reshaped to the (B, H, W, 4, C) phase-split view and ran
    ``linen.BatchNorm`` on it — correct, but every elementwise pass then ran
    at C=16 lanes again, keeping exactly the inefficiency the packing exists
    to remove (measured: the packed trunk only reached 51 ms fwd+bwd vs the
    61 ms unpacked). Instead, per-phase moments are computed at 4C lanes and
    combined exactly (mean of phase means; var via pooled E[x^2] - mean^2 —
    the same ``use_fast_variance`` formula flax uses), so the aggregation
    covers exactly the same elements as the unpacked op and every
    full-tensor pass stays at 4C lanes. Parameter/stat shapes match
    ``linen.BatchNorm(C)``: checkpoints and the converter are oblivious."""

    features: int  # original channel count C
    use_running_average: bool
    momentum: float = 0.9  # torch BN momentum 0.1 == EMA decay 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    scale_init: Any = linen.initializers.ones

    @linen.compact
    def __call__(self, x: Array) -> Array:
        C = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", linen.initializers.zeros, (C,), jnp.float32)
        if self.use_running_average:
            mean_c, var_c = ra_mean.value, ra_var.value
        else:
            from svdformer_pointsea_tpu.nn.layers import _BN_ROW_WEIGHTS

            xf = x.astype(jnp.float32)
            axis = bn_axis_name()
            w = _BN_ROW_WEIGHTS
            if w is not None:
                # Pad-row exclusion (see nn/layers.py _WeightedBatchNorm):
                # weighted per-phase sums; k = views-per-sample fold of the
                # batch-major trunk batch (B*3 rows per B weights).
                k, rem = divmod(x.shape[0], w.shape[0])
                assert rem == 0, (x.shape, w.shape)
                wf = jnp.repeat(w.astype(jnp.float32), k)
                wb = wf.reshape((-1, 1, 1, 1))
                s0 = jnp.sum(wf) * jnp.float32(x.shape[1] * x.shape[2])
                s1 = jnp.sum(wb * xf, axis=(0, 1, 2))  # (4C,)
                s2 = jnp.sum(wb * jnp.square(xf), axis=(0, 1, 2))
                if axis is not None:
                    s0, s1, s2 = (
                        jax.lax.psum(s, axis) for s in (s0, s1, s2)
                    )
                mean4, e2_4 = s1 / s0, s2 / s0
            else:
                mean4 = jnp.mean(xf, axis=(0, 1, 2))  # (4C,)
                e2_4 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                if axis is not None:
                    # shard_map DP: equal-size shards, so pmean of per-shard
                    # moments is the exact global moment (nn/layers.py
                    # switch).
                    mean4 = jax.lax.pmean(mean4, axis)
                    e2_4 = jax.lax.pmean(e2_4, axis)
            mean_c = jnp.mean(mean4.reshape(4, C), axis=0)
            var_c = jnp.mean(e2_4.reshape(4, C), axis=0) - jnp.square(mean_c)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean_c
                ra_var.value = m * ra_var.value + (1.0 - m) * var_c
        mul = jax.lax.rsqrt(var_c + self.epsilon) * scale
        shift = bias - mean_c * mul
        dt = self.dtype if self.dtype is not None else x.dtype
        mul4 = jnp.tile(mul, 4).astype(dt)
        shift4 = jnp.tile(shift, 4).astype(dt)
        return (x.astype(dt) * mul4 + shift4).astype(x.dtype)


class PackedBasicBlock(linen.Module):
    """BasicBlock executed in packed space (stride 1, no downsample — the
    only shape layer1 of ImageTrunk ever takes). Same child names/param
    shapes as :class:`BasicBlock`."""

    planes: int
    dtype: Any = None

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        out = PackedConv3x3(
            self.planes, self.planes, dtype=self.dtype, name="conv1"
        )(x)
        out = PackedBatchNorm(
            self.planes, use_running_average=not train, dtype=self.dtype,
            name="bn1",
        )(out)
        out = jax.nn.relu(out)
        out = PackedConv3x3(
            self.planes, self.planes, dtype=self.dtype, name="conv2"
        )(out)
        out = PackedBatchNorm(
            self.planes,
            use_running_average=not train,
            scale_init=linen.initializers.zeros,
            dtype=self.dtype,
            name="bn2",
        )(out)
        return jax.nn.relu(out + identity)


class _PackedLayer(linen.Module):
    planes: int
    blocks: int
    dtype: Any = None

    @linen.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i in range(self.blocks):
            x = PackedBasicBlock(
                self.planes, dtype=self.dtype, name=f"block{i}"
            )(x, train=train)
        return x


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
        # Exact space-to-depth execution of the full-resolution stage (stem
        # conv + layer1 — both stride 1 at H x W with only fs channels);
        # see the module comment above _TRUNK_S2D. Identical parameter
        # tree; unpacked before layer2's strided conv.
        s2d = _s2d_active(train) and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if s2d:
            xp = _pack_s2d(x)
            xp = PackedConv3x3(
                fs, x.shape[-1], dtype=dtype, name="stem_conv"
            )(xp)
            xp = PackedBatchNorm(
                fs, use_running_average=not train, dtype=dtype, name="stem_bn"
            )(xp)
            xp = jax.nn.relu(xp)
            xp = _PackedLayer(fs, self.layers[0], dtype=dtype, name="layer1")(
                xp, train=train
            )
            x = _unpack_s2d(xp)
        else:
            x = linen.Conv(
                fs, (3, 3), padding=1, use_bias=False, dtype=dtype, name="stem_conv"
            )(x)
            x = BatchNorm(
                use_running_average=not train, dtype=dtype, name="stem_bn"
            )(x)
            x = jax.nn.relu(x)
            x = _Layer(
                fs, self.layers[0], 1, fs, dtype=dtype, name="layer1"
            )(x, train=train)
        in_planes = fs
        for i, (mult, stride) in enumerate(zip((2, 4, 8), (2, 2, 2))):
            x = _Layer(
                fs * mult, self.layers[i + 1], stride, in_planes,
                dtype=dtype, name=f"layer{i + 2}",
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
