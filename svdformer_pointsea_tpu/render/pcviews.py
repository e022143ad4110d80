"""Scatter-based multi-view depth rasterizer (SVDFormer's ``PCViews``).

Re-implements the math of models/model_utils.py:1004-1234 as a single fused
XLA computation: rotate + perspective-project all views at once, then
scatter-add depth-weighted contributions into per-view pixel buffers.
Weighted-average semantics, the ``value >= 0`` depth mask, the
round-half-up pixel snap (``ceil(x - 0.5)``) and the modulo wrap before
scatter are all preserved exactly.

The renderer sits outside the model (core/train_pcn.py:108) and never
receives gradients (depth images are treated as data), so everything here is
forward-only and jit-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def euler2mat(angles: np.ndarray) -> np.ndarray:
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    Same convention as models/model_utils.py:952-1001 (R = Rx @ Ry @ Rz).
    Static numpy — view rotations are constants.
    """
    angles = np.asarray(angles, np.float32)
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    cz, sz = np.cos(z), np.sin(z)
    cy, sy = np.cos(y), np.sin(y)
    cx, sx = np.cos(x), np.sin(x)
    one, zero = np.ones_like(x), np.zeros_like(x)

    zmat = np.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], -1
    ).reshape(angles.shape[:-1] + (3, 3))
    ymat = np.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], -1
    ).reshape(angles.shape[:-1] + (3, 3))
    xmat = np.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], -1
    ).reshape(angles.shape[:-1] + (3, 3))
    return xmat @ ymat @ zmat


def _distribute_and_average(
    depth: Array,
    _x: Array,
    _y: Array,
    size_x: int,
    size_y: int,
    image_height: int,
    image_width: int,
) -> Array:
    """Weighted scatter of per-point depth into pixel grids.

    depth/_x/_y: (B, P) — continuous pixel coordinates and depths.
    Returns (B, H, W) recovered depth (weighted average, zero-weight -> 0/1).
    Port of ``distribute`` (model_utils.py:1004-1077): weight = mask/(z+eps),
    value*weight scatter-added, division by (weight_sum or 1).
    """
    assert size_x % 2 == 0 or size_x == 1
    assert size_y % 2 == 0 or size_y == 1
    B = depth.shape[0]
    eps = 1e-12
    _i = np.linspace(-size_x / 2, (size_x / 2) - 1, size_x, dtype=np.float32)
    _j = np.linspace(-size_y / 2, (size_y / 2) - 1, size_y, dtype=np.float32)

    ex = jnp.ceil(_x[:, :, None, None] + _i[None, None, :, None])  # (B,P,sx,sy)
    ey = jnp.ceil(_y[:, :, None, None] + _j[None, None, None, :])
    value = jnp.broadcast_to(depth[:, :, None, None], ex.shape)

    mask = (
        (ex >= 0)
        & (ex <= image_height - 1)
        & (ey >= 0)
        & (ey <= image_width - 1)
        & (value >= 0)
    )
    ex = jnp.mod(ex, image_height)
    ey = jnp.mod(ey, image_width)

    weight = mask.astype(jnp.float32) / (value + eps)
    weighted_value = value * weight

    coords = (ex * image_width + ey).astype(jnp.int32).reshape(B, -1)
    weight = weight.reshape(B, -1)
    weighted_value = weighted_value.reshape(B, -1)

    size = image_height * image_width
    # Flattened single-axis scatter: the batched (bidx, coords) form lowers
    # to a much slower per-row scatter (see ops/grouping.py:index_points).
    flat_coords = (
        coords + (jnp.arange(B, dtype=jnp.int32) * size)[:, None]
    ).reshape(-1)
    weight_scattered = (
        jnp.zeros((B * size,), jnp.float32)
        .at[flat_coords]
        .add(weight.reshape(-1))
        .reshape(B, size)
    )
    value_scattered = (
        jnp.zeros((B * size,), jnp.float32)
        .at[flat_coords]
        .add(weighted_value.reshape(-1))
        .reshape(B, size)
    )
    weight_scattered = jnp.where(weight_scattered == 0.0, 1.0, weight_scattered)
    return (value_scattered / weight_scattered).reshape(B, image_height, image_width)


def points2depth(
    points: Array,
    image_height: int,
    image_width: int,
    size_x: int = 4,
    size_y: int = 4,
) -> Array:
    """Perspective-project + rasterize (model_utils.py:1080-1115).

    points: (B, P, 3) camera-frame points -> (B, H, W) depth image.
    """
    eps = 1e-12
    z = points[:, :, 2]
    coord_x = (points[:, :, 0] / (z + eps)) * (image_width / image_height)
    coord_y = points[:, :, 1] / (z + eps)
    _x = (coord_x + 1) * image_height / 2
    _y = (coord_y + 1) * image_width / 2
    return _distribute_and_average(
        z, _x, _y, size_x, size_y, image_height, image_width
    )


class PCViews:
    """Three fixed self-views of a point cloud as depth images.

    Matches models/model_utils.py:1179-1234: three canonical viewpoints at
    distance ``-trans`` along z, 1x1 splat.

    Usage::

        render = PCViews(trans=-0.7, resolution=224)
        depth = render.get_img(points)   # (B, V=3, H, W)
    """

    _VIEW_ANGLES = np.asarray(
        [
            [0 * np.pi / 2, 0, np.pi / 2],
            [1 * np.pi / 2, 0, np.pi / 2],
            [0, -np.pi / 2, np.pi / 2],
        ],
        np.float32,
    )

    def __init__(self, trans: float, resolution: int = 224):
        self.num_views = 3
        self.resolution = resolution
        # rot stored pre-transposed so that projection is points @ rot.
        self.rot = np.transpose(euler2mat(self._VIEW_ANGLES), (0, 2, 1))
        self.translation = np.asarray(
            [[0.0, 0.0, trans]] * 3, np.float32
        ).reshape(3, 1, 3)
        # ``render`` is the pure function — safe to call inside another
        # jitted computation (the fused train/eval steps do); ``get_img``
        # is the host-facing jitted dispatch of the same function.
        self.render = functools.partial(
            _pcviews_render,
            rot=jnp.asarray(self.rot),
            translation=jnp.asarray(self.translation),
            resolution=resolution,
        )
        self._get_img = jax.jit(self.render)

    def get_img(self, points: Array) -> Array:
        """points (B, P, 3) -> depth images (B, 3, H, W)."""
        return self._get_img(points)


def _pcviews_render(points, *, rot, translation, resolution):
    B = points.shape[0]
    V = rot.shape[0]
    # (B, V, P, 3): all views in one einsum, then camera translation.
    proj = jnp.einsum("bpc,vcd->bvpd", points, rot) - translation[None]
    flat = proj.reshape(B * V, -1, 3)
    img = points2depth(flat, resolution, resolution, size_x=1, size_y=1)
    return img.reshape(B, V, resolution, resolution)
