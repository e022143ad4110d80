"""Online partial synthesis by directional cropping (ShapeNet-55 track).

Fixed-shape TPU reformulation of utils/helpers.py:62-123
(``seprate_point_cloud``): instead of the reference's per-sample Python loop
with dynamic slice sizes, we sort once by distance-to-direction, cyclically
shift so the kept block starts at index 0 (preserving the reference's
ascending order and FPS seed point), zero out the cropped block, and rely on
the FPS origin-skip quirk (sampling_gpu.cu:100-101 — faithfully implemented
in ops.fps) to make the zeroed padding unselectable. One batched jittable
computation, vmapped over per-sample crop sizes and directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.ops import fps_subsample

Array = jax.Array

# The 8 fixed corner viewpoints used by ShapeNet-55 eval
# (core/test_55.py:51-53). Deliberately unnormalized, as in the reference.
FIXED_CORNERS = np.asarray(
    [
        [1, 1, 1],
        [1, 1, -1],
        [1, -1, 1],
        [-1, 1, 1],
        [-1, -1, 1],
        [-1, 1, -1],
        [1, -1, -1],
        [-1, -1, -1],
    ],
    np.float32,
)


def _sorted_by_direction(gt: Array, direction: Array) -> Array:
    """Points sorted by ascending distance to ``direction`` (B, N, 3)."""
    d = jnp.linalg.norm(direction[:, None, :] - gt, axis=-1)  # (B, N)
    order = jnp.argsort(d, axis=-1)
    return jnp.take_along_axis(gt, order[..., None], axis=1)


@functools.partial(jax.jit, static_argnums=(2,))
def crop_fixed(gt: Array, direction: Array, num_crop: int):
    """Static-size crop (eval path, core/test_55.py:71-74).

    Args:
        gt: (B, N, 3)
        direction: (B, 3) crop viewpoint.
        num_crop: number of nearest points to remove (static).
    Returns:
        partial: (B, N - num_crop, 3) kept points, ascending distance order
            starting at the (num_crop)-th closest — the reference's layout.
        crop: (B, num_crop, 3).
    """
    s = _sorted_by_direction(gt, direction)
    return s[:, num_crop:], s[:, :num_crop]


@functools.partial(jax.jit, static_argnums=(3,))
def crop_random_resampled(
    gt: Array, direction: Array, num_crop: Array, n_out: int = 2048
):
    """Per-sample random crop size + FPS resample (train path,
    core/train_55.py:150 with crop=[N/4, 3N/4]).

    Args:
        gt: (B, N, 3)
        direction: (B, 3) per-sample random unit directions (host RNG).
        num_crop: (B,) int32 per-sample crop sizes.
        n_out: output size of the FPS resample (2048 in the reference).
    Returns:
        (partial, crop): both (B, n_out, 3), FPS-subsampled like
        helpers.py:114-115.
    """
    B, N, _ = gt.shape
    s = _sorted_by_direction(gt, direction)
    ranks = jnp.arange(N, dtype=jnp.int32)[None, :]

    def masked_fps(points, start, count):
        # Cyclic shift so the block [start, start+count) lands at index 0 —
        # FPS's unconditional idxs[0]=0 then seeds at the same point the
        # reference's fps_subsample(input_data) does.
        shift = jnp.mod(ranks + start[:, None], N)
        block = jnp.take_along_axis(points, shift[..., None], axis=1)
        keep = ranks < count[:, None]
        block = jnp.where(keep[..., None], block, 0.0)  # origin = FPS-skipped
        return fps_subsample(block, n_out)

    partial = masked_fps(s, num_crop, N - num_crop)
    crop = masked_fps(s, jnp.zeros_like(num_crop), num_crop)
    return partial, crop


def random_crop_params(
    rng: np.random.RandomState, batch: int, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side draw of per-sample crop sizes + unit directions
    (helpers.py:80-88 semantics: randint in [N/4, 3N/4], gaussian direction
    normalized to the unit sphere)."""
    num_crop = rng.randint(n // 4, 3 * n // 4 + 1, size=(batch,)).astype(np.int32)
    d = rng.randn(batch, 3).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    return num_crop, d
