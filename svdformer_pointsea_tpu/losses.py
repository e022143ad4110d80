"""Training losses and evaluation metric calculators.

Port of utils/loss_utils.py semantics:
- ``get_loss``: coarse/fine1/fine2 chamfer pyramid against FPS-subsampled
  ground truths (:33-58). ``sqrt=True`` (PCN) averages sqrt distances
  (CD-L1-style); ``sqrt=False`` (ShapeNet-55) averages squared distances.
- ``get_loss_pm``: adds the single-side partial-matching term (:60-85).
- ``calc_cd``: evaluation CD — note the reference's argument order quirk,
  ``cham_loss(gt, output)`` (:101), is preserved.
- ``calc_dcd``: density-aware CD (in ops.metrics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svdformer_pointsea_tpu.ops import (
    chamfer_distance,
    density_aware_chamfer,
    fps_subsample,
    fscore,
)

Array = jax.Array

# sqrt of exact zeros (coincident points) has an infinite derivative; the
# reference relies on CUDA chamfer never returning exact zeros between
# prediction and target. A tiny floor keeps gradients finite without
# measurably changing the loss (1e-12 << typical 1e-4 squared distances).
_SQRT_EPS = 1e-12


def _batch_mean(d: Array, weights: Array | None, axis_name: str | None = None) -> Array:
    """Mean over (B, N) distances; with ``weights`` (B,), a weighted mean of
    per-sample means — pad rows (weight 0) contribute nothing to the LOSS,
    real rows get the unpadded batch-mean semantics. The same weights are
    scoped into BatchNorm by the trainers (``bn_row_weights``,
    train/state.py:142-148), so pad rows are excluded from the BN batch
    moments too — see parallel/mesh.py::pad_batch.

    ``axis_name``: inside ``shard_map`` over a device mesh, psum the
    numerator and denominator over that axis so the result is the GLOBAL
    batch mean (a per-shard weight sum can legitimately be zero when a
    shard is all pad rows — the global denominator never is)."""
    if weights is None:
        num = jnp.sum(jnp.mean(d, axis=1))
        den = jnp.asarray(d.shape[0], d.dtype)
    else:
        per = jnp.mean(d, axis=1)
        num = jnp.sum(per * weights)
        den = jnp.sum(weights)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / den


def chamfer(p1: Array, p2: Array, weights: Array | None = None,
            axis_name: str | None = None) -> Array:
    """mean(d1) + mean(d2) over squared distances (CD-L2-style sum)."""
    d1, d2, _, _ = chamfer_distance(p1, p2)
    return _batch_mean(d1, weights, axis_name) + _batch_mean(d2, weights, axis_name)


def chamfer_sqrt(p1: Array, p2: Array, weights: Array | None = None,
                 axis_name: str | None = None) -> Array:
    """(mean(sqrt d1) + mean(sqrt d2)) / 2 (CD-L1-style)."""
    d1, d2, _, _ = chamfer_distance(p1, p2)
    return (
        _batch_mean(jnp.sqrt(d1 + _SQRT_EPS), weights, axis_name)
        + _batch_mean(jnp.sqrt(d2 + _SQRT_EPS), weights, axis_name)
    ) / 2


def chamfer_single_side(p1: Array, p2: Array, weights: Array | None = None,
                        axis_name: str | None = None) -> Array:
    d1, _, _, _ = chamfer_distance(p1, p2)
    return _batch_mean(d1, weights, axis_name)


def chamfer_single_side_sqrt(p1: Array, p2: Array, weights: Array | None = None,
                             axis_name: str | None = None) -> Array:
    d1, _, _, _ = chamfer_distance(p1, p2)
    return _batch_mean(jnp.sqrt(d1 + _SQRT_EPS), weights, axis_name)


def get_loss(pcds_pred, gt: Array, sqrt: bool = True, alpha1: float = 1.0, alpha2: float = 1.0,
             weights: Array | None = None, axis_name: str | None = None):
    """Pyramid chamfer loss (utils/loss_utils.py:33-58).

    Args:
        pcds_pred: (Pc, P1, P2) predicted clouds, channels-last.
        gt: (B, M, 3) complete cloud.
        weights: optional (B,) row weights — pad rows (0.0) are masked out.
        axis_name: mesh axis to psum the batch reductions over when called
            per-shard inside ``shard_map`` (train/state.py).
    Returns:
        (loss_total, [cdc, cd1, cd2])
    """
    cd = chamfer_sqrt if sqrt else chamfer
    pc, p1, p2 = pcds_pred
    gt_1 = fps_subsample(gt, p1.shape[1])
    gt_c = fps_subsample(gt_1, pc.shape[1])
    cdc = cd(pc, gt_c, weights, axis_name)
    cd1 = cd(p1, gt_1, weights, axis_name)
    cd2 = cd(p2, gt, weights, axis_name)
    return cdc + alpha1 * cd1 + alpha2 * cd2, [cdc, cd1, cd2]


def get_loss_pm(pcds_pred, partial: Array, gt: Array, sqrt: bool = True,
                weights: Array | None = None, axis_name: str | None = None):
    """Pyramid loss + partial matching term (utils/loss_utils.py:60-85)."""
    cd = chamfer_sqrt if sqrt else chamfer
    pm = chamfer_single_side_sqrt if sqrt else chamfer_single_side
    pc, p1, p2 = pcds_pred
    gt_1 = fps_subsample(gt, p1.shape[1])
    gt_c = fps_subsample(gt_1, pc.shape[1])
    cdc = cd(pc, gt_c, weights, axis_name)
    cd1 = cd(p1, gt_1, weights, axis_name)
    cd2 = cd(p2, gt, weights, axis_name)
    partial_matching = pm(partial, p2, weights, axis_name)
    return cdc + cd1 + cd2 + partial_matching, [cdc, cd1, cd2]


def calc_cd(output: Array, gt: Array, calc_f1: bool = False):
    """Per-sample CD metrics (utils/loss_utils.py:98-115).

    Returns [cd_p (CD-L1-style), cd_t (CD-L2-style sum)] (+ f1).
    """
    dist1, dist2, _, _ = chamfer_distance(gt, output)  # reference arg order
    cd_p = (jnp.sqrt(dist1).mean(axis=1) + jnp.sqrt(dist2).mean(axis=1)) / 2
    cd_t = dist1.mean(axis=1) + dist2.mean(axis=1)
    res = [cd_p, cd_t]
    if calc_f1:
        f1, _, _ = fscore(dist1, dist2)
        res.append(f1)
    return res


def calc_dcd(x: Array, gt: Array, alpha: float = 1000.0, n_lambda: float = 1.0):
    """Density-aware CD (utils/loss_utils.py:117-155): (dcd, cd_p, cd_t)."""
    return density_aware_chamfer(x, gt, alpha=alpha, n_lambda=n_lambda)
