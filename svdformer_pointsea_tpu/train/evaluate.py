"""Evaluation loops: PCN per-category eval and ShapeNet-55 crop-mode eval.

TPU-native re-design of core/test_pcn.py and core/test_55.py / core/eval_55.py:
instead of the reference's batch_size=1 CPU-bound loop, the whole
render → forward → metric computation is one jitted, batched function;
only the per-taxonomy bookkeeping stays on host. Padding rows added by the
fixed-shape Loader are dropped via ``batch.valid``.
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.configs import Config
from svdformer_pointsea_tpu.data import FIXED_CORNERS, crop_fixed
from svdformer_pointsea_tpu.losses import calc_cd, calc_dcd
from svdformer_pointsea_tpu.ops import fps_subsample
from svdformer_pointsea_tpu.render import PCViews, make_renderer
from svdformer_pointsea_tpu.utils import AverageMeter

METRIC_NAMES = ["cd", "dcd", "f1"]

# Crop fractions per difficulty (core/test_55.py:49).
CROP_RATIO = {"easy": 1 / 4, "median": 1 / 2, "hard": 3 / 4}


def _per_sample_metrics(pred, gt, sqrt_cd: bool):
    """(cd ×10³, dcd, f1) per sample. ``sqrt_cd``: CD-L1 (PCN, test_pcn.py:63)
    vs CD-L2 sum (ShapeNet-55, test_55.py:76)."""
    cd_p, cd_t, f1 = calc_cd(pred, gt, calc_f1=True)
    dcd, _, _ = calc_dcd(pred, gt)
    cd = cd_p if sqrt_cd else cd_t
    return cd * 1e3, dcd, f1


def make_pcn_eval_fn(model, render: PCViews, mesh=None):
    """Jitted (variables, partial, gt) -> stacked (3, B) metrics.

    ``mesh``: wrap the body in ``jax.shard_map`` over the ``data`` axis —
    per-sample metrics need no collectives, and the Pallas fast paths stay
    active per-chip on a multi-chip pod (same rationale as the shard_map
    train step, train/state.py). The batch must divide the mesh size (the
    eval loops pad via :func:`_pad_eval_rows`)."""

    def body(variables, partial, gt):
        depth = render.render(partial)
        preds = model.apply(variables, partial, depth, train=False)
        cd, dcd, f1 = _per_sample_metrics(preds[-1], gt, sqrt_cd=True)
        return jnp.stack([cd, dcd, f1])

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        body = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(None, "data"),
        )
    return jax.jit(body)


def _eval_mesh(cfg: Config):
    """The mesh for shard_map evaluation when cfg.train.dp == "shard_map"
    (None otherwise — the default jit path)."""
    if str(getattr(cfg.train, "dp", "gspmd")) != "shard_map":
        return None
    from svdformer_pointsea_tpu.parallel import make_mesh

    return make_mesh()


def _pad_eval_rows(arrays, mesh):
    """Pad each array's batch axis (cyclic repeat) to a multiple of the mesh
    size. Metric consumers already slice to ``batch.valid``, so pad rows are
    never read back."""
    if mesh is None:
        return arrays
    n = mesh.devices.size
    b = arrays[0].shape[0]
    target = -(-b // n) * n
    if target == b:
        return arrays
    idx = np.arange(target) % b
    return tuple(np.asarray(a)[idx] for a in arrays)


def eval_pcn(
    cfg: Config,
    model,
    variables,
    loader,
    logger=None,
    epoch: int = 0,
) -> float:
    """PCN eval (core/test_pcn.py): per-taxonomy CD-L1×10³ / DCD / F1 table.

    Returns the mean CD (the best-checkpoint selection metric,
    core/test_pcn.py:115).
    """
    render = make_renderer(cfg)
    mesh = _eval_mesh(cfg)
    eval_fn = make_pcn_eval_fn(model, render, mesh=mesh)

    category_metrics: Dict[str, AverageMeter] = {}
    test_metrics = AverageMeter(METRIC_NAMES)
    for batch in loader:
        partial, gt = _pad_eval_rows(
            (batch.data["partial_cloud"], batch.data["gtcloud"]), mesh
        )
        m = np.asarray(eval_fn(variables, jnp.asarray(partial), jnp.asarray(gt)))
        for i in range(batch.valid):
            vals = [float(m[0, i]), float(m[1, i]), float(m[2, i])]
            tax = batch.taxonomy_ids[i]
            if tax not in category_metrics:
                category_metrics[tax] = AverageMeter(METRIC_NAMES)
            category_metrics[tax].update(vals)
            test_metrics.update(vals)

    _print_category_table(category_metrics, test_metrics)
    if logger is not None:
        for i, name in enumerate(METRIC_NAMES):
            logger.add_scalar(f"Test/{name}", test_metrics.avg(i), epoch)
    return test_metrics.avg(0)


def make_55_eval_fn(model, render: PCViews, num_crop: int, n_sample: int = 2048,
                    mesh=None):
    """Jitted (variables, gt, corners(V,3)) -> (V, 3, B) metrics: ALL fixed
    corner viewpoints of core/test_55.py:51-82 in ONE dispatch per batch
    (``lax.map`` over corners — sequential on device, so peak memory stays
    at single-corner level while host dispatch count drops 8x).

    ``mesh``: shard_map over the batch axis (see make_pcn_eval_fn)."""

    def body(variables, gt, corners):
        def one_corner(corner):
            c = jnp.broadcast_to(corner, (gt.shape[0], 3))
            partial, _ = crop_fixed(gt, c, num_crop)
            partial = fps_subsample(partial, n_sample)
            depth = render.render(partial)
            preds = model.apply(variables, partial, depth, train=False)
            cd, dcd, f1 = _per_sample_metrics(preds[-1], gt, sqrt_cd=False)
            return jnp.stack([cd, dcd, f1])

        return jax.lax.map(one_corner, corners)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        body = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=P(None, None, "data"),
        )
    return jax.jit(body)


def eval_55(
    cfg: Config,
    model,
    variables,
    loader,
    logger=None,
    epoch: int = 0,
    mode: Optional[str] = None,
    n_viewpoints: int = 8,
) -> float:
    """ShapeNet-55 eval (core/test_55.py / eval_55.py): 8 fixed corner
    viewpoints × crop difficulty; CD-L2×10³/DCD/F1, overall + mean-class.

    Returns the overall mean CD.
    """
    mode = mode or cfg.data.mode
    n = cfg.data.gt_points
    num_crop = int(n * CROP_RATIO[mode])
    render = make_renderer(cfg)
    mesh = _eval_mesh(cfg)
    eval_fn = make_55_eval_fn(
        model, render, num_crop, n_sample=cfg.data.n_points, mesh=mesh
    )

    category_metrics: Dict[str, AverageMeter] = {}
    test_metrics = AverageMeter(METRIC_NAMES)
    corners = jnp.asarray(FIXED_CORNERS[:n_viewpoints])
    for batch in loader:
        (gt,) = _pad_eval_rows((batch.data["gtcloud"],), mesh)
        gt = jnp.asarray(gt)
        m = np.asarray(eval_fn(variables, gt, corners))  # (V, 3, B)
        for v in range(m.shape[0]):
            for i in range(batch.valid):
                vals = [float(m[v, 0, i]), float(m[v, 1, i]), float(m[v, 2, i])]
                tax = batch.taxonomy_ids[i]
                if tax not in category_metrics:
                    category_metrics[tax] = AverageMeter(METRIC_NAMES)
                category_metrics[tax].update(vals)
                test_metrics.update(vals)

    _print_category_table(category_metrics, test_metrics, mean_class=True)
    if logger is not None:
        for i, name in enumerate(METRIC_NAMES):
            logger.add_scalar(f"Test/{name}", test_metrics.avg(i), epoch)
    return test_metrics.avg(0)


def make_kitti_eval_fn(model, render: PCViews, mesh=None):
    """Jitted (variables, partial) -> (preds (B,N,3), fidelity (B,)).

    Fidelity (PCN-paper KITTI metric): mean distance from each input point
    to its nearest neighbour in the completion — computable without ground
    truth. KITTI scans usually have fewer than n_points real points and
    RandomSamplePoints zero-pads them (utils/data_transforms.py:175-186);
    the model input keeps that reference-faithful padding, but the metric
    masks the pad rows — averaging origin->completion distances over
    thousands of (0,0,0) rows would dominate the number. Consistency
    (frame-to-frame) needs tracklet pairing and is out of scope, as in the
    reference (which ships no KITTI loader at all)."""
    from svdformer_pointsea_tpu.ops import nn_squared_distance

    def body(variables, partial):
        depth = render.render(partial)
        preds = model.apply(variables, partial, depth, train=False)
        d = jnp.sqrt(nn_squared_distance(partial, preds[-1]))  # (B, N)
        real = (jnp.sum(jnp.abs(partial), axis=-1) > 0).astype(d.dtype)
        fidelity = jnp.sum(d * real, axis=1) / jnp.maximum(
            jnp.sum(real, axis=1), 1.0
        )
        return preds[-1], fidelity

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        body = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P("data"), P("data")),
        )
    return jax.jit(body)


def eval_kitti(
    cfg: Config,
    model,
    variables,
    loader,
    out_dir: Optional[str] = None,
) -> float:
    """KITTI cars zero-shot track: pose-normalized partial in -> completion
    out; reports fidelity and optionally saves each completion as
    ``<out_dir>/<model_id>.pcd``. Returns mean fidelity."""
    import os

    render = make_renderer(cfg)
    mesh = _eval_mesh(cfg)
    eval_fn = make_kitti_eval_fn(model, render, mesh=mesh)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from svdformer_pointsea_tpu.data import write_pcd

    meter = AverageMeter(["fidelity"])
    for batch in loader:
        (partial,) = _pad_eval_rows((batch.data["partial_cloud"],), mesh)
        preds, fid = eval_fn(variables, jnp.asarray(partial))
        preds, fid = np.asarray(preds), np.asarray(fid)
        for i in range(batch.valid):
            meter.update([float(fid[i])])
            if out_dir:
                write_pcd(
                    os.path.join(out_dir, f"{batch.model_ids[i]}.pcd"), preds[i]
                )
    logging.info(
        "KITTI cars: %d samples, mean fidelity %.6f", meter.count(0), meter.avg(0)
    )
    print(f"KITTI\t{meter.count(0)}\tfidelity\t{meter.avg(0):.6f}")
    return meter.avg(0)


def _print_category_table(
    category_metrics: Dict[str, AverageMeter],
    test_metrics: AverageMeter,
    mean_class: bool = False,
) -> None:
    """Per-category results table (core/test_pcn.py:83-105,
    core/test_55.py:90-101 incl. the mean-class row)."""
    header = "Taxonomy\t#Samples\t" + "\t".join(METRIC_NAMES)
    lines = [header]
    for tax in sorted(category_metrics):
        am = category_metrics[tax]
        row = f"{tax}\t{am.count(0)}\t" + "\t".join(
            f"{am.avg(i):.4f}" for i in range(len(METRIC_NAMES))
        )
        lines.append(row)
    overall = "Overall\t\t" + "\t".join(
        f"{test_metrics.avg(i):.4f}" for i in range(len(METRIC_NAMES))
    )
    lines.append(overall)
    if mean_class and category_metrics:
        k = len(METRIC_NAMES)
        means = [
            sum(category_metrics[t].avg(i) for t in category_metrics)
            / len(category_metrics)
            for i in range(k)
        ]
        lines.append("MeanClass\t\t" + "\t".join(f"{v:.4f}" for v in means))
    table = "\n".join(lines)
    logging.info("\n%s", table)
    print(table)
