"""Exact-vs-approx kNN *training* ablation on the real chip (VERDICT #10).

Round 1 justified `lax.approx_max_k` (recall ~0.988) for inference parity
only. This harness runs a short PCN training run twice — identical seeds,
identical synthetic data stream — with the kNN backend set to "exact" and
"approx", and reports per-step losses plus a final eval CD on held-out
clouds computed under EXACT kNN for both runs, so the comparison isolates
what training-under-approximation does to the learned weights.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/knn_ablation.py [steps]
"""

from __future__ import annotations

import json
import sys
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu import ops
from svdformer_pointsea_tpu.configs import pcn_config
from svdformer_pointsea_tpu.ops import chamfer_distance
from svdformer_pointsea_tpu.parallel import make_mesh_for_batch, replicated_sharding, shard_batch
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, make_train_step


def synth_shapes(rng: np.random.RandomState, b: int, n_partial: int, n_gt: int):
    """Deterministic smooth synthetic shapes (superquadric-ish blobs)."""
    gt = []
    for _ in range(b):
        u = rng.rand(n_gt) * 2 * np.pi
        v = np.arccos(2 * rng.rand(n_gt) - 1)
        r = 0.3 + 0.1 * np.sin(3 * u) * np.cos(2 * v)
        pts = np.stack(
            [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)], -1
        )
        gt.append(pts.astype(np.float32))
    gt = np.stack(gt)
    # partial = nearest half to a random view direction, resampled
    partial = []
    for i in range(b):
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        proj = gt[i] @ d
        keep = np.argsort(proj)[: n_gt // 2]
        sel = rng.choice(keep, size=n_partial, replace=True)
        partial.append(gt[i, sel])
    return np.stack(partial), gt


def run(mode: str, steps: int, b: int = 12, init_seed: int = 1, precision: str = "f32"):
    """One short training run. ``init_seed`` variation gives the noise
    floor against which kNN/precision deltas must be judged: after N
    divergent steps ANY perturbation (including a different init) yields
    different weights; only a delta ABOVE the seed-noise floor indicates
    systematic drift. ``precision`` exercises nn.set_mixed_precision
    (bf16 trunk + flash inputs); eval always runs f32 + exact kNN."""
    from svdformer_pointsea_tpu.nn import set_mixed_precision

    ops.set_knn_mode(mode)
    set_mixed_precision(precision == "bf16")
    cfg = pcn_config()
    model = build_model(cfg)
    optimizer = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    state = init_state(cfg, model, optimizer, seed=init_seed)
    mesh = make_mesh_for_batch(b)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    train_step = make_train_step(
        model, optimizer, sqrt_loss=cfg.train.sqrt_loss, render_fn=render.render
    )

    data_rng = np.random.RandomState(7)
    batches = [synth_shapes(data_rng, b, cfg.data.n_points, 16384) for _ in range(8)]
    w = shard_batch((jnp.ones((b,), jnp.float32),), mesh)[0]

    losses = []
    t0 = time.perf_counter()
    for s in range(steps):
        partial, gt = batches[s % len(batches)]
        partial_d, gt_d = shard_batch((jnp.asarray(partial), jnp.asarray(gt)), mesh)
        lr = 1e-4 * min(s + 1, 300) / 300.0
        state, metrics = train_step(state, partial_d, gt_d, w, lr)
        losses.append(metrics)
    losses = [float(m["loss"]) * 1e3 for m in jax.device_get(losses)]
    train_t = time.perf_counter() - t0

    # Held-out eval under EXACT kNN and f32 for every run.
    ops.set_knn_mode("exact")
    set_mixed_precision(False)
    eval_rng = np.random.RandomState(99)
    ep, eg = synth_shapes(eval_rng, b, cfg.data.n_points, 16384)

    @jax.jit
    def eval_cd(variables, partial, gt):
        depth = render.render(partial)
        preds = model.apply(variables, partial, depth, train=False)
        d1, d2, _, _ = chamfer_distance(preds[-1], gt)
        return (jnp.sqrt(d1).mean(-1) + jnp.sqrt(d2).mean(-1)).mean() / 2.0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    cd = float(eval_cd(variables, jnp.asarray(ep), jnp.asarray(eg))) * 1e3
    ops.set_knn_mode("auto")
    return {
        "mode": mode,
        "init_seed": init_seed,
        "precision": precision,
        "loss_first": losses[0],
        "loss_last5": [round(v, 3) for v in losses[-5:]],
        "eval_cd_x1e3_exact_knn": round(cd, 4),
        "train_s": round(train_t, 1),
    }


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    runs = {
        "exact": run("exact", steps),
        "approx": run("approx", steps),
        "exact_seed2": run("exact", steps, init_seed=2),  # noise floor
        "bf16": run("approx", steps, precision="bf16"),
    }
    for r in runs.values():
        print(json.dumps(r), flush=True)
    base = runs["exact"]["eval_cd_x1e3_exact_knn"]
    print(
        json.dumps(
            {
                "eval_cd_delta_vs_exact": {
                    k: round(abs(v["eval_cd_x1e3_exact_knn"] - base), 4)
                    for k, v in runs.items()
                    if k != "exact"
                },
                "note": "exact_seed2 is the seed-noise floor; deltas at or "
                "below it indicate no detectable systematic drift",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
