"""bf16-vs-f32 training ablation at a horizon above the noise floor.

The 60-step ablation (tools/knn_ablation.py, round 2) concluded that
run-to-run variation dominates at that horizon — insufficient evidence to
promote OR damn the 1.18x bf16 mixed-precision step. This harness settles
it (VERDICT r3 #2): >=300 steps, >=2 seeds per precision, held-out eval
ALWAYS f32 + exact kNN, on a 3x-larger eval set (36 shapes) than the old
harness so the eval read itself is tighter.

Decision rule printed at the end: the bf16 effect is judged against the
seed-noise spread measured WITHIN each precision. If |mean(bf16) -
mean(f32)| <= max(spread_f32, spread_bf16), bf16 shows no systematic
quality drift at this horizon and gets promoted to the documented
recommended training mode; otherwise it stays opt-in with this table as
the evidence.

KNOWN WEAKNESS of this rule (ADVICE r4 #1): with only 3 seeds the floor
is max over two 3-sample spreads, so higher bf16 instability WIDENS its
own promotion gate — and the measured floor (32.6×10⁻³) was 33× the mean
delta, i.e. this harness alone cannot resolve a small systematic drift.
The promotion therefore additionally rests on the round-5 soak-horizon
leg: a full 2,010-step bf16 run through the real data pipeline whose
loss trajectory tracks the f32 leg throughout and whose best-val CD beats
it (docs/STATUS.md round-5 "bf16 at soak horizon"). Re-run BOTH before
re-deciding.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bf16_ablation.py [steps] [seeds]
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
from svdformer_pointsea_tpu.parallel import (
    make_mesh_for_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, make_train_step

from tools.knn_ablation import synth_shapes


def run(steps: int, init_seed: int, precision: str, b: int = 12):
    from svdformer_pointsea_tpu.nn import set_mixed_precision

    ops.set_knn_mode("auto")  # the default train path for both precisions
    set_mixed_precision(precision == "bf16")
    cfg = pcn_config()
    model = build_model(cfg)
    optimizer = make_optimizer(
        weight_decay=cfg.train.weight_decay, betas=cfg.train.betas
    )
    state = init_state(cfg, model, optimizer, seed=init_seed)
    mesh = make_mesh_for_batch(b)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    train_step = make_train_step(
        model, optimizer, sqrt_loss=cfg.train.sqrt_loss, render_fn=render.render
    )

    data_rng = np.random.RandomState(7)  # identical stream for every run
    batches = [synth_shapes(data_rng, b, cfg.data.n_points, 16384) for _ in range(16)]
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

    # Held-out eval under EXACT kNN and f32 for every run, 3 batches.
    ops.set_knn_mode("exact")
    set_mixed_precision(False)

    @jax.jit
    def eval_cd(variables, partial, gt):
        depth = render.render(partial)
        preds = model.apply(variables, partial, depth, train=False)
        d1, d2, _, _ = chamfer_distance(preds[-1], gt)
        return (jnp.sqrt(d1).mean(-1) + jnp.sqrt(d2).mean(-1)).mean() / 2.0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_rng = np.random.RandomState(99)
    cds = []
    for _ in range(3):
        ep, eg = synth_shapes(eval_rng, b, cfg.data.n_points, 16384)
        cds.append(float(eval_cd(variables, jnp.asarray(ep), jnp.asarray(eg))) * 1e3)
    ops.set_knn_mode("auto")
    return {
        "precision": precision,
        "init_seed": init_seed,
        "loss_first": round(losses[0], 3),
        "loss_last10_mean": round(float(np.mean(losses[-10:])), 3),
        "eval_cd_x1e3": round(float(np.mean(cds)), 4),
        "ms_per_step": round(1e3 * train_t / steps, 1),
    }


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = []
    for precision in ("f32", "bf16"):
        for seed in range(1, n_seeds + 1):
            r = run(steps, seed, precision)
            results.append(r)
            print(json.dumps(r), flush=True)

    by = lambda p: [r["eval_cd_x1e3"] for r in results if r["precision"] == p]
    f32, bf16 = by("f32"), by("bf16")
    spread = lambda v: max(v) - min(v)
    delta = abs(float(np.mean(bf16)) - float(np.mean(f32)))
    floor = max(spread(f32), spread(bf16))
    print(
        json.dumps(
            {
                "steps": steps,
                "f32_eval_cds": f32,
                "bf16_eval_cds": bf16,
                "mean_delta": round(delta, 4),
                "seed_noise_floor": round(floor, 4),
                "verdict": "PROMOTE bf16" if delta <= floor else "KEEP bf16 opt-in",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
