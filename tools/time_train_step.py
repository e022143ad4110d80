"""Chained wall-clock timing of the fused PCN train step on the real chip.

VERDICT round-1 weak #1: the train step spent ~221 ms wall vs 82 ms device
time at B12 because rendering ran as a separate dispatch and per-step metric
fetches blocked the pipeline. The fused step (render inside the jitted step,
deferred metric fetch) is timed here with the tunnel-safe recipe: thread the
donated state through N steps, block ONCE at the end. Per-call blocking would
measure tunnel RPC latency, not device time.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/time_train_step.py [B] [f32|bf16]
"""

from __future__ import annotations

import sys
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.configs import pcn_config
from svdformer_pointsea_tpu.parallel import make_mesh_for_batch, replicated_sharding, shard_batch
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, make_train_step


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2:
        from svdformer_pointsea_tpu.nn import set_mixed_precision

        set_mixed_precision(sys.argv[2] == "bf16")
    cfg = pcn_config()
    model = build_model(cfg)
    optimizer = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    state = init_state(cfg, model, optimizer, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    train_step = make_train_step(
        model,
        optimizer,
        sqrt_loss=cfg.train.sqrt_loss,
        render_fn=render.render,
    )

    rng = np.random.RandomState(0)
    partial = rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5
    gt = rng.rand(B, 16384, 3).astype(np.float32) * 0.5
    w = np.ones((B,), np.float32)
    partial, gt, w = shard_batch((jnp.asarray(partial), jnp.asarray(gt), jnp.asarray(w)), mesh)

    # Compile + warmup (donation means we must rethread the state).
    t0 = time.perf_counter()
    state, metrics = train_step(state, partial, gt, w, 1e-4)
    jax.block_until_ready(metrics)
    print(f"first step (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    for n_iter in (5, 20):
        pend = []
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, metrics = train_step(state, partial, gt, w, 1e-4)
            pend.append(metrics)
        jax.block_until_ready((state, pend))
        dt = (time.perf_counter() - t0) / n_iter
        print(
            f"B={B} chained x{n_iter}: {dt * 1e3:.1f} ms/step "
            f"({B / dt:.1f} samples/s) loss={float(pend[-1]['loss']):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
