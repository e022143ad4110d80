"""Per-op device-time attribution of the fused PCN train step via xplane.

jax.profiler recovered on 2026-08-18 (it hung over the axon tunnel for most
of round 1/2). RESOLVED MYSTERY: xplane "XLA Ops" totals match the chained
wall-clock truth exactly (213.5 ms/step measured vs ~219 ms chained, f32
B12) once the traced fn returns the FULL step outputs. Round 1's "82 ms
device time" came from tracing a fn that returned only the metrics dict —
XLA dead-code-eliminated the backward + optimizer, leaving a forward-only
executable (82 ms ≈ fwd 55 + loss 37 from the chained breakdown).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/trace_train_step.py [B]
"""

from __future__ import annotations

import sys

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.configs import pcn_config
from svdformer_pointsea_tpu.parallel import (
    make_mesh_for_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, make_train_step

from tools.tpu_microbench import device_time_ms


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if "bf16" in sys.argv[2:]:
        from svdformer_pointsea_tpu.nn.precision import set_mixed_precision

        set_mixed_precision(True)
        print("mixed precision ON (bf16 trunk + flash inputs)")
    cfg = pcn_config()
    model = build_model(cfg)
    optimizer = make_optimizer(
        weight_decay=cfg.train.weight_decay, betas=cfg.train.betas
    )
    state = init_state(cfg, model, optimizer, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    # donate=False: device_time_ms re-jits the fn, so it must be pure and
    # re-callable with the same buffers.
    train_step = make_train_step(
        model,
        optimizer,
        sqrt_loss=cfg.train.sqrt_loss,
        render_fn=render.render,
        donate=False,
    )

    rng = np.random.RandomState(0)
    partial = rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5
    gt = rng.rand(B, 16384, 3).astype(np.float32) * 0.5
    w = np.ones((B,), np.float32)
    partial, gt, w = shard_batch(
        (jnp.asarray(partial), jnp.asarray(gt), jnp.asarray(w)), mesh
    )

    def one_step(state, partial, gt, w):
        # Return the FULL (new_state, metrics): returning metrics alone lets
        # XLA dead-code-eliminate the backward pass + optimizer update, which
        # is exactly how the round-1 "82 ms device time" misread happened
        # (a forward-only executable traced as if it were the train step).
        return train_step(state, partial, gt, w, 1e-4)

    # warm/compile outside the trace
    m = one_step(state, partial, gt, w)
    jax.block_until_ready(m)
    ms = device_time_ms(one_step, (state, partial, gt, w), iters=5, top=25)
    print(f"xplane per-op device total: {ms:.1f} ms/step (B={B})")


if __name__ == "__main__":
    main()
