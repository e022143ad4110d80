"""Manual per-component attribution of the PCN train step (profiler-free).

jax.profiler hangs over the axon tunnel, so each sub-computation is timed
standalone with the chained-dispatch recipe (enqueue N, block once). The
components sum approximately to the full step when fusion effects are small.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/step_breakdown.py
"""

from __future__ import annotations

import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.configs import pcn_config
from svdformer_pointsea_tpu.losses import get_loss
from svdformer_pointsea_tpu.ops import chamfer_distance, fps_subsample
from svdformer_pointsea_tpu.parallel import make_mesh_for_batch, replicated_sharding, shard_batch
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer


def timeit(fn, *args, n=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:45s} {dt:8.1f} ms", flush=True)
    return dt


def main() -> None:
    B = 12
    cfg = pcn_config()
    model = build_model(cfg)
    optimizer = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    state = init_state(cfg, model, optimizer, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)

    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.rand(B, 16384, 3).astype(np.float32) * 0.5)
    partial, gt = shard_batch((partial, gt), mesh)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    depth = jax.jit(render.render)(partial)
    jax.block_until_ready(depth)

    timeit(jax.jit(render.render), partial, label="render fwd (B12, 3x224^2)")

    fwd = jax.jit(lambda v, p, d: model.apply(v, p, d, train=False))
    preds = fwd(variables, partial, depth)
    jax.block_until_ready(preds)
    timeit(fwd, variables, partial, depth, label="model fwd eval (no bwd)")

    fwd_t = jax.jit(
        lambda v, p, d: model.apply(v, p, d, train=True, mutable=["batch_stats"])
    )
    timeit(fwd_t, variables, partial, depth, label="model fwd train (bn mutable)")

    # fwd+bwd with a trivial loss (no pyramids/chamfer-to-gt)
    def triv_loss(params, p, d):
        outs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            p, d, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o) for o in outs)

    gfn = jax.jit(jax.grad(triv_loss))
    timeit(gfn, state.params, partial, depth, label="model fwd+bwd (trivial loss)")

    # loss pyramid pieces, standalone (fixed preds)
    p0, p1, p2 = preds
    timeit(jax.jit(lambda g: fps_subsample(g, 2048)), gt, label="fps gt 16384->2048")
    g1 = fps_subsample(gt, 2048)
    jax.block_until_ready(g1)
    timeit(jax.jit(lambda g: fps_subsample(g, 512)), g1, label="fps 2048->512")

    cham = jax.jit(lambda a, b: chamfer_distance(a, b)[:2])
    timeit(cham, p2, gt, label="chamfer 16384x16384 fwd")
    gch = jax.jit(jax.grad(lambda a, b: sum(jnp.sum(x) for x in chamfer_distance(a, b)[:2])))
    timeit(gch, p2, gt, label="chamfer 16384x16384 fwd+bwd")

    # full loss (fixed preds) fwd only and fwd+bwd wrt preds
    lfn = jax.jit(lambda ps, g: get_loss(ps, g, sqrt=cfg.train.sqrt_loss)[0])
    timeit(lfn, preds, gt, label="get_loss fwd (fixed preds)")
    glfn = jax.jit(jax.grad(lambda ps, g: get_loss(ps, g, sqrt=cfg.train.sqrt_loss)[0]))
    timeit(glfn, preds, gt, label="get_loss fwd+bwd (wrt preds)")

    # full train loss fwd+bwd wrt params (= step minus optimizer)
    def full_loss(params, p, d, g):
        outs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            p, d, train=True, mutable=["batch_stats"],
        )
        return get_loss(outs, g, sqrt=cfg.train.sqrt_loss)[0]

    gfull = jax.jit(jax.grad(full_loss))
    timeit(gfull, state.params, partial, depth, gt, label="FULL loss fwd+bwd (step minus adam)")


if __name__ == "__main__":
    main()
