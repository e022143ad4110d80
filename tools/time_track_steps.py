"""Chained wall-clock timing of the NON-PCN train steps on the real chip.

tools/time_train_step.py covers the flagship PCN step; this tool covers the
other three tracks at their reference operating points so the perf story
spans every training surface:

- 55:       SVDFormer-55, fused crop-synthesis + render step, B16, gt 8192
            (core/train_55.py: crop in [n/4, 3n/4], AdamW, get_loss_PM)
- geospec:  GeoSpecNet + discriminator GAN step, B12, PCN shapes
            (core/train_geospec.py: D-then-G, single generator forward)
- pointsea: PointSea with the realistic voxel renderer, B12, PCN shapes

Timing: state threads through iterations (device-side chain), one
block_until_ready at the end — the memory-documented tunnel-safe recipe.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/time_track_steps.py [track ...]
"""

from __future__ import annotations

import sys
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.configs import (
    geospec_config,
    pointsea_config,
    shapenet55_config,
)
from svdformer_pointsea_tpu.parallel import (
    make_mesh_for_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, make_train_step


def _time(label, step, state, args, n_iter=20):
    """Chained steady-state seconds/step (state threads the chain)."""
    t0 = time.perf_counter()
    state, metrics = step(state, *args)
    jax.block_until_ready(metrics)
    print(f"{label}: first step (compile) {time.perf_counter() - t0:.1f}s", flush=True)
    pend = []
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, metrics = step(state, *args)
        pend.append(metrics)
    jax.block_until_ready((state, pend))
    dt = (time.perf_counter() - t0) / n_iter
    return dt


def time_55(n_iter: int = 20) -> tuple:
    cfg = shapenet55_config()
    B, n = cfg.train.batch_size, cfg.data.gt_points  # 16, 8192
    model = build_model(cfg)
    opt = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    state = init_state(cfg, model, opt, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    step = make_train_step(
        model, opt, sqrt_loss=cfg.train.sqrt_loss,
        partial_matching=cfg.train.partial_matching,
        render_fn=render.render, crop_n_out=cfg.data.n_points,
    )
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(B, n, 3).astype(np.float32) * 0.5)
    direction = jnp.asarray(rng.randn(B, 3).astype(np.float32))
    num_crop = jnp.full((B,), n // 2, jnp.int32)
    w = jnp.ones((B,), jnp.float32)
    gt, direction, num_crop, w = shard_batch((gt, direction, num_crop, w), mesh)
    dt = _time("55", step, state, (gt, direction, num_crop, w, jnp.float32(1e-4)),
               n_iter=n_iter)
    print(f"55 (B{B}, crop+render fused, gt {n}): {dt*1e3:.1f} ms/step "
          f"({B/dt:.1f} samples/s)", flush=True)
    return dt, B


def time_geospec(n_iter: int = 20) -> tuple:
    from svdformer_pointsea_tpu.train.gan import create_gan_state, make_gan_train_step

    cfg = geospec_config()
    B = cfg.train.batch_size  # 12
    g_model, d_model, g_opt, d_opt, state = create_gan_state(cfg, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    step = make_gan_train_step(
        g_model, d_model, g_opt, d_opt, cfg.train.gan_weight,
        render_fn=render.render,
    )
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.rand(B, cfg.data.gt_points, 3).astype(np.float32) * 0.5)
    w = jnp.ones((B,), jnp.float32)
    partial, gt, w = shard_batch((partial, gt, w), mesh)

    def stepper(state, *args):
        return step(state, *args)

    dt = _time("geospec", stepper, state,
               (partial, gt, w, jnp.float32(1e-4), jnp.float32(1e-4)),
               n_iter=n_iter)
    print(f"geospec GAN (B{B}, D+G, render fused): {dt*1e3:.1f} ms/step "
          f"({B/dt:.1f} samples/s)", flush=True)
    return dt, B


def time_pointsea(n_iter: int = 20) -> tuple:
    cfg = pointsea_config()
    B = cfg.train.batch_size  # 12
    model = build_model(cfg)
    opt = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    state = init_state(cfg, model, opt, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)  # PCViewsReal (voxel + gaussian)
    step = make_train_step(
        model, opt, sqrt_loss=cfg.train.sqrt_loss, render_fn=render.render
    )
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.rand(B, cfg.data.gt_points, 3).astype(np.float32) * 0.5)
    w = jnp.ones((B,), jnp.float32)
    partial, gt, w = shard_batch((partial, gt, w), mesh)
    dt = _time("pointsea", step, state, (partial, gt, w, jnp.float32(1e-4)),
               n_iter=n_iter)
    print(f"pointsea (B{B}, realistic render fused): {dt*1e3:.1f} ms/step "
          f"({B/dt:.1f} samples/s)", flush=True)
    return dt, B


_EVAL_CFGS = {
    "55": shapenet55_config,
    "geospec": geospec_config,
    "pointsea": pointsea_config,
}


def time_track_eval(name: str, n_iter: int = 8, bs: int = 16) -> tuple:
    """Chained eval-path throughput (render + forward, train=False) for a
    non-PCN track, completions/sec — the VERDICT r4 #6 regression surface
    (ref eval loops: core/test_55.py:60-82, core/test_geospec.py:12,
    models_PointSea/PointSea.py:250-285). In-jit chained like bench.py:
    each iteration's input depends on the previous output scalar."""
    cfg = _EVAL_CFGS[name]()
    model = build_model(cfg)
    render = make_renderer(cfg)
    rng = np.random.RandomState(0)
    partial = jnp.asarray(
        rng.rand(bs, cfg.data.n_points, 3).astype(np.float32) * 0.5 - 0.25
    )

    @jax.jit
    def pipeline(variables, partial, s):
        p = partial + s * 1e-20
        depth = render.render(p)
        out = model.apply(variables, p, depth, train=False)[-1]
        return out, jnp.sum(out[:, 0, 0])

    init_depth = render.get_img(partial[:2])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), partial[:2], init_depth
    )
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    out, s = pipeline(variables, partial, s)
    out.block_until_ready()
    print(f"{name} eval: first call (compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out, s = pipeline(variables, partial, s)
    _ = float(s)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{name} eval (B{bs}): {dt * 1e3:.1f} ms/batch "
          f"({bs / dt:.1f} completions/s)", flush=True)
    return dt, bs


if __name__ == "__main__":
    tracks = sys.argv[1:] or ["55", "geospec", "pointsea"]
    for t in tracks:
        {"55": time_55, "geospec": time_geospec, "pointsea": time_pointsea}[t]()
        time_track_eval(t)
