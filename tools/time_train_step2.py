"""Locate the train-step bottleneck: tunnel dispatch vs device time.

Three measurements at B12 PCN geometry:
1. enqueue-vs-block split of the chained single-step loop (is the host
   dispatch path the bottleneck, or the device?)
2. K steps fused into ONE dispatch via lax.scan over stacked batches
   (amortizes any per-dispatch tunnel cost by 1/K)
3. same scan but reusing one batch (isolates data-transfer cost)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/time_train_step2.py
"""

from __future__ import annotations

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
    B = 12
    K = 8  # scan steps per dispatch
    cfg = pcn_config()
    model = build_model(cfg)
    optimizer = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    state = init_state(cfg, model, optimizer, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    train_step = make_train_step(
        model, optimizer, sqrt_loss=cfg.train.sqrt_loss, render_fn=render.render
    )

    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.rand(B, 16384, 3).astype(np.float32) * 0.5)
    w = jnp.ones((B,), jnp.float32)
    partial, gt, w = shard_batch((partial, gt, w), mesh)

    state, metrics = train_step(state, partial, gt, w, 1e-4)
    jax.block_until_ready(metrics)

    # 1) enqueue vs block
    n_iter = 20
    pend = []
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, metrics = train_step(state, partial, gt, w, 1e-4)
        pend.append(metrics)
    t_enq = time.perf_counter() - t0
    jax.block_until_ready((state, pend))
    t_tot = time.perf_counter() - t0
    print(
        f"single-step x{n_iter}: enqueue {t_enq / n_iter * 1e3:.1f} ms/step, "
        f"total {t_tot / n_iter * 1e3:.1f} ms/step",
        flush=True,
    )

    # 2) K-step scan, one dispatch, per-step data
    from svdformer_pointsea_tpu.losses import get_loss
    import optax
    from svdformer_pointsea_tpu.train.state import TrainState, _set_lr

    def one(state, batch):
        p, g, lr = batch
        depth = jax.lax.stop_gradient(render.render(p))

        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                p, depth, train=True, mutable=["batch_stats"],
            )
            loss, parts = get_loss(outs, g, sqrt=cfg.train.sqrt_loss, weights=w)
            return loss, (parts, mutated["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, batch_stats=new_bs, opt_state=opt_state),
            loss,
        )

    @jax.jit
    def scan_steps(state, ps, gs, lrs):
        return jax.lax.scan(one, state, (ps, gs, lrs))

    ps = jnp.stack([partial] * K)
    gs = jnp.stack([gt] * K)
    lrs = jnp.full((K,), 1e-4, jnp.float32)
    state2, losses = scan_steps(state, ps, gs, lrs)
    jax.block_until_ready(losses)
    n_disp = 3
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state2, losses = scan_steps(state2, ps, gs, lrs)
    jax.block_until_ready((state2, losses))
    dt = (time.perf_counter() - t0) / (n_disp * K)
    print(f"scan x{K} per dispatch: {dt * 1e3:.1f} ms/step ({B / dt:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
