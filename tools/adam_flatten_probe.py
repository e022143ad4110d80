"""Probe: optax.flatten(adam) vs plain adam on the full SVDFormer tree.

tools/roofline_tail.py measured the standalone Adam update at 20.0 ms vs
a 4.2 ms bytes-bound roofline (58.1M params in hundreds of leaves ->
hundreds of small fusions, launch-latency bound). optax.flatten runs the
SAME adam math on one concatenated vector — params stay structured (only
the optimizer STATE flattens), so checkpoints/converter are unaffected
for params, but opt_state trees change shape (resume from an old
checkpoint needs the same optimizer wrapping).

Measures: standalone update (chained) and the full B12 PCN train step
with each optimizer.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/adam_flatten_probe.py
"""

from __future__ import annotations

import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svdformer_pointsea_tpu.configs import pcn_config
from svdformer_pointsea_tpu.parallel import (
    make_mesh_for_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.render import make_renderer
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, make_train_step


def time_update(opt, params, label, n=10):
    opt_state = opt.init(params)

    @jax.jit
    def step(params, carry, opt_state):
        grads = jax.tree_util.tree_map(
            lambda p: p * 1e-38 + carry * 1e-38, params
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        leaf = jax.tree_util.tree_leaves(params)[0]
        return params, opt_state, jnp.sum(leaf) * 1e-38

    params, opt_state, carry = step(params, jnp.float32(0.0), opt_state)
    _ = float(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, carry = step(params, carry, opt_state)
    _ = float(carry)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:32s} {ms:6.1f} ms/update", flush=True)
    return ms


def time_full_step(optimizer, label, n=15):
    cfg = pcn_config()
    B = 12
    model = build_model(cfg)
    state = init_state(cfg, model, optimizer, seed=1)
    mesh = make_mesh_for_batch(B)
    state = jax.device_put(state, replicated_sharding(mesh))
    render = make_renderer(cfg)
    step = make_train_step(
        model, optimizer, sqrt_loss=cfg.train.sqrt_loss,
        render_fn=render.render,
    )
    rng = np.random.RandomState(0)
    partial = rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5
    gt = rng.rand(B, cfg.data.gt_points, 3).astype(np.float32) * 0.5
    w = np.ones((B,), np.float32)
    args = shard_batch(tuple(jnp.asarray(x) for x in (partial, gt, w)), mesh)
    state, metrics = step(state, *args, jnp.float32(1e-4))
    jax.block_until_ready(metrics)
    pend = []
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, *args, jnp.float32(1e-4))
        pend.append(metrics)
    jax.block_until_ready((state, pend))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:32s} {ms:6.1f} ms/step (full B12 train)", flush=True)
    return ms


def main() -> None:
    cfg = pcn_config()
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(2, 2048, 3).astype(np.float32) * 0.5)
    render = make_renderer(cfg)
    depth = render.get_img(partial)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)
    params = variables["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(f"param leaves: {n_leaves}", flush=True)

    plain = optax.adam(1e-4)
    flat = optax.flatten(optax.adam(1e-4))
    time_update(plain, params, "adam (per-leaf)")
    time_update(flat, params, "optax.flatten(adam)")

    time_full_step(make_optimizer(), "full step, adam (per-leaf)")
    time_full_step(
        make_optimizer(flatten=True), "full step, flatten(adam)"
    )


if __name__ == "__main__":
    main()
