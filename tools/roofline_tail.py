"""Itemize the train-step's long tail against per-group rooflines
(VERDICT r4 #5).

The round-4 xplane audit itemized ~71 ms of the 198 ms f32 B12 step
(chamfer NN 23.8, flash bwd 20.6 + fwd 9.2, trunk BN fusions 10.5, FPS
4.3, chamfer-grad gather 2.9) and waved the remaining ~127 ms through as
"long tail, no single op >= 3 ms". This tool closes that gap by COMPONENT
GROUPS instead of ops: each group is timed fwd+bwd with the chained
recipe, and its roofline is computed from XLA's own cost analysis of the
compiled executable — roofline_ms = max(flops / F32_PEAK, bytes / HBM_BW).
A group whose measured time sits near that bound has no fusion lever left
regardless of how many small ops it contains; the gap between measured
and roofline bounds the total win any grouped fusion could deliver.

Groups: ImageTrunk, FeatureExtractor, LocalEncoder, SVFNet fusion head
(SVFNet minus trunk minus FE, by subtraction), SDG1, SDG2 (flash sites
already audited — the non-flash remainder is SDG2 minus the 5 known flash
site costs), renderer scatter (fwd only, no grad path), Adam update on
the full 58.1M-param tree, and the loss pyramid (FPS + 3 chamfers:
the 16384^2 chamfer + FPS are audited; remainder = glue).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/roofline_tail.py
"""

from __future__ import annotations

import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svdformer_pointsea_tpu.losses import get_loss
from svdformer_pointsea_tpu.nn.resnet import ImageTrunk
from svdformer_pointsea_tpu.nn.svdformer import (
    SDG,
    FeatureExtractor,
    LocalEncoder,
    SVFNet,
)
from svdformer_pointsea_tpu.render.pcviews import PCViews

F32_PEAK = 98e12  # v5e f32 MXU-equivalent FLOP/s (round-4 audit basis)
HBM_BW = 819e9  # v5e HBM bytes/s

results = []


def _roofline(executable) -> tuple:
    try:
        cost = executable.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
        return flops, bytes_, max(flops / F32_PEAK, bytes_ / HBM_BW) * 1e3
    except Exception:
        return 0.0, 0.0, float("nan")


def _time_chained(step, params, args, n=10) -> float:
    carry = jnp.float32(0.0)
    carry = step(params, carry, *args)
    _ = float(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(params, carry, *args)
    _ = float(carry)
    return (time.perf_counter() - t0) / n * 1e3


def bench_module(module, args, label, train=True, fwd_only=False):
    kw = dict(train=True) if train else {}
    variables = jax.jit(
        lambda *a: module.init(jax.random.PRNGKey(0), *a, **kw)
    )(*args)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(params, carry, *a):
        a = (a[0] + carry,) + a[1:]
        out = module.apply({"params": params, **rest}, *a, **kw,
                           mutable=list(rest.keys()) if train else False)
        out = out[0] if train else out
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(x.astype(jnp.float32)), out, 0.0
        )

    if fwd_only:
        @jax.jit
        def step(params, carry, *a):
            return loss(params, carry, *a) * 1e-38
    else:
        @jax.jit
        def step(params, carry, *a):
            g = jax.grad(loss)(params, carry, *a)
            leaves = jax.tree_util.tree_leaves(g)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) * 1e-38

    lowered = step.lower(params, jnp.float32(0.0), *args).compile()
    flops, bytes_, roof = _roofline(lowered)
    ms = _time_chained(step, params, args)
    tag = "fwd" if fwd_only else "fwd+bwd"
    results.append((label, tag, ms, flops, bytes_, roof))
    print(f"{label:42s} {tag:8s} {ms:7.1f} ms   roofline {roof:6.1f} ms "
          f"({flops / 1e9:8.1f} GFLOP, {bytes_ / 1e6:8.1f} MB)", flush=True)
    return ms


def bench_fn(fn, args, label):
    """Time + roofline a plain jitted function (chained via first arg)."""
    @jax.jit
    def step(_unused, carry, *a):
        out = fn(a[0] + carry, *a[1:])
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(x.astype(jnp.float32)), out, 0.0
        ) * 1e-38

    lowered = step.lower(None, jnp.float32(0.0), *args).compile()
    flops, bytes_, roof = _roofline(lowered)
    ms = _time_chained(step, None, args)
    results.append((label, "fwd", ms, flops, bytes_, roof))
    print(f"{label:42s} {'fwd':8s} {ms:7.1f} ms   roofline {roof:6.1f} ms "
          f"({flops / 1e9:8.1f} GFLOP, {bytes_ / 1e6:8.1f} MB)", flush=True)
    return ms


def bench_adam(label="Adam update (58.1M params, full tree)"):
    """optax.adam update over a tree shaped like the full SVDFormer."""
    from svdformer_pointsea_tpu.configs import pcn_config
    from svdformer_pointsea_tpu.train.loop import build_model

    cfg = pcn_config()
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(2, 2048, 3).astype(np.float32) * 0.5)
    depth = jnp.asarray(rng.rand(2, 3, 224, 224).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)
    params = variables["params"]
    opt = optax.adam(1e-4)
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

    lowered = step.lower(params, jnp.float32(0.0), opt_state).compile()
    flops, bytes_, roof = _roofline(lowered)
    params, opt_state, carry = step(params, jnp.float32(0.0), opt_state)
    _ = float(carry)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        params, opt_state, carry = step(params, carry, opt_state)
    _ = float(carry)
    ms = (time.perf_counter() - t0) / n * 1e3
    results.append((label, "update", ms, flops, bytes_, roof))
    print(f"{label:42s} {'update':8s} {ms:7.1f} ms   roofline {roof:6.1f} ms "
          f"({flops / 1e9:8.1f} GFLOP, {bytes_ / 1e6:8.1f} MB)", flush=True)
    return ms


def main() -> None:
    B = 12
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    depth = jnp.asarray(rng.rand(B, 3, 224, 224).astype(np.float32))
    img = depth.reshape(B * 3, 224, 224, 1)

    print("== component groups, f32 B12 (chained; roofline from XLA cost "
          "analysis) ==", flush=True)
    trunk = bench_module(ImageTrunk(feat_size=16), (img,),
                         "ImageTrunk (36,224,224,1)")
    fe = bench_module(FeatureExtractor(use_pcsa=True), (partial,),
                      "FeatureExtractor (12,2048,3)")
    bench_module(LocalEncoder(512), (partial,), "LocalEncoder (12,2048,3)")
    svf = bench_module(SVFNet(0.7, use_pcsa=True), (partial, depth),
                       "SVFNet (trunk+FE+viewattn+seeds)")
    print(f"{'  -> SVFNet fusion head (svf - trunk - FE)':42s} {'':8s} "
          f"{svf - trunk - fe:7.1f} ms", flush=True)

    local_feat = jnp.asarray(rng.rand(B, 512, 256).astype(np.float32))
    f_g = jnp.asarray(rng.rand(B, 1, 512).astype(np.float32))
    coarse1 = jnp.asarray(rng.rand(B, 512, 3).astype(np.float32) * 0.5)
    coarse2 = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    bench_module(SDG(4, hidden_dim=768), (local_feat, coarse1, f_g, partial),
                 "SDG1 (512 tok, h768, ratio 4)")
    sdg2 = bench_module(SDG(8, hidden_dim=512),
                        (local_feat, coarse2, f_g, partial),
                        "SDG2 (2048 tok, h512, ratio 8)")
    # Known flash-site costs inside SDG2 from the round-4 xplane audit
    # (5 fwd sites 1.54 each + 5 dkv 2.39 + 5 dq 1.73): ~28.3 ms of it.
    print(f"{'  -> SDG2 non-flash remainder (audit 28.3)':42s} {'':8s} "
          f"{sdg2 - 28.3:7.1f} ms", flush=True)

    render = PCViews(trans=-0.7, resolution=224)
    bench_fn(render.render, (partial,), "renderer scatter (fwd, no grads)")

    gt = jnp.asarray(rng.rand(B, 16384, 3).astype(np.float32) * 0.5)
    pc = jnp.asarray(rng.rand(B, 256, 3).astype(np.float32) * 0.5)
    p1 = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    p2 = jnp.asarray(rng.rand(B, 16384, 3).astype(np.float32) * 0.5)

    def loss_fn(pc_, p1_, p2_, gt_):
        def scalar(a, b, c):
            loss, parts = get_loss((a, b, c), gt_, sqrt=True)
            return loss

        g = jax.grad(scalar, argnums=(0, 1, 2))(pc_, p1_, p2_)
        return sum(jnp.sum(x) for x in g)

    bench_fn(lambda a, b, c, d: loss_fn(a, b, c, d), (pc, p1, p2, gt),
             "loss pyramid fps+3xchamfer (fwd+bwd)")

    bench_adam()

    total = sum(r[2] for r in results
                if r[0].startswith(("ImageTrunk", "LocalEncoder", "SVFNet",
                                    "SDG1", "SDG2", "renderer", "loss",
                                    "Adam")))
    print(f"\nsum of non-overlapping groups: {total:.1f} ms "
          f"(xplane full-step device total: 198.3 ms; gap = dispatch/"
          f"overlap + double-counted init glue)", flush=True)


if __name__ == "__main__":
    main()
