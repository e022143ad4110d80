"""Per-submodule fwd and fwd+bwd timing of SVDFormer at PCN B12 geometry.

Locates the backward-pass hot spots (fwd 55 ms vs fwd+bwd 196 ms measured
by tools/step_breakdown.py).

Timing over the axon tunnel is hostile: ``block_until_ready`` on an
UNCHAINED dispatch can return at RPC ack (measured: a submodule fwd+bwd
reading 0.1 ms). Every iteration here therefore feeds a scalar derived from
the previous output back into the next call's input (device-side dependency
chain), and the final scalar is fetched with ``float()`` — the only sync
this environment respects.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bwd_breakdown.py
"""

from __future__ import annotations

import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.nn.resnet import ImageTrunk
from svdformer_pointsea_tpu.nn.svdformer import SDG, FeatureExtractor, LocalEncoder, SVFNet


def bench(module, args, label, n=10, train=True):
    kw = dict(train=True) if train else {}
    variables = jax.jit(lambda *a: module.init(jax.random.PRNGKey(0), *a, **kw))(*args)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(params, carry, *a):
        # carry chains iterations: 0-valued but data-dependent.
        a = (a[0] + carry,) + a[1:]
        out = module.apply({"params": params, **rest}, *a, **kw,
                           mutable=list(rest.keys()) if train else False)
        out = out[0] if train else out
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(x.astype(jnp.float32)), out, 0.0
        )

    # *1e-38 (not *0.0): keeps the chain value ~0 without tempting XLA's
    # algebraic simplifier into folding the multiply and DCE-ing the body.
    @jax.jit
    def fwd_step(params, carry, *a):
        return loss(params, carry, *a) * 1e-38

    @jax.jit
    def bwd_step(params, carry, *a):
        g = jax.grad(loss)(params, carry, *a)
        leaves = jax.tree_util.tree_leaves(g)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) * 1e-38

    for step, name in ((fwd_step, "fwd"), (bwd_step, "fwd+bwd")):
        carry = jnp.float32(0.0)
        carry = step(params, carry, *args)
        _ = float(carry)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(params, carry, *args)
        val = float(carry)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:40s} {name:8s} {dt:7.1f} ms  (chain={val})", flush=True)


def main() -> None:
    B = 12
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    depth = jnp.asarray(rng.rand(B, 3, 224, 224).astype(np.float32))
    img = depth.reshape(B * 3, 224, 224, 1)

    bench(ImageTrunk(feat_size=16), (img,), "ImageTrunk (36,224,224,1)")
    bench(FeatureExtractor(use_pcsa=True), (partial,), "FeatureExtractor (12,2048,3)")
    bench(LocalEncoder(512), (partial,), "LocalEncoder (12,2048,3)")
    bench(SVFNet(0.7, use_pcsa=True), (partial, depth), "SVFNet (trunk+FE+seeds)")

    local_feat = jnp.asarray(rng.rand(B, 512, 256).astype(np.float32))
    f_g = jnp.asarray(rng.rand(B, 1, 512).astype(np.float32))
    coarse1 = jnp.asarray(rng.rand(B, 512, 3).astype(np.float32) * 0.5)
    coarse2 = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    bench(
        SDG(4, hidden_dim=768),
        (local_feat, coarse1, f_g, partial),
        "SDG1 (512 tok, h768, ratio 4)",
    )
    bench(
        SDG(8, hidden_dim=512),
        (local_feat, coarse2, f_g, partial),
        "SDG2 (2048 tok, h512, ratio 8)",
    )


if __name__ == "__main__":
    main()
