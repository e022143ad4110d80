"""Probe the two train-step hot spots (ImageTrunk 61 ms, SDG2 104 ms
fwd+bwd at B12) for precision/blocking wins, via monkeypatching — no
package changes. Chained-dependency timing (see tools/bwd_breakdown.py).

Probes:
  1. ImageTrunk bf16 compute in TRAIN mode (params f32, conv/BN compute bf16)
  2. SDG2 with bf16 flash-attention inputs (rest f32)
  3. SDG2 with whole-module bf16 (params+inputs cast)
  4. SDG2 f32 with wider flash BACKWARD blocks (1024/2048 dkv/dq)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/precision_probe.py
"""

from __future__ import annotations

import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import svdformer_pointsea_tpu.nn.layers as L
import svdformer_pointsea_tpu.nn.resnet as R
from svdformer_pointsea_tpu.nn.resnet import ImageTrunk
from svdformer_pointsea_tpu.nn.svdformer import SDG


def bench(module, args, label, n=10, cast_bf16=False):
    variables = jax.jit(lambda *a: module.init(jax.random.PRNGKey(0), *a, train=True))(*args)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    if cast_bf16:
        to_bf = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        params = to_bf(params)
        args = tuple(to_bf(a) for a in args)

    def loss(params, carry, *a):
        a = (a[0] + carry.astype(a[0].dtype),) + a[1:]
        out = module.apply({"params": params, **rest}, *a, train=True,
                           mutable=list(rest.keys()))
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(x.astype(jnp.float32)), out[0], 0.0
        )

    @jax.jit
    def bwd_step(params, carry, *a):
        g = jax.grad(loss)(params, carry, *a)
        leaves = jax.tree_util.tree_leaves(g)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) * 1e-38

    carry = jnp.float32(0.0)
    carry = bwd_step(params, carry, *args)
    _ = float(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = bwd_step(params, carry, *args)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:50s} fwd+bwd {dt:7.1f} ms", flush=True)


def main() -> None:
    B = 12
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B * 3, 224, 224, 1).astype(np.float32))
    partial = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    local_feat = jnp.asarray(rng.rand(B, 512, 256).astype(np.float32))
    f_g = jnp.asarray(rng.rand(B, 1, 512).astype(np.float32))
    coarse2 = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5)
    sdg_args = (local_feat, coarse2, f_g, partial)

    # baselines
    bench(ImageTrunk(feat_size=16), (img,), "ImageTrunk f32 (baseline)")
    bench(SDG(8, hidden_dim=512), sdg_args, "SDG2 f32 (baseline)")

    # 1. trunk bf16 compute in train mode
    orig_td = R._trunk_dtype
    R._trunk_dtype = lambda train: jnp.bfloat16
    bench(ImageTrunk(feat_size=16), (img,), "ImageTrunk bf16 compute (train)")
    R._trunk_dtype = orig_td

    # 2. SDG2 with bf16 flash inputs
    orig_att = L._scaled_attention

    def bf16_attention(q, k, v):
        dt = q.dtype
        return orig_att(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        ).astype(dt)

    L._scaled_attention = bf16_attention
    bench(SDG(8, hidden_dim=512), sdg_args, "SDG2 bf16 flash inputs")
    L._scaled_attention = orig_att

    # 3. SDG2 whole-module bf16
    bench(SDG(8, hidden_dim=512), sdg_args, "SDG2 whole-module bf16", cast_bf16=True)

    # 4. SDG2 f32, wider flash bwd blocks (patching the module constant
    # changes block_*_dkv/dq; 2048 may crash Mosaic like the fwd case did)
    orig_flash_block = L._FLASH_BLOCK
    for blk in (1024, 2048):
        L._FLASH_BLOCK = blk
        try:
            bench(SDG(8, hidden_dim=512), sdg_args, f"SDG2 f32 flash bwd blocks={blk}")
        except Exception as e:  # noqa: BLE001 — probe only
            print(f"SDG2 f32 flash bwd blocks={blk}: FAILED {type(e).__name__}", flush=True)
    L._FLASH_BLOCK = orig_flash_block


if __name__ == "__main__":
    main()
