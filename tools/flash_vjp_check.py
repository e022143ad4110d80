"""On-chip equality + timing: flash_attention_di128 vs upstream flash.

flash_vjp.flash_attention_di128 reuses the upstream Pallas kernels and only
rebuilds the dq backward's ``di`` feed (128 lanes instead of a
block_k_major-lane broadcast the kernel never reads).  Same kernels + same
blocks + same values ⇒ outputs and all three gradients must match the
upstream ``flash_attention`` EXACTLY; this script asserts that at the PCN
model's real attention shapes and then times fwd+bwd of both variants with
the in-jit chained recipe (docs/STATUS.md "Timing-harness gotcha").

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/flash_vjp_check.py
"""

from __future__ import annotations

import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention,
)

from svdformer_pointsea_tpu.nn.flash_vjp import flash_attention_di128
from svdformer_pointsea_tpu.nn.layers import _bwd_block, _flash_blocks

# (label, batch, heads, q tokens, kv tokens, head dim) — the PCN train
# step's five self-attention sites (SDG2 2048 tok ×2 + seed 2048? no:
# seed gen 2048, SDG1 512 ×3 h96) plus the cross-attention shape.
SITES = [
    ("SDG2 self 2048tok dh64", 12, 8, 2048, 2048, 64),
    ("SDG1 self 512tok dh96", 12, 8, 512, 512, 96),
    ("cross 2048q/512kv dh64", 12, 8, 2048, 512, 64),
]


def block_sizes(qn: int, kn: int) -> BlockSizes:
    nq, nk = _flash_blocks(qn, kn)
    return BlockSizes(
        block_q=nq,
        block_k_major=nk,
        block_k=nk,
        block_b=1,
        block_q_major_dkv=_bwd_block(qn),
        block_k_major_dkv=_bwd_block(kn),
        block_k_dkv=_bwd_block(kn),
        block_q_dkv=_bwd_block(qn),
        block_k_major_dq=_bwd_block(kn),
        block_k_dq=_bwd_block(kn),
        block_q_dq=_bwd_block(qn),
    )


def main() -> None:
    assert jax.default_backend() == "tpu", "run on the chip"
    for label, b, h, qn, kn, dh in SITES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, qn, dh).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, kn, dh).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, kn, dh).astype(np.float32))
        do = jnp.asarray(rng.randn(b, h, qn, dh).astype(np.float32))
        bs = block_sizes(qn, kn)
        scale = 1.0 / np.sqrt(dh)

        def up(q, k, v):
            return flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)

        def di128(q, k, v):
            return flash_attention_di128(q, k, v, scale, bs)

        @jax.jit
        def both(q, k, v, do):
            o_u, vjp_u = jax.vjp(up, q, k, v)
            o_n, vjp_n = jax.vjp(di128, q, k, v)
            gu, gn = vjp_u(do), vjp_n(do)
            devs = [jnp.max(jnp.abs(o_u - o_n))]
            devs += [jnp.max(jnp.abs(a - b)) for a, b in zip(gu, gn)]
            return jnp.stack(devs)

        devs = np.asarray(both(q, k, v, do))
        print(f"{label:28s} max|Δ| o/dq/dk/dv = {devs}", flush=True)
        assert devs.max() == 0.0, f"{label}: not bitwise identical: {devs}"

        # fwd+bwd timing, in-jit chained (scalar folded into q each iter).
        for name, fn in (("upstream", up), ("di128", di128)):

            @jax.jit
            def step(q, k, v, do, carry, fn=fn):
                qc = q + carry
                o, vjp = jax.vjp(fn, qc, k, v)
                g = vjp(do)
                tot = sum(jnp.sum(t.astype(jnp.float32)) for t in (o, *g))
                return tot * 1e-38

            carry = step(q, k, v, do, jnp.float32(0.0))
            float(carry)
            n = 30
            t0 = time.perf_counter()
            for _ in range(n):
                carry = step(q, k, v, do, carry)
            float(carry)
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"  {name:9s} fwd+bwd {dt:6.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
