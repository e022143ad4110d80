"""Per-op xplane attribution of the packed ImageTrunk fwd+bwd (train mode).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/s2d_trace.py [0|1]
"""

from __future__ import annotations

import sys

import numpy as np

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from svdformer_pointsea_tpu.nn.resnet import ImageTrunk, set_trunk_s2d
from tools.tpu_microbench import device_time_ms


def main() -> None:
    set_trunk_s2d(bool(int(sys.argv[1])) if len(sys.argv) > 1 else True)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(36, 224, 224, 1).astype(np.float32))
    module = ImageTrunk(feat_size=16)
    variables = jax.jit(
        lambda x: module.init(jax.random.PRNGKey(0), x, train=True)
    )(img)
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss(params, x):
        out, mut = module.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return (
            jnp.sum(out.astype(jnp.float32))
            + sum(
                jnp.sum(v.astype(jnp.float32))
                for v in jax.tree_util.tree_leaves(mut)
            )
        )

    def step(params, x):
        return jax.grad(loss)(params, x)

    ms = device_time_ms(step, (params, img), iters=5, top=30)
    print(f"xplane trunk fwd+bwd device total: {ms:.1f} ms")


if __name__ == "__main__":
    main()
