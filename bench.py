"""End-of-round benchmark: PCN completion throughput on one TPU chip.

Measures the full inference path of the flagship SVDFormer model at PCN
geometry — self-view depth rendering (3x224x224) + forward pass
(2048-pt partial -> 16384-pt completion) — in completions/sec on a single
chip, steady-state (post-compile), best batch size among a small sweep.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` scales against the BASELINE.md target of >= 2x A100
completions/sec/chip. The reference publishes no A100 number (BASELINE.md),
so we use a documented estimate of 30 completions/s for the PyTorch
reference on one A100 (batched eval; dominated by the 2048-token SDG
attention, per-stage CUDA chamfer, and the tiny-ResNet at stride-1 224^2),
making the target 60/s: vs_baseline = value / 60.
"""

from __future__ import annotations

import json
import time

import jax

# Persistent compile cache: tunnel compiles are minutes; amortize them.
from svdformer_pointsea_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

A100_REF_ESTIMATE = 30.0  # completions/s, documented assumption (see above)
TARGET = 2.0 * A100_REF_ESTIMATE


def main() -> None:
    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews, _pcviews_render

    model = SVDFormer()
    render = PCViews(trans=-0.7, resolution=224)
    rot = jnp.asarray(render.rot)
    translation = jnp.asarray(render.translation)

    rng = np.random.RandomState(0)
    N = 2048

    def make_pipeline(batch):
        @jax.jit
        def pipeline(variables, partial):
            depth = _pcviews_render(
                partial, rot=rot, translation=translation, resolution=224
            )
            return model.apply(variables, partial, depth, train=False)[-1]

        return pipeline

    best = 0.0
    best_bs = 0
    init_partial = jnp.asarray(rng.rand(2, N, 3).astype(np.float32) * 0.5)
    init_depth = render.get_img(init_partial)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_partial, init_depth)

    for bs in (8, 16, 32, 40, 64, 80):
        partial = jnp.asarray(rng.rand(bs, N, 3).astype(np.float32) * 0.5 - 0.25)
        pipeline = make_pipeline(bs)
        try:
            out = pipeline(variables, partial)
            out.block_until_ready()
        except Exception:
            continue
        # steady-state timing
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = pipeline(variables, partial)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iter
        rate = bs / dt
        if rate > best:
            best, best_bs = rate, bs

    print(
        json.dumps(
            {
                "metric": f"pcn_completions_per_sec_chip(bs={best_bs})",
                "value": round(best, 2),
                "unit": "completions/s",
                "vs_baseline": round(best / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
