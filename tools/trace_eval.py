"""Per-op device-time attribution of the INFERENCE pipeline (bench.py path).

bench.py's headline (completions/s at the sweet-spot batch) is "at the f32
matmul roofline" by MFU accounting, but whole-model bf16 serving only bought
+6% — meaning a large share of the eval step is NOT matmul. This tool
breaks the rendered-forward pipeline down per op (xplane) so the non-MXU
fat (renderer scatter, FPS, kNN, gathers, layout ops) is visible.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/trace_eval.py [B]
"""

from __future__ import annotations

import sys

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_microbench import device_time_ms


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews, _pcviews_render

    model = SVDFormer()
    render = PCViews(trans=-0.7, resolution=224)
    rot = jnp.asarray(render.rot)
    translation = jnp.asarray(render.translation)

    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(B, 2048, 3).astype(np.float32) * 0.5 - 0.25)
    init_partial = partial[:2]
    init_depth = render.get_img(init_partial)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), init_partial, init_depth
    )

    def pipeline(variables, partial):
        depth = _pcviews_render(
            partial, rot=rot, translation=translation, resolution=224
        )
        return model.apply(variables, partial, depth, train=False)[-1]

    ms = device_time_ms(pipeline, (variables, partial), iters=5, top=30)
    print(
        f"xplane per-op device total: {ms:.1f} ms/call (B={B}, "
        f"{B / ms * 1e3:.1f} completions/s)"
    )


if __name__ == "__main__":
    main()
