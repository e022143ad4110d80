"""Probe: eval-mode inference throughput with/without the s2d packed trunk.

The packed stage costs +78% conv FLOPs to fill 64/128 lanes. In TRAIN mode
that buys back the BN-stats HBM passes (61.3 -> 51.1 ms fwd+bwd). In EVAL
mode BN is a fused affine, so the extra FLOPs may be a pure loss. Times the
full bench.py pipeline (render + forward) at a given batch size, in-jit
chained.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/s2d_eval_probe.py {on|off} [bs]
"""

from __future__ import annotations

import sys
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "on"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.nn.resnet import set_trunk_s2d
    from svdformer_pointsea_tpu.render.pcviews import PCViews, _pcviews_render

    set_trunk_s2d(mode == "on")

    model = SVDFormer()
    render = PCViews(trans=-0.7, resolution=224)
    rot = jnp.asarray(render.rot)
    translation = jnp.asarray(render.translation)

    rng = np.random.RandomState(0)
    N = 2048

    @jax.jit
    def pipeline(variables, partial, s):
        p = partial + s * 1e-20
        depth = _pcviews_render(p, rot=rot, translation=translation, resolution=224)
        out = model.apply(variables, p, depth, train=False)[-1]
        return out, jnp.sum(out[:, 0, 0])

    init_partial = jnp.asarray(rng.rand(2, N, 3).astype(np.float32) * 0.5)
    init_depth = render.get_img(init_partial)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_partial, init_depth)

    partial = jnp.asarray(rng.rand(bs, N, 3).astype(np.float32) * 0.5 - 0.25)
    s = jnp.float32(0.0)
    out, s = pipeline(variables, partial, s)
    out.block_until_ready()

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out, s = pipeline(variables, partial, s)
    _ = float(s)
    dt = (time.perf_counter() - t0) / n_iter
    print(
        f"s2d={mode} bs={bs}: {dt * 1e3:.2f} ms/call, "
        f"{bs / dt:.1f} completions/s"
    )


if __name__ == "__main__":
    main()
