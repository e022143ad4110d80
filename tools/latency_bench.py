"""Single-request completion latency on one chip (serving operating point).

bench.py reports best-throughput completions/s (bs sweep); this measures the
other end of the serving envelope: end-to-end latency of ONE partial cloud
-> render -> 16384-pt completion, plus a small batch sweep so the
latency/throughput trade-off is documented.

Timing recipe (memory-documented axon gotcha): chain a data dependency
through every iteration INSIDE the jitted fn — the input perturbation must
be part of the compiled graph. An EAGER chaining add costs ~80 ms/iter of
tunnel round trips and poisons the measurement (verified: in-jit chaining
== unchained at 144.8 vs 144.9 ms, bs40 pipeline). Final sync via float().

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/latency_bench.py
"""

from __future__ import annotations

import json
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = 2048
ITERS = 50


def main() -> None:
    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews, _pcviews_render

    model = SVDFormer()
    render = PCViews(trans=-0.7, resolution=224)
    rot = jnp.asarray(render.rot)
    translation = jnp.asarray(render.translation)
    rng = np.random.RandomState(0)

    @jax.jit
    def pipeline(variables, partial, s):
        # In-jit chain: input depends on the previous call's scalar.
        p = partial + s * 1e-20
        depth = _pcviews_render(
            p, rot=rot, translation=translation, resolution=224
        )
        out = model.apply(variables, p, depth, train=False)[-1]
        return out, jnp.sum(out[:, 0, 0])

    init = jnp.asarray(rng.rand(2, N, 3).astype(np.float32) * 0.5)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), init, render.get_img(init)
    )

    results = {}
    for bs in (1, 2, 4, 8):
        partial = jnp.asarray(rng.rand(bs, N, 3).astype(np.float32) * 0.5 - 0.25)
        s = jnp.float32(0.0)
        out, s = pipeline(variables, partial, s)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, s = pipeline(variables, partial, s)
        _ = float(s)  # the only sync the tunnel respects
        dt = (time.perf_counter() - t0) / ITERS
        results[f"bs{bs}"] = {
            "latency_ms": round(dt * 1e3, 2),
            "completions_per_sec": round(bs / dt, 1),
        }
        print(f"bs={bs}: {dt*1e3:.2f} ms/call ({bs/dt:.1f} completions/s)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
