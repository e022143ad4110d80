"""EMD auction at the reference's operating scale, on the real chip.

The reference documents EMD for n=8192 points (metrics/EMD/README.md:7;
its CUDA kernel self-test runs n=8192 at emd_module.py:90-104, with hard
constraints n % 1024 == 0 and B <= 512 at emd_cuda.cu:236-249). Unit
tests cover n<=1024 on CPU; this tool validates the lax.while_loop
auction converges and performs at the documented scale on hardware.

Measured 2026-08-20 (TPU v5 lite, n=8192, B=4, random clouds in [0,1]^3):
  - train point (eps=0.005, 50 iters): 625 ms/call, ~3.1% of points
    honestly unassigned at iteration exhaustion (dist/pt 0.00151) — the
    documented approximate-train regime, emd_unassigned reports it.
  - eval point (eps=0.002, 10000 iters): 54 s/call first run; the
    while_loop exits on convergence, not iters — random-vs-random needed
    most of the budget and left 5-10 of 8192 points (0.08%) unassigned.
  - permutation recovery at the eval point (xyz2 = perm(xyz1), true
    EMD = 0): converges to dist 0.000000 with ZERO unassigned in 27
    ms/call — the auction finds the exact bijection when one exists.

Timing: the auction's trip count is data-dependent, so each timed call
re-runs the full auction; reps are chained through the input
(x1 + out*0) INSIDE the jitted fn (see docs/STATUS.md timing notes).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/emd_scale_bench.py [n] [B]
"""

from __future__ import annotations

import sys
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.ops.emd import earth_mover_distance, emd_unassigned


def run_point(name, x1, x2, eps, iters, reps=3):
    @jax.jit
    def once(x1, chain):
        dist, assign = earth_mover_distance(x1 + chain * 0.0, x2, eps, iters)
        return dist.mean(axis=1), emd_unassigned(assign)

    t0 = time.perf_counter()
    d, u = once(x1, jnp.float32(0.0))
    jax.block_until_ready((d, u))  # compile + first run
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain = jnp.float32(0.0)
    for _ in range(reps):
        d, u = once(x1, chain)
        chain = d[0] * 0.0  # data-dep chain; forces each rep to rerun
    d_host = np.asarray(d)
    u_host = np.asarray(u)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{name}: eps={eps} iters={iters}  "
        f"mean dist/point={float(d_host.mean()):.6f}  "
        f"unassigned={u_host.tolist()} ({100*u_host.mean()/x1.shape[1]:.3f}%)  "
        f"compile+first {first:.1f}s, then {dt*1e3:.0f} ms/call",
        flush=True,
    )
    return d_host, u_host, dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    assert n % 1024 == 0, "reference granularity constraint (emd_cuda.cu:236)"
    print(f"device: {jax.devices()[0].device_kind}  n={n} B={B}", flush=True)
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(B, n, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(B, n, 3).astype(np.float32))
    perm = np.stack([rng.permutation(n) for _ in range(B)])
    x1_perm = jnp.take_along_axis(x1, jnp.asarray(perm)[..., None], axis=1)

    # 1. train operating point: fast, honestly-partial assignment.
    run_point("random(train)", x1, x2, 0.005, 50)

    # 2. permutation recovery at the eval point: true EMD is exactly 0.
    d, u, _ = run_point("perm-recovery(eval)", x1, x1_perm, 0.002, 10000)
    assert u.max() == 0, f"eval point left points unassigned: {u}"
    assert d.max() < 1e-4, f"perm recovery dist {d.max()} not ~0"

    # 3. random clouds at the eval point: ~54 s/call — one rep only.
    run_point("random(eval)", x1, x2, 0.002, 10000, reps=1)
    print("OK")


if __name__ == "__main__":
    main()
