"""EMD eval-operating-point practicality study (VERDICT r4 #9).

Round 4 measured the documented eval operating point (eps=0.002,
iters=10000, metrics/EMD/README.md:7) at 49.9 s/call for n=8192
RANDOM-vs-random clouds on chip. This study quantifies iters-to-convergence
(the while_loop's early exit: every point assigned) across CLOUD-PAIR
STRUCTURE, because random-vs-random is the auction's adversarial case —
uniform value surfaces force long bidding wars — while the metric's actual
use is completion-vs-ground-truth, where most points have a clearly best
match.

Cases (B=2):
  perm        xyz2 = permutation of xyz1 (true EMD 0; known 27 ms at 8192)
  jitter1e-2  xyz2 = xyz1 + N(0, 0.01)   (near-converged completion)
  jitter3e-2  xyz2 = xyz1 + N(0, 0.03)   (mid-training completion)
  resample    two independent n-subsamples of one 4n-point surface
              (the realistic eval pairing: pred and gt sample the same
              underlying surface differently)
  random      uniform vs uniform          (adversarial reference case)

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH \
      python tools/emd_convergence_study.py [n=1024] [eps ...]
On chip omit JAX_PLATFORMS (n=8192 recommended there).
"""

from __future__ import annotations

import sys
import time

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from svdformer_pointsea_tpu.ops import emd_convergence


def make_surface(rng, n):
    """Smooth synthetic surface sample in [0,1]^3 (sphere + lobes)."""
    u = rng.rand(n) * 2 * np.pi
    v = np.arccos(rng.rand(n) * 2 - 1)
    r = 0.35 * (1.0 + 0.15 * np.sin(3 * u) * np.sin(2 * v))
    pts = np.stack(
        [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)],
        axis=-1,
    )
    return (pts + 0.5).astype(np.float32)


def build_cases(n, seed=0):
    rng = np.random.RandomState(seed)
    B = 2
    surf = np.stack([make_surface(rng, 4 * n) for _ in range(B)])
    base = np.stack([make_surface(rng, n) for _ in range(B)])
    cases = {}
    perm = np.stack([rng.permutation(n) for _ in range(B)])
    cases["perm"] = (base, np.take_along_axis(base, perm[..., None], axis=1))
    for sig, name in ((0.01, "jitter1e-2"), (0.03, "jitter3e-2")):
        noisy = np.clip(base + rng.randn(B, n, 3).astype(np.float32) * sig, 0, 1)
        cases[name] = (base, noisy.astype(np.float32))
    idx1 = np.stack([rng.choice(4 * n, n, replace=False) for _ in range(B)])
    idx2 = np.stack([rng.choice(4 * n, n, replace=False) for _ in range(B)])
    cases["resample"] = (
        np.take_along_axis(surf, idx1[..., None], axis=1),
        np.take_along_axis(surf, idx2[..., None], axis=1),
    )
    cases["random"] = (
        rng.rand(B, n, 3).astype(np.float32),
        rng.rand(B, n, 3).astype(np.float32),
    )
    return cases


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    epss = [float(e) for e in sys.argv[2:]] or [0.002, 0.005]
    iters = 10000
    fn = jax.jit(emd_convergence, static_argnums=(2, 3))
    cases = build_cases(n)
    print(f"n={n} iters_budget={iters} (eval point is eps=0.002)")
    print(f"{'case':<12}{'eps':<8}{'iters_used':<12}{'unassigned':<12}"
          f"{'dist/pt':<12}{'s/call':<8}")
    for name, (a, b) in cases.items():
        for eps in epss:
            d, asg, t = jax.block_until_ready(fn(a, b, eps, iters))
            t0 = time.perf_counter()
            d, asg, t = jax.block_until_ready(fn(a, b, eps, iters))
            dt = time.perf_counter() - t0
            un = int(np.sum(np.asarray(asg) < 0))
            print(f"{name:<12}{eps:<8}{int(t):<12}{un:<12}"
                  f"{float(np.mean(np.asarray(d))):<12.6f}{dt:<8.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
