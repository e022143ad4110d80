"""Auction EMD tests (metrics/EMD semantics: emd_module.py:83-104).

The reference self-test re-gathers the assignment and checks the distance;
we additionally compare total cost against scipy's exact optimal matching
on small instances (auction with eps slack is near-optimal, not exact).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.ops import earth_mover_distance


def test_emd_identity_permutation(rng):
    """Matching a cloud against a permutation of itself costs ~0."""
    n = 64
    x = rng.rand(2, n, 3).astype(np.float32)
    perm = np.stack([rng.permutation(n) for _ in range(2)])
    y = np.take_along_axis(x, perm[..., None], axis=1)
    dist, assignment = earth_mover_distance(
        jnp.asarray(x), jnp.asarray(y), eps=0.002, iters=5000
    )
    a = np.asarray(assignment)
    assert (a >= 0).all(), "auction left points unassigned"
    # perfect matching: every target index used exactly once
    for b in range(2):
        assert len(set(a[b].tolist())) == n
    assert float(jnp.sum(dist)) < 1e-6


def test_emd_assignment_consistency(rng):
    """dist equals the re-gathered squared distance of the assignment
    (the reference's test_emd check, emd_module.py:90-104)."""
    x = rng.rand(2, 128, 3).astype(np.float32)
    y = rng.rand(2, 128, 3).astype(np.float32)
    dist, assignment = earth_mover_distance(
        jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=2000
    )
    a = np.asarray(assignment)
    assert (a >= 0).all()
    matched = np.take_along_axis(y, a[..., None], axis=1)
    np.testing.assert_allclose(
        np.asarray(dist), np.sum((x - matched) ** 2, -1), atol=1e-6
    )


def test_emd_near_optimal_vs_scipy(rng):
    """Total auction cost is within the eps slack of the exact optimum."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    n = 48
    x = rng.rand(1, n, 3).astype(np.float32)
    y = rng.rand(1, n, 3).astype(np.float32)
    dist, _ = earth_mover_distance(
        jnp.asarray(x), jnp.asarray(y), eps=0.001, iters=10000
    )
    cost = float(jnp.sum(dist))
    d2 = np.sum((x[0, :, None, :] - y[0, None, :, :]) ** 2, -1)
    r, c = scipy_opt.linear_sum_assignment(d2)
    optimal = float(d2[r, c].sum())
    assert cost >= optimal - 1e-6
    assert cost <= optimal + n * 0.001 * 3  # eps-suboptimality bound


@pytest.mark.heavy
def test_emd_reference_granularity_1024(rng):
    """n=1024 — the reference CUDA kernel's granularity unit (hard
    constraint n % 1024 == 0, B <= 512 at emd_cuda.cu:236-249; ours has no
    such constraint) — at both documented operating points
    (metrics/EMD/README.md:7), VERDICT r3 next #4's CPU-sized leg.

    Train point (eps=0.005, iters=50): the budget is too small to settle
    every contested point at this scale — partial assignment must be
    accounted honestly (assigned rows re-gather exactly, unassigned rows
    are the zero-dist ones, no object owned twice).

    Eval point (eps=0.002, iters=10000): full bijection, and total
    *euclidean* cost within the auction's eps-suboptimality bound
    (n * eps) of scipy's exact optimum — the auction optimizes
    value = 3 - ||d|| - price, so the theory bound lives in sqrt space.
    """
    scipy_opt = pytest.importorskip("scipy.optimize")
    from svdformer_pointsea_tpu.ops import emd_unassigned

    n = 1024
    x = rng.rand(2, n, 3).astype(np.float32)
    y = rng.rand(2, n, 3).astype(np.float32)

    dist, a = earth_mover_distance(
        jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=50
    )
    a_np, d_np = np.asarray(a), np.asarray(dist)
    assigned = a_np >= 0
    matched = np.take_along_axis(y, np.maximum(a_np, 0)[..., None], axis=1)
    np.testing.assert_allclose(
        d_np[assigned],
        np.sum((x - matched) ** 2, -1)[assigned],
        atol=1e-6,
    )
    assert (d_np[~assigned] == 0).all()
    for b in range(2):  # an object has at most one owner mid-auction
        owned = a_np[b][assigned[b]]
        assert len(np.unique(owned)) == len(owned)
    np.testing.assert_array_equal(
        np.asarray(emd_unassigned(a)), (~assigned).sum(axis=1)
    )

    dist2, a2 = earth_mover_distance(
        jnp.asarray(x), jnp.asarray(y), eps=0.002, iters=10000
    )
    a2_np = np.asarray(a2)
    assert int(np.asarray(emd_unassigned(a2)).max()) == 0
    for b in range(2):
        assert len(np.unique(a2_np[b])) == n  # exact bijection
        d = np.sqrt(
            ((x[b, :, None, :] - y[b, None, :, :]) ** 2).sum(-1)
        )
        r, c = scipy_opt.linear_sum_assignment(d)
        optimal = float(d[r, c].sum())
        got = float(np.sqrt(np.maximum(np.asarray(dist2)[b], 0.0)).sum())
        assert got >= optimal - 1e-4
        assert got <= optimal + n * 0.002, (got, optimal)


def test_emd_unassigned_accounting(rng):
    """Converged auctions report zero unmatched points; a starved iteration
    budget reports them instead of silently zeroing dist (ops/emd.py)."""
    from svdformer_pointsea_tpu.ops import emd_unassigned

    x1 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    _, assignment = earth_mover_distance(x1, x2, eps=0.002, iters=5000)
    assert int(emd_unassigned(assignment).max()) == 0

    dist0, a0 = earth_mover_distance(x1, x2, eps=0.005, iters=1)
    n_un = emd_unassigned(a0)
    # One iteration cannot settle every contested point...
    assert int(n_un.max()) > 0
    # ...and exactly the unassigned rows carry the silent zeros.
    zeros = (np.asarray(dist0) == 0).sum(axis=1)
    assert (np.asarray(n_un) <= zeros).all()


def test_emd_convergence_diagnostic(rng):
    """emd_convergence (VERDICT r4 #9): same dist/assignment as the public
    fn, plus iters-to-convergence — structure-dependent (a permutation
    pair settles in ~2 iterations, a random pair takes many more)."""
    from svdformer_pointsea_tpu.ops import emd_convergence

    x1 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    d1, a1 = earth_mover_distance(x1, x2, eps=0.005, iters=500)
    d2, a2, t_rand = emd_convergence(x1, x2, eps=0.005, iters=500)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert 0 < int(t_rand) <= 500

    perm = np.stack([np.random.RandomState(3).permutation(64) for _ in range(2)])
    xp = jnp.take_along_axis(x1, jnp.asarray(perm)[..., None], axis=1)
    _, ap, t_perm = emd_convergence(x1, xp, eps=0.005, iters=500)
    assert int(t_perm) < int(t_rand)
    from svdformer_pointsea_tpu.ops import emd_unassigned
    assert int(emd_unassigned(ap).max()) == 0
