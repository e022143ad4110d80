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
