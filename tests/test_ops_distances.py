"""Kernel-vs-oracle tests for distances/chamfer/3nn (SURVEY §4 plan a/b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.ops import (
    chamfer_distance,
    chamfer_distance_ref,
    query_knn,
    square_distance,
    three_interpolate,
    three_nn,
    nearest_distances,
)


def _clouds(rng, b=2, n=100, m=60):
    return (
        jnp.asarray(rng.rand(b, n, 3), jnp.float32),
        jnp.asarray(rng.rand(b, m, 3), jnp.float32),
    )


def test_square_distance_matches_numpy(rng):
    a, b = _clouds(rng)
    d = np.asarray(square_distance(a, b))
    ref = np.sum((np.asarray(a)[:, :, None, :] - np.asarray(b)[:, None, :, :]) ** 2, -1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_chamfer_matches_ref(rng):
    a, b = _clouds(rng, n=512, m=256)
    d1, d2, i1, i2 = chamfer_distance(a, b)
    r1, r2, j1, j2 = chamfer_distance_ref(a, b)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(j2))


def test_chamfer_tiling_kicks_in(rng):
    # Force multiple chunks by using a larger N.
    a, b = _clouds(rng, b=1, n=2048, m=512)
    d1, d2, i1, i2 = chamfer_distance(a, b)
    r1, r2, j1, j2 = chamfer_distance_ref(a, b)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(j1))


def test_chamfer_grad_matches_autodiff_of_ref(rng):
    a, b = _clouds(rng, b=2, n=64, m=48)

    def loss_tiled(a, b):
        d1, d2, _, _ = chamfer_distance(a, b)
        return jnp.mean(d1) + jnp.mean(d2)

    def loss_ref(a, b):
        d1, d2, _, _ = chamfer_distance_ref(a, b)
        return jnp.mean(d1) + jnp.mean(d2)

    g1 = jax.grad(loss_tiled, argnums=(0, 1))(a, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-5)


def test_chamfer_sqrt_grad_finite(rng):
    # chamfer_sqrt-style losses take sqrt of the output; gradient must stay
    # finite even with zero distances (identical points).
    a, _ = _clouds(rng, b=1, n=32, m=32)

    def loss(x):
        d1, d2, _, _ = chamfer_distance(x, a)
        return jnp.mean(jnp.sqrt(d1 + 1e-12))

    g = jax.grad(loss)(a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_query_knn_orders_ascending(rng):
    a, b = _clouds(rng, b=1, n=40, m=40)
    idx = np.asarray(query_knn(8, b, a))
    d = np.asarray(square_distance(a, b))[0]
    for i in range(40):
        got = d[i, idx[0, i]]
        assert np.all(np.diff(got) >= -1e-6)
        ref = np.sort(d[i])[:8]
        np.testing.assert_allclose(np.sort(got), ref, atol=1e-5)


def test_query_knn_exclude_self(rng):
    a, _ = _clouds(rng, b=1, n=30)
    idx = np.asarray(query_knn(4, a, a, include_self=False))
    for i in range(30):
        assert i not in idx[0, i]


def test_three_nn_and_interpolate(rng):
    unknown, known = _clouds(rng, b=2, n=50, m=20)
    dist, idx = three_nn(unknown, known)
    d = np.sqrt(np.maximum(np.asarray(square_distance(unknown, known)), 0))
    for bi in range(2):
        for i in range(50):
            np.testing.assert_allclose(
                np.asarray(dist)[bi, i], np.sort(d[bi, i])[:3], atol=1e-4
            )
    feats = jnp.asarray(np.random.RandomState(1).rand(2, 20, 7), jnp.float32)
    w = jnp.ones((2, 50, 3)) / 3.0
    out = three_interpolate(feats, idx, w)
    assert out.shape == (2, 50, 7)
    ref = np.mean(np.asarray(feats)[np.arange(2)[:, None, None], np.asarray(idx)], axis=2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_nearest_distances(rng):
    a, b = _clouds(rng, b=2, n=33, m=44)
    nd = np.asarray(nearest_distances(a, b))
    ref = np.sqrt(
        np.min(np.maximum(np.asarray(square_distance(a, b)), 0), axis=-1)
    )
    np.testing.assert_allclose(nd, ref, atol=1e-5)
