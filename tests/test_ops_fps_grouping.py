"""FPS / grouping / ball-query tests, incl. reference-quirk goldens."""

import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.ops import (
    ball_query,
    fps_subsample,
    furthest_point_sample,
    furthest_point_sample_ref,
    gather_points,
    grouping_operation,
    sample_and_group_all,
    sample_and_group_knn,
    group_local,
)


def _fps_numpy(xyz, m):
    """Literal transcription of sampling_gpu.cu:69-229 semantics."""
    B, N, _ = xyz.shape
    out = np.zeros((B, m), np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, np.float32)
        mag = np.sum(xyz[b] ** 2, -1)
        valid = mag > 1e-3
        old = 0
        for j in range(1, m):
            d = np.sum((xyz[b] - xyz[b, old]) ** 2, -1)
            temp = np.minimum(temp, d)
            best, besti = -1.0, 0
            for k in range(N):
                if not valid[k]:
                    continue
                if temp[k] > best:
                    best, besti = temp[k], k
            out[b, j] = old = besti
    return out


def test_fps_matches_cuda_semantics(rng):
    xyz = rng.rand(2, 128, 3).astype(np.float32) + 0.5
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
    ref = _fps_numpy(xyz, 32)
    np.testing.assert_array_equal(got, ref)


def test_fps_origin_skip_quirk(rng):
    # Points near the origin (mag <= 1e-3) must never be selected.
    xyz = rng.rand(1, 64, 3).astype(np.float32) + 0.5
    xyz[0, 10] = 0.0
    xyz[0, 20] = 0.01  # mag 3e-4 <= 1e-3 -> also skipped
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 40))
    assert 10 not in idx[0, 1:]
    assert 20 not in idx[0, 1:]
    assert idx[0, 0] == 0  # start-at-0 even though index 0 is a normal point


def test_fps_first_index_always_zero(rng):
    xyz = jnp.asarray(rng.rand(3, 50, 3), jnp.float32)
    idx = np.asarray(furthest_point_sample(xyz, 10))
    assert np.all(idx[:, 0] == 0)


def test_fps_ref_dispatch_equal(rng):
    xyz = jnp.asarray(rng.rand(2, 100, 3), jnp.float32)
    a = np.asarray(furthest_point_sample(xyz, 16))
    b = np.asarray(furthest_point_sample_ref(xyz, 16))
    np.testing.assert_array_equal(a, b)


def test_fps_subsample_shape(rng):
    pcd = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
    out = fps_subsample(pcd, 64)
    assert out.shape == (2, 64, 3)
    # Identity when already the right size.
    assert fps_subsample(pcd, 256) is pcd


def test_gather_and_grouping(rng):
    pts = jnp.asarray(rng.rand(2, 30, 5), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 30, (2, 7)), jnp.int32)
    g = np.asarray(gather_points(pts, idx))
    for b in range(2):
        np.testing.assert_allclose(g[b], np.asarray(pts)[b, np.asarray(idx)[b]])
    gidx = jnp.asarray(rng.randint(0, 30, (2, 7, 4)), jnp.int32)
    gr = np.asarray(grouping_operation(pts, gidx))
    assert gr.shape == (2, 7, 4, 5)
    for b in range(2):
        np.testing.assert_allclose(gr[b], np.asarray(pts)[b, np.asarray(gidx)[b]])


def _ball_query_numpy(radius, nsample, xyz, new_xyz):
    """Literal transcription of ball_query_gpu.cu:9-54."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    idx = np.zeros((B, S, nsample), np.int32)
    r2 = radius * radius
    for b in range(B):
        for j in range(S):
            cnt = 0
            for k in range(N):
                if cnt >= nsample:
                    break
                d2 = np.sum((new_xyz[b, j] - xyz[b, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[b, j, :] = k
                    idx[b, j, cnt] = k
                    cnt += 1
    return idx


def test_ball_query_pad_with_first(rng):
    xyz = rng.rand(2, 60, 3).astype(np.float32)
    new_xyz = xyz[:, ::10].copy()
    got = np.asarray(ball_query(0.2, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    ref = _ball_query_numpy(0.2, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, ref)


def test_ball_query_no_hits(rng):
    xyz = jnp.asarray(rng.rand(1, 20, 3), jnp.float32)
    far = jnp.ones((1, 3, 3), jnp.float32) * 100.0
    got = np.asarray(ball_query(0.1, 4, xyz, far))
    np.testing.assert_array_equal(got, 0)


def test_sample_and_group_knn_shapes(rng):
    xyz = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(2, 128, 16), jnp.float32)
    new_xyz, new_points, idx, grouped = sample_and_group_knn(xyz, feats, 32, 8)
    assert new_xyz.shape == (2, 32, 3)
    assert new_points.shape == (2, 32, 8, 19)  # xyz-relative (3) + feats (16)
    assert idx.shape == (2, 32, 8)
    assert grouped.shape == (2, 32, 8, 3)
    # Relative coords of the self neighbour should be ~0.
    np.testing.assert_allclose(np.asarray(grouped)[:, :, 0, :], 0.0, atol=1e-6)


def test_sample_and_group_all_shapes(rng):
    xyz = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(2, 64, 10), jnp.float32)
    new_xyz, new_points, idx, grouped = sample_and_group_all(xyz, feats)
    assert new_xyz.shape == (2, 1, 3)
    assert new_points.shape == (2, 1, 64, 13)
    assert idx.shape == (2, 1, 64)
    assert grouped.shape == (2, 1, 64, 3)


def test_group_local(rng):
    xyz = jnp.asarray(rng.rand(2, 40, 3), jnp.float32)
    grouped, idx = group_local(xyz, k=6, return_idx=True)
    assert grouped.shape == (2, 40, 6, 3)
    # include_self: nearest neighbour of each point is itself.
    np.testing.assert_array_equal(np.asarray(idx)[:, :, 0], np.arange(40)[None, :].repeat(2, 0))


def test_fps_batch_plan_constraints():
    """Chunked-grid plan: VMEM cap respected, Mosaic's batch-dim rule
    (multiple of 8 or the whole array) always satisfiable via padding."""
    from svdformer_pointsea_tpu.ops.fps import _fps_batch_plan

    for B in (1, 5, 7, 9, 12, 16, 24, 31, 32, 64, 128):
        for npad in (128, 2048, 16384, 65536):
            bpad, chunk = _fps_batch_plan(B, npad)
            cap = max(1, 12 * 1024 * 1024 // (40 * npad))
            assert bpad >= B and bpad % chunk == 0, (B, npad, bpad, chunk)
            assert chunk == bpad or chunk % 8 == 0, (B, npad, bpad, chunk)
            assert chunk <= max(cap, 8), (B, npad, bpad, chunk)
