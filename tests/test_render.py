"""Renderer tests: PCViews scatter math vs numpy transcription + shapes."""

import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.render import PCViews, PCViewsReal, points2depth
from svdformer_pointsea_tpu.render.pcviews import euler2mat


def _points2depth_numpy(points, H, W):
    """Literal numpy transcription of model_utils.py:1080-1115 (1x1 splat)."""
    eps = 1e-12
    B, P, _ = points.shape
    z = points[:, :, 2]
    coord_x = points[:, :, 0] / (z + eps) * (W / H)
    coord_y = points[:, :, 1] / (z + eps)
    _x = (coord_x + 1) * H / 2
    _y = (coord_y + 1) * W / 2
    ex = np.ceil(_x - 0.5)
    ey = np.ceil(_y - 0.5)
    mask = (ex >= 0) & (ex <= H - 1) & (ey >= 0) & (ey <= W - 1) & (z >= 0)
    ex = np.mod(ex, H)
    ey = np.mod(ey, W)
    weight = mask.astype(np.float32) / (z + eps)
    wval = z * weight
    out_w = np.zeros((B, H * W), np.float32)
    out_v = np.zeros((B, H * W), np.float32)
    coords = (ex * W + ey).astype(np.int64)
    for b in range(B):
        np.add.at(out_w[b], coords[b], weight[b])
        np.add.at(out_v[b], coords[b], wval[b])
    out_w[out_w == 0.0] = 1.0
    return (out_v / out_w).reshape(B, H, W)


def test_points2depth_matches_numpy(rng):
    pts = rng.rand(2, 200, 3).astype(np.float32)
    pts[:, :, 2] += 0.5  # in front of camera
    got = np.asarray(points2depth(jnp.asarray(pts), 32, 32, 1, 1))
    ref = _points2depth_numpy(pts, 32, 32)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_euler2mat_is_rotation():
    angles = np.asarray([[0.3, -0.5, 1.2], [np.pi / 2, 0, np.pi / 2]])
    mats = euler2mat(angles)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_pcviews_shapes_and_render(rng):
    render = PCViews(trans=-0.7, resolution=64)
    pts = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32) * 0.5 - 0.25)
    img = render.get_img(pts)
    assert img.shape == (2, 3, 64, 64)
    # Views at distance 0.7 should see the object: nonzero pixels in each view.
    nz = np.asarray((img != 0).sum(axis=(2, 3)))
    assert np.all(nz > 10)


def test_pcviews_deterministic(rng):
    render = PCViews(trans=-0.7, resolution=32)
    pts = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32) * 0.4)
    a = np.asarray(render.get_img(pts))
    b = np.asarray(render.get_img(pts))
    np.testing.assert_array_equal(a, b)


def test_pcviews_real_shapes(rng):
    render = PCViewsReal(trans=-0.7)
    pts = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32) - 0.5)
    img = np.asarray(render.get_img(pts))
    assert img.shape == (6, 224, 224, 3)  # (B*V, H, W, 3) channels-last
    assert np.all(np.isfinite(img))
    assert img.min() >= -1e-5 and img.max() <= 1 + 1e-5
    # Inverted depth: background is 1, object darker.
    assert (img < 0.99).mean() > 0.001
