"""Loss / metric calculator tests vs independent numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from svdformer_pointsea_tpu.losses import (
    calc_cd,
    calc_dcd,
    chamfer,
    chamfer_single_side,
    chamfer_sqrt,
    get_loss,
    get_loss_pm,
)


def _nn_sq(a, b):
    d = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, -1)
    return d.min(2), d.argmin(2), d.min(1), d.argmin(1)


def test_chamfer_losses_vs_numpy(rng):
    a = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(2, 48, 3), jnp.float32)
    d1, _, d2, _ = _nn_sq(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(chamfer(a, b)), d1.mean() + d2.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(chamfer_sqrt(a, b)),
        (np.sqrt(d1).mean() + np.sqrt(d2).mean()) / 2,
        rtol=1e-4,
    )
    np.testing.assert_allclose(float(chamfer_single_side(a, b)), d1.mean(), rtol=1e-5)


def test_get_loss_pyramid(rng):
    pc = jnp.asarray(rng.rand(2, 32, 3), jnp.float32)
    p1 = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    p2 = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
    total, parts = get_loss((pc, p1, p2), gt, sqrt=True)
    assert np.isclose(float(total), sum(float(p) for p in parts), rtol=1e-5)
    total_pm, _ = get_loss_pm((pc, p1, p2), p1, gt, sqrt=True)
    assert float(total_pm) > 0


def test_get_loss_differentiable(rng):
    gt = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    pc = jnp.asarray(rng.rand(1, 16, 3), jnp.float32)
    p1 = jnp.asarray(rng.rand(1, 32, 3), jnp.float32)

    def f(p2):
        return get_loss((pc, p1, p2), gt, sqrt=True)[0]

    g = jax.grad(f)(jnp.asarray(rng.rand(1, 64, 3), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_calc_cd_reference_arg_order(rng):
    out = jnp.asarray(rng.rand(2, 96, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    cd_p, cd_t, f1 = calc_cd(out, gt, calc_f1=True)
    # dist1 = gt->out, dist2 = out->gt (reference swaps args).
    d1, _, d2, _ = _nn_sq(np.asarray(gt), np.asarray(out))
    ref_p = (np.sqrt(d1).mean(1) + np.sqrt(d2).mean(1)) / 2
    ref_t = d1.mean(1) + d2.mean(1)
    np.testing.assert_allclose(np.asarray(cd_p), ref_p, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cd_t), ref_t, rtol=1e-4)
    assert f1.shape == (2,)
    assert np.all((np.asarray(f1) >= 0) & (np.asarray(f1) <= 1))


def test_calc_dcd_vs_numpy(rng):
    x = np.asarray(rng.rand(2, 48, 3), np.float32)
    gt = np.asarray(rng.rand(2, 32, 3), np.float32)
    dcd, cd_p, cd_t = calc_dcd(jnp.asarray(x), jnp.asarray(gt))
    # numpy transcription of utils/loss_utils.py:117-155
    d1, i1, d2, i2 = _nn_sq(gt, x)  # chamfer(gt, x)
    alpha, n_x, n_gt = 1000.0, 48, 32
    exp1, exp2 = np.exp(-d1 * alpha), np.exp(-d2 * alpha)
    ref = []
    for b in range(2):
        c1 = np.bincount(i1[b], minlength=n_x)[i1[b]].astype(np.float64)
        w1 = 1.0 / (c1 + 1e-6) * (n_gt / n_x)
        l1 = (1 - exp1[b] * w1).mean()
        c2 = np.bincount(i2[b], minlength=n_gt)[i2[b]].astype(np.float64)
        w2 = 1.0 / (c2 + 1e-6) * (n_x / n_gt)
        l2 = (1 - exp2[b] * w2).mean()
        ref.append((l1 + l2) / 2)
    np.testing.assert_allclose(np.asarray(dcd), ref, rtol=1e-4)


def test_identical_clouds_give_zero_cd(rng):
    x = jnp.asarray(rng.rand(1, 32, 3), jnp.float32)
    # The matmul distance formulation carries ~1e-7 absolute cancellation
    # noise (the CUDA reference computes (x-y)^2 directly and returns exact
    # zeros) — negligible at the 1e-4 metric scales.
    cd_p, cd_t = calc_cd(x, x)
    assert float(cd_t[0]) < 1e-6
    dcd, _, _ = calc_dcd(x, x)
    assert float(dcd[0]) < 1e-3
