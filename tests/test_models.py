"""Model forward-pass shape tests (reduced sizes for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.nn import (
    GeoSpecNet,
    PointDiscriminator,
    PointSea,
    SVDFormer,
)

B, N = 2, 512


def _inputs(rng, views=3, res=32, img_ch=None):
    partial = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    if img_ch is None:
        depth = jnp.asarray(rng.rand(B, views, res, res), jnp.float32)
    else:
        depth = jnp.asarray(rng.rand(B * views, res, res, img_ch), jnp.float32)
    return partial, depth


@pytest.fixture(scope="module")
def small_svdformer():
    return SVDFormer(step1=2, step2=2, merge_points=128, local_points=128)


def test_svdformer_shapes(rng, small_svdformer):
    partial, depth = _inputs(rng)
    model = small_svdformer
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)
    coarse, fine1, fine2 = jax.jit(model.apply)(variables, partial, depth)
    assert coarse.shape == (B, 256, 3)  # seed stage always emits 256 points
    assert fine1.shape == (B, 128 * 2, 3)
    assert fine2.shape == (B, 128 * 2 * 2, 3)
    for out in (coarse, fine1, fine2):
        assert np.all(np.isfinite(np.asarray(out)))


def test_svdformer_train_mode_updates_batch_stats(rng, small_svdformer):
    partial, depth = _inputs(rng)
    model = small_svdformer
    variables = jax.jit(lambda k, p, d: model.init(k, p, d, train=True))(
        jax.random.PRNGKey(0), partial, depth
    )
    assert "batch_stats" in variables
    outs, mutated = jax.jit(
        lambda v, p, d: model.apply(v, p, d, train=True, mutable=["batch_stats"])
    )(variables, partial, depth)
    assert "batch_stats" in mutated
    # Running stats must actually change.
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(before, after)
    )
    assert changed


def test_svdformer_grad_flows(rng, small_svdformer):
    partial, depth = _inputs(rng)
    model = small_svdformer
    variables = model.init(jax.random.PRNGKey(0), partial, depth)

    def loss_fn(params):
        c, f1, f2 = model.apply({"params": params, **{
            k: v for k, v in variables.items() if k != "params"}}, partial, depth)
        return jnp.mean(f2**2) + jnp.mean(f1**2) + jnp.mean(c**2)

    # jit: eager whole-model grad is ~80 s of op-by-op CPU dispatch; the
    # compiled version hits the persistent test cache.
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    # The overwhelming majority of parameters should receive gradient.
    nonzero = sum(n > 0 for n in norms)
    assert nonzero / len(norms) > 0.9


def test_svdformer_55_decoder_variant(rng):
    # ShapeNet-55 configs use plain attention decoders instead of SDG_Decoder.
    model = SVDFormer(
        step1=2, step2=2, merge_points=128, local_points=128, sdg_decoder=False
    )
    partial, depth = _inputs(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)
    coarse, fine1, fine2 = jax.jit(model.apply)(variables, partial, depth)
    assert fine2.shape == (B, 512, 3)


def test_geospecnet_shapes(rng):
    model = GeoSpecNet(step1=2, step2=2, merge_points=128, local_points=128)
    partial, depth = _inputs(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)
    coarse, fine1, fine2 = jax.jit(model.apply)(variables, partial, depth)
    assert coarse.shape == (B, 256, 3)  # seed stage always emits 256 points
    assert fine2.shape == (B, 512, 3)


def test_discriminator_shapes(rng):
    model = PointDiscriminator()
    pcd = jnp.asarray(rng.rand(B, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pcd)
    logits = model.apply(variables, pcd)
    assert logits.shape == (B,)


def test_pointsea_shapes(rng):
    model = PointSea(step1=2, step2=2, merge_points=128, local_points=128)
    partial, depth = _inputs(rng, res=64, img_ch=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)
    coarse, fine1, fine2 = jax.jit(model.apply)(variables, partial, depth)
    assert coarse.shape == (B, 256, 3)  # seed stage always emits 256 points
    assert fine1.shape == (B, 256, 3)
    assert fine2.shape == (B, 512, 3)


def test_mixed_precision_switch(rng, small_svdformer):
    """nn.set_mixed_precision flips the trunk to bf16 compute (params stay
    f32, outputs f32) and changes results only within bf16 round-off."""
    from svdformer_pointsea_tpu.nn import mixed_precision_enabled, set_mixed_precision

    partial, depth = _inputs(rng)
    model = small_svdformer
    variables = model.init(jax.random.PRNGKey(0), partial, depth)
    base = model.apply(variables, partial, depth)
    assert not mixed_precision_enabled()
    set_mixed_precision(True)
    try:
        assert mixed_precision_enabled()
        outs = model.apply(variables, partial, depth)
        engaged = False
        for o, b in zip(outs, base):
            assert o.dtype == jnp.float32
            assert np.all(np.isfinite(np.asarray(o)))
            engaged = engaged or not np.allclose(np.asarray(o), np.asarray(b))
        # The switch must actually change the computation (bf16 round-off;
        # at RANDOM init the shift amplifies chaotically downstream, so no
        # magnitude bound is asserted here — the trained-quality cost is
        # characterized on hardware, docs/STATUS.md).
        assert engaged
        # params untouched (compute-dtype only, not param dtype)
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree_util.tree_leaves(variables["params"])
        )
    finally:
        set_mixed_precision(False)
