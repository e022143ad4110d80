"""Sequence-parallel (sp) mesh axis tests on the faked 8-device CPU backend.

The reference has NO per-sample parallelism (SURVEY §2.3: batch-only
DataParallel); parallel/sp.py adds an opt-in token-sharded axis via GSPMD
sharding constraints on the SDG token axes. These tests prove the sharded
computation is math-equivalent to the unsharded one — the correctness half
of the feature (the perf half needs a real multi-chip pod, which this box
does not have).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.nn import SVDFormer
from svdformer_pointsea_tpu.parallel import (
    batch_sharding,
    disable_sp,
    enable_sp,
    make_mesh,
    make_mesh_2d,
    pad_batch,
    replicated_sharding,
    sp_active,
)
from svdformer_pointsea_tpu.train import create_train_state, make_train_step
from svdformer_pointsea_tpu.train.state import make_optimizer


@pytest.fixture
def sp_mesh():
    """(data=2, sp=4) mesh over the 8 faked CPU devices; always cleans up
    the trace-time SP switch."""
    mesh = make_mesh_2d(4, jax.devices()[:8])
    enable_sp(mesh)
    try:
        yield mesh
    finally:
        disable_sp()


def _small_model():
    return SVDFormer(step1=2, step2=2, merge_points=32, local_points=32)


def _batch(rng, B=2, N=256, res=8):
    partial = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(B, 3, res, res), jnp.float32)
    gt = jnp.asarray(rng.rand(B, 256, 3), jnp.float32)
    return partial, depth, gt


def test_make_mesh_2d_axes():
    mesh = make_mesh_2d(4, jax.devices()[:8])
    assert dict(mesh.shape) == {"data": 2, "sp": 4}
    with pytest.raises(ValueError):
        make_mesh_2d(3, jax.devices()[:8])
    # pad_batch pads to the DATA axis size only (batch never shards over sp).
    (arr,), w = pad_batch((np.zeros((3, 4)),), mesh)
    assert arr.shape[0] == 4 and w.tolist() == [1.0, 1.0, 1.0, 0.0]


def test_sp_flag_lifecycle():
    assert not sp_active()
    mesh = make_mesh_2d(4, jax.devices()[:8])
    enable_sp(mesh)
    try:
        assert sp_active()
    finally:
        disable_sp()
    assert not sp_active()
    with pytest.raises(ValueError):
        enable_sp(make_mesh(jax.devices()[:8]))  # no sp axis


@pytest.mark.heavy
def test_sp_forward_matches_unsharded(rng, sp_mesh):
    """Eval forward under (data=2, sp=4) == single-device forward."""
    model = _small_model()
    partial, depth, _ = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)

    fwd = jax.jit(lambda v, p, d: model.apply(v, p, d, train=False))
    v_sh = jax.device_put(variables, replicated_sharding(sp_mesh))
    bsh = batch_sharding(sp_mesh)
    out_sp = fwd(v_sh, jax.device_put(partial, bsh), jax.device_put(depth, bsh))

    disable_sp()
    fwd1 = jax.jit(lambda v, p, d: model.apply(v, p, d, train=False))
    out_ref = fwd1(variables, partial, depth)

    for a, b in zip(out_sp, out_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5
        )


@pytest.mark.heavy
def test_sp_train_net_end_to_end(tmp_path, rng):
    """cfg.train.sp=4 (the --sp CLI path): train_net builds the 2-D
    (data, sp) mesh, trains an epoch, evals, checkpoints. Run on the faked
    8-device backend -> (data=2, sp=4)."""
    import dataclasses

    from svdformer_pointsea_tpu.train import train_net
    from test_orchestration import _tiny_pcn_config

    cfg = _tiny_pcn_config(tmp_path, rng)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, sp=4))
    try:
        state, best = train_net(cfg, max_epochs=1)
    finally:
        disable_sp()  # train_net's trace-time switch is process-lifetime
    assert np.isfinite(best)
    assert int(state.step) == 2


@pytest.mark.heavy
def test_sp_train_step_matches_unsharded(rng, sp_mesh):
    """One DP+SP train step == the same step on one device (loss and params)."""
    model = _small_model()
    partial, depth, gt = _batch(rng)
    optimizer = make_optimizer()
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), (partial, depth), optimizer
    )
    step = make_train_step(model, optimizer, donate=False)

    st = jax.device_put(state0, replicated_sharding(sp_mesh))
    bsh = batch_sharding(sp_mesh)
    args = [jax.device_put(x, bsh) for x in (partial, depth, gt)]
    st_sp, m_sp = step(st, *args, jnp.float32(1e-4))

    disable_sp()
    step1 = make_train_step(model, optimizer, donate=False)
    st_ref, m_ref = step1(state0, partial, depth, gt, jnp.float32(1e-4))

    assert np.isclose(float(m_sp["loss"]), float(m_ref["loss"]), rtol=1e-4)
    la = jax.tree_util.tree_leaves(st_sp.params)
    lb = jax.tree_util.tree_leaves(st_ref.params)
    # Same bound as test_sharded_step_matches_single_device: Adam's first
    # update is ~lr per parameter; reduction-order noise can flip the sign
    # of near-zero gradients.
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=2.5e-4)


@pytest.mark.heavy
def test_sp_pointsea_forward_matches_unsharded(rng, sp_mesh):
    """PointSea's own SDGs carry the sp hints too: eval forward under
    (data=2, sp=4) == single-device forward."""
    from svdformer_pointsea_tpu.nn import PointSea

    model = PointSea(step1=2, step2=2, merge_points=32, local_points=32)
    B, N, res = 2, 256, 32
    partial = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(B * 3, res, res, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), partial, depth)

    fwd = jax.jit(lambda v, p, d: model.apply(v, p, d, train=False))
    v_sh = jax.device_put(variables, replicated_sharding(sp_mesh))
    bsh = batch_sharding(sp_mesh)
    out_sp = fwd(v_sh, jax.device_put(partial, bsh), jax.device_put(depth, bsh))

    disable_sp()
    fwd1 = jax.jit(lambda v, p, d: model.apply(v, p, d, train=False))
    out_ref = fwd1(variables, partial, depth)

    for a, b in zip(out_sp, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)
