"""shard_map DP train step vs the GSPMD (jit + shardings) step.

The shard_map path exists so the Pallas fast paths stay active per-chip on
a real multi-chip pod (pallas_call is not GSPMD-partitionable —
parallel/mesh.py module docstring). On the CPU backend both paths run the
XLA fallbacks, so here the two must be numerically equivalent: same loss,
same metrics, same parameter update, same (synced) BatchNorm statistics —
including with pad rows where some shards are entirely padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.nn import SVDFormer
from svdformer_pointsea_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch,
    replicated_sharding,
)
from svdformer_pointsea_tpu.render import PCViews
from svdformer_pointsea_tpu.train import create_train_state, make_train_step
from svdformer_pointsea_tpu.train.state import make_optimizer


def _tiny_setup(rng, B=12, N=128):
    model = SVDFormer(step1=2, step2=2, merge_points=32, local_points=32)
    render = PCViews(trans=-0.7, resolution=8)
    partial = jnp.asarray(rng.rand(2, N, 3), jnp.float32)
    depth0 = render.get_img(partial)
    opt = make_optimizer()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (partial, depth0), opt
    )
    part = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(B, 2 * N, 3), jnp.float32)
    return model, render, opt, state, part, gt


@pytest.mark.heavy  # two model-scale step compiles on the 8-device CPU mesh
def test_shard_map_step_matches_gspmd(rng):
    """B=12 on 8 devices: pads to 16, shards of 2, the last two shards are
    ALL pad rows — exercises the zero-local-weight edge (the loss psums a
    global denominator, losses.py::_batch_mean) and the BN moment sync."""
    model, render, opt, state, part, gt = _tiny_setup(rng)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    (pp, gg), w = pad_batch((part, gt), mesh)
    pp, gg, ww = [
        jax.device_put(x, batch_sharding(mesh)) for x in (pp, gg, jnp.asarray(w))
    ]

    step_g = make_train_step(model, opt, render_fn=render.render, donate=False)
    step_s = make_train_step(
        model, opt, render_fn=render.render, donate=False, mesh=mesh
    )

    st_g = jax.device_put(state, replicated_sharding(mesh))
    st_s = jax.device_put(state, replicated_sharding(mesh))
    # Two steps: the second runs from already-diverged-if-buggy state, so
    # accumulated BN/optimizer drift would surface.
    for _ in range(2):
        st_g, m_g = step_g(st_g, pp, gg, ww, jnp.float32(1e-4))
        st_s, m_s = step_s(st_s, pp, gg, ww, jnp.float32(1e-4))

    for k in m_g:
        np.testing.assert_allclose(
            float(m_g[k]), float(m_s[k]), rtol=1e-5, err_msg=k
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(st_g.params),
        jax.tree_util.tree_leaves(st_s.params),
    ):
        # Reduction-order noise through Adam can move near-zero-gradient
        # params by up to ~lr per step (2 steps here; same bound as
        # test_train_sharding.py::test_sharded_step_matches_single_device).
        # Measured max diff: 3.5e-4 after two steps.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5.5e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_g.batch_stats),
        jax.tree_util.tree_leaves(st_s.batch_stats),
    ):
        # Measured max diff 2.7e-5 (f32 pmean-of-moments vs global reduction).
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-4)


@pytest.mark.heavy  # full train_net drive on the 8-device CPU mesh
def test_micro_train_pcn_shard_map_end_to_end(tmp_path, rng):
    """The whole app surface under cfg.train.dp="shard_map": data from
    disk -> fused render -> shard_map step (B12 padded to 16 on 8 devices)
    -> shard_map eval -> checkpoint. Mirrors
    test_orchestration.py::test_micro_train_pcn_end_to_end."""
    import dataclasses
    import os

    from svdformer_pointsea_tpu.train import train_net
    from tests.test_orchestration import _tiny_pcn_config

    cfg = _tiny_pcn_config(tmp_path, rng)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, dp="shard_map", batch_size=12)
    )
    state, best = train_net(cfg, max_epochs=1)
    assert np.isfinite(best)
    assert int(state.step) == 1  # 3 samples, batch 12 -> 1 padded step
    ckpt_dir = os.path.join(cfg.out_path, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt-best"))


@pytest.mark.heavy  # full train_net_gan drive on the 8-device CPU mesh
def test_micro_train_gan_shard_map_end_to_end(tmp_path, rng):
    """train_net_gan under cfg.train.dp="shard_map": data from disk ->
    fused render -> two-optimizer GAN step on the mesh -> eval ->
    checkpoint. (Also the first e2e exercise of train_net_gan in the
    suite — the gspmd micro-step test covers only the step function.)"""
    import dataclasses
    import os

    from svdformer_pointsea_tpu.train.gan import train_net_gan
    from tests.test_orchestration import _tiny_pcn_config

    cfg = _tiny_pcn_config(tmp_path, rng)
    cfg = cfg.replace(
        network=dataclasses.replace(cfg.network, model="geospecnet"),
        train=dataclasses.replace(
            cfg.train, dp="shard_map", batch_size=12, progress=True
        ),
    )
    state, best = train_net_gan(cfg, max_epochs=1)
    assert np.isfinite(best)
    assert int(state.step) == 1  # 3 samples, batch 12 -> 1 padded step
    ckpt_dir = os.path.join(cfg.out_path, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt-best"))


def test_dp_flag_validation():
    """Bad dp values and invalid combinations fail loudly."""
    import dataclasses

    from svdformer_pointsea_tpu.configs import pcn_config
    from svdformer_pointsea_tpu.train import train_net

    cfg = pcn_config()
    bad = cfg.replace(train=dataclasses.replace(cfg.train, dp="nope"))
    with pytest.raises(ValueError, match="gspmd|shard_map"):
        train_net(bad, max_epochs=1)
    combo = cfg.replace(
        train=dataclasses.replace(cfg.train, dp="shard_map", sp=2)
    )
    with pytest.raises(ValueError, match="sp"):
        train_net(combo, max_epochs=1)


@pytest.mark.heavy  # two eval-fn compiles on the 8-device CPU mesh
def test_shard_map_eval_matches_jit(rng):
    """make_pcn_eval_fn(mesh=...) == the plain jit eval on the same inputs
    (per-sample metrics, batch padded to the mesh size)."""
    from svdformer_pointsea_tpu.train.evaluate import (
        _pad_eval_rows,
        make_pcn_eval_fn,
    )

    model, render, opt, state, part, gt = _tiny_setup(rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = make_mesh()

    fn_jit = make_pcn_eval_fn(model, render)
    fn_sm = make_pcn_eval_fn(model, render, mesh=mesh)

    pp, gg = _pad_eval_rows((np.asarray(part), np.asarray(gt)), mesh)
    assert pp.shape[0] == 16  # 12 padded to the 8-device multiple
    m_jit = np.asarray(fn_jit(variables, jnp.asarray(pp), jnp.asarray(gg)))
    m_sm = np.asarray(fn_sm(variables, jnp.asarray(pp), jnp.asarray(gg)))
    np.testing.assert_allclose(m_sm[:, :12], m_jit[:, :12], rtol=1e-5, atol=1e-6)


@pytest.mark.heavy  # two GAN-step compiles on the 8-device CPU mesh
def test_shard_map_gan_step_matches_gspmd(rng):
    """GeoSpec GAN step (two optimizers, vjp-shared G forward, D BN stats)
    under shard_map == GSPMD, with pad rows (B12 -> 16 on 8 devices)."""
    import dataclasses

    from svdformer_pointsea_tpu.configs import geospec_config
    from svdformer_pointsea_tpu.train.gan import (
        create_gan_state,
        make_gan_train_step,
    )

    cfg = geospec_config()
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network,
            step1=2, step2=2, merge_points=32, local_points=32, resolution=8,
            n_input_points=128,
        ),
        data=dataclasses.replace(cfg.data, n_points=128, gt_points=128),
    )
    g_model, d_model, g_opt, d_opt, state = create_gan_state(cfg, seed=0)
    render = PCViews(trans=-0.7, resolution=8)
    mesh = make_mesh()

    step_g = make_gan_train_step(
        g_model, d_model, g_opt, d_opt, gan_weight=0.05, render_fn=render.render,
        donate=False,
    )
    step_s = make_gan_train_step(
        g_model, d_model, g_opt, d_opt, gan_weight=0.05, render_fn=render.render,
        mesh=mesh, donate=False,
    )

    B, N = 12, 128
    part = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    (pp, gg), w = pad_batch((part, gt), mesh)
    pp, gg, ww = [
        jax.device_put(x, batch_sharding(mesh)) for x in (pp, gg, jnp.asarray(w))
    ]
    st_g = jax.device_put(state, replicated_sharding(mesh))
    st_s = jax.device_put(state, replicated_sharding(mesh))
    st_g, m_g = step_g(st_g, pp, gg, ww, jnp.float32(1e-4), jnp.float32(1e-4))
    st_s, m_s = step_s(st_s, pp, gg, ww, jnp.float32(1e-4), jnp.float32(1e-4))

    for k in m_g:
        # f32 reduction-order noise through the synced-BN discriminator
        # logits: measured |Δ|/x up to 3.3e-5 on the losses.
        np.testing.assert_allclose(
            float(m_g[k]), float(m_s[k]), rtol=2e-4, atol=1e-6, err_msg=k
        )
    for name in ("g_params", "d_params", "g_batch_stats", "d_batch_stats"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(st_g, name)),
            jax.tree_util.tree_leaves(getattr(st_s, name)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=3e-4, err_msg=name
            )


@pytest.mark.heavy  # one adv-step compile on the 8-device CPU mesh
def test_shard_map_adv55_step_runs(rng):
    """Adversarial 55 step (fused crop+render, fori-loop D updates) under
    shard_map: finite losses, both networks update. Equivalence math is
    covered by the geospec GAN test; this guards the crop-variant in_specs
    plumbing."""
    import dataclasses

    from svdformer_pointsea_tpu.configs import shapenet55_config
    from svdformer_pointsea_tpu.data import random_crop_params
    from svdformer_pointsea_tpu.train.gan import (
        create_adv55_state,
        make_adv55_train_step,
    )
    from svdformer_pointsea_tpu.train.loop import build_model
    from svdformer_pointsea_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )

    cfg = shapenet55_config(adv=True)
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network,
            step1=2, step2=2, merge_points=32, local_points=32, resolution=8,
            n_input_points=64,
        ),
        data=dataclasses.replace(cfg.data, n_points=64, gt_points=256),
    )
    model = build_model(cfg)
    opt = make_optimizer(weight_decay=cfg.train.weight_decay)
    render = PCViews(trans=-0.7, resolution=8)
    rng_np = np.random.RandomState(0)
    partial0 = jnp.asarray(rng_np.rand(2, 64, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (partial0, render.get_img(partial0)), opt
    )
    d_model, d_opt, adv = create_adv55_state(cfg, seed=0)
    mesh = make_mesh()
    step = make_adv55_train_step(
        model, d_model, opt, d_opt,
        sqrt_loss=False, lambda_g=0.05, d_steps=2,
        render_fn=render.render, crop_n_out=64, mesh=mesh, donate=False,
    )

    B = 12
    gt = jnp.asarray(rng_np.rand(B, 256, 3), jnp.float32)
    num_crop, direction = random_crop_params(rng_np, B, 256)
    (gt, direction, num_crop), w = pad_batch((gt, direction, num_crop), mesh)
    gt, direction, num_crop, ww = [
        jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        for x in (gt, direction, num_crop, w)
    ]
    state = jax.device_put(state, replicated_sharding(mesh))
    adv = jax.device_put(adv, replicated_sharding(mesh))
    g_before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    d_before = np.asarray(jax.tree_util.tree_leaves(adv.d_params)[0]).copy()
    state, adv, m = step(
        state, adv, gt, direction, num_crop, ww,
        jnp.float32(1e-4), jnp.float32(1e-4),
    )
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["d_loss"]))
    assert not np.allclose(
        g_before, np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    )
    assert not np.allclose(
        d_before, np.asarray(jax.tree_util.tree_leaves(adv.d_params)[0])
    )


def test_bn_axis_switch_is_scoped():
    """The bn_axis context manager must restore the previous value even on
    error, so traces outside shard_map keep local moments."""
    from svdformer_pointsea_tpu.nn.layers import bn_axis, bn_axis_name

    assert bn_axis_name() is None
    with bn_axis("data"):
        assert bn_axis_name() == "data"
        with bn_axis(None):
            assert bn_axis_name() is None
        assert bn_axis_name() == "data"
    assert bn_axis_name() is None
    try:
        with bn_axis("data"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert bn_axis_name() is None


def test_loss_axis_name_matches_global_mean(rng):
    """losses.get_loss with axis_name inside shard_map == the same loss
    computed unsharded, including all-pad shards (weights sum to zero on
    some devices)."""
    from jax.sharding import PartitionSpec as P

    from svdformer_pointsea_tpu.losses import get_loss

    mesh = make_mesh()
    n = mesh.devices.size
    B = 2 * n
    pc = jnp.asarray(rng.rand(B, 16, 3), jnp.float32)
    p1 = jnp.asarray(rng.rand(B, 32, 3), jnp.float32)
    p2 = jnp.asarray(rng.rand(B, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(B, 64, 3), jnp.float32)
    w = jnp.asarray(
        (rng.rand(B) > 0.5).astype(np.float32)
    ).at[-4:].set(0.0)  # last two shards all-pad
    w = w.at[0].set(1.0)  # at least one real row

    ref_loss, ref_parts = jax.jit(
        lambda *a: get_loss(a[:3], a[3], weights=a[4])
    )(pc, p1, p2, gt, w)

    def body(pc, p1, p2, gt, w):
        loss, parts = get_loss((pc, p1, p2), gt, weights=w, axis_name="data")
        return loss, parts

    loss, parts = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data"),) * 5,
            out_specs=(P(), P()),
        )
    )(pc, p1, p2, gt, w)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    for a, b in zip(parts, ref_parts):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
