"""Weight-for-weight parity against the genuine reference implementation.

These tests import the actual PyTorch code from /root/reference (with pure
CPU stand-ins for its CUDA ops — see tests/torch_oracle.py), initialise the
reference SVDFormer, convert its ``state_dict`` with the production
converter, and require the TPU-native model to reproduce the reference
forward pass end-to-end at PCN geometry. This is the strongest parity check
available without the published checkpoints (zero-egress environment):
every index op (FPS, kNN), the renderer, the converter key-mapping, and all
channel bookkeeping must line up for the outputs to agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import (
    load_reference_models,
    load_reference_pointnet2_modules,
    make_partial,
    pcn_cfg,
    reference_available,
    small_pcn_cfg,
    state_dict_numpy,
)

pytestmark = [
    pytest.mark.skipif(
        not reference_available(), reason="/root/reference not mounted"
    ),
    # Minutes per test on a 1-CPU box: torch reference fwd/bwd at full
    # geometry + our jit compiles. Smoke tier: pytest -m "not heavy".
    pytest.mark.heavy,
]


@pytest.fixture(scope="module")
def reference():
    return load_reference_models()


def test_pcviews_render_matches_reference(rng, reference):
    _, ref_utils = reference
    from svdformer_pointsea_tpu.render.pcviews import PCViews

    pts = make_partial(rng, 2, 2048)
    ref_render = ref_utils.PCViews(TRANS=-0.7, RESOLUTION=224)
    ref_img = ref_render.get_img(torch.from_numpy(pts)).numpy()  # (B*3, H, W)

    ours = np.asarray(PCViews(trans=-0.7, resolution=224).get_img(pts))
    ours = ours.reshape(-1, 224, 224)  # (B, 3, H, W) -> point-major rows

    # Scatter accumulation order differs (torch scatter_add vs XLA), so
    # agreement is to float round-off, not bitwise.
    np.testing.assert_allclose(ours, ref_img, rtol=1e-4, atol=1e-4)


def test_svdformer_forward_matches_reference(rng, reference):
    ref_svd, ref_utils = reference
    import jax

    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    torch.manual_seed(0)
    ref_model = ref_svd.Model(pcn_cfg())
    ref_model.eval()

    B, N = 2, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViews(trans=-0.7, resolution=224).get_img(pts))

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(pts),
            torch.from_numpy(depth.reshape(B * 3, 1, 224, 224)),
        )
    ref_out = [o.numpy() for o in ref_out]  # coarse, fine1, fine2 (B, n, 3)

    params, batch_stats = convert_state_dict(state_dict_numpy(ref_model))
    model = SVDFormer()
    ours = jax.jit(lambda p, d: model.apply(p, d[0], d[1], train=False))(
        {"params": params, "batch_stats": batch_stats}, (pts, depth)
    )
    ours = [np.asarray(o) for o in ours]

    for name, ref_o, our_o in zip(("coarse", "fine1", "fine2"), ref_out, ours):
        assert our_o.shape == ref_o.shape, name
        err = np.max(np.abs(our_o - ref_o))
        assert err < 2e-3, f"{name}: max abs deviation {err:.2e}"


def test_svdformer_55_variant_matches_reference(rng, reference):
    """The ShapeNet-55 config flips the SDG decoders to plain self-attention
    (dataset != 'ShapeNet', models/SVDFormer.py:48-51) and changes geometry
    (config_55.py:54-59). Verify that variant weight-for-weight too."""
    ref_svd, _ = reference
    import jax

    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    cfg = pcn_cfg()
    cfg.NETWORK.step1, cfg.NETWORK.step2 = 2, 4
    cfg.NETWORK.merge_points = cfg.NETWORK.local_points = 1024
    cfg.NETWORK.view_distance = 1.5
    cfg.DATASET.TEST_DATASET = "ShapeNet55"

    torch.manual_seed(0)
    ref_model = ref_svd.Model(cfg)
    ref_model.eval()

    B, N = 1, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViews(trans=-1.5, resolution=224).get_img(pts))

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(pts.copy()),
            torch.from_numpy(depth.reshape(B * 3, 1, 224, 224).copy()),
        )
    ref_out = [o.numpy() for o in ref_out]

    params, batch_stats = convert_state_dict(state_dict_numpy(ref_model))
    model = SVDFormer(
        step1=2, step2=4, merge_points=1024, local_points=1024,
        view_distance=1.5, sdg_decoder=False,
    )
    ours = jax.jit(lambda p, d: model.apply(p, d[0], d[1], train=False))(
        {"params": params, "batch_stats": batch_stats}, (pts, depth)
    )
    for name, ref_o, our_o in zip(("coarse", "fine1", "fine2"), ref_out, ours):
        our_o = np.asarray(our_o)
        assert our_o.shape == ref_o.shape, name
        err = np.max(np.abs(our_o - ref_o))
        assert err < 2e-3, f"{name}: max abs deviation {err:.2e}"


def test_geospecnet_forward_matches_reference(rng, reference):
    """Same weight-for-weight check for GeoSpecNet (models/GeoSpecNet.py)."""
    load_reference_models()  # stubs + sys.path
    import models.GeoSpecNet as ref_geo

    import jax

    from svdformer_pointsea_tpu.nn import GeoSpecNet
    from svdformer_pointsea_tpu.render.pcviews import PCViews
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    torch.manual_seed(0)
    ref_model = ref_geo.Model(pcn_cfg())
    ref_model.eval()

    B, N = 1, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViews(trans=-0.7, resolution=224).get_img(pts))

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(pts.copy()),
            torch.from_numpy(depth.reshape(B * 3, 1, 224, 224).copy()),
        )
    ref_out = [o.numpy() for o in ref_out]

    params, batch_stats = convert_state_dict(state_dict_numpy(ref_model))
    model = GeoSpecNet()
    ours = jax.jit(lambda p, d: model.apply(p, d[0], d[1], train=False))(
        {"params": params, "batch_stats": batch_stats}, (pts, depth)
    )
    for name, ref_o, our_o in zip(("coarse", "fine1", "fine2"), ref_out, ours):
        our_o = np.asarray(our_o)
        assert our_o.shape == ref_o.shape, name
        err = np.max(np.abs(our_o - ref_o))
        assert err < 2e-3, f"{name}: max abs deviation {err:.2e}"


def test_realistic_render_matches_reference(rng, reference):
    """Voxel+Gaussian renderer vs models_PointSea/mv_utils_zs.py."""
    load_reference_models()
    import models_PointSea.mv_utils_zs as ref_mv

    from svdformer_pointsea_tpu.render.realistic import PCViewsReal

    pts = make_partial(rng, 2, 2048)
    ref_render = ref_mv.PCViews_Real(TRANS=-0.7)
    with torch.no_grad():
        ref_img = ref_render.get_img(torch.from_numpy(pts.copy())).numpy()

    ours = np.asarray(PCViewsReal(trans=-0.7).get_img(pts))  # (B*3, H, W, 3)
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), ref_img, rtol=1e-4, atol=1e-4
    )


def test_pointsea_forward_matches_reference(rng, reference):
    """Weight-for-weight parity for PointSea (models_PointSea/PointSea.py).

    batch=1: the reference's stage-1 view fusion tiles point features
    view-major, which cross-pairs samples at batch>1 (see nn/pointsea.py
    docstring); at batch=1 both pairings coincide.
    """
    load_reference_models()
    import models_PointSea.PointSea as ref_ps

    import jax

    from svdformer_pointsea_tpu.nn import PointSea
    from svdformer_pointsea_tpu.render.realistic import PCViewsReal
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    torch.manual_seed(0)
    ref_model = ref_ps.Model(pcn_cfg())
    ref_model.eval()

    B, N = 1, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViewsReal(trans=-0.7).get_img(pts))  # (B*3, H, W, 3)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(pts.copy()),
            torch.from_numpy(depth.transpose(0, 3, 1, 2).copy()),
        )
    ref_out = [o.numpy() for o in ref_out]

    params, batch_stats = convert_state_dict(state_dict_numpy(ref_model))
    model = PointSea()
    ours = jax.jit(lambda p, d: model.apply(p, d[0], d[1], train=False))(
        {"params": params, "batch_stats": batch_stats}, (pts, depth)
    )
    for name, ref_o, our_o in zip(("coarse", "fine1", "fine2"), ref_out, ours):
        our_o = np.asarray(our_o)
        assert our_o.shape == ref_o.shape, name
        err = np.max(np.abs(our_o - ref_o))
        assert err < 2e-3, f"{name}: max abs deviation {err:.2e}"


def test_discriminator_matches_reference(rng, reference):
    load_reference_models()
    import models.GeoSpecNet as ref_geo

    import jax

    from svdformer_pointsea_tpu.nn import PointDiscriminator
    from svdformer_pointsea_tpu.train.convert import (
        convert_discriminator_state_dict,
    )

    torch.manual_seed(1)
    ref_d = ref_geo.Discriminator()
    ref_d.eval()
    pts = make_partial(rng, 4, 256)
    with torch.no_grad():
        ref_logit = ref_d(torch.from_numpy(pts.copy())).numpy()

    params, batch_stats = convert_discriminator_state_dict(
        state_dict_numpy(ref_d)
    )
    ours = np.asarray(
        jax.jit(
            lambda v, x: PointDiscriminator().apply(v, x, train=False)
        )({"params": params, "batch_stats": batch_stats}, pts)
    )
    np.testing.assert_allclose(ours, ref_logit, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("global_feat", [True, False])
def test_pointnet_feature_extractor_matches_reference(rng, reference, global_feat):
    """PointNetFeatureExtractor (models/model_utils.py:631-805 — dead code
    in the reference; capability-parity component, VERDICT r2 next #6):
    global and per-point modes, weight-for-weight, eval mode."""
    _, ref_utils = reference

    import jax

    from svdformer_pointsea_tpu.nn import PointNetFeatureExtractor

    torch.manual_seed(3)
    ref = ref_utils.PointNetFeatureExtractor(
        in_channels=3, feat_size=96, layer_dims=[16, 32], global_feat=global_feat
    )
    ref.eval()
    pts = make_partial(rng, 2, 64)  # (B, N, 3) — ref transposes internally
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(pts.copy())).numpy()

    sd = state_dict_numpy(ref)
    params, batch_stats = {}, {}
    for i in range(3):
        params[f"conv{i}"] = {
            "kernel": sd[f"conv_layers.{i}.weight"][:, :, 0].T,
            "bias": sd[f"conv_layers.{i}.bias"],
        }
        params[f"bn{i}"] = {
            "scale": sd[f"bn_layers.{i}.weight"],
            "bias": sd[f"bn_layers.{i}.bias"],
        }
        batch_stats[f"bn{i}"] = {
            "mean": sd[f"bn_layers.{i}.running_mean"],
            "var": sd[f"bn_layers.{i}.running_var"],
        }
    model = PointNetFeatureExtractor(
        feat_size=96, layer_dims=(16, 32), global_feat=global_feat
    )
    ours = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": params, "batch_stats": batch_stats}, pts
        )
    )
    if global_feat:
        assert ours.shape == ref_out.shape == (2, 96)
        np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)
    else:
        # ref: (B, feat+first, N) channels-first; ours: (B, N, feat+first).
        assert ref_out.shape == (2, 96 + 16, 64)
        np.testing.assert_allclose(
            ours, np.transpose(ref_out, (0, 2, 1)), rtol=1e-4, atol=1e-5
        )


def test_losses_and_metrics_match_reference(rng, reference):
    """Loss pyramids and metric calcs vs the genuine utils/loss_utils.py
    (with the CPU chamfer/FPS stand-ins): get_loss, get_loss_PM, calc_cd
    (incl. the cham_loss(gt, output) arg-order quirk, :101) and
    density-aware CD."""
    load_reference_models()
    import utils.loss_utils as ref_losses

    from svdformer_pointsea_tpu.losses import (
        calc_cd,
        calc_dcd,
        get_loss,
        get_loss_pm,
    )

    B = 2
    preds = [
        rng.rand(B, 64, 3).astype(np.float32),
        rng.rand(B, 256, 3).astype(np.float32),
        rng.rand(B, 1024, 3).astype(np.float32),
    ]
    gt = rng.rand(B, 1024, 3).astype(np.float32)
    partial = rng.rand(B, 256, 3).astype(np.float32)

    t = lambda a: torch.from_numpy(a.copy())
    for sqrt in (True, False):
        ref_total, ref_parts = ref_losses.get_loss([t(p) for p in preds], t(gt), sqrt=sqrt)
        total, parts = get_loss(preds, gt, sqrt=sqrt)
        np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)
        for a, b in zip(parts, ref_parts):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-4)

        ref_total, _ = ref_losses.get_loss_PM(
            [t(p) for p in preds], t(partial), t(gt), sqrt=sqrt
        )
        total, _ = get_loss_pm(preds, partial, gt, sqrt=sqrt)
        np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)

    out = preds[-1]
    ref_cd_p, ref_cd_t, ref_f1 = ref_losses.calc_cd(t(out), t(gt), calc_f1=True)
    cd_p, cd_t, f1 = calc_cd(out, gt, calc_f1=True)
    np.testing.assert_allclose(np.asarray(cd_p), ref_cd_p.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cd_t), ref_cd_t.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f1), ref_f1.numpy(), rtol=1e-4, atol=1e-6)

    ref_dcd, _, _ = ref_losses.calc_dcd(t(out), t(gt))
    dcd = calc_dcd(out, gt)[0]
    np.testing.assert_allclose(np.asarray(dcd), ref_dcd.numpy(), rtol=1e-4)


def test_svdformer_train_mode_matches_reference(rng, reference):
    """Train-mode forward parity: BatchNorm uses batch statistics on both
    sides (single-process torch sees the full batch, as does our mesh-less
    CPU apply), so outputs and updated running stats must agree."""
    ref_svd, _ = reference
    import jax

    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    torch.manual_seed(0)
    ref_model = ref_svd.Model(pcn_cfg())
    ref_model.train()

    B, N = 2, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViews(trans=-0.7, resolution=224).get_img(pts))

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(pts.copy()),
            torch.from_numpy(depth.reshape(B * 3, 1, 224, 224).copy()),
        )
    ref_out = [o.numpy() for o in ref_out]
    # Updated running stats from the torch side (momentum 0.1 defaults).
    ref_sd_after = state_dict_numpy(ref_model)

    torch.manual_seed(0)
    fresh = ref_svd.Model(pcn_cfg())  # same init, untouched stats
    params, batch_stats = convert_state_dict(state_dict_numpy(fresh))
    model = SVDFormer()
    ours, mutated = jax.jit(
        lambda p, d: model.apply(
            p, d[0], d[1], train=True, mutable=["batch_stats"]
        )
    )({"params": params, "batch_stats": batch_stats}, (pts, depth))

    for name, ref_o, our_o in zip(("coarse", "fine1", "fine2"), ref_out, ours):
        our_o = np.asarray(our_o)
        err = np.max(np.abs(our_o - ref_o))
        assert err < 5e-3, f"{name}: max abs deviation {err:.2e}"

    # Spot-check one updated running stat through the converter mapping:
    # the image trunk's stem BN (img_feature_extractor.1).
    got = np.asarray(
        mutated["batch_stats"]["encoder"]["img_trunk"]["stem_bn"]["mean"]
    )
    want = ref_sd_after["encoder.img_feature_extractor.1.running_mean"]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_svdformer_gradient_matches_reference(rng, reference):
    """Training-gradient parity: backprop get_loss through the genuine
    reference model (torch autograd, CPU stand-in ops) and through ours
    with converted weights; per-leaf gradients must align. Exercises the
    chamfer custom_vjp, BN train-mode backward, attention backward, and the
    detached structure-analysis embedding in one shot."""
    ref_svd, _ = reference
    load_reference_models()
    import utils.loss_utils as ref_losses

    import jax
    import jax.numpy as jnp

    from svdformer_pointsea_tpu.losses import get_loss
    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    torch.manual_seed(0)
    ref_model = ref_svd.Model(small_pcn_cfg())
    ref_model.train()

    B, N = 1, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViews(trans=-0.7, resolution=224).get_img(pts))
    gt = make_partial(rng, B, 4096)

    preds = ref_model(
        torch.from_numpy(pts.copy()),
        torch.from_numpy(depth.reshape(B * 3, 1, 224, 224).copy()),
    )
    ref_loss, _ = ref_losses.get_loss(list(preds), torch.from_numpy(gt.copy()), sqrt=True)
    ref_loss.backward()
    grad_sd = {
        k: p.grad.numpy()
        for k, p in ref_model.named_parameters()
        if p.grad is not None
    }
    ref_gp, _ = convert_state_dict(grad_sd)

    torch.manual_seed(0)
    fresh = ref_svd.Model(small_pcn_cfg())
    params, batch_stats = convert_state_dict(state_dict_numpy(fresh))
    model = SVDFormer(merge_points=128)

    jpts, jdepth, jgt = (jnp.asarray(a) for a in (pts, depth, gt))

    def loss_fn(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            jpts,
            jdepth,
            train=True,
            mutable=["batch_stats"],
        )
        loss, _ = get_loss(list(outs), jgt, sqrt=True)
        return loss

    loss_val, grads = jax.jit(jax.value_and_grad(loss_fn))(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    np.testing.assert_allclose(float(loss_val), float(ref_loss), rtol=5e-3)

    checked = [0]
    # Global gradient scale: leaves far below it are numerical-cancellation
    # noise (e.g. conv biases directly before a BatchNorm have mathematically
    # ZERO gradient — the mean subtraction cancels any per-channel shift),
    # where cosine comparison is meaningless.
    global_scale = max(
        np.linalg.norm(np.asarray(l)) for l in jax.tree_util.tree_leaves(grads)
    )

    def walk(ref_node, our_node, path):
        if isinstance(ref_node, dict):
            for k, v in ref_node.items():
                assert k in our_node, path + (k,)
                walk(v, our_node[k], path + (k,))
            return
        ours = np.asarray(our_node).astype(np.float64)
        ref = np.asarray(ref_node).astype(np.float64)
        if path[-2:] == ("ps", "bias"):
            # deconv bias: our per-(channel, position) grads sum to torch's
            # per-channel grad; the converted reference grad is
            # np.repeat(torch_grad, 128), so one copy is the true value.
            ours = ours.reshape(-1, 128).sum(1)
            ref = ref.reshape(-1, 128)[:, 0]
        rn, on = np.linalg.norm(ref), np.linalg.norm(ours)
        if rn < 1e-5 * global_scale:
            assert on < 1e-4 * global_scale + 10 * rn, (path, on, rn)
            checked[0] += 1
            return
        cos = float(np.dot(ref.ravel(), ours.ravel()) / (rn * on + 1e-30))
        assert cos > 0.995, (path, cos, rn)
        assert abs(on / rn - 1) < 0.05, (path, on, rn)
        checked[0] += 1

    walk(ref_gp, grads, ())
    assert checked[0] > 100  # every converted torch grad leaf was compared


def test_pointsea_gradient_matches_reference(rng, reference):
    """Gradient parity for PointSea. Like SVDFormer, the in-model chamfer
    feeds only the sinusoidal embedding, which detaches on both sides
    (models_PointSea/model_utils.py:612 / our stop_gradient) — so what this
    exercises beyond the SVDFormer gradient test is the path-selection
    gates, SDG_l's previous-stage conditioning, and the ResNet18 trunk."""
    load_reference_models()
    import models_PointSea.PointSea as ref_ps
    import utils.loss_utils as ref_losses

    import jax
    import jax.numpy as jnp

    from svdformer_pointsea_tpu.losses import get_loss
    from svdformer_pointsea_tpu.nn import PointSea
    from svdformer_pointsea_tpu.render.realistic import PCViewsReal
    from svdformer_pointsea_tpu.train.convert import convert_state_dict

    torch.manual_seed(0)
    ref_model = ref_ps.Model(small_pcn_cfg())
    ref_model.train()

    B, N = 1, 2048
    pts = make_partial(rng, B, N)
    depth = np.asarray(PCViewsReal(trans=-0.7).get_img(pts))
    gt = make_partial(rng, B, 4096)

    preds = ref_model(
        torch.from_numpy(pts.copy()),
        torch.from_numpy(depth.transpose(0, 3, 1, 2).copy()),
    )
    ref_loss, _ = ref_losses.get_loss(
        list(preds), torch.from_numpy(gt.copy()), sqrt=True
    )
    ref_loss.backward()
    grad_sd = {
        k: p.grad.numpy()
        for k, p in ref_model.named_parameters()
        if p.grad is not None
    }
    ref_gp, _ = convert_state_dict(grad_sd)

    torch.manual_seed(0)
    fresh = ref_ps.Model(small_pcn_cfg())
    params, batch_stats = convert_state_dict(state_dict_numpy(fresh))
    model = PointSea(merge_points=128)
    jpts, jdepth, jgt = (jnp.asarray(a) for a in (pts, depth, gt))

    def loss_fn(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            jpts,
            jdepth,
            train=True,
            mutable=["batch_stats"],
        )
        loss, _ = get_loss(list(outs), jgt, sqrt=True)
        return loss

    loss_val, grads = jax.jit(jax.value_and_grad(loss_fn))(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    np.testing.assert_allclose(float(loss_val), float(ref_loss), rtol=5e-3)

    checked = [0]
    global_scale = max(
        np.linalg.norm(np.asarray(l)) for l in jax.tree_util.tree_leaves(grads)
    )

    def walk(ref_node, our_node, path):
        if isinstance(ref_node, dict):
            for k, v in ref_node.items():
                assert k in our_node, path + (k,)
                walk(v, our_node[k], path + (k,))
            return
        ours = np.asarray(our_node).astype(np.float64)
        ref = np.asarray(ref_node).astype(np.float64)
        if path[-2:] == ("ps", "bias"):
            ours = ours.reshape(-1, 128).sum(1)
            ref = ref.reshape(-1, 128)[:, 0]
        rn, on = np.linalg.norm(ref), np.linalg.norm(ours)
        if rn < 1e-5 * global_scale:
            assert on < 1e-4 * global_scale + 10 * rn, (path, on, rn)
            checked[0] += 1
            return
        cos = float(np.dot(ref.ravel(), ours.ravel()) / (rn * on + 1e-30))
        assert cos > 0.995, (path, cos, rn)
        assert abs(on / rn - 1) < 0.05, (path, on, rn)
        checked[0] += 1

    walk(ref_gp, grads, ())
    assert checked[0] > 100


@pytest.mark.parametrize("group_all", [False, True])
def test_pointnet_sa_module_msg_matches_reference(rng, group_all):
    """PointnetSAModuleMSG (pointnet2_ops_lib/pointnet2_ops/
    pointnet2_modules.py:77-115 — dead code in the reference, imported only
    by its package __init__): the genuine torch wrapper running on the CPU
    oracle stubs vs our channels-last flax PointNetSAModuleMSG,
    weight-for-weight, eval mode. Two ball-query scales sharing one FPS
    (or the GroupAll degenerate case)."""
    import jax

    from svdformer_pointsea_tpu.nn import PointNetSAModuleMSG

    ref_mod = load_reference_pointnet2_modules()
    torch.manual_seed(5)
    C = 6
    # NOTE: the torch ctor MUTATES mlps[k][0] += 3 when use_xyz
    # (pointnet2_modules.py:110-112) — pass fresh lists.
    if group_all:
        npoint, radii, nsamples = None, [None], [None]
        mlps = [[C, 16, 24]]
    else:
        npoint, radii, nsamples = 24, [0.25, 0.5], [8, 16]
        mlps = [[C, 16, 24], [C, 12, 20]]
    ref = ref_mod.PointnetSAModuleMSG(
        npoint=npoint, radii=radii, nsamples=nsamples,
        mlps=[list(m) for m in mlps], bn=True, use_xyz=True,
    )
    ref.eval()

    xyz = make_partial(rng, 2, 64)  # (B, N, 3)
    feats = rng.rand(2, C, 64).astype(np.float32)  # ref wants (B, C, N)
    with torch.no_grad():
        ref_xyz, ref_feats = ref(
            torch.from_numpy(xyz.copy()), torch.from_numpy(feats.copy())
        )

    # Convert: per scale, Sequential([Conv2d(1x1, no bias), BN2d, ReLU] * L)
    sd = state_dict_numpy(ref)
    params, batch_stats = {}, {}
    for i, mlp in enumerate(mlps):
        layers, bns, stats = {}, {}, {}
        for j in range(len(mlp) - 1):
            w = sd[f"mlps.{i}.{3 * j}.weight"]  # (out, in, 1, 1)
            layers[f"layer{j}"] = {
                "kernel": w[:, :, 0, 0].T,
                "bias": np.zeros(w.shape[0], np.float32),  # conv bias=False
            }
            bns[f"bn{j}"] = {
                "scale": sd[f"mlps.{i}.{3 * j + 1}.weight"],
                "bias": sd[f"mlps.{i}.{3 * j + 1}.bias"],
            }
            stats[f"bn{j}"] = {
                "mean": sd[f"mlps.{i}.{3 * j + 1}.running_mean"],
                "var": sd[f"mlps.{i}.{3 * j + 1}.running_var"],
            }
        params[f"mlp{i}"] = {**layers, **bns}
        batch_stats[f"mlp{i}"] = stats

    ours = PointNetSAModuleMSG(
        npoint=npoint,
        radii=tuple(r for r in radii),
        nsamples=tuple(n for n in nsamples),
        mlps=tuple(tuple(m[1:]) for m in mlps),  # specs exclude the input width
    )
    new_xyz, new_feats = jax.jit(
        lambda v, x, f: ours.apply(v, x, f, train=False)
    )(
        {"params": params, "batch_stats": batch_stats},
        xyz,
        np.transpose(feats, (0, 2, 1)),  # ours is channels-last
    )
    if group_all:
        assert new_xyz is None and ref_xyz is None
        assert ref_feats.shape == (2, 24, 1)
    else:
        np.testing.assert_allclose(
            np.asarray(new_xyz), ref_xyz.numpy(), rtol=1e-5, atol=1e-6
        )
        assert ref_feats.shape == (2, 24 + 20, 24)
    np.testing.assert_allclose(
        np.asarray(new_feats),
        np.transpose(ref_feats.numpy(), (0, 2, 1)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_pointnet_sa_module_msg_train_mode_matches_reference(rng):
    """TRAIN-mode MSG oracle (VERDICT r4 #7): the genuine
    PointnetSAModuleMSG with BN in train mode — batch-moment normalized
    outputs AND the running-stat updates after one step must match our
    mutable batch_stats path (the repo's train-mode-oracle standard, as for
    the full models above)."""
    import jax

    from svdformer_pointsea_tpu.nn import PointNetSAModuleMSG

    ref_mod = load_reference_pointnet2_modules()
    torch.manual_seed(7)
    C = 6
    npoint, radii, nsamples = 24, [0.25, 0.5], [8, 16]
    mlps = [[C, 16, 24], [C, 12, 20]]
    ref = ref_mod.PointnetSAModuleMSG(
        npoint=npoint, radii=radii, nsamples=nsamples,
        mlps=[list(m) for m in mlps], bn=True, use_xyz=True,
    )
    ref.train()

    xyz = make_partial(rng, 2, 64)
    feats = rng.rand(2, C, 64).astype(np.float32)
    with torch.no_grad():
        ref_xyz, ref_feats = ref(
            torch.from_numpy(xyz.copy()), torch.from_numpy(feats.copy())
        )
    sd = state_dict_numpy(ref)  # post-forward: carries updated running stats

    # Converted params; batch_stats at INIT values (mean 0, var 1 — the
    # torch module was freshly constructed, so its pre-forward stats were
    # the init values too).
    params, batch_stats = {}, {}
    for i, mlp in enumerate(mlps):
        layers, bns, stats = {}, {}, {}
        for j in range(len(mlp) - 1):
            w = sd[f"mlps.{i}.{3 * j}.weight"]
            layers[f"layer{j}"] = {
                "kernel": w[:, :, 0, 0].T,
                "bias": np.zeros(w.shape[0], np.float32),
            }
            bns[f"bn{j}"] = {
                "scale": sd[f"mlps.{i}.{3 * j + 1}.weight"],
                "bias": sd[f"mlps.{i}.{3 * j + 1}.bias"],
            }
            width = w.shape[0]
            stats[f"bn{j}"] = {
                "mean": np.zeros(width, np.float32),
                "var": np.ones(width, np.float32),
            }
        params[f"mlp{i}"] = {**layers, **bns}
        batch_stats[f"mlp{i}"] = stats

    ours = PointNetSAModuleMSG(
        npoint=npoint,
        radii=tuple(radii),
        nsamples=tuple(nsamples),
        mlps=tuple(tuple(m[1:]) for m in mlps),
    )
    (new_xyz, new_feats), mutated = jax.jit(
        lambda v, x, f: ours.apply(
            v, x, f, train=True, mutable=["batch_stats"]
        )
    )(
        {"params": params, "batch_stats": batch_stats},
        xyz,
        np.transpose(feats, (0, 2, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(new_xyz), ref_xyz.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_feats),
        np.transpose(ref_feats.numpy(), (0, 2, 1)),
        rtol=1e-4,
        atol=1e-4,
    )
    # Running-stat updates: torch momentum 0.1 EMA, unbiased batch var.
    for i, mlp in enumerate(mlps):
        for j in range(len(mlp) - 1):
            got = mutated["batch_stats"][f"mlp{i}"][f"bn{j}"]
            np.testing.assert_allclose(
                np.asarray(got["mean"]),
                sd[f"mlps.{i}.{3 * j + 1}.running_mean"],
                rtol=1e-4, atol=1e-5,
                err_msg=f"running_mean mlp{i}/bn{j}",
            )
            np.testing.assert_allclose(
                np.asarray(got["var"]),
                sd[f"mlps.{i}.{3 * j + 1}.running_var"],
                rtol=1e-4, atol=1e-5,
                err_msg=f"running_var mlp{i}/bn{j}",
            )
