"""The north-star parity gate, at METRIC level (VERDICT round-1 #1).

Driver target (BASELINE.md): PCN CD-L1 within 0.01x10^3 of the reference
checkpoint's result. Coordinate-level forward parity (test_reference_parity)
bounds max-abs deviation, but never the evaluation metric itself. This file
closes that: one set of reference weights goes through BOTH pipelines
end-to-end on the same fixture clouds —

- reference: utils/io-free replay of core/test_pcn.py:48-76 — its own
  PCViews renderer, Model.forward (eval mode), calc_cd / calc_dcd / F1
  (utils/loss_utils.py:98-155) via the CPU torch oracle;
- ours: the .pth converter (train/convert.py) + the jitted eval pipeline of
  train/evaluate.py:make_pcn_eval_fn (our renderer, our model, our metrics)

— and asserts |Delta CD-L1x10^3| <= 0.01 per sample and on the mean, plus
DCD and F1 deltas. Weights are a seeded random-init reference model (no
pretrained checkpoints exist in this environment); the absolute 0.01 budget
is *harder* to meet at random-init CD magnitudes than at trained-model ones,
so passing here is a conservative demonstration of the gate.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    load_reference_models,
    make_partial,
    pcn_cfg,
    reference_available,
)

pytestmark = [
    pytest.mark.skipif(
        not reference_available(), reason="/root/reference not mounted"
    ),
    pytest.mark.heavy,
]

CD_BUDGET = 0.01  # x10^3, the driver's north-star tolerance
N_SAMPLES = 4


def _reference_eval(ref_svd, state_dict, clouds, cfg=None, resolution=224):
    """Replay core/test_pcn.py:44-76: per-sample CD-L1x10^3, DCD, F1."""
    load_reference_models()
    import models.model_utils as ref_mu
    import utils.loss_utils as ref_losses

    model = ref_svd.Model(cfg or pcn_cfg())
    model.load_state_dict(state_dict)
    model.eval()
    render = ref_mu.PCViews(TRANS=-0.7, RESOLUTION=resolution)

    rows = []
    with torch.no_grad():
        for partial, gt in clouds:
            tp = torch.from_numpy(partial.copy())
            tg = torch.from_numpy(gt.copy())
            depth = torch.unsqueeze(render.get_img(tp), 1)
            preds = model(tp.contiguous(), depth)
            cdl1, _, f1 = ref_losses.calc_cd(preds[-1], tg, calc_f1=True)
            dcd, _, _ = ref_losses.calc_dcd(preds[-1], tg)
            rows.append(
                (
                    cdl1.mean().item() * 1e3,
                    dcd.mean().item(),
                    f1.mean().item(),
                )
            )
    return np.asarray(rows)  # (S, 3)


def _our_eval(pth_path, clouds, model_kw=None, resolution=224):
    """Our full eval path: .pth converter + jitted render/forward/metrics."""
    import jax
    import jax.numpy as jnp

    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.render.pcviews import PCViews
    from svdformer_pointsea_tpu.train.convert import load_torch_checkpoint
    from svdformer_pointsea_tpu.train.evaluate import make_pcn_eval_fn

    params, batch_stats = load_torch_checkpoint(str(pth_path))
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats),
    }
    fn = make_pcn_eval_fn(
        SVDFormer(**(model_kw or {})), PCViews(trans=-0.7, resolution=resolution)
    )
    rows = []
    for partial, gt in clouds:
        m = np.asarray(fn(variables, jnp.asarray(partial), jnp.asarray(gt)))
        rows.append((m[0, 0], m[1, 0], m[2, 0]))  # cd already x10^3
    return np.asarray(rows)


def test_pcn_cd_metric_parity_gate(rng):
    """|Delta CD-L1x10^3| <= 0.01 between reference and TPU pipelines."""
    ref_svd, _ = load_reference_models()

    torch.manual_seed(0)
    model = ref_svd.Model(pcn_cfg())
    state_dict = model.state_dict()

    import tempfile, os

    clouds = [
        (make_partial(rng, 1, 2048), make_partial(rng, 1, 16384))
        for _ in range(N_SAMPLES)
    ]

    ref_rows = _reference_eval(ref_svd, state_dict, clouds)

    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "ckpt-best.pth")
        # DataParallel-prefixed keys, as real reference checkpoints carry
        # (core/train_pcn.py:161-164 saves the wrapped module).
        torch.save(
            {"model": {f"module.{k}": v for k, v in state_dict.items()}}, pth
        )
        our_rows = _our_eval(pth, clouds)

    d_cd = np.abs(ref_rows[:, 0] - our_rows[:, 0])
    d_dcd = np.abs(ref_rows[:, 1] - our_rows[:, 1])
    d_f1 = np.abs(ref_rows[:, 2] - our_rows[:, 2])
    print(
        f"\nmetric-parity gate: CD-L1x10^3 ref={ref_rows[:,0].round(5)} "
        f"ours={our_rows[:,0].round(5)}\n"
        f"  |dCD| per-sample={d_cd.round(6)} mean={d_cd.mean():.6f} "
        f"(budget {CD_BUDGET})\n"
        f"  |dDCD| max={d_dcd.max():.6f}  |dF1| max={d_f1.max():.6f}"
    )
    assert d_cd.max() <= CD_BUDGET, (ref_rows[:, 0], our_rows[:, 0])
    assert abs(ref_rows[:, 0].mean() - our_rows[:, 0].mean()) <= CD_BUDGET
    # DCD in [0,1); F1 in [0,1]: hold the companions to matching precision.
    assert d_dcd.max() <= 1e-3, (ref_rows[:, 1], our_rows[:, 1])
    assert d_f1.max() <= 1e-3, (ref_rows[:, 2], our_rows[:, 2])


def test_pcn_cd_metric_parity_gate_trained_regime_full_geometry(rng):
    """Trained-regime gate at FLAGSHIP geometry (VERDICT r3 next #5).

    The tiny-geometry retrain below argues BN/optimizer effects are
    architecture-uniform; this leg removes the argument's one gap by
    pushing the full 224^2 trunk BN and the 2048-token attention stack
    through both pipelines in trained regime at least once: 10 genuine
    reference train steps at B2 and full PCN geometry (2048-pt partial ->
    16384-pt completion, 224^2 render — core/train_pcn.py:85-150's loop
    verbatim), then both eval pipelines on held-out clouds, same
    |Delta CD-L1x10^3| <= 0.01 budget.

    Cost: ~124 s/reference-step on this 1-CPU box (measured), so the
    retrain result is cached like the tiny leg's (~21 min cold, seconds
    warm; delete the file to force a retrain).
    """
    import os

    ref_svd, ref_mu = load_reference_models()
    import utils.loss_utils as ref_losses

    torch.manual_seed(2)
    model = ref_svd.Model(pcn_cfg())
    # Draw data before the cache check so held-out clouds match cold/warm.
    data = [
        (make_partial(rng, 2, 2048), make_partial(rng, 2, 16384))
        for _ in range(4)
    ]
    cache = "/tmp/svdformer_test_cache_trained_sd_full_v1.pt"
    if os.path.exists(cache):
        state_dict = torch.load(cache, weights_only=True)
        model.load_state_dict(state_dict)
    else:
        model.train()
        render = ref_mu.PCViews(TRANS=-0.7, RESOLUTION=224)
        opt = torch.optim.Adam(
            model.parameters(), lr=1e-4, weight_decay=0, betas=(0.9, 0.999)
        )
        for step in range(10):
            partial, gt = data[step % len(data)]
            tp = torch.from_numpy(partial.copy())
            tg = torch.from_numpy(gt.copy())
            depth = torch.unsqueeze(render.get_img(tp), 1)
            preds = model(tp.contiguous(), depth)
            loss, _ = ref_losses.get_loss(preds, tg, sqrt=True)
            opt.zero_grad()
            loss.backward()
            opt.step()
        assert np.isfinite(loss.item())
        torch.save(model.state_dict(), cache)
    state_dict = model.state_dict()
    bn_means = [
        v for k, v in state_dict.items() if k.endswith("running_mean")
    ]
    assert max(float(m.abs().max()) for m in bn_means) > 1e-3

    clouds = [
        (make_partial(rng, 1, 2048), make_partial(rng, 1, 16384))
        for _ in range(2)
    ]
    ref_rows = _reference_eval(ref_svd, state_dict, clouds)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "ckpt-best.pth")
        torch.save(
            {"model": {f"module.{k}": v for k, v in state_dict.items()}}, pth
        )
        our_rows = _our_eval(pth, clouds)

    d_cd = np.abs(ref_rows[:, 0] - our_rows[:, 0])
    print(
        f"\ntrained-regime full-geometry gate: CD-L1x10^3 "
        f"ref={ref_rows[:,0].round(5)} ours={our_rows[:,0].round(5)} "
        f"|dCD| max={d_cd.max():.6f}"
    )
    assert d_cd.max() <= CD_BUDGET, (ref_rows[:, 0], our_rows[:, 0])
    assert np.abs(ref_rows[:, 1] - our_rows[:, 1]).max() <= 1e-3
    assert np.abs(ref_rows[:, 2] - our_rows[:, 2]).max() <= 1e-3


def test_pcn_cd_metric_parity_gate_trained_regime(rng):
    """The gate on TRAINED-regime weights (VERDICT r2 next #4).

    The random-init gate above cannot catch trained-regime drift: BatchNorm
    running stats that evolved over many optimizer steps, Adam-shaped weight
    distributions. Close that: run 200 genuine reference train steps on CPU
    (the hot loop of core/train_pcn.py:101-134 — its renderer, Model.forward
    in train mode, get_loss(sqrt=True), torch Adam with the reference
    hyperparameters) at tiny geometry, then push the RESULTING checkpoint —
    weights + evolved BN running stats — through both full eval pipelines on
    held-out clouds and hold |Delta CD-L1x10^3| <= 0.01 again.

    Tiny geometry (step1=step2=2, merge/local 32, 256-pt gt, 48^2 render —
    the trunk ends in adaptive pooling, models/SVDFormer.py:134, so
    resolution is a free parameter; the partial stays at 2048 points
    because SVFNet hard-codes N//8 in its seed reshape,
    models/SVDFormer.py:163): BN-stat evolution and optimizer effects are
    architecture-uniform, and full geometry would be hours of torch CPU
    arithmetic. Measured ~1 s/reference-step at this geometry.
    """
    ref_svd, ref_mu = load_reference_models()
    import utils.loss_utils as ref_losses

    cfg = pcn_cfg()
    cfg.NETWORK.step1 = 2
    cfg.NETWORK.step2 = 2
    cfg.NETWORK.local_points = 32
    cfg.NETWORK.merge_points = 32
    model_kw = dict(step1=2, step2=2, merge_points=32, local_points=32)
    res = 48

    import os

    torch.manual_seed(1)
    model = ref_svd.Model(cfg)
    # Drawn before the cache check so the held-out eval clouds below see
    # the same rng state on cold and warm runs.
    data = [
        (make_partial(rng, 2, 2048), make_partial(rng, 2, 256))
        for _ in range(8)
    ]
    # The 200-step torch training is deterministic (seeded init, fixed
    # data); cache its result like the XLA compile cache so warm suite
    # runs skip the ~3.5 min retrain. Delete the file to force a retrain.
    cache = "/tmp/svdformer_test_cache_trained_sd_v1.pt"
    if os.path.exists(cache):
        state_dict = torch.load(cache, weights_only=True)
        model.load_state_dict(state_dict)  # validates shape compatibility
    else:
        model.train()
        render = ref_mu.PCViews(TRANS=-0.7, RESOLUTION=res)
        # Reference optimizer: Adam(lr=1e-4, wd=0, betas=(.9,.999))
        # (core/train_pcn.py:58-60, config_pcn.py TRAIN block).
        opt = torch.optim.Adam(
            model.parameters(), lr=1e-4, weight_decay=0, betas=(0.9, 0.999)
        )
        for step in range(200):
            partial, gt = data[step % len(data)]
            tp = torch.from_numpy(partial.copy())
            tg = torch.from_numpy(gt.copy())
            depth = torch.unsqueeze(render.get_img(tp), 1)
            preds = model(tp.contiguous(), depth)
            loss, _ = ref_losses.get_loss(preds, tg, sqrt=True)
            opt.zero_grad()
            loss.backward()
            opt.step()
        assert np.isfinite(loss.item())
        torch.save(model.state_dict(), cache)
    state_dict = model.state_dict()
    # BN running stats must actually have evolved, or this gate is the
    # random-init one in disguise.
    bn_means = [
        v for k, v in state_dict.items() if k.endswith("running_mean")
    ]
    assert max(float(m.abs().max()) for m in bn_means) > 1e-3

    clouds = [
        (make_partial(rng, 1, 2048), make_partial(rng, 1, 256))
        for _ in range(3)
    ]
    ref_rows = _reference_eval(ref_svd, state_dict, clouds, cfg, res)

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "ckpt-best.pth")
        torch.save(
            {"model": {f"module.{k}": v for k, v in state_dict.items()}}, pth
        )
        our_rows = _our_eval(pth, clouds, model_kw, res)

    d_cd = np.abs(ref_rows[:, 0] - our_rows[:, 0])
    print(
        f"\ntrained-regime gate: CD-L1x10^3 ref={ref_rows[:,0].round(5)} "
        f"ours={our_rows[:,0].round(5)} |dCD| max={d_cd.max():.6f}"
    )
    assert d_cd.max() <= CD_BUDGET, (ref_rows[:, 0], our_rows[:, 0])
    assert np.abs(ref_rows[:, 1] - our_rows[:, 1]).max() <= 1e-3
    assert np.abs(ref_rows[:, 2] - our_rows[:, 2]).max() <= 1e-3
