"""End-to-end orchestration tests (SURVEY §4e): micro-train on a synthetic
on-disk dataset, eval tables, checkpoint best/periodic policy + resume, and
the GAN trainer — all at tiny geometry on the CPU backend."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.configs import geospec_config, pcn_config, shapenet55_config
from svdformer_pointsea_tpu.data import write_pcd
from svdformer_pointsea_tpu.train import (
    CheckpointManager,
    build_model,
    init_state,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
    train_net,
)
from svdformer_pointsea_tpu.utils import AverageMeter


# resolution=32: the 224^2 16-channel trunk convs dominate micro-train time
# on this 1-CPU box (~50x raster shrink; orchestration coverage unchanged).
TINY_NET = dict(step1=2, step2=2, merge_points=32, local_points=32, resolution=32)


def _tiny_pcn_config(tmp_path, rng, n_models=3, gt_points=512, n_points=256):
    """Write a minimal PCN-format dataset tree and return a matching config."""
    root = tmp_path / "pcn"
    ids = [f"m{i}" for i in range(n_models)]
    cats = [
        {
            "taxonomy_id": "02691156",
            "taxonomy_name": "plane",
            "train": ids,
            "val": ids[:1],
            "test": ids[:2],
        }
    ]
    index = tmp_path / "ShapeNet.json"
    index.write_text(json.dumps(cats))
    for subset, subset_ids in (("train", ids), ("val", ids[:1]), ("test", ids[:2])):
        for mid in subset_ids:
            cdir = root / subset / "complete" / "02691156"
            cdir.mkdir(parents=True, exist_ok=True)
            write_pcd(
                str(cdir / f"{mid}.pcd"), rng.rand(gt_points, 3).astype(np.float32)
            )
            pdir = root / subset / "partial" / "02691156" / mid
            pdir.mkdir(parents=True, exist_ok=True)
            write_pcd(str(pdir / "00.pcd"), rng.rand(150, 3).astype(np.float32))

    cfg = pcn_config()
    return cfg.replace(
        network=dataclasses.replace(cfg.network, **TINY_NET, n_input_points=n_points),
        data=dataclasses.replace(
            cfg.data,
            category_file=str(index),
            n_renderings=1,
            n_points=n_points,
            gt_points=gt_points,
            num_workers=2,
            partial_points_path=str(root) + "/%s/partial/%s/%s/%02d.pcd",
            complete_points_path=str(root) + "/%s/complete/%s/%s.pcd",
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, n_epochs=1, save_freq=1, warmup_steps=2
        ),
        out_path=str(tmp_path / "out"),
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "w": jnp.asarray(rng.rand(4, 3), jnp.float32),
        "nested": {"b": jnp.arange(5, dtype=jnp.int32)},
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, epoch=7, best_metric=0.25)
    restored, epoch, best = restore_checkpoint(path, state)
    assert epoch == 7 and best == 0.25
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(state["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored["nested"]["b"]), np.asarray(state["nested"]["b"])
    )


def test_checkpoint_manager_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "run"), save_freq=2)
    state = {"w": jnp.zeros((2,))}
    assert mgr.maybe_save(state, epoch=1, val_metric=1.0)  # best, not periodic
    assert not mgr.maybe_save(state, epoch=2, val_metric=2.0)  # periodic only
    assert mgr.maybe_save(state, epoch=3, val_metric=0.5)  # best again
    names = sorted(os.listdir(mgr.dir))
    assert names == ["ckpt-best", "ckpt-epoch-002"]
    _, epoch, best = restore_checkpoint(os.path.join(mgr.dir, "ckpt-best"), state)
    assert epoch == 3 and best == 0.5


@pytest.mark.heavy
def test_micro_train_pcn_end_to_end(tmp_path, rng):
    """Full train_net: data from disk -> render -> step -> eval -> ckpt.

    Runs with the live-progress display on (cfg.train.progress): the
    one-step-lag pipelined fetch must produce the same meters/logs as the
    default epoch-end drain.
    """
    cfg = _tiny_pcn_config(tmp_path, rng)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, progress=True))
    state, best = train_net(cfg, max_epochs=1)
    assert np.isfinite(best)
    assert int(state.step) == 2  # 3 samples, batch 2, pad -> 2 steps
    ckpt_dir = os.path.join(cfg.out_path, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt-best"))
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt-epoch-001"))
    # Scalars stream written.
    logs = os.path.join(cfg.out_path, "logs", "scalars.jsonl")
    tags = {json.loads(l)["tag"] for l in open(logs)}
    assert {"Train/loss", "Train/lr", "Test/cd"} <= tags

    # ---- resume: epoch counter and best metric restored ----
    cfg2 = cfg.replace(
        weights=os.path.join(ckpt_dir, "ckpt-best"),
        train=dataclasses.replace(cfg.train, n_epochs=2),
    )
    state2, best2 = train_net(cfg2, max_epochs=2)
    assert int(state2.step) == 4  # resumed from step 2, one more epoch
    assert best2 <= best + 1e-9


@pytest.mark.heavy
def test_resume_state_exactness(tmp_path, rng):
    """train N == train k -> checkpoint -> restore -> train N-k, EXACTLY
    (VERDICT r3 next #1a): params, opt_state and batch_stats bit-compare
    and the best metric matches — a preempted 400-epoch run
    (config_pcn.py:67) resumes on the straight run's trajectory instead of
    silently diverging. Relies on (seed, epoch)-keyed data determinism:
    Loader.set_epoch shuffle/augmentation seeding and the per-epoch crop
    stream (train/loop.py epoch head)."""
    cfg = _tiny_pcn_config(tmp_path, rng, n_models=4, gt_points=256, n_points=128)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, n_epochs=4, save_freq=2),
        out_path=str(tmp_path / "straight"),
    )
    state_a, best_a = train_net(cfg, max_epochs=4)
    assert int(state_a.step) == 8  # 4 models, batch 2 -> 2 steps x 4 epochs

    ckpt2 = os.path.join(cfg.out_path, "checkpoints", "ckpt-epoch-002")
    assert os.path.isdir(ckpt2)
    cfg_b = cfg.replace(weights=ckpt2, out_path=str(tmp_path / "resumed"))
    state_b, best_b = train_net(cfg_b, max_epochs=4)
    assert int(state_b.step) == 8

    for name, ta, tb in (
        ("params", state_a.params, state_b.params),
        ("opt_state", state_a.opt_state, state_b.opt_state),
        ("batch_stats", state_a.batch_stats, state_b.batch_stats),
    ):
        la = jax.tree_util.tree_leaves_with_path(ta)
        lb = jax.tree_util.tree_leaves(tb)
        assert len(la) == len(lb)
        for (path, a), b in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(a),
                np.asarray(b),
                err_msg=f"{name}{jax.tree_util.keystr(path)} diverged after resume",
            )
    assert best_a == best_b


@pytest.mark.heavy
def test_micro_train_55_end_to_end(tmp_path, rng):
    """ShapeNet-55 track: npy data, online crops, partial-matching loss,
    8-viewpoint eval (trimmed to 1 viewpoint via monkeypatched corners)."""
    gt_points, n_points = 512, 128
    pc_dir = tmp_path / "shapenet_pc"
    pc_dir.mkdir()
    idx_dir = tmp_path / "ShapeNet55"
    idx_dir.mkdir()
    names = []
    for i in range(2):
        name = f"0269115{i}-model{i}.npy"
        np.save(pc_dir / name, rng.rand(gt_points, 3).astype(np.float32))
        names.append(name)
    (idx_dir / "train.txt").write_text("\n".join(names))
    (idx_dir / "test.txt").write_text(names[0] + "\n")

    cfg = shapenet55_config(mode="easy")
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network, **TINY_NET, n_input_points=n_points, decoder="attn"
        ),
        data=dataclasses.replace(
            cfg.data,
            category_file=str(idx_dir),
            complete_points_path=str(pc_dir) + "/%s",
            gt_points=gt_points,
            n_points=n_points,
            num_workers=2,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, n_epochs=1, save_freq=1, warmup_steps=2
        ),
        out_path=str(tmp_path / "out55"),
    )
    from svdformer_pointsea_tpu.train import evaluate as ev

    orig = ev.eval_55

    def fast_eval(cfg, model, variables, loader, logger=None, epoch=0, mode=None):
        return orig(cfg, model, variables, loader, logger, epoch, mode, n_viewpoints=1)

    import svdformer_pointsea_tpu.train.loop as loop_mod

    saved = loop_mod.eval_55
    loop_mod.eval_55 = fast_eval
    try:
        state, best = train_net(cfg, max_epochs=1)
    finally:
        loop_mod.eval_55 = saved
    assert np.isfinite(best)
    assert int(state.step) == 1  # 2 samples, batch 2


@pytest.mark.heavy
def test_gan_micro_step(rng):
    """One jitted GAN step: D and G both update, losses finite
    (core/train_geospec.py:110-130 ordering)."""
    from svdformer_pointsea_tpu.train.gan import create_gan_state, make_gan_train_step

    cfg = geospec_config()
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network, **TINY_NET, n_input_points=256
        ),
        data=dataclasses.replace(cfg.data, n_points=256, gt_points=256),
    )
    g_model, d_model, g_opt, d_opt, state = create_gan_state(cfg, seed=0)
    step = make_gan_train_step(g_model, d_model, g_opt, d_opt, gan_weight=0.05)

    B, N, res = 2, 256, 8
    partial = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(B, 3, res, res), jnp.float32)
    gt = jnp.asarray(rng.rand(B, 256, 3), jnp.float32)
    d_before = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    g_before = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    state, metrics = step(state, partial, depth, gt, 1e-4, 1e-4)
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    assert not np.allclose(d_before, jax.tree_util.tree_leaves(state.d_params)[0])
    assert not np.allclose(g_before, jax.tree_util.tree_leaves(state.g_params)[0])
    assert int(state.step) == 1


def test_average_meter_multi_item():
    m = AverageMeter(["a", "b"])
    m.update([1.0, 10.0])
    m.update([3.0, 30.0])
    assert m.avg() == [2.0, 20.0]
    assert m.val(1) == 30.0
    assert m.count(0) == 2
    s = AverageMeter()
    s.update(5)
    assert s.avg() == 5.0


@pytest.mark.heavy
def test_micro_train_55_adversarial(tmp_path, rng):
    """Optional adversarial 55 branch (core/train_55.py:115-122,156-176):
    SimplePointDiscriminator trained inline, BCE generator term."""
    gt_points, n_points = 512, 128
    pc_dir = tmp_path / "shapenet_pc"
    pc_dir.mkdir()
    idx_dir = tmp_path / "ShapeNet55"
    idx_dir.mkdir()
    names = []
    for i in range(2):
        name = f"0269115{i}-model{i}.npy"
        np.save(pc_dir / name, rng.rand(gt_points, 3).astype(np.float32))
        names.append(name)
    (idx_dir / "train.txt").write_text("\n".join(names))
    (idx_dir / "test.txt").write_text(names[0] + "\n")

    cfg = shapenet55_config(mode="easy", adv=True)
    assert cfg.train.adv_enabled
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network, **TINY_NET, n_input_points=n_points, decoder="attn"
        ),
        data=dataclasses.replace(
            cfg.data,
            category_file=str(idx_dir),
            complete_points_path=str(pc_dir) + "/%s",
            gt_points=gt_points,
            n_points=n_points,
            num_workers=2,
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=2,
            n_epochs=1,
            save_freq=1,
            warmup_steps=2,
            adv_d_steps=2,
        ),
        out_path=str(tmp_path / "out55adv"),
    )
    from svdformer_pointsea_tpu.train import evaluate as ev

    orig = ev.eval_55

    def fast_eval(cfg, model, variables, loader, logger=None, epoch=0, mode=None):
        return orig(cfg, model, variables, loader, logger, epoch, mode, n_viewpoints=1)

    import svdformer_pointsea_tpu.train.loop as loop_mod

    saved = loop_mod.eval_55
    loop_mod.eval_55 = fast_eval
    try:
        state, best = train_net(cfg, max_epochs=1)
    finally:
        loop_mod.eval_55 = saved
    assert np.isfinite(best)
    assert int(state.step) == 1


@pytest.mark.heavy
def test_adv55_step_updates_both_networks(rng):
    """One adversarial step moves both G and D params and returns finite
    losses (the D-steps fori_loop and the 0.5-weighted BCE)."""
    import jax
    import jax.numpy as jnp

    from svdformer_pointsea_tpu.train.gan import (
        create_adv55_state,
        make_adv55_train_step,
    )

    cfg = shapenet55_config(adv=True)
    cfg = cfg.replace(
        network=dataclasses.replace(cfg.network, **TINY_NET, n_input_points=64),
        data=dataclasses.replace(cfg.data, gt_points=256, n_points=64),
    )
    model = build_model(cfg)
    optimizer = make_optimizer()
    state = init_state(cfg, model, optimizer, seed=0)
    d_model, d_opt, adv = create_adv55_state(cfg, seed=0)
    step = make_adv55_train_step(
        model, d_model, optimizer, d_opt,
        sqrt_loss=False, lambda_g=0.05, d_steps=2,
    )
    B = 2
    partial = jnp.asarray(rng.rand(B, 64, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(B, 3, 224, 224).astype(np.float32))
    gt = jnp.asarray(rng.rand(B, 256, 3).astype(np.float32))
    # Snapshot before the call: the step donates (state, adv) buffers.
    g0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    d0 = np.asarray(jax.tree_util.tree_leaves(adv.d_params)[0])
    new_state, new_adv, metrics = step(
        state, adv, partial, depth, gt, jnp.float32(1e-4), jnp.float32(1e-4)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    g1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(g0, np.asarray(g1))
    d1 = jax.tree_util.tree_leaves(new_adv.d_params)[0]
    assert not np.allclose(d0, np.asarray(d1))


@pytest.mark.heavy
def test_micro_train_pointsea_end_to_end(tmp_path, rng):
    """PointSea track: PCN data + realistic voxel renderer selected by
    make_renderer (beyond-reference: models_PointSea ships no trainer)."""
    import json

    from svdformer_pointsea_tpu.configs import pointsea_config

    gt_points, n_points = 256, 64
    root = tmp_path / "pcn"
    cats = [{"taxonomy_id": "02691156", "taxonomy_name": "plane",
             "train": ["m0", "m1"], "val": ["m0"], "test": ["m0"]}]
    index = tmp_path / "ShapeNet.json"
    index.write_text(json.dumps(cats))
    for subset, ids in (("train", ["m0", "m1"]), ("val", ["m0"])):
        for mid in ids:
            cdir = root / subset / "complete" / "02691156"
            cdir.mkdir(parents=True, exist_ok=True)
            write_pcd(str(cdir / f"{mid}.pcd"), rng.rand(gt_points, 3).astype(np.float32))
            pdir = root / subset / "partial" / "02691156" / mid
            pdir.mkdir(parents=True, exist_ok=True)
            for i in range(2 if subset == "train" else 1):
                write_pcd(str(pdir / f"{i:02d}.pcd"), rng.rand(100, 3).astype(np.float32))

    cfg = pointsea_config()
    cfg = cfg.replace(
        network=dataclasses.replace(cfg.network, **TINY_NET, n_input_points=n_points),
        data=dataclasses.replace(
            cfg.data,
            category_file=str(index),
            n_renderings=2,
            partial_points_path=str(root) + "/%s/partial/%s/%s/%02d.pcd",
            complete_points_path=str(root) + "/%s/complete/%s/%s.pcd",
            n_points=n_points,
            gt_points=gt_points,
            num_workers=2,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, n_epochs=1, save_freq=1, warmup_steps=2
        ),
        out_path=str(tmp_path / "outps"),
    )
    state, best = train_net(cfg, max_epochs=1)
    assert np.isfinite(best)
    assert int(state.step) == 1


def test_infer_files_standalone_completion(tmp_path, rng):
    """--complete surface: arbitrary-size scans in mixed formats ->
    fixed-shape batched forward -> completions written back in the scan's
    original frame (train/infer.py; beyond-reference serving surface)."""
    from svdformer_pointsea_tpu.train.infer import (
        _load_xyz,
        _resample,
        _to_pcn_frame,
        infer_files,
    )

    # Layout validation (ADVICE r3): xyz+extra channels sliced, not mangled;
    # un-interpretable layouts fail loudly instead of reshaping to garbage.
    six = rng.rand(20, 6).astype(np.float32)
    np.save(str(tmp_path / "xyzrgb.npy"), six)
    np.testing.assert_array_equal(_load_xyz(str(tmp_path / "xyzrgb.npy")), six[:, :3])
    flat = rng.rand(30).astype(np.float32)  # flat xyz stream is unambiguous
    np.save(str(tmp_path / "flat.npy"), flat)
    assert _load_xyz(str(tmp_path / "flat.npy")).shape == (10, 3)
    np.save(str(tmp_path / "bad2col.npy"), rng.rand(20, 2).astype(np.float32))
    with pytest.raises(ValueError, match="expected an"):
        _load_xyz(str(tmp_path / "bad2col.npy"))
    np.save(str(tmp_path / "bad3d.npy"), rng.rand(4, 5, 3).astype(np.float32))
    with pytest.raises(ValueError, match="expected an"):
        _load_xyz(str(tmp_path / "bad3d.npy"))

    # Resample semantics (reference UpSamplePoints-style): enough points ->
    # without replacement (all rows distinct); too few -> keep all, top up.
    r = np.random.RandomState(0)
    big = rng.rand(50, 3).astype(np.float32)
    out = _resample(big, 8, r)
    assert out.shape == (8, 3) and len(np.unique(out, axis=0)) == 8
    small = rng.rand(5, 3).astype(np.float32)
    out = _resample(small, 8, r)
    assert out.shape == (8, 3)
    assert all(any(np.allclose(row, s) for s in small) for row in out)

    # Frame mapping roundtrip: scan -> PCN frame -> back is identity.
    scan = (rng.rand(40, 3).astype(np.float32) - 0.5) * 7.0 + np.float32(100.0)
    norm, centroid, scale = _to_pcn_frame(scan)
    assert np.linalg.norm(norm, axis=1).max() == pytest.approx(0.5, rel=1e-5)
    np.testing.assert_allclose(norm / scale + centroid, scan, rtol=2e-5, atol=2e-4)

    # End-to-end on 3 scans (mixed ext, mixed sizes, off-origin frame),
    # random-init weights (smoke path; infer_files warns).
    cfg = _tiny_pcn_config(tmp_path, rng, gt_points=256, n_points=128)
    scans = tmp_path / "scans"
    scans.mkdir()
    write_pcd(str(scans / "a.pcd"), rng.rand(300, 3).astype(np.float32) + 50.0)
    np.save(str(scans / "b.npy"), rng.rand(90, 3).astype(np.float32) + 50.0)
    np.savetxt(str(scans / "c.txt"), rng.rand(128, 3).astype(np.float32) + 50.0)
    outs = infer_files(cfg, str(scans), out_dir=str(tmp_path / "done"))
    assert sorted(os.path.basename(o) for o in outs) == [
        "a_completion.pcd", "b_completion.pcd", "c_completion.pcd",
    ]
    for o in outs:
        comp = np.asarray(
            __import__("svdformer_pointsea_tpu.data", fromlist=["IO"]).IO.get(o)
        )
        # Output size is the model's final-stage point count (tiny net:
        # n_points * step1-upsampling collapses at this geometry).
        assert comp.ndim == 2 and comp.shape[1] == 3 and comp.shape[0] >= 128
        assert np.isfinite(comp).all()
        # Mapped back to the scan's frame (centroid ~50, not the PCN origin).
        assert np.abs(comp.mean(axis=0) - 50.0).max() < 5.0


def test_cli_complete_requires_weights(tmp_path, rng):
    from svdformer_pointsea_tpu import cli

    with pytest.raises(SystemExit, match="--weights"):
        cli.main_pcn(["--complete", str(tmp_path)])


def test_step_timer_reset_isolates_epochs():
    """StepTimer.reset() (round-5 fix): without it, the first mark_data of
    an epoch absorbed the previous epoch's validation/checkpoint wall time
    — round-4 soak logs showed data= spiking to 1.2-2.3 s/it on exactly
    the post-ckpt-save epochs. reset() re-arms the clock at epoch start so
    data_time measures only loader wait."""
    import time as _time

    from svdformer_pointsea_tpu.utils.logging import StepTimer

    timer = StepTimer()
    timer.mark_data()
    timer.mark_batch(1)
    _time.sleep(0.2)  # simulated epoch-boundary eval/ckpt work
    timer.reset()
    timer.mark_data()  # first batch of the next epoch, immediate
    assert timer.data_time < 0.1, timer.data_time

    # Control: without reset the boundary leaks into data_time.
    timer2 = StepTimer()
    timer2.mark_data()
    timer2.mark_batch(1)
    _time.sleep(0.2)
    timer2.mark_data()
    assert timer2.data_time >= 0.2


@pytest.mark.heavy
def test_resume_state_exactness_55(tmp_path, rng):
    """55-track twin of test_resume_state_exactness: the online crop
    synthesis draws (num_crop, direction) from a HOST RandomState seeded
    per-(seed, epoch, 55) at each epoch head (train/loop.py) — resume must
    replay those draws exactly or params silently diverge. train 4 epochs
    straight == train 2 -> ckpt -> restore -> train 2, bit-compared."""
    gt_points, n_points = 256, 128
    pc_dir = tmp_path / "shapenet_pc"
    pc_dir.mkdir()
    idx_dir = tmp_path / "ShapeNet55"
    idx_dir.mkdir()
    names = []
    for i in range(4):
        name = f"0269115{i}-model{i}.npy"
        np.save(pc_dir / name, rng.rand(gt_points, 3).astype(np.float32))
        names.append(name)
    (idx_dir / "train.txt").write_text("\n".join(names))
    (idx_dir / "test.txt").write_text(names[0] + "\n")

    cfg = shapenet55_config(mode="easy")
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network, **TINY_NET, n_input_points=n_points, decoder="attn"
        ),
        data=dataclasses.replace(
            cfg.data,
            category_file=str(idx_dir),
            complete_points_path=str(pc_dir) + "/%s",
            gt_points=gt_points,
            n_points=n_points,
            num_workers=2,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, n_epochs=4, save_freq=2, warmup_steps=2
        ),
        out_path=str(tmp_path / "straight55"),
    )

    from svdformer_pointsea_tpu.train import evaluate as ev

    orig = ev.eval_55

    def fast_eval(cfg, model, variables, loader, logger=None, epoch=0, mode=None):
        return orig(cfg, model, variables, loader, logger, epoch, mode,
                    n_viewpoints=1)

    import svdformer_pointsea_tpu.train.loop as loop_mod

    saved = loop_mod.eval_55
    loop_mod.eval_55 = fast_eval
    try:
        state_a, best_a = train_net(cfg, max_epochs=4)
        assert int(state_a.step) == 8  # 4 models, batch 2 -> 2 steps x 4

        ckpt2 = os.path.join(cfg.out_path, "checkpoints", "ckpt-epoch-002")
        assert os.path.isdir(ckpt2)
        cfg_b = cfg.replace(weights=ckpt2, out_path=str(tmp_path / "resumed55"))
        state_b, best_b = train_net(cfg_b, max_epochs=4)
    finally:
        loop_mod.eval_55 = saved
    assert int(state_b.step) == 8

    for name, ta, tb in (
        ("params", state_a.params, state_b.params),
        ("opt_state", state_a.opt_state, state_b.opt_state),
        ("batch_stats", state_a.batch_stats, state_b.batch_stats),
    ):
        la = jax.tree_util.tree_leaves_with_path(ta)
        lb = jax.tree_util.tree_leaves(tb)
        assert len(la) == len(lb)
        for (path, a), b in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(a),
                np.asarray(b),
                err_msg=f"{name}{jax.tree_util.keystr(path)} diverged after resume",
            )
    assert best_a == best_b


@pytest.mark.heavy
def test_resume_state_exactness_gan(tmp_path, rng):
    """GAN-trainer twin of test_resume_state_exactness: the GeoSpec
    two-optimizer state (G+D params, both opt states, G batch_stats) must
    resume bit-exactly through train_net_gan's checkpoint path — train 4
    epochs straight == train 2 -> ckpt -> restore -> train 2."""
    from svdformer_pointsea_tpu.train.gan import train_net_gan

    cfg = _tiny_pcn_config(tmp_path, rng, n_models=4, gt_points=256, n_points=128)
    cfg = cfg.replace(
        network=dataclasses.replace(cfg.network, model="geospecnet"),
        train=dataclasses.replace(cfg.train, n_epochs=4, save_freq=2),
        out_path=str(tmp_path / "gan_straight"),
    )
    state_a, best_a = train_net_gan(cfg, max_epochs=4)
    assert int(state_a.step) == 8  # 4 models, batch 2 -> 2 steps x 4 epochs

    ckpt2 = os.path.join(cfg.out_path, "checkpoints", "ckpt-epoch-002")
    assert os.path.isdir(ckpt2)
    cfg_b = cfg.replace(weights=ckpt2, out_path=str(tmp_path / "gan_resumed"))
    state_b, best_b = train_net_gan(cfg_b, max_epochs=4)
    assert int(state_b.step) == 8

    for name in ("g_params", "d_params", "g_opt_state", "d_opt_state",
                 "g_batch_stats", "d_batch_stats"):
        ta, tb = getattr(state_a, name, None), getattr(state_b, name, None)
        if ta is None:
            continue
        la = jax.tree_util.tree_leaves_with_path(ta)
        lb = jax.tree_util.tree_leaves(tb)
        assert len(la) == len(lb)
        for (path, a), b in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(a),
                np.asarray(b),
                err_msg=f"{name}{jax.tree_util.keystr(path)} diverged after resume",
            )
    assert best_a == best_b
