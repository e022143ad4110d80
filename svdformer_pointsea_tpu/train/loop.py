"""Training orchestration for the PCN and ShapeNet-55 tracks.

TPU-native re-design of core/train_pcn.py and core/train_55.py: one jitted
data-parallel train step over the device mesh (batch-sharded inputs,
replicated params; XLA inserts the gradient all-reduce), a threaded prefetch
loader on host, depth rendering and (on the 55 track) online crop synthesis
fused INTO the jitted train step — one dispatch per batch — plus orbax
best/periodic checkpoints and JSONL/TB scalar logging.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from svdformer_pointsea_tpu.configs import Config
from svdformer_pointsea_tpu.data import Loader, make_dataset, random_crop_params
from svdformer_pointsea_tpu.nn import GeoSpecNet, PointSea, SVDFormer
from svdformer_pointsea_tpu.parallel import (
    make_mesh_for_batch,
    pad_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.render import PCViews, make_renderer
from svdformer_pointsea_tpu.train.checkpoint import CheckpointManager, restore_checkpoint
from svdformer_pointsea_tpu.train.evaluate import eval_55, eval_pcn
from svdformer_pointsea_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    reference_lr_schedule,
)
from svdformer_pointsea_tpu.utils import AverageMeter, SummaryLogger, count_parameters, set_seed


def build_model(cfg: Config):
    """Model factory from the network config (cfg.network.model)."""
    net = cfg.network
    common = dict(
        step1=net.step1,
        step2=net.step2,
        merge_points=net.merge_points,
        local_points=net.local_points,
        view_distance=net.view_distance,
    )
    if net.model == "svdformer":
        return SVDFormer(
            use_pcsa=net.use_pcsa, sdg_decoder=net.decoder == "sdg", **common
        )
    if net.model == "geospecnet":
        return GeoSpecNet(sdg_decoder=net.decoder == "sdg", **common)
    if net.model == "pointsea":
        return PointSea(**common)
    raise ValueError(f"unknown model family: {net.model}")


def _sample_batch(cfg: Config, rng: np.random.RandomState):
    """Tiny random batch matching the track's geometry, for model init."""
    B = 2
    partial = rng.rand(B, cfg.data.n_points, 3).astype(np.float32) * 0.5
    return partial


def init_state(cfg: Config, model, optimizer, seed: int = 1):
    """Initialize TrainState on host (replicated onto the mesh by caller)."""
    rng = np.random.RandomState(seed)
    partial = jnp.asarray(_sample_batch(cfg, rng))
    render = make_renderer(cfg)  # PointSea: realistic voxel renderer
    depth = render.get_img(partial)
    key = jax.random.PRNGKey(seed)
    return create_train_state(model, key, (partial, depth), optimizer)


def train_net(cfg: Config, max_epochs: Optional[int] = None, max_steps: Optional[int] = None):
    """Full training run (core/train_pcn.py:20-170 / core/train_55.py:49-237).

    ``max_epochs``/``max_steps`` bound the run for smoke tests; production
    runs leave them None and use cfg.train.n_epochs.

    Returns (state, best_metric).
    """
    set_seed(cfg.seed)
    is_55 = cfg.data.name == "ShapeNet55"
    tcfg = cfg.train
    # Validate the parallelism flags before any expensive setup.
    sp = int(getattr(tcfg, "sp", 1))
    dp_impl = str(getattr(tcfg, "dp", "gspmd"))
    if dp_impl not in ("gspmd", "shard_map"):
        raise ValueError(f"cfg.train.dp must be gspmd|shard_map, got {dp_impl!r}")
    if dp_impl == "shard_map" and sp > 1:
        raise ValueError(
            "dp=shard_map is 1-D data parallelism; it does not compose with "
            "the sp token-sharding axis (which relies on GSPMD)"
        )
    # Trace-time switch — must precede the first trace (nn/precision.py).
    from svdformer_pointsea_tpu.nn import set_mixed_precision

    set_mixed_precision(getattr(tcfg, "precision", "f32") == "bf16")

    train_ds = make_dataset(cfg, "train", seed=cfg.seed)
    val_ds = make_dataset(cfg, "val" if not is_55 else "test", seed=cfg.seed)
    # Reference: odd batches are duplicated on the 55 track (train_55.py:148-149);
    # our fixed-shape Loader pads by repeat, which matches.
    train_loader = Loader(
        train_ds,
        tcfg.batch_size,
        shuffle=True,
        seed=cfg.seed,
        num_workers=cfg.data.num_workers,
    )
    val_loader = Loader(
        val_ds, tcfg.batch_size, shuffle=False, num_workers=cfg.data.num_workers
    )

    model = build_model(cfg)
    optimizer = make_optimizer(weight_decay=tcfg.weight_decay, betas=tcfg.betas)
    state = init_state(cfg, model, optimizer, seed=cfg.seed)
    logging.info("Parameters: %d", count_parameters(state.params))

    if sp > 1:
        # Opt-in sequence parallelism (parallel/sp.py): 2-D (data, sp)
        # mesh; SDG token axes shard over sp chips. Trace-time switch —
        # must precede the first trace, like set_mixed_precision above.
        from svdformer_pointsea_tpu.parallel import enable_sp, make_mesh_2d

        mesh = make_mesh_2d(sp)
        enable_sp(mesh)
    else:
        mesh = make_mesh_for_batch(tcfg.batch_size)
    state = jax.device_put(state, replicated_sharding(mesh))

    # Optional adversarial branch on the 55 track (core/train_55.py:115-122,
    # 156-176): a lightweight point discriminator trained alongside, with a
    # BCE generator term. D state is run-local (the reference checkpoints
    # only {model, optimizer} here, train_55.py:227-230).
    render = make_renderer(cfg)
    adversarial = bool(getattr(tcfg, "adv_enabled", False))
    if adversarial:
        from svdformer_pointsea_tpu.train.gan import (
            create_adv55_state,
            make_adv55_train_step,
        )

        d_model, d_opt, adv_state = create_adv55_state(cfg, seed=cfg.seed)
        adv_state = jax.device_put(adv_state, replicated_sharding(mesh))
        adv_step = make_adv55_train_step(
            model,
            d_model,
            optimizer,
            d_opt,
            sqrt_loss=tcfg.sqrt_loss,
            lambda_g=tcfg.adv_lambda_g,
            d_steps=tcfg.adv_d_steps,
            render_fn=render.render,
            crop_n_out=cfg.data.n_points,
            mesh=mesh if dp_impl == "shard_map" else None,
        )

        def train_step(state, gt, direction, num_crop, weights, lr):
            nonlocal adv_state
            state, adv_state, metrics = adv_step(
                state, adv_state, gt, direction, num_crop, weights, lr,
                jnp.float32(tcfg.adv_d_lr),
            )
            return state, metrics

    else:
        train_step = make_train_step(
            model,
            optimizer,
            sqrt_loss=tcfg.sqrt_loss,
            partial_matching=tcfg.partial_matching,
            render_fn=render.render,
            crop_n_out=cfg.data.n_points if is_55 else None,
            mesh=mesh if dp_impl == "shard_map" else None,
        )
    lr_fn = reference_lr_schedule(
        tcfg.learning_rate, tcfg.warmup_steps, tcfg.lr_decay_step, tcfg.gamma
    )

    ckpts = CheckpointManager(cfg.out_path, tcfg.save_freq)
    start_epoch = 1
    if cfg.weights:
        state, saved_epoch, best = restore_checkpoint(cfg.weights, state)
        state = jax.device_put(state, replicated_sharding(mesh))
        ckpts.best_metric = best
        start_epoch = saved_epoch + 1
        logging.info("Resumed from %s at epoch %d", cfg.weights, saved_epoch)

    n_epochs = min(tcfg.n_epochs, max_epochs or tcfg.n_epochs)
    global_step = int(state.step)
    logger = SummaryLogger(os.path.join(cfg.out_path, "logs"))

    # Wall-clock accounting + optional jax.profiler traces per step
    # (reference: core/train_pcn.py:88-89,102,127; SURVEY §5 tracing).
    from svdformer_pointsea_tpu.utils.logging import StepTimer

    trace_dir = os.environ.get("SVDFORMER_TPU_TRACE")
    timer = StepTimer(
        trace_dir=trace_dir, trace_steps=(5,) if trace_dir else ()
    )

    # Live per-batch display (the reference's tqdm postfix,
    # core/train_pcn.py:100,129-130). Fetching the CURRENT step's metrics
    # would block dispatch; instead the host fetches step N-1's after
    # dispatching step N — the device has already finished N-1 and is
    # busy on N, so the live line is free (one-step lag).
    progress = bool(getattr(tcfg, "progress", False))

    for epoch in range(start_epoch, n_epochs + 1):
        # Resume-exact data determinism: shuffle order, per-sample
        # augmentation, and (55) crop draws all derive from (seed, epoch),
        # never from how many epochs THIS process has run — a resumed run
        # replays the straight run's batches exactly.
        train_loader.set_epoch(epoch)
        crop_rng = np.random.RandomState(
            np.random.SeedSequence([cfg.seed, epoch, 55]).generate_state(1)[0]
        )
        epoch_t0 = time.time()
        losses = AverageMeter(["cdc", "cd1", "cd2"])
        data_time = AverageMeter()
        batch_time = AverageMeter()
        n_epoch_batches = 0
        pending = []  # (step, lr, device metrics) — fetched once per epoch

        def consume(entries):
            """Fetch + meter + log a list of (step, lr, metrics) entries."""
            vals = None
            for step_i, lr_i, metrics in jax.device_get(entries):
                vals = [
                    float(metrics["cdc"]) * 1e3,
                    float(metrics["cd1"]) * 1e3,
                    float(metrics["cd2"]) * 1e3,
                ]
                losses.update(vals)
                logger.add_scalar("Train/loss", float(metrics["loss"]), int(step_i))
                logger.add_scalar("Train/lr", float(lr_i), int(step_i))
            return vals

        for batch in train_loader:
            timer.mark_data()
            lr = lr_fn(global_step + 1, epoch - 1)
            # Crop synthesis (55) and depth rendering run INSIDE the jitted
            # train step — one dispatch per batch (only the tiny crop
            # size/direction draw stays on host, matching the reference's
            # host RNG, train_55.py:150). Batches that don't divide the
            # device count are padded; pad rows carry zero loss weight.
            if is_55:
                gt = batch.data["gtcloud"]
                num_crop, direction = random_crop_params(
                    crop_rng, gt.shape[0], gt.shape[1]
                )
                (gt, direction, num_crop), w = pad_batch(
                    (gt, direction, num_crop), mesh
                )
                gt, direction, num_crop, w = shard_batch(
                    (gt, direction, num_crop, w), mesh
                )
                state, metrics = train_step(state, gt, direction, num_crop, w, lr)
            else:
                (partial, gt), w = pad_batch(
                    (batch.data["partial_cloud"], batch.data["gtcloud"]), mesh
                )
                partial, gt, w = shard_batch((partial, gt, w), mesh)
                state, metrics = train_step(state, partial, gt, w, lr)
            global_step += 1
            # Defer the device->host metric fetch: float() here would block
            # on the step and serialize dispatch with compute. Metrics are
            # tiny scalars; collect them and sync once per epoch. NOTE this
            # makes mark_batch measure DISPATCH time only (the device runs
            # behind); the honest per-step wall clock is computed below
            # after the epoch-end sync.
            pending.append((global_step, lr, metrics))
            if progress and len(pending) > 1:
                step_i, lr_i, _ = pending[0]
                vals = consume([pending.pop(0)])
                sys.stderr.write(
                    f"\repoch {epoch} step {step_i} losses(x1e3) "
                    f"cdc={vals[0]:.3f} cd1={vals[1]:.3f} cd2={vals[2]:.3f} "
                    f"lr={lr_i:.2e}  "
                )
                sys.stderr.flush()
            n_epoch_batches += 1
            timer.mark_batch(global_step)
            data_time.update(timer.data_time)
            batch_time.update(timer.batch_time)
            if max_steps is not None and global_step >= max_steps:
                break

        consume(pending)
        pending.clear()
        if progress and n_epoch_batches:
            sys.stderr.write("\n")

        # consume(pending) above blocked on every step, so the epoch
        # wall clock here is the honest end-to-end figure; `dispatch=` is
        # host-side enqueue only (the device runs behind the loop).
        logging.info(
            "Epoch %d/%d t=%.1fs data=%.3fs/it dispatch=%.3fs/it "
            "step=%.3fs/it losses(x1e3)=%s",
            epoch,
            n_epochs,
            time.time() - epoch_t0,
            data_time.avg(),
            batch_time.avg(),
            (time.time() - epoch_t0) / max(n_epoch_batches, 1),
            [f"{v:.3f}" for v in losses.avg()],
        )

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # Key the val loader by the true epoch as well: its per-sample
        # transform draws (e.g. UpSamplePoints) would otherwise be seeded by
        # this process's iteration count, making the val metric — and thus
        # best-checkpoint selection — differ between a straight and a
        # resumed run (caught by test_resume_state_exactness).
        val_loader.set_epoch(epoch)
        if is_55:
            val_cd = eval_55(cfg, model, variables, val_loader, logger, epoch)
        else:
            val_cd = eval_pcn(cfg, model, variables, val_loader, logger, epoch)
        improved = ckpts.maybe_save(state, epoch, val_cd)
        logging.info(
            "Epoch %d val CD=%.4f best=%.4f%s",
            epoch,
            val_cd,
            ckpts.best_metric,
            " *" if improved else "",
        )
        if max_steps is not None and global_step >= max_steps:
            break

    logger.close()
    return state, ckpts.best_metric


def load_weights_into_state(state, cfg: Config):
    """Load ``cfg.weights`` into a TrainState: native checkpoints via
    restore_checkpoint, reference torch ``.pth``/``.pt`` via the converter
    (train/convert.py). No-op when cfg.weights is None."""
    if cfg.weights and cfg.weights.endswith((".pth", ".pt")):
        from svdformer_pointsea_tpu.train.convert import load_torch_checkpoint

        params, batch_stats = load_torch_checkpoint(cfg.weights)
        return state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, batch_stats),
        )
    if cfg.weights:
        state, _, _ = restore_checkpoint(cfg.weights, state)
    return state


def test_net(cfg: Config, mode: Optional[str] = None) -> float:
    """Standalone evaluation (core/test_pcn.py / core/test_55.py)."""
    set_seed(cfg.seed)
    is_55 = cfg.data.name == "ShapeNet55"
    from svdformer_pointsea_tpu.nn import set_mixed_precision

    # Default f32: evaluation is the parity surface. --precision bf16 on a
    # test run is an explicit opt-in to the throughput trade-off.
    set_mixed_precision(getattr(cfg.train, "precision", "f32") == "bf16")
    model = build_model(cfg)
    optimizer = make_optimizer(weight_decay=cfg.train.weight_decay)
    state = init_state(cfg, model, optimizer, seed=cfg.seed)
    state = load_weights_into_state(state, cfg)
    ds = make_dataset(cfg, "test", seed=cfg.seed)
    loader = Loader(ds, cfg.train.batch_size, shuffle=False, num_workers=cfg.data.num_workers)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if is_55:
        return eval_55(cfg, model, variables, loader, mode=mode)
    if cfg.data.name == "KITTI":
        from svdformer_pointsea_tpu.train.evaluate import eval_kitti

        out_dir = os.path.join(cfg.out_path, "benchmark") if cfg.out_path else None
        return eval_kitti(cfg, model, variables, loader, out_dir=out_dir)
    return eval_pcn(cfg, model, variables, loader)
