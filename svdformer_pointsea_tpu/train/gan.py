"""Adversarial training for the GeoSpecNet track.

Re-design of core/train_geospec.py:18-189: generator (GeoSpecNet) and
PointNet discriminator, two optimizers with the same warmup schedule. Per
batch, faithful to the reference's ordering (:110-130):

1. D step — BCE(D(gt), 1) + BCE(D(stop_grad(P2)), 0), update D.
2. G step — get_loss_PM(sqrt=True) + GAN_WEIGHT * BCE(D_new(P2), 1),
   gradients through G only (D params are the *updated* ones, as in torch
   where d_optim.step() ran first).

Both phases live in one jitted function; XLA shares the common subgraphs.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Any, Optional

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svdformer_pointsea_tpu.configs import Config
from svdformer_pointsea_tpu.data import Loader, make_dataset
from svdformer_pointsea_tpu.losses import get_loss_pm
from svdformer_pointsea_tpu.nn import PointDiscriminator
from svdformer_pointsea_tpu.parallel import (
    make_mesh_for_batch,
    pad_batch,
    replicated_sharding,
    shard_batch,
)
from svdformer_pointsea_tpu.render import PCViews
from svdformer_pointsea_tpu.train.checkpoint import CheckpointManager, restore_checkpoint
from svdformer_pointsea_tpu.train.evaluate import eval_pcn
from svdformer_pointsea_tpu.train.loop import build_model, init_state
from svdformer_pointsea_tpu.train.state import make_optimizer, reference_lr_schedule, _set_lr
from svdformer_pointsea_tpu.utils import AverageMeter, SummaryLogger, set_seed

Array = jax.Array


class GANTrainState(flax.struct.PyTreeNode):
    step: Array
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Any
    d_batch_stats: Any
    d_opt_state: Any


def _bce_logits(logits: Array, target: float, weights: Array | None = None,
                axis_name: str | None = None) -> Array:
    """BCEWithLogits against a constant target (train_geospec.py:110-130).
    ``weights`` (B,) masks pad rows out of the batch mean. ``axis_name``:
    psum the numerator and denominator over a mesh axis inside shard_map
    (global batch mean; same contract as losses.py::_batch_mean)."""
    t = jnp.full_like(logits, target)
    bce = optax.sigmoid_binary_cross_entropy(logits, t)
    per = bce.reshape(bce.shape[0], -1).mean(axis=1)
    if weights is None:
        num = jnp.sum(per)
        den = jnp.asarray(per.shape[0], per.dtype)
    else:
        num = jnp.sum(per * weights)
        den = jnp.sum(weights)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / den


def create_gan_state(cfg: Config, seed: int = 1):
    """(generator model, discriminator model, optimizers, initial state)."""
    g_model = build_model(cfg)
    d_model = PointDiscriminator()
    g_opt = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    d_opt = make_optimizer(weight_decay=cfg.train.weight_decay, betas=cfg.train.betas)
    g_state = init_state(cfg, g_model, g_opt, seed=seed)

    rng = np.random.RandomState(seed)
    fake = jnp.asarray(
        rng.rand(2, cfg.data.gt_points, 3).astype(np.float32) * 0.5
    )
    d_vars = jax.jit(functools.partial(d_model.init, train=True))(
        jax.random.PRNGKey(seed + 1), fake
    )
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_state.params,
        g_batch_stats=g_state.batch_stats,
        g_opt_state=g_state.opt_state,
        d_params=d_vars["params"],
        d_batch_stats=d_vars.get("batch_stats", {}),
        d_opt_state=d_opt.init(d_vars["params"]),
    )
    return g_model, d_model, g_opt, d_opt, state


def make_gan_train_step(g_model, d_model, g_opt, d_opt, gan_weight: float,
                        render_fn=None, mesh=None, donate: bool = True):
    """Jitted GAN step, single generator forward (the reference computes
    ``pcds_pred`` once and reuses it for both D's fake and G's loss,
    core/train_geospec.py:105-130 — we mirror that via ``jax.vjp``: one
    generator forward, one generator backward, with the loss-side gradient
    pulled back through the saved linearization).

    signature: ``(state, partial, depth, gt, g_lr, d_lr)``; with
    ``render_fn`` set, depth is rendered inside the step and the signature
    drops it: ``(state, partial, gt, g_lr, d_lr)``.

    ``mesh``: build the step with ``jax.shard_map`` over the data axis —
    same contract as train/state.py::make_train_step(mesh=...): per-device
    step bodies (Pallas kernels stay active on pods), loss psums, synced
    BatchNorm moments, psum'd G and D gradients.
    """
    axis = None
    if mesh is not None:
        from svdformer_pointsea_tpu.parallel.mesh import DATA_AXIS

        axis = DATA_AXIS

    def step_fn(state: GANTrainState, partial, depth, gt, g_lr, d_lr, weights=None):
        from svdformer_pointsea_tpu.nn.layers import bn_axis, bn_row_weights

        # ---- single generator forward (with saved linearization) -------
        def g_forward(g_params):
            with bn_axis(axis), bn_row_weights(weights):
                preds, mutated = g_model.apply(
                    {"params": g_params, "batch_stats": state.g_batch_stats},
                    partial,
                    depth,
                    train=True,
                    mutable=["batch_stats"],
                )
            return tuple(preds), mutated["batch_stats"]

        preds, g_vjp, g_bs = jax.vjp(g_forward, state.g_params, has_aux=True)
        p2_fake = jax.lax.stop_gradient(preds[-1])

        # ---- D phase: real vs stop_grad(fake) --------------------------
        def d_loss_fn(d_params):
            with bn_axis(axis), bn_row_weights(weights):
                dvar = {"params": d_params, "batch_stats": state.d_batch_stats}
                real_logits, mut_r = d_model.apply(
                    dvar, gt, train=True, mutable=["batch_stats"]
                )
                dvar = {"params": d_params, "batch_stats": mut_r["batch_stats"]}
                fake_logits, mut_f = d_model.apply(
                    dvar, p2_fake, train=True, mutable=["batch_stats"]
                )
            loss = _bce_logits(real_logits, 1.0, weights, axis) + _bce_logits(
                fake_logits, 0.0, weights, axis
            )
            return loss, mut_f["batch_stats"]

        (d_loss, d_bs), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        if axis is not None:
            d_grads = jax.lax.psum(d_grads, axis)
        d_opt_state = _set_lr(state.d_opt_state, d_lr)
        d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G phase: recon + GAN term against the updated D, gradients
        # pulled back through the single forward's vjp ------------------
        def loss_on_preds(preds_in):
            recon, parts = get_loss_pm(
                preds_in, partial, gt, sqrt=True, weights=weights, axis_name=axis
            )
            fake_logits = d_model.apply(
                {"params": d_params, "batch_stats": d_bs},
                preds_in[-1],
                train=False,
            )
            gan = _bce_logits(fake_logits, 1.0, weights, axis)
            return recon + gan_weight * gan, (parts, recon, gan)

        (g_loss, (parts, recon, gan)), dpreds = jax.value_and_grad(
            loss_on_preds, has_aux=True
        )(preds)
        (g_grads,) = g_vjp(dpreds)
        if axis is not None:
            g_grads = jax.lax.psum(g_grads, axis)
        g_opt_state = _set_lr(state.g_opt_state, g_lr)
        g_updates, g_opt_state = g_opt.update(g_grads, g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            g_batch_stats=g_bs,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_batch_stats=d_bs,
            d_opt_state=d_opt_state,
        )
        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss,
            "recon": recon,
            "gan": gan,
            "cdc": parts[0],
            "cd1": parts[1],
            "cd2": parts[2],
        }
        return new_state, metrics

    if render_fn is None:
        out = step_fn
        n_batch = 3  # partial, depth, gt
    else:

        def out(state, partial, gt, weights, g_lr, d_lr):
            depth = jax.lax.stop_gradient(render_fn(partial))
            return step_fn(state, partial, depth, gt, g_lr, d_lr, weights)

        n_batch = 3  # partial, gt, weights

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        out = jax.shard_map(
            out,
            mesh=mesh,
            in_specs=(P(), *([P(axis)] * n_batch), P(), P()),
            out_specs=(P(), P()),
        )
    return jax.jit(out, donate_argnums=(0,) if donate else ())


class AdvAuxState(flax.struct.PyTreeNode):
    """Discriminator side-state for the optional ShapeNet-55 adversarial
    branch (core/train_55.py:115-122). Not checkpointed — the reference
    saves only {model, optimizer} on this track (train_55.py:227-230)."""

    d_params: Any
    d_opt_state: Any


def create_adv55_state(cfg: Config, seed: int = 1):
    """(discriminator model, its optimizer, AdvAuxState)."""
    from svdformer_pointsea_tpu.nn import SimplePointDiscriminator

    d_model = SimplePointDiscriminator()
    d_opt = make_optimizer(weight_decay=0.0, betas=cfg.train.betas)
    rng = np.random.RandomState(seed)
    fake = jnp.asarray(rng.rand(2, cfg.data.gt_points, 3).astype(np.float32))
    d_vars = jax.jit(d_model.init)(jax.random.PRNGKey(seed + 1), fake)
    return d_model, d_opt, AdvAuxState(
        d_params=d_vars["params"], d_opt_state=d_opt.init(d_vars["params"])
    )


def make_adv55_train_step(
    model,
    d_model,
    optimizer,
    d_opt,
    *,
    sqrt_loss: bool,
    lambda_g: float,
    d_steps: int,
    render_fn=None,
    crop_n_out=None,
    mesh=None,
    donate: bool = True,
):
    """Jitted adversarial 55 step (core/train_55.py:144-180).

    signature: (state, adv, partial, depth, gt, lr, d_lr) ->
        (state, adv, metrics). Per batch: ``d_steps`` D updates on
        0.5*(BCE(D(gt),1)+BCE(D(stop_grad(P2)),0)) with the SAME fake
        cloud, then one G update on get_loss_PM + lambda_g*BCE(D_new(P2),1).

    The generator runs ONE forward per step (matching the reference, which
    reuses ``pcds_pred`` for both D's fake and G's loss) — the G gradient is
    pulled back through a saved ``jax.vjp`` linearization instead of a
    second forward inside ``grad``.

    With ``render_fn`` set, depth rendering fuses into the step:
    (state, adv, partial, gt, lr, d_lr). With ``crop_n_out`` also set, the
    online crop synthesis fuses in too:
    (state, adv, gt, direction, num_crop, lr, d_lr).
    """
    from svdformer_pointsea_tpu.train.state import TrainState

    axis = None
    if mesh is not None:
        from svdformer_pointsea_tpu.parallel.mesh import DATA_AXIS

        axis = DATA_AXIS

    def step_fn(state, adv, partial, depth, gt, lr, d_lr, weights=None):
        from svdformer_pointsea_tpu.nn.layers import bn_axis, bn_row_weights

        def g_forward(params):
            with bn_axis(axis), bn_row_weights(weights):
                preds, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    partial,
                    depth,
                    train=True,
                    mutable=["batch_stats"],
                )
            return tuple(preds), mutated["batch_stats"]

        preds, g_vjp, new_bs = jax.vjp(g_forward, state.params, has_aux=True)
        fake = jax.lax.stop_gradient(preds[-1])

        def d_loss_fn(d_params):
            real_logits = d_model.apply({"params": d_params}, gt)
            fake_logits = d_model.apply({"params": d_params}, fake)
            return 0.5 * (
                _bce_logits(real_logits, 1.0, weights, axis)
                + _bce_logits(fake_logits, 0.0, weights, axis)
            )

        def d_update(_, carry):
            d_params, d_opt_state, _ = carry
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            if axis is not None:
                d_grads = jax.lax.psum(d_grads, axis)
            d_opt_state = _set_lr(d_opt_state, d_lr)
            d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
            return optax.apply_updates(d_params, d_updates), d_opt_state, d_loss

        d_params, d_opt_state, d_loss = jax.lax.fori_loop(
            0,
            d_steps,
            d_update,
            (adv.d_params, adv.d_opt_state, jnp.zeros(())),
        )

        def loss_on_preds(preds_in):
            recon, parts = get_loss_pm(
                preds_in, partial, gt, sqrt=sqrt_loss, weights=weights,
                axis_name=axis,
            )
            g_adv = _bce_logits(
                d_model.apply({"params": d_params}, preds_in[-1]), 1.0,
                weights, axis,
            )
            return recon + lambda_g * g_adv, (parts, recon, g_adv)

        (g_loss, (parts, recon, g_adv)), dpreds = jax.value_and_grad(
            loss_on_preds, has_aux=True
        )(preds)
        (grads,) = g_vjp(dpreds)
        if axis is not None:
            grads = jax.lax.psum(grads, axis)
        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
        )
        metrics = {
            "loss": g_loss,
            "d_loss": d_loss,
            "gan": g_adv,
            "cdc": parts[0],
            "cd1": parts[1],
            "cd2": parts[2],
        }
        return new_state, AdvAuxState(d_params, d_opt_state), metrics

    if render_fn is None:
        fused = step_fn
        n_batch = 3  # partial, depth, gt
    elif crop_n_out is None:

        def fused(state, adv, partial, gt, weights, lr, d_lr):
            depth = jax.lax.stop_gradient(render_fn(partial))
            return step_fn(state, adv, partial, depth, gt, lr, d_lr, weights)

        n_batch = 3  # partial, gt, weights
    else:
        from svdformer_pointsea_tpu.data.crop import crop_random_resampled

        def fused(state, adv, gt, direction, num_crop, weights, lr, d_lr):
            partial, _ = crop_random_resampled(gt, direction, num_crop, crop_n_out)
            depth = jax.lax.stop_gradient(render_fn(partial))
            return step_fn(state, adv, partial, depth, gt, lr, d_lr, weights)

        n_batch = 4  # gt, direction, num_crop, weights

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        fused = jax.shard_map(
            fused,
            mesh=mesh,
            in_specs=(P(), P(), *([P(axis)] * n_batch), P(), P()),
            out_specs=(P(), P(), P()),
        )
    return jax.jit(fused, donate_argnums=(0, 1) if donate else ())


def train_net_gan(cfg: Config, max_epochs: Optional[int] = None, max_steps: Optional[int] = None):
    """Full GAN training run (core/train_geospec.py). Returns (state, best)."""
    set_seed(cfg.seed)
    tcfg = cfg.train
    # Trace-time switch — must precede the first trace (nn/precision.py).
    from svdformer_pointsea_tpu.nn import set_mixed_precision

    set_mixed_precision(getattr(tcfg, "precision", "f32") == "bf16")
    dp_impl = str(getattr(tcfg, "dp", "gspmd"))
    if dp_impl not in ("gspmd", "shard_map"):
        raise ValueError(f"cfg.train.dp must be gspmd|shard_map, got {dp_impl!r}")
    g_model, d_model, g_opt, d_opt, state = create_gan_state(cfg, seed=cfg.seed)

    mesh = make_mesh_for_batch(tcfg.batch_size)
    state = jax.device_put(state, replicated_sharding(mesh))
    from svdformer_pointsea_tpu.render import make_renderer

    render = make_renderer(cfg)  # honors cfg.network.resolution
    # Depth rendering fused into the jitted step — one dispatch per batch.
    step_fn = make_gan_train_step(
        g_model, d_model, g_opt, d_opt, tcfg.gan_weight, render_fn=render.render,
        mesh=mesh if dp_impl == "shard_map" else None,
    )
    lr_fn = reference_lr_schedule(
        tcfg.learning_rate, tcfg.warmup_steps, tcfg.lr_decay_step, tcfg.gamma
    )

    train_ds = make_dataset(cfg, "train", seed=cfg.seed)
    val_ds = make_dataset(cfg, "val", seed=cfg.seed)
    train_loader = Loader(
        train_ds, tcfg.batch_size, shuffle=True, seed=cfg.seed,
        num_workers=cfg.data.num_workers,
    )
    val_loader = Loader(
        val_ds, tcfg.batch_size, shuffle=False, num_workers=cfg.data.num_workers
    )

    ckpts = CheckpointManager(cfg.out_path, tcfg.save_freq)
    start_epoch = 1
    if cfg.weights:
        state, saved_epoch, best = restore_checkpoint(cfg.weights, state)
        state = jax.device_put(state, replicated_sharding(mesh))
        ckpts.best_metric = best
        start_epoch = saved_epoch + 1

    n_epochs = min(tcfg.n_epochs, max_epochs or tcfg.n_epochs)
    global_step = int(state.step)
    logger = SummaryLogger(os.path.join(cfg.out_path, "logs"))

    # Live per-batch g/d losses (the reference's tqdm postfix,
    # core/train_geospec.py batch loop) via the same one-step-lag
    # pipelined fetch as train_net — never blocks device dispatch.
    progress = bool(getattr(tcfg, "progress", False))

    # Reference-style data/batch wall-clock split, same semantics as
    # train_net (core/train_pcn.py:88-102; StepTimer.reset at epoch start
    # keeps eval/ckpt boundary time out of the data= figure).
    from svdformer_pointsea_tpu.utils.logging import StepTimer

    timer = StepTimer()

    for epoch in range(start_epoch, n_epochs + 1):
        # Resume-exact data order: shuffle + per-sample augmentation derive
        # from (seed, epoch), same contract as train_net (train/loop.py).
        train_loader.set_epoch(epoch)
        t0 = time.time()
        timer.reset()
        losses = AverageMeter(["g_loss", "d_loss"])
        data_time = AverageMeter()
        batch_time = AverageMeter()
        pending = []  # defer device->host syncs to once per epoch

        def consume(entries):
            """Fetch + meter + log a list of (step, metrics) entries."""
            vals = None
            for step_i, metrics in jax.device_get(entries):
                vals = [float(metrics["g_loss"]), float(metrics["d_loss"])]
                losses.update(vals)
                logger.add_scalar("Train/g_loss", vals[0], int(step_i))
                logger.add_scalar("Train/d_loss", vals[1], int(step_i))
            return vals

        n_epoch_batches = 0
        for batch in train_loader:
            timer.mark_data()
            (partial, gt), w = pad_batch(
                (batch.data["partial_cloud"], batch.data["gtcloud"]), mesh
            )
            partial, gt, w = shard_batch((partial, gt, w), mesh)
            lr = lr_fn(global_step + 1, epoch - 1)
            state, metrics = step_fn(state, partial, gt, w, lr, lr)
            global_step += 1
            pending.append((global_step, metrics))
            if progress and len(pending) > 1:
                step_i = pending[0][0]
                vals = consume([pending.pop(0)])
                sys.stderr.write(
                    f"\repoch {epoch} step {step_i} "
                    f"g={vals[0]:.4f} d={vals[1]:.4f}  "
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

        logging.info(
            "Epoch %d/%d t=%.1fs data=%.3fs/it dispatch=%.3fs/it "
            "step=%.3fs/it g=%.4f d=%.4f",
            epoch, n_epochs, time.time() - t0,
            data_time.avg(), batch_time.avg(),
            (time.time() - t0) / max(n_epoch_batches, 1),
            losses.avg(0), losses.avg(1),
        )
        variables = {"params": state.g_params, "batch_stats": state.g_batch_stats}
        # True-epoch val seeding — same resume-determinism contract as
        # train_net (see train/loop.py epoch tail).
        val_loader.set_epoch(epoch)
        val_cd = eval_pcn(cfg, g_model, variables, val_loader, logger, epoch)
        ckpts.maybe_save(state, epoch, val_cd)
        if max_steps is not None and global_step >= max_steps:
            break

    logger.close()
    return state, ckpts.best_metric
