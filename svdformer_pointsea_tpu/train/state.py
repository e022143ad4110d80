"""Train state, optimizer, LR schedule, and the jitted train/eval steps.

The LR schedule reproduces the reference's composite
GradualWarmupScheduler semantics (utils/schedular.py + core/train_pcn.py):
linear warmup to the base LR over the first ``warmup_steps`` *optimizer
steps* (stepped per batch), then per-epoch MultiStep/Step decay. We compute
the scalar on host per step and feed it to an ``inject_hyperparams`` Adam —
bit-exact control without retracing.

The train step is a single jitted function over the data mesh: batch-sharded
inputs, replicated params; XLA inserts the gradient all-reduce over ICI from
the shardings (no explicit collectives — SURVEY.md §2.3's TPU-native DP).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from svdformer_pointsea_tpu.losses import get_loss, get_loss_pm

Array = jax.Array


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def reference_lr_schedule(
    base_lr: float,
    warmup_steps: int,
    lr_decay_step,
    gamma: float,
) -> Callable[[int, int], float]:
    """lr(optimizer_step, completed_epochs) — reference semantics.

    - Warmup: lr = base * min(step, warmup)/warmup for the first
      ``warmup_steps`` batches (core/train_pcn.py:132-134).
    - Decay (after warmup): MultiStepLR when ``lr_decay_step`` is a list of
      epoch milestones (PCN), StepLR(step_size) when an int (ShapeNet-55),
      stepped once per epoch (core/train_pcn.py:140).
    """

    def lr(step: int, epoch: int) -> float:
        warm = min(step, warmup_steps) / warmup_steps if warmup_steps > 0 else 1.0
        if isinstance(lr_decay_step, int):
            decay = gamma ** (epoch // lr_decay_step)
        else:
            decay = gamma ** sum(1 for m in lr_decay_step if m <= epoch)
        return base_lr * warm * decay

    return lr


def make_optimizer(
    weight_decay: float = 0.0, betas=(0.9, 0.999), flatten: bool = False
) -> optax.GradientTransformation:
    """Adam (PCN) / AdamW (ShapeNet-55, wd=5e-4) with injectable LR.

    ``flatten=True`` wraps the transform in ``optax.flatten`` (same Adam
    math over one concatenated vector; params/updates stay structured,
    only the optimizer STATE flattens). MEASURED NEGATIVE on chip
    (tools/adam_flatten_probe.py, 404-leaf 58.1M-param SVDFormer):
    standalone update 19.4 -> 24.9 ms, full B12 train step 205.1 ->
    219.8 ms — the ravel/unravel concat copies cost more than the
    per-leaf launch overhead they remove. Kept only so the probe stays
    reproducible; do not enable expecting a win. opt_state tree shapes
    differ between settings (checkpoints are not interchangeable).
    """
    if weight_decay > 0:
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=betas[0], b2=betas[1], weight_decay=weight_decay
        )
    else:
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=0.0, b1=betas[0], b2=betas[1]
        )
    return optax.flatten(opt) if flatten else opt


def create_train_state(
    model,
    rng: Array,
    sample_inputs: Sequence[Array],
    optimizer: optax.GradientTransformation,
) -> TrainState:
    # One compiled init: eager flax init dispatches hundreds of tiny ops,
    # which is pathological on tunneled/remote-compile backends.
    variables = jax.jit(functools.partial(model.init, train=True))(
        rng, *sample_inputs
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    sqrt_loss: bool = True,
    partial_matching: bool = False,
    donate: bool = True,
    render_fn: Optional[Callable[[Array], Array]] = None,
    crop_n_out: Optional[int] = None,
    mesh=None,
):
    """Build the jitted DP train step.

    Three fusion levels, one dispatch per batch each:

    - ``render_fn=None`` (depth precomputed on host — tests/back-compat):
      ``(state, partial, depth, gt, lr) -> (state, metrics)``
    - ``render_fn`` set (PCN track): depth rendering fused into the step,
      ``(state, partial, gt, weights, lr) -> (state, metrics)``
    - ``render_fn`` + ``crop_n_out`` set (ShapeNet-55 track): online crop
      synthesis (data/crop.py) AND rendering fused,
      ``(state, gt, direction, num_crop, weights, lr) -> (state, metrics)``

    ``weights`` is the (B,) loss mask from ``parallel.pad_batch`` — pad
    rows (weight 0) keep every chip busy without perturbing the loss.
    metrics = {'loss', 'cdc', 'cd1', 'cd2'} (scalars).

    ``mesh``: when given, the step is built with ``jax.shard_map`` over the
    mesh's ``data`` axis instead of relying on GSPMD to partition the jitted
    graph. Each device runs the WHOLE step body on its local batch shard —
    which is what keeps the Pallas fast paths (VMEM FPS, fused NN-distance,
    flash attention) active per-chip on a real multi-chip pod, where GSPMD
    would have to all-gather around every (unpartitionable) ``pallas_call``.
    Numerics match the GSPMD path: batch reductions in the loss psum over
    the axis (losses.py ``axis_name``) and BatchNorm moments pmean over it
    (nn/layers.py ``bn_axis``); gradients are the per-device contributions
    psum'd — the flax sync-BN + pmean(grads) pattern, exact because shards
    are equal-size (``pad_batch``). Validated against the GSPMD step on an
    8-device CPU mesh (tests/test_shard_map.py).
    """
    axis = None
    if mesh is not None:
        from svdformer_pointsea_tpu.parallel.mesh import DATA_AXIS

        axis = DATA_AXIS

    def update(state: TrainState, partial, depth, gt, lr, weights=None):
        def loss_fn(params):
            from svdformer_pointsea_tpu.nn.layers import bn_axis, bn_row_weights

            # bn_row_weights: pad rows (weight 0) are excluded from the BN
            # batch moments, not just the loss — a padded step updates
            # running stats exactly like the unpadded batch would
            # (VERDICT r2 next #8; tests/test_train_sharding.py).
            with bn_axis(axis), bn_row_weights(weights):
                outs, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    partial,
                    depth,
                    train=True,
                    mutable=["batch_stats"],
                )
            if partial_matching:
                loss, parts = get_loss_pm(
                    outs, partial, gt, sqrt=sqrt_loss, weights=weights,
                    axis_name=axis,
                )
            else:
                loss, parts = get_loss(
                    outs, gt, sqrt=sqrt_loss, weights=weights, axis_name=axis
                )
            return loss, (parts, mutated["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if axis is not None:
            # Per-device grads are the local-shard contributions to the
            # globally-normalized loss; their psum is the exact global
            # gradient (den is global already via the loss's axis_name).
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
            "loss": loss,
            "cdc": parts[0],
            "cd1": parts[1],
            "cd2": parts[2],
        }
        return new_state, metrics

    if render_fn is None:
        step_fn = update
        n_batch_args = 3  # partial, depth, gt
    elif crop_n_out is None:

        def step_fn(state, partial, gt, weights, lr):
            depth = jax.lax.stop_gradient(render_fn(partial))
            return update(state, partial, depth, gt, lr, weights)

        n_batch_args = 3  # partial, gt, weights
    else:
        from svdformer_pointsea_tpu.data.crop import crop_random_resampled

        def step_fn(state, gt, direction, num_crop, weights, lr):
            partial, _ = crop_random_resampled(gt, direction, num_crop, crop_n_out)
            depth = jax.lax.stop_gradient(render_fn(partial))
            return update(state, partial, depth, gt, lr, weights)

        n_batch_args = 4  # gt, direction, num_crop, weights

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        in_specs = (P(), *([P(axis)] * n_batch_args), P())  # state, batch..., lr
        step_fn = jax.shard_map(
            step_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _set_lr(opt_state, lr):
    """Set the injected learning_rate hyperparameter."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def make_eval_step(model):
    """Jitted forward pass in eval mode: (variables, partial, depth) -> preds."""

    @jax.jit
    def eval_step(variables, partial, depth):
        return model.apply(variables, partial, depth, train=False)

    return eval_step
