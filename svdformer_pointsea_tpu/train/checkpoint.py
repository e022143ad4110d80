"""Orbax checkpointing with the reference's best/periodic policy.

Reference behaviour (core/train_pcn.py:152-166): after each epoch's
validation, save ``ckpt-epoch-%03d`` when ``epoch % SAVE_FREQ == 0`` and
``ckpt-best`` whenever the validation CD improves. The saved tree carries
model + optimizer state so training resumes exactly; unlike the reference
(which restarts at epoch 1 with loaded weights, SURVEY.md §5), we also
persist the epoch counter and best metric, restoring a true resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: Any, epoch: int, best_metric: float) -> None:
    """Write one checkpoint directory (orbax PyTree format)."""
    payload = {
        "state": _to_numpy(state),
        "meta": {"epoch": int(epoch), "best_metric": float(best_metric)},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)


def restore_checkpoint(path: str, state_template: Optional[Any] = None):
    """Restore ``(state, epoch, best_metric)`` from a checkpoint directory.

    With ``state_template`` the tree is restored with the template's
    structure/dtypes (safe across optax versions); without it, raw.
    """
    ckptr = ocp.PyTreeCheckpointer()
    if state_template is not None:
        template = {
            "state": _to_numpy(state_template),
            "meta": {"epoch": 0, "best_metric": 0.0},
        }
        payload = ckptr.restore(os.path.abspath(path), item=template)
    else:
        payload = ckptr.restore(os.path.abspath(path))
    meta = payload["meta"]
    return payload["state"], int(meta["epoch"]), float(meta["best_metric"])


class CheckpointManager:
    """Best/periodic policy driver (core/train_pcn.py:152-166)."""

    def __init__(self, out_dir: str, save_freq: int):
        self.dir = os.path.join(out_dir, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.save_freq = save_freq
        self.best_metric = float("inf")

    def maybe_save(self, state: Any, epoch: int, val_metric: float) -> bool:
        """Save periodic/best checkpoints; returns True if val improved."""
        improved = val_metric < self.best_metric
        if improved:
            self.best_metric = val_metric
        if epoch % self.save_freq == 0:
            save_checkpoint(
                os.path.join(self.dir, f"ckpt-epoch-{epoch:03d}"),
                state,
                epoch,
                self.best_metric,
            )
        if improved:
            save_checkpoint(
                os.path.join(self.dir, "ckpt-best"), state, epoch, self.best_metric
            )
        return improved

    def latest(self) -> Optional[str]:
        """Path of the newest checkpoint in this run dir, if any."""
        if not os.path.isdir(self.dir):
            return None
        names = sorted(n for n in os.listdir(self.dir) if n.startswith("ckpt-epoch-"))
        if names:
            return os.path.join(self.dir, names[-1])
        best = os.path.join(self.dir, "ckpt-best")
        return best if os.path.isdir(best) else None
