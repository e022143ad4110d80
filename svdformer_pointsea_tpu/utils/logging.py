"""Training/eval scalar logging.

The reference logs per-batch and per-epoch scalars via
``tensorboardX.SummaryWriter`` (core/train_pcn.py:49-50,124-126,142-144).
We wrap it so the framework also always emits an append-only JSONL stream
(machine-readable, survives without TB tooling) and degrades gracefully when
tensorboardX is absent.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class SummaryLogger:
    """Scalar logger: JSONL always, tensorboardX when importable.

    Usage mirrors SummaryWriter: ``logger.add_scalar(tag, value, step)``.
    """

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self) -> "SummaryLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class StepTimer:
    """Wall-clock accounting for data/batch time, reference-style
    (core/train_pcn.py:88-89,102,127) plus optional ``jax.profiler`` traces.
    """

    def __init__(self, trace_dir: Optional[str] = None, trace_steps=()):
        self.trace_dir = trace_dir
        self.trace_steps = set(trace_steps)
        self._t = time.time()
        self.data_time = 0.0
        self.batch_time = 0.0
        self._tracing = False

    def mark_data(self) -> None:
        now = time.time()
        self.data_time = now - self._t
        self._t = now

    def mark_batch(self, step: int) -> None:
        now = time.time()
        self.batch_time = now - self._t + self.data_time
        self._t = now
        self._maybe_trace(step)

    def _maybe_trace(self, step: int) -> None:
        if self.trace_dir is None:
            return
        import jax

        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        if step in self.trace_steps:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
