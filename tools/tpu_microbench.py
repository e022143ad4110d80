"""Trace-based TPU micro-benchmarking.

Wall-clock dispatch loops are unreliable on tunneled backends (async RPC
completion != device completion). This helper runs a jitted fn under
``jax.profiler`` and reports *device* time per iteration from the xplane
trace — ground truth from the hardware's own counters.

Usage:
    from tools.tpu_microbench import device_time_ms
    ms = device_time_ms(fn, args, iters=10)
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections import defaultdict

import jax


def _xla_op_ms(trace_dir: str) -> tuple[float, dict]:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    total = 0.0
    per_op: dict = defaultdict(float)
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for p in xs.planes:
            if "TPU" not in p.name:
                continue
            for line in p.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = p.event_metadata[ev.metadata_id].name
                    ms = ev.duration_ps / 1e9
                    per_op[name] += ms
                    total += ms
    return total, per_op


def device_time_ms(fn, args, iters: int = 10, top: int = 0):
    """Run jit(fn)(*args) ``iters`` times under trace; return device ms/iter.

    With ``top`` > 0, also print the top-N ops by summed device time.
    """
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="tpu_mb_")
    try:
        jax.profiler.start_trace(tmp)
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        total, per_op = _xla_op_ms(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if top:
        for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {v / iters:9.3f} ms/it  {k[:110]}")
    return total / iters
