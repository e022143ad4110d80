"""Trace-based TPU micro-benchmarking.

Wall-clock dispatch loops are unreliable on tunneled backends (async RPC
completion != device completion). This helper runs a jitted fn under
``jax.profiler`` and reports *device* time per iteration from the xplane
trace — ground truth from the hardware's own counters.

Usage:
    from tools.tpu_microbench import device_time_ms
    ms = device_time_ms(fn, args, iters=10)

CAVEATS:
- (2026-08-18) ``fn`` must return ALL live outputs. Returning a subset
  (e.g. just the metrics of a train step) lets XLA dead-code-eliminate the
  rest — round 1's "82 ms device time for the train step" was a
  forward-only executable measured this way; the full step is ~213 ms at
  B12 and xplane agrees with chained wall clock once nothing is DCE'd.
- (2026-08-17) ``jax.profiler.trace`` HUNG indefinitely over the axon
  tunnel for most of rounds 1-2 (recovered 2026-08-18 — environment, not
  code). If this tool stalls, fall back to ``chained_time_ms`` below,
  which needs no profiler.
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
    ``fn`` must return every output that should stay live — see the module
    docstring's DCE caveat.
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


def chained_time_ms(fn, args, iters: int = 20) -> float:
    """Profiler-free device timing: run ``fn`` inside a ``lax.fori_loop``
    whose body feeds a negligible (1e-30-scaled) probe of the output back
    into the first argument, so iterations execute serially on device, and
    difference the wall time of 1 vs 1+iters trips. The probe uses
    ``jnp.sum`` of the first output leaf so XLA cannot dead-code-eliminate
    any branch of ``fn``.

    ``args[0]`` must be a float array.
    """
    import jax.numpy as jnp
    from jax import lax

    def loop(k, a):
        def body(_, a):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            return (a[0] + probe,) + tuple(a[1:])

        return lax.fori_loop(0, k, body, tuple(a))[0].ravel()[0]

    import functools
    import time

    l1 = jax.jit(functools.partial(loop, 1))
    lk = jax.jit(functools.partial(loop, 1 + iters))
    float(l1(args)); float(lk(args))  # compile both
    t0 = time.time(); float(l1(args)); t1 = time.time()
    float(lk(args)); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / iters * 1000
