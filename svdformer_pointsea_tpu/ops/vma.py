"""Varying-manual-axes (vma) helpers for ``jax.shard_map`` compatibility.

Under ``jax.shard_map(..., check_vma=True)`` — the default, and the mode the
``--dp shard_map`` trainer paths run in — every value is typed with the set
of mesh axes it *varies* over. Two situations need explicit annotations:

- ``lax.scan``/``lax.fori_loop`` carries initialized from constants: the
  carry enters unvarying but leaves varying (it mixes with sharded data), so
  the init must be promoted with ``lax.pcast(..., to="varying")``.
- ``pl.pallas_call`` outputs: the kernel runs per-device on local shards, so
  its ``out_shape`` structs must declare the axes the outputs vary over.

Both are no-ops outside shard_map (empty vma), so ops stay usable from
plain jit/GSPMD code unchanged.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax

Array = jax.Array


def input_vma(*arrays: Any) -> frozenset:
    """Union of the varying-manual-axes sets of the given tracers/arrays."""
    vma: frozenset = frozenset()
    for a in arrays:
        vma |= getattr(jax.typeof(a), "vma", None) or frozenset()
    return vma


def vary_like(x: Array, like: Array) -> Array:
    """Promote ``x`` to the varying axes of ``like`` (no-op outside
    shard_map). Use on constant-initialized scan/loop carries."""
    vma = input_vma(like)
    if not vma:
        return x
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, tuple(vma), to="varying")
    return jax.lax.pvary(x, tuple(vma))


def out_struct(shape, dtype, *like: Any) -> jax.ShapeDtypeStruct:
    """``ShapeDtypeStruct`` for a pallas_call output, varying like ``like``."""
    vma = input_vma(*like)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


@contextlib.contextmanager
def inject_vma(*like: Any):
    """Trace-time shim for third-party pallas code that builds its
    ``out_shape`` structs without a ``vma`` argument (e.g. the upstream TPU
    flash-attention ops used by nn/flash_vjp.py).

    Within the scope, ``jax.ShapeDtypeStruct(shape, dtype)`` calls that omit
    ``vma`` get the union vma of ``like`` injected. Scoped to the trace of
    one upstream call and active only when the inputs actually carry vma,
    so plain jit/GSPMD traces are untouched. Tracing is single-threaded per
    computation, and the patch is restored on exit.
    """
    vma = input_vma(*like)
    if not vma:
        yield
        return
    orig = jax.ShapeDtypeStruct

    def patched(shape, dtype, **kwargs):
        kwargs.setdefault("vma", vma)
        return orig(shape, dtype, **kwargs)

    jax.ShapeDtypeStruct = patched
    try:
        yield
    finally:
        jax.ShapeDtypeStruct = orig
