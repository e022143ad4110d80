"""Pin ops/vma.py against upstream jax drift (VERDICT r3 #8).

``inject_vma`` monkey-patches ``jax.ShapeDtypeStruct`` during the trace of
upstream flash-attention calls (nn/flash_vjp.py) to retrofit varying-
manual-axes typing onto out_shapes the upstream code builds without a
``vma`` argument. That shim is keyed to two upstream facts that a jax
upgrade could silently change:

1. ``jax.ShapeDtypeStruct`` accepts a ``vma=`` kwarg and exposes ``.vma``.
2. The upstream module constructs its out_shapes via the *attribute
   lookup* ``jax.ShapeDtypeStruct(...)`` (a ``from jax import ...`` alias
   would bypass the patch and the shim would stop injecting WITHOUT any
   error — shard_map's checker would then reject the kernels again).

Each failure message names ops/vma.py so the trail is obvious.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas.ops.tpu import flash_attention as upstream_fa

from svdformer_pointsea_tpu.ops.vma import inject_vma, input_vma, out_struct

PIN_MSG = (
    "upstream jax changed under ops/vma.py's inject_vma shim — "
    "re-validate the vma injection for nn/flash_vjp.py"
)


def test_shape_dtype_struct_accepts_vma():
    s = jax.ShapeDtypeStruct((4, 2), jnp.float32, vma=frozenset({"data"}))
    assert getattr(s, "vma", None) == frozenset({"data"}), PIN_MSG
    # Omitting vma must stay legal (the shim's setdefault relies on it).
    s0 = jax.ShapeDtypeStruct((4, 2), jnp.float32)
    assert not getattr(s0, "vma", frozenset()), PIN_MSG


def test_upstream_flash_builds_structs_via_attribute_lookup():
    import inspect

    src = inspect.getsource(upstream_fa)
    assert "jax.ShapeDtypeStruct(" in src, PIN_MSG + (
        " (the upstream flash-attention module no longer calls "
        "jax.ShapeDtypeStruct by attribute — the monkey-patch cannot "
        "intercept its out_shape construction)"
    )


def test_inject_vma_patches_during_shard_map_trace():
    """End-to-end trace check: inside shard_map, structs built under
    inject_vma(like) carry the like-inputs' vma; outside the scope and
    outside shard_map the constructor is untouched."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 faked devices (tests/conftest.py)")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    seen = {}

    def body(x):
        assert input_vma(x) == frozenset({"data"}), PIN_MSG
        with inject_vma(x):
            seen["in_scope"] = getattr(
                jax.ShapeDtypeStruct((1,), jnp.float32), "vma", frozenset()
            )
        seen["after_scope"] = getattr(
            jax.ShapeDtypeStruct((1,), jnp.float32), "vma", frozenset()
        )
        # out_struct is the first-party path — same contract.
        seen["out_struct"] = out_struct((1,), jnp.float32, x).vma
        return x * 2.0

    x = jnp.arange(4, dtype=jnp.float32)
    y = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("data"),
            out_specs=jax.sharding.PartitionSpec("data"),
        )
    )(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0)
    assert seen["in_scope"] == frozenset({"data"}), PIN_MSG
    assert not seen["after_scope"], PIN_MSG + " (patch leaked past the scope)"
    assert seen["out_struct"] == frozenset({"data"}), PIN_MSG
