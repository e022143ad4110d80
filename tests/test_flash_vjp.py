"""CPU unit test for the lean-di flash dq backward (nn/flash_vjp.py).

The integration path is TPU-only (nn/layers.py:_flash_eligible), but the
rebuilt dq ``pallas_call`` plumbing — the only new code in flash_vjp.py —
runs under Pallas interpret mode on the CPU backend.  We feed it
analytically computed flash residuals (l, m, di per the upstream kernel's
conventions: m = rowmax of the SCALED logits, l = rowsum of exp(s − m),
di = Σ o·do) and require dq to match ``jax.grad`` of naive attention.

On-chip bitwise equality against the upstream ``flash_attention`` (same
kernels, same blocks) is asserted by tools/flash_vjp_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.nn import flash_vjp


def _naive_attention(q, k, v, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize(
    "q_seq,kv_seq,block_q,block_k_major,block_k",
    [
        (256, 256, 128, 128, 128),
        (256, 512, 256, 256, 128),
    ],
)
def test_dq_kernel_matches_autodiff(q_seq, kv_seq, block_q, block_k_major, block_k):
    rng = np.random.default_rng(0)
    b, h, dh = 2, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, q_seq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, kv_seq, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, kv_seq, dh)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, h, q_seq, dh)), jnp.float32)
    sm_scale = 1.0 / np.sqrt(dh)

    # Flash residuals exactly as the upstream forward kernel defines them.
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    m = jnp.max(s, axis=-1)
    l = jnp.sum(jnp.exp(s - m[..., None]), axis=-1)
    o = _naive_attention(q, k, v, sm_scale)
    di = jnp.sum(o * do, axis=-1)

    flash_vjp._INTERPRET = True
    try:
        dq = flash_vjp._bwd_dq_di128(
            q,
            k,
            v,
            l,
            m,
            do,
            di,
            block_q_major=block_q,
            block_k_major=block_k_major,
            block_k=block_k,
            sm_scale=sm_scale,
        )
    finally:
        flash_vjp._INTERPRET = False

    dq_ref = jax.grad(
        lambda q_: jnp.vdot(_naive_attention(q_, k, v, sm_scale), do)
    )(q)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-4, rtol=2e-4)
