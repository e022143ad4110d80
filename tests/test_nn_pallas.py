"""Pallas fused NN-distance kernel vs the dense oracle (interpret mode on
CPU; the same kernel was validated bit-exact on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from svdformer_pointsea_tpu.ops.nn_pallas import nn_one_way_pallas


def _oracle(a, b):
    d = jnp.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, -1)
    return jnp.min(d, 2), jnp.argmin(d, 2).astype(jnp.int32)


@pytest.mark.parametrize("n,m", [(256, 256), (300, 1000), (1024, 257)])
def test_nn_pallas_matches_oracle(rng, n, m):
    a = jnp.asarray(rng.rand(2, n, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, m, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        d_p, i_p = nn_one_way_pallas(a, b)
    d_o, _ = jax.jit(_oracle)(a, b)
    # Interpret mode on CPU fuses the FMA chain differently from both the
    # TPU kernel (bit-exact vs the oracle on hardware) and the XLA oracle;
    # allow float-eps drift and validate the argmin by distance instead.
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_o), atol=1e-6)
    chosen = np.take_along_axis(np.asarray(b), np.asarray(i_p)[..., None], axis=1)
    d_at_idx = np.sum((np.asarray(a) - chosen) ** 2, -1)
    np.testing.assert_allclose(d_at_idx, np.asarray(d_o), atol=1e-6)


def test_nn_squared_distance_grads(rng):
    """Custom VJP of the differentiable one-way distance matches autodiff
    through the dense formulation (SDG structure-analysis path)."""
    from svdformer_pointsea_tpu.ops.distances import nn_squared_distance

    a = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 48, 3).astype(np.float32))

    def loss_custom(a, b):
        return jnp.sum(nn_squared_distance(a, b) * jnp.arange(64.0))

    def loss_dense(a, b):
        d = jnp.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, -1)
        return jnp.sum(jnp.min(d, 2) * jnp.arange(64.0))

    ga1, gb1 = jax.grad(loss_custom, argnums=(0, 1))(a, b)
    ga2, gb2 = jax.grad(loss_dense, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2), atol=1e-5)
