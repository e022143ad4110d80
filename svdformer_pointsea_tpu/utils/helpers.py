"""Misc helpers (reference: utils/helpers.py)."""

from __future__ import annotations

import random

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total trainable parameter count (utils/helpers.py:38)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key (main_pcn.py:15-21)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
