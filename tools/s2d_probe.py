"""Packed (space-to-depth) vs unpacked ImageTrunk fwd+bwd on the real chip.

The standalone 4x-2x2-conv probe predicted 61 -> 13.4 ms for the
full-resolution stage; this times the REAL ImageTrunk both ways (train
mode, B=36 x 224^2 x 1 — the PCN B12 geometry) with the chained recipe.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/s2d_probe.py
"""

from __future__ import annotations

import numpy as np

from svdformer_pointsea_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from svdformer_pointsea_tpu.nn.resnet import ImageTrunk, set_trunk_s2d
from tools.bwd_breakdown import bench


def main() -> None:
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(36, 224, 224, 1).astype(np.float32))
    for s2d in (False, True):
        set_trunk_s2d(s2d)
        bench(ImageTrunk(feat_size=16), (img,), f"ImageTrunk s2d={s2d}")


if __name__ == "__main__":
    main()
