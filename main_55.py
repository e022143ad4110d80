#!/usr/bin/env python
"""SVDFormer on ShapeNet-55/34/Unseen21 — train / test (reference: main_55.py)."""

from svdformer_pointsea_tpu.cli import main_55

if __name__ == "__main__":
    main_55()
