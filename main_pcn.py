#!/usr/bin/env python
"""SVDFormer on PCN — train / test / inference (reference: main_pcn.py)."""

from svdformer_pointsea_tpu.cli import main_pcn

if __name__ == "__main__":
    main_pcn()
