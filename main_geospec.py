#!/usr/bin/env python
"""GeoSpecNet + GAN on PCN — train / test (reference: main_geospec.py)."""

from svdformer_pointsea_tpu.cli import main_geospec

if __name__ == "__main__":
    main_geospec()
