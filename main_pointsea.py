#!/usr/bin/env python
"""PointSea on PCN — train / test / inference.

The reference ships PointSea as a model package only
(models_PointSea/PointSea.py:250-285, no core/ trainer imports it —
SURVEY.md §1); this gives the track a first-class driver on the PCN
orchestration with the realistic voxel renderer (mv_utils_zs.py).
"""

from svdformer_pointsea_tpu.cli import main_pointsea

if __name__ == "__main__":
    main_pointsea()
