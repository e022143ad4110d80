#!/usr/bin/env python
"""KITTI cars zero-shot eval with a PCN-trained SVDFormer.

The reference ships the index (datasets/KITTI.json) and the
NormalizeObjectPose transform but no loader/driver; this completes the
track (SURVEY.md §2 #31, VERDICT round-1 Missing #3).
"""

from svdformer_pointsea_tpu.cli import main_kitti

if __name__ == "__main__":
    main_kitti()
