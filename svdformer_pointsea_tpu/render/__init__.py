"""Point-cloud → multi-view depth-image rasterizers."""

from svdformer_pointsea_tpu.render.pcviews import PCViews, points2depth
from svdformer_pointsea_tpu.render.realistic import PCViewsReal, points2grid

__all__ = ["PCViews", "points2depth", "PCViewsReal", "points2grid"]
