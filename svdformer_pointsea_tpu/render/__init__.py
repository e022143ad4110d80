"""Point-cloud → multi-view depth-image rasterizers."""

from svdformer_pointsea_tpu.render.pcviews import PCViews, points2depth
from svdformer_pointsea_tpu.render.realistic import PCViewsReal, points2grid

__all__ = ["PCViews", "points2depth", "PCViewsReal", "points2grid"]


def make_renderer(cfg):
    """Renderer for a track's model family: PointSea uses the realistic
    voxel+Gaussian renderer (models_PointSea/PointSea.py:280), the
    SVDFormer/GeoSpecNet families the scatter-splat PCViews
    (core/train_pcn.py:71). Both expose ``get_img`` / jitted ``_get_img``.
    """
    if cfg.network.model == "pointsea":
        return PCViewsReal(trans=-cfg.network.view_distance)
    return PCViews(
        trans=-cfg.network.view_distance,
        resolution=getattr(cfg.network, "resolution", 224),
    )
