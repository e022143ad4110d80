"""Cross-cutting support utilities: meters, logging, misc helpers."""

from svdformer_pointsea_tpu.utils.meters import AverageMeter
from svdformer_pointsea_tpu.utils.logging import SummaryLogger
from svdformer_pointsea_tpu.utils.helpers import count_parameters, set_seed
from svdformer_pointsea_tpu.utils.cache import enable_compilation_cache

__all__ = ["AverageMeter", "SummaryLogger", "count_parameters", "set_seed", "enable_compilation_cache"]
