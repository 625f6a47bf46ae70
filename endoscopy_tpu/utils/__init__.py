from endoscopy_tpu.utils.meters import AverageMeter
from endoscopy_tpu.utils.trees import count_parameters

__all__ = ["AverageMeter", "count_parameters"]
