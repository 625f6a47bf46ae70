from endoscopy_tpu.optim.optimizers import build_optimizer, weight_decay_mask
from endoscopy_tpu.optim.schedules import build_schedule

__all__ = ["build_optimizer", "weight_decay_mask", "build_schedule"]
