from endoscopy_tpu.aug.views import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    comatch_views,
    eval_view,
    fixmatch_views,
    labeled_train_view,
    normalize,
)
from endoscopy_tpu.aug.randaugment import randaugment_mc, randaugment_pc

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "comatch_views",
    "eval_view",
    "fixmatch_views",
    "labeled_train_view",
    "normalize",
    "randaugment_mc",
    "randaugment_pc",
]
