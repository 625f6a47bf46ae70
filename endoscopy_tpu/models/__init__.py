from endoscopy_tpu.models.registry import build_model, create_backbone, list_models
from endoscopy_tpu.models.heads import build_head, ClassifierHead, MLPHead
from endoscopy_tpu.models.modelwemb import ModelwEmb, l2_normalize

__all__ = [
    "build_model",
    "create_backbone",
    "list_models",
    "build_head",
    "ClassifierHead",
    "MLPHead",
    "ModelwEmb",
    "l2_normalize",
]
