"""Model registry + ``build_model`` factory.

Re-design of the reference builder (build.py:29-222): a name-keyed backbone
registry plus wrapper selection. The wrapper depends on the training mode:

- margin loss configured (MODEL.MARGIN not 'None'): bias-free linear head so
  the angular-penalty loss can consume the fc kernel (build.py:174-178,
  custom_model.py:122-134).
- CoMatch / triplet / EZBM (TYPE_SEMI=='CoMatch' or MODEL.IS_TRIPLET): the
  ModelwEmb projection model returning (logits, fts, fts_low)
  (build.py:196-211).
- otherwise: backbone + build_head classifier (build.py:180-194).

Checkpoint surgery (ImageNet → 2-class abnormal → N-class pathology head
swap, build.py:113-131,157-165,180-188) lives in ckpt/torch_import.py — the
builder here always constructs the *final* architecture.
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

from endoscopy_tpu.config.loader import is_none
from endoscopy_tpu.models import resnet
from endoscopy_tpu.models.heads import ClassifierHead, build_head
from endoscopy_tpu.models.modelwemb import ModelwEmb

_REGISTRY: Dict[str, Callable[..., nn.Module]] = {}


def register_backbone(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def list_models():
    return sorted(_REGISTRY)


# -- backbone registrations -------------------------------------------------

def _resnet_tiny(dtype=jnp.float32):
    """4-block, 8-filter ResNet for tests and CI — not in the reference."""
    return resnet.ResNet(stage_sizes=(1, 1, 1, 1), num_filters=8, dtype=dtype)


register_backbone("resnet_tiny")(_resnet_tiny)
register_backbone("resnet50")(resnet.resnet50)
register_backbone("resnet101")(resnet.resnet101)
register_backbone("resnet50se")(resnet.resnet50se)
register_backbone("resnet101se")(resnet.resnet101se)
register_backbone("resnet152se")(resnet.resnet152se)
register_backbone("seresnext50")(resnet.seresnext50)


def _densenet161(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.densenet import densenet161
    return densenet161(dtype=dtype)


def _densenet121(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.densenet import densenet121
    return densenet121(dtype=dtype)


def _efficientnet_b1(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.efficientnet import efficientnet_b1
    return efficientnet_b1(dtype=dtype)


def _efficientnet_b0(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.efficientnet import efficientnet_b0
    return efficientnet_b0(dtype=dtype)


register_backbone("resnet50cbam")(resnet.resnet50cbam)
register_backbone("resnet50sa")(resnet.resnet50sa)
register_backbone("resnet50sasa")(resnet.resnet50sasa)


def _swin_tiny(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.swin import swin_tiny
    return swin_tiny(dtype=dtype)


def _swin_small(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.swin import swin_small
    return swin_small(dtype=dtype)


def _swin_mlp_tiny(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.swin_mlp import swin_mlp_tiny
    return swin_mlp_tiny(dtype=dtype)


def _coatnet_0(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.coatnet import coatnet_0
    return coatnet_0(dtype=dtype)


def _vit_lsa(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.vit_lsa import vit_lsa_small
    return vit_lsa_small(dtype=dtype)


# timm-style aliases used by reference configs/code (build.py:44-67,
# custom_model.py:83)
register_backbone("swin")(_swin_tiny)
register_backbone("swin_tiny_patch4_window7_224")(_swin_tiny)
register_backbone("swin_small")(_swin_small)
register_backbone("swin_mlp")(_swin_mlp_tiny)
register_backbone("coatnet")(_coatnet_0)
register_backbone("vit_lsa")(_vit_lsa)

register_backbone("densenet161")(_densenet161)
register_backbone("densenet121")(_densenet121)
register_backbone("efficientnet_b1")(_efficientnet_b1)
register_backbone("efficientnet_b0")(_efficientnet_b0)


def _conformer(dtype=jnp.bfloat16):
    from endoscopy_tpu.models.conformer import conformer_tiny
    # dual-head model carries its own classifier; placeholder classes are
    # replaced in build_model
    return conformer_tiny(dtype=dtype)


register_backbone("conformer")(_conformer)


def create_backbone(name: str, dtype=jnp.bfloat16) -> nn.Module:
    if name not in _REGISTRY:
        raise ValueError(f"unknown model '{name}'; known: {list_models()}")
    return _REGISTRY[name](dtype=dtype)


def build_model(config, is_pathology: bool = True) -> nn.Module:
    """Build the final-architecture module for a config (build.py:29-222)."""
    name = config.MODEL.NAME
    num_classes = int(config.MODEL.NUM_CLASSES)
    dtype = jnp.bfloat16 if config.TRAIN.get("DTYPE", "bfloat16") == "bfloat16" else jnp.float32

    if name == "conformer":
        # dual-head model with its own classifier heads (build.py:92-131);
        # the N-class heads are built directly (checkpoint surgery for the
        # 1000→2→N transfer lives in ckpt/torch_import.py). Conformer-Ti
        # dims by default; MODEL.{EMBED_DIM,DEPTH,NUM_HEADS,MLP_RATIO,
        # PATCH_SIZE,CHANNEL_RATIO} override (scaled-down CI/smoke runs)
        from endoscopy_tpu.models.conformer import Conformer, conformer_tiny
        overrides = {attr: config.MODEL[key]
                     for key, attr in (("EMBED_DIM", "embed_dim"),
                                       ("DEPTH", "depth"),
                                       ("NUM_HEADS", "num_heads"),
                                       ("MLP_RATIO", "mlp_ratio"),
                                       ("PATCH_SIZE", "patch_size"),
                                       ("CHANNEL_RATIO", "channel_ratio"))
                     if not is_none(config.MODEL.get(key))}
        if overrides:
            # Conformer's dataclass defaults ARE the Ti dims, so only the
            # overridden fields need passing.
            return Conformer(num_classes=num_classes, dtype=dtype,
                             **overrides)
        return conformer_tiny(num_classes=num_classes, dtype=dtype)

    backbone = create_backbone(name, dtype=dtype)

    needs_emb = (config.MODEL.TYPE_SEMI == "CoMatch") or bool(config.MODEL.IS_TRIPLET)
    if needs_emb:
        return ModelwEmb(backbone=backbone, num_classes=num_classes,
                         low_dim=int(config.MODEL.LOW_DIM))

    if not is_none(config.MODEL.MARGIN):
        head = build_head(num_classes, is_complex=False, use_bias=False)
        return ClassifierHead(backbone=backbone, head=head)

    head = build_head(num_classes, is_complex=False)
    return ClassifierHead(backbone=backbone, head=head)
