"""Real-size model-zoo construction tests (slow tier).

Every default-config backbone at REFERENCE dimensions — 224px, true
widths/depths — builds and runs one bf16 eval forward. Catches config/shape
bugs the tiny-config smoke tests cannot (window masks at 56→7 resolutions,
FCU strides at 14×14 token grids, DenseNet transition widths at 2208
features). Reference dims: build.py:95-102 (Conformer-Ti), se.py:257-268
(SEResNet-50), timm swin_tiny/densenet161/efficientnet defaults.

Run with: pytest -m slow tests/test_model_zoo_fullsize.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopy_tpu.models.registry import create_backbone

pytestmark = pytest.mark.slow

# (registry name, expected pooled feature width)
FULL_SIZE = [
    ("resnet50", 2048),
    ("resnet50se", 2048),
    ("seresnext50", 2048),
    ("densenet161", 2208),
    ("swin_tiny_patch4_window7_224", 768),
    ("swin_mlp", 768),
    ("efficientnet_b0", 1280),
]


@pytest.mark.parametrize("name,width", FULL_SIZE, ids=[n for n, _ in FULL_SIZE])
def test_backbone_builds_at_224(name, width):
    model = create_backbone(name, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    # real init + forward on one device (bf16 keeps the CPU cost sane)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, width)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_conformer_ti_builds_at_224():
    """Conformer-Ti: patch16/embed384/depth12/heads6 (build.py:95-102),
    dual heads."""
    from endoscopy_tpu.models.conformer import conformer_tiny

    model = conformer_tiny(num_classes=6, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    conv_cls, trans_cls = model.apply(variables, x, train=False)
    assert conv_cls.shape == (1, 6) and trans_cls.shape == (1, 6)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # Conformer-Ti is ~23.5M params; catch gross structural drift
    assert 18e6 < n_params < 30e6, n_params
