"""FULL-dimension torch-import forward parity (slow tier).

The toy-dim parity tests (test_torch_parity.py) prove the leaf conventions;
these prove the key maps at the REFERENCE's real shapes, where stage-indexed
rename bugs beyond stage 2 would hide: SE-ResNet-50 [3,4,6,3] @224
(se.py:257-263), Swin-T (2,2,6,2) w7 @224 (timm swin_tiny contract),
Conformer-Ti patch16/embed384/depth12 (build.py:95-102), and a
densenet161-shaped state_dict (growth 48, blocks (6,12,36,24), init 96).

Shares the oracle/shim/compare machinery with test_torch_parity.py.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast suite with -m 'not slow'

torch = pytest.importorskip("torch")

from tests.test_torch_parity import (  # noqa: E402
    HAVE_REF,
    _TorchDenseNet,
    _import_and_compare,
    _randomize,
    _ref_module,
)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_resnet50se_fullsize_import_parity(rng):
    """SE-ResNet-50 at the reference's exact dims: Bottleneck [3,4,6,3]
    @224 (se.py:257-263). Exercises stage-3/4 block renames (blocks 0-5)."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.resnet import ResNet

    se = _ref_module("se")
    tmodel = se.SEResNet(se.Bottleneck, [3, 4, 6, 3], num_classes=10)
    tmodel.fc = torch.nn.Identity()
    _randomize(tmodel)

    fmodel = ResNet(stage_sizes=(3, 4, 6, 3), use_se=True, dtype=jnp.float32)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "resnet", x,
                        lambda m, t: m(t), atol=5e-4, rtol=5e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_swin_tiny_fullsize_import_parity(rng):
    """Swin-T at timm swin_tiny dims: embed 96, depths (2,2,6,2), heads
    (3,6,12,24), w7 @224 (build.py:44-47 via timm). Exercises the 6-block
    stage-2 renames and real shifted-window attention masks."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.swin import SwinTransformer

    ref = _ref_module("swin_transformer")
    tmodel = ref.SwinTransformer(
        img_size=224, patch_size=4, in_chans=3, num_classes=0, embed_dim=96,
        depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], window_size=7,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        ape=False, patch_norm=True)
    _randomize(tmodel)

    fmodel = SwinTransformer(img_size=224, patch_size=4, embed_dim=96,
                             depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                             window_size=7, mlp_ratio=4.0, dtype=jnp.float32)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "swin", x,
                        lambda m, t: m.forward_features(t),
                        atol=1e-3, rtol=1e-2)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_conformer_ti_fullsize_import_parity(rng):
    """Conformer-Ti at the reference's exact dims: patch16, embed 384,
    depth 12, heads 6, mlp_ratio 4, channel_ratio 1 (build.py:95-102).
    Exercises all 12 trans-block + FCU renames; both grafted heads
    compared."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.conformer import Conformer

    ref = _ref_module("conformer")
    tmodel = ref.Conformer(patch_size=16, num_classes=6, channel_ratio=1,
                           embed_dim=384, depth=12, num_heads=6,
                           mlp_ratio=4.0, qkv_bias=True)
    _randomize(tmodel)

    fmodel = Conformer(num_classes=6, patch_size=16, channel_ratio=1,
                       embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0,
                       qkv_bias=True, dtype=jnp.float32)
    x = rng.standard_normal((1, 112, 112, 3)).astype(np.float32)
    _import_and_compare(
        fmodel, tmodel, "conformer", x, lambda m, t: m(t),
        head_keys=[(("conv_cls_head",), "conv_cls_head"),
                   (("trans_cls_head",), "trans_cls_head")],
        atol=1e-3, rtol=1e-2)


def test_densenet161_shaped_import_parity(rng):
    """densenet161-shaped state_dict: growth 48, blocks (6,12,36,24), init
    features 96 (timm densenet161, build.py:180-194). Exercises denseblock3's
    36 denselayer renames. Spatial size is irrelevant to the key map; 64px
    keeps the 1-core forward tractable."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.densenet import DenseNet

    tmodel = _TorchDenseNet(growth=48, blocks=(6, 12, 36, 24),
                            init_features=96)
    _randomize(tmodel)
    fmodel = DenseNet(growth_rate=48, block_config=(6, 12, 36, 24),
                      num_init_features=96, dtype=jnp.float32)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "densenet", x,
                        lambda m, t: m(t), atol=1e-3, rtol=1e-2)
