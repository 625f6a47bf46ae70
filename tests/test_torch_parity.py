"""Forward numerical-parity tests: torch reference models vs flax models.

The strongest import check: build the torch model, randomize its weights AND
BN running statistics, import the state_dict through ckpt/torch_import.py,
and compare eval-mode forward outputs on a fixed batch in float32.

Torch oracles come from the reference repo's own model files (imported at
test runtime, never copied): se.py (SEResNet), conformer.py,
swin_transformer.py (the MSR copy timm 0.5.4 wraps). The reference uses timm
for DenseNet; since timm isn't installed here, a minimal torch DenseNet with
torchvision key naming is defined inline as the oracle.

The reference modules import `timm.models.layers`; a tiny shim provides
DropPath (identity at drop_prob=0), to_2tuple, trunc_normal_.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast suite with -m 'not slow'

torch = pytest.importorskip("torch")

REF = "/root/reference/code"
HAVE_REF = os.path.isdir(os.path.join(REF, "models"))


def _install_timm_shim():
    if "timm" in sys.modules and hasattr(sys.modules["timm"], "__shim__"):
        return
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    timm.__shim__ = True
    models_mod = types.ModuleType("timm.models")
    layers_mod = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # drop_prob=0 / eval: identity
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    layers_mod.DropPath = DropPath
    layers_mod.to_2tuple = to_2tuple
    layers_mod.trunc_normal_ = trunc_normal_
    models_mod.layers = layers_mod
    timm.models = models_mod
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models_mod
    sys.modules["timm.models.layers"] = layers_mod


def _ref_module(name):
    _install_timm_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module(f"models.{name}")


def _randomize(model, seed=0):
    """Randomize params and BN running stats so the import is load-bearing."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))
    model.eval()
    return model


def _np_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _import_and_compare(flax_model, torch_model, arch, x_np, torch_out_fn,
                        flax_out_fn=None, head_keys=(), atol=1e-4, rtol=1e-3):
    """Shared harness: init flax, import torch weights, compare outputs."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.ckpt.torch_import import import_torch_state
    from endoscopy_tpu.ckpt.transfer import graft_tree

    variables = flax_model.init(jax.random.key(0),
                                jnp.asarray(x_np), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd = _np_state_dict(torch_model)
    params, batch_stats, report = import_torch_state(
        params, batch_stats, sd, arch, backbone_scope=None, strict=True)
    assert report.imported > 0
    assert not report.shape_mismatch, report.shape_mismatch

    # classifier heads are intentionally skipped by the importer (the
    # build.py surgery re-initializes them); graft them here so full logits
    # compare.
    for flax_path, tkey in head_keys:
        w = sd[tkey + ".weight"]
        donor = {"kernel": np.ascontiguousarray(w.T),
                 "bias": sd[tkey + ".bias"]}
        node = params
        for p in flax_path[:-1]:
            node = node[p]
        node[flax_path[-1]], n, _ = graft_tree(node[flax_path[-1]], donor)
        assert n == 2

    with torch.no_grad():
        ref = torch_out_fn(torch_model,
                           torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    out = flax_model.apply({"params": params, "batch_stats": batch_stats},
                           jnp.asarray(x_np), train=False)
    if flax_out_fn is not None:
        out = flax_out_fn(out)
    ref = [r.numpy() for r in (ref if isinstance(ref, (tuple, list)) else [ref])]
    out = [np.asarray(o) for o in (out if isinstance(out, tuple) else [out])]
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o, r, atol=atol, rtol=rtol)
    return report


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_seresnet_forward_parity(rng):
    """SE-ResNet trunk: flax ResNet(use_se) vs reference se.py at 224px
    (se.py:8-118). Oracle fc removed; pooled features compared."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.resnet import ResNet

    se = _ref_module("se")
    tmodel = se.SEResNet(se.Bottleneck, [1, 1, 1, 1], num_classes=10)
    tmodel.fc = torch.nn.Identity()  # compare pooled features
    _randomize(tmodel)

    fmodel = ResNet(stage_sizes=(1, 1, 1, 1), use_se=True, dtype=jnp.float32)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "resnet", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_conformer_forward_parity(rng):
    """Dual-head Conformer vs reference conformer.py (models/conformer.py:
    306-445), both heads grafted, logits compared."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.conformer import Conformer

    ref = _ref_module("conformer")
    tmodel = ref.Conformer(patch_size=16, num_classes=5, channel_ratio=1,
                           embed_dim=48, depth=3, num_heads=2, mlp_ratio=2.0,
                           qkv_bias=True)
    _randomize(tmodel)

    fmodel = Conformer(num_classes=5, patch_size=16, channel_ratio=1,
                       embed_dim=48, depth=3, num_heads=2, mlp_ratio=2.0,
                       qkv_bias=True, dtype=jnp.float32)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    _import_and_compare(
        fmodel, tmodel, "conformer", x, lambda m, t: m(t),
        head_keys=[(("conv_cls_head",), "conv_cls_head"),
                   (("trans_cls_head",), "trans_cls_head")],
        atol=5e-4, rtol=5e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_swin_forward_parity(rng):
    """Swin trunk vs the reference's MSR copy (swin_transformer.py:459-590),
    pooled features compared (head disabled via num_classes=0)."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.swin import SwinTransformer

    ref = _ref_module("swin_transformer")
    tmodel = ref.SwinTransformer(
        img_size=56, patch_size=4, in_chans=3, num_classes=0, embed_dim=24,
        depths=[2, 2], num_heads=[2, 4], window_size=7, mlp_ratio=2.0,
        qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0, ape=False,
        patch_norm=True)
    _randomize(tmodel)

    fmodel = SwinTransformer(img_size=56, patch_size=4, embed_dim=24,
                             depths=(2, 2), num_heads=(2, 4), window_size=7,
                             mlp_ratio=2.0, dtype=jnp.float32)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    # the reference swaps MSR's head for fc1/fc2/bn (swin_transformer.py:
    # 541-543) which break at num_classes=0; compare trunk features
    _import_and_compare(fmodel, tmodel, "swin", x,
                        lambda m, t: m.forward_features(t),
                        atol=5e-4, rtol=5e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_swin_mlp_forward_parity(rng):
    """SwinMLP trunk vs the reference's MSR copy (swin_mlp.py:348-471):
    the grouped-Conv1d spatial MLP imports as a per-head reshape; pooled
    features compared. Stage 0 (14x14, ws 7) exercises the shifted
    zero-pad block; stage 1 (7x7) the no-partition fallback."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.swin_mlp import SwinMLP as FlaxSwinMLP

    ref = _ref_module("swin_mlp")
    tmodel = ref.SwinMLP(
        img_size=56, patch_size=4, in_chans=3, num_classes=5, embed_dim=24,
        depths=[2, 2], num_heads=[2, 4], window_size=7, mlp_ratio=2.0,
        drop_rate=0.0, drop_path_rate=0.0, ape=False, patch_norm=True)
    _randomize(tmodel)

    fmodel = FlaxSwinMLP(patch_size=4, embed_dim=24, depths=(2, 2),
                         num_heads=(2, 4), window_size=7, mlp_ratio=2.0,
                         dtype=jnp.float32)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    # reference swaps the head for fc1/fc2 (swin_mlp.py:424-425), which the
    # importer skips; compare trunk features
    _import_and_compare(fmodel, tmodel, "swin_mlp", x,
                        lambda m, t: m.forward_features(t),
                        atol=5e-4, rtol=5e-3)


class _TorchDenseLayer(torch.nn.Module):
    """Minimal torch DenseNet oracle with torchvision state_dict naming
    (the reference's timm densenet161, build.py:180-194; timm reuses
    torchvision weights/keys)."""

    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = torch.nn.BatchNorm2d(in_ch)
        self.conv1 = torch.nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = torch.nn.BatchNorm2d(bn_size * growth)
        self.conv2 = torch.nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                     bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class _TorchDenseNet(torch.nn.Module):
    def __init__(self, growth=8, blocks=(2, 2), init_features=16):
        super().__init__()
        f = torch.nn.Sequential()
        f.add_module("conv0", torch.nn.Conv2d(3, init_features, 7, stride=2,
                                              padding=3, bias=False))
        f.add_module("norm0", torch.nn.BatchNorm2d(init_features))
        ch = init_features
        for i, n in enumerate(blocks):
            block = torch.nn.Sequential()
            for j in range(n):
                block.add_module(f"denselayer{j + 1}",
                                 _TorchDenseLayer(ch + j * growth, growth))
            f.add_module(f"denseblock{i + 1}", block)
            ch += n * growth
            if i != len(blocks) - 1:
                tr = torch.nn.Sequential()
                tr.add_module("norm", torch.nn.BatchNorm2d(ch))
                tr.add_module("conv", torch.nn.Conv2d(ch, ch // 2, 1,
                                                      bias=False))
                f.add_module(f"transition{i + 1}", tr)
                ch //= 2
        f.add_module("norm5", torch.nn.BatchNorm2d(ch))
        self.features = f

    def forward(self, x):
        x = self.features.norm0(self.features.conv0(x))
        x = torch.nn.functional.max_pool2d(torch.relu(x), 3, 2, 1)
        for name, mod in list(self.features.named_children())[2:]:
            if name.startswith("denseblock"):
                for layer in mod.children():
                    x = layer(x)
            elif name.startswith("transition"):
                x = torch.nn.functional.avg_pool2d(
                    mod.conv(torch.relu(mod.norm(x))), 2, 2)
            elif name == "norm5":
                x = torch.relu(mod(x))
        return x.mean(dim=(2, 3))


def test_densenet_forward_parity(rng):
    """DenseNet trunk vs a torchvision-keyed torch oracle."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.densenet import DenseNet

    tmodel = _TorchDenseNet(growth=8, blocks=(2, 2), init_features=16)
    _randomize(tmodel)
    fmodel = DenseNet(growth_rate=8, block_config=(2, 2),
                      num_init_features=16, dtype=jnp.float32)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "densenet", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


class _TorchSqueezeExcite(torch.nn.Module):
    """timm SqueezeExcite: reduce from the BLOCK INPUT channel budget."""

    def __init__(self, mid, se_ch):
        super().__init__()
        self.conv_reduce = torch.nn.Conv2d(mid, se_ch, 1)
        self.conv_expand = torch.nn.Conv2d(se_ch, mid, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _TorchDSConv(torch.nn.Module):
    """timm DepthwiseSeparableConv (stage 1): conv_pw is the projection."""

    def __init__(self, ch, out, kernel, stride):
        super().__init__()
        pad = kernel // 2
        self.conv_dw = torch.nn.Conv2d(ch, ch, kernel, stride, pad,
                                       groups=ch, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(ch, eps=1e-3)
        self.se = _TorchSqueezeExcite(ch, max(1, int(ch * 0.25)))
        self.conv_pw = torch.nn.Conv2d(ch, out, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(out, eps=1e-3)
        self.has_residual = stride == 1 and ch == out

    def forward(self, x):
        y = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return y + x if self.has_residual else y


class _TorchInvRes(torch.nn.Module):
    """timm InvertedResidual: conv_pw expand / conv_pwl project."""

    def __init__(self, in_ch, out, expand, kernel, stride):
        super().__init__()
        mid = in_ch * expand
        pad = kernel // 2
        self.conv_pw = torch.nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = torch.nn.Conv2d(mid, mid, kernel, stride, pad,
                                       groups=mid, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(mid, eps=1e-3)
        self.se = _TorchSqueezeExcite(mid, max(1, int(in_ch * 0.25)))
        self.conv_pwl = torch.nn.Conv2d(mid, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out, eps=1e-3)
        self.has_residual = stride == 1 and in_ch == out

    def forward(self, x):
        y = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
        y = torch.nn.functional.silu(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_residual else y


class _TorchEffNet(torch.nn.Module):
    """Minimal torch EfficientNet with timm 0.5.4 key naming."""

    def __init__(self, stages, stem=8, head=32):
        super().__init__()
        self.conv_stem = torch.nn.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(stem, eps=1e-3)
        blocks = []
        ch = stem
        for si, (expand, out, repeats, stride, kernel) in enumerate(stages):
            stage = []
            for ri in range(repeats):
                s = stride if ri == 0 else 1
                if expand == 1:
                    stage.append(_TorchDSConv(ch, out, kernel, s))
                else:
                    stage.append(_TorchInvRes(ch, out, expand, kernel, s))
                ch = out
            blocks.append(torch.nn.Sequential(*stage))
        self.blocks = torch.nn.Sequential(*blocks)
        self.conv_head = torch.nn.Conv2d(ch, head, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(head, eps=1e-3)

    def forward(self, x):
        x = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = torch.nn.functional.silu(self.bn2(self.conv_head(x)))
        return x.mean(dim=(2, 3))


def test_efficientnet_forward_parity(rng):
    """EfficientNet trunk vs a timm-keyed torch oracle (the reference's
    efficientnet_b1 abnormal backbone, build.py:172-220 timm fallback)."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.efficientnet import EfficientNet

    stages = ((1, 8, 1, 1, 3), (6, 16, 2, 2, 3), (6, 24, 2, 2, 5))
    tmodel = _TorchEffNet(stages, stem=8, head=32)
    _randomize(tmodel)
    fmodel = EfficientNet(stages=stages, stem_channels=8, head_channels=32,
                          dtype=jnp.float32)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "efficientnet", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


# -- attention zoo (VERDICT r3 item 3): CBAM, shuffle-attention, SASA,
# ViT-LSA, CoAtNet via the importer; Halo via a hand-mapped module oracle.


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_cbam_resnet_forward_parity(rng):
    """ResNet+CBAM trunk vs reference cbam.py ResNetCBAM (cbam.py:27-100
    gates, 192-297 network); pooled features compared (fc removed)."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.resnet import ResNet

    cbam = _ref_module("cbam")
    tmodel = cbam.ResNetCBAM(cbam.Bottleneck, [1, 1, 1, 1], "ImageNet",
                             num_classes=10, att_type="CBAM")
    tmodel.fc = torch.nn.Identity()
    _randomize(tmodel)

    fmodel = ResNet(stage_sizes=(1, 1, 1, 1), attn="cbam", dtype=jnp.float32)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "resnet", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_sa_resnet_forward_parity(rng):
    """ResNet+shuffle-attention trunk vs reference sa.py ResNetSA
    (sa_layer sa.py:14-67 incl. the per-channel GroupNorm and 2-group
    channel shuffle); pooled features compared."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.resnet import ResNet

    sa = _ref_module("sa")
    tmodel = sa.ResNetSA(sa.SABottleneck, [1, 1, 1, 1], num_classes=10)
    tmodel.fc = torch.nn.Identity()
    _randomize(tmodel)

    fmodel = ResNet(stage_sizes=(1, 1, 1, 1), attn="sa", dtype=jnp.float32)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "resnet", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_sasa_resnet_forward_parity(rng):
    """ResNet+SASA trunk vs reference sasa.py ResNetSASA with attention in
    the last two stages (sasa.py:22-84 layer incl. the depth-interleaving
    head reshape and the q-sum x enc-sum positional quirk; 178-200 stride on
    conv1); pooled features compared."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.resnet import ResNet

    sasa = _ref_module("sasa")
    tmodel = sasa.ResNetSASA(sasa.Bottleneck, [1, 1, 1, 1], num_classes=10,
                             attention=[False, False, True, True],
                             num_heads=8, kernel_size=7, image_size=224)
    tmodel.fc = torch.nn.Identity()
    _randomize(tmodel)

    fmodel = ResNet(stage_sizes=(1, 1, 1, 1), sasa_stages=(2, 3),
                    dtype=jnp.float32)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "resnet", x,
                        lambda m, t: m(t), atol=5e-4, rtol=5e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_vit_lsa_forward_parity(rng):
    """ViT-LSA vs reference vit_lsa.py (SPT shifted tokenization 86-101,
    LSA learnable temperature + diagonal mask 37-69); cls-token features
    compared (mlp_head removed)."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.vit_lsa import ViTLSA

    ref = _ref_module("vit_lsa")
    tmodel = ref.ViT(image_size=32, patch_size=8, num_classes=5, dim=64,
                     depth=2, heads=4, mlp_dim=128, dim_head=16)
    tmodel.mlp_head = torch.nn.Identity()
    _randomize(tmodel)

    fmodel = ViTLSA(image_size=32, patch_size=8, dim=64, depth=2, heads=4,
                    dim_head=16, mlp_dim=128, dtype=jnp.float32)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "vit_lsa", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_coatnet_forward_parity(rng):
    """CoAtNet vs reference coat_net.py (MBConv w/ pre-BN + SE 60-105,
    rel-bias attention 108-199, incl. the int(inp*4) FF-hidden quirk at
    168); pooled features compared (fc1/fc2 removed)."""
    import jax.numpy as jnp

    from endoscopy_tpu.models.coatnet import CoAtNet

    ref = _ref_module("coat_net")
    tmodel = ref.CoAtNet((32, 32), 3, [1, 2, 2, 2, 2], [8, 8, 16, 16, 32],
                         num_classes=5)
    tmodel.fc1 = torch.nn.Identity()
    tmodel.fc2 = torch.nn.Identity()
    _randomize(tmodel)

    fmodel = CoAtNet(num_blocks=(1, 2, 2, 2, 2), channels=(8, 8, 16, 16, 32),
                     dtype=jnp.float32)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    _import_and_compare(fmodel, tmodel, "coatnet", x,
                        lambda m, t: m(t), atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")
def test_halo_attention_parity(rng):
    """HaloAttention vs reference halo.py (75-165), hand-mapped params.

    The reference's padding mask has inverted polarity — masked_fill_(mask)
    fills the VALID keys (halo.py:142-148) so attention lands only on the
    zero padding. The flax module implements the intended semantics, so the
    oracle runs with the fill inverted (mask the padding instead); a second
    un-patched run pins that the reference-as-written differs."""
    import jax.numpy as jnp

    halo = _ref_module("halo")
    tmodel = halo.HaloAttention(dim=32, block_size=4, halo_size=2,
                                dim_head=8, heads=4)
    _randomize(tmodel)
    sd = _np_state_dict(tmodel)

    from endoscopy_tpu.models.attention import HaloAttention

    fmodel = HaloAttention(dim=32, block_size=4, halo_size=2, dim_head=8,
                           heads=4, dtype=jnp.float32)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    variables = fmodel.init(__import__("jax").random.key(0), jnp.asarray(x))
    params = {
        "to_q": {"kernel": np.ascontiguousarray(sd["to_q.weight"].T)},
        "to_kv": {"kernel": np.ascontiguousarray(sd["to_kv.weight"].T)},
        "to_out": {"kernel": np.ascontiguousarray(sd["to_out.weight"].T),
                   "bias": sd["to_out.bias"]},
        "rel_height": sd["rel_pos_emb.rel_height"],
        "rel_width": sd["rel_pos_emb.rel_width"],
    }
    import jax

    chex = jax.tree.map(lambda a, b: np.shape(a) == np.shape(b),
                        variables["params"], params)
    assert all(jax.tree.leaves(chex)), chex
    out = np.asarray(fmodel.apply({"params": params}, jnp.asarray(x)))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    orig_fill = torch.Tensor.masked_fill_

    def corrected_fill(self, mask, value):
        return orig_fill(self, ~mask, value)

    try:
        torch.Tensor.masked_fill_ = corrected_fill
        with torch.no_grad():
            ref_fixed = tmodel(tx).numpy().transpose(0, 2, 3, 1)
    finally:
        torch.Tensor.masked_fill_ = orig_fill
    with torch.no_grad():
        ref_asis = tmodel(tx).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out, ref_fixed, atol=2e-4, rtol=2e-3)
    # pin the documented deviation: the as-written reference (inverted mask)
    # must NOT match — if it starts matching, the polarity note is stale
    assert np.abs(out - ref_asis).max() > 1e-3
