"""PyTorch checkpoint import/export for transfer learning.

The reference's transfer pipeline loads timm/torchvision-format ``.pth``
checkpoints (ImageNet → 2-class abnormal → N-class pathology head swap,
build.py:113-131, 157-165, 180-194). This module maps torch state_dict keys
onto the flax model trees for every backbone family the reference transfers
into — ResNet/SE-ResNet (build.py:152-170, 180-194), DenseNet
(build.py:180-194 timm fallback), Swin (build.py:44-67), and the Conformer
2-stage surgery (build.py:92-151) — and applies the same surgery: trunk
weights are imported; classifier heads are left at fresh initialization
(the reference rebuilds them after every load).

Leaf conventions:
- torch Conv2d weight OIHW → flax kernel HWIO (transpose 2,3,1,0)
- torch Linear weight (out,in) → flax kernel (in,out)
- torch BatchNorm/LayerNorm weight/bias → flax scale/bias;
  running_mean/running_var → batch_stats mean/var
- bare parameters (cls_token, relative_position_bias_table) copy as-is

Because the flax modules here deliberately reuse the reference's attribute
names, most keys map by identity; per-architecture regex renames cover the
few structural differences (Sequential indices, timm nesting).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_dense(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


# -- per-architecture key translation ----------------------------------------
#
# Each entry: (renames, skips). Renames are (regex, replacement) applied in
# order to the torch key prefix (module path without the leaf). Skips are
# regexes for keys the import intentionally ignores: classifier heads (the
# build.py surgery always re-initializes them) and registered buffers that
# the flax models compute at trace time (relative_position_index, attn_mask).

# arch -> (renames, skips); a rename replacement may be a string or a
# callable (re.sub semantics)
_ARCHES: Dict[str, Tuple[List[Tuple[str, Any]], List[str]]] = {
    # torchvision/timm ResNet + the reference's in-repo SEResNet (se.py:8-118:
    # SE convs conv_down/conv_up live directly on the bottleneck; timm SENets
    # use se.fc1-style submodules).
    "resnet": (
        [
            (r"^layer(\d+)\.(\d+)\.downsample\.0", r"layer\1_\2.downsample_conv"),
            (r"^layer(\d+)\.(\d+)\.downsample\.1", r"layer\1_\2.downsample_bn"),
            # (timm-style se.fc_down/fc_up keys fall through to the generic
            # layer rule unchanged — no dedicated entries needed)
            (r"^layer(\d+)\.(\d+)\.selayer\.conv_down", r"layer\1_\2.se.fc_down"),
            (r"^layer(\d+)\.(\d+)\.selayer\.conv_up", r"layer\1_\2.se.fc_up"),
            (r"^layer(\d+)\.(\d+)\.conv_down", r"layer\1_\2.se.fc_down"),
            (r"^layer(\d+)\.(\d+)\.conv_up", r"layer\1_\2.se.fc_up"),
            # CBAM gate (reference cbam.py:27-100): shared-MLP channel gate
            # Sequential indices + BasicConv spatial gate
            (r"\.cbam\.ChannelGate\.mlp\.1", r".cbam.mlp_fc1"),
            (r"\.cbam\.ChannelGate\.mlp\.3", r".cbam.mlp_fc2"),
            (r"\.cbam\.SpatialGate\.spatial\.conv", r".cbam.spatial_conv"),
            (r"\.cbam\.SpatialGate\.spatial\.bn", r".cbam.spatial_bn"),
            # shuffle-attention gate (sa.py:14-31): gn child maps by name;
            # the (1,C,1,1) gate weights reshape (see _RESHAPE_PATHS).
            # SASA needs no rules either: the flax SASALayer is named 'conv2'
            # like the reference's (sasa.py:193-196), so q/k/v convs and the
            # bare rel encodings map via the generic layer rule.
            (r"^layer(\d+)\.(\d+)\.", r"layer\1_\2."),
        ],
        [r"^fc\b", r"^head\b", r"^classifier\b"],
    ),
    # reference vit_lsa.py:37-144 (ViT w/ shifted-patch tokenization and
    # locality self-attention): Sequential/PreNorm wrappers flatten onto the
    # flax per-depth names
    "vit_lsa": (
        [
            (r"^to_patch_embedding\.to_patch_tokens\.1",
             r"to_patch_embedding.norm"),
            (r"^to_patch_embedding\.to_patch_tokens\.2",
             r"to_patch_embedding.proj"),
            (r"^transformer\.layers\.(\d+)\.0\.norm", r"norm1_\1"),
            (r"^transformer\.layers\.(\d+)\.0\.fn\.to_out\.0", r"attn_\1.to_out"),
            (r"^transformer\.layers\.(\d+)\.0\.fn\.to_qkv", r"attn_\1.to_qkv"),
            (r"^transformer\.layers\.(\d+)\.0\.fn", r"attn_\1"),
            (r"^transformer\.layers\.(\d+)\.1\.norm", r"norm2_\1"),
            (r"^transformer\.layers\.(\d+)\.1\.fn\.net\.0", r"mlp1_\1"),
            (r"^transformer\.layers\.(\d+)\.1\.fn\.net\.3", r"mlp2_\1"),
        ],
        [r"^mlp_head\b"],
    ),
    # reference coat_net.py:60-247: MBConv Sequential indices + the
    # Rearrange/PreNorm-wrapped attention/ff stages
    "coatnet": (
        [
            (r"^s0\.(\d+)\.0", r"s0_conv\1"),
            (r"^s0\.(\d+)\.1", r"s0_bn\1"),
            (r"^s(\d)\.(\d+)\.conv\.norm", r"s\1_block\2.pre_bn"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.0", r"s\1_block\2.pw"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.1", r"s\1_block\2.bn1"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.3", r"s\1_block\2.dw"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.4", r"s\1_block\2.bn2"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.6\.fc\.0", r"s\1_block\2.se_fc1"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.6\.fc\.2", r"s\1_block\2.se_fc2"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.7", r"s\1_block\2.pw_linear"),
            (r"^s(\d)\.(\d+)\.conv\.fn\.8", r"s\1_block\2.bn3"),
            (r"^s(\d)\.(\d+)\.attn\.1\.norm", r"s\1_block\2.attn_norm"),
            (r"^s(\d)\.(\d+)\.attn\.1\.fn\.to_out\.0", r"s\1_block\2.attn.to_out"),
            (r"^s(\d)\.(\d+)\.attn\.1\.fn", r"s\1_block\2.attn"),
            (r"^s(\d)\.(\d+)\.ff\.1\.norm", r"s\1_block\2.ff_norm"),
            (r"^s(\d)\.(\d+)\.ff\.1\.fn\.net\.0", r"s\1_block\2.ff1"),
            (r"^s(\d)\.(\d+)\.ff\.1\.fn\.net\.3", r"s\1_block\2.ff2"),
            (r"^s(\d)\.(\d+)\.proj", r"s\1_block\2.proj"),
        ],
        [r"^fc1\b", r"^fc2\b", r"relative_index$"],
    ),
    # torchvision/timm DenseNet (features.denseblockN.denselayerM...)
    "densenet": (
        [
            (r"^features\.denseblock(\d+)\.denselayer(\d+)\.", r"block\1_layer\2."),
            (r"^features\.transition(\d+)\.", r"transition\1."),
            (r"^features\.norm5", r"norm_final"),
            (r"^features\.", r""),
        ],
        [r"^classifier\b"],
    ),
    # timm 0.5.4 / MSR Swin (layers.N.blocks.M..., downsample, patch_embed)
    "swin": (
        [
            (r"^patch_embed\.proj", r"patch_embed"),
            (r"^patch_embed\.norm", r"patch_norm"),
            (r"^layers\.(\d+)\.blocks\.(\d+)\.", r"stage\1_block\2."),
            (r"^layers\.(\d+)\.downsample\.", r"merge\1."),
            (r"\.mlp\.fc1", r".mlp_fc1"),
            (r"\.mlp\.fc2", r".mlp_fc2"),
        ],
        # head skips include the reference's customized fc1/fc2/bn head
        # (swin_transformer.py:541-543)
        [r"^head\b", r"^fc1\b", r"^fc2\b", r"^bn\b",
         r"relative_position_index$", r"attn_mask$",
         r"^absolute_pos_embed$"],
    ),
    # MSR SwinMLP (reference models/swin_mlp.py:66-183, offered via timm in
    # build.py:64-67): Swin topology with a grouped 1x1 Conv1d spatial MLP
    # per block. Same structural renames as swin; the spatial_mlp leaves get
    # an element-count reshape (see _RESHAPE_PATHS): torch weight
    # (heads*ws², ws², 1) → flax per-head (heads, ws², ws²), bias
    # (heads*ws²,) → (heads, ws²) — group g's rows are contiguous in the
    # grouped-conv channel axis, so a plain reshape is the exact layout.
    "swin_mlp": (
        [
            (r"^patch_embed\.proj", r"patch_embed"),
            (r"^patch_embed\.norm", r"patch_norm"),
            (r"^layers\.(\d+)\.blocks\.(\d+)\.", r"stage\1_block\2."),
            (r"^layers\.(\d+)\.downsample\.", r"merge\1."),
            (r"\.mlp\.fc1", r".mlp_fc1"),
            (r"\.mlp\.fc2", r".mlp_fc2"),
        ],
        [r"^head\b", r"^fc1\b", r"^fc2\b", r"^bn\b",
         r"^absolute_pos_embed$"],
    ),
    # reference models/conformer.py — flax module names match 1:1
    "conformer": (
        [],
        [r"^conv_cls_head\b", r"^trans_cls_head\b", r"^pooling\b"],
    ),
    # timm 0.5.4 EfficientNet (efficientnet_b0/b1, the reference's abnormal
    # classifier backbone via the build.py:172-220 timm fallback).
    # blocks.0.* are DepthwiseSeparableConv (conv_pw IS the projection);
    # later stages are InvertedResidual (conv_pw expand / conv_pwl project).
    "efficientnet": (
        [
            (r"^blocks\.0\.(\d+)\.conv_dw", r"blocks.0.\1.dw_conv"),
            (r"^blocks\.0\.(\d+)\.bn1", r"blocks.0.\1.dw_bn"),
            (r"^blocks\.0\.(\d+)\.conv_pw", r"blocks.0.\1.project_conv"),
            (r"^blocks\.0\.(\d+)\.bn2", r"blocks.0.\1.project_bn"),
            (r"^blocks\.(\d+)\.(\d+)\.conv_pwl", r"blocks.\1.\2.project_conv"),
            (r"^blocks\.(\d+)\.(\d+)\.bn3", r"blocks.\1.\2.project_bn"),
            (r"^blocks\.(\d+)\.(\d+)\.conv_pw", r"blocks.\1.\2.expand_conv"),
            (r"^blocks\.(\d+)\.(\d+)\.bn1", r"blocks.\1.\2.expand_bn"),
            (r"^blocks\.(\d+)\.(\d+)\.conv_dw", r"blocks.\1.\2.dw_conv"),
            (r"^blocks\.(\d+)\.(\d+)\.bn2", r"blocks.\1.\2.dw_bn"),
            (r"\.se\.conv_reduce", r".se_reduce"),
            (r"\.se\.conv_expand", r".se_expand"),
            # flax modules are stage{S}_block{B}, 1-based on both axes
            (r"^blocks\.(\d+)\.(\d+)\.",
             lambda m: f"stage{int(m.group(1)) + 1}_block{int(m.group(2)) + 1}."),
            (r"^conv_stem", r"stem_conv"),
            (r"^bn1", r"stem_bn"),
            (r"^conv_head", r"head_conv"),
            (r"^bn2", r"head_bn"),
        ],
        [r"^classifier\b"],
    ),
}

# Renamed module paths whose torch values are the SAME elements in a
# different factorization: import by reshaping to the flax param's shape
# (element counts must match). Keyed by arch; matched against the renamed
# module path's last component.
_RESHAPE_PATHS: Dict[str, re.Pattern] = {
    "swin_mlp": re.compile(r"^spatial_mlp$"),
    # shuffle-attention gate weights are (1,C,1,1) in torch (sa.py:25-28),
    # flat (C,) here
    "resnet": re.compile(r"^sa$"),
}

# torch ModelwEmb checkpoints alias every backbone param twice:
# 'model.<key>' (the timm model) and 'backbone.<idx>.<key>' (the
# nn.Sequential(children) view, custom_model.py:200). The numeric-Sequential
# view is dropped; 'model.'/'module.' wrappers are stripped.
_ALIAS_RE = re.compile(r"^backbone\.\d+\.")


def arch_for_model(name: str) -> str:
    """MODEL.NAME → import architecture family."""
    name = str(name)
    if name.startswith(("resnet", "seresnext")):
        return "resnet"
    if name.startswith("densenet"):
        return "densenet"
    if name.startswith("swin_mlp"):
        return "swin_mlp"
    if name.startswith("swin"):
        return "swin"
    if name == "conformer":
        return "conformer"
    if name.startswith("efficientnet"):
        return "efficientnet"
    if name.startswith("vit"):
        return "vit_lsa"
    if name.startswith("coatnet"):
        return "coatnet"
    raise NotImplementedError(
        f"no torch import key map for '{name}'; supported families: "
        f"{sorted(_ARCHES)}")


@dataclasses.dataclass
class ImportReport:
    imported: int = 0
    skipped: List[str] = dataclasses.field(default_factory=list)
    shape_mismatch: List[str] = dataclasses.field(default_factory=list)
    unmapped: List[str] = dataclasses.field(default_factory=list)

    def summary(self) -> str:
        return (f"imported {self.imported} tensors, "
                f"skipped {len(self.skipped)} (heads/buffers/aliases), "
                f"{len(self.shape_mismatch)} shape mismatches, "
                f"{len(self.unmapped)} unmapped")


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray,
         reshape: bool = False) -> str:
    node = tree
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            return "missing"
        node = node[p]
    if not isinstance(node, dict) or path[-1] not in node:
        return "missing"
    expected = node[path[-1]]
    if tuple(expected.shape) != tuple(value.shape):
        if reshape and value.size == np.asarray(expected).size:
            value = value.reshape(expected.shape)
        else:
            return "shape"
    node[path[-1]] = value.astype(np.asarray(expected).dtype)
    return "ok"


def import_torch_state(
    params: Any,
    batch_stats: Any,
    state_dict: Dict[str, Any],
    arch: str,
    backbone_scope: Optional[str] = "backbone",
    strict: bool = False,
) -> Tuple[Any, Any, ImportReport]:
    """Import a torch state_dict into (params, batch_stats) for ``arch``.

    ``backbone_scope`` names the flax subtree holding the trunk (None for
    bare models like Conformer). Head keys are skipped — the build.py
    surgery (113-131, 180-194): trunk imported, fresh N-class head. With
    ``strict=True`` any trunk key that maps to no flax parameter raises.
    """
    import jax
    import jax.numpy as jnp

    if arch not in _ARCHES:
        raise ValueError(f"unknown arch '{arch}'; known: {sorted(_ARCHES)}")
    renames, skips = _ARCHES[arch]
    skip_res = [re.compile(s) for s in skips]

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    if backbone_scope:
        p_root = params[backbone_scope]
        b_root = batch_stats.get(backbone_scope, {})
    else:
        p_root, b_root = params, batch_stats

    report = ImportReport()
    for tkey, value in state_dict.items():
        key = tkey
        for wrap in ("module.", "model."):
            if key.startswith(wrap):
                key = key[len(wrap):]
        if _ALIAS_RE.match(key) or key.endswith("num_batches_tracked"):
            report.skipped.append(tkey)
            continue
        if any(sr.search(key) for sr in skip_res):
            report.skipped.append(tkey)
            continue

        value = np.asarray(value)
        prefix, _, leaf = key.rpartition(".")
        if not prefix:  # bare top-level parameter (cls_token)
            prefix, leaf = leaf, ""
        for pat, repl in renames:
            prefix = re.sub(pat, repl, prefix)

        path = tuple(p for p in prefix.split(".") if p)
        reshape_re = _RESHAPE_PATHS.get(arch)
        if reshape_re is not None and path and reshape_re.match(path[-1]):
            # same elements, different factorization (e.g. grouped Conv1d →
            # per-head tensor): leaf name carries over, value reshapes
            status = _set(p_root, path + (leaf,), value, reshape=True)
        elif leaf == "weight":
            if value.ndim == 4:
                status = _set(p_root, path + ("kernel",), _t_conv(value))
            elif value.ndim == 2:
                status = _set(p_root, path + ("kernel",), _t_dense(value))
            else:  # BN/LN affine
                status = _set(p_root, path + ("scale",), value)
        elif leaf == "bias":
            status = _set(p_root, path + ("bias",), value)
        elif leaf == "running_mean":
            status = _set(b_root, path + ("mean",), value)
        elif leaf == "running_var":
            status = _set(b_root, path + ("var",), value)
        else:
            # bare parameter: try the leaf as the param name itself
            full = path + ((leaf,) if leaf else ())
            status = _set(p_root, full, value)
        if status == "ok":
            report.imported += 1
        elif status == "shape":
            report.shape_mismatch.append(tkey)
        else:
            report.unmapped.append(tkey)

    if strict and report.unmapped:
        raise KeyError(
            f"torch import ({arch}): {len(report.unmapped)} keys map to no "
            f"flax parameter, e.g. {report.unmapped[:8]}")

    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return params, batch_stats, report


# -- backward-compatible ResNet-specific API ----------------------------------

def resnet_key_map(stage_sizes=(3, 4, 6, 3)) -> Dict[str, Tuple[str, ...]]:
    """torch key prefix → (flax module path...) for torchvision/timm ResNet."""
    m: Dict[str, Tuple[str, ...]] = {
        "conv1": ("conv1",),
        "bn1": ("bn1",),
    }
    for s, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            torch_pfx = f"layer{s + 1}.{b}"
            flax_name = f"layer{s + 1}_{b}"
            for conv in ("conv1", "conv2", "conv3"):
                m[f"{torch_pfx}.{conv}"] = (flax_name, conv)
            for bn in ("bn1", "bn2", "bn3"):
                m[f"{torch_pfx}.{bn}"] = (flax_name, bn)
            m[f"{torch_pfx}.downsample.0"] = (flax_name, "downsample_conv")
            m[f"{torch_pfx}.downsample.1"] = (flax_name, "downsample_bn")
            # SE module (our se naming; reference se.py:8-27 puts conv_down/
            # conv_up directly on the bottleneck)
            m[f"{torch_pfx}.se.fc_down"] = (flax_name, "se", "fc_down")
            m[f"{torch_pfx}.se.fc_up"] = (flax_name, "se", "fc_up")
            m[f"{torch_pfx}.conv_down"] = (flax_name, "se", "fc_down")
            m[f"{torch_pfx}.conv_up"] = (flax_name, "se", "fc_up")
    return m


def import_resnet_torch_state(
    params: Any,
    batch_stats: Any,
    state_dict: Dict[str, Any],
    backbone_scope: str = "backbone",
    stage_sizes=(3, 4, 6, 3),
) -> Tuple[Any, Any, int]:
    """ResNet-only wrapper over import_torch_state (kept for API compat)."""
    params, batch_stats, report = import_torch_state(
        params, batch_stats, state_dict, "resnet", backbone_scope)
    return params, batch_stats, report.imported


def export_resnet_torch_state(
    params: Any,
    batch_stats: Any,
    backbone_scope: str = "backbone",
    stage_sizes=(3, 4, 6, 3),
) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax ResNet → torchvision-style state_dict (for
    interop with reference tooling)."""
    p_root = params[backbone_scope] if backbone_scope else params
    b_root = (batch_stats.get(backbone_scope, {}) if backbone_scope
              else batch_stats)
    out: Dict[str, np.ndarray] = {}
    for tkey, path in resnet_key_map(stage_sizes).items():
        node_p, node_b = p_root, b_root
        ok = True
        for p in path:
            if p in node_p:
                node_p = node_p[p]
            else:
                ok = False
                break
            node_b = node_b.get(p, {}) if isinstance(node_b, dict) else {}
        if not ok or not isinstance(node_p, dict):
            continue
        if "kernel" in node_p:
            k = np.asarray(node_p["kernel"])
            if k.ndim == 4:
                out[f"{tkey}.weight"] = np.transpose(k, (3, 2, 0, 1))
            else:
                out[f"{tkey}.weight"] = np.transpose(k, (1, 0))
            if "bias" in node_p:
                out[f"{tkey}.bias"] = np.asarray(node_p["bias"])
        if "scale" in node_p:
            out[f"{tkey}.weight"] = np.asarray(node_p["scale"])
            out[f"{tkey}.bias"] = np.asarray(node_p["bias"])
            if isinstance(node_b, dict) and "mean" in node_b:
                out[f"{tkey}.running_mean"] = np.asarray(node_b["mean"])
                out[f"{tkey}.running_var"] = np.asarray(node_b["var"])
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load with the reference's map_location contract
    (build.py:113 ``{'cuda:0':'cpu'}``); unwraps {'model_state_dict': ...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}
