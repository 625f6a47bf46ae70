"""PyTorch checkpoint import/export for transfer learning.

The reference's transfer pipeline loads timm/torchvision-format ``.pth``
checkpoints (ImageNet → 2-class abnormal → N-class pathology head swap,
build.py:113-131, 157-165, 180-194). This module maps torchvision-style
ResNet state_dict keys to the flax ResNet in models/resnet.py and applies the
same surgery: backbone weights are imported, the classification head is left
at its fresh initialization when class counts differ.

Conventions:
- torch Conv2d weight OIHW → flax kernel HWIO (transpose 2,3,1,0)
- torch Linear weight (out,in) → flax kernel (in,out)
- torch BatchNorm weight/bias/running_mean/running_var → flax
  scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_dense(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


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
            # SE module (our se.py naming; reference se.py:121-141 uses
            # conv_down/conv_up inside 'selayer')
            m[f"{torch_pfx}.se.fc_down"] = (flax_name, "se", "fc_down")
            m[f"{torch_pfx}.se.fc_up"] = (flax_name, "se", "fc_up")
            m[f"{torch_pfx}.selayer.conv_down"] = (flax_name, "se", "fc_down")
            m[f"{torch_pfx}.selayer.conv_up"] = (flax_name, "se", "fc_up")
    return m


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    expected = node[path[-1]]
    if tuple(expected.shape) != tuple(value.shape):
        return False
    node[path[-1]] = value.astype(np.asarray(expected).dtype)
    return True


def import_resnet_torch_state(
    params: Any,
    batch_stats: Any,
    state_dict: Dict[str, Any],
    backbone_scope: str = "backbone",
    stage_sizes=(3, 4, 6, 3),
) -> Tuple[Any, Any, int]:
    """Import a torch ResNet state_dict into (params, batch_stats).

    Returns (new_params, new_batch_stats, n_imported). Head keys ('fc.*') are
    skipped when their shapes disagree — the build.py:180-194 surgery: load
    the 2-class abnormal trunk, keep the fresh N-class head.
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    p_root = params[backbone_scope] if backbone_scope else params
    b_root = (batch_stats.get(backbone_scope, {}) if backbone_scope
              else batch_stats)
    key_map = resnet_key_map(stage_sizes)
    imported = 0

    for tkey, value in state_dict.items():
        value = np.asarray(value)
        parts = tkey.rsplit(".", 1)
        if len(parts) != 2:
            continue
        prefix, leaf = parts
        # strip common wrappers ('model.'/'module.' — ModelwEmb/DataParallel)
        for wrap in ("module.", "model."):
            if prefix.startswith(wrap):
                prefix = prefix[len(wrap):]
        if prefix not in key_map:
            continue
        path = key_map[prefix]
        if leaf == "weight":
            if value.ndim == 4:
                ok = _set(p_root, path + ("kernel",), _t_conv(value))
            elif value.ndim == 1:  # BN scale
                ok = _set(p_root, path + ("scale",), value)
            else:
                ok = _set(p_root, path + ("kernel",), _t_dense(value))
        elif leaf == "bias":
            ok = _set(p_root, path + ("bias",), value)
        elif leaf == "running_mean":
            ok = _set(b_root, path + ("mean",), value)
        elif leaf == "running_var":
            ok = _set(b_root, path + ("var",), value)
        else:  # num_batches_tracked etc.
            continue
        imported += int(ok)

    import jax.numpy as jnp
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return params, batch_stats, imported


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
