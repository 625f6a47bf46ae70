"""Cross-entropy-family losses (reference: loss.py).

All functions are pure JAX, jit/vmap/grad-safe, and replicate the reference's
numerical semantics exactly — including torch's *weighted-mean* convention for
``F.cross_entropy(weight=..., reduction='mean')`` (sum of weighted per-sample
losses divided by the sum of selected weights) and the reference FocalLoss's
observed behavior of applying the focal modulation to the *batch-mean* CE
(loss.py:45-64 constructs ``nn.CrossEntropyLoss`` with default 'mean'
reduction).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits, axis=-1)


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """torch.nn.functional.cross_entropy semantics for integer targets.

    reduction='none'  -> per-sample  w[y_i] * ce_i  (w=1 if weight is None)
    reduction='mean'  -> sum_i w[y_i]*ce_i / sum_i w[y_i]
    reduction='sum'   -> sum_i w[y_i]*ce_i
    """
    nll = -jnp.take_along_axis(_log_softmax(logits), targets[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = weight[targets]
        nll = nll * w
    else:
        w = jnp.ones_like(nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    return jnp.sum(nll) / jnp.sum(w)


def soft_ce_loss(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """Soft-label CE: per-sample -sum(t * log_softmax(z)) (loss.py:120-124)."""
    return jnp.sum(-soft_targets * _log_softmax(logits), axis=-1)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 1.0,
    class_weights: Optional[jnp.ndarray] = None,
    reduction: str = "none",
) -> jnp.ndarray:
    """Reference FocalLoss (loss.py:45-64).

    Note the reference builds its inner ``nn.CrossEntropyLoss`` with default
    'mean' reduction, so the focal term modulates the *batch-mean* CE and the
    result is a scalar regardless of ``reduction``; replicated faithfully.
    """
    logp = cross_entropy(logits, targets, weight=class_weights, reduction="mean")
    p = jnp.exp(-logp)
    return (1.0 - p) ** gamma * logp


def poly_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float = 1.0,
    ce_weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """PolyLoss (loss.py:308-364): poly_i = w[y_i]*ce_i + eps*(1 - p_{y_i}).

    The inner CE uses reduction='none' with class weights, i.e. *unnormalized*
    per-sample weighted CE; the final 'mean' is a plain batch mean — this is
    deliberately NOT the weighted-mean convention (matches MONAI/reference).
    Trainers call this with epsilon=2.0 (loss.py:110-114).
    """
    ce = cross_entropy(logits, targets, weight=ce_weight, reduction="none")
    probs = jax.nn.softmax(logits, axis=-1)
    pt = jnp.take_along_axis(probs, targets[:, None], axis=-1)[:, 0]
    poly = ce + epsilon * (1.0 - pt)
    if reduction == "mean":
        return jnp.mean(poly)
    if reduction == "sum":
        return jnp.sum(poly)
    return poly


def ldam_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cls_num_list: np.ndarray,
    max_m: float = 0.5,
    s: float = 30.0,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LDAM loss (loss.py:66-88): subtract per-class margin m_c ∝ n_c^{-1/4}
    from the target logit, then scaled weighted CE."""
    m_list = 1.0 / np.sqrt(np.sqrt(np.asarray(cls_num_list, dtype=np.float64)))
    m_list = m_list * (max_m / np.max(m_list))
    m = jnp.asarray(m_list, dtype=logits.dtype)[targets]
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    adjusted = logits - onehot * m[:, None]
    return cross_entropy(s * adjusted, targets, weight=weight, reduction="mean")


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float = 0.1,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """LabelSmoothingLoss (loss.py:13-43):
    (1-eps)*NLL + eps * mean(-sum log_softmax)/num_classes."""
    log_preds = _log_softmax(logits)
    smooth = -jnp.sum(log_preds, axis=-1)
    if reduction == "mean":
        smooth = jnp.mean(smooth)
    elif reduction == "sum":
        smooth = jnp.sum(smooth)
    nll = cross_entropy(logits, targets, weight=weight, reduction=reduction)
    num_classes = logits.shape[-1]
    return (1.0 - epsilon) * nll + epsilon * smooth / num_classes


def poly_bce_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float = 1.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """PolyBCELoss (loss.py:367-401)."""
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(targets == 1, p, 1.0 - p)
    poly = bce + epsilon * (1.0 - pt)
    if reduction == "mean":
        return jnp.mean(poly)
    if reduction == "sum":
        return jnp.sum(poly)
    return poly


def ce_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    use_hard_labels: bool = True,
    reduction: str = "none",
    type_loss: str = "none",
    cls_num_list=None,
) -> jnp.ndarray:
    """Dispatcher mirroring the reference ``ce_loss`` (loss.py:90-124).

    type_loss: 'none' (plain weighted CE), 'focal' (gamma=1), 'poly' (eps=2),
    'ldam' (requires cls_num_list). With use_hard_labels=False, targets are a
    prob vector and per-sample soft CE is returned (reduction ignored, as in
    the reference).
    """
    if use_hard_labels:
        if type_loss == "focal":
            return focal_loss(logits, targets, gamma=1.0, class_weights=class_weights, reduction=reduction)
        if type_loss == "poly":
            return poly_loss(logits, targets, epsilon=2.0, ce_weight=class_weights, reduction=reduction)
        if type_loss == "ldam" and cls_num_list is not None:
            return ldam_loss(logits, targets, cls_num_list, max_m=0.5, s=30.0, weight=class_weights)
        return cross_entropy(logits, targets, weight=class_weights, reduction=reduction)
    return soft_ce_loss(logits, targets)


def balanced_class_weights(targets: np.ndarray, num_classes: Optional[int] = None) -> np.ndarray:
    """sklearn 'balanced' class weights: n_samples / (n_classes * bincount).

    The reference computes these host-side from the labeled dataframe
    (fixmatch.py:61-66) over the classes *present* in the data.
    """
    targets = np.asarray(targets, dtype=np.int64)
    classes = np.unique(targets)
    counts = np.array([(targets == c).sum() for c in classes], dtype=np.float64)
    weights = len(targets) / (len(classes) * counts)
    if num_classes is None:
        return weights
    full = np.zeros(num_classes, dtype=np.float64)
    full[classes] = weights
    return full


def effective_number_weights(cls_num_list, beta: float = 0.9999) -> np.ndarray:
    """Effective-number class weights: w_c = (1-beta)/(1-beta^{n_c}),
    normalized to sum to num_classes (supervised.py:326-331)."""
    counts = np.asarray(cls_num_list, dtype=np.float64)
    eff = 1.0 - np.power(beta, counts)
    w = (1.0 - beta) / eff
    return w / np.sum(w) * len(counts)


def rdw_weights(epoch: int, cls_num_list) -> np.ndarray:
    """Deferred re-weighting ('RDW') schedule (supervised.py:324-331):
    uniform weights for epoch < 25 (beta=0), effective-number weights with
    beta=0.9999 afterwards."""
    betas = [0.0, 0.9999]
    idx = min(epoch // 25, 1)
    return effective_number_weights(cls_num_list, beta=betas[idx])
