"""Golden-parity loss tests against torch formulas (the reference's loss.py
semantics), computed independently here with torch.nn.functional."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from endoscopy_tpu.losses import (
    angular_penalty_loss,
    balanced_class_weights,
    ce_loss,
    consistency_loss,
    cross_entropy,
    effective_number_weights,
    focal_loss,
    label_smoothing_loss,
    ldam_loss,
    poly_bce_loss,
    poly_loss,
    rdw_weights,
    soft_ce_loss,
    triplet_loss,
)

B, C = 16, 6


@pytest.fixture
def batch(rng):
    logits = rng.normal(size=(B, C)).astype(np.float32)
    targets = rng.integers(0, C, size=B).astype(np.int64)
    weights = rng.uniform(0.5, 2.0, size=C).astype(np.float32)
    return logits, targets, weights


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_cross_entropy_weighted_mean(batch):
    logits, targets, weights = batch
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights), "mean")
    ref = F.cross_entropy(t(logits), t(targets), weight=t(weights), reduction="mean")
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_cross_entropy_none_and_unweighted(batch):
    logits, targets, _ = batch
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets), None, "none")
    ref = F.cross_entropy(t(logits), t(targets), reduction="none")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_soft_ce(batch):
    logits, _, _ = batch
    soft = np.asarray(jax.nn.softmax(jnp.asarray(logits) * 0.3, axis=-1))
    ours = soft_ce_loss(jnp.asarray(logits), jnp.asarray(soft))
    ref = torch.sum(-t(soft) * F.log_softmax(t(logits), dim=-1), dim=1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_focal_loss_batch_mean_semantics(batch):
    """Reference FocalLoss modulates the batch-mean CE (loss.py:57-64)."""
    logits, targets, weights = batch
    ours = focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=1.0,
                      class_weights=jnp.asarray(weights))
    logp = F.cross_entropy(t(logits), t(targets), weight=t(weights))  # 'mean'
    ref = (1 - torch.exp(-logp)) ** 1.0 * logp
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_poly_loss_eps2(batch):
    """PolyLoss: unnormalized weighted per-sample CE + eps*(1-pt), plain mean
    (loss.py:308-364 with epsilon=2 per loss.py:110-114)."""
    logits, targets, weights = batch
    ours = poly_loss(jnp.asarray(logits), jnp.asarray(targets), epsilon=2.0,
                     ce_weight=jnp.asarray(weights), reduction="mean")
    ce = F.cross_entropy(t(logits), t(targets), weight=t(weights), reduction="none")
    pt = (F.softmax(t(logits), dim=1) * F.one_hot(t(targets), C)).sum(dim=1)
    ref = (ce + 2.0 * (1 - pt)).mean()
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_ldam_loss(batch):
    logits, targets, weights = batch
    cls_num_list = [500, 300, 120, 60, 20, 8]
    ours = ldam_loss(jnp.asarray(logits), jnp.asarray(targets), cls_num_list,
                     max_m=0.5, s=30.0, weight=jnp.asarray(weights))
    m_list = 1.0 / np.sqrt(np.sqrt(np.array(cls_num_list)))
    m_list = m_list * (0.5 / np.max(m_list))
    batch_m = m_list[targets].astype(np.float32)
    x_m = logits.copy()
    x_m[np.arange(B), targets] -= batch_m
    ref = F.cross_entropy(30.0 * t(x_m), t(targets), weight=t(weights))
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_label_smoothing(batch):
    logits, targets, _ = batch
    eps = 0.1
    ours = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), epsilon=eps)
    log_preds = F.log_softmax(t(logits), dim=-1)
    smooth = (-log_preds.sum(dim=-1)).mean()
    nll = F.nll_loss(log_preds, t(targets))
    ref = (1 - eps) * nll + eps * smooth / C
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_poly_bce(batch):
    logits, _, _ = batch
    targets = (np.asarray(logits) > 0).astype(np.float32)
    ours = poly_bce_loss(jnp.asarray(logits), jnp.asarray(targets), epsilon=1.0)
    bce = F.binary_cross_entropy_with_logits(t(logits), t(targets), reduction="none")
    pt = torch.sigmoid(t(logits))
    pt = torch.where(t(targets) == 1, pt, 1 - pt)
    ref = (bce + (1 - pt)).mean()
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_consistency_loss_mask_and_value(batch):
    """FixMatch masked CE on strong view from weak-view pseudo-labels
    (loss.py:150-164)."""
    logits_w, targets, _ = batch
    logits_s = logits_w[::-1].copy()
    cutoff = 0.5
    loss, mask_mean = consistency_loss(jnp.asarray(logits_w), jnp.asarray(logits_s),
                                       p_cutoff=cutoff)
    probs = F.softmax(t(logits_w), dim=-1)
    max_probs, max_idx = probs.max(dim=-1)
    mask = (max_probs >= cutoff).float()
    ref = (F.cross_entropy(t(logits_s), max_idx, reduction="none") * mask).mean()
    assert float(loss) == pytest.approx(float(ref), rel=1e-4)
    assert float(mask_mean) == pytest.approx(float(mask.mean()), rel=1e-5)


def test_consistency_loss_soft_labels(batch):
    logits_w, _, _ = batch
    logits_s = np.roll(logits_w, 3, axis=0)
    T = 0.5
    loss, _ = consistency_loss(jnp.asarray(logits_w), jnp.asarray(logits_s),
                               p_cutoff=0.2, use_hard_labels=False, T=T)
    probs = F.softmax(t(logits_w), dim=-1)
    mask = (probs.max(dim=-1).values >= 0.2).float()
    sharp = F.softmax(t(logits_w) / T, dim=-1)
    ref = ((torch.sum(-sharp * F.log_softmax(t(logits_s), dim=-1), dim=1)) * mask).mean()
    assert float(loss) == pytest.approx(float(ref), rel=1e-4)


def test_triplet_loss(rng):
    a = rng.normal(size=(B, 32)).astype(np.float32)
    p = a + 0.1 * rng.normal(size=(B, 32)).astype(np.float32)
    n = rng.normal(size=(B, 32)).astype(np.float32)
    loss, d_ap, d_an = triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), alpha=0.7)
    d_p = torch.norm(t(a) - t(p), dim=1)
    d_n = torch.norm(t(a) - t(n), dim=1)
    ref = torch.clamp(d_p - d_n + 0.7, min=0).mean()
    assert float(loss) == pytest.approx(float(ref), rel=1e-4)
    assert float(d_ap) == pytest.approx(float(d_p.mean()), rel=1e-4)
    assert float(d_an) == pytest.approx(float(d_n.mean()), rel=1e-4)


@pytest.mark.parametrize("loss_type,s,m", [
    ("cosface", 30.0, 0.4), ("arcface", 30.0, 0.3),
    ("sphereface", 30.0, 1.35), ("acloss", 30.0, 0.3),
])
def test_angular_penalty_matches_reference_formula(rng, loss_type, s, m):
    """Replicates loss.py:228-260 including the no-op weight normalization."""
    feats = rng.normal(size=(B, 32)).astype(np.float32)
    targets = rng.integers(0, C, size=B).astype(np.int64)
    kernel = (rng.normal(size=(32, C)) * 0.05).astype(np.float32)

    ours = angular_penalty_loss(jnp.asarray(feats), jnp.asarray(targets),
                                jnp.asarray(kernel), loss_type=loss_type)

    x = F.normalize(t(feats), p=2, dim=1)
    logits = x @ t(kernel)  # torch Linear(bias=False) with weight = kernel.T
    tgt = logits[torch.arange(B), t(targets)]
    eps = 1e-7
    clamped = torch.clamp(tgt, -1 + eps, 1 - eps)
    if loss_type == "cosface":
        numerator = s * (tgt - m)
    elif loss_type == "arcface":
        numerator = s * torch.cos(torch.acos(clamped) + m)
    elif loss_type == "sphereface":
        numerator = s * torch.cos(m * torch.acos(clamped))
    else:
        k = 0.3
        acos = torch.acos(clamped) + m
        sig1 = (1 + math.exp(-math.pi / 2 / k)) / (1 - math.exp(-math.pi / 2 / k))
        sig2 = (1 - torch.exp(acos / k - math.pi / 2 / k)) / (1 + torch.exp(acos / k - math.pi / 2 / k))
        numerator = s * sig1 * sig2
    excl = torch.stack([torch.cat((logits[i, :y], logits[i, y + 1:]))
                        for i, y in enumerate(targets)])
    denom = torch.exp(numerator) + torch.sum(torch.exp(s * excl), dim=1)
    ref = -torch.mean(numerator - torch.log(denom))
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_balanced_class_weights_matches_sklearn(rng):
    from sklearn.utils import class_weight
    y = rng.integers(0, C, size=300)
    ours = balanced_class_weights(y)
    ref = class_weight.compute_class_weight(
        class_weight="balanced", classes=np.unique(y), y=list(y))
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_rdw_schedule(rng):
    cls_num_list = [900, 300, 100, 40, 20, 10]
    # epoch < 25: beta=0 -> uniform ones
    np.testing.assert_allclose(rdw_weights(10, cls_num_list), np.ones(C))
    # epoch >= 25: effective-number weights (supervised.py:326-331)
    w = rdw_weights(30, cls_num_list)
    eff = 1.0 - np.power(0.9999, cls_num_list)
    ref = (1.0 - 0.9999) / eff
    ref = ref / ref.sum() * C
    np.testing.assert_allclose(w, ref, rtol=1e-9)
    assert w[-1] > w[0]  # rare classes get larger weights


def test_ce_loss_dispatcher(batch):
    logits, targets, weights = batch
    jl, jt, jw = jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)
    # plain == cross_entropy
    np.testing.assert_allclose(
        np.asarray(ce_loss(jl, jt, class_weights=jw, reduction="mean")),
        np.asarray(cross_entropy(jl, jt, jw, "mean")), rtol=1e-6)
    # poly dispatch uses eps=2
    np.testing.assert_allclose(
        np.asarray(ce_loss(jl, jt, class_weights=jw, reduction="mean", type_loss="poly")),
        np.asarray(poly_loss(jl, jt, epsilon=2.0, ce_weight=jw, reduction="mean")), rtol=1e-6)
