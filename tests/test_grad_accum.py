"""TRAIN.GRAD_ACCUM: microbatched FixMatch step equivalence + smoke.

Round-5 TPU finding (PERF.md): at 224px the 480-image activation set
overflows HBM, XLA force-remats early convs, and the core runs x1.23 over
its bytes floor; GRAD_ACCUM=2 halves the live working set (x1.05 at half
batch). These tests pin the SEMANTICS of the accumulation path: same
effective optimizer batch, averaged gradients, one optimizer/EMA update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.models import build_model
from endoscopy_tpu.train import fixmatch as fixmatch_mod
from endoscopy_tpu.train.fixmatch import FixMatch

IMG = 32
B, MU = 8, 2


def _cfg(accum: int):
    cfg = default_config()
    cfg.DATA.IMG_SIZE = IMG
    cfg.DATA.BATCH_SIZE = B
    cfg.DATA.MU = MU
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.EVAL_STEP = 2
    cfg.TRAIN.GRAD_ACCUM = accum
    return cfg


def _trainer(accum: int) -> FixMatch:
    cfg = _cfg(accum)
    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(4))
    return trainer


def _batches(seed: int = 0):
    rng = np.random.default_rng(seed)
    size = IMG  # canonical == IMG here (IS_CROP default path in tests)
    x = jnp.asarray(rng.integers(0, 256, (B, size, size, 3)), jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 256, (B * MU, size, size, 3)), jnp.uint8)
    return x, t, u


def test_accum_smoke_trains():
    """accum=2 step runs, returns finite loss, and advances exactly one
    optimizer step (state.step +1 per train_step regardless of accum)."""
    trainer = _trainer(2)
    x, t, u = _batches()
    weights = jnp.ones(4, jnp.float32)
    step0 = int(trainer.state.step)
    state, loss, aux = trainer._train_step(
        trainer.state, x, t, u, weights, trainer._next_rng())
    assert np.isfinite(float(loss))
    assert int(state.step) == step0 + 1
    assert len(aux) == 3 and all(np.isfinite(float(a)) for a in aux)


def test_accum_equals_single_on_duplicated_microbatches(monkeypatch):
    """With views patched to a deterministic identity and the batch built as
    two IDENTICAL microbatches, accumulation must reproduce the accum=1
    update exactly: both microbatches yield the same gradient, whose mean
    equals the full duplicated batch's gradient (mean-of-means over equal
    halves), and BN batch statistics of each half equal those of the
    duplicated whole. Pure plumbing check of split/average/single-apply —
    no randomness left in the step."""

    def det_labeled(batch_u8, key, img_size, dtype=jnp.float32):
        x = batch_u8.astype(dtype)
        from endoscopy_tpu.aug.views import normalize
        return normalize(x, dtype)

    def det_views(batch_u8, key, img_size, dtype=jnp.float32):
        w = det_labeled(batch_u8, key, img_size, dtype)
        return w, w + 0.01  # strong view deterministic, slightly different

    monkeypatch.setattr(fixmatch_mod, "labeled_train_view", det_labeled)
    monkeypatch.setattr(fixmatch_mod, "fixmatch_views", det_views)

    rng = np.random.default_rng(3)
    half_x = rng.integers(0, 256, (B // 2, IMG, IMG, 3)).astype(np.uint8)
    half_t = rng.integers(0, 4, (B // 2,)).astype(np.int32)
    half_u = rng.integers(0, 256, (B * MU // 2, IMG, IMG, 3)).astype(np.uint8)
    x = jnp.asarray(np.concatenate([half_x, half_x]))
    t = jnp.asarray(np.concatenate([half_t, half_t]))
    u = jnp.asarray(np.concatenate([half_u, half_u]))
    weights = jnp.ones(4, jnp.float32)
    key = jax.random.key(7)

    t1 = _trainer(1)
    t2 = _trainer(2)
    # identical initial states (same seed init inside get_config)
    chex_params = jax.tree.map(np.asarray, t1.state.params)
    jax.tree.map(np.testing.assert_array_equal, chex_params,
                 jax.tree.map(np.asarray, t2.state.params))

    s1, loss1, _ = t1._train_step(t1.state, x, t, u, weights, key)
    s2, loss2, _ = t2._train_step(t2.state, x, t, u, weights, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=2e-4, atol=2e-6)


def test_accum_requires_divisible_batch():
    """Batch not divisible by GRAD_ACCUM must fail loudly at trace time
    (reshape error), not silently drop samples."""
    trainer = _trainer(3)  # B=8 not divisible by 3
    x, t, u = _batches()
    weights = jnp.ones(4, jnp.float32)
    with pytest.raises(Exception):
        trainer._train_step(trainer.state, x, t, u, weights,
                            trainer._next_rng())


def _sup_trainer(accum: int, *, triplet: bool = False, margin: str = None):
    # SGD, not Adam: the equivalence property compares parameter UPDATES,
    # and Adam's first-step update is ~±lr·sign(g) — an epsilon-level
    # summation-order difference on a near-zero gradient flips the sign.
    # SGD is linear in the gradient, so fp reassociation stays epsilon-level.
    from endoscopy_tpu.train.supervised import SupLearning

    cfg = _cfg(accum)
    cfg.MODEL.IS_TRIPLET = triplet
    if margin is not None:
        cfg.MODEL.MARGIN = margin
    trainer = SupLearning(model=build_model(cfg), opt_func="SGD")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(4))
    return trainer


def test_supervised_accum_equals_single_on_duplicated_microbatches(monkeypatch):
    """SupLearning plain branch: same plumbing property as FixMatch —
    deterministic views + two identical microbatches must reproduce the
    accum=1 update exactly."""
    from endoscopy_tpu.train import supervised as sup_mod

    def det_labeled(batch_u8, key, img_size, dtype=jnp.float32):
        from endoscopy_tpu.aug.views import normalize
        return normalize(batch_u8.astype(dtype), dtype)

    monkeypatch.setattr(sup_mod, "labeled_train_view", det_labeled)

    rng = np.random.default_rng(5)
    half_x = rng.integers(0, 256, (B // 2, IMG, IMG, 3)).astype(np.uint8)
    half_t = rng.integers(0, 4, (B // 2,)).astype(np.int32)
    x = jnp.asarray(np.concatenate([half_x, half_x]))
    t = jnp.asarray(np.concatenate([half_t, half_t]))
    weights = jnp.ones(4, jnp.float32)
    key = jax.random.key(11)

    t1 = _sup_trainer(1)
    t2 = _sup_trainer(2)
    s1, loss1, _ = t1._train_step(t1.state, x, t, weights, key)
    s2, loss2, _ = t2._train_step(t2.state, x, t, weights, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=2e-4, atol=2e-6)


def test_supervised_triplet_accum_preserves_apn_blocks(monkeypatch):
    """Triplet branch: the (3B,...) [A;P;N] layout must be split so each
    microbatch gets matched (A_i, P_i, N_i). With deterministic views and
    duplicated halves in EACH block, accum=2 must equal accum=1 exactly —
    this fails if the batch were naively reshaped into 3B/accum slices
    (micro 0 would see only anchors).

    The ModelwEmb 'complex' head carries Dropout(0.2) (heads.py:32), which
    draws a different mask per batch position and per microbatch key —
    correct training behavior, but it breaks exact split/average
    equivalence, so the test stubs it to identity."""
    from endoscopy_tpu.models import heads as heads_mod
    from endoscopy_tpu.train import supervised as sup_mod

    def det_labeled(batch_u8, key, img_size, dtype=jnp.float32):
        from endoscopy_tpu.aug.views import normalize
        return normalize(batch_u8.astype(dtype), dtype)

    monkeypatch.setattr(sup_mod, "labeled_train_view", det_labeled)
    monkeypatch.setattr(heads_mod.nn, "Dropout",
                        lambda rate, deterministic=None: (lambda x: x))

    rng = np.random.default_rng(9)
    blocks = []
    for _ in range(3):  # anchors, positives, negatives
        half = rng.integers(0, 256, (B // 2, IMG, IMG, 3)).astype(np.uint8)
        blocks.append(np.concatenate([half, half]))
    x3 = jnp.asarray(np.concatenate(blocks))  # (3B,...) duplicated halves
    half_t = rng.integers(0, 4, (B // 2,)).astype(np.int32)
    t = jnp.asarray(np.concatenate([half_t, half_t]))
    weights = jnp.ones(4, jnp.float32)
    key = jax.random.key(13)

    t1 = _sup_trainer(1, triplet=True)
    t2 = _sup_trainer(2, triplet=True)
    s1, loss1, aux1 = t1._train_step(t1.state, x3, t, weights, key)
    s2, loss2, aux2 = t2._train_step(t2.state, x3, t, weights, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    np.testing.assert_allclose(float(aux1[0]), float(aux2[0]), rtol=2e-5)
    np.testing.assert_allclose(float(aux1[1]), float(aux2[1]), rtol=2e-5)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=2e-4, atol=2e-6)


def test_comatch_ezbm_refuse_grad_accum():
    """Full-batch-coupled trainers must refuse GRAD_ACCUM>1 loudly, not
    silently train without accumulation."""
    from endoscopy_tpu.train.comatch import CoMatch
    from endoscopy_tpu.train.ezbm import EZBM

    for cls in (CoMatch, EZBM):
        cfg = _cfg(2)
        trainer = cls(model=build_model(cfg), opt_func="Adam")
        trainer.train_dl = trainer.valid_dl = None
        with pytest.raises(ValueError, match="GRAD_ACCUM"):
            trainer.get_config(cfg, labeled_targets=np.arange(4))


@pytest.mark.slow
def test_semiformer_accum_smoke_trains():
    """SemiFormer fixmatch-phase GRAD_ACCUM=2: runs, finite loss, one
    optimizer step (warmup phase is intentionally unsplit). Slow tier:
    Conformer-Ti compile alone is minutes on the 1-core host."""
    from endoscopy_tpu.train.semiformer import SemiFormer

    cfg = _cfg(2)
    cfg.MODEL.NAME = "conformer"
    cfg.MODEL.TYPE_SEMI = "SemiFormer"
    trainer = SemiFormer(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(4))
    x, t, u = _batches()
    weights = jnp.ones(4, jnp.float32)
    step0 = int(trainer.state.step)
    state, loss = trainer._fixmatch_step(
        trainer.state, x, t, u, weights, trainer._next_rng())
    assert np.isfinite(float(loss))
    assert int(state.step) == step0 + 1
