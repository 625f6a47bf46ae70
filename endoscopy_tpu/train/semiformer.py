"""SemiFormer trainer (reference: semiformer.py:18-269).

FixMatch variant for the dual-head Conformer. Two separately-compiled jitted
steps replace the reference's per-epoch Python branch (SURVEY.md §7: variable
phase logic must not be a traced conditional):

- warmup phase (epoch < TRAIN.EVAL_STEP_SUP): supervised CE on BOTH heads
  over the labeled loader (semiformer.py:72-100);
- FixMatch phase: concat [x, u_w, u_s]; pseudo-labels come from the CONV
  head's weak view and drive consistency losses on both the conv and trans
  strong outputs (semiformer.py:119-133); lx = ce(conv)+ce(trans), total
  lx + LAMBDA_U*(lu_conv + lu_trans).

Evaluation sums the two heads' logits before softmax/argmax and reports
ce(conv)+ce(trans) as the loss (semiformer.py:171-188).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug.views import eval_view, fixmatch_views, labeled_train_view
from endoscopy_tpu.losses import ce_loss, consistency_loss, cross_entropy
from endoscopy_tpu.ssl_state.ema import ema_update
from endoscopy_tpu.train.common import BaseTrainer, apply_train, mask_grads
from endoscopy_tpu.utils.meters import AverageMeter


class SemiFormer(BaseTrainer):
    trainer_name = "SemiFormer"

    def get_config(self, config, labeled_targets: Optional[np.ndarray] = None) -> None:
        self._setup_common(config, int(config.TRAIN.EVAL_STEP), labeled_targets)
        self.lambda_u = float(config.TRAIN.LAMBDA_U)
        self.thres = float(config.TRAIN.THRES)
        self.T = float(config.TRAIN.T)
        self.eval_step_sup = int(config.TRAIN.EVAL_STEP_SUP)
        # TRAIN.GRAD_ACCUM: microbatches per optimizer step in the FixMatch
        # phase (one averaged update; BN stats per microbatch). Same HBM-
        # pressure motivation as the FixMatch trainer — the Conformer-224
        # core measures x1.19 over its bytes floor at the full 416-image
        # batch (PERF.md round 5). The warmup phase is labeled-only (B
        # images) and never memory-bound, so it stays unsplit.
        self.grad_accum = max(1, int(config.TRAIN.get("GRAD_ACCUM", 1)))

        # init with the post-augmentation model input size (views crop
        # canonical -> IMG_SIZE before the model ever runs)
        self._init_state((2, self.img_size, self.img_size, 3))
        self._build_eval_step()
        self._build_train_steps()

    def _opt_and_ema(self, state, grads, new_bs):
        grads = mask_grads(grads, self.grad_mask)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        if self.use_ema:
            new_state = new_state.replace(
                ema_params=ema_update(state.ema_params, new_params, self.ema_decay),
                ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                           self.ema_decay))
        return new_state

    def _build_train_steps(self) -> None:
        model = self.model
        img_size, dtype = self.img_size, self.dtype
        lambda_u, thres, T = self.lambda_u, self.thres, self.T
        opt_and_ema = self._opt_and_ema

        def warmup_loss(params, batch_stats, x, targets, weights, rng):
            (out_conv, out_trans), new_bs = apply_train(model, params,
                                                        batch_stats, x, rng)
            lx_conv = ce_loss(out_conv.astype(jnp.float32), targets,
                              class_weights=weights, reduction="mean")
            lx_trans = ce_loss(out_trans.astype(jnp.float32), targets,
                               class_weights=weights, reduction="mean")
            return lx_conv + lx_trans, new_bs

        @jax.jit
        def warmup_step(state, x_u8, targets, weights, rng):
            k_aug, k_drop = jax.random.split(rng)
            x = labeled_train_view(x_u8, k_aug, img_size, dtype)
            (loss, new_bs), grads = jax.value_and_grad(
                warmup_loss, has_aux=True)(state.params, state.batch_stats, x,
                                           targets, weights, k_drop)
            return opt_and_ema(state, grads, new_bs), loss

        def fixmatch_loss(params, batch_stats, x_lb, u_w, u_s, targets,
                          weights, rng):
            bs_lb = x_lb.shape[0]
            btu = u_w.shape[0]
            inputs = jnp.concatenate([x_lb, u_w, u_s], axis=0)
            (out_conv, out_trans), new_bs = apply_train(model, params,
                                                        batch_stats, inputs, rng)
            out_conv = out_conv.astype(jnp.float32)
            out_trans = out_trans.astype(jnp.float32)
            # conv-head weak pseudo-labels drive both heads (semiformer.py:119-133)
            conv_u_w = out_conv[bs_lb:bs_lb + btu]
            conv_u_s = out_conv[bs_lb + btu:]
            trans_u_s = out_trans[bs_lb + btu:]
            lx = (ce_loss(out_conv[:bs_lb], targets, class_weights=weights,
                          reduction="mean")
                  + ce_loss(out_trans[:bs_lb], targets, class_weights=weights,
                            reduction="mean"))
            lu_conv, _ = consistency_loss(conv_u_w, conv_u_s, T=T, p_cutoff=thres)
            lu_trans, mask_mean = consistency_loss(conv_u_w, trans_u_s, T=T,
                                                   p_cutoff=thres)
            loss = lx + lambda_u * (lu_conv + lu_trans)
            return loss, (new_bs, mask_mean)

        accum = self.grad_accum

        @jax.jit
        def fixmatch_step(state, x_u8, targets, u_canon_u8, weights, rng):
            if accum == 1:
                k_lb, k_views, k_drop = jax.random.split(rng, 3)
                x_lb = labeled_train_view(x_u8, k_lb, img_size, dtype)
                u_w, u_s = fixmatch_views(u_canon_u8, k_views, img_size, dtype)
                (loss, (new_bs, _)), grads = jax.value_and_grad(
                    fixmatch_loss, has_aux=True)(
                        state.params, state.batch_stats, x_lb, u_w, u_s,
                        targets, weights, k_drop)
                return opt_and_ema(state, grads, new_bs), loss

            # GRAD_ACCUM sequential microbatches, f32 grad averaging, one
            # opt/EMA update (same scheme as FixMatch.train_step; see
            # tests/test_grad_accum.py for the pinned semantics there)
            xs = x_u8.reshape(accum, -1, *x_u8.shape[1:])
            ts = targets.reshape(accum, -1)
            us = u_canon_u8.reshape(accum, -1, *u_canon_u8.shape[1:])
            keys = jax.random.split(rng, accum)

            def micro(carry, inp):
                bs_carry, gsum, lsum = carry
                mx_u8, mt, mu_u8, key = inp
                k_lb, k_views, k_drop = jax.random.split(key, 3)
                x_lb = labeled_train_view(mx_u8, k_lb, img_size, dtype)
                u_w, u_s = fixmatch_views(mu_u8, k_views, img_size, dtype)
                (loss, (new_bs, _)), grads = jax.value_and_grad(
                    fixmatch_loss, has_aux=True)(
                        state.params, bs_carry, x_lb, u_w, u_s, mt,
                        weights, k_drop)
                gsum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads)
                return (new_bs, gsum, lsum + loss), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (new_bs, gsum, lsum), _ = jax.lax.scan(
                micro, (state.batch_stats, zeros, jnp.zeros((), jnp.float32)),
                (xs, ts, us, keys))
            grads = jax.tree.map(lambda g, p: (g / accum).astype(p.dtype),
                                 gsum, state.params)
            return opt_and_ema(state, grads, new_bs), lsum / accum

        def fixmatch_core(state, x_lb, u_w, u_s, targets, weights, rng):
            """fixmatch_step minus the view pipeline (views precomputed):
            the model-core instrument tools/profile_224_residual.py uses to
            split step time into core vs in-situ view cost. Not used by
            training; kept adjacent to fixmatch_step so the two cannot
            drift."""
            (loss, (new_bs, _)), grads = jax.value_and_grad(
                fixmatch_loss, has_aux=True)(
                    state.params, state.batch_stats, x_lb, u_w, u_s, targets,
                    weights, rng)
            return opt_and_ema(state, grads, new_bs), loss

        self._warmup_step = warmup_step
        self._fixmatch_step = fixmatch_step
        self._fixmatch_core = fixmatch_core

    def _build_eval_step(self):
        """Dual-head eval: summed logits for prediction, summed CE for loss
        (semiformer.py:171-188)."""
        model = self.model
        img_size, dtype = self.img_size, self.dtype

        @jax.jit
        def eval_step(params, batch_stats, batch_u8, targets, mask):
            x = eval_view(batch_u8, img_size, dtype)
            out_conv, out_trans = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False)
            out_conv = out_conv.astype(jnp.float32)
            out_trans = out_trans.astype(jnp.float32)
            ce = (cross_entropy(out_conv, targets, reduction="none")
                  + cross_entropy(out_trans, targets, reduction="none"))
            m = mask.astype(jnp.float32)
            probs = jax.nn.softmax(out_conv + out_trans, axis=-1)
            return jnp.sum(ce * m), jnp.sum(m), probs

        self._eval_step = eval_step

    def get_dataloader(self, train_dl, valid_dl, test_dl=None) -> None:
        self.train_dl = train_dl
        self.valid_dl = valid_dl
        self.test_dl = test_dl

    def train_one(self, epoch: int) -> AverageMeter:
        summary_loss = AverageMeter()
        weights = self.class_weights
        if weights is None:
            weights = jnp.ones(int(self.config.MODEL.NUM_CLASSES), jnp.float32)
        labeled_iter = iter(self.train_dl[0])
        bs = int(self.config.DATA.BATCH_SIZE)
        pending = []  # deferred loss fetch keeps dispatch async (see fixmatch)
        if epoch < self.eval_step_sup:
            # supervised warmup sweeps the labeled set once (semiformer.py:72-76)
            n = max(len(self.train_dl[0].manifest)
                    // int(self.config.DATA.BATCH_SIZE), 1)
            for _ in range(n):
                x_u8, targets = next(labeled_iter)
                self.state, loss = self._warmup_step(
                    self.state, *self._shard(x_u8, targets), weights,
                    self._next_rng())
                pending.append(loss)
                self._drain_pending(pending, summary_loss, bs, keep=8)
        else:
            unlabeled_iter = iter(self.train_dl[1])
            for _ in range(int(self.config.TRAIN.EVAL_STEP)):
                x_u8, targets = next(labeled_iter)
                u_canon, _ = next(unlabeled_iter)
                self.state, loss = self._fixmatch_step(
                    self.state, *self._shard(x_u8, targets, u_canon), weights,
                    self._next_rng())
                pending.append(loss)
                self._drain_pending(pending, summary_loss, bs, keep=8)
        self._drain_pending(pending, summary_loss, bs, keep=0)
        return summary_loss
