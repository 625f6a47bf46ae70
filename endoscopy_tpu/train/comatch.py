"""CoMatch trainer (reference: comatch.py:18-352).

Memory-bank graph-contrastive SSL as ONE jitted step carrying a
``CoMatchState`` pytree (queue ring buffer + distribution-alignment window)
— no Python-side mutation, so the whole 4-view path (weak, RandAugment
strong, color-jitter strong, labeled) fuses with forward/backward.

Faithfully preserved reference semantics:

- hyperparams queue_batch=5, alpha=0.9, temperature=0.2, contrast_th=0.8,
  gamma=2 (comatch.py:29-39); queue_size = queue_batch*(MU+1)*BATCH
  (comatch.py:91);
- distribution alignment over the trailing 32 batch-mean probability vectors
  (comatch.py:167-174), implemented as a fixed ring with a fill count;
- memory smoothing gated on ``epoch > 0 or batch_idx > queue_batch``
  (comatch.py:179), passed as a traced boolean so no recompiles;
- the queue-write gate ``n == queue_size`` (comatch.py:193) — with the
  default queue_batch=5 this writes only when one step's (MU+1)*B equals the
  full queue, an observed reference behavior we replicate rather than
  "fix";
- embedding-similarity graph between the two strong views' normalized
  low-dim embeddings vs the pseudo-label graph Q=probs·probsᵀ with self-loops
  and threshold (comatch.py:199-213);
- focalized unsupervised CE with gamma=2 (comatch.py:216-220);
- total = lx + LAMBDA_U*lu + LAMBDA_C*lcontrast (comatch.py:222).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug.views import comatch_views, labeled_train_view
from endoscopy_tpu.losses import ce_loss
from endoscopy_tpu.ssl_state.comatch_state import CoMatchState, comatch_state_init
from endoscopy_tpu.ssl_state.ema import ema_update
from endoscopy_tpu.train.common import BaseTrainer, apply_train, mask_grads
from endoscopy_tpu.utils.meters import AverageMeter


class CoMatch(BaseTrainer):
    trainer_name = "CoMatch"

    def _images_per_step(self) -> int:
        # 4-way concat [x, u_w, u_s0, u_s1] (comatch.py:144-154)
        return int(self.config.DATA.BATCH_SIZE) * (
            1 + 3 * int(self.config.DATA.MU))

    # fixed hyperparameters (comatch.py:29-39)
    queue_batch = 5
    alpha = 0.9
    temperature = 0.2
    contrast_th = 0.8
    gamma = 2.0

    def get_config(self, config, labeled_targets: Optional[np.ndarray] = None) -> None:
        self._setup_common(config, int(config.TRAIN.EVAL_STEP), labeled_targets)
        self.lambda_u = float(config.TRAIN.LAMBDA_U)
        self.lambda_c = float(config.TRAIN.LAMBDA_C)
        self.thres = float(config.TRAIN.THRES)
        self.low_dim = int(config.MODEL.LOW_DIM)
        self.num_classes = int(config.MODEL.NUM_CLASSES)
        self.queue_size = self.queue_batch * (int(config.DATA.MU) + 1) * int(config.DATA.BATCH_SIZE)
        if int(config.TRAIN.get("GRAD_ACCUM", 1)) > 1:
            # CoMatch's pseudo-label graph contrast is computed over the FULL
            # unlabeled batch's pairwise similarities — splitting it into
            # microbatches changes the algorithm, not just the schedule.
            # Refuse loudly rather than silently ignoring the knob.
            raise ValueError(
                "TRAIN.GRAD_ACCUM > 1 is not supported for CoMatch: the "
                "graph-contrastive loss couples the whole batch. Use it with "
                "SupLearning / FixMatch / SemiFormer, or lower BATCH_SIZE.")

        # init with the post-augmentation model input size (views crop
        # canonical -> IMG_SIZE before the model ever runs)
        self._init_state((2, self.img_size, self.img_size, 3))
        self.comatch_state = comatch_state_init(self.queue_size, self.low_dim,
                                                self.num_classes)
        self._build_eval_step()
        self._build_train_step()

    def _build_train_step(self) -> None:
        model = self.model
        tx = self.tx
        img_size = self.img_size
        dtype = self.dtype
        lambda_u, lambda_c = self.lambda_u, self.lambda_c
        thres = self.thres
        alpha, temperature = self.alpha, self.temperature
        contrast_th, gamma = self.contrast_th, self.gamma
        queue_size = self.queue_size
        num_classes = self.num_classes
        ema_decay, use_ema = self.ema_decay, self.use_ema
        grad_mask = self.grad_mask

        def pseudo_and_state(logits_u_w, feats_u_w, feats_x, targets, cstate,
                             use_queue):
            """The no-grad block (comatch.py:162-196): DA → memory smoothing
            → threshold mask → queue write. Returns (probs, mask, new_cstate)."""
            probs = jax.nn.softmax(logits_u_w, axis=-1)

            # distribution alignment over trailing-32 batch means
            da_buffer = jax.lax.dynamic_update_slice(
                cstate.da_buffer, jnp.mean(probs, axis=0)[None, :],
                (cstate.da_ptr, 0))
            da_count = jnp.minimum(cstate.da_count + 1, da_buffer.shape[0])
            da_ptr = (cstate.da_ptr + 1) % da_buffer.shape[0]
            filled = (jax.lax.broadcasted_iota(jnp.int32, da_buffer.shape, 0)
                      < da_count)
            prob_avg = jnp.sum(da_buffer * filled, axis=0) / jnp.maximum(da_count, 1)
            probs = probs / prob_avg
            probs = probs / jnp.sum(probs, axis=1, keepdims=True)

            probs_orig = probs

            # memory smoothing (comatch.py:179-182)
            A = jnp.exp(feats_u_w @ cstate.queue_feats.T / temperature)
            A = A / jnp.sum(A, axis=1, keepdims=True)
            smoothed = alpha * probs + (1 - alpha) * (A @ cstate.queue_probs)
            probs = jnp.where(use_queue, smoothed, probs)

            scores = jnp.max(probs, axis=1)
            mask = (scores >= thres).astype(jnp.float32)

            # queue write (comatch.py:187-196), gated on n == queue_size
            feats_w = jnp.concatenate([feats_u_w, feats_x], axis=0)
            onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
            probs_w = jnp.concatenate([probs_orig, onehot], axis=0)
            n = feats_w.shape[0]
            if n == queue_size:
                new_feats = jax.lax.dynamic_update_slice(
                    cstate.queue_feats, feats_w, (cstate.queue_ptr, 0))
                new_probs = jax.lax.dynamic_update_slice(
                    cstate.queue_probs, probs_w, (cstate.queue_ptr, 0))
                new_ptr = (cstate.queue_ptr + n) % queue_size
            else:
                new_feats, new_probs, new_ptr = (cstate.queue_feats,
                                                 cstate.queue_probs,
                                                 cstate.queue_ptr)

            new_cstate = CoMatchState(
                queue_feats=new_feats, queue_probs=new_probs, queue_ptr=new_ptr,
                da_buffer=da_buffer, da_ptr=da_ptr, da_count=da_count)
            return probs, mask, new_cstate

        def loss_fn(params, batch_stats, x, u_w, u_s0, u_s1, targets, weights,
                    cstate, use_queue, rng):
            bt = x.shape[0]
            btu = u_w.shape[0]
            imgs = jnp.concatenate([x, u_w, u_s0, u_s1], axis=0)
            (logits, fts, fts_low), new_bs = apply_train(
                model, params, batch_stats, imgs, rng)
            logits = logits.astype(jnp.float32)
            fts_low = fts_low.astype(jnp.float32)

            logits_x = logits[:bt]
            logits_u_w = jax.lax.stop_gradient(logits[bt:bt + btu])
            logits_u_s0 = logits[bt + btu:bt + 2 * btu]
            # features for the queue/graph are the normalized low-dim
            # embeddings (comatch.py:148 third model output)
            feats_x = jax.lax.stop_gradient(fts_low[:bt])
            feats_u_w = jax.lax.stop_gradient(fts_low[bt:bt + btu])
            feats_u_s0 = fts_low[bt + btu:bt + 2 * btu]
            feats_u_s1 = fts_low[bt + 2 * btu:]

            loss_x = ce_loss(logits_x, targets, class_weights=weights,
                             reduction="mean", type_loss="poly")

            probs, mask, new_cstate = pseudo_and_state(
                logits_u_w, feats_u_w, feats_x, targets, cstate, use_queue)
            probs = jax.lax.stop_gradient(probs)
            mask = jax.lax.stop_gradient(mask)

            # embedding similarity graph (comatch.py:200-201)
            sim = jnp.exp(feats_u_s0 @ feats_u_s1.T / temperature)
            sim_probs = sim / jnp.sum(sim, axis=1, keepdims=True)

            # pseudo-label graph with self-loop (comatch.py:204-209)
            Q = probs @ probs.T
            Q = jnp.fill_diagonal(Q, 1.0, inplace=False)
            pos_mask = (Q >= contrast_th).astype(jnp.float32)
            Q = Q * pos_mask
            Q = Q / jnp.sum(Q, axis=1, keepdims=True)

            loss_contrast = jnp.mean(
                -jnp.sum(jnp.log(sim_probs + 1e-7) * Q, axis=1))

            # focalized unsupervised CE (comatch.py:216-220)
            logp = -jnp.sum(jax.nn.log_softmax(logits_u_s0, axis=1) * probs,
                            axis=1) * mask
            p = jnp.exp(-logp)
            loss_u = jnp.mean((1 - p) ** gamma * logp)

            total = loss_x + lambda_u * loss_u + lambda_c * loss_contrast
            return total, (new_bs, new_cstate, loss_x, loss_u, loss_contrast)

        @jax.jit
        def train_step(state, cstate, x_u8, targets, u_canon_u8, weights,
                       use_queue, rng):
            k_lb, k_views, k_drop = jax.random.split(rng, 3)
            x = labeled_train_view(x_u8, k_lb, img_size, dtype)
            u_w, u_s0, u_s1 = comatch_views(u_canon_u8, k_views, img_size, dtype)

            (loss, (new_bs, new_cstate, lx, lu, lc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    state.params, state.batch_stats, x, u_w, u_s0, u_s1,
                    targets, weights, cstate, use_queue, k_drop)

            grads = mask_grads(grads, grad_mask)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt)
            if use_ema:
                new_state = new_state.replace(
                    ema_params=ema_update(state.ema_params, new_params, ema_decay),
                    ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                               ema_decay))
            return new_state, new_cstate, loss, (lx, lu, lc)

        self._train_step = train_step

        def multi_step(state, cstate, x_k, t_k, u_k, weights, use_queue_k, rng):
            """K steps per dispatch (see fixmatch.py); the CoMatch queue/DA
            state threads through the scan carry."""

            def body(carry, inp):
                st, cst, key = carry
                key, sub = jax.random.split(key)
                x_u8, t, u_u8, use_q = inp
                new_st, new_cst, loss, _ = train_step(st, cst, x_u8, t, u_u8,
                                                      weights, use_q, sub)
                return (new_st, new_cst, key), loss

            (new_state, new_cstate, _), losses = jax.lax.scan(
                body, (state, cstate, rng), (x_k, t_k, u_k, use_queue_k))
            return new_state, new_cstate, losses

        self._train_multi = jax.jit(multi_step)

    def get_dataloader(self, train_dl, valid_dl, test_dl=None) -> None:
        """train_dl = (labeled_loader, unlabeled_loader) (comatch.py:41-45)."""
        self.train_dl = train_dl
        self.valid_dl = valid_dl
        self.test_dl = test_dl

    def train_one(self, epoch: int) -> AverageMeter:
        import numpy as np

        summary_loss = AverageMeter()
        weights = self.class_weights
        if weights is None:
            weights = jnp.ones(self.num_classes, jnp.float32)
        labeled_iter = iter(self.train_dl[0])
        unlabeled_iter = iter(self.train_dl[1])
        total = int(self.config.TRAIN.EVAL_STEP)
        k = max(1, min(int(self.config.TRAIN.get("STEPS_PER_CALL", 8)), total))
        batch_idx = 0
        bs = int(self.config.DATA.BATCH_SIZE)
        pending = []  # deferred loss fetch keeps dispatch async (see fixmatch)
        while batch_idx < total:
            k_here = min(k, total - batch_idx)
            xs, ts, us, gates = [], [], [], []
            for j in range(k_here):
                x_u8, targets = next(labeled_iter)
                u_canon, _ = next(unlabeled_iter)
                xs.append(x_u8)
                ts.append(targets)
                us.append(u_canon)
                # smoothing gate (comatch.py:179)
                gates.append((epoch > 0) or (batch_idx + j > self.queue_batch))
            if k_here == k:
                self.state, self.comatch_state, losses = self._train_multi(
                    self.state, self.comatch_state,
                    *self._shard_stacked(np.stack(xs), np.stack(ts),
                                         np.stack(us)),
                    weights, jnp.asarray(gates), self._next_rng())
                pending.append(losses)
            else:
                for j in range(k_here):
                    self.state, self.comatch_state, loss, _ = self._train_step(
                        self.state, self.comatch_state,
                        *self._shard(xs[j], ts[j], us[j]), weights,
                        jnp.asarray(gates[j], bool), self._next_rng())
                    pending.append(loss)
            batch_idx += k_here
            self._drain_pending(pending, summary_loss, bs)
        self._drain_pending(pending, summary_loss, bs, keep=0)
        return summary_loss
