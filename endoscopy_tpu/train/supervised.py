"""Supervised trainer (reference: supervised.py:23-364, class SupLearning).

Branches, replicated as separately-compiled jitted steps (no traced Python
conditionals, SURVEY.md §7 hard parts):

- plain: weighted CE on logits (supervised.py:121-125);
- triplet (MODEL.IS_TRIPLET): concat anchor/pos/neg through ModelwEmb,
  triplet loss on pooled features + poly-CE on anchor logits, total
  ce + LAMBDA_C * triplet (supervised.py:84-108);
- margin (MODEL.MARGIN != 'None'): angular-penalty loss on backbone features
  against the bias-free fc kernel (supervised.py:117-119).

Host-side epoch logic kept: RDW deferred re-weighting after epoch 25
(supervised.py:324-331, class weights are a step argument so no recompile),
early stop after 5 non-improving evals, checkpoint gating on valid loss AND
macro-F1 (supervised.py:344-358).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug.views import labeled_train_view, reproduce_train_view
from endoscopy_tpu.config.loader import is_none
from endoscopy_tpu.losses import (
    angular_penalty_loss,
    ce_loss,
    rdw_weights,
    triplet_loss,
)
from endoscopy_tpu.ssl_state.ema import ema_update
from endoscopy_tpu.train.common import (
    BaseTrainer,
    apply_train,
    mask_grads,
    model_logits,
)
from endoscopy_tpu.utils.meters import AverageMeter


class SupLearning(BaseTrainer):
    _supports_reprod = True  # DATA.IS_REPROD (reproduce_transform) wired

    trainer_name = "SupLearning"

    def get_config(self, config, cls_num_list: Optional[list] = None,
                   labeled_targets: Optional[np.ndarray] = None) -> None:
        n_iter = len(getattr(self.train_dl, "manifest", [])) // int(config.DATA.BATCH_SIZE) or 1
        self._setup_common(config, n_iter, labeled_targets)
        self.n_iter_per_epoch = n_iter
        self.cls_num_list = cls_num_list
        self.lambda_c = float(config.TRAIN.LAMBDA_C)
        self.is_triplet = bool(config.MODEL.IS_TRIPLET)
        self.margin = None if is_none(config.MODEL.MARGIN) else str(config.MODEL.MARGIN)
        # timm-Mixup capability (reference ships it disabled,
        # dataset.py:322-330; knobs live in every config)
        self.mixup_active = (float(config.TRAIN.get("MIXUP", 0.0)) > 0
                             or float(config.TRAIN.get("CUTMIX", 0.0)) > 0)
        # TRAIN.GRAD_ACCUM > 1: sequential microbatches, one optimizer/EMA
        # update on the f32-averaged grads (same semantics as fixmatch.py).
        # For the triplet branch the anchor/pos/neg blocks are split
        # per-microbatch so every micro sees matched A/P/N triples.
        self.grad_accum = max(1, int(config.TRAIN.get("GRAD_ACCUM", 1)))

        # init with the post-augmentation model input size (views crop
        # canonical -> IMG_SIZE before the model ever runs)
        self._init_state((2, self.img_size, self.img_size, 3))
        self._build_eval_step()
        self._build_train_step()

    # ------------------------------------------------------------------

    def _build_train_step(self) -> None:
        model = self.model
        tx = self.tx
        img_size = self.img_size
        dtype = self.dtype
        ema_decay = self.ema_decay
        use_ema = self.use_ema
        grad_mask = self.grad_mask
        is_triplet = self.is_triplet
        margin = self.margin
        lambda_c = self.lambda_c

        mixup_active = self.mixup_active
        mixup_kw = dict(
            num_classes=int(self.config.MODEL.NUM_CLASSES),
            mixup_alpha=float(self.config.TRAIN.get("MIXUP", 0.0)),
            cutmix_alpha=float(self.config.TRAIN.get("CUTMIX", 0.0)),
            prob=float(self.config.TRAIN.get("MIXUP_PROB", 1.0)),
            switch_prob=float(self.config.TRAIN.get("MIXUP_SWITCH_PROB", 0.5)),
            label_smoothing=float(self.config.TRAIN.get("LABEL_SMOOTHING", 0.1)))

        def loss_plain(params, batch_stats, x, targets, weights, rng):
            if mixup_active:
                from endoscopy_tpu.aug.mixup import mixup_cutmix
                from endoscopy_tpu.losses import soft_ce_loss

                k_mix, rng = jax.random.split(rng)
                x, soft = mixup_cutmix(x, targets, k_mix, **mixup_kw)
                out, new_bs = apply_train(model, params, batch_stats, x, rng)
                logits = model_logits(model, out).astype(jnp.float32)
                return jnp.mean(soft_ce_loss(logits, soft)), new_bs
            out, new_bs = apply_train(model, params, batch_stats, x, rng)
            logits = model_logits(model, out).astype(jnp.float32)
            loss = ce_loss(logits, targets, class_weights=weights, reduction="mean")
            return loss, new_bs

        def loss_margin(params, batch_stats, x, targets, weights, rng):
            # supervised.py:117-119: backbone features + angular-penalty loss
            # against the bias-free fc kernel (model.fc weights).
            fts, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
                method=model.features)
            kernel = params["head"]["fc"]["kernel"]
            loss = angular_penalty_loss(fts.astype(jnp.float32), targets,
                                        kernel.astype(jnp.float32),
                                        loss_type=margin, cls_weight=weights)
            return loss, mut["batch_stats"]

        def loss_triplet_fn(params, batch_stats, x3, targets, weights, rng):
            # x3: (3B, H, W, C) anchors/pos/neg (supervised.py:84-90)
            out, new_bs = apply_train(model, params, batch_stats, x3, rng)
            logits, fts, _ = out
            bs = x3.shape[0] // 3
            anchor_logits = logits[:bs].astype(jnp.float32)
            anchor_fts = fts[:bs]
            pos_fts = fts[bs:2 * bs]
            neg_fts = fts[2 * bs:]
            tl, d_ap, d_an = triplet_loss(anchor_fts, pos_fts, neg_fts, alpha=0.7)
            cl = ce_loss(anchor_logits, targets, class_weights=weights,
                         reduction="mean", type_loss="poly")
            return cl + lambda_c * tl, (new_bs, d_ap, d_an)

        # paper-reproduction aug (dataset.py:111-132) when DATA.IS_REPROD;
        # the reference reaches it via get_transform(is_reprod=True)
        train_view = (reproduce_train_view
                      if bool(self.config.DATA.get("IS_REPROD", False))
                      else labeled_train_view)

        def grads_and_aux(params, batch_stats, x, targets, weights, k_drop):
            """fwd+bwd of whichever loss branch is active; aux is the
            branch-specific scalar tuple ((d_ap, d_an) for triplet)."""
            if is_triplet:
                (loss, (new_bs, d_ap, d_an)), grads = jax.value_and_grad(
                    loss_triplet_fn, has_aux=True)(
                        params, batch_stats, x, targets, weights, k_drop)
                return grads, new_bs, loss, (d_ap, d_an)
            loss_fn = loss_margin if margin is not None else loss_plain
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, x, targets, weights, k_drop)
            return grads, new_bs, loss, ()

        def apply_grads(state, grads, new_bs):
            """Optimizer + schedule + EMA on already-computed gradients."""
            grads = mask_grads(grads, grad_mask)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt)
            if use_ema:
                new_state = new_state.replace(
                    ema_params=ema_update(state.ema_params, new_params, ema_decay),
                    ema_batch_stats=ema_update(state.ema_batch_stats, new_bs, ema_decay))
            return new_state

        accum = self.grad_accum
        n_aux = 2 if is_triplet else 0

        @jax.jit
        def train_step(state, batch_u8, targets, weights, rng):
            if accum == 1:
                k_aug, k_drop = jax.random.split(rng)
                x = train_view(batch_u8, k_aug, img_size, dtype)
                grads, new_bs, loss, aux = grads_and_aux(
                    state.params, state.batch_stats, x, targets, weights,
                    k_drop)
                return apply_grads(state, grads, new_bs), loss, aux

            # GRAD_ACCUM microbatches (see fixmatch.py for the TPU
            # motivation): sequential view+fwd+bwd on 1/accum of the batch,
            # f32 grad accumulation, ONE optimizer/EMA update on the mean.
            # The triplet batch is laid out [anchors(B); pos(B); neg(B)]
            # (supervised.py:84-90) — split each block so microbatch i gets
            # matched (A_i, P_i, N_i), not an arbitrary 3B/accum slice.
            if is_triplet:
                three = batch_u8.reshape(3, accum, -1, *batch_u8.shape[1:])
                xs = jnp.swapaxes(three, 0, 1).reshape(
                    accum, -1, *batch_u8.shape[1:])
            else:
                xs = batch_u8.reshape(accum, -1, *batch_u8.shape[1:])
            ts = targets.reshape(accum, -1)
            keys = jax.random.split(rng, accum)

            def micro(carry, inp):
                bs_carry, gsum, lsum, auxsum = carry
                x_u8, t, key = inp
                k_aug, k_drop = jax.random.split(key)
                x = train_view(x_u8, k_aug, img_size, dtype)
                grads, new_bs, loss, aux = grads_and_aux(
                    state.params, bs_carry, x, t, weights, k_drop)
                gsum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads)
                auxsum = tuple(a + v for a, v in zip(auxsum, aux))
                return (new_bs, gsum, lsum + loss, auxsum), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            init = (state.batch_stats, zeros, jnp.zeros((), jnp.float32),
                    (jnp.zeros((), jnp.float32),) * n_aux)
            (new_bs, gsum, lsum, auxsum), _ = jax.lax.scan(
                micro, init, (xs, ts, keys))
            grads = jax.tree.map(lambda g, p: (g / accum).astype(p.dtype),
                                 gsum, state.params)
            new_state = apply_grads(state, grads, new_bs)
            return new_state, lsum / accum, tuple(a / accum for a in auxsum)

        self._train_step = train_step

        def multi_step(state, x_k, targets_k, weights, rng):
            """K steps per dispatch via lax.scan (see fixmatch.py)."""

            def body(carry, inp):
                st, key = carry
                key, sub = jax.random.split(key)
                x_u8, t = inp
                new_st, loss, aux = train_step(st, x_u8, t, weights, sub)
                return (new_st, key), (loss, aux)

            (new_state, _), (losses, auxs) = jax.lax.scan(body, (state, rng),
                                                          (x_k, targets_k))
            return new_state, losses, auxs

        self._train_multi = jax.jit(multi_step)

    def _build_triplet_batch(self, batch_u8, targets):
        """Host-side triplet sampling (dataset.py:279-306 rejection sampling
        → here: same-class positive, different-class negative drawn through
        the loader's random-access ``sample(indices)`` protocol — works for
        cached, streaming, and native loaders alike)."""
        loader = self.train_dl
        if not hasattr(loader, "sample"):
            raise TypeError(
                f"MODEL.IS_TRIPLET requires a loader with sample(indices); "
                f"{type(loader).__name__} has none")
        t = np.asarray(loader.manifest.targets)
        rng = getattr(loader, "rng", None)
        if rng is None:
            rng = self._triplet_rng = getattr(
                self, "_triplet_rng", np.random.default_rng(0))
        pos_idx = np.empty(len(targets), np.int64)
        neg_idx = np.empty(len(targets), np.int64)
        for i, y in enumerate(targets):
            same = np.nonzero(t == y)[0]
            diff = np.nonzero(t != y)[0]
            pos_idx[i] = rng.choice(same)
            neg_idx[i] = rng.choice(diff)
        # one sample() call for both roles: the native loader spins up a
        # transient decode core per call, so halve that per-step overhead
        both = loader.sample(np.concatenate([pos_idx, neg_idx]))
        return np.concatenate([batch_u8, both], axis=0)

    def train_one(self, epoch: int) -> AverageMeter:
        summary_loss = AverageMeter()
        # RDW deferred re-weighting (supervised.py:324-331)
        weights = self.class_weights
        if self.config.TRAIN.get("TRAIN_RULE") == "RDW" and self.cls_num_list:
            weights = jnp.asarray(rdw_weights(epoch, self.cls_num_list), jnp.float32)
        if weights is None:
            weights = jnp.ones(int(self.config.MODEL.NUM_CLASSES), jnp.float32)

        it = iter(self.train_dl)
        total = self.n_iter_per_epoch
        k = max(1, min(int(self.config.TRAIN.get("STEPS_PER_CALL", 8)), total))
        done = 0
        bs = int(self.config.DATA.BATCH_SIZE)
        pending = []  # un-fetched device losses (dispatch stays async; the
        # host preps batch N+1 while the device runs N; 2-dispatch window)
        last_aux = None
        last_aux_multi = False
        while done < total:
            k_here = min(k, total - done)
            xs, ts = [], []
            for _ in range(k_here):
                batch_u8, targets = next(it)
                if self.is_triplet:
                    batch_u8 = self._build_triplet_batch(batch_u8, targets)
                xs.append(batch_u8)
                ts.append(targets)
            if k_here == k:
                self.state, losses, aux = self._train_multi(
                    self.state, *self._shard_stacked(np.stack(xs), np.stack(ts)),
                    weights, self._next_rng())
                pending.append(losses)
                last_aux, last_aux_multi = aux, True
            else:
                for batch_u8, targets in zip(xs, ts):
                    self.state, loss, aux = self._train_step(
                        self.state, *self._shard(batch_u8, targets), weights,
                        self._next_rng())
                    pending.append(loss)
                    last_aux, last_aux_multi = aux, False
            done += k_here
            self._drain_pending(pending, summary_loss, bs)
        self._drain_pending(pending, summary_loss, bs, keep=0)
        if self.is_triplet and last_aux is not None:
            # last step's distances (supervised.py:141-144)
            self._last_triplet_dist = tuple(
                np.asarray(a)[-1] if last_aux_multi else np.asarray(a)
                for a in last_aux)
        # triplet-distance histogram every 5 epochs (supervised.py:141-144)
        if self.is_triplet and epoch % 5 == 0 and \
                getattr(self, "_last_triplet_dist", None) is not None:
            self._log_triplet_dist(epoch)
        return summary_loss

    def _log_triplet_dist(self, epoch: int) -> None:
        from endoscopy_tpu.eval.visualize import show_triplet_dist

        d_ap, d_an = self._last_triplet_dist
        log_dir = self.config.TRAIN.get("LOG_DIR")
        save = (f"{log_dir}/triplet_dist_epoch{epoch}.png" if log_dir else None)
        show_triplet_dist(d_ap=d_ap, d_an=d_an, save_path=save)
        self._metric_logger().log(
            {"triplet/d_ap_mean": float(np.mean(d_ap)),
             "triplet/d_an_mean": float(np.mean(d_an))}, epoch=epoch)

    def _images_per_step(self) -> int:
        # triplet concatenates anchor/pos/neg (supervised.py:84-90)
        bs = int(self.config.DATA.BATCH_SIZE)
        return 3 * bs if self.is_triplet else bs

    # fit with early stop + loss∧F1 checkpoint gate (supervised.py:316-364)
    def fit(self) -> None:
        if (getattr(self, "_resumed", False)
                and self.epoch_start == int(self.config.TRAIN.EPOCHS)):
            # resume at the final epoch: evaluate only (fixmatch.py:238-241;
            # the reference's supervised loop simply falls through empty)
            valid_loss, valid_metric = self.evaluate_one()
            print(f"\tValid Loss: {valid_loss.avg:.3f}")
            print(f"\tMetric: {valid_metric}")
            return
        count_early_stop = 0
        self.best_valid_loss = None
        self.best_valid_score = None
        for epoch in range(self.epoch_start, int(self.config.TRAIN.EPOCHS) + 1):
            if count_early_stop > 5:
                print("Early stopping")
                break
            self.epoch = epoch
            train_loss = self.train_one(epoch)
            print(f"Epoch {epoch} | Train Loss: {train_loss.avg:.3f}")
            saved_this_epoch = False
            if epoch % int(self.config.TRAIN.FREQ_EVAL) == 0:
                valid_loss, valid_metric = self.evaluate_one()
                f1 = float(valid_metric["macro/f1"])
                if self.best_valid_loss is not None and self.best_valid_score is not None:
                    if self.best_valid_loss > valid_loss.avg and self.best_valid_score < f1:
                        self.best_valid_loss = valid_loss.avg
                        self.best_valid_score = f1
                        if self.config.TRAIN.get("SAVE_CP"):
                            self.save_checkpoint(self.config.TRAIN.SAVE_CP)
                            saved_this_epoch = True
                    elif self.best_valid_loss < valid_loss.avg or self.best_valid_score > f1:
                        count_early_stop += 1
                else:
                    self.best_valid_loss = valid_loss.avg
                    self.best_valid_score = f1
                    if self.config.TRAIN.get("SAVE_CP"):
                        self.save_checkpoint(self.config.TRAIN.SAVE_CP)
                        saved_this_epoch = True
                print(f"\tValid Loss: {valid_loss.avg:.3f} | macro-F1: {f1:.4f}")
            if self._preempt_break(epoch, saved_this_epoch):
                break
        from endoscopy_tpu.ckpt import orbax_io
        orbax_io.wait_until_finished()  # saves durable before fit() returns
