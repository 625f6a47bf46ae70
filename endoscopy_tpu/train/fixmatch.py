"""FixMatch trainer (reference: fixmatch.py:19-262).

One jitted step fuses the whole dual-view path (the BASELINE.json north-star
metric): on-device weak+strong view generation from ONE canonical unlabeled
uint8 batch, the concat forward over ``[x_lb, u_weak, u_strong]``
(fixmatch.py:107-112), poly-CE on labeled logits (fixmatch.py:114), masked
consistency loss (fixmatch.py:116 → loss.py:150-164), total
``lx + LAMBDA_U * lu`` (fixmatch.py:118), optimizer + schedule step, and the
EMA teacher update (fixmatch.py:126-127). Epochs are fixed EVAL_STEP
iterations recycling both loaders (fixmatch.py:89-100) — the loaders here are
infinite reshuffling streams, so shapes never change and one XLA program
serves the run.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug.views import fixmatch_views, labeled_train_view
from endoscopy_tpu.losses import ce_loss, consistency_loss
from endoscopy_tpu.ssl_state.ema import ema_update
from endoscopy_tpu.train.common import (
    BaseTrainer,
    apply_train,
    mask_grads,
    model_logits,
)
from endoscopy_tpu.utils.meters import AverageMeter


class FixMatch(BaseTrainer):
    trainer_name = "FixMatch"

    def get_config(self, config, labeled_targets: Optional[np.ndarray] = None) -> None:
        self._setup_common(config, int(config.TRAIN.EVAL_STEP), labeled_targets)
        self.lambda_u = float(config.TRAIN.LAMBDA_U)
        self.thres = float(config.TRAIN.THRES)
        self.T = float(config.TRAIN.T)
        # TRAIN.GRAD_ACCUM > 1 splits each step into that many sequential
        # microbatches with one optimizer/EMA update on the averaged grads.
        # TPU-native motivation (PERF.md round 5): at 224px the full
        # 480-image activation set exceeds what HBM holds for the backward,
        # so XLA force-rematerializes early convs and bandwidth efficiency
        # drops (core x1.23 over its bytes floor at B=32 vs x1.05 at B=16);
        # halving the live working set recovers it. Semantics: optimizer
        # sees the same effective batch; BN batch statistics are computed
        # per microbatch (240 vs 480 samples — second-order) and running
        # stats update once per microbatch, like two smaller steps.
        self.grad_accum = max(1, int(config.TRAIN.get("GRAD_ACCUM", 1)))

        # init with the post-augmentation model input size (views crop
        # canonical -> IMG_SIZE before the model ever runs)
        self._init_state((2, self.img_size, self.img_size, 3))
        self._build_eval_step()
        self._build_train_step()

    def _build_train_step(self) -> None:
        model = self.model
        tx = self.tx
        img_size = self.img_size
        dtype = self.dtype
        lambda_u = self.lambda_u
        thres = self.thres
        T = self.T
        ema_decay = self.ema_decay
        use_ema = self.use_ema
        grad_mask = self.grad_mask

        def loss_fn(params, batch_stats, x_lb, u_weak, u_strong, targets,
                    weights, rng):
            bs_lb = x_lb.shape[0]
            btu = u_weak.shape[0]
            # single concat forward (fixmatch.py:107-109)
            inputs = jnp.concatenate([x_lb, u_weak, u_strong], axis=0)
            out, new_bs = apply_train(model, params, batch_stats, inputs, rng)
            logits = model_logits(model, out).astype(jnp.float32)
            logits_x = logits[:bs_lb]
            logits_u_w = logits[bs_lb:bs_lb + btu]
            logits_u_s = logits[bs_lb + btu:]

            lx = ce_loss(logits_x, targets, class_weights=weights,
                         reduction="mean", type_loss="poly")
            lu, mask_mean = consistency_loss(logits_u_w, logits_u_s,
                                             T=T, p_cutoff=thres)
            loss = lx + lambda_u * lu
            return loss, (new_bs, lx, lu, mask_mean)

        def grads_and_aux(params, batch_stats, x_lb, u_weak, u_strong,
                          targets, weights, k_drop):
            (loss, (new_bs, lx, lu, mask_mean)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, x_lb, u_weak,
                                       u_strong, targets, weights, k_drop)
            return grads, new_bs, loss, (lx, lu, mask_mean)

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
                    ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                               ema_decay))
            return new_state

        def train_core(state, x_lb, u_weak, u_strong, targets, weights,
                       k_drop):
            """Everything after view building: fwd+bwd, optimizer, EMA.
            Split out so tools/profile_224_residual.py can time/cost the
            model core with views precomputed — the HLO of train_step is
            unchanged (views feed straight into this inline)."""
            grads, new_bs, loss, aux = grads_and_aux(
                state.params, state.batch_stats, x_lb, u_weak, u_strong,
                targets, weights, k_drop)
            return apply_grads(state, grads, new_bs), loss, aux

        self._train_core = train_core
        accum = self.grad_accum

        @jax.jit
        def train_step(state, x_lb_u8, targets, u_canon_u8, weights, rng):
            if accum == 1:
                k_lb, k_views, k_drop = jax.random.split(rng, 3)
                # all three views on device from two canonical uint8 batches
                x_lb = labeled_train_view(x_lb_u8, k_lb, img_size, dtype)
                u_weak, u_strong = fixmatch_views(u_canon_u8, k_views,
                                                  img_size, dtype)
                return train_core(state, x_lb, u_weak, u_strong, targets,
                                  weights, k_drop)

            # GRAD_ACCUM microbatches: sequential view+fwd+bwd on 1/accum of
            # the batch (shrinks the live activation set XLA must hold or
            # remat), f32 grad accumulation, ONE optimizer/EMA update on the
            # mean. batch_stats thread through microbatches sequentially.
            xs = x_lb_u8.reshape(accum, -1, *x_lb_u8.shape[1:])
            ts = targets.reshape(accum, -1)
            us = u_canon_u8.reshape(accum, -1, *u_canon_u8.shape[1:])
            keys = jax.random.split(rng, accum)

            def micro(carry, inp):
                bs_carry, gsum, lsum, auxsum = carry
                x_u8, t, u_u8, key = inp
                k_lb, k_views, k_drop = jax.random.split(key, 3)
                x = labeled_train_view(x_u8, k_lb, img_size, dtype)
                u_w, u_s = fixmatch_views(u_u8, k_views, img_size, dtype)
                grads, new_bs, loss, aux = grads_and_aux(
                    state.params, bs_carry, x, u_w, u_s, t, weights, k_drop)
                gsum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads)
                auxsum = jax.tree.map(lambda a, v: a + v, auxsum,
                                      tuple(aux))
                return (new_bs, gsum, lsum + loss, auxsum), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            init = (state.batch_stats, zeros, jnp.zeros((), jnp.float32),
                    (jnp.zeros((), jnp.float32),) * 3)
            (new_bs, gsum, lsum, auxsum), _ = jax.lax.scan(
                micro, init, (xs, ts, us, keys))
            grads = jax.tree.map(lambda g, p: (g / accum).astype(p.dtype),
                                 gsum, state.params)
            new_state = apply_grads(state, grads, new_bs)
            aux = tuple(a / accum for a in auxsum)
            return new_state, lsum / accum, aux

        self._train_step = train_step

        def multi_step(state, x_lb_u8_k, targets_k, u_canon_u8_k, weights, rng):
            """K steps per dispatch via lax.scan — amortizes host-dispatch
            latency (dominant through remote relays; also standard TPU
            practice to keep the device fed)."""

            def body(carry, inp):
                st, key = carry
                key, sub = jax.random.split(key)
                x_u8, t, u_u8 = inp
                new_st, loss, _ = train_step(st, x_u8, t, u_u8, weights, sub)
                return (new_st, key), loss

            (new_state, _), losses = jax.lax.scan(
                body, (state, rng), (x_lb_u8_k, targets_k, u_canon_u8_k))
            return new_state, losses

        self._train_multi = jax.jit(multi_step)

    def train_one(self, epoch: int) -> AverageMeter:
        import numpy as np

        summary_loss = AverageMeter()
        weights = self.class_weights
        if weights is None:
            weights = jnp.ones(int(self.config.MODEL.NUM_CLASSES), jnp.float32)
        labeled_iter = iter(self.train_dl[0])
        unlabeled_iter = iter(self.train_dl[1])
        total = int(self.config.TRAIN.EVAL_STEP)
        k = max(1, min(int(self.config.TRAIN.get("STEPS_PER_CALL", 8)), total))
        done = 0
        bs = int(self.config.DATA.BATCH_SIZE)
        pending = []  # un-fetched device losses: keeps dispatch async so the
        # host preps batch N+1 while the device runs N; a 2-dispatch window
        # bounds queued inputs on the device (_drain_pending)
        while done < total:
            k_here = min(k, total - done)
            xs, ts, us = [], [], []
            for _ in range(k_here):
                x_lb, targets = next(labeled_iter)
                u_canon, _ = next(unlabeled_iter)
                xs.append(x_lb)
                ts.append(targets)
                us.append(u_canon)
            if k_here == k:
                self.state, losses = self._train_multi(
                    self.state, *self._shard_stacked(np.stack(xs), np.stack(ts),
                                                     np.stack(us)),
                    weights, self._next_rng())
                pending.append(losses)
            else:  # ragged tail: per-step path keeps one compiled multi shape
                for x_lb, targets, u_canon in zip(xs, ts, us):
                    self.state, loss, _ = self._train_step(
                        self.state, *self._shard(x_lb, targets, u_canon),
                        weights, self._next_rng())
                    pending.append(loss)
            done += k_here
            self._drain_pending(pending, summary_loss, bs)
        self._drain_pending(pending, summary_loss, bs, keep=0)
        return summary_loss

    def get_dataloader(self, train_dl, valid_dl, test_dl=None) -> None:
        """train_dl = (labeled_loader, unlabeled_loader) (fixmatch.py:29-32)."""
        self.train_dl = train_dl
        self.valid_dl = valid_dl
        self.test_dl = test_dl
