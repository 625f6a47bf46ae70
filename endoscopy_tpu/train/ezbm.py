"""EZBM trainer: two-stage balanced feature mixing (reference: ezbm.py:23-426).

Stage 1 (ezbm.py:78-132): triplet training on ModelwEmb — triplet loss on the
*normalized low-dim* embeddings + poly-CE (with cls_num_list) on anchor
logits, total ce + LAMBDA_C*triplet — while memorizing every anchor's
penultimate feature vector and target (ezbm.py:112-115; the memory is rebuilt
each epoch).

Stage 2 (ezbm.py:133-182, 386-397): freeze everything but the fc head,
rebuild optimizer+schedule, and train the head on cached feature pairs drawn
by the EZBM expansion sampler (dataset.py:135-175): the primary sample's
class is uniform over classes; the dual's class is uniform ('balance') or
reverse-frequency ('reverse'). Mixing coefficient lam = n_i/(n_i+n_j),
overridden to 0.5 for 'balance' and 1-lam for 'reverse' (ezbm.py:156-162);
loss = CE(orig) + LAMBDA_C*(0.5*CE(mix, y) + 0.5*CE(mix, y_dual))
(ezbm.py:163-167).

TPU design: stage transitions are separate compiled steps + a fresh optax
state (no optimizer-rebuild inside jit, SURVEY.md §7); the feature memory is
a host numpy array (it is only read by the tiny stage-2 fc step).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug.views import labeled_train_view
from endoscopy_tpu.losses import ce_loss, triplet_loss
from endoscopy_tpu.optim import build_optimizer
from endoscopy_tpu.ssl_state.ema import ema_update
from endoscopy_tpu.train.common import BaseTrainer, apply_train, mask_grads
from endoscopy_tpu.utils.meters import AverageMeter


class EZBM(BaseTrainer):
    trainer_name = "EZBM"

    def get_config(self, config, cls_num_list: Optional[list] = None,
                   labeled_targets: Optional[np.ndarray] = None) -> None:
        n_iter = max(len(getattr(self.train_dl, "manifest", []))
                     // int(config.DATA.BATCH_SIZE), 1)
        self._setup_common(config, n_iter, labeled_targets)
        self.n_iter_per_epoch = n_iter
        self.cls_num_list = list(cls_num_list or [])
        self.lambda_c = float(config.TRAIN.LAMBDA_C)
        self.expansion = str(config.TRAIN.get("EXPANSION", "balance"))
        if int(config.TRAIN.get("GRAD_ACCUM", 1)) > 1:
            # EZBM's stage-2 balanced mixing pairs samples ACROSS the batch
            # (one per class); microbatching would change which pairs exist.
            # Refuse loudly rather than silently ignoring the knob.
            raise ValueError(
                "TRAIN.GRAD_ACCUM > 1 is not supported for EZBM: balanced "
                "mixing pairs samples across the whole batch. Use it with "
                "SupLearning / FixMatch / SemiFormer, or lower BATCH_SIZE.")

        # init with the post-augmentation model input size (views crop
        # canonical -> IMG_SIZE before the model ever runs)
        self._init_state((2, self.img_size, self.img_size, 3))
        self._build_eval_step()
        self._build_stage1_step()
        self._build_stage2_step()
        self.mem_features: list = []
        self.mem_targets: list = []

    # -- stage 1 ------------------------------------------------------------

    def _build_stage1_step(self) -> None:
        model = self.model
        tx = self.tx
        img_size, dtype = self.img_size, self.dtype
        lambda_c = self.lambda_c
        cls_num_list = self.cls_num_list
        ema_decay, use_ema = self.ema_decay, self.use_ema
        grad_mask = self.grad_mask

        def loss_fn(params, batch_stats, x3, targets, weights, rng):
            out, new_bs = apply_train(model, params, batch_stats, x3, rng)
            logits, fts, fts_low = out
            bs = x3.shape[0] // 3
            anchor_logits = logits[:bs].astype(jnp.float32)
            # triplet on the low-dim normalized embeddings (ezbm.py:99-103)
            a = fts_low[:bs].astype(jnp.float32)
            p = fts_low[bs:2 * bs].astype(jnp.float32)
            n = fts_low[2 * bs:].astype(jnp.float32)
            tl, _, _ = triplet_loss(a, p, n, alpha=0.7)
            cl = ce_loss(anchor_logits, targets, class_weights=weights,
                         reduction="mean", type_loss="poly",
                         cls_num_list=cls_num_list or None)
            loss = cl + lambda_c * tl
            return loss, (new_bs, fts[:bs])

        @jax.jit
        def stage1_step(state, x3_u8, targets, weights, rng):
            k_aug, k_drop = jax.random.split(rng)
            x3 = labeled_train_view(x3_u8, k_aug, img_size, dtype)
            (loss, (new_bs, anchor_fts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats, x3,
                                       targets, weights, k_drop)
            grads = mask_grads(grads, grad_mask)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt)
            if use_ema:
                new_state = new_state.replace(
                    ema_params=ema_update(state.ema_params, new_params, ema_decay),
                    ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                               ema_decay))
            return new_state, loss, anchor_fts

        self._stage1_step = stage1_step

    def _build_triplet_batch(self, batch_u8, targets):
        # random-access sample(indices) protocol — any loader type works
        loader = self.train_dl
        if not hasattr(loader, "sample"):
            raise TypeError(
                f"EZBM stage 1 requires a loader with sample(indices); "
                f"{type(loader).__name__} has none")
        t = np.asarray(loader.manifest.targets)
        rng = getattr(loader, "rng", None)
        if rng is None:
            rng = self._triplet_rng = getattr(
                self, "_triplet_rng", np.random.default_rng(0))
        pos_idx = np.empty(len(targets), np.int64)
        neg_idx = np.empty(len(targets), np.int64)
        for i, y in enumerate(targets):
            pos_idx[i] = rng.choice(np.nonzero(t == y)[0])
            neg_idx[i] = rng.choice(np.nonzero(t != y)[0])
        # one sample() call for both roles (native loader spins a transient
        # decode core per call)
        both = loader.sample(np.concatenate([pos_idx, neg_idx]))
        return np.concatenate([batch_u8, both], axis=0)

    def train_one_stage_1(self, epoch: int) -> AverageMeter:
        summary_loss = AverageMeter()
        weights = self.class_weights
        if weights is None:
            weights = jnp.ones(int(self.config.MODEL.NUM_CLASSES), jnp.float32)
        self.mem_features, self.mem_targets = [], []
        it = iter(self.train_dl)
        pending = []  # deferred fetch keeps dispatch async (see fixmatch)
        for _ in range(self.n_iter_per_epoch):
            batch_u8, targets = next(it)
            x3 = self._build_triplet_batch(batch_u8, targets)
            self.state, loss, anchor_fts = self._stage1_step(
                self.state, *self._shard(x3, targets), weights,
                self._next_rng())
            pending.append(loss)
            self.mem_features.append(anchor_fts)
            self.mem_targets.append(np.asarray(targets))
            self._drain_pending(pending, summary_loss,
                                int(self.config.DATA.BATCH_SIZE), keep=8)
        self.mem_features = [np.asarray(f) for f in self.mem_features]
        self._drain_pending(pending, summary_loss,
                            int(self.config.DATA.BATCH_SIZE), keep=0)
        return summary_loss

    # -- stage 2 ------------------------------------------------------------

    def _build_stage2_step(self) -> None:
        model = self.model
        img_size = self.img_size
        lambda_c = self.lambda_c
        ema_decay, use_ema = self.ema_decay, self.use_ema

        # fc-only trainable mask (ezbm.py:390-392)
        def fc_only(path, leaf):
            return getattr(path[0], "key", str(path[0])) == "fc"
        self._stage2_mask = jax.tree_util.tree_map_with_path(
            fc_only, self.state.params)

        def loss_fn(params, batch_stats, feats, targets, feats_dual,
                    targets_dual, lam, rng):
            def fc_apply(bs_vars, x):
                out, mut = model.apply(
                    {"params": params, "batch_stats": bs_vars}, x, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                    method=model.classify_features)
                return out.astype(jnp.float32), mut["batch_stats"]

            out_o, bs1 = fc_apply(batch_stats, feats)
            mix = lam * feats + (1.0 - lam) * feats_dual
            out_s, bs2 = fc_apply(bs1, mix)
            l_o = ce_loss(out_o, targets, reduction="mean")
            l_s = (0.5 * ce_loss(out_s, targets, reduction="mean")
                   + 0.5 * ce_loss(out_s, targets_dual, reduction="mean"))
            return l_o + lambda_c * l_s, bs2

        @jax.jit
        def stage2_step(state, opt_state2, feats, targets, feats_dual,
                        targets_dual, lam, rng):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, feats, targets, feats_dual,
                targets_dual, lam, rng)
            grads = mask_grads(grads, self._stage2_mask)
            updates, new_opt2 = self._tx2.update(grads, opt_state2, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs)
            if use_ema:
                new_state = new_state.replace(
                    ema_params=ema_update(state.ema_params, new_params, ema_decay),
                    ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                               ema_decay))
            return new_state, new_opt2, loss

        self._stage2_step = stage2_step

    def _sample_stage2_batch(self, feats, targets, batch_size, rng):
        """EmbFeatEZBM sampling (dataset.py:156-175): primary drawn
        class-uniform; dual class-uniform ('balance') or reverse-frequency
        ('reverse')."""
        num_classes = len(self.cls_num_list)
        by_class = [np.nonzero(targets == c)[0] for c in range(num_classes)]
        avail = [c for c in range(num_classes) if len(by_class[c])]
        counts = np.asarray(self.cls_num_list, dtype=np.float64)
        rev_prob = (counts / counts.sum())[::-1]

        idx = np.empty(batch_size, np.int64)
        dual = np.empty(batch_size, np.int64)
        for i in range(batch_size):
            c = rng.choice(avail)
            idx[i] = rng.choice(by_class[c])
            if self.expansion == "reverse":
                cd = int(rng.choice(num_classes, p=rev_prob))
                while not len(by_class[cd]):
                    cd = int(rng.choice(num_classes, p=rev_prob))
            else:
                cd = rng.choice(avail)
            dual[i] = rng.choice(by_class[cd])
        return idx, dual

    def train_one_stage_2(self, epoch: int) -> AverageMeter:
        summary_loss = AverageMeter()
        feats = np.concatenate(self.mem_features)
        targets = np.concatenate(self.mem_targets)
        counts = np.asarray(self.cls_num_list, dtype=np.float64)
        bs2 = int(self.config.DATA.BATCH_SIZE) * int(self.config.DATA.MU)
        num_steps = max(len(targets) // bs2, 1)
        rng = np.random.default_rng(int(self.config.TRAIN.get("SEED", 42)) + epoch)

        pending = []  # deferred loss fetch keeps dispatch async (see fixmatch)
        for _ in range(num_steps):
            idx, dual = self._sample_stage2_batch(feats, targets, bs2, rng)
            y, yd = targets[idx], targets[dual]
            lam = counts[y] / (counts[y] + counts[yd])
            if self.expansion == "balance":
                lam = 0.5 * np.ones_like(lam)
            elif self.expansion == "reverse":
                lam = 1.0 - lam
            self.state, self._opt_state2, loss = self._stage2_step(
                self.state, self._opt_state2,
                jnp.asarray(feats[idx]), jnp.asarray(y),
                jnp.asarray(feats[dual]), jnp.asarray(yd),
                jnp.asarray(lam[:, None], jnp.float32), self._next_rng())
            pending.append(loss)
            self._drain_pending(pending, summary_loss, bs2, keep=8)
        self._drain_pending(pending, summary_loss, bs2, keep=0)
        return summary_loss

    # -- fit: stage 1 with early stop, then freeze + rebuild optimizer +
    #    stage 2 (ezbm.py:349-426) ---------------------------------------

    def fit(self) -> None:
        print("-" * 10, "Stage 1", "-" * 10)
        self.best_valid_loss = None
        self.best_valid_score = None
        count_early_stop = 0
        for epoch in range(self.epoch_start, int(self.config.TRAIN.EPOCHS) + 1):
            if count_early_stop > 5:
                print("Early stopping stage 1")
                break
            self.epoch = epoch
            loss = self.train_one_stage_1(epoch)
            if epoch % int(self.config.TRAIN.FREQ_EVAL) == 0:
                vl, vm = self.evaluate_one()
                count_early_stop = self._update_best(vl, vm, count_early_stop,
                                                     save=False)
                print(f"s1 ep {epoch}: train {loss.avg:.3f} valid {vl.avg:.3f} "
                      f"F1 {vm['macro/f1']:.4f}")
            if self._preempt_break(epoch):
                from endoscopy_tpu.ckpt import orbax_io
                orbax_io.wait_until_finished()
                return

        print("-" * 10, "Stage 2 (fc only, fresh optimizer)", "-" * 10)
        self._tx2 = build_optimizer(self.state.params, opt_func=self.opt_func,
                                    lr=self.lr_schedule)
        self._opt_state2 = self._tx2.init(self.state.params)
        count_early_stop = 0
        for epoch in range(self.epoch_start, int(self.config.TRAIN.EPOCHS) + 1):
            if count_early_stop > 10:
                print("Early stopping stage 2")
                break
            self.epoch = epoch
            loss = self.train_one_stage_2(epoch)
            if epoch % int(self.config.TRAIN.FREQ_EVAL) == 0:
                vl, vm = self.evaluate_one()
                count_early_stop = self._update_best(vl, vm, count_early_stop,
                                                     save=True)
                print(f"s2 ep {epoch}: train {loss.avg:.3f} valid {vl.avg:.3f} "
                      f"F1 {vm['macro/f1']:.4f}")
            if self._preempt_break(epoch):
                break
        from endoscopy_tpu.ckpt import orbax_io
        orbax_io.wait_until_finished()  # saves durable before fit() returns

    def _update_best(self, valid_loss, valid_metric, count_early_stop,
                     save: bool) -> int:
        f1 = float(valid_metric["macro/f1"])
        if self.best_valid_loss is not None and self.best_valid_score is not None:
            if self.best_valid_loss > valid_loss.avg and self.best_valid_score < f1:
                self.best_valid_loss = valid_loss.avg
                self.best_valid_score = f1
                if save and self.config.TRAIN.get("SAVE_CP"):
                    self.save_checkpoint(self.config.TRAIN.SAVE_CP)
            elif self.best_valid_loss < valid_loss.avg or self.best_valid_score > f1:
                count_early_stop += 1
        else:
            self.best_valid_loss = valid_loss.avg
            self.best_valid_score = f1
            if save and self.config.TRAIN.get("SAVE_CP"):
                self.save_checkpoint(self.config.TRAIN.SAVE_CP)
        return count_early_stop
