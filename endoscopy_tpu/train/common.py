"""Shared trainer machinery.

Every trainer follows the reference's informal protocol (SURVEY.md §1 L4):
``__init__(model, opt_func)`` → ``get_dataloader(...)`` → ``get_config(config)``
→ optional ``load_checkpoint(path, is_train)`` → ``fit()``; plus
``evaluate_one()``, ``inference(dl)``, ``save_checkpoint(dir)``.

TPU-first differences from the reference loops:
- each trainer owns jitted step functions (augmentation + forward + backward
  + optimizer + EMA fused in one XLA program) over the device mesh;
- evaluation uses one compiled pad-and-mask step for all batches;
- "freeze backbone" (fixmatch.py:40-52) is a gradient mask inside the step
  (running BN stats still update in train mode, matching torch .train()).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug.views import eval_view
from endoscopy_tpu.ckpt import orbax_io
from endoscopy_tpu.eval.metrics import calculate_metrics
from endoscopy_tpu.losses import balanced_class_weights, cross_entropy
from endoscopy_tpu.models.modelwemb import ModelwEmb
from endoscopy_tpu.optim import build_optimizer
from endoscopy_tpu.optim.schedules import build_schedule
from endoscopy_tpu.parallel.mesh import mesh_from_config
from endoscopy_tpu.train import preempt
from endoscopy_tpu.parallel.sharding import batch_sharding, param_shardings, replicated
from endoscopy_tpu.utils.meters import AverageMeter


def model_logits(model, out):
    """Normalize model outputs: ModelwEmb returns (logits, fts, fts_low)
    (custom_model.py:207-213); plain classifiers return logits."""
    if isinstance(out, tuple):
        return out[0]
    return out


def apply_train(model, params, batch_stats, x, rng):
    """Forward in train mode with mutable BN stats + dropout rng."""
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": rng})
    return out, mut["batch_stats"]


def apply_eval(model, params, batch_stats, x):
    return model.apply({"params": params, "batch_stats": batch_stats}, x,
                       train=False)


def trainable_mask(params, freeze_backbone: bool):
    """Gradient mask for TRAIN.IS_FREEZE: zero grads on the backbone, train
    the classifier head (+ projection head) only (fixmatch.py:40-52,
    comatch.py:64-73)."""
    if not freeze_backbone:
        return jax.tree.map(lambda _: True, params)

    def label(path, leaf):
        top = getattr(path[0], "key", str(path[0]))
        return top != "backbone"

    return jax.tree_util.tree_map_with_path(label, params)


def mask_grads(grads, mask):
    return jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


class BaseTrainer:
    """Common state, config plumbing, eval, checkpoint, fit skeleton."""

    trainer_name = "Base"

    def __init__(self, model=None, opt_func: str = "Adam", lr: float = 1e-3,
                 device: Optional[str] = None) -> None:
        self.model = model
        self.opt_func = opt_func
        self.epoch_start = 1
        self.best_valid_perf: Optional[float] = None
        self.epoch = 0
        self.state = None
        self.mesh = None

    # -- dataloaders --------------------------------------------------------

    def get_dataloader(self, train_dl, valid_dl, test_dl=None) -> None:
        self.train_dl = train_dl
        self.valid_dl = valid_dl
        self.test_dl = test_dl

    # -- config -------------------------------------------------------------

    # set True by trainers whose train step implements the DATA.IS_REPROD
    # paper-reproduction transforms (reproduce_transform, dataset.py:111-132)
    _supports_reprod = False

    def _setup_common(self, config, n_iter_per_epoch: int,
                      labeled_targets: Optional[np.ndarray]) -> None:
        self.config = config
        if bool(config.DATA.get("IS_REPROD", False)) and \
                not self._supports_reprod:
            raise ValueError(
                "DATA.IS_REPROD selects the supervised paper-reproduction "
                f"transforms; trainer {type(self).__name__} does not "
                "implement them (train/eval views would silently mismatch)")
        self.mesh = mesh_from_config(config)
        self.img_size = int(config.DATA.IMG_SIZE)
        self.dtype = (jnp.bfloat16 if config.TRAIN.get("DTYPE", "bfloat16") == "bfloat16"
                      else jnp.float32)
        self.lr_schedule = build_schedule(config, n_iter_per_epoch)
        self.use_ema = bool(config.TRAIN.USE_EMA)
        self.ema_decay = float(config.TRAIN.EMA_DECAY)
        self.rng = jax.random.key(int(config.TRAIN.get("SEED", 42)))

        if config.TRAIN.CLS_WEIGHT and labeled_targets is not None:
            # balanced weights over classes present (fixmatch.py:61-66)
            self.class_weights = jnp.asarray(
                balanced_class_weights(labeled_targets,
                                       num_classes=int(config.MODEL.NUM_CLASSES)),
                dtype=jnp.float32)
        else:
            self.class_weights = None

    def _init_state(self, sample_shape: Tuple[int, ...]) -> None:
        """Create TrainState with mesh-aware shardings."""
        from endoscopy_tpu.train.state import create_train_state

        sample = jnp.zeros(sample_shape, jnp.float32)
        self.state, self.tx = create_train_state(
            self.model, sample, self.opt_func, self.lr_schedule,
            use_ema=self.use_ema, seed=int(self.config.TRAIN.get("SEED", 42)))
        shardings = param_shardings(self.mesh, self.state)
        self.state = jax.device_put(self.state, shardings)
        self.grad_mask = trainable_mask(self.state.params,
                                        bool(self.config.TRAIN.IS_FREEZE))
        self._batch_sharding = batch_sharding(self.mesh)

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _shard(self, *arrays):
        """Host batch → global sharded array. Single-process: device_put with
        the 'data' sharding. Multi-host (DCN data parallel): each process
        holds batch/process_count rows; jax assembles the global array
        (SURVEY.md §2.3 input-pipeline sharding)."""
        if jax.process_count() > 1:
            return tuple(jax.make_array_from_process_local_data(
                self._batch_sharding, np.asarray(a)) for a in arrays)
        return tuple(jax.device_put(a, self._batch_sharding) for a in arrays)

    def _shard_stacked(self, *arrays):
        """For (K, B, ...) stacks of K per-step batches: batch axis 1 is the
        data-parallel axis; the scan axis K stays unsharded."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P(None, "data"))
        if jax.process_count() > 1:
            return tuple(jax.make_array_from_process_local_data(
                sh, np.asarray(a)) for a in arrays)
        return tuple(jax.device_put(a, sh) for a in arrays)

    # -- evaluation ---------------------------------------------------------

    def _build_eval_step(self):
        from endoscopy_tpu.aug.views import reproduce_eval_view

        model = self.model
        img_size = self.img_size
        dtype = self.dtype
        # paper-reproduction eval transform (dataset.py:125-131) when
        # DATA.IS_REPROD: deterministic resize + mean/std-0.5 normalize
        view = (reproduce_eval_view
                if bool(self.config.DATA.get("IS_REPROD", False))
                else eval_view)

        @jax.jit
        def eval_step(params, batch_stats, batch_u8, targets, mask):
            x = view(batch_u8, img_size, dtype)
            logits = model_logits(model, apply_eval(model, params, batch_stats, x))
            logits = logits.astype(jnp.float32)
            ce = cross_entropy(logits, targets, reduction="none")
            m = mask.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.sum(ce * m), jnp.sum(m), probs

        self._eval_step = eval_step

    def _eval_params(self):
        """EMA weights when enabled (fixmatch.py:137-140)."""
        if self.use_ema and self.state.ema_params is not None:
            return self.state.ema_params, self.state.ema_batch_stats
        return self.state.params, self.state.batch_stats

    @staticmethod
    def _fetch_batch_rows(arr, n_local: int):
        """Host-local rows of a batch-sharded jit output.

        Single-process: the whole array. Multi-process: a global array
        spanning non-addressable devices cannot be np.asarray'd — fetch this
        process's addressable shards in global row order, which are exactly
        the rows this host contributed via _shard (each host's eval loader
        iterates the FULL valid set, so local rows == the full set over the
        loop; duplicate compute across hosts, correct results everywhere)."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: (s.index[0].start or 0))
        return np.concatenate([np.asarray(s.data) for s in shards])[:n_local]

    def evaluate_one(self, show_metric: bool = False, show_report: bool = False,
                     show_cf_matrix: bool = False):
        params, batch_stats = self._eval_params()
        summary_loss = AverageMeter()
        all_probs, all_targets = [], []
        for batch_u8, targets, mask in self.valid_dl:
            loss_sum, count, probs = self._eval_step(
                params, batch_stats, *self._shard(batch_u8, targets, mask))
            n = int(count)
            if n:
                summary_loss.update(float(loss_sum) / n, n)
            keep = np.asarray(mask)
            probs = self._fetch_batch_rows(probs, len(keep))[keep]
            all_probs.append(probs)
            all_targets.append(np.asarray(targets)[keep])
        probs = np.concatenate(all_probs)
        preds = probs.argmax(axis=1)
        targets = np.concatenate(all_targets)
        metric = calculate_metrics(preds, targets, self.config)
        if show_metric:
            print("Metric:")
            print(metric)
        if show_report:
            from endoscopy_tpu.eval.metrics import confusion_matrix
            print(confusion_matrix(targets, preds, int(self.config.MODEL.NUM_CLASSES)))
        return summary_loss, metric

    def test_one(self):
        """Boolean mask of misclassified validation samples
        (supervised.py:198-236)."""
        params, batch_stats = self._eval_params()
        preds, targets = [], []
        for batch_u8, t, mask in self.valid_dl:
            _, _, probs = self._eval_step(
                params, batch_stats, *self._shard(batch_u8, t, mask))
            keep = np.asarray(mask)
            preds.append(
                self._fetch_batch_rows(probs, len(keep)).argmax(axis=1)[keep])
            targets.append(np.asarray(t)[keep])
        return np.concatenate(preds) != np.concatenate(targets)

    def inference(self, dl_test) -> Dict[int, int]:
        """Thresholded pseudo-labels for an unlabeled pool
        (supervised.py:238-268): pred = argmax * [max_prob > THRES]."""
        params, batch_stats = self._eval_params()
        out: Dict[int, int] = {}
        idx_base = 0
        for batch in dl_test:
            if len(batch) == 3:
                batch_u8, _, mask = batch
            else:
                batch_u8, _ = batch
                mask = np.ones(len(batch_u8), bool)
            _, _, probs = self._eval_step(
                params, batch_stats,
                *self._shard(batch_u8, np.zeros(len(batch_u8), np.int64), mask))
            keep = np.asarray(mask)
            probs = self._fetch_batch_rows(probs, len(keep))
            max_val = probs.max(axis=1)
            preds = probs.argmax(axis=1) * (max_val > float(self.config.TRAIN.THRES))
            for i, p in zip(np.nonzero(keep)[0], preds[keep]):
                out[idx_base + int(i)] = int(p)
            idx_base += int(keep.sum())
        return out

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(self, foldname: str) -> str:
        meta = {"epoch": int(self.epoch),
                "best_valid_perf": self.best_valid_perf,
                "trainer": self.trainer_name,
                "img_size": self.img_size}
        path = orbax_io.save_checkpoint(foldname, f"epoch_{int(self.epoch)}",
                                        self.state, meta)
        print("Saved checkpoint:", path)
        return path

    def load_checkpoint(self, checkpoint_dir: str, is_train: bool = False) -> None:
        state, meta = orbax_io.restore_checkpoint(checkpoint_dir, self.state)
        self.state = state
        self._resumed = True
        self.epoch_start = int(meta.get("epoch", 1))
        self.best_valid_perf = meta.get("best_valid_perf")
        # freeze policy reapplied on load (fixmatch.py:204-236)
        self.grad_mask = trainable_mask(
            self.state.params, bool(self.config.TRAIN.IS_FREEZE) and is_train)

    # -- fit skeleton (FixMatch-style: eval every FREQ_EVAL epochs,
    #    fixmatch.py:237-262) --------------------------------------------

    def train_one(self, epoch: int) -> AverageMeter:  # pragma: no cover - abstract
        raise NotImplementedError

    def _preempt_break(self, epoch: int, saved_this_epoch: bool = False) -> bool:
        """True when a preemption signal arrived (train/preempt.py): saves a
        resume checkpoint — unless this epoch's eval already saved one — and
        tells the fit loop to stop. Every fit override polls this at its
        epoch boundary; the CLI then exits 143 (resumable)."""
        if not preempt.requested():
            return False
        if self.config.TRAIN.get("SAVE_CP") and not saved_this_epoch:
            self.save_checkpoint(self.config.TRAIN.SAVE_CP)
        print(f"[preempt] stopping after epoch {epoch}", flush=True)
        return True

    @staticmethod
    def _drain_pending(pending, summary_loss, batch_size: int,
                       keep: int = 2) -> None:
        """Fetch all but the last ``keep`` deferred device losses into the
        meter. Keeping a small window preserves host/device overlap while
        BOUNDING in-flight dispatches — fetching dispatch N-2 blocks until
        it ran, so at most ~``keep`` dispatches (and their pinned input
        batches) queue on the device at once. keep=0 drains everything
        (epoch end)."""
        import numpy as np

        while len(pending) > keep:
            for loss in np.asarray(pending.pop(0)).ravel():
                summary_loss.update(float(loss), batch_size)

    def _metric_logger(self):
        if not hasattr(self, "_logger"):
            from endoscopy_tpu.utils.logging import MetricLogger
            self._logger = MetricLogger(
                self.config.TRAIN.get("LOG_DIR"),
                run_name=self.trainer_name.lower(),
                # wandb scalar mirroring (supervised.py:337-343); optional —
                # silently JSONL-only when wandb isn't importable
                use_wandb=bool(self.config.TRAIN.get("USE_WANDB", False)))
        return self._logger

    def _images_per_step(self) -> int:
        """Images the jitted step consumes; SSL = labeled + 2 unlabeled views
        (fixmatch.py:107); CoMatch overrides with its 3 views."""
        bs = int(self.config.DATA.BATCH_SIZE)
        if self.config.TRAIN.IS_SSL:
            return bs * (1 + 2 * int(self.config.DATA.MU))
        return bs

    def fit(self) -> None:
        import time as _time

        from endoscopy_tpu.utils.logging import Throughput

        logger = self._metric_logger()
        images_per_step = self._images_per_step()
        if (getattr(self, "_resumed", False)
                and self.epoch_start == int(self.config.TRAIN.EPOCHS)):
            # RESUME at the final epoch: evaluate only (fixmatch.py:238-241).
            # A fresh run with EPOCHS == 1 must still train its one epoch.
            valid_loss, valid_metric = self.evaluate_one()
            print(f"\tValid Loss: {valid_loss.avg:.3f}")
            print(f"\tMetric: {valid_metric}")
            return
        for epoch in range(self.epoch_start, int(self.config.TRAIN.EPOCHS) + 1):
            self.epoch = epoch
            best = (f"{float(self.best_valid_perf):.3f}"
                    if self.best_valid_perf is not None else "inf")
            print(f"Training epoch: {epoch} | The best loss: {best}")
            tput = Throughput(images_per_step)
            t0 = _time.perf_counter()
            train_loss = self.train_one(epoch)
            steps = getattr(self, "n_iter_per_epoch",
                            int(self.config.TRAIN.get("EVAL_STEP", 1)))
            imgs_per_sec = steps * images_per_step / max(_time.perf_counter() - t0, 1e-9)
            print(f"\tTrain Loss: {train_loss.avg:.3f} | {imgs_per_sec:.0f} img/s")
            logger.log({"loss/train": train_loss.avg,
                        "throughput/images_per_sec": imgs_per_sec}, epoch=epoch)
            saved_this_epoch = False
            if epoch % int(self.config.TRAIN.FREQ_EVAL) == 0:
                valid_loss, valid_metric = self.evaluate_one()
                if self.best_valid_perf is None or self.best_valid_perf > valid_loss.avg:
                    self.best_valid_perf = valid_loss.avg
                if self.config.TRAIN.get("SAVE_CP"):
                    self.save_checkpoint(self.config.TRAIN.SAVE_CP)
                    saved_this_epoch = True
                print(f"\tValid Loss: {valid_loss.avg:.3f}")
                print(f"\tMetric: { {k: v for k, v in valid_metric.items() if k != 'sen/spec'} }")
                logger.log({"loss/valid": valid_loss.avg,
                            "metric/macro_f1": float(valid_metric["macro/f1"])},
                           epoch=epoch)
            if self._preempt_break(epoch, saved_this_epoch):
                break
        # fit() returns with every async checkpoint save durable; exiting the
        # process mid-save races interpreter shutdown inside orbax's commit
        # threads (asyncio default executor already torn down).
        orbax_io.wait_until_finished()
