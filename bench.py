"""Benchmark: fused on-device augmentation + train steps, images/sec/chip.

Default mode measures the BASELINE.json north-star metric — the flagship
configuration of the reference's real-SSL FixMatch run
(configs/kaggle_semisupervised_real_3_1.yaml: ResNet-50, IMG_SIZE=112,
BATCH_SIZE=32, MU=7) as ONE fused jitted step: on-device weak+strong
RandAugment views from canonical uint8 batches, concat forward/backward over
B*(1+2*MU) images, poly-CE + masked consistency loss, Adam + schedule, EMA
teacher update — and prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

``--table`` additionally measures the heavier reference paths (224px
progressive-resize stage, CoMatch 4-view, SemiFormer Conformer-Ti dual-head,
supervised Swin-T) and writes BENCH_TABLE.md; the stdout contract stays one
JSON line (table rows go to stderr).

vs_baseline: ratio against the reference's input-bound throughput on A100
(BASELINE.md: the reference publishes no numbers). The PyTorch reference
feeds an A100 through a 2-worker DataLoader running PIL RandAugment + JPEG
decode per view on CPU (dataset.py:353, randaugment.py); at 112px an A100
computes ~8-10k img/s for ResNet-50 fwd+bwd, so the PIL pipeline is the
bottleneck. MEASURED (tools/bench_reference_loader.py, driving the
reference's own GIDataset/TransformFixMatch/RandAugmentMC with the flagship
DataLoader config): 456 view-images/s with 2 workers on this 1-core host,
i.e. ~456 img/s per worker-core; with the 2 workers on dedicated cores of an
A100 host that extrapolates to ~900 img/s, and 700 img/s sits inside the
measured 456-913 band. We keep 700 as the A100 baseline — now anchored to a
measurement of the real pipeline rather than an estimate. The driver-set
target is >=5x that (3500 img/s/chip).

Measurement notes: through the axon TPU relay, ``block_until_ready`` does NOT
synchronize — a host fetch of a value data-dependent on the final step is the
only reliable barrier, and the relay caches repeat executions with identical
inputs. Every row here therefore times an evolving-state loop (each step
consumes the previous TrainState) and fetches the last loss.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 700.0  # measurement-anchored; see docstring

V5E_HBM_GBPS = 819.0       # v5e HBM bandwidth
V5E_BF16_TFLOPS = 197.0    # v5e bf16 peak


def _cost_per_step(jitfn, args):
    """XLA's own cost analysis of the EXACT compiled SINGLE-step program:
    (flops, bytes accessed). Always pass the single-step jit, not the
    lax.scan multi-step dispatch — XLA counts a while-loop body ONCE
    regardless of trip count, which silently divides the numbers by K
    (measured: the k=8 multi program reports ~1/8 of the single-step
    program's flops/bytes). Validated against analytic ResNet-50 FLOPs:
    XLA reports 2.90 TF for the 480-image 112px fwd+bwd step vs 2.95 TF
    analytic (480 x 6.15 GFLOP). Returns (None, None) if the backend does
    not expose cost analysis."""
    try:
        ca = jitfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"]), float(ca["bytes accessed"])
    except Exception as exc:  # relay/backend without cost analysis
        print(f"cost_analysis unavailable: {exc}", file=sys.stderr)
        return None, None


def _roofline_cols(step_ms, flops_step, bytes_step):
    """MFU + measured-roofline columns for BENCH_TABLE.md."""
    if flops_step is None:
        return "—", "—", "—"
    mfu = flops_step / (step_ms * 1e-3) / (V5E_BF16_TFLOPS * 1e12)
    hbm_floor_ms = bytes_step / (V5E_HBM_GBPS * 1e9) * 1e3
    mxu_floor_ms = flops_step / (V5E_BF16_TFLOPS * 1e12) * 1e3
    headroom = step_ms / max(hbm_floor_ms, mxu_floor_ms)
    return f"{100 * mfu:.1f}%", f"{hbm_floor_ms:.1f}", f"{headroom:.2f}x"


def _mk_cfg(model: str, img: int, b: int, mu: int, type_semi: str):
    from endoscopy_tpu.config.loader import default_config

    import jax

    cfg = default_config()
    cfg.MODEL.NAME = model
    cfg.MODEL.NUM_CLASSES = 6
    cfg.MODEL.TYPE_SEMI = type_semi
    cfg.DATA.IMG_SIZE = img
    cfg.DATA.BATCH_SIZE = b
    cfg.DATA.MU = mu
    cfg.DATA.IS_CROP = True
    cfg.TRAIN.DTYPE = "bfloat16"
    cfg.TRAIN.EVAL_STEP = 512
    cfg.TRAIN.IS_SSL = type_semi != "None"
    cfg.TRAIN.MESH_DATA = len(jax.devices())
    cfg.TRAIN.MESH_MODEL = 1
    return cfg


def _canonical_batches(cfg, k: int, seed: int = 0):
    """(K,B,...) stacked canonical uint8 batches + targets (+ unlabeled)."""
    size = int(cfg.DATA.IMG_SIZE * 1.2)
    b, mu = int(cfg.DATA.BATCH_SIZE), int(cfg.DATA.MU)
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 255, (k, b, size, size, 3)).astype(np.uint8)
    t = rng.integers(0, cfg.MODEL.NUM_CLASSES, (k, b)).astype(np.int64)
    u = rng.integers(0, 255, (k, b * mu, size, size, 3)).astype(np.uint8)
    return x, t, u


def _timed(run_calls, barrier, calls: int) -> float:
    """Time `calls` invocations of run_calls() with a host-fetch barrier."""
    run_calls()  # warmup+compile (twice inside)
    barrier()
    t0 = time.perf_counter()
    for _ in range(calls):
        run_calls()
    barrier()
    return time.perf_counter() - t0


def row_fixmatch(model: str = "resnet50", img: int = 112, b: int = 32,
                 mu: int = 7, k: int = 8, calls: int = 5,
                 with_cost: bool = False, accum: int = 1):
    """FixMatch dual-view fused step (fixmatch.py:107-127 semantics).

    accum: TRAIN.GRAD_ACCUM microbatches per optimizer step — the 224px row
    runs 4 (same effective batch; PERF.md round 5 A/B: accum=4 2,513.6 vs
    accum=2 2,420.6 img/s, +3.8% — the 480-image activation set otherwise
    overflows HBM and XLA remats)."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.fixmatch import FixMatch

    cfg = _mk_cfg(model, img, b, mu, "FixMatch")
    cfg.TRAIN.GRAD_ACCUM = int(accum)
    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    xk, tk, uk = _canonical_batches(cfg, k)
    sharded = trainer._shard_stacked(xk, tk, uk)

    box = {"state": trainer.state, "loss": None}

    def run():
        for _ in range(2):
            box["state"], losses = trainer._train_multi(
                box["state"], *sharded, weights, trainer._next_rng())
            box["loss"] = losses

    dt = _timed(run, lambda: float(box["loss"][-1]), calls)
    steps = calls * 2 * k
    ips = b * (1 + 2 * mu) * steps / dt / len(jax.devices())
    if not with_cost:
        return ips
    # Roofline columns always come from the UNSPLIT (accum=1) program: the
    # GRAD_ACCUM path wraps the microbatch body in lax.scan, and XLA's cost
    # analysis counts a loop body ONCE regardless of trip count (see
    # _cost_per_step docstring) — the accum program would report ~1/accum of
    # the real flops/bytes and fake a 2x "headroom" regression. The unsplit
    # program computes the same optimizer step, so its floor is the honest
    # speed-of-light bound for the row.
    cost_trainer = trainer
    if accum > 1:
        cfg1 = _mk_cfg(model, img, b, mu, "FixMatch")
        cost_trainer = FixMatch(model=build_model(cfg1), opt_func="Adam")
        cost_trainer.train_dl = cost_trainer.valid_dl = None
        cost_trainer.get_config(cfg1,
                                labeled_targets=np.arange(cfg1.MODEL.NUM_CLASSES))
    flops, bts = _cost_per_step(
        cost_trainer._train_step,
        (cost_trainer.state, *cost_trainer._shard(xk[0], tk[0], uk[0]),
         weights, cost_trainer._next_rng()))
    return ips, dt / steps * 1e3, flops, bts


def row_comatch(model: str = "resnet50", img: int = 112, b: int = 32,
                mu: int = 5, k: int = 8, calls: int = 5,
                with_cost: bool = False):
    """CoMatch 4-view fused step incl. queue/DA state (comatch.py:107-237)."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.comatch import CoMatch

    cfg = _mk_cfg(model, img, b, mu, "CoMatch")
    trainer = CoMatch(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    xk, tk, uk = _canonical_batches(cfg, k)
    sharded = trainer._shard_stacked(xk, tk, uk)
    gates = jnp.ones(k, bool)

    box = {"s": trainer.state, "c": trainer.comatch_state, "loss": None}

    def run():
        for _ in range(2):
            box["s"], box["c"], losses = trainer._train_multi(
                box["s"], box["c"], *sharded, weights, gates,
                trainer._next_rng())
            box["loss"] = losses

    dt = _timed(run, lambda: float(box["loss"][-1]), calls)
    steps = calls * 2 * k
    ips = b * (1 + 3 * mu) * steps / dt / len(jax.devices())
    if not with_cost:
        return ips
    flops, bts = _cost_per_step(
        trainer._train_step,
        (box["s"], box["c"], *trainer._shard(xk[0], tk[0], uk[0]), weights,
         jnp.asarray(True), trainer._next_rng()))
    return ips, dt / steps * 1e3, flops, bts


def row_semiformer(img: int = 224, b: int = 32, mu: int = 6,
                   calls: int = 3, steps_per_call: int = 4,
                   with_cost: bool = False, accum: int = 4):
    """SemiFormer FixMatch phase on dual-head Conformer-Ti
    (semiformer.py:119-133; config kaggle_semisupervised_real_2.yaml dims).
    GRAD_ACCUM=4 by default (PERF.md round 5 A/B: 1,184.7 vs 1,028.5 img/s
    at accum=2, +15.2%; accum=2 was already +32.6% over unsplit) — the
    416-image dual-branch activation set is HBM-pressure-bound unsplit."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.semiformer import SemiFormer

    cfg = _mk_cfg("conformer", img, b, mu, "SemiFormer")
    cfg.TRAIN.GRAD_ACCUM = int(accum)
    trainer = SemiFormer(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    x, t, u = _canonical_batches(cfg, 1)
    sx, st, su = trainer._shard(x[0], t[0], u[0])

    box = {"state": trainer.state, "loss": None}

    def run():
        for _ in range(steps_per_call):
            box["state"], box["loss"] = trainer._fixmatch_step(
                box["state"], sx, st, su, weights, trainer._next_rng())

    dt = _timed(run, lambda: float(box["loss"]), calls)
    steps = calls * steps_per_call
    ips = b * (1 + 2 * mu) * steps / dt / len(jax.devices())
    if not with_cost:
        return ips
    # Unsplit program for the roofline columns (same rationale as
    # row_fixmatch: XLA counts the GRAD_ACCUM scan body once).
    cost_trainer = trainer
    if accum > 1:
        cfg1 = _mk_cfg("conformer", img, b, mu, "SemiFormer")
        cost_trainer = SemiFormer(model=build_model(cfg1), opt_func="Adam")
        cost_trainer.train_dl = cost_trainer.valid_dl = None
        cost_trainer.get_config(cfg1,
                                labeled_targets=np.arange(cfg1.MODEL.NUM_CLASSES))
    flops, bts = _cost_per_step(
        cost_trainer._fixmatch_step,
        (cost_trainer.state, sx, st, su, weights, cost_trainer._next_rng()))
    return ips, dt / steps * 1e3, flops, bts


def row_supervised(model: str = "swin", img: int = 224, b: int = 64,
                   k: int = 8, calls: int = 5, with_cost: bool = False):
    """Supervised labeled-view step (supervised.py:121-136)."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.supervised import SupLearning

    cfg = _mk_cfg(model, img, b, 1, "None")
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    xk, tk, _ = _canonical_batches(cfg, k)
    sx, st = trainer._shard_stacked(xk, tk)

    box = {"state": trainer.state, "loss": None}

    def run():
        for _ in range(2):
            box["state"], losses, _ = trainer._train_multi(
                box["state"], sx, st, weights, trainer._next_rng())
            box["loss"] = losses

    dt = _timed(run, lambda: float(box["loss"][-1]), calls)
    steps = calls * 2 * k
    ips = b * steps / dt / len(jax.devices())
    if not with_cost:
        return ips
    flops, bts = _cost_per_step(
        trainer._train_step,
        (box["state"], *trainer._shard(xk[0], tk[0]), weights,
         trainer._next_rng()))
    return ips, dt / steps * 1e3, flops, bts


def row_triplet(model: str = "resnet50", img: int = 224, b: int = 32,
                k: int = 8, calls: int = 5, with_cost: bool = False):
    """Supervised triplet step — 3B anchor/pos/neg images through ModelwEmb,
    triplet loss on pooled features + poly-CE on anchor logits
    (supervised.py:84-108; EZBM stage-1 path, kaggle_supervised_ezbm.yaml
    dims). Host-side rejection sampling is not timed (it overlaps the async
    dispatch in training); this measures the fused 3B-image step."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.supervised import SupLearning

    cfg = _mk_cfg(model, img, b, 1, "None")
    cfg.MODEL.IS_TRIPLET = True
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    size = int(cfg.DATA.IMG_SIZE * 1.2)
    rng = np.random.default_rng(0)
    xk = rng.integers(0, 255, (k, 3 * b, size, size, 3)).astype(np.uint8)
    tk = rng.integers(0, cfg.MODEL.NUM_CLASSES, (k, b)).astype(np.int64)
    sx, st = trainer._shard_stacked(xk, tk)

    box = {"state": trainer.state, "loss": None}

    def run():
        for _ in range(2):
            box["state"], losses, _ = trainer._train_multi(
                box["state"], sx, st, weights, trainer._next_rng())
            box["loss"] = losses

    dt = _timed(run, lambda: float(box["loss"][-1]), calls)
    steps = calls * 2 * k
    ips = 3 * b * steps / dt / len(jax.devices())
    if not with_cost:
        return ips
    flops, bts = _cost_per_step(
        trainer._train_step,
        (box["state"], *trainer._shard(xk[0], tk[0]), weights,
         trainer._next_rng()))
    return ips, dt / steps * 1e3, flops, bts


TABLE_ROWS = [
    # (name, unit-description, fn) — covers every default backbone family in
    # the reference configs: resnet50, conformer, swin, densenet161,
    # efficientnet_b1 (grep NAME /root/reference/code/configs/*.yaml)
    ("fixmatch_resnet50_112", "ResNet-50 112px B=32 MU=7 (flagship)",
     lambda: row_fixmatch("resnet50", 112, 32, 7, with_cost=True)),
    ("fixmatch_resnet50_224",
     "ResNet-50 224px B=32 MU=7 GRAD_ACCUM=4 (progressive stage 2)",
     lambda: row_fixmatch("resnet50", 224, 32, 7, k=4, calls=4,
                          with_cost=True, accum=4)),
    ("comatch_resnet50_112", "CoMatch 4-view ResNet-50 112px B=32 MU=5",
     lambda: row_comatch("resnet50", 112, 32, 5, with_cost=True)),
    ("semiformer_conformer_224",
     "Conformer-Ti dual-head 224px B=32 MU=6 GRAD_ACCUM=4",
     lambda: row_semiformer(224, 32, 6, with_cost=True)),
    ("supervised_swin_224", "Swin-T 224px B=64 labeled view",
     lambda: row_supervised("swin", 224, 64, k=4, calls=4, with_cost=True)),
    ("supervised_densenet161_224", "DenseNet-161 224px B=32 labeled view "
     "(kaggle_supervised_patho.yaml)",
     lambda: row_supervised("densenet161", 224, 32, k=4, calls=4,
                            with_cost=True)),
    ("supervised_efficientnet_b1_224", "EfficientNet-B1 224px B=32 labeled "
     "view (kaggle_supervised_abnorm.yaml)",
     lambda: row_supervised("efficientnet_b1", 224, 32, k=4, calls=4,
                            with_cost=True)),
    ("triplet_resnet50_224", "Triplet ModelwEmb 3x32 imgs 224px "
     "(EZBM stage 1, kaggle_supervised_ezbm.yaml)",
     lambda: row_triplet("resnet50", 224, 32, k=4, calls=4, with_cost=True)),
]


def run_table() -> dict:
    results, rows_md = {}, {}
    for name, desc, fn in TABLE_ROWS:
        try:
            out = fn()
            ips, step_ms, flops, bts = (
                out if isinstance(out, tuple) else (out, None, None, None))
            results[name] = round(float(ips), 1)
            if step_ms is not None:
                mfu, floor, headroom = _roofline_cols(step_ms, flops, bts)
                rows_md[name] = (f"{results[name]} | {step_ms:.1f} | {mfu} | "
                                 f"{floor} | {headroom}")
                print(f"{name:32s} {ips:9.1f} img/s/chip  {step_ms:7.1f} ms  "
                      f"MFU {mfu}  HBM-floor {floor} ms  headroom {headroom}"
                      f"   ({desc})", file=sys.stderr, flush=True)
            else:
                rows_md[name] = f"{results[name]} | — | — | — | —"
                print(f"{name:32s} {ips:9.1f} img/s/chip   ({desc})",
                      file=sys.stderr, flush=True)
        except Exception as exc:  # keep the table going; record the failure
            results[name] = f"error: {exc}"
            rows_md[name] = f"error: {exc} | — | — | — | —"
            print(f"{name:32s} ERROR: {exc}", file=sys.stderr, flush=True)
    with open("BENCH_TABLE.md", "w") as f:
        f.write(
            "# Bench table (images/sec/chip, evolving-state loops, host-fetch "
            "barriers)\n\nMFU/floor columns from `Compiled.cost_analysis()` "
            "of the exact program: MFU = flops/step-time vs 197 TFLOP/s bf16 "
            "peak; HBM floor = bytes-accessed / 819 GB/s; headroom = "
            "step-time / max(HBM floor, MXU floor) — the measured "
            "speed-of-light multiple (1.0x = roofline). GRAD_ACCUM rows "
            "keep the UNSPLIT program's floors (the ideal one-pass cost), "
            "so their headroom includes the accumulation's deliberate "
            "weight re-reads — it overstates waste but keeps rows "
            "comparable across accum settings.\n\n"
            "| row | img/s/chip | ms/step | MFU | HBM floor ms | headroom | "
            "path |\n|---|---|---|---|---|---|---|\n")
        for name, desc, _ in TABLE_ROWS:
            f.write(f"| {name} | {rows_md[name]} | {desc} |\n")
    return results


def _backend_watchdog(timeout_s: int = 600) -> None:
    """Fail fast instead of hanging forever when the TPU relay is wedged:
    backend init normally takes seconds; if jax.devices() hasn't returned
    after ``timeout_s``, print a diagnosis and exit non-zero so the caller
    sees a failed bench, not a hung one. (Observed 2026-08-17: a SIGKILLed
    relay client can wedge the tunnel for hours; jax.devices() then blocks
    indefinitely.)"""
    import os
    import threading

    done = threading.Event()

    def bark():
        if not done.wait(timeout_s):
            print(f"bench: jax backend init did not complete in {timeout_s}s"
                  " — TPU relay wedged? Exiting instead of hanging.",
                  file=sys.stderr, flush=True)
            os._exit(17)

    threading.Thread(target=bark, daemon=True).start()
    import jax

    jax.devices()
    done.set()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--table", action="store_true",
                        help="measure all reference paths, write BENCH_TABLE.md")
    args = parser.parse_args()

    _backend_watchdog()

    if args.table:
        results = run_table()
        value = results.get("fixmatch_resnet50_112")
        if not isinstance(value, float):
            value = 0.0
    else:
        value = round(float(row_fixmatch()), 1)

    print(json.dumps({
        "metric": "fixmatch_dual_view_images_per_sec_per_chip",
        "value": value,
        "unit": "images/sec/chip (ResNet-50, 112px, B=32, MU=7, bf16)",
        "vs_baseline": round(value / A100_REFERENCE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
