"""Training observability: metric logging + step-throughput counters +
profiler hooks.

The reference logs scalars to wandb (supervised.py:337-343, ezbm.py:364-411)
and progress via tqdm/fastprogress. Here (zero-egress TPU pods) metrics go to
a JSONL run log, optionally mirrored to wandb when available, plus a
`jax.profiler` trace helper — the TPU-native equivalents called out in
SURVEY.md §5.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    """JSONL metric log: one line per log() call with step/epoch tags."""

    def __init__(self, log_dir: Optional[str], run_name: str = "run",
                 use_wandb: bool = False) -> None:
        self.path = None
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{run_name}.jsonl")
            self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover - optional dependency
                import wandb
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, metrics: Dict, step: Optional[int] = None,
            epoch: Optional[int] = None) -> None:
        record = {"ts": time.time(), **metrics}
        if step is not None:
            record["step"] = int(step)
        if epoch is not None:
            record["epoch"] = int(epoch)
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self._wandb:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()


class Throughput:
    """images/sec counter over a sliding window of steps."""

    def __init__(self, images_per_step: int) -> None:
        self.images_per_step = images_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> None:
        self._steps += 1

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps * self.images_per_step / max(dt, 1e-9)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
