"""Graceful preemption: SIGTERM → checkpoint at the epoch boundary → exit.

TPU pods (spot/preemptible capacity, k8s evictions, maintenance events)
deliver SIGTERM with a grace window before the kill. The reference's only
resilience is crash-restart via ``MODEL.PRE_TRAIN_RESUME`` (learn.py:79-81)
— a preempted run loses everything since its last ``FREQ_EVAL`` save. Here
the signal sets a flag that ``BaseTrainer.fit`` polls at each epoch
boundary (the natural safe point: an epoch is one compiled multi-step scan
dispatch that cannot be interrupted mid-flight anyway); fit saves a
checkpoint to ``TRAIN.SAVE_CP`` and returns, and the CLI exits 143
(128+SIGTERM) so orchestrators can distinguish "preempted, resumable" from
success or crash. Resume with ``MODEL.PRE_TRAIN_RESUME`` as usual.

The handler is installed by the CLI (``cli.learn``), never at import time:
library users keep their own signal disposition unless they opt in.

Multi-host note: each process must receive the signal (orchestrators
deliver SIGTERM to every pod member); the checkpoint save itself is the
multi-host-safe path in ``ckpt/orbax_io.py``.
"""

from __future__ import annotations

import signal
import threading

_requested = threading.Event()


def install(signals=(signal.SIGTERM,)) -> None:
    """Route the given signals to the preemption flag (main thread only)."""

    def _handler(signum, frame):  # noqa: ARG001 — signal API
        _requested.set()
        print(f"[preempt] signal {signum}: will checkpoint and stop at the "
              "next epoch boundary", flush=True)

    for s in signals:
        signal.signal(s, _handler)


def requested() -> bool:
    """True once a preemption signal arrived (or request() was called)."""
    return _requested.is_set()


def request() -> None:
    """Programmatic preemption (tests, embedding frameworks)."""
    _requested.set()


def reset() -> None:
    """Clear the flag (tests; a fresh run after a handled preemption)."""
    _requested.clear()
