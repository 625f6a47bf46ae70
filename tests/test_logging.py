"""MetricLogger observability tests (SURVEY.md §5 metrics/logging row).

The reference mirrors scalars to wandb (supervised.py:337-343,
ezbm.py:364-411); here the JSONL log is primary and wandb is an optional
mirror — both paths are exercised, wandb via an injected stub module (the
real package is not installed on zero-egress pods).
"""

import json
import sys
import types

from endoscopy_tpu.utils.logging import MetricLogger


def test_jsonl_log_lines(tmp_path):
    lg = MetricLogger(str(tmp_path), run_name="t")
    lg.log({"loss": 1.5}, step=3, epoch=1)
    lg.log({"macro_f1": 0.25}, epoch=2)
    lg.close()
    lines = [json.loads(l) for l in
             (tmp_path / "t.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["macro_f1"] == 0.25 and lines[1]["epoch"] == 2


def test_wandb_mirroring_with_stub(tmp_path, monkeypatch):
    calls = []
    stub = types.ModuleType("wandb")
    stub.log = lambda metrics, step=None: calls.append((metrics, step))
    monkeypatch.setitem(sys.modules, "wandb", stub)

    lg = MetricLogger(str(tmp_path), run_name="t", use_wandb=True)
    lg.log({"train_loss": 0.7}, step=11)
    lg.close()
    assert calls == [({"train_loss": 0.7}, 11)]
    # JSONL still written alongside the mirror
    assert "train_loss" in (tmp_path / "t.jsonl").read_text()


def test_wandb_absent_is_silent(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    lg = MetricLogger(str(tmp_path), run_name="t", use_wandb=True)
    lg.log({"x": 1.0})
    lg.close()
    assert lg._wandb is None


def test_trainer_threads_use_wandb_knob(monkeypatch):
    """TRAIN.USE_WANDB reaches the MetricLogger (VERDICT r2 weak #7)."""
    from endoscopy_tpu.config.loader import default_config
    from endoscopy_tpu.train.common import BaseTrainer

    captured = {}

    class _Stub(BaseTrainer):
        trainer_name = "Stub"

        def train_one(self, epoch):  # pragma: no cover
            raise NotImplementedError

    import endoscopy_tpu.utils.logging as logging_mod

    class _Probe:
        def __init__(self, log_dir, run_name="run", use_wandb=False):
            captured["use_wandb"] = use_wandb

    monkeypatch.setattr(logging_mod, "MetricLogger", _Probe)
    t = _Stub.__new__(_Stub)
    cfg = default_config()
    cfg.TRAIN.USE_WANDB = True
    t.config = cfg
    t._metric_logger()
    assert captured["use_wandb"] is True
