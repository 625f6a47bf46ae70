"""Checkpoint crash-durability tests (SURVEY.md §5 failure recovery).

The reference's only resilience is checkpoint-restart
(learn.py:79-81 via MODEL.PRE_TRAIN_RESUME); here the save path must never
lose the only durable copy of an epoch. Three hazards are covered:

1. a crash BEFORE the re-save of an already-complete epoch writes anything
   (the advisor's round-2 finding: force=True used to delete the old state
   first),
2. a crash BETWEEN the two directory renames of the re-save swap
   (state -> state.old, state.resave -> state), recovered by
   latest_checkpoint promoting state.old back,
3. a crash mid-initial-save leaving meta.json but no state/ — the
   incomplete dir must be skipped.
"""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from endoscopy_tpu.ckpt import orbax_io


@pytest.fixture
def state():
    return {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}


def test_resave_crash_before_write_keeps_old_state(tmp_path, state, monkeypatch):
    d = str(tmp_path)
    orbax_io.save_checkpoint(d, "epoch_1", state, {"epoch": 1}, block=True)

    ckptr = orbax_io._checkpointer()
    real_save = ckptr.save

    def crashing_save(*a, **k):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(ckptr, "save", crashing_save)
    new_state = {"w": state["w"] + 100, "b": state["b"] + 100}
    with pytest.raises(RuntimeError, match="simulated crash"):
        orbax_io.save_checkpoint(d, "epoch_1", new_state, {"epoch": 1})
    monkeypatch.setattr(ckptr, "save", real_save)

    latest = orbax_io.latest_checkpoint(d)
    assert latest and latest.endswith("epoch_1")
    restored, meta = orbax_io.restore_checkpoint(latest, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(4.0))  # the ORIGINAL values


def test_resave_crash_between_renames_recovers_old_state(tmp_path, state):
    d = str(tmp_path)
    path = orbax_io.save_checkpoint(d, "epoch_3", state, {"epoch": 3},
                                    block=True)
    # simulate the crash window: state was renamed to state.old, the
    # replacement rename never happened
    os.rename(os.path.join(path, "state"), os.path.join(path, "state.old"))

    latest = orbax_io.latest_checkpoint(d)
    assert latest and latest.endswith("epoch_3")
    assert os.path.isdir(os.path.join(path, "state"))  # promoted back
    restored, _ = orbax_io.restore_checkpoint(latest, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))


def test_incomplete_initial_save_is_skipped(tmp_path, state):
    d = str(tmp_path)
    orbax_io.save_checkpoint(d, "epoch_1", state, {"epoch": 1}, block=True)
    # epoch_2 crashed mid-save: meta written, no finalized state/
    os.makedirs(tmp_path / "epoch_2")
    (tmp_path / "epoch_2" / "meta.json").write_text('{"epoch": 2}')

    latest = orbax_io.latest_checkpoint(d)
    assert latest and latest.endswith("epoch_1")
    with pytest.raises(FileNotFoundError):
        orbax_io.restore_checkpoint(str(tmp_path / "epoch_2"), state)


def test_resave_swaps_cleanly_and_leaves_no_debris(tmp_path, state):
    d = str(tmp_path)
    orbax_io.save_checkpoint(d, "epoch_5", state, {"epoch": 5}, block=True)
    new_state = {"w": state["w"] + 7, "b": state["b"] * 2}
    path = orbax_io.save_checkpoint(d, "epoch_5", new_state, {"epoch": 5},
                                    block=True)
    restored, _ = orbax_io.restore_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(4.0) + 7)
    assert not os.path.isdir(os.path.join(path, "state.resave"))
    assert not os.path.isdir(os.path.join(path, "state.old"))
