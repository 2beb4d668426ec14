"""Graceful mid-epoch preemption (training/preempt.py + loader
``set_epoch(..., start_batch=k)`` fast-forward + the ``batch`` field of the
rolling checkpoint).

Contract: a SIGTERM (or ``--preempt_after_updates``) saves the FULL train
state at the next update boundary, and ``--resume`` re-enters the epoch at
that exact batch — the preempted+resumed run matches the uninterrupted one
leaf-exactly, because every loader keys crops/flips by global (seed, epoch,
position). The reference has no preemption story at all (its checkpoints
are weights-only, reference src/utils.py:40-46).
"""
import signal

import numpy as np
import pytest

from food101_sr_tpu.data import (
    DeviceCacheLoader,
    DeviceWindowLoader,
    HostCanvasLoader,
    SRDataLoader,
    SyntheticSource,
)
from food101_sr_tpu.training import PreemptionGuard


# ---------------------------------------------------------------------------
# The guard itself
# ---------------------------------------------------------------------------

def test_sigterm_sets_flag_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.requested and not g.poll(0)
        signal.raise_signal(signal.SIGTERM)  # delivered synchronously
        assert g.requested and g.poll(0)
    assert signal.getsignal(signal.SIGTERM) is before


def test_programmatic_request():
    with PreemptionGuard() as g:
        g.request()
        assert g.poll(3)


# ---------------------------------------------------------------------------
# Loader fast-forward: iter(set_epoch(e, start_batch=k)) == tail of epoch e
# ---------------------------------------------------------------------------

def _tail_matches(loader, k, epoch=1):
    loader.set_epoch(epoch)
    full = [np.asarray(b) for b in loader]
    loader.set_epoch(epoch, start_batch=k)
    tail = [np.asarray(b) for b in loader]
    assert len(tail) == len(full) - k
    for a, b in zip(full[k:], tail):
        np.testing.assert_array_equal(a, b)
    # one-shot: the NEXT epoch starts from the top again
    loader.set_epoch(epoch)
    again = [np.asarray(b) for b in loader]
    np.testing.assert_array_equal(full[0], again[0])


def test_host_loader_start_batch(tmp_path):
    src = SyntheticSource(n=20, seed=2)
    _tail_matches(SRDataLoader(src, crop_size=48, batch_size=4, train=True,
                               seed=7), k=2)


def test_device_cache_loader_start_batch():
    src = SyntheticSource(n=16, seed=3)
    _tail_matches(DeviceCacheLoader(src, crop_size=48, batch_size=4,
                                    train=True, seed=7, canvas=64), k=2)


def test_host_canvas_loader_start_batch(tmp_path):
    src = SyntheticSource(n=16, seed=4)
    _tail_matches(HostCanvasLoader(src, crop_size=48, batch_size=4,
                                   train=True, seed=7, canvas=64,
                                   cache_dir=str(tmp_path)), k=2)


def test_window_loader_start_batch(tmp_path):
    src = SyntheticSource(n=16, seed=5)
    _tail_matches(DeviceWindowLoader(src, crop_size=48, batch_size=4,
                                     seed=7, canvas=64, reuse=2, window=8,
                                     cache_dir=str(tmp_path)), k=2)


# ---------------------------------------------------------------------------
# End-to-end: preempted + resumed == uninterrupted, leaf-exact
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loss", ["mse", "gan"])
def test_preempted_resume_equals_uninterrupted(tmp_path, loss):
    """--preempt_after_updates takes the exact SIGTERM path: full-state
    save mid-epoch, clean exit, --resume re-enters the epoch at that batch.
    The GAN leg also pins the D-update cadence across the seam (D fires on
    batch_idx % 5, which must keep counting from the preemption point)."""
    from food101_sr_tpu.training import load_checkpoint, train

    common = dict(
        dataset="synthetic", synthetic_size=96, crop_size=32, scale_factor=4,
        architecture="SRCNN", loss_function=loss, batch_size=8,
        patience=10, use_wandb=False, seed=11, lr=1e-4,
        weights_dir=str(tmp_path / "w"),
    )
    train({**common, "epochs": 2, "save_name": "full", "run_name": "full"})

    # 96 synthetic images -> 86 train -> 10 batches/epoch; preempt inside
    # epoch 1 (the second epoch), 4 updates in
    out = train({**common, "epochs": 2, "save_name": "part",
                 "run_name": "part", "preempt_after_updates": 14})
    assert out.get("preempted") is True
    ckpt = load_checkpoint(str(tmp_path / "w" / "part_last"))
    assert int(ckpt["host"]["epoch"]) == 1
    assert int(ckpt["host"]["batch"]) == 4

    train({**common, "epochs": 2, "save_name": "part2", "run_name": "part2",
           "resume": str(tmp_path / "w" / "part_last")})

    import jax
    full = load_checkpoint(str(tmp_path / "w" / "full_last"))
    part = load_checkpoint(str(tmp_path / "w" / "part2_last"))
    assert int(full["host"]["epoch"]) == int(part["host"]["epoch"]) == 1
    assert int(part["host"]["batch"]) == 0  # finished cleanly
    subs = ("g", "d") if loss == "gan" else ("g",)
    for sub in subs:
        for a, b in zip(jax.tree_util.tree_leaves(full[sub]),
                        jax.tree_util.tree_leaves(part[sub])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_old_checkpoint_without_batch_key_loads(tmp_path):
    """Rolling checkpoints written before the mid-epoch saves existed have
    no host.batch key; the drift path restores them as epoch-boundary."""
    import jax
    import jax.numpy as jnp

    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import (SRTrainState, load_train_checkpoint,
                                         make_adam, save_checkpoint)
    from food101_sr_tpu.training.checkpoint import _state_tree
    from food101_sr_tpu.training.schedule import (EarlyStopping,
                                                  ReduceLROnPlateau)

    model = get_model("SRCNN", scale_factor=2)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)
    state = SRTrainState.create(dict(variables), make_adam(1e-3))
    sched, stop = ReduceLROnPlateau(1e-3), EarlyStopping(patience=3)
    tree = {  # the pre-round-3 on-disk layout: no "batch"
        "g": _state_tree(state),
        "host": {
            "epoch": np.asarray(2, np.int32),
            "scheduler": {k: np.asarray(v)
                          for k, v in sched.state_dict().items()},
            "stopper": {k: np.asarray(v)
                        for k, v in stop.state_dict().items()},
        },
    }
    path = str(tmp_path / "old_last")
    save_checkpoint(tree, path)
    _, _, start_epoch, start_batch = load_train_checkpoint(
        path, state, ReduceLROnPlateau(1e-3), EarlyStopping(patience=3))
    assert (start_epoch, start_batch) == (3, 0)
