"""Orbax checkpointing of train-state pytrees.

Replaces the reference's ``torch.save(state_dict)`` best-checkpoint flow
(reference src/utils.py:40-46, train.py:174-177,186). Saves the full pytree
(params + batch_stats + optimizer state + step) so resume restores the
optimizer schedule — the reference's warm start is weights-only and silently
restarts the schedule (SURVEY §5 checkpoint row).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    """Single-process runs use the stock StandardCheckpointer. Multi-host
    runs save from process 0 ONLY (training/loop.py guards with
    ``is_main``) — state is replicated, so one host's copy is complete —
    and the stock checkpointer would deadlock there: its save finalization
    barriers across ALL processes, but processes 1..n never call save.
    ``active_processes={0}`` scopes the barrier to the one caller."""
    if jax.process_count() > 1:
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0},
                barrier_sync_key_prefix="food101_sr_p0"))
    return ocp.StandardCheckpointer()


def save_checkpoint(tree: Any, path: str) -> str:
    """Save a pytree under ``path`` (a directory); returns the path."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    # Gather to host numpy so sharded arrays save portably.
    host_tree = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    ckpt.save(path, host_tree, force=True)
    if hasattr(ckpt, "wait_until_finished"):  # async StandardCheckpointer
        ckpt.wait_until_finished()            # (the sync one returns done)
    return path


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree saved by ``save_checkpoint``. With ``target``,
    restores with matching structure/dtypes."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if target is not None:
        ref = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return ckpt.restore(path, ref)
    return ckpt.restore(path)


def save_train_checkpoint(state: Any, epoch: int, scheduler, stopper,
                          path: str, d_state: Any = None,
                          batch: int = 0) -> str:
    """Preemption-resume checkpoint: the FULL train state (params + extra
    collections + optimizer state + step) plus host-side control state
    (epoch, plateau scheduler, early stopper). The reference's checkpoints
    are weights-only and silently restart the schedule on warm start
    (reference train.py:52-53; SURVEY §5 checkpoint row) — on TPU slices,
    periodic full-state checkpoints are the failure-recovery mechanism.

    ``batch``: microbatches of ``epoch`` consumed at save time. 0 means
    the epoch completed (the per-epoch rolling save); >0 is a mid-epoch
    preemption save (training/preempt.py) and ``--resume`` fast-forwards
    the epoch-seeded loader to exactly that batch."""
    tree = {
        "g": _state_tree(state),
        "host": {
            "epoch": np.asarray(epoch, np.int32),
            "batch": np.asarray(batch, np.int32),
            "scheduler": {k: np.asarray(v)
                          for k, v in scheduler.state_dict().items()},
            "stopper": {k: np.asarray(v)
                        for k, v in stopper.state_dict().items()},
        },
    }
    if d_state is not None:  # GAN runs carry the discriminator too
        tree["d"] = _state_tree(d_state)
    return save_checkpoint(tree, path)


def load_train_checkpoint(path: str, state: Any, scheduler, stopper,
                          d_state: Any = None):
    """Restore a ``save_train_checkpoint`` checkpoint into freshly-built
    states (same model/optimizer config). Returns
    (state, d_state_or_None, start_epoch, start_batch): resume training at
    epoch ``start_epoch`` skipping its first ``start_batch`` microbatches
    (0 for the per-epoch rolling saves; >0 for mid-epoch preemption saves)."""
    target = {
        "g": _state_tree(state),
        "host": {
            "epoch": np.asarray(0, np.int32),
            "batch": np.asarray(0, np.int32),
            "scheduler": {k: np.asarray(v)
                          for k, v in scheduler.state_dict().items()},
            "stopper": {k: np.asarray(v)
                        for k, v in stopper.state_dict().items()},
        },
    }
    if d_state is not None:
        target["d"] = _state_tree(d_state)
    try:
        tree = load_checkpoint(path, target)
    except Exception:
        # optional-state drift: reshape the typed target to the keys the
        # checkpoint actually holds, restore, then reconcile back to the
        # fresh state's configuration (see _OPTIONAL_STATE_KEYS). "batch"
        # is likewise optional: rolling checkpoints written before the
        # mid-epoch preemption saves existed carry no such key (epoch
        # boundary == batch 0).
        target["g"] = _drift_target(target["g"], state, _ckpt_keys(path, "g"))
        if d_state is not None:
            target["d"] = _drift_target(target["d"], d_state,
                                        _ckpt_keys(path, "d"))
        if "batch" not in _ckpt_keys(path, "host"):
            target["host"].pop("batch")
        tree = load_checkpoint(path, target)
        tree["g"] = _reconcile_optional(tree["g"], state)
        if d_state is not None:
            tree["d"] = _reconcile_optional(tree["d"], d_state)
    scheduler.load_state_dict(tree["host"]["scheduler"])
    stopper.load_state_dict(tree["host"]["stopper"])
    new_state = state.replace(**tree["g"])
    new_d = d_state.replace(**tree["d"]) if d_state is not None else None
    batch = int(tree["host"].get("batch", 0))
    epoch = int(tree["host"]["epoch"])
    # batch 0: the epoch completed -> start the next one. batch > 0: the
    # epoch was preempted mid-flight -> re-enter it at that batch.
    return (new_state, new_d, epoch if batch else epoch + 1, batch)


def _state_tree(state) -> dict:
    tree = {
        "step": state.step,
        "params": state.params,
        "extra": state.extra,
        "opt_state": state.opt_state,
    }
    if getattr(state, "ema_params", None) is not None:  # --ema runs only
        tree["ema_params"] = state.ema_params
    if getattr(state, "skipped", None) is not None:
        tree["skipped"] = state.skipped
    return tree


# Optional per-state keys that may drift between checkpoint and fresh
# state (resuming with --ema toggled, or a checkpoint written before the
# skip counter existed), with restore templates.
_OPTIONAL_STATE_KEYS = {
    "ema_params": lambda st: st.params,
    "skipped": lambda st: np.zeros((), np.int32),
}


def _ckpt_keys(path: str, part: str):
    """Top-level key set of one state subtree in a saved checkpoint."""
    md = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
    tree = md.item_metadata if hasattr(md, "item_metadata") else md
    return set(tree[part].keys())


def _drift_target(part_target: dict, st, keys_on_disk) -> dict:
    """Typed restore target reshaped to the checkpoint's actual keys."""
    out = {k: v for k, v in part_target.items()
           if k not in _OPTIONAL_STATE_KEYS or k in keys_on_disk}
    for k, tmpl in _OPTIONAL_STATE_KEYS.items():
        if k in keys_on_disk and k not in out:
            out[k] = tmpl(st)
    return out


def _reconcile_optional(part_tree: dict, st) -> dict:
    """After a drift restore: match the fresh state's optional-key config —
    a missing EMA is seeded from the restored params, a missing counter
    restarts at 0, and keys the state doesn't carry are dropped."""
    for k, _ in _OPTIONAL_STATE_KEYS.items():
        if getattr(st, k, None) is None:
            part_tree.pop(k, None)
    if getattr(st, "ema_params", None) is not None \
            and "ema_params" not in part_tree:
        # materialize copies: aliasing the params buffers would make the
        # jitted step's donation see the same buffer twice
        part_tree["ema_params"] = jax.tree_util.tree_map(
            np.array, part_tree["params"])
    if getattr(st, "skipped", None) is not None and "skipped" not in part_tree:
        part_tree["skipped"] = np.zeros((), np.int32)
    return part_tree


def warm_start_params(init_params: Any, loaded_params: Any) -> Any:
    """strict=False-style warm start (reference train.py:52-53): take loaded
    leaves where path+shape match the freshly-initialized tree, keep the
    init elsewhere."""
    flat_init = _flatten(init_params)
    flat_loaded = _flatten(loaded_params)
    merged = {}
    for k, v in flat_init.items():
        lv = flat_loaded.get(k)
        if lv is not None and getattr(lv, "shape", None) == v.shape:
            merged[k] = lv
        else:
            merged[k] = v
    return _unflatten(merged)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree
