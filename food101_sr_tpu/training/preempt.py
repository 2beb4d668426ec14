"""Graceful-preemption guard for the training loop.

TPU slices are routinely preempted (spot/defragmentation/maintenance) with
a SIGTERM and a kill grace window. The reference has no story here — its
checkpoints are weights-only and epoch-granular at best (reference
src/utils.py:40-46). Our rolling full-state checkpoint already makes
epoch-boundary recovery exact (training/checkpoint.py); this module closes
the remaining window: a SIGTERM mid-epoch triggers a full-state save AT THE
NEXT UPDATE BOUNDARY (params + optimizer + scheduler + epoch + batches
consumed), and ``--resume`` fast-forwards the epoch-seeded loaders to that
exact batch, so the resumed run replays the remaining data order
leaf-exactly (tests/test_preempt.py: resumed == uninterrupted).

Multi-process runs: every host polls its local flag; on a sync cadence the
flags are OR-agreed across processes (``process_allgather``), so one host's
signal stops all of them at the same update and nobody hangs a collective.
"""
from __future__ import annotations

import signal
import threading

import jax
import numpy as np


class PreemptionGuard:
    """Context manager that converts SIGTERM into a polled flag.

    The handler only sets a flag — all checkpoint I/O happens on the
    training thread at an update boundary, where the train state is
    consistent. Install/restore is a no-op off the main thread (Python
    restricts signal handlers to the main thread; sweep workers poll the
    injected hook instead).
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._old = {}
        self._installed = False
        self.requested = False

    # -- lifecycle ---------------------------------------------------------

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for sig in self._signals:
                self._old[sig] = signal.signal(sig, self._on_signal)
            self._installed = True
        return self

    def __exit__(self, *exc):
        if self._installed:
            for sig, old in self._old.items():
                signal.signal(sig, old)
            self._installed = False
        return False

    def _on_signal(self, signum, frame):
        self.requested = True

    # -- API ---------------------------------------------------------------

    def request(self):
        """Programmatic trigger (tests, ops drills, --preempt_after_updates)."""
        self.requested = True

    def poll(self, update_idx: int, sync_every: int = 16) -> bool:
        """True when training should stop at this update boundary.

        Single-process: the local flag, checked every update (free).
        Multi-process: local flags are OR-reduced across hosts every
        ``sync_every`` updates — a tiny host collective, amortized so it
        never serializes the async dispatch pipeline; all processes see
        the same verdict at the same update, keeping collectives aligned.

        ``update_idx`` must be a 0-based counter that is identical on all
        processes AND monotone across the whole run (the loop passes the
        cumulative update count, not the epoch-relative batch index —
        an epoch shorter than ``sync_every`` would otherwise never reach
        an agreement boundary; tests/test_multihost.py drills this).
        """
        if jax.process_count() == 1:
            return self.requested
        if (update_idx + 1) % max(int(sync_every), 1):
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self.requested, np.int32))
        return bool(np.max(flags))
