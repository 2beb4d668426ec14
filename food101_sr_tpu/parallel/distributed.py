"""Multi-host (multi-process) launch wiring.

The reference has no distributed runtime at all (SURVEY §2.2: no
torch.distributed import anywhere); the TPU-native plan calls for
``jax.distributed.initialize`` + per-host data sharding so the SAME
training command scales from one chip to a v5e pod. Everything downstream
is already multi-process aware — ``SRDataLoader`` loads each host's
interleaved slice and assembles global arrays via
``jax.make_array_from_process_local_data`` (data/pipeline.py), and the
mesh/jit path works on global arrays — so this module only has to bring
the process group up before the mesh is built.

Launch modes (checked in order):

* explicit flags: ``--coordinator host:port --num_processes N
  --process_id I`` on every host (torchrun-style);
* environment: ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``,
  ``JAX_PROCESS_ID``) — the standard JAX service env vars;
* ``--distributed auto``: bare ``jax.distributed.initialize()`` — on TPU
  pods JAX autodetects coordinator/count/id from the TPU metadata, so a
  pod launch needs no per-host flags at all.

Example v5e-16 (2 hosts x 8 chips) launch, same on both hosts::

    python train.py --architecture RESNET --distributed auto ...

or explicitly::

    # host 0                                # host 1
    python train.py --coordinator h0:8476 \\
        --num_processes 2 --process_id 0    ... --process_id 1
"""
from __future__ import annotations

import os

import jax

_INITIALIZED = False


def is_initialized() -> bool:
    return _INITIALIZED


def maybe_initialize(coordinator: str = "", num_processes: int = 0,
                     process_id: int = -1, mode: str = "") -> bool:
    """Bring up ``jax.distributed`` when a multi-process launch is
    requested; no-op (returns False) for plain single-process runs.

    Must run before the first jax backend touch in the process (JAX
    requires initialize() before devices are queried). Idempotent: a
    second call in the same process is a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator = coordinator or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", "")
    if num_processes <= 0:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if process_id < 0:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "-1"))

    if mode == "auto":
        # TPU pod: coordinator/count/id come from the platform metadata.
        jax.distributed.initialize()
    elif coordinator:
        if num_processes <= 0 or process_id < 0:
            raise ValueError(
                "--coordinator requires --num_processes and --process_id "
                "(or JAX_NUM_PROCESSES / JAX_PROCESS_ID)")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        return False
    _INITIALIZED = True
    print(f"jax.distributed initialized: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local "
          f"device(s)")
    return True


def maybe_initialize_from_config(cfg: dict) -> bool:
    return maybe_initialize(
        coordinator=str(cfg.get("coordinator", "") or ""),
        num_processes=int(cfg.get("num_processes", 0) or 0),
        process_id=int(cfg.get("process_id", -1)
                       if cfg.get("process_id") is not None else -1),
        mode=str(cfg.get("distributed", "") or ""),
    )
