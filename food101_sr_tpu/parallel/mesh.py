"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY §2.2: no torch.distributed
anywhere); here data parallelism is first-class. We express it the XLA way:
one jit over global arrays with a 1-D ``data`` mesh — the batch is sharded
over the mesh, parameters are replicated, and XLA inserts the gradient
``psum``s and the cross-replica BatchNorm reductions automatically (the
global-batch mean inside jit *is* the synced statistic). Collectives ride
ICI within a slice; nothing in the model code mentions devices.

Spatial tiling (the SP analogue for whole-image inference with conv-halo
exchange) hooks in as a second mesh axis later without touching this API.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def cpu_mesh(n: int = 8, axis_name: str = "data") -> Mesh:
    """Mesh over virtual CPU devices (tests / multi-chip dry runs; requires
    --xla_force_host_platform_device_count >= n)."""
    return make_mesh(jax.devices("cpu")[:n], axis_name)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for NHWC (or any leading-batch) arrays."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, replicate_sharding(mesh))
