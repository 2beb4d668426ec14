from .distributed import maybe_initialize, maybe_initialize_from_config
from .mesh import cpu_mesh, data_sharding, make_mesh, replicate, replicate_sharding
from .spatial import (RECEPTIVE_RADIUS, receptive_radius, tiled_apply,
                      tiled_forward_for)

__all__ = [
    "RECEPTIVE_RADIUS",
    "receptive_radius",
    "cpu_mesh",
    "data_sharding",
    "make_mesh",
    "maybe_initialize",
    "maybe_initialize_from_config",
    "replicate",
    "replicate_sharding",
    "tiled_apply",
    "tiled_forward_for",
]
