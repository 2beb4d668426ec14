from .distributed import maybe_initialize, maybe_initialize_from_config
from .mesh import cpu_mesh, data_sharding, make_mesh, replicate, replicate_sharding
from .spatial import (RECEPTIVE_RADIUS, receptive_radius, tiled_apply,
                      tiled_forward_for)
from .spatial_mesh import (halo_sharded_apply, halo_sharded_forward_for,
                           row_sharding)

__all__ = [
    "RECEPTIVE_RADIUS",
    "receptive_radius",
    "cpu_mesh",
    "data_sharding",
    "halo_sharded_apply",
    "halo_sharded_forward_for",
    "make_mesh",
    "maybe_initialize",
    "maybe_initialize_from_config",
    "replicate",
    "replicate_sharding",
    "row_sharding",
    "tiled_apply",
    "tiled_forward_for",
]
