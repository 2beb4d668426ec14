from .mesh import cpu_mesh, data_sharding, make_mesh, replicate, replicate_sharding

__all__ = [
    "cpu_mesh",
    "data_sharding",
    "make_mesh",
    "replicate",
    "replicate_sharding",
]
