from .mesh import make_mesh, data_sharding, replicated, initialize_distributed  # noqa: F401
