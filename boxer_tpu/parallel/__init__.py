from boxer_tpu.parallel.mesh import create_mesh, get_default_mesh
from boxer_tpu.parallel.sharding import (
    batch_sharding,
    optimizer_state_shardings,
    param_shardings,
)

__all__ = [
    "create_mesh",
    "get_default_mesh",
    "batch_sharding",
    "param_shardings",
    "optimizer_state_shardings",
]
