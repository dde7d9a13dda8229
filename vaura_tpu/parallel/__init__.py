from vaura_tpu.parallel.mesh import (
    MESH_AXES,
    batch_sharding,
    make_mesh,
    replicated,
)
from vaura_tpu.parallel.partitioning import (
    param_shardings,
    param_specs,
    shard_params,
    spec_for,
)

__all__ = [
    "MESH_AXES",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "param_shardings",
    "param_specs",
    "shard_params",
    "spec_for",
]
