from endoscopy_tpu.parallel.mesh import make_mesh
from endoscopy_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
]
