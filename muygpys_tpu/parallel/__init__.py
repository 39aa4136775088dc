from muygpys_tpu.parallel.knn import sharded_knn
from muygpys_tpu.parallel.mesh import initialize_distributed, make_mesh
from muygpys_tpu.parallel.sharding import (
    batch_spec,
    even_batch,
    gather_global,
    replicate,
    shard,
    shard_batch,
)

__all__ = [
    "batch_spec",
    "even_batch",
    "gather_global",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "shard",
    "sharded_knn",
    "shard_batch",
]
