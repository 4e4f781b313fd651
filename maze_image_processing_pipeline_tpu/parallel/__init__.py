"""Device-mesh parallelism: sharding helpers and multi-chip scaling.

The reference's parallelism ceiling is intra-host threads + stream buffers
(SURVEY.md §2c). The TPU-native design scales through ``jax.sharding``:

* data parallelism — batch axis sharded over the ``data`` mesh axis,
* spatial parallelism — image rows sharded over ``space`` (XLA inserts the
  conv halo exchanges),
* tensor parallelism — wide conv/dense output channels sharded over
  ``model``,
* multi-host — samples/archives partitioned per host (embarrassingly
  parallel, near-zero DCN traffic), with ``jax.distributed`` initialization.
"""

from .config import ParallelConfig, setup_parallel
from .mesh import (
    make_mesh,
    shard_batch_spec,
    shard_params,
    replicate,
)
from .multihost import (
    host_count,
    host_id,
    initialize_distributed,
    partition_work,
)

__all__ = [
    "ParallelConfig",
    "setup_parallel",
    "make_mesh",
    "shard_batch_spec",
    "shard_params",
    "replicate",
    "host_count",
    "host_id",
    "initialize_distributed",
    "partition_work",
]
