"""Device-mesh parallelism utilities.

The reference's only parallelism strategy is data parallelism over subjects
via MPI+NCCL all_reduce (SURVEY.md §2.3).  Here the equivalent is a global
:class:`jax.sharding.Mesh` with a ``'data'`` axis: batches are sharded over
it, the atlas image is replicated, and GSPMD inserts all collectives (psum
over ICI) inside the jitted update steps.  The mesh is created with room for
further axes (spatial sharding) without API changes.
"""
from .mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    spatial_sharding,
    shard_batch,
    replicate,
    pad_batch_to_multiple,
)
from .distributed import (
    process_shard_indices,
    shard_sizes,
    put_global,
    local_shard,
    allsum_hosts,
)
from .sharded_fft import (
    sharded_fluid_operator,
    ShardedFluidMetric,
)
from .sharded_epdiff import (
    sharded_expmap,
    sharded_atlas_loss,
)

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicated_sharding",
    "spatial_sharding",
    "shard_batch",
    "replicate",
    "pad_batch_to_multiple",
    "process_shard_indices",
    "shard_sizes",
    "put_global",
    "local_shard",
    "allsum_hosts",
    "sharded_fluid_operator",
    "ShardedFluidMetric",
    "sharded_expmap",
    "sharded_atlas_loss",
]
