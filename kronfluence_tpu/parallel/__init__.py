"""Mesh parallelism + multi-host runtime (public surface)."""

from kronfluence_tpu.parallel.mesh import (
    batch_sharding,
    data_axis_size,
    factor_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_axis_size",
    "factor_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
