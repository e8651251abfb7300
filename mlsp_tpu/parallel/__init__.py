from mlsp_tpu.parallel.mesh import (
    fetch_global,
    init_distributed,
    make_mesh,
    shard_batch,
    shard_scan_batch,
    replicate,
    replicate_for_mesh,
    batch_sharding,
    replicated_sharding,
    points_sharding,
    active_points_mesh,
    shard_points_constraint,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_scan_batch",
    "replicate",
    "replicate_for_mesh",
    "batch_sharding",
    "replicated_sharding",
    "points_sharding",
    "active_points_mesh",
    "shard_points_constraint",
]
