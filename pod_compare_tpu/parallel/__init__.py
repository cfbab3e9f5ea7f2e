from pod_compare_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated,
    shard_batch,
)

__all__ = ["create_mesh", "data_sharding", "replicated", "shard_batch"]
