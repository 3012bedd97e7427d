from semtpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)
