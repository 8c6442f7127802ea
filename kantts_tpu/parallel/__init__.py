from kantts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    distributed_init,
)
