from kantts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    distributed_init,
)
from kantts_tpu.parallel.pp import (  # noqa: F401
    make_pipe_mesh,
    pipeline_apply,
    stack_layer_params,
)
