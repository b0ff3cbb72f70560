from multihmr_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    opt_state_shardings,
    param_shardings,
    batch_sharding,
    replicated,
    shard_params,
)
from multihmr_tpu.parallel.ring_attention import (  # noqa: F401
    head_parallel_attention,
    mesh_attention,
    mesh_attention_merged,
    ring_attention,
    sequence_parallel_attention,
)
