from multihmr_tpu.serve.batcher import BatcherStats, DynamicBatcher  # noqa: F401
from multihmr_tpu.serve.server import (  # noqa: F401
    build_batched_infer,
    make_server,
    serve_forever_in_thread,
)
