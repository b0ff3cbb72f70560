from multihmr_tpu.serve.batcher import (  # noqa: F401
    BatcherStats,
    DeadlineExceeded,
    DynamicBatcher,
    QueueFull,
)
from multihmr_tpu.serve.server import (  # noqa: F401
    build_batched_infer,
    make_server,
    serve_forever_in_thread,
)
