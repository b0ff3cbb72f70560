from multihmr_tpu.utils.profiling import Timer, profile_trace, latency_stats  # noqa: F401
from multihmr_tpu.utils.logging import MetricsLogger  # noqa: F401
from multihmr_tpu.utils.precision import cast_backbone_bf16  # noqa: F401
