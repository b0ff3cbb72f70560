from multihmr_tpu.io.checkpoint import (  # noqa: F401
    convert_torch_checkpoint,
    config_from_ckpt_args,
    save_checkpoint,
    load_checkpoint,
    prune_checkpoints,
)
from multihmr_tpu.io.export import (  # noqa: F401
    export_model,
    load_exported,
)
