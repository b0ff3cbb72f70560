from multihmr_tpu.models.smplx_layer import SMPLXCameraLayer  # noqa: F401
from multihmr_tpu.models.multihmr import MultiHMR, MultiHMRNet  # noqa: F401
from multihmr_tpu.models.multihmr_anny import (  # noqa: F401
    MultiHMRAnny,
    MultiHMRAnnyNet,
    AnnyConfig,
)
from multihmr_tpu.models.vit import DINOv2ViT  # noqa: F401
from multihmr_tpu.models.hph import HPH  # noqa: F401
