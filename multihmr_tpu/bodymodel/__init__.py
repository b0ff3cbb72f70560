from multihmr_tpu.bodymodel.core import BodyModel, lbs_forward  # noqa: F401
from multihmr_tpu.bodymodel.assets import (  # noqa: F401
    load_smplx_npz,
    load_smpl_pkl,
    synthetic_body_model,
    load_mean_params,
)
