from multihmr_tpu.models.smplx_layer import SMPLXCameraLayer  # noqa: F401
