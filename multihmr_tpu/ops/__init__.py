from multihmr_tpu.ops.rotations import (  # noqa: F401
    rot6d_to_rotmat,
    rot6d_cols_to_rotmat,
    rotvec_to_rotmat,
    rotmat_to_rotvec,
    rotmat_to_unitquat,
    unitquat_to_rotvec,
    rotation_to_homogeneous,
    rigid_points_registration,
)
from multihmr_tpu.ops.camera import (  # noqa: F401
    perspective_projection,
    inverse_perspective_projection,
    get_focal_length_from_fov,
    focal_length_normalization,
    undo_focal_length_normalization,
    log_depth,
    undo_log_depth,
    intrinsics_from_fov,
)
from multihmr_tpu.ops.fourier import fourier_ray_features, fourier_channels  # noqa: F401
from multihmr_tpu.ops.posenc import (  # noqa: F401
    get_2d_sincos_pos_embed,
    bicubic_resize_2d,
)
from multihmr_tpu.ops.image import (  # noqa: F401
    IMG_NORM_MEAN,
    IMG_NORM_STD,
    normalize_rgb,
    denormalize_rgb,
    unpatch,
    tokens_to_grid,
    grid_to_tokens,
)
from multihmr_tpu.ops.detection import (  # noqa: F401
    clamped_sigmoid,
    nms_maxpool,
    topk_detect,
    gather_grid,
    scatter_add_grid,
    Detections,
)
