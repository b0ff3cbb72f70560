from multihmr_tpu.train.loss import LossWeights, multihmr_loss, centernet_focal_loss  # noqa: F401
from multihmr_tpu.train.trainer import Trainer, make_train_step, prepare_gt  # noqa: F401
from multihmr_tpu.train.metrics import (  # noqa: F401
    compute_prf1,
    match_2d_greedy,
    pve,
    pa_pve,
    AverageMeter,
)
from multihmr_tpu.train.evaluate import evaluate_dataset, make_smplx_gt_forward  # noqa: F401
from multihmr_tpu.train.memory import choose_remat, estimate_train_hbm_bytes  # noqa: F401
