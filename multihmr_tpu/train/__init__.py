from multihmr_tpu.train.loss import LossWeights, multihmr_loss, centernet_focal_loss  # noqa: F401
