"""Training losses.

Masked static-shape equivalents of reference loss.py:8-141: the CenterNet
penalty-reduced focal loss on the detection heatmap plus L1 regression terms
over persons. Where the reference averages over a ragged flat person axis
(``.mean(0)``), we sum over padded ``[B, K]`` slots weighted by the validity
mask and divide by the valid count — identical numerics, one static graph.

NaN guards: the reference wraps every term in ``nan_to_num`` (loss.py:76-85);
here the masked means are guarded by ``maximum(count, 1)`` and the same
``nan_to_num`` is applied for parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Defaults from reference loss.py:117-141."""

    alpha_bce: float = 10.0
    alpha_offset: float = 1.0
    alpha_rotmat: float = 0.1
    alpha_shape: float = 1.0
    alpha_dist: float = 1.0
    alpha_transl: float = 1.0
    alpha_j3d: float = 100.0
    alpha_v3d: float = 100.0
    alpha_j2d: float = 1.0
    alpha_v2d: float = 1.0
    start_2d_epoch: int = 10


def centernet_focal_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Penalty-reduced pixelwise focal loss (reference loss.py:8-40).

    ``pred`` are clamped-sigmoid scores, ``gt`` the target heatmap in [0,1]
    with exact 1.0 at person centers.
    """
    eps = 1e-7
    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)
    pos_loss = jnp.log(pred + eps) * jnp.square(1.0 - pred) * pos
    neg_loss = jnp.log(1.0 - pred + eps) * jnp.square(pred) * neg_weights * neg
    num_pos = jnp.sum(pos)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(
        num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0)
    )


def _masked_mean(per_person: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean over valid person slots; ``per_person`` is ``[B, K]``."""
    total = jnp.sum(per_person * valid)
    count = jnp.maximum(jnp.sum(valid), 1.0)
    return total / count


def _nan0(x):
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def multihmr_loss(
    pred: dict,
    gt: dict,
    weights: LossWeights,
    epoch: int = 0,
    img_size: int = 896,
):
    """Total loss + per-term dict (reference loss.py:47-115).

    ``pred`` is a model forward output (padded ``[B, K, ...]``); ``gt`` holds
    the same keys plus ``scores`` (target heatmap ``[B, g, g]``) and
    ``valid`` (``[B, K]`` person mask).
    """
    valid = gt["valid"]

    bce = centernet_focal_loss(pred["scores"], (gt["scores"] >= 1.0).astype(jnp.float32))
    reg_offset = _masked_mean(
        jnp.abs(pred["offset"] - gt["offset"]).sum(-1), valid
    )
    reg_rotmat = _masked_mean(
        jnp.abs(pred["rotmat"] - gt["rotmat"]).sum((-1, -2, -3)), valid
    )
    sdim = min(pred["shape"].shape[-1], gt["shape"].shape[-1])
    reg_shape = _masked_mean(
        jnp.abs(pred["shape"][..., :sdim] - gt["shape"][..., :sdim]).sum(-1), valid
    )
    reg_dist = _masked_mean(
        jnp.abs(pred["dist_postprocessed"][..., 0] - gt["dist_postprocessed"]), valid
    )
    reg_transl = _masked_mean(jnp.abs(pred["transl"] - gt["transl"]).sum(-1), valid)

    # pelvis-centered 3D (reference loss.py:63-69)
    pel_p = pred["transl_pelvis"].reshape(pred["transl_pelvis"].shape[:2] + (1, 3))
    pel_g = gt["transl_pelvis"].reshape(gt["transl_pelvis"].shape[:2] + (1, 3))
    j3d_err = jnp.abs(
        (gt["j3d"] - pel_g) - (pred["j3d"] - pel_p)
    ).sum(-1).mean(-1)
    v3d_err = jnp.abs(
        (gt["v3d"] - pel_g) - (pred["v3d"] - pel_p)
    ).sum(-1).mean(-1)
    reg_j3d = _masked_mean(j3d_err, valid)
    reg_v3d = _masked_mean(v3d_err, valid)

    # in-frame-masked 2D reprojection (reference loss.py:71-74): only GT
    # points inside the frame contribute; mean over selected points.
    def masked_2d(pred_pts, gt_pts):
        in_frame = ((gt_pts > 0) & (gt_pts < img_size)).all(-1).astype(jnp.float32)
        w = in_frame * valid[..., None]
        err = jnp.abs(pred_pts - gt_pts).sum(-1)
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)

    reg_v2d = masked_2d(pred["v2d"], gt["v2d"])
    reg_j2d = masked_2d(pred["j2d"], gt["j2d"])

    # Failure-detection flag: the nan_to_num parity below means a fully
    # NaN'd model keeps reporting total=0 forever (observed: j2d/v2d 1/z
    # projection grads blow up at high lr, params NaN, loss silently reads
    # 0). This flag survives the masking so the Trainer can detect it.
    finite = jnp.all(jnp.isfinite(jnp.stack([
        bce, reg_offset, reg_rotmat, reg_shape, reg_dist, reg_transl,
        reg_j3d, reg_v3d, reg_j2d, reg_v2d,
    ]))).astype(jnp.float32)

    terms = {
        "finite": finite,
        "bce": _nan0(bce),
        "offset": _nan0(reg_offset),
        "rotmat": _nan0(reg_rotmat),
        "shape": _nan0(reg_shape),
        "dist": _nan0(reg_dist),
        "transl": _nan0(reg_transl),
        "j3d": _nan0(reg_j3d),
        "v3d": _nan0(reg_v3d),
        "j2d": _nan0(reg_j2d),
        "v2d": _nan0(reg_v2d),
    }
    total = (
        weights.alpha_bce * terms["bce"]
        + weights.alpha_offset * terms["offset"]
        + weights.alpha_rotmat * terms["rotmat"]
        + weights.alpha_shape * terms["shape"]
        + weights.alpha_dist * terms["dist"]
        + weights.alpha_transl * terms["transl"]
        + weights.alpha_j3d * terms["j3d"]
        + weights.alpha_v3d * terms["v3d"]
    )
    total = total + jnp.where(
        epoch >= weights.start_2d_epoch,
        weights.alpha_j2d * terms["j2d"] + weights.alpha_v2d * terms["v2d"],
        0.0,
    )
    terms["total"] = total
    return total, terms
