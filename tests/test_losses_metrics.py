"""Loss + metric parity vs independent torch/numpy formulations."""

import numpy as np
import torch
import jax.numpy as jnp

from multihmr_tpu.train.loss import centernet_focal_loss, multihmr_loss, LossWeights
from multihmr_tpu.train.metrics import (
    compute_prf1,
    match_2d_greedy,
    pve,
    pa_pve,
    AverageMeter,
)


def torch_neg_loss(pred, gt):
    """Independent torch impl of the CenterNet penalty-reduced focal loss."""
    pos = gt.eq(1).float()
    neg = gt.lt(1).float()
    neg_w = torch.pow(1 - gt, 4)
    eps = 1e-7
    pos_loss = (torch.log(pred + eps) * torch.pow(1 - pred, 2) * pos).sum()
    neg_loss = (torch.log(1 - pred + eps) * torch.pow(pred, 2) * neg_w * neg).sum()
    n = pos.sum()
    return -neg_loss if n == 0 else -(pos_loss + neg_loss) / n


def test_focal_loss_matches_torch(rng):
    pred = rng.uniform(0.01, 0.99, size=(2, 8, 8)).astype(np.float32)
    gt = np.zeros((2, 8, 8), np.float32)
    gt[0, 2, 3] = gt[1, 5, 5] = 1.0
    ours = float(centernet_focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    ref = float(torch_neg_loss(torch.from_numpy(pred), torch.from_numpy(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # zero-positive case
    gt0 = np.zeros_like(gt)
    ours0 = float(centernet_focal_loss(jnp.asarray(pred), jnp.asarray(gt0)))
    ref0 = float(torch_neg_loss(torch.from_numpy(pred), torch.from_numpy(gt0)))
    np.testing.assert_allclose(ours0, ref0, rtol=1e-5)


def test_masked_loss_matches_ragged_means(rng):
    """Masked [B,K] means must equal flat means over only the valid persons
    (what the reference computes on ragged tensors, loss.py:50-74)."""
    B, K, J, V = 2, 4, 5, 7
    valid = np.array([[1, 1, 0, 0], [1, 0, 0, 0]], np.float32)

    def r(*s):
        return rng.normal(size=s).astype(np.float32)

    pred = {
        "scores": r(B, 4, 4, 1) * 0 + 0.5,
        "offset": r(B, K, 2), "rotmat": r(B, K, 3, 3, 3),
        "shape": r(B, K, 10), "dist_postprocessed": r(B, K, 1),
        "transl": r(B, K, 3), "transl_pelvis": r(B, K, 1, 3),
        "j3d": r(B, K, J, 3), "v3d": r(B, K, V, 3),
        "j2d": r(B, K, J, 2) * 100 + 200, "v2d": r(B, K, V, 2) * 100 + 200,
    }
    gt = {k: r(*v.shape) if k != "scores" else np.zeros((B, 4, 4, 1), np.float32)
          for k, v in pred.items()}
    gt["j2d"] = rng.uniform(-50, 900, size=(B, K, J, 2)).astype(np.float32)
    gt["v2d"] = rng.uniform(-50, 900, size=(B, K, V, 2)).astype(np.float32)
    gt["valid"] = valid
    gt["dist_postprocessed"] = gt["dist_postprocessed"][..., 0]

    total, terms = multihmr_loss(
        {k: jnp.asarray(v) for k, v in pred.items()},
        {k: jnp.asarray(v) for k, v in gt.items()},
        LossWeights(), epoch=20, img_size=896,
    )
    # flat reference for the offset term
    sel = valid.astype(bool)
    ref_offset = np.abs(pred["offset"][sel] - gt["offset"][sel]).sum(-1).mean()
    np.testing.assert_allclose(float(terms["offset"]), ref_offset, rtol=1e-5)
    ref_rotmat = np.abs(pred["rotmat"][sel] - gt["rotmat"][sel]).sum((1, 2, 3)).mean()
    np.testing.assert_allclose(float(terms["rotmat"]), ref_rotmat, rtol=1e-5)
    # pelvis-centered v3d
    pel_p, pel_g = pred["transl_pelvis"][sel], gt["transl_pelvis"][sel]
    ref_v3d = np.abs(
        (gt["v3d"][sel] - pel_g) - (pred["v3d"][sel] - pel_p)
    ).sum(-1).mean(-1).mean()
    np.testing.assert_allclose(float(terms["v3d"]), ref_v3d, rtol=1e-5)
    # in-frame 2D
    inf = ((gt["j2d"][sel] > 0) & (gt["j2d"][sel] < 896)).all(-1)
    ref_j2d = np.abs(pred["j2d"][sel] - gt["j2d"][sel]).sum(-1)[inf].mean()
    np.testing.assert_allclose(float(terms["j2d"]), ref_j2d, rtol=1e-5)
    assert np.isfinite(float(total))


def test_prf1():
    assert compute_prf1(10, 2, 1) == (100 * round(8 / 9, 2), 100 * round(8 / 10, 2), 100 * round(8 / (8 + 0.5 * 3), 2))
    assert compute_prf1(0, 0, 0) == (0, 0, 0)


def test_greedy_matching_basic(rng):
    # two GT people, two preds near them (offset by small noise), one far FP
    gt1 = rng.normal(size=(14, 2)) * 30 + np.array([100, 100])
    gt2 = rng.normal(size=(14, 2)) * 30 + np.array([400, 400])
    p1 = gt1 + rng.normal(size=(14, 2))
    p2 = gt2 + rng.normal(size=(14, 2))
    p3 = rng.normal(size=(14, 2)) * 10 + np.array([800, 100])
    valid = [np.ones(14, bool)] * 2
    best, fps, misses = match_2d_greedy([p1, p3, p2], [gt1, gt2], valid)
    assert sorted(map(tuple, best)) == [(0, 0), (2, 1)]
    assert fps == [1]
    assert misses == []


def test_greedy_matching_miss():
    gt = [np.array([[0.0, 0], [10, 10]]), np.array([[500.0, 500], [510, 510]])]
    pred = [np.array([[1.0, 1], [11, 11]])]
    valid = [np.ones(2, bool)] * 2
    best, fps, misses = match_2d_greedy(pred, gt, valid)
    assert list(map(tuple, best)) == [(0, 0)]
    assert misses == [1] and fps == []


def test_pve_and_pa_pve(rng):
    V = 50
    gt = rng.normal(size=(1, V, 3)).astype(np.float32)
    # pred = rotated+scaled+translated gt → PVE large, PA-PVE ~0
    from multihmr_tpu.ops import rotvec_to_rotmat

    R = np.asarray(rotvec_to_rotmat(jnp.asarray(np.array([[0.3, 0.2, -0.4]], np.float32))))
    pred = 1.2 * np.einsum("bij,bnj->bni", R, gt) + np.array([0.5, 0, 0.2])
    e_pa = pa_pve(pred, gt)
    assert e_pa[0] < 1.0  # mm
    e = pve(pred, gt, pred[:, :1] * 0, gt[:, :1] * 0)
    assert e[0] > 100

    m = AverageMeter("x", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0


def test_pa_pve_host_matches_jit_procrustes():
    """pa_pve's host-side Kabsch/Umeyama must match the jit-side
    ops.rotations.rigid_points_registration (itself golden-tested vs roma):
    same R/s/t convention, same degenerate-det handling."""
    import jax.numpy as jnp

    from multihmr_tpu.ops.rotations import rigid_points_registration
    from multihmr_tpu.train.metrics import pa_pve

    rng = np.random.default_rng(11)
    for _ in range(5):
        gt = rng.normal(size=(2, 40, 3)).astype(np.float64)
        # pred = noisy similarity transform of gt
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        pred = 0.7 * gt @ R.T + rng.normal(scale=0.01, size=gt.shape) + [0.1, -0.2, 0.3]

        host = pa_pve(pred, gt)

        Rj, sj, tj = rigid_points_registration(
            jnp.asarray(pred), jnp.asarray(gt))
        aligned = (np.asarray(sj)[..., None, None]
                   * np.einsum("...ij,...nj->...ni", np.asarray(Rj), pred)
                   + np.asarray(tj)[..., None, :])
        want = 1000.0 * np.linalg.norm(aligned - gt, axis=-1).mean(-1)
        np.testing.assert_allclose(host, want, rtol=1e-4, atol=1e-3)
