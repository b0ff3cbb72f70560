"""Anny-variant model family: encoder FOV→K, useful_rotmat blending, forward."""

import numpy as np
import jax

from multihmr_tpu.config import ViTConfig
from multihmr_tpu.models.multihmr_anny import (
    AnnyConfig,
    MultiHMRAnny,
    USEFUL_ROTMAT,
    _default_init_pose,
)
from multihmr_tpu.bodymodel.anny import synthetic_anny_model, NUM_BONES
from multihmr_tpu.ops.rotations import rot6d_cols_to_rotmat


def tiny_anny():
    cfg = AnnyConfig(
        img_size=56,
        xat_dim=32,
        xat_depth=1,
        xat_heads=2,
        xat_dim_head=8,
        xat_mlp_dim=64,
        max_people=3,
        compute_dtype="float32",
        vit_override=ViTConfig(embed_dim=32, depth=1, num_heads=2),
    )
    bm = synthetic_anny_model(num_vertices=64, num_bones=NUM_BONES)
    return MultiHMRAnny(cfg, bm, person_center_idx=5)


def test_useful_rotmat_mask():
    assert USEFUL_ROTMAT.shape == (163,)
    assert USEFUL_ROTMAT[0] == 1 and USEFUL_ROTMAT[162] == 0
    assert USEFUL_ROTMAT.sum() == 75  # regressed bones (verified vs reference)


def test_default_init_pose_is_valid_rotation():
    pose = _default_init_pose(NUM_BONES)
    assert pose.shape == (1, NUM_BONES * 6)
    # Anny 6d is the COLUMN-pair layout (reference multi_hmr.py:92-93,158);
    # decoding with the SMPL-X row layout makes the identity 6d degenerate
    # (a1 ∥ a2) — caught by the full-pipeline golden, pinned here.
    R = np.asarray(rot6d_cols_to_rotmat(pose.reshape(NUM_BONES, 6)))
    # root init must reproduce rotvec [pi/2, 0, 0]
    expected = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    np.testing.assert_allclose(R[0], expected, atol=1e-5)
    # every non-root init must decode to EXACT identity
    np.testing.assert_allclose(
        R[1:], np.broadcast_to(np.eye(3, dtype=np.float32), (NUM_BONES - 1, 3, 3)),
        atol=1e-6,
    )


def test_anny_forward_shapes():
    model = tiny_anny()
    params = model.init_params(jax.random.PRNGKey(0))
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 56, 56, 3))
    out = model.forward(params, x, det_thresh=0.2)  # K=None → regressed K
    Kc = model.cfg.max_people
    assert out["K_regressed"].shape == (B, 3, 3)
    assert out["fov_regressed"].shape == (B, 1)
    assert 0 < float(out["fov_regressed"].min()) < np.pi
    assert out["rotmat"].shape == (B, Kc, NUM_BONES, 3, 3)
    assert out["v3d"].shape[0:2] == (B, Kc)
    # masked bones must be exactly identity
    rm = np.asarray(out["rotmat"])
    masked = np.where(USEFUL_ROTMAT == 0)[0]
    np.testing.assert_allclose(
        rm[:, :, masked],
        np.broadcast_to(np.eye(3), rm[:, :, masked].shape),
        atol=1e-6,
    )
    assert np.isfinite(np.asarray(out["v3d"])).all()
    persons = model.extract_persons(out)
    assert len(persons) == B
    for plist in persons:
        depths = [float(p["transl"][2]) for p in plist]
        assert depths == sorted(depths)  # near-to-far ordering
