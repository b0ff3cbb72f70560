"""Rotation ops vs. independently-written torch/numpy formulations.

The torch references here are implemented from the mathematical definitions
(Gram-Schmidt, Rodrigues, Umeyama), not copied from any package, and serve as
cross-implementation golden values.
"""

import numpy as np
import torch
import jax.numpy as jnp

from multihmr_tpu.ops import (
    rot6d_to_rotmat,
    rotvec_to_rotmat,
    rotmat_to_rotvec,
    rotation_to_homogeneous,
    rigid_points_registration,
)


def torch_rot6d(x):
    # Independent torch impl of the special Gram-Schmidt on (B, 6) inputs laid
    # out as [a1; a2] rows -> columns of R.
    x = x.reshape(-1, 2, 3)
    a1, a2 = x[:, 0], x[:, 1]
    b1 = torch.nn.functional.normalize(a1, dim=-1)
    b2 = torch.nn.functional.normalize(a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack([b1, b2, b3], dim=-1)


def torch_rodrigues(rv):
    theta = rv.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    axis = rv / theta
    x, y, z = axis.unbind(-1)
    zero = torch.zeros_like(x)
    K = torch.stack(
        [
            torch.stack([zero, -z, y], -1),
            torch.stack([z, zero, -x], -1),
            torch.stack([-y, x, zero], -1),
        ],
        -2,
    )
    theta = theta[..., None]
    return (
        torch.eye(3)
        + torch.sin(theta) * K
        + (1 - torch.cos(theta)) * (K @ K)
    )


def test_rot6d_matches_gramschmidt(rng):
    x = rng.normal(size=(64, 6)).astype(np.float32)
    ours = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    ref = torch_rot6d(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # valid rotations
    eye = np.einsum("bij,bkj->bik", ours, ours)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(ours), 1.0, atol=1e-5)


def test_rotvec_to_rotmat(rng):
    rv = rng.normal(size=(128, 3)).astype(np.float32)
    rv[:4] *= 1e-6  # near-zero angles
    ours = np.asarray(rotvec_to_rotmat(jnp.asarray(rv)))
    ref = torch_rodrigues(torch.from_numpy(rv)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotmat_rotvec_roundtrip(rng):
    rv = rng.normal(size=(256, 3)).astype(np.float32)
    rv[:4] *= 1e-5
    # include near-pi rotations
    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    rv[4:12] = (axes * (np.pi - 1e-4)).astype(np.float32)
    R = rotvec_to_rotmat(jnp.asarray(rv))
    back = np.asarray(rotmat_to_rotvec(R))
    R2 = np.asarray(rotvec_to_rotmat(jnp.asarray(back)))
    np.testing.assert_allclose(np.asarray(R), R2, atol=1e-4)


def test_rotation_to_homogeneous(rng):
    R = np.asarray(rotvec_to_rotmat(jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))))
    H = np.asarray(rotation_to_homogeneous(jnp.asarray(R)))
    assert H.shape == (5, 4, 4)
    np.testing.assert_allclose(H[:, :3, :3], R)
    np.testing.assert_allclose(H[:, 3], np.tile([0, 0, 0, 1], (5, 1)).astype(np.float32))
    np.testing.assert_allclose(H[:, :3, 3], 0)


def test_rigid_points_registration_recovers_transform(rng):
    x = rng.normal(size=(2, 40, 3)).astype(np.float32)
    rv = rng.normal(size=(2, 3)).astype(np.float32)
    R_true = np.asarray(rotvec_to_rotmat(jnp.asarray(rv)))
    s_true = np.array([1.7, 0.4], dtype=np.float32)
    t_true = rng.normal(size=(2, 3)).astype(np.float32)
    y = s_true[:, None, None] * np.einsum("bij,bnj->bni", R_true, x) + t_true[:, None]
    R, s, t = rigid_points_registration(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), s_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
