"""Rotation algebra in pure JAX.

The reference delegates rotation math to the ``roma`` package
(reference utils/humans.py:12-22, model.py:291, blocks/smpl_layer.py:107,
train.py:391). This module provides closed-form, jit/vmap-friendly
equivalents: 6D→SO(3) Gram-Schmidt, Rodrigues rotvec↔rotmat (via a
numerically robust quaternion path for the inverse), homogeneous lifting and
scaled Procrustes (Kabsch) registration for PA-metrics.

All functions operate on arbitrary leading batch dimensions and are safe at
theta→0 and theta→pi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """Convert a 6D rotation representation to rotation matrices.

    Matches ``roma.special_gramschmidt`` on the reshaped input used by the
    reference (utils/humans.py:12-22): ``x`` is ``(..., 6)`` laid out as two
    interleaved 3-vectors ``[a1x a1y a1z a2x a2y a2z]`` (the first two *rows*
    of a matrix flattened, then transposed to columns).

    Returns ``(..., 3, 3)`` with columns ``b1 = a1/|a1|``,
    ``b2 = normalize(a2 - <b1,a2> b1)``, ``b3 = b1 × b2``.
    """
    batch = x.shape[:-1]
    x = x.reshape(batch + (2, 3))
    a1, a2 = x[..., 0, :], x[..., 1, :]

    def _normalize(v):
        # rsqrt(|v|^2 + eps) instead of v/|v|: finite GRADIENT at v == 0
        # (jnp.linalg.norm backprops NaN at exactly zero — degenerate 6d
        # inputs like the identity-derived hand-joint inits hit this).
        return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)

    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def rot6d_cols_to_rotmat(x: jax.Array) -> jax.Array:
    """6D → rotation matrices, Anny-variant column-pair layout.

    The Anny head flattens ``R[:, :, :2]`` row-major and decodes with
    ``roma.special_gramschmidt(x.reshape(-1, 3, 2))`` (reference
    multi_hmr_anny/multi_hmr.py:92-93,158): the 6 values interleave the two
    column vectors as ``[a1x a2x a1y a2y a1z a2z]`` — NOT the SMPL-X row
    layout :func:`rot6d_to_rotmat` expects (utils/humans.py:12-22 reshapes
    ``(-1, 2, 3)`` then transposes). The identity's 6d differs between the
    two layouts, so using the wrong decoder silently breaks every
    identity-initialised joint.
    """
    batch = x.shape[:-1]
    x = x.reshape(batch + (3, 2))
    a1, a2 = x[..., 0], x[..., 1]

    def _normalize(v):
        return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)

    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def rotvec_to_rotmat(rotvec: jax.Array) -> jax.Array:
    """Rodrigues formula, axis-angle ``(..., 3)`` → rotation matrix ``(..., 3, 3)``.

    Equivalent of ``roma.rotvec_to_rotmat`` (used at reference
    blocks/smpl_layer.py:107). Small angles use the exact Taylor-stable form
    sin(t)/t and (1-cos(t))/t^2 evaluated with series fallbacks.
    """
    theta2 = jnp.sum(rotvec * rotvec, axis=-1)[..., None, None]
    # clamp BOTH the sqrt input and the denominators: the unselected `where`
    # branch still backprops, and 1/theta2 at zero would poison the gradient
    # with 0 * NaN (the "double-where" trap). The clamp must be large enough
    # that 1/clamp^2 stays finite in fp32 (1e-12 → 1e24 < fp32 max); any
    # theta2 this small takes the Taylor branch anyway.
    theta2_safe = jnp.maximum(theta2, 1e-12)
    theta = jnp.sqrt(theta2_safe)
    small = theta2 < 1e-12
    # sin(t)/t and (1 - cos t)/t^2 with series fallback near zero.
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)

    x, y, z = rotvec[..., 0], rotvec[..., 1], rotvec[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=rotvec.dtype)
    return eye + sinc * K + cosc * (K @ K)


def rotmat_to_unitquat(R: jax.Array) -> jax.Array:
    """Rotation matrix ``(..., 3, 3)`` → unit quaternion ``(..., 4)`` (x,y,z,w).

    Branch-free Shepperd's method: computes all four candidate quaternions and
    selects the best-conditioned one with ``where``, so it lowers to one fused
    XLA program (no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest. Each row is
    # proportional to [w, x, y, z]: e.g. [1+tr, m21-m12, m02-m20, m10-m01]
    # = [4w^2, 4wx, 4wy, 4wz] ∝ q; normalization recovers the unit quat.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    qy = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    qz = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
    )
    # candidate i layout: [w, x, y, z] scaled by 2*pivot_i
    cand_w = jnp.stack([qw[..., 0], qx[..., 0], qy[..., 0], qz[..., 0]], axis=-1)
    cand_x = jnp.stack([qw[..., 1], qx[..., 1], qy[..., 1], qz[..., 1]], axis=-1)
    cand_y = jnp.stack([qw[..., 2], qx[..., 2], qy[..., 2], qz[..., 2]], axis=-1)
    cand_z = jnp.stack([qw[..., 3], qx[..., 3], qy[..., 3], qz[..., 3]], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)[..., None]
    take = lambda c: jnp.take_along_axis(c, best, axis=-1)[..., 0]
    w, xq, yq, zq = take(cand_w), take(cand_x), take(cand_y), take(cand_z)
    q = jnp.stack([xq, yq, zq, w], axis=-1)
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def unitquat_to_rotvec(q: jax.Array) -> jax.Array:
    """Unit quaternion (x,y,z,w) → axis-angle ``(..., 3)``."""
    v = q[..., :3]
    w = q[..., 3]
    norm_v = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)  # grad-safe at v=0
    theta = 2.0 * jnp.arctan2(norm_v, w)
    # theta / sin(theta/2) with series fallback for small theta
    half = theta * 0.5
    small = norm_v < 1e-7
    scale = jnp.where(small, 2.0 + theta * theta / 12.0, theta / jnp.maximum(norm_v, 1e-24))
    return v * scale[..., None]


def rotmat_to_rotvec(R: jax.Array) -> jax.Array:
    """Rotation matrix → axis-angle; the ``roma.rotmat_to_rotvec`` equivalent
    (reference model.py:291)."""
    return unitquat_to_rotvec(rotmat_to_unitquat(R))


def rotation_to_homogeneous(R: jax.Array) -> jax.Array:
    """Lift ``(..., 3, 3)`` rotations to ``(..., 4, 4)`` homogeneous matrices
    with zero translation (reference utils/humans.py:29-38)."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, jnp.zeros(batch + (3, 1), R.dtype)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_points_registration(
    x: jax.Array, y: jax.Array, compute_scaling: bool = True
):
    """Scaled Procrustes alignment of point sets (Kabsch/Umeyama).

    Equivalent of ``roma.rigid_points_registration(x, y, compute_scaling=True)``
    used for PA-PVE / PA-MPJPE (reference train.py:391,426): finds R, s, t
    minimizing ``|| s * R @ x + t - y ||``.

    Args:
      x, y: ``(..., N, 3)`` source and target points.
    Returns:
      (R ``(...,3,3)``, s ``(...)``, t ``(...,3)``) if compute_scaling else (R, t).
    """
    hi = jax.lax.Precision.HIGHEST
    mu_x = jnp.mean(x, axis=-2, keepdims=True)
    mu_y = jnp.mean(y, axis=-2, keepdims=True)
    xc, yc = x - mu_x, y - mu_y
    cov = jnp.einsum("...ni,...nj->...ij", yc, xc, precision=hi)  # (3,3)
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision=hi))
    # Umeyama convention: d = ±1 only. sign(0) = 0 (degenerate/coplanar
    # covariance) would make R rank-deficient and drop S[2] from the scale;
    # treating det ≥ 0 as +1 keeps R a proper rotation in every case.
    d = jnp.where(det < 0, -1.0, 1.0).astype(x.dtype)
    D = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), cov.shape).copy()
    D = D.at[..., 2, 2].set(d)
    R = jnp.matmul(jnp.matmul(U, D, precision=hi), Vt, precision=hi)
    if compute_scaling:
        var_x = jnp.sum(xc * xc, axis=(-1, -2))
        s = jnp.sum(S * jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], -1), -1) / jnp.maximum(var_x, 1e-24)
        t = mu_y[..., 0, :] - s[..., None] * jnp.einsum(
            "...ij,...j->...i", R, mu_x[..., 0, :], precision=hi
        )
        return R, s, t
    t = mu_y[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_x[..., 0, :], precision=hi)
    return R, t
