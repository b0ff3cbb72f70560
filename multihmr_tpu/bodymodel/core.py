"""Parametric body-model core: blendshapes + forward kinematics + LBS.

The reference outsources this to the ``smplx`` package (CUDA-backed torch
ops; loaded at reference blocks/smpl_layer.py:38, never vendored). This is a
from-scratch JAX implementation of the same mathematical model (SMPL-family
linear blend skinning, Loper et al. / Pavlakos et al.), designed TPU-first:

  * the whole forward is a handful of large einsums (MXU-friendly) plus one
    ``lax.scan`` over the kinematic chain (55 tiny 4x4 composes — negligible
    next to the 10k-vertex blendshape/skinning matmuls);
  * everything is shape-static and jit/vmap/grad-safe;
  * the model data is a frozen pytree (:class:`BodyModel`) so it shards /
    replicates like any other parameter set under ``jax.sharding``.

Vertex counts: SMPL-X 10,475 / SMPL 6,890 (reference SURVEY §2.2-B).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_EINSUM = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BodyModel:
    """Body-model constants as a pytree of arrays.

    Mirrors the content of the official SMPL-X npz / SMPL pkl assets
    (which users must supply themselves — they are licensed and never
    shipped with either the reference or this framework).
    """

    v_template: jax.Array  # [V, 3]
    shapedirs: jax.Array  # [V, 3, B] shape blendshapes
    exprdirs: jax.Array  # [V, 3, E] expression blendshapes (E=0 for SMPL)
    posedirs: jax.Array  # [9*(J-1), V*3] pose-corrective blendshapes
    J_regressor: jax.Array  # [J, V]
    lbs_weights: jax.Array  # [V, J]
    parents: jax.Array  # [J] int32, parents[0] == -1 (root)
    # Extra output joints regressed from vertices (SMPL-X: 21 keypoints)
    extra_joint_vertex_ids: jax.Array  # [n_extra] int32 (may be empty)
    # Static face landmarks via barycentric face embedding (SMPL-X: 51)
    faces: jax.Array  # [F, 3] int32 triangle indices
    lmk_faces_idx: jax.Array  # [n_lmk] int32 (may be empty)
    lmk_bary_coords: jax.Array  # [n_lmk, 3]

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_output_joints(self) -> int:
        return (
            self.num_joints
            + self.extra_joint_vertex_ids.shape[0]
            + self.lmk_faces_idx.shape[0]
        )


def _forward_kinematics(
    rotmats: jax.Array, joints: jax.Array, parents
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compose per-joint local rotations along the kinematic tree.

    The loop is statically unrolled over the (static, ≤163-joint) tree with
    (R, t) pairs instead of 4x4 homogeneous matrices: dynamic-slice updates
    on ``[B, J, 4, 4]`` layouts compile pathologically on TPU (sub-tile
    trailing dims + per-step DUS), while 55 static 3x3 composes fold into a
    flat, layout-stable XLA graph.

    Args:
      rotmats: ``[B, J, 3, 3]`` local joint rotations.
      joints: ``[B, J, 3]`` rest-pose joint locations.
      parents: ``[J]`` parent indices, topologically ordered (parents[j] < j).
        Must be trace-time static (body-model constants are closure
        constants, never jit arguments).
    Returns:
      (posed_joints ``[B, J, 3]``, world_R ``[B, J, 3, 3]``,
       rel_t ``[B, J, 3]``) where (world_R, rel_t) form the skinning
      transform A_j = [world_R_j | posed_j − world_R_j @ rest_j] (the SMPL
      "G_j inv(G_rest_j)" in closed form, no 4x4 inverse).
    """
    import numpy as np

    parents = np.asarray(jax.device_get(parents))
    J = rotmats.shape[1]
    hi = jax.lax.Precision.HIGHEST

    world_R = [None] * J
    world_t = [None] * J
    for j in range(J):
        R_j = rotmats[:, j]
        p = int(parents[j])
        if p < 0:
            world_R[j] = R_j
            world_t[j] = joints[:, j]
        else:
            t_j = joints[:, j] - joints[:, p]
            world_R[j] = jnp.matmul(world_R[p], R_j, precision=hi)
            world_t[j] = (
                jnp.einsum("bmn,bn->bm", world_R[p], t_j, precision=hi)
                + world_t[p]
            )
    Rw = jnp.stack(world_R, axis=1)  # [B, J, 3, 3]
    posed_joints = jnp.stack(world_t, axis=1)  # [B, J, 3]
    rel_t = posed_joints - _EINSUM("bjmn,bjn->bjm", Rw, joints)
    return posed_joints, Rw, rel_t


def lbs_forward(
    model: BodyModel,
    rotmats: jax.Array,
    betas: jax.Array,
    expression: Optional[jax.Array] = None,
) -> dict:
    """Full body-model forward pass.

    Args:
      model: body-model constants.
      rotmats: ``[B, J, 3, 3]`` per-joint rotations (J model joints,
        including the global orient at index 0).
      betas: ``[B, num_betas]`` shape coefficients (num_betas may be less
        than the asset's blendshape count; the rest are treated as zero).
      expression: optional ``[B, E]`` expression coefficients.
    Returns:
      dict with ``vertices [B, V, 3]``, ``joints [B, J_out, 3]`` (FK joints
      ++ vertex-selector extras ++ face landmarks, the smplx output-joint
      layout the reference indexes with JOINT_NAMES[:127],
      utils/humans.py:25-26), ``joints_fk``, ``rel_transforms``.
    """
    B = rotmats.shape[0]
    dtype = rotmats.dtype
    nb = betas.shape[-1]

    # --- shape & expression blendshapes (as [B, L] x [L, V*3] matmuls:
    # big lane dimension, no sub-tile trailing axes) ---
    V = model.num_vertices
    sd = model.shapedirs[..., :nb].reshape(V * 3, nb)
    v_shaped = model.v_template + _EINSUM("bl,vl->bv", betas, sd).reshape(B, V, 3)
    if expression is not None and model.exprdirs.shape[-1] > 0:
        ne = expression.shape[-1]
        ed = model.exprdirs[..., :ne].reshape(V * 3, ne)
        v_shaped = v_shaped + _EINSUM("bl,vl->bv", expression, ed).reshape(B, V, 3)

    # --- rest-pose joints ---
    joints_rest = _EINSUM("jv,bvc->bjc", model.J_regressor, v_shaped)

    # --- pose-corrective blendshapes ---
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rotmats[:, 1:] - eye).reshape(B, -1)  # [B, 9*(J-1)]
    v_posed = v_shaped + _EINSUM("bp,pv->bv", pose_feature, model.posedirs).reshape(
        B, -1, 3
    )

    # --- forward kinematics ---
    posed_joints, world_R, rel_t = _forward_kinematics(
        rotmats, joints_rest, model.parents
    )

    # --- linear blend skinning, TPU layout: keep the 10k-vertex axis LAST
    # (lane dimension) so XLA tiles [.., V] instead of padding sub-tile
    # [V, 3, 3] trailing dims. Blend the 12 transform entries with ONE
    # [B*12, J] x [J, V] MXU matmul, then contract the 3x3 per-vertex
    # rotation on the VPU (3 fused multiply-adds over the lane axis).
    A = jnp.concatenate(
        [world_R.reshape(B, -1, 9), rel_t], axis=-1
    )  # [B, J, 12]
    T = _EINSUM("bjp,vj->bpv", A, model.lbs_weights)  # [B, 12, V]
    vp = v_posed.transpose(0, 2, 1)  # [B, 3, V]
    out_rows = [
        T[:, 3 * m + 0] * vp[:, 0] + T[:, 3 * m + 1] * vp[:, 1]
        + T[:, 3 * m + 2] * vp[:, 2] + T[:, 9 + m]
        for m in range(3)
    ]
    verts = jnp.stack(out_rows, axis=-1)  # [B, V, 3]

    # --- output joint set (smplx layout) ---
    out_joints = [posed_joints]
    if model.extra_joint_vertex_ids.shape[0] > 0:
        out_joints.append(verts[:, model.extra_joint_vertex_ids])
    if model.lmk_faces_idx.shape[0] > 0:
        lmk_tris = model.faces[model.lmk_faces_idx]  # [n_lmk, 3]
        lmk_verts = verts[:, lmk_tris]  # [B, n_lmk, 3, 3]
        lmks = _EINSUM("blkc,lk->blc", lmk_verts, model.lmk_bary_coords)
        out_joints.append(lmks)
    joints = jnp.concatenate(out_joints, axis=1)

    return {
        "vertices": verts,
        "joints": joints,
        "joints_fk": posed_joints,
        "world_rot": world_R,  # [B, J, 3, 3] world-frame joint rotations
        "rel_t": rel_t,  # [B, J, 3] skinning translations
    }


def world_transforms_homogeneous(out: dict) -> jax.Array:
    """Assemble ``[B, J, 4, 4]`` world transforms (G matrices: translation =
    posed joint position) from an :func:`lbs_forward` output — the Anny
    ``bone_poses`` layout (reference multi_hmr_anny/multi_hmr.py:179)."""
    R = out["world_rot"]
    t = out["joints_fk"]
    B, J = R.shape[:2]
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # [B, J, 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (B, J, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
