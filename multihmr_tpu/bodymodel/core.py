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
    rotmats: jax.Array, joints: jax.Array, parents: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Compose per-joint local rotations along the kinematic tree.

    Args:
      rotmats: ``[B, J, 3, 3]`` local joint rotations.
      joints: ``[B, J, 3]`` rest-pose joint locations.
      parents: ``[J]`` parent indices, topologically ordered (parents[j] < j).
    Returns:
      (posed_joints ``[B, J, 3]``, rel_transforms ``[B, J, 4, 4]``) where
      rel_transforms map rest-pose-relative points to posed space (the "A"
      matrices of the SMPL paper: ``G_j @ inv(G_rest_j)`` in closed form).
    """
    B, J = rotmats.shape[0], rotmats.shape[1]
    rel_j = joints - jnp.where(
        (parents < 0)[None, :, None], 0.0, joints[:, jnp.clip(parents, 0)]
    )

    def compose(carry, inputs):
        # carry: [B, J, 4, 4] accumulated world transforms (filled progressively)
        world, j = carry
        R_j = rotmats[:, j]
        t_j = rel_j[:, j]
        local = jnp.concatenate(
            [
                jnp.concatenate([R_j, t_j[..., None]], axis=-1),
                jnp.broadcast_to(
                    jnp.array([0.0, 0.0, 0.0, 1.0], rotmats.dtype), (B, 1, 4)
                ),
            ],
            axis=-2,
        )  # [B, 4, 4]
        parent = jnp.clip(parents[j], 0)
        parent_world = jnp.where(parents[j] < 0, jnp.eye(4, dtype=rotmats.dtype), world[:, parent])
        world_j = jnp.matmul(parent_world, local, precision=jax.lax.Precision.HIGHEST)
        world = jax.lax.dynamic_update_index_in_dim(world, world_j, j, axis=1)
        return (world, j + 1), None

    init = jnp.zeros((B, J, 4, 4), rotmats.dtype)
    (world, _), _ = jax.lax.scan(compose, (init, 0), None, length=J)

    posed_joints = world[..., :3, 3]
    # A_j = G_j with translation replaced by t - R @ J_rest (closed-form
    # G_j @ inv([I | J_rest])), avoiding an explicit 4x4 inverse.
    corrected_t = posed_joints - _EINSUM("bjmn,bjn->bjm", world[..., :3, :3], joints)
    rel = world.at[..., :3, 3].set(corrected_t)
    return posed_joints, rel


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

    # --- shape & expression blendshapes ---
    v_shaped = model.v_template + _EINSUM(
        "bl,vcl->bvc", betas, model.shapedirs[..., :nb]
    )
    if expression is not None and model.exprdirs.shape[-1] > 0:
        ne = expression.shape[-1]
        v_shaped = v_shaped + _EINSUM(
            "bl,vcl->bvc", expression, model.exprdirs[..., :ne]
        )

    # --- rest-pose joints ---
    joints_rest = _EINSUM("jv,bvc->bjc", model.J_regressor, v_shaped)

    # --- pose-corrective blendshapes ---
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rotmats[:, 1:] - eye).reshape(B, -1)  # [B, 9*(J-1)]
    v_posed = v_shaped + _EINSUM("bp,pv->bv", pose_feature, model.posedirs).reshape(
        B, -1, 3
    )

    # --- forward kinematics ---
    posed_joints, rel = _forward_kinematics(rotmats, joints_rest, model.parents)

    # --- linear blend skinning ---
    T = _EINSUM("vj,bjmn->bvmn", model.lbs_weights, rel)  # [B, V, 4, 4]
    verts = (
        _EINSUM("bvmn,bvn->bvm", T[..., :3, :3], v_posed) + T[..., :3, 3]
    )

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
        "rel_transforms": rel,
    }
