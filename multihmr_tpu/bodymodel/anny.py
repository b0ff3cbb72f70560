"""Anny-style phenotype body model.

The reference's second model family loads the ``anny`` package
(``anny.create_fullbody_model(...)``, reference multi_hmr_anny/multi_hmr.py:70):
a MakeHuman-derived parametric body with 163 bones, LBS skinning and
*phenotype* controls (age/gender/weight/height/muscle/proportions in [0,1])
that map to blendshape coefficients.

TPU-native design: the phenotype→blendshape mapping is stored as a
**multilinear lattice** — per-phenotype knot positions plus the blendshape
coefficients the source package produces at every knot combination. At
runtime coefficients are multilinear-interpolated over the 2^6 surrounding
lattice corners (64 static gathers + fused multiply-adds). MakeHuman macro
interpolation is piecewise-linear per control with breakpoints at category
positions, so a lattice whose knots superset those breakpoints reproduces
the package **exactly** — with no dependency on its internal API. Everything
downstream (blendshapes → FK → LBS) is the shared einsum core in
bodymodel/core.py.

Assets: ``tools/convert_anny.py`` probes the licensed ``anny`` package
black-box and writes the npz container :func:`load_anny_npz` reads;
:func:`synthetic_anny_model` is the structure-identical stand-in used by
tests and benchmarks when no asset is present.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multihmr_tpu.bodymodel.core import (
    BodyModel,
    lbs_forward,
    world_transforms_homogeneous,
)

# Phenotypes the reference regresses (multi_hmr_anny/multi_hmr.py:170-172);
# the network's shape vector is indexed by the asset's ``phenotype_labels``
# order, these six are picked out by name.
USED_PHENOTYPES = ("age", "gender", "weight", "height", "muscle", "proportions")
# Default labels for the synthetic stand-in (a real asset provides its own).
PHENOTYPE_LABELS = (
    "age", "gender", "weight", "height", "muscle", "proportions", "race",
    "cup_size", "firmness", "asymmetry",
)
NUM_BONES = 163


@dataclasses.dataclass(frozen=True)
class AnnyModel:
    """Anny constants: a BodyModel skeleton + lattice phenotype mapping.

    ``pheno_knots [n_used, n_knots]`` are sorted per-dimension knot positions
    in [0,1]; ``pheno_lattice [n_knots**n_used, n_blend]`` holds blendshape
    coefficients at every knot combination (row-major over dims, last dim
    fastest). ``bone_labels`` / ``phenotype_labels`` are the source package's
    label lists (static metadata — the reference resolves ``person_center``
    and the shape-vector indices by name, multi_hmr_anny/multi_hmr.py:72,
    170-172).
    """

    base: BodyModel  # shapedirs here are the blendshape targets
    pheno_knots: jax.Array  # [n_used, n_knots]
    pheno_lattice: jax.Array  # [n_knots**n_used, n_blend]
    bone_labels: Tuple[str, ...] = tuple(f"bone_{i:03d}" for i in range(NUM_BONES))
    phenotype_labels: Tuple[str, ...] = PHENOTYPE_LABELS

    @property
    def num_knots(self) -> int:
        return self.pheno_knots.shape[1]

    @property
    def faces(self) -> jax.Array:
        """Mesh triangles (render/demo paths read ``body_model.faces``)."""
        return self.base.faces

    def person_center_index(self, name: str) -> int:
        """Resolve a bone name to its index (reference multi_hmr.py:72)."""
        return self.bone_labels.index(name)

    def used_phenotype_indices(self) -> list:
        """Position of each used phenotype in the asset's shape vector
        (reference multi_hmr_anny/multi_hmr.py:170-172 keys by label)."""
        return [self.phenotype_labels.index(n) for n in USED_PHENOTYPES]


jax.tree_util.register_dataclass(
    AnnyModel,
    data_fields=["base", "pheno_knots", "pheno_lattice"],
    meta_fields=["bone_labels", "phenotype_labels"],
)


def phenotype_to_coeffs(model: AnnyModel, phenotypes: Dict[str, jax.Array]) -> jax.Array:
    """Multilinear lattice interpolation: phenotype dict (each ``[B]`` in
    [0,1]) → blendshape coefficients ``[B, n_blend]``.

    Exact reproduction of the source package wherever its mapping is
    piecewise-multilinear between the stored knots (MakeHuman macro
    interpolation is). 2^n_used corner gathers, statically unrolled.
    """
    n_used = len(USED_PHENOTYPES)
    nk = model.num_knots
    p = jnp.stack([phenotypes[n] for n in USED_PHENOTYPES], axis=-1)  # [B, n]

    # per-dim interval + fractional position
    los, ts = [], []
    for d in range(n_used):
        knots = model.pheno_knots[d]  # [nk] sorted
        pd = jnp.clip(p[:, d], knots[0], knots[-1])
        lo = jnp.clip(jnp.searchsorted(knots, pd, side="right") - 1, 0, nk - 2)
        k_lo = knots[lo]
        k_hi = knots[lo + 1]
        ts.append((pd - k_lo) / jnp.maximum(k_hi - k_lo, 1e-12))
        los.append(lo)

    # strides for row-major [nk]*n_used flattening
    strides = [nk ** (n_used - 1 - d) for d in range(n_used)]
    coeffs = None
    for corner in range(2 ** n_used):
        idx = 0
        w = None
        for d in range(n_used):
            bit = (corner >> (n_used - 1 - d)) & 1
            idx = idx + (los[d] + bit) * strides[d]
            wd = ts[d] if bit else (1.0 - ts[d])
            w = wd if w is None else w * wd
        c = model.pheno_lattice[idx] * w[:, None]  # [B, n_blend]
        coeffs = c if coeffs is None else coeffs + c
    return coeffs


def anny_forward(
    model: AnnyModel,
    pose_matrices: jax.Array,  # [B, J, 4, 4] homogeneous per-bone rotations
    phenotypes: Dict[str, jax.Array],  # each [B]
) -> dict:
    """Equivalent of ``body_model(pose_parameters=..., phenotype_kwargs=...)``
    (reference multi_hmr_anny/multi_hmr.py:178-181): returns
    ``{vertices, bone_poses, joints, blendshape_coeffs}``."""
    coeffs = phenotype_to_coeffs(model, phenotypes)  # [B, n_blend]
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
    num_vertices: int = 256,
    num_bones: int = NUM_BONES,
    n_blend: int = 20,
    num_knots: int = 3,
    seed: int = 1,
) -> AnnyModel:
    """Structure-identical random stand-in (tests/bench; real assets are
    licensed and never shipped — load them via :func:`load_anny_npz`)."""
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
    n_used = len(USED_PHENOTYPES)
    knots = np.broadcast_to(np.linspace(0.0, 1.0, num_knots), (n_used, num_knots))
    lattice = rng.normal(scale=0.3, size=(num_knots ** n_used, n_blend))
    # synthetic bone labels, but with the names the reference resolves
    labels = [f"bone_{i:03d}" for i in range(num_bones)]
    if num_bones > 16:
        labels[0], labels[15] = "root", "head"
    return AnnyModel(
        base=base,
        pheno_knots=jnp.asarray(knots, jnp.float32),
        pheno_lattice=jnp.asarray(lattice, jnp.float32),
        bone_labels=tuple(labels),
        phenotype_labels=PHENOTYPE_LABELS,
    )


def load_anny_npz(path: str) -> AnnyModel:
    """Load a converted Anny asset written by ``tools/convert_anny.py``.

    The container holds the probed BodyModel fields (rest vertices,
    blendshape targets, joint regressor, skinning weights, parents), the
    phenotype lattice, and the label lists.
    """
    data = np.load(path, allow_pickle=False)
    f32 = lambda k: jnp.asarray(data[k], jnp.float32)
    base = BodyModel(
        v_template=f32("v_template"),
        shapedirs=f32("shapedirs"),
        exprdirs=jnp.zeros((data["v_template"].shape[0], 3, 0), jnp.float32),
        posedirs=jnp.zeros(
            (9 * (data["parents"].shape[0] - 1), data["v_template"].shape[0] * 3),
            jnp.float32,
        ),
        J_regressor=f32("J_regressor"),
        lbs_weights=f32("lbs_weights"),
        parents=jnp.asarray(data["parents"], jnp.int32),
        extra_joint_vertex_ids=jnp.zeros((0,), jnp.int32),
        faces=jnp.asarray(
            data["faces"] if "faces" in data else np.zeros((0, 3)), jnp.int32
        ),
        lmk_faces_idx=jnp.zeros((0,), jnp.int32),
        lmk_bary_coords=jnp.zeros((0, 3), jnp.float32),
    )
    bone_labels = tuple(str(s) for s in data["bone_labels"])
    phenotype_labels = tuple(str(s) for s in data["phenotype_labels"])
    return AnnyModel(
        base=base,
        pheno_knots=f32("pheno_knots"),
        pheno_lattice=f32("pheno_lattice"),
        bone_labels=bone_labels,
        phenotype_labels=phenotype_labels,
    )


def save_anny_npz(path: str, model: AnnyModel) -> None:
    """Inverse of :func:`load_anny_npz` (used by tools/convert_anny.py)."""
    np.savez_compressed(
        path,
        v_template=np.asarray(model.base.v_template),
        shapedirs=np.asarray(model.base.shapedirs),
        J_regressor=np.asarray(model.base.J_regressor),
        lbs_weights=np.asarray(model.base.lbs_weights),
        parents=np.asarray(model.base.parents),
        faces=np.asarray(model.base.faces),
        pheno_knots=np.asarray(model.pheno_knots),
        pheno_lattice=np.asarray(model.pheno_lattice),
        bone_labels=np.asarray(list(model.bone_labels)),
        phenotype_labels=np.asarray(list(model.phenotype_labels)),
    )
