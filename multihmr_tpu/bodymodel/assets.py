"""Body-model asset loading.

Loads the official (licensed, user-supplied) SMPL-X npz / SMPL pkl files into
:class:`~multihmr_tpu.bodymodel.core.BodyModel` pytrees — the counterpart of
``smplx.create(...)`` at reference blocks/smpl_layer.py:38 and train.py:41-43.
Also provides a deterministic *synthetic* body model so the entire framework
(tests, benchmarks, demos) runs without the licensed assets.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
import jax.numpy as jnp

from multihmr_tpu.bodymodel.core import BodyModel
from multihmr_tpu.bodymodel import constants

SHAPE_SPACE_DIM = 300  # full SMPL-X shape space; num_betas slices into it


def _to_np(x) -> np.ndarray:
    """Convert array-ish objects (incl. chumpy arrays inside SMPL pkls and
    scipy sparse J_regressors) to dense float/int numpy."""
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    if hasattr(x, "r"):  # chumpy
        return np.asarray(x.r)
    return np.asarray(x)


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickle SMPL pkl files without chumpy installed: any missing module
    resolves to a stub whose instances expose ``.r`` via __array__."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            class _Stub:  # pragma: no cover - structure depends on file
                def __init__(self, *a, **k):
                    pass

                def __setstate__(self, state):
                    self.__dict__.update(state if isinstance(state, dict) else {})

                @property
                def r(self):
                    for key in ("x", "a", "_data"):
                        if key in self.__dict__:
                            return np.asarray(self.__dict__[key])
                    raise ValueError("cannot extract array from stub pickle object")

            _Stub.__name__ = name
            return _Stub


def load_smplx_npz(
    path: str,
    num_betas: int = 10,
    num_expression: int = 10,
    dtype=jnp.float32,
) -> BodyModel:
    """Load an official ``SMPLX_{GENDER}.npz`` asset.

    Field semantics mirror the smplx package's SMPLX constructor with
    ``use_pca=False, flat_hand_mean=True`` (the exact configuration the
    reference uses, blocks/smpl_layer.py:38): hand poses are consumed raw,
    expression dirs are shapedirs[..., 300:].
    """
    data = np.load(path, allow_pickle=True)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)
    if shapedirs.shape[-1] >= SHAPE_SPACE_DIM:
        exprdirs = shapedirs[..., SHAPE_SPACE_DIM : SHAPE_SPACE_DIM + num_expression]
        shapedirs = shapedirs[..., :num_betas]
    else:  # legacy assets pack 10 shape + 10 expression
        if num_betas > 10:
            # the 11th beta does not exist in a 20-column asset — slicing
            # past 10 would hand expression column 0 to BOTH beta 10 and
            # expression 0, silently corrupting every shaped vertex (the
            # smplx package caps num_betas at 10 for these assets)
            raise ValueError(
                f"num_betas={num_betas} needs the {SHAPE_SPACE_DIM}-column "
                f"SMPL-X shape space; this legacy asset has "
                f"{shapedirs.shape[-1]} columns (10 shape + expression). "
                "Use num_betas<=10 or the full official npz."
            )
        exprdirs = shapedirs[..., 10 : 10 + num_expression]
        shapedirs = shapedirs[..., :num_betas]
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    V = posedirs.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T  # [9*(J-1), V*3]
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    return BodyModel(
        v_template=jnp.asarray(_to_np(data["v_template"]), dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        exprdirs=jnp.asarray(exprdirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(_to_np(data["J_regressor"]), dtype),
        lbs_weights=jnp.asarray(_to_np(data["weights"]), dtype),
        parents=jnp.asarray(parents, jnp.int32),
        extra_joint_vertex_ids=jnp.asarray(
            constants.extra_joint_vertex_ids("smplx"), jnp.int32
        ),
        faces=jnp.asarray(_to_np(data["f"]).astype(np.int64), jnp.int32),
        lmk_faces_idx=jnp.asarray(
            _to_np(data["lmk_faces_idx"]).astype(np.int64), jnp.int32
        ),
        lmk_bary_coords=jnp.asarray(_to_np(data["lmk_bary_coords"]), dtype),
    )


def load_smpl_pkl(path: str, num_betas: int = 10, dtype=jnp.float32) -> BodyModel:
    """Load an official ``SMPL_{GENDER}.pkl`` (6,890 verts, 24 joints) —
    needed for 3DPW ground truth (reference train.py:42-43)."""
    with open(path, "rb") as f:
        data = _TolerantUnpickler(f, encoding="latin1").load()
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    V = posedirs.shape[0]
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    return BodyModel(
        v_template=jnp.asarray(_to_np(data["v_template"]), dtype),
        shapedirs=jnp.asarray(
            _to_np(data["shapedirs"]).astype(np.float32)[..., :num_betas], dtype
        ),
        exprdirs=jnp.zeros((V, 3, 0), dtype),
        posedirs=jnp.asarray(posedirs.reshape(V * 3, -1).T, dtype),
        J_regressor=jnp.asarray(_to_np(data["J_regressor"]), dtype),
        lbs_weights=jnp.asarray(_to_np(data["weights"]), dtype),
        parents=jnp.asarray(parents, jnp.int32),
        extra_joint_vertex_ids=jnp.asarray(
            constants.extra_joint_vertex_ids("smpl"), jnp.int32
        ),
        faces=jnp.asarray(_to_np(data["f"]).astype(np.int64), jnp.int32),
        lmk_faces_idx=jnp.zeros((0,), jnp.int32),
        lmk_bary_coords=jnp.zeros((0, 3), dtype),
    )


def synthetic_body_model(
    num_vertices: int = 128,
    num_joints: int = 12,
    num_betas: int = 10,
    num_expression: int = 10,
    num_extra: int = 4,
    num_lmk: int = 3,
    seed: int = 0,
    dtype=jnp.float32,
) -> BodyModel:
    """Small deterministic body model with the SMPL-X structure.

    Used by the test-suite and the no-assets demo path: a chain-with-branches
    skeleton, smooth random blendshapes and distance-based skinning weights.
    Statistically unlike a human, structurally identical to SMPL-X.
    """
    rng = np.random.default_rng(seed)
    # joints on a rough vertical chain with two branches
    parents = np.zeros(num_joints, dtype=np.int64)
    parents[0] = -1
    for j in range(1, num_joints):
        parents[j] = (j - 1) if j % 3 != 0 else max(0, j - 3)
    joints = np.cumsum(rng.normal(scale=0.15, size=(num_joints, 3)), axis=0)
    joints[0] = 0.0
    # vertices scattered around the joints
    owner = rng.integers(0, num_joints, size=num_vertices)
    v_template = joints[owner] + rng.normal(scale=0.08, size=(num_vertices, 3))
    # skinning weights: softmax of negative distance to joints
    d2 = ((v_template[:, None] - joints[None]) ** 2).sum(-1)
    w = np.exp(-d2 / 0.02)
    w = w / w.sum(-1, keepdims=True)
    # J_regressor recovering approximately the joint positions
    Jr = np.exp(-d2.T / 0.005)
    Jr = Jr / Jr.sum(-1, keepdims=True)
    # locally-connected faces (each triangle spans spatially-near vertices,
    # like a real mesh) so rendering paths see realistic triangle sizes
    order = np.lexsort((v_template[:, 2], v_template[:, 1], v_template[:, 0]))
    f0 = order[np.arange(3 * num_vertices) % num_vertices]
    f1 = order[(np.arange(3 * num_vertices) + 1) % num_vertices]
    f2 = order[(np.arange(3 * num_vertices) + 2) % num_vertices]
    faces = np.stack([f0, f1, f2], axis=1)
    return BodyModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(
            rng.normal(scale=0.01, size=(num_vertices, 3, num_betas)), dtype
        ),
        exprdirs=jnp.asarray(
            rng.normal(scale=0.003, size=(num_vertices, 3, num_expression)), dtype
        ),
        posedirs=jnp.asarray(
            rng.normal(scale=0.001, size=(9 * (num_joints - 1), num_vertices * 3)),
            dtype,
        ),
        J_regressor=jnp.asarray(Jr, dtype),
        lbs_weights=jnp.asarray(w, dtype),
        parents=jnp.asarray(parents, jnp.int32),
        extra_joint_vertex_ids=jnp.asarray(
            rng.integers(0, num_vertices, size=num_extra), jnp.int32
        ),
        faces=jnp.asarray(faces, jnp.int32),
        lmk_faces_idx=jnp.asarray(
            rng.integers(0, faces.shape[0], size=num_lmk), jnp.int32
        ),
        lmk_bary_coords=jnp.asarray(
            rng.dirichlet(np.ones(3), size=num_lmk), dtype
        ),
    )


def load_smplx2smpl(path: str) -> np.ndarray:
    """Load the 10475→6890 vertex regressor used for 3DPW eval (reference
    train.py:44-45, asset ``smplx2smpl.pkl`` with a scipy-sparse 'matrix')."""
    with open(path, "rb") as f:
        data = _TolerantUnpickler(f, encoding="latin1").load()
    m = data["matrix"] if isinstance(data, dict) else data
    return _to_np(m).astype(np.float32)


def load_j_regressor_h36m(path: str) -> np.ndarray:
    """Load ``J_regressor_h36m.npy`` [17, 6890] (reference train.py:400)."""
    return np.load(path).astype(np.float32)


def load_mean_params(path: Optional[str], nrot: int = 53, num_betas: int = 10):
    """Load ``smpl_mean_params.npz`` (reference model.py:440-477) or fall
    back to neutral defaults. Returns dict with 6d ``pose [1, nrot*6]``,
    ``shape [1, num_betas]``, ``cam [1, 3]``, ``expression [1, 10]``.

    Note: converted checkpoints carry these as buffers, so the file is only
    needed when training from scratch.
    """
    if path is not None and os.path.exists(path):
        mean = np.load(path)
        pose24 = mean["pose"].astype(np.float32).reshape(1, -1)
        shape = mean["shape"].astype(np.float32).reshape(1, -1)
        cam = mean["cam"].astype(np.float32).reshape(1, -1)
    else:
        # neutral: identity 6d per joint, zero shape, unit-ish cam
        pose24 = np.tile(
            np.array([[1, 0, 0, 0, 1, 0]], np.float32), (1, 24)
        ).reshape(1, -1)
        shape = np.zeros((1, 10), np.float32)
        cam = np.array([[0.9, 0.0, 0.0]], np.float32)

    if nrot == 53:
        # reference model.py:444-453: eye-derived 6d for joints beyond the
        # file's 24, the first 24 overwritten by the SMPL mean pose.
        # DELIBERATE deviation: the reference flattens eye(3)[:, :2]
        # row-major → [1,0,0,1,0,0], which under the interleaved-row 6d
        # convention (utils/humans.py:20 reshape(-1,2,3)) is two PARALLEL
        # vectors — rank-deficient under Gram-Schmidt, i.e. the reference's
        # own from-scratch init for hands/jaw is degenerate (checkpoints
        # overwrite these buffers, masking it). We use the proper identity
        # 6d [1,0,0,0,1,0] (a1=e1, a2=e2 → R=I) instead; converted
        # checkpoints still carry the reference's exact buffers.
        eye6d = np.array([[1, 0, 0, 0, 1, 0]], np.float32)
        pose = np.tile(eye6d, (1, nrot))
        pose[:, : 24 * 6] = pose24[:, : 24 * 6]
    else:
        pose = pose24
    shape = shape[:, :num_betas]
    if shape.shape[1] < num_betas:
        shape = np.concatenate(
            [shape, np.zeros((1, num_betas - shape.shape[1]), np.float32)], 1
        )
    expression = np.zeros((1, 10), np.float32)
    return {"pose": pose, "shape": shape, "cam": cam, "expression": expression}
