"""Multi-HMR Anny variant (the ``multiHMR_672_L_anny`` family).

Equivalent of reference multi_hmr_anny/{multi_hmr,encoder,hph}.py, static-
shape TPU redesign like the SMPL-X variant:

  * Encoder regresses per-patch detection scores AND the camera FOV from the
    cls token (``fov = π·sigmoid``, ``focal = (S/2)/tan(fov/2)``) — reference
    encoder.py:49-56;
  * decoder queries are linear-projected patch features + 2D sincos
    pos-embedding at the detected cells (no learned query/value injection,
    no mean-param token concat) — reference multi_hmr.py:131-143;
  * MLP heads for offset / pose(163 joints, 6d) / shape(sigmoid phenotypes)
    / dist, with ``dist = focal / exp(d)`` "simple depth encoding" —
    reference multi_hmr.py:149-153;
  * ``useful_rotmat`` blends the 163 regressed rotations with identity for
    the bones the model does not control — reference multi_hmr.py:79-88,
    161-164;
  * Anny phenotype body model forward; persons sorted by depth host-side.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multihmr_tpu.config import ViTConfig
from multihmr_tpu.bodymodel.anny import (
    AnnyModel,
    anny_forward,
    USED_PHENOTYPES,
    NUM_BONES,
)
from multihmr_tpu.models.vit import DINOv2ViT
from multihmr_tpu.models.hph import MaskedSelfAttention, MaskedCrossAttention, FeedForward
from multihmr_tpu.models.multihmr import RegressionMLP
from multihmr_tpu.ops.detection import (
    Detections,
    nms_maxpool,
    topk_detect,
    gather_grid,
)
from multihmr_tpu.ops.image import tokens_to_grid, grid_to_tokens
from multihmr_tpu.ops.posenc import get_2d_sincos_pos_embed
from multihmr_tpu.ops.camera import (
    inverse_perspective_projection,
    perspective_projection,
)
from multihmr_tpu.ops.rotations import (
    rot6d_cols_to_rotmat,
    rotmat_to_rotvec,
    rotation_to_homogeneous,
)

# reference multi_hmr_anny/multi_hmr.py:79-88 — which of the 163 bone
# rotations are regressed (1) vs pinned to identity (0).
USEFUL_ROTMAT = np.array(
    [1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0],
    dtype=np.float32,
)


@dataclasses.dataclass(frozen=True)
class AnnyConfig:
    """Reference multi_hmr_anny/multi_hmr.py:22-44 defaults."""

    backbone: str = "dinov2_vitl14"
    img_size: int = 672
    xat_dim: int = 512
    xat_depth: int = 8
    xat_heads: int = 16
    xat_dim_head: int = 32
    xat_mlp_dim: int = 4 * 512
    person_center: str = "head"
    num_betas: int = 11
    n_joints: int = NUM_BONES
    max_people: int = 16
    compute_dtype: str = "bfloat16"
    # training-memory knobs, same semantics as ModelConfig.remat/remat_policy
    remat: bool = False
    remat_policy: str = "block"
    vit_override: Optional[ViTConfig] = None

    @property
    def vit(self) -> ViTConfig:
        if self.vit_override is not None:
            return self.vit_override
        from multihmr_tpu.config import _BACKBONES

        return _BACKBONES[self.backbone]

    @property
    def patch_size(self) -> int:
        return self.vit.patch_size

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size


class AnnyEncoder(nn.Module):
    """ViT + per-patch detection + FOV→K (reference multi_hmr_anny/encoder.py).

    ``mesh``/``tp_mode``: tensor/sequence-parallel attention inside the ViT,
    same plumbing as the SMPL-X variant (models/multihmr.py MultiHMRNet).
    """

    cfg: AnnyConfig
    mesh: object = None
    tp_mode: str = "heads"

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        g = c.grid_size
        vit = DINOv2ViT(c.vit, grid_size=g, dtype=dt,
                        remat=c.remat, remat_policy=c.remat_policy,
                        mesh=self.mesh, tp_mode=self.tp_mode, name="backbone")
        out = vit(x)
        feat = tokens_to_grid(out["patch_tokens"].astype(jnp.float32), g)  # [B,g,g,D]
        cls = out["cls_token"].astype(jnp.float32)

        scores_logits = RegressionMLP(c.vit.embed_dim, 1, name="mlp_det")(feat)[..., 0]
        scores = jax.nn.sigmoid(scores_logits)

        fov = math.pi * jax.nn.sigmoid(
            RegressionMLP(c.vit.embed_dim, 1, name="mlp_fov_unique")(cls)
        )  # [B,1], radians in (0, π)
        focal = (c.img_size / 2.0) / jnp.tan(fov / 2.0)  # [B,1]
        B = x.shape[0]
        K = jnp.zeros((B, 3, 3), jnp.float32)
        K = K.at[:, 0, 0].set(focal[:, 0]).at[:, 1, 1].set(focal[:, 0])
        K = K.at[:, 0, 2].set(c.img_size / 2.0).at[:, 1, 2].set(c.img_size / 2.0)
        K = K.at[:, 2, 2].set(1.0)
        return {
            "scores_logits": scores_logits,
            "scores": scores,
            "K": K,
            "fov": fov,
            "feat": feat,
        }


class AnnyHPH(nn.Module):
    """Masked SA/CA/FF decoder stack (reference multi_hmr_anny/hph.py:142-151)."""

    cfg: AnnyConfig

    @nn.compact
    def __call__(self, queries, context, mask):
        c = self.cfg
        x = queries
        for i in range(c.xat_depth):
            y = nn.LayerNorm(epsilon=1e-5, name=f"sa_norm{i}")(x * mask[..., None])
            x = MaskedSelfAttention(
                c.xat_dim, c.xat_heads, c.xat_dim_head, name=f"sa{i}"
            )(y, mask) + x * mask[..., None]
            y = nn.LayerNorm(epsilon=1e-5, name=f"ca_norm{i}")(x)
            x = MaskedCrossAttention(
                c.xat_dim, c.xat_dim, c.xat_heads, c.xat_dim_head, name=f"ca{i}"
            )(y, context, mask) + x
            y = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm{i}")(x)
            x = FeedForward(c.xat_dim, c.xat_mlp_dim, name=f"ff{i}")(y) + x
        return x * mask[..., None]


class MultiHMRAnnyNet(nn.Module):
    cfg: AnnyConfig
    mesh: object = None
    tp_mode: str = "heads"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        K: Optional[jax.Array] = None,
        det_thresh: float = 0.3,
        nms_kernel_size: int = 3,
        is_training: bool = False,
        gt_det: Optional[Detections] = None,
    ):
        c = self.cfg
        g = c.grid_size
        B = x.shape[0]
        enc = AnnyEncoder(c, mesh=self.mesh, tp_mode=self.tp_mode,
                          name="encoder")(x)
        K_regressed = enc["K"]
        K_used = K_regressed if K is None else K

        scores = enc["scores"]
        if not is_training:
            scores_nms = nms_maxpool(scores, nms_kernel_size)
            det = topk_detect(scores_nms, det_thresh, c.max_people)
        else:
            assert gt_det is not None
            det = gt_det

        # decoder tokens = projected features + 2D sincos pos-embedding
        pos = self.variable(
            "constants",
            "dec_pos_emb",
            lambda: jnp.asarray(
                get_2d_sincos_pos_embed(c.xat_dim, g), jnp.float32
            ).reshape(g, g, c.xat_dim),
        ).value
        dec_emb = nn.Dense(c.xat_dim, name="dec_to_token")(enc["feat"]) + pos[None]
        if self.mesh is not None:
            # Pin the encoder→decoder boundary to batch-on-'data' (same
            # involuntary-remat guard as models/multihmr.py).
            from multihmr_tpu.parallel.sharding import constrain_batch

            dec_emb = constrain_batch(dec_emb, self.mesh)

        queries = gather_grid(dec_emb, det)  # [B, Kcap, xat_dim]
        context = grid_to_tokens(dec_emb)  # [B, N, xat_dim]
        y = AnnyHPH(c, name="decoder")(queries, context, det.valid)  # [B,Kcap,D]

        offset = RegressionMLP(c.xat_dim, 2, name="mlp_offset")(y)
        loc = jnp.stack([det.cols, det.rows], axis=-1).astype(jnp.float32)
        loc = (loc + 0.5 + offset) * c.patch_size

        focal = K_used[:, 0, 0][:, None, None]  # [B,1,1]
        d_raw = RegressionMLP(c.xat_dim, 1, name="mlp_dist")(y)  # [B,K,1]
        dist = focal / jnp.clip(jnp.exp(d_raw), 1e-5)  # simple_depth_encoding
        transl = inverse_perspective_projection(loc, K_used, dist)  # [B,K,3]

        shape = jax.nn.sigmoid(RegressionMLP(c.xat_dim, c.num_betas, name="mlp_shape")(y))

        init_pose = self.variable(
            "constants",
            "init_body_pose",
            lambda: _default_init_pose(c.n_joints),
        ).value  # [1, n_joints*6]
        Kcap = y.shape[1]
        pose_in = jnp.concatenate(
            [y, jnp.broadcast_to(init_pose, (B, Kcap, c.n_joints * 6))], axis=-1
        )
        rot6d = RegressionMLP(c.xat_dim, c.n_joints * 6, name="mlp_pose")(pose_in)
        rot6d = rot6d + init_pose
        # Anny 6d layout is column-pairs (reference multi_hmr.py:158 reshapes
        # (-1,3,2)) — NOT the SMPL-X row layout the HPH head uses.
        rotmat = rot6d_cols_to_rotmat(rot6d.reshape(B, Kcap, c.n_joints, 6))

        useful = jnp.asarray(USEFUL_ROTMAT)[: c.n_joints].reshape(1, 1, -1, 1, 1)
        eye = jnp.eye(3)
        rotmat = useful * rotmat + (1.0 - useful) * eye
        rotvec = rotmat_to_rotvec(rotmat)

        return {
            "det": det,
            "scores": scores,
            "scores_logits": enc["scores_logits"],
            "K": K_used,
            "K_regressed": K_regressed,
            "fov_regressed": enc["fov"],
            "feat": enc["feat"],
            "loc": loc,
            "offset": offset,
            "dist": dist,
            "dist_postprocessed": d_raw,
            "shape": shape,
            "rotmat": rotmat,
            "rotvec": rotvec,
            "transl": transl,
        }


def _default_init_pose(n_joints: int) -> jax.Array:
    """Reference multi_hmr_anny/multi_hmr.py:91-95: root init = rotvec
    [π/2, 0, 0] in 6d, identity 6d for the rest. Pure numpy (host-side
    constant): R([π/2,0,0]) = [[1,0,0],[0,0,-1],[0,1,0]]."""
    root_R = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    root6d = root_R[:, :2].reshape(-1)  # flatten first two columns row-major
    eye6d = np.eye(3, dtype=np.float32)[:, :2].reshape(-1)
    pose = np.concatenate([root6d, np.tile(eye6d, n_joints - 1)])
    return jnp.asarray(pose, jnp.float32).reshape(1, -1)


@dataclasses.dataclass
class MultiHMRAnny:
    """Config + net + Anny body model with jit-able forward.

    ``person_center_idx`` is resolved from the body model's real bone labels
    (reference multi_hmr_anny/multi_hmr.py:72 ``bone_labels.index(...)``);
    pass an explicit index only to override.
    """

    cfg: AnnyConfig
    body_model: AnnyModel
    person_center_idx: Optional[int] = None
    mesh: object = None  # jax.sharding.Mesh → TP/SP attention inside the ViT
    tp_mode: str = "heads"  # "heads" (Megatron TP) | "ring" (sequence parallel)

    def __post_init__(self):
        self.net = MultiHMRAnnyNet(self.cfg, mesh=self.mesh, tp_mode=self.tp_mode)
        if self.person_center_idx is None:
            self.person_center_idx = self.body_model.person_center_index(
                self.cfg.person_center
            )
        # shape-vector positions of the used phenotypes, by label (reference
        # multi_hmr_anny/multi_hmr.py:170-172 iterates phenotype_labels)
        self._pheno_idx = self.body_model.used_phenotype_indices()

    def init_params(self, rng_key, batch_size: int = 1):
        x = jnp.zeros((batch_size, self.cfg.img_size, self.cfg.img_size, 3))
        return jax.jit(self.net.init)(rng_key, x)

    def forward(
        self,
        params,
        x: jax.Array,
        K: Optional[jax.Array] = None,
        det_thresh: float = 0.3,
        nms_kernel_size: int = 3,
        is_training: bool = False,
        gt_det: Optional[Detections] = None,
        batch_mode: str = "auto",
    ) -> dict:
        # Batch>1 inference: lax.map of the batch-1 body (see
        # models/multihmr.py::MultiHMR.forward — same rationale/measurements;
        # the family is compute-saturated at batch 1, fused batched dense
        # lowers ~8-12% off roofline).
        if batch_mode not in ("auto", "fused", "map"):
            raise ValueError(f"unknown batch_mode {batch_mode!r}")
        if batch_mode == "map" and (
            is_training or gt_det is not None or self.mesh is not None
        ):
            # same contract as MultiHMR.forward: the mapped body is the
            # inference batch-1 forward — refuse rather than silently drop
            # is_training/gt_det or serialize a sharded batch.
            raise ValueError(
                "batch_mode='map' is inference-only on a single device; "
                "use 'fused' (or 'auto') with is_training/gt_det/mesh"
            )
        use_map = batch_mode == "map" or (
            batch_mode == "auto"
            and x.shape[0] > 1
            and self.mesh is None
            and not is_training
            and gt_det is None
        )
        if use_map:
            def one(args):
                xi, Ki = args
                out1 = self.forward(
                    params, xi, None if K is None else Ki,
                    det_thresh=det_thresh, nms_kernel_size=nms_kernel_size,
                    batch_mode="fused",
                )
                return jax.tree_util.tree_map(lambda t: t[0], out1)

            xs = x[:, None]  # [B, 1, S, S, 3]: each mapped slice is a batch-1
            Ks = (jnp.zeros((x.shape[0], 1)) if K is None else K[:, None])
            return jax.lax.map(one, (xs, Ks))

        out = self.net.apply(
            params, x, K,
            det_thresh=det_thresh, nms_kernel_size=nms_kernel_size,
            is_training=is_training, gt_det=gt_det,
        )
        B, Kcap = out["rotmat"].shape[:2]
        flat = lambda t: t.reshape((B * Kcap,) + t.shape[2:])
        homo = rotation_to_homogeneous(flat(out["rotmat"]))
        phen = {
            name: flat(out["shape"])[:, idx]
            for name, idx in zip(USED_PHENOTYPES, self._pheno_idx)
        }
        body = anny_forward(self.body_model, homo, phen)
        v3d = body["vertices"]
        j3d = body["joints"]
        center = j3d[:, self.person_center_idx : self.person_center_idx + 1]
        transl = flat(out["transl"])
        v3d = v3d - center + transl[:, None]
        j3d = j3d - center + transl[:, None]
        K_used = out["K"]
        K_det = jnp.broadcast_to(K_used[:, None], (B, Kcap, 3, 3)).reshape(
            B * Kcap, 3, 3
        )
        v2d = perspective_projection(v3d, K_det)
        j2d = perspective_projection(j3d, K_det)
        unflat = lambda t: t.reshape((B, Kcap) + t.shape[1:])
        out.update(
            {
                "v3d": unflat(v3d), "j3d": unflat(j3d),
                "v2d": unflat(v2d), "j2d": unflat(j2d),
                "transl_pelvis": unflat(j3d[:, :1]),
                "blendshape_coeffs": unflat(body["blendshape_coeffs"]),
            }
        )
        return out

    def extract_persons(self, out: dict) -> list:
        """Per-image person dicts sorted near-to-far
        (reference multi_hmr.py:212-238)."""
        valid = np.asarray(out["det"].valid)
        keys = ["loc", "transl", "transl_pelvis", "rotvec", "rotmat", "shape",
                "v3d", "j3d", "j2d"]
        # Same trimmed readback as MultiHMR.extract_persons: valid slots are
        # a K-axis prefix (ops/detection.py sorts invalid last), so fetch
        # only [:, :kmax] of each field, all in ONE overlapped device_get.
        kmax = int(valid.sum(-1).max())
        if kmax == 0:
            return [[] for _ in range(valid.shape[0])]
        fetched = jax.device_get(
            {
                "fields": {k: out[k][:, :kmax] for k in keys},
                "K": out["K"], "K_regressed": out["K_regressed"],
                "fov": out["fov_regressed"],
            }
        )
        host = fetched["fields"]
        K_used = fetched["K"]
        K_reg = fetched["K_regressed"]
        fov = fetched["fov"]
        result = []
        for b in range(valid.shape[0]):
            persons = []
            for k in range(kmax):
                if valid[b, k] > 0:
                    p = {name: host[name][b, k] for name in keys}
                    p["K"] = K_used[b]
                    p["K_regressed"] = K_reg[b]
                    p["fov"] = fov[b]
                    persons.append(p)
            persons.sort(key=lambda p: float(p["transl"][2]))
            result.append(persons)
        return result
