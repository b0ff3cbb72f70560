"""Multi-HMR: single-shot multi-person human mesh recovery, TPU-native.

Equivalent of reference model.py:30-349 (``Model``), re-designed around
static shapes: the data-dependent ``torch.where`` person indexing becomes
fixed-capacity ``[B, K]`` detection slots with validity masks, so detection,
head, and body model compile into ONE XLA program regardless of how many
people are in the frame.

Pipeline (reference call stack SURVEY §3.2):
  image [B,S,S,3] → ViT patch tokens → per-patch detection scores
  (clamped sigmoid + maxpool NMS + top-K) → per-slot central features
  → 2D offset → camera-ray Fourier embedding (queries ⊕ rays; kv map ⊕ ray
  map) → HPH cross-attention → SMPL-X params → distance decoding
  (focal-norm⁻¹ ∘ exp ∘ clamp) → camera-aware body-model layer → meshes.

Precision policy: ViT + token-level MLPs in bf16 (MXU), geometry, HPH head
and body model in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multihmr_tpu.config import ModelConfig
from multihmr_tpu.bodymodel.core import BodyModel
from multihmr_tpu.models.vit import DINOv2ViT
from multihmr_tpu.models.hph import HPH
from multihmr_tpu.models.smplx_layer import SMPLXCameraLayer
from multihmr_tpu.ops.detection import (
    Detections,
    clamped_sigmoid,
    nms_maxpool,
    topk_detect,
    gather_grid,
)
from multihmr_tpu.ops.image import tokens_to_grid
from multihmr_tpu.ops.fourier import fourier_ray_features
from multihmr_tpu.ops.camera import (
    inverse_perspective_projection,
    undo_focal_length_normalization,
    undo_log_depth,
)
from multihmr_tpu.ops.rotations import rotmat_to_rotvec


class RegressionMLP(nn.Module):
    """Linear-ReLU-Linear head (reference model.py:596-609)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc1")(x)


class MultiHMRNet(nn.Module):
    """The trainable graph: backbone + detection + HPH (everything except the
    parameter-free body-model layer, which the system wrapper applies).

    ``mesh``/``tp_mode`` enable tensor/sequence-parallel attention inside the
    ViT (heads or sequence sharded over the mesh's ``model`` axis) — the
    TPU-native scaling path the single-GPU reference never had (SURVEY §2.3).
    """

    cfg: ModelConfig
    mesh: Any = None
    tp_mode: str = "heads"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, S, S, 3] normalized NHWC image
        K: jax.Array,  # [B, 3, 3]
        det_thresh: float = 0.3,
        nms_kernel_size: int = 3,
        is_training: bool = False,
        gt_det: Optional[Detections] = None,
    ):
        c = self.cfg
        compute_dtype = jnp.dtype(c.compute_dtype)
        B = x.shape[0]
        g = c.grid_size

        # --- backbone (reference model.py:229) ---
        vit = DINOv2ViT(
            c.vit, grid_size=g, dtype=compute_dtype, remat=c.remat,
            remat_policy=c.remat_policy,
            mesh=self.mesh, tp_mode=self.tp_mode, name="backbone",
        )
        z = vit(x)["patch_tokens"]  # [B, N, D] bf16

        # --- detection (reference model.py:133-158) ---
        logits = RegressionMLP(
            c.vit.embed_dim, 1, dtype=compute_dtype, name="mlp_classif"
        )(z)
        scores = clamped_sigmoid(logits.astype(jnp.float32))[..., 0]  # [B, N]
        scores_grid = scores.reshape(B, g, g)
        if not is_training:
            nms_scores = nms_maxpool(scores_grid, nms_kernel_size)
            det = topk_detect(nms_scores, det_thresh, c.max_people)
        else:
            assert gt_det is not None, "training requires GT detections"
            det = gt_det
        scores_det = jnp.take_along_axis(
            scores_grid.reshape(B, -1), (det.rows * g + det.cols), axis=1
        ) * det.valid

        # --- dense features + central gathers (reference model.py:245-258) ---
        z_grid = tokens_to_grid(z.astype(jnp.float32), g)  # [B, g, g, D]
        z_central = gather_grid(z_grid, det)  # [B, K, D]
        offset = RegressionMLP(c.vit.embed_dim, 2, name="mlp_offset")(z_central)

        # --- camera-ray embedding (reference model.py:160-187,262-269) ---
        # Patch-center pixels in the reference's (row, col) order.
        rr, cc = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
        pts = jnp.stack([rr, cc], axis=-1).reshape(1, -1, 2).astype(jnp.float32)
        pts = pts * c.patch_size + c.patch_size // 2
        pts = jnp.broadcast_to(pts, (B, g * g, 2))
        rays = inverse_perspective_projection(
            pts, K, jnp.ones((B, g * g, 1), jnp.float32)
        )
        z_K = fourier_ray_features(
            rays, c.camera_embedding_num_bands, c.camera_embedding_max_resolution
        ).reshape(B, g, g, c.camera_embed_dim)

        z_central = jnp.concatenate([z_central, gather_grid(z_K, det)], axis=-1)
        kv_grid = jnp.concatenate([z_grid, z_K], axis=-1)  # [B, g, g, D+99]

        if self.mesh is not None:
            # Pin the ViT→HPH boundary to batch-on-'data' so SPMD does not
            # drag the backbone's model-axis feature sharding into the head
            # (which it can only undo with an involuntary full remat).
            from multihmr_tpu.parallel.sharding import constrain_batch

            z_central = constrain_batch(z_central, self.mesh)
            kv_grid = constrain_batch(kv_grid, self.mesh)

        # --- 2D location (reference model.py:272-275): loc = (col, row) ---
        loc = jnp.stack([det.cols, det.rows], axis=-1).astype(jnp.float32)
        loc = (loc + 0.5 + offset) * c.patch_size  # [B, K, 2]

        # --- HPH head (reference model.py:281, :352-593) ---
        head_out = HPH(c, name="x_attention_head")(z_central, kv_grid, det)

        # --- distance decoding (reference model.py:294-298,189-203) ---
        dist_raw = head_out["cam"][..., 0:1]  # [B, K, 1]
        focal = K[:, 0, 0][:, None, None]  # [B, 1, 1]
        dist = undo_focal_length_normalization(
            dist_raw, focal, fovn=c.fovn, img_size=c.img_size
        )
        if c.nearness:
            dist = undo_log_depth(dist)
        if c.clip_dist:
            dist = jnp.clip(dist, 0.0, 50.0)

        rotmat = head_out["rotmat"]  # [B, K, nrot, 3, 3]
        rotvec = rotmat_to_rotvec(rotmat)

        return {
            "scores": scores_grid,  # [B, g, g] full heatmap (loss input)
            "scores_det": scores_det,  # [B, K]
            "det": det,
            "offset": offset,
            "loc": loc,
            "dist": dist,  # [B, K, 1] euclidean
            "dist_postprocessed": dist_raw,  # [B, K, 1] pre-decode
            "rotmat": rotmat,
            "rotvec": rotvec,
            "shape": head_out["betas"],
            "expression": head_out["expression"],
        }


@dataclasses.dataclass
class MultiHMR:
    """Config + flax net + body model, with jit-able pure forward.

    The public analogue of reference ``Model``: construct with a config and
    a body model, call :meth:`forward` (or jit ``forward_fn``).
    """

    cfg: ModelConfig
    body_model: BodyModel
    person_center_joint_names: Optional[list] = None
    mesh: Any = None  # jax.sharding.Mesh → TP/SP attention inside the ViT
    tp_mode: str = "heads"  # "heads" (Megatron TP) | "ring" (sequence parallel)

    def __post_init__(self):
        self.net = MultiHMRNet(self.cfg, mesh=self.mesh, tp_mode=self.tp_mode)
        self.smpl_layer = SMPLXCameraLayer(
            self.body_model,
            person_center=self.cfg.person_center,
            joint_names=self.person_center_joint_names,
        )

    def init_params(self, rng_key, batch_size: int = 1):
        x = jnp.zeros((batch_size, self.cfg.img_size, self.cfg.img_size, 3))
        K = jnp.broadcast_to(jnp.eye(3), (batch_size, 3, 3))
        # jit so initialization is ONE compiled program (eager init would
        # dispatch hundreds of individual ops — pathological on remote TPU).
        return jax.jit(self.net.init)(rng_key, x, K)

    def forward(
        self,
        params,
        x: jax.Array,
        K: jax.Array,
        det_thresh: float = 0.3,
        nms_kernel_size: int = 3,
        is_training: bool = False,
        gt_det: Optional[Detections] = None,
        batch_mode: str = "auto",
    ) -> dict:
        """Full forward: net + body model. All outputs are ``[B, K, ...]``
        padded, with ``out['det'].valid`` the person mask.

        ``batch_mode`` — how a batch > 1 is executed on a single device:

          * ``"map"``: ``lax.map`` of the batch-1 body over the images —
            ONE compiled program run B times back-to-back on-device. This
            family is compute-saturated at batch 1 (dense at ~100% of the
            bf16 roofline, flash attention at its D=64 floor), so fused
            batching cannot amortize anything; instead XLA's batched dense
            lowering loses ~8-12% (one projection lowers to a convolution,
            the fc fusions drop to ~88% roofline — profiled on v5e).
            Measured (v5e): 896_L batch 4 fused 35.67 vs map 34.94 ms/img
            (sub0-softmax kernel: map 31.87 vs batch-1 31.64), 672_B
            batch 8 fused 6.36 vs map 6.18 ms/img.
          * ``"fused"``: one batched XLA program (the conventional path) —
            required under a mesh (lax.map over a sharded batch axis would
            serialize across devices) and for training (whole-batch grads).
          * ``"auto"``: "map" exactly when it wins: B > 1, no mesh, inference.
        """
        if batch_mode not in ("auto", "fused", "map"):
            raise ValueError(f"unknown batch_mode {batch_mode!r}")
        if batch_mode == "map" and (
            is_training or gt_det is not None or self.mesh is not None
        ):
            # the mapped body is the inference batch-1 forward: it has no
            # is_training/gt_det plumbing, and under a mesh lax.map would
            # silently serialize the batch across devices — refuse loudly
            # instead of dropping the arguments.
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
                    params, xi[None], Ki[None],
                    det_thresh=det_thresh, nms_kernel_size=nms_kernel_size,
                    batch_mode="fused",
                )
                return jax.tree_util.tree_map(lambda t: t[0], out1)

            return jax.lax.map(one, (x, K))

        out = self.net.apply(
            params, x, K,
            det_thresh=det_thresh,
            nms_kernel_size=nms_kernel_size,
            is_training=is_training,
            gt_det=gt_det,
        )
        return self.apply_body_model(out, K)

    def apply_body_model(self, out: dict, K: jax.Array) -> dict:
        """Body-model stage of :meth:`forward`: net outputs → v3d/j3d/j2d/
        v2d/transl keys merged into ``out``. Exposed separately so callers
        that already hold the net outputs (e.g. the parity harness's stage
        capture) don't pay a second full backbone forward."""
        B, Kcap = out["rotvec"].shape[:2]

        # body model over flattened [B*K] person slots
        flat = lambda t: t.reshape((B * Kcap,) + t.shape[2:])
        K_det = jnp.broadcast_to(K[:, None], (B, Kcap, 3, 3)).reshape(B * Kcap, 3, 3)
        smpl_out = self.smpl_layer(
            flat(out["rotvec"]),
            flat(out["shape"]),
            flat(out["loc"]),
            flat(out["dist"]),
            K_det,
            expression=flat(out["expression"]),
        )
        unflat = lambda t: t.reshape((B, Kcap) + t.shape[1:])
        out = dict(out)
        out.update({k: unflat(v) for k, v in smpl_out.items()})
        return out

    def extract_persons(self, out: dict, fields: Optional[list] = None) -> list:
        """Host-side: padded ``[B, K]`` outputs → per-image person dict lists
        with the reference's keys (reference model.py:328-347).

        ``fields``: restrict which keys are pulled to the host. Device→host
        readback is the serving tail latency (the mesh tensors are ~1 MB per
        person slot) — a JSON-only server that selects
        ``["scores", "loc", "transl", "transl_pelvis", "j2d"]`` skips the
        v3d/j3d readback entirely. Default: all keys."""
        valid = np.asarray(out["det"].valid)
        B = valid.shape[0]
        full = valid.sum(-1) == valid.shape[1]
        if full.any():
            import warnings

            warnings.warn(
                f"{int(full.sum())} image(s) saturated the detection capacity "
                f"K={valid.shape[1]} — people beyond capacity are dropped; "
                "rebuild with a larger ModelConfig.max_people if unexpected.",
                stacklevel=2,
            )
        persons_per_image = []
        keys = [
            ("scores", "scores_det"), ("loc", "loc"), ("transl", "transl"),
            ("transl_pelvis", "transl_pelvis"), ("rotvec", "rotvec"),
            ("expression", "expression"), ("shape", "shape"),
            ("v3d", "v3d"), ("j3d", "j3d"), ("j2d", "j2d"),
        ]
        if fields is not None:
            keys = [(name, src) for name, src in keys if name in fields]
        # Valid detections occupy a PREFIX of the K axis (ops/detection.py
        # orders invalid slots last), so fetch only [:, :kmax] of each field,
        # kmax = the batch's largest person count — at capacity K=16 a typical
        # 1-2-person image pays 1/8th the bytes (v3d alone is ~2.5 MB/image at
        # full capacity; the fetch, not compute, dominates an eval sweep over
        # a remote-TPU link). Then ONE device_get for all selected fields:
        # copy_to_host_async on every leaf before the first blocking wait,
        # instead of a serial np.asarray round-trip per key.
        kmax = int(valid.sum(-1).max())
        if kmax == 0:
            return [[] for _ in range(B)]
        host = jax.device_get({name: out[src][:, :kmax] for name, src in keys})
        for b in range(B):
            persons = []
            for k in range(kmax):
                if valid[b, k] > 0:
                    persons.append({name: host[name][b, k] for name, _ in keys})
            persons_per_image.append(persons)
        return persons_per_image
