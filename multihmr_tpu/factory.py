"""Model factory: build a ready-to-run MultiHMR system.

The analogue of reference demo.py:70-106 (``load_model``): resolve a named
configuration, attach a body model (real licensed assets if present, else the
synthetic stand-in so everything still runs end-to-end), and optionally
convert a torch checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

from multihmr_tpu.config import ModelConfig, named_config
from multihmr_tpu.bodymodel.assets import (
    load_smplx_npz,
    synthetic_body_model,
)
from multihmr_tpu.models.multihmr import MultiHMR

SMPLX_DIR = os.environ.get("SMPLX_DIR", "models")


def smplx_like_synthetic(num_betas: int = 10):
    """Synthetic body model with SMPL-X's exact dimensions (10,475 verts,
    55 joints, 21 vertex keypoints, 51 landmarks) — FLOP-identical to the
    real asset, used when the licensed files are absent."""
    return synthetic_body_model(
        num_vertices=10475,
        num_joints=55,
        num_betas=max(num_betas, 11),
        num_expression=10,
        num_extra=21,
        num_lmk=51,
        seed=0,
    )


def load_body_model(num_betas: int = 10, smplx_dir: Optional[str] = None):
    """Real SMPL-X neutral npz if available, else the synthetic stand-in."""
    d = smplx_dir or SMPLX_DIR
    for candidate in (
        os.path.join(d, "smplx", "SMPLX_NEUTRAL.npz"),
        os.path.join(d, "SMPLX_NEUTRAL.npz"),
    ):
        if os.path.exists(candidate):
            return load_smplx_npz(candidate, num_betas=num_betas), True
    return smplx_like_synthetic(num_betas), False


def build_model(
    name: str = "multiHMR_896_L",
    cfg: Optional[ModelConfig] = None,
    checkpoint: Optional[str] = None,
    smplx_dir: Optional[str] = None,
):
    """Build (model, params). ``params`` is None unless a checkpoint is given
    — call ``model.init_params(rng)`` for random init.

    Anny-family names ("anny" in name, reference demo.py:95 dispatch) build
    the :class:`MultiHMRAnny` system instead.
    """
    if cfg is None and "anny" in name:
        from multihmr_tpu.models.multihmr_anny import AnnyConfig, MultiHMRAnny
        from multihmr_tpu.bodymodel.anny import load_anny_npz, synthetic_anny_model

        acfg = AnnyConfig(backbone="dinov2_vitl14", img_size=672)
        # converted real asset (tools/convert_anny.py) if present, else the
        # synthetic stand-in so everything still runs end-to-end
        anny_path = os.environ.get(
            "ANNY_NPZ", os.path.join(smplx_dir or SMPLX_DIR, "anny.npz")
        )
        bm_anny = (
            load_anny_npz(anny_path)
            if os.path.exists(anny_path)
            else synthetic_anny_model()
        )
        model = MultiHMRAnny(acfg, bm_anny)
        params = None
        if checkpoint is not None:
            from multihmr_tpu.io.checkpoint import convert_torch_checkpoint_anny

            params = convert_torch_checkpoint_anny(checkpoint, acfg)
        return model, params
    cfg = cfg if cfg is not None else named_config(name)
    bm, real_assets = load_body_model(cfg.num_betas, smplx_dir)
    model = MultiHMR(cfg, bm)
    params = None
    if checkpoint is not None:
        from multihmr_tpu.io.checkpoint import convert_torch_checkpoint

        params = convert_torch_checkpoint(checkpoint, cfg)
    return model, params
