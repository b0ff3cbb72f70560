"""Checkpoints: torch→JAX conversion and native save/load.

The reference's checkpoint *is* its config system: ``ckpt['args']`` is
re-hydrated into constructor kwargs (reference demo.py:87-103) and
``model_state_dict`` loaded with ``strict=False`` after stripping
``smpl_layer``-prefixed keys (reference train.py:195-207). Here:

  * :func:`config_from_ckpt_args` maps ``ckpt['args']`` → :class:`ModelConfig`;
  * :func:`convert_torch_checkpoint` maps the torch state-dict (hub-DINOv2
    backbone + heads in one file) onto the flax parameter tree, including
    Linear transposition, patch-embed unfold reordering, and pos-embedding
    bicubic resampling to the working grid (torch-exact, ops/posenc.py);
  * native checkpoints are flax-serialized msgpack + a JSON config sidecar,
    pruned to ``nb_max_ckpt`` like the reference (train.py:209-223).

Torch is used only host-side for deserialization (``map_location='cpu'``) —
no torch ops run in the model.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from multihmr_tpu.config import ModelConfig
from multihmr_tpu.ops.posenc import interpolate_dinov2_pos_embed


def config_from_ckpt_args(args: Mapping[str, Any], max_people: int = 16) -> ModelConfig:
    """Map a reference ``ckpt['args']`` namespace-dict onto ModelConfig."""
    get = lambda k, d: args.get(k, d) if isinstance(args, dict) else getattr(args, k, d)
    img_size = get("img_size", 896)
    if isinstance(img_size, (list, tuple)):  # stored as a list (demo.py:99)
        img_size = img_size[0]
    return ModelConfig(
        backbone=get("backbone", "dinov2_vitb14"),
        img_size=int(img_size),
        camera_embedding_num_bands=int(get("camera_embedding_num_bands", 16)),
        camera_embedding_max_resolution=int(get("camera_embedding_max_resolution", 64)),
        nearness=bool(get("nearness", True)),
        clip_dist=bool(get("clip_dist", True)),
        xat_depth=int(get("xat_depth", 2)),
        xat_num_heads=int(get("xat_num_heads", 8)),
        person_center=get("person_center", "head"),
        num_betas=int(get("num_betas", 10)),
        max_people=max_people,
    )


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] → flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def expected_reference_keys(cfg: ModelConfig) -> set:
    """Every state-dict key :func:`convert_torch_checkpoint` consumes, for a
    given config — the contract with the reference's naming (hub-DINOv2
    backbone + model.py heads). Used to report ALL missing keys up front
    instead of dying on the first ``KeyError``."""
    keys = set()
    bb = "backbone.encoder."
    keys |= {
        bb + "patch_embed.proj.weight", bb + "patch_embed.proj.bias",
        bb + "cls_token", bb + "pos_embed", bb + "norm.weight", bb + "norm.bias",
    }
    for i in range(cfg.vit.depth):
        b = f"{bb}blocks.{i}."
        keys |= {
            b + "norm1.weight", b + "norm1.bias",
            b + "attn.qkv.weight", b + "attn.qkv.bias",
            b + "attn.proj.weight", b + "attn.proj.bias",
            b + "ls1.gamma", b + "ls2.gamma",
            b + "norm2.weight", b + "norm2.bias",
            b + "mlp.fc1.weight", b + "mlp.fc1.bias",
            b + "mlp.fc2.weight", b + "mlp.fc2.bias",
        }
    for m in ("mlp_classif", "mlp_offset"):
        keys |= {f"{m}.0.weight", f"{m}.0.bias", f"{m}.2.weight", f"{m}.2.bias"}
    xa = "x_attention_head."
    keys |= {
        xa + "cross_queries_x", xa + "cross_queries_y",
        xa + "cross_values_x", xa + "cross_values_y",
        xa + "init_body_pose", xa + "init_betas", xa + "init_cam",
        xa + "init_expression",
        xa + "transformer.to_token_embedding.weight",
        xa + "transformer.to_token_embedding.bias",
        xa + "transformer.pos_embedding",
    }
    for d in ("decpose", "decshape", "deccam", "decexpression"):
        keys |= {xa + d + ".weight", xa + d + ".bias"}
    for i in range(cfg.xat_depth):
        layer = f"{xa}transformer.transformer.layers.{i}."
        keys |= {
            layer + "0.norm.weight", layer + "0.norm.bias",
            layer + "0.fn.to_qkv.weight",
            layer + "0.fn.to_out.0.weight", layer + "0.fn.to_out.0.bias",
            layer + "1.norm.weight", layer + "1.norm.bias",
            layer + "1.fn.to_kv.weight", layer + "1.fn.to_q.weight",
            layer + "1.fn.to_out.0.weight", layer + "1.fn.to_out.0.bias",
            layer + "2.norm.weight", layer + "2.norm.bias",
            layer + "2.fn.net.0.weight", layer + "2.fn.net.0.bias",
            layer + "2.fn.net.3.weight", layer + "2.fn.net.3.bias",
        }
    return keys


def expected_reference_shapes(cfg: ModelConfig) -> dict:
    """Shape contract: the exact torch-side tensor shapes
    :func:`convert_torch_checkpoint` assumes for every key it consumes
    (``None`` = wildcard dim). This is the machine-checkable half of the
    converter-assumption manifest (docs/DESIGN.md §converter-assumptions) —
    the converter's transposes/reshapes would otherwise turn a layout
    mismatch in a real ``multiHMR_*.pt`` into silent garbage weights."""
    vit = cfg.vit
    D = vit.embed_dim
    H = int(D * vit.mlp_ratio)
    hph = cfg.hph
    inner = hph.heads * hph.dim_head
    C = D + cfg.camera_embed_dim
    shapes = {}
    bb = "backbone.encoder."
    shapes[bb + "patch_embed.proj.weight"] = (D, 3, 14, 14)
    shapes[bb + "patch_embed.proj.bias"] = (D,)
    shapes[bb + "cls_token"] = (1, 1, D)
    # pos_embed: (1, 1 + g0², D) for ANY source grid g0 — bicubically
    # resampled to the working grid (reference hub-DINOv2 interpolates too)
    shapes[bb + "pos_embed"] = (1, None, D)
    shapes[bb + "norm.weight"] = (D,)
    shapes[bb + "norm.bias"] = (D,)
    for i in range(vit.depth):
        b = f"{bb}blocks.{i}."
        for nrm in ("norm1", "norm2"):
            shapes[b + nrm + ".weight"] = (D,)
            shapes[b + nrm + ".bias"] = (D,)
        shapes[b + "attn.qkv.weight"] = (3 * D, D)
        shapes[b + "attn.qkv.bias"] = (3 * D,)
        shapes[b + "attn.proj.weight"] = (D, D)
        shapes[b + "attn.proj.bias"] = (D,)
        shapes[b + "ls1.gamma"] = (D,)
        shapes[b + "ls2.gamma"] = (D,)
        shapes[b + "mlp.fc1.weight"] = (H, D)
        shapes[b + "mlp.fc1.bias"] = (H,)
        shapes[b + "mlp.fc2.weight"] = (D, H)
        shapes[b + "mlp.fc2.bias"] = (D,)
    for m, od in (("mlp_classif", 1), ("mlp_offset", 2)):
        shapes[f"{m}.0.weight"] = (D, D)
        shapes[f"{m}.0.bias"] = (D,)
        shapes[f"{m}.2.weight"] = (od, D)
        shapes[f"{m}.2.bias"] = (od,)
    xa = "x_attention_head."
    g = cfg.grid_size
    for name in ("cross_queries_x", "cross_queries_y",
                 "cross_values_x", "cross_values_y"):
        shapes[xa + name] = (g, C)
    shapes[xa + "init_body_pose"] = (1, cfg.npose)
    shapes[xa + "init_betas"] = (1, cfg.num_betas)
    shapes[xa + "init_cam"] = (1, 3)
    shapes[xa + "init_expression"] = (1, 10)
    shapes[xa + "transformer.to_token_embedding.weight"] = (hph.dim, cfg.token_dim)
    shapes[xa + "transformer.to_token_embedding.bias"] = (hph.dim,)
    shapes[xa + "transformer.pos_embedding"] = (1, None, hph.dim)
    for dec, od in (("decpose", cfg.npose), ("decshape", cfg.num_betas),
                    ("deccam", 3), ("decexpression", 10)):
        shapes[xa + dec + ".weight"] = (od, hph.dim)
        shapes[xa + dec + ".bias"] = (od,)
    for i in range(cfg.xat_depth):
        layer = f"{xa}transformer.transformer.layers.{i}."
        for j in (0, 1, 2):
            shapes[layer + f"{j}.norm.weight"] = (hph.dim,)
            shapes[layer + f"{j}.norm.bias"] = (hph.dim,)
        shapes[layer + "0.fn.to_qkv.weight"] = (3 * inner, hph.dim)
        shapes[layer + "0.fn.to_out.0.weight"] = (hph.dim, inner)
        shapes[layer + "0.fn.to_out.0.bias"] = (hph.dim,)
        shapes[layer + "1.fn.to_kv.weight"] = (2 * inner, C)
        shapes[layer + "1.fn.to_q.weight"] = (inner, hph.dim)
        shapes[layer + "1.fn.to_out.0.weight"] = (hph.dim, inner)
        shapes[layer + "1.fn.to_out.0.bias"] = (hph.dim,)
        shapes[layer + "2.fn.net.0.weight"] = (hph.mlp_dim, hph.dim)
        shapes[layer + "2.fn.net.0.bias"] = (hph.mlp_dim,)
        shapes[layer + "2.fn.net.3.weight"] = (hph.dim, hph.mlp_dim)
        shapes[layer + "2.fn.net.3.bias"] = (hph.dim,)
    return shapes


def expected_reference_keys_anny(cfg) -> set:
    """Every state-dict key :func:`convert_torch_checkpoint_anny` consumes —
    the key contract with ``multiHMR_*_anny`` checkpoints (reference
    multi_hmr_anny/multi_hmr.py naming)."""
    keys = {"dec_to_token.weight", "dec_to_token.bias",
            "dec_pos_emb", "init_body_pose"}
    bb = "encoder.backbone."
    keys |= {
        bb + "patch_embed.proj.weight", bb + "patch_embed.proj.bias",
        bb + "cls_token", bb + "pos_embed", bb + "norm.weight", bb + "norm.bias",
    }
    for i in range(cfg.vit.depth):
        b = f"{bb}blocks.{i}."
        keys |= {
            b + "norm1.weight", b + "norm1.bias",
            b + "attn.qkv.weight", b + "attn.qkv.bias",
            b + "attn.proj.weight", b + "attn.proj.bias",
            b + "ls1.gamma", b + "ls2.gamma",
            b + "norm2.weight", b + "norm2.bias",
            b + "mlp.fc1.weight", b + "mlp.fc1.bias",
            b + "mlp.fc2.weight", b + "mlp.fc2.bias",
        }
    for m in ("encoder.mlp_det", "encoder.mlp_fov_unique",
              "mlp_offset", "mlp_pose", "mlp_shape", "mlp_dist"):
        keys |= {f"{m}.0.weight", f"{m}.0.bias", f"{m}.2.weight", f"{m}.2.bias"}
    for i in range(cfg.xat_depth):
        layer = f"decoder.transformer.layers.{i}."
        keys |= {
            layer + "0.norm.weight", layer + "0.norm.bias",
            layer + "0.fn.to_qkv.weight",
            layer + "0.fn.to_out.0.weight", layer + "0.fn.to_out.0.bias",
            layer + "1.norm.weight", layer + "1.norm.bias",
            layer + "1.fn.to_kv.weight", layer + "1.fn.to_q.weight",
            layer + "1.fn.to_out.0.weight", layer + "1.fn.to_out.0.bias",
            layer + "2.norm.weight", layer + "2.norm.bias",
            layer + "2.fn.net.0.weight", layer + "2.fn.net.0.bias",
            layer + "2.fn.net.3.weight", layer + "2.fn.net.3.bias",
        }
    return keys


# Keys the reference checkpoint may carry that the JAX model intentionally
# has no use for (buffers, stripped smpl layer) — reported as info, never
# warnings.
_IGNORABLE = re.compile(
    r"^smpl_layer|init_betas_kid$|^backbone\.encoder\.mask_token$"
)


def validate_reference_state_dict(sd: Mapping[str, Any], cfg: ModelConfig) -> dict:
    """{'missing': sorted list, 'unexpected': sorted list, 'ignored': list,
    'bad_shape': ["key: got (..), expected (..)"]}. ``bad_shape`` checks
    every present consumed key against :func:`expected_reference_shapes`
    (None dims are wildcards)."""
    expected = expected_reference_keys(cfg)
    present = set(sd.keys())
    ignored = sorted(k for k in present - expected if _IGNORABLE.search(k))
    shapes = expected_reference_shapes(cfg)
    bad_shape = []
    for k in sorted(expected & present):
        want = shapes.get(k)
        if want is None:
            continue
        got = tuple(getattr(sd[k], "shape", np.asarray(sd[k]).shape))
        if len(got) != len(want) or any(
            w is not None and int(g) != w for g, w in zip(got, want)
        ):
            bad_shape.append(f"{k}: got {tuple(int(x) for x in got)}, expected {want}")
    return {
        "missing": sorted(expected - present),
        "unexpected": sorted(k for k in present - expected if not _IGNORABLE.search(k)),
        "ignored": ignored,
        "bad_shape": bad_shape,
    }


def convert_torch_checkpoint(ckpt_or_path, cfg: ModelConfig) -> dict:
    """Convert a reference checkpoint (path or loaded dict) to flax params.

    Handles both a full checkpoint (``{'model_state_dict': ..., 'args': ...}``)
    and a bare state-dict. Returns ``{'params': tree}`` matching
    :class:`~multihmr_tpu.models.multihmr.MultiHMRNet`.
    """
    if isinstance(ckpt_or_path, (str, os.PathLike)):
        import torch

        ckpt = torch.load(ckpt_or_path, map_location="cpu", weights_only=False)
    else:
        ckpt = ckpt_or_path
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in sd.items()
        if not k.startswith("smpl_layer")  # stripped at save anyway (train.py:197-201)
    }

    # strict=False semantics (reference demo.py:103): tolerate and REPORT key
    # mismatches instead of dying on the first access. Missing keys are fatal
    # (we have no init values to fall back to) but all listed at once.
    report = validate_reference_state_dict(sd, cfg)
    if report["missing"]:
        raise KeyError(
            f"checkpoint is missing {len(report['missing'])} expected keys for "
            f"config (backbone={cfg.backbone}, img={cfg.img_size}, "
            f"betas={cfg.num_betas}, xat_depth={cfg.xat_depth}):\n  "
            + "\n  ".join(report["missing"][:40])
            + ("\n  ..." if len(report["missing"]) > 40 else "")
            + "\nLikely a config/checkpoint mismatch — rebuild the config via "
            "config_from_ckpt_args(ckpt['args'])."
        )
    if report["bad_shape"]:
        raise ValueError(
            f"{len(report['bad_shape'])} checkpoint tensors have shapes the "
            f"converter's transposes/reshapes cannot accept (layout or "
            f"config mismatch):\n  " + "\n  ".join(report["bad_shape"][:20])
            + ("\n  ..." if len(report["bad_shape"]) > 20 else "")
        )
    if report["unexpected"]:
        import warnings

        warnings.warn(
            f"{len(report['unexpected'])} unexpected checkpoint keys ignored "
            f"(strict=False, reference demo.py:103): "
            + ", ".join(report["unexpected"][:10])
            + ("..." if len(report["unexpected"]) > 10 else ""),
            stacklevel=2,
        )

    vit = cfg.vit
    g = cfg.grid_size
    p = {}

    # ---- backbone (hub DINOv2 naming) ----
    bb = "backbone.encoder."
    pe_w = sd[bb + "patch_embed.proj.weight"]  # [D, 3, 14, 14]
    patch_kernel = pe_w.transpose(2, 3, 1, 0).reshape(-1, vit.embed_dim)
    backbone = {
        "patch_embed": {"kernel": patch_kernel, "bias": sd[bb + "patch_embed.proj.bias"]},
        "cls_token": sd[bb + "cls_token"].reshape(1, 1, vit.embed_dim),
        "pos_embed": interpolate_dinov2_pos_embed(
            sd[bb + "pos_embed"].astype(np.float32), g
        ),
        "norm": {"scale": sd[bb + "norm.weight"], "bias": sd[bb + "norm.bias"]},
    }
    # scanned blocks: per-layer torch weights stacked on a leading depth axis
    def stacked(fmt, transpose=False):
        arrs = [sd[f"{bb}blocks.{i}.{fmt}"] for i in range(vit.depth)]
        if transpose:
            arrs = [_t(a) for a in arrs]
        return np.stack(arrs, axis=0)

    backbone["blocks"] = {
        "block": {
            "norm1": {"scale": stacked("norm1.weight"), "bias": stacked("norm1.bias")},
            "attn": {
                "qkv": {
                    "kernel": stacked("attn.qkv.weight", True),
                    "bias": stacked("attn.qkv.bias"),
                },
                "proj": {
                    "kernel": stacked("attn.proj.weight", True),
                    "bias": stacked("attn.proj.bias"),
                },
            },
            "ls1": {"gamma": stacked("ls1.gamma")},
            "norm2": {"scale": stacked("norm2.weight"), "bias": stacked("norm2.bias")},
            "mlp": {
                "fc1": {
                    "kernel": stacked("mlp.fc1.weight", True),
                    "bias": stacked("mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stacked("mlp.fc2.weight", True),
                    "bias": stacked("mlp.fc2.bias"),
                },
            },
            "ls2": {"gamma": stacked("ls2.gamma")},
        }
    }
    p["backbone"] = backbone

    # ---- detection / offset MLPs (Sequential Linear-ReLU-Linear) ----
    for torch_name, ours in [("mlp_classif", "mlp_classif"), ("mlp_offset", "mlp_offset")]:
        p[ours] = {
            "fc0": {"kernel": _t(sd[f"{torch_name}.0.weight"]), "bias": sd[f"{torch_name}.0.bias"]},
            "fc1": {"kernel": _t(sd[f"{torch_name}.2.weight"]), "bias": sd[f"{torch_name}.2.bias"]},
        }

    # ---- HPH head ----
    xa = "x_attention_head."
    head = {
        "cross_queries_x": sd[xa + "cross_queries_x"],
        "cross_queries_y": sd[xa + "cross_queries_y"],
        "cross_values_x": sd[xa + "cross_values_x"],
        "cross_values_y": sd[xa + "cross_values_y"],
        "init_body_pose": sd[xa + "init_body_pose"],
        "init_betas": sd[xa + "init_betas"],
        "init_cam": sd[xa + "init_cam"],
        "init_expression": sd[xa + "init_expression"],
        "to_token_embedding": {
            "kernel": _t(sd[xa + "transformer.to_token_embedding.weight"]),
            "bias": sd[xa + "transformer.to_token_embedding.bias"],
        },
        "pos_embedding": sd[xa + "transformer.pos_embedding"],
        "decpose": {"kernel": _t(sd[xa + "decpose.weight"]), "bias": sd[xa + "decpose.bias"]},
        "decshape": {"kernel": _t(sd[xa + "decshape.weight"]), "bias": sd[xa + "decshape.bias"]},
        "deccam": {"kernel": _t(sd[xa + "deccam.weight"]), "bias": sd[xa + "deccam.bias"]},
        "decexpression": {
            "kernel": _t(sd[xa + "decexpression.weight"]),
            "bias": sd[xa + "decexpression.bias"],
        },
    }
    for i in range(cfg.xat_depth):
        layer = f"{xa}transformer.transformer.layers.{i}."
        head[f"sa_norm{i}"] = {
            "scale": sd[layer + "0.norm.weight"], "bias": sd[layer + "0.norm.bias"]
        }
        head[f"sa{i}"] = {
            "to_qkv": {"kernel": _t(sd[layer + "0.fn.to_qkv.weight"])},
            "to_out": {
                "kernel": _t(sd[layer + "0.fn.to_out.0.weight"]),
                "bias": sd[layer + "0.fn.to_out.0.bias"],
            },
        }
        head[f"ca_norm{i}"] = {
            "scale": sd[layer + "1.norm.weight"], "bias": sd[layer + "1.norm.bias"]
        }
        head[f"ca{i}"] = {
            "to_kv": {"kernel": _t(sd[layer + "1.fn.to_kv.weight"])},
            "to_q": {"kernel": _t(sd[layer + "1.fn.to_q.weight"])},
            "to_out": {
                "kernel": _t(sd[layer + "1.fn.to_out.0.weight"]),
                "bias": sd[layer + "1.fn.to_out.0.bias"],
            },
        }
        head[f"ff_norm{i}"] = {
            "scale": sd[layer + "2.norm.weight"], "bias": sd[layer + "2.norm.bias"]
        }
        head[f"ff{i}"] = {
            "fc1": {"kernel": _t(sd[layer + "2.fn.net.0.weight"]), "bias": sd[layer + "2.fn.net.0.bias"]},
            "fc2": {"kernel": _t(sd[layer + "2.fn.net.3.weight"]), "bias": sd[layer + "2.fn.net.3.bias"]},
        }
    p["x_attention_head"] = head

    params = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a), jnp.float32), p)
    return {"params": params}


class _HintingSD(dict):
    """dict whose KeyError names the missing checkpoint key and lists the
    same-prefix keys that DO exist — conversion failures localize instantly."""

    def __missing__(self, k):
        prefix = k.split(".")[0]
        near = sorted(x for x in self if x.startswith(prefix))[:8]
        raise KeyError(
            f"checkpoint key {k!r} not found; available keys with prefix "
            f"{prefix!r}: {near if near else sorted(self)[:8]}"
        )


def convert_torch_checkpoint_anny(ckpt_or_path, cfg) -> dict:
    """Convert an Anny-variant checkpoint (``multiHMR_*_anny``; reference
    multi_hmr_anny/multi_hmr.py naming) to flax params for
    :class:`~multihmr_tpu.models.multihmr_anny.MultiHMRAnnyNet`."""
    if isinstance(ckpt_or_path, (str, os.PathLike)):
        import torch

        ckpt = torch.load(ckpt_or_path, map_location="cpu", weights_only=False)
    else:
        ckpt = ckpt_or_path
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = _HintingSD(
        {
            k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in sd.items()
            if not k.startswith("body_model")
        }
    )
    vit = cfg.vit
    g = cfg.grid_size
    bb = "encoder.backbone."
    pe_w = sd[bb + "patch_embed.proj.weight"]

    def stacked(fmt, transpose=False):
        arrs = [sd[f"{bb}blocks.{i}.{fmt}"] for i in range(vit.depth)]
        if transpose:
            arrs = [_t(a) for a in arrs]
        return np.stack(arrs, axis=0)

    def seq_mlp(prefix):
        return {
            "fc0": {"kernel": _t(sd[f"{prefix}.0.weight"]), "bias": sd[f"{prefix}.0.bias"]},
            "fc1": {"kernel": _t(sd[f"{prefix}.2.weight"]), "bias": sd[f"{prefix}.2.bias"]},
        }

    encoder = {
        "backbone": {
            "patch_embed": {
                "kernel": pe_w.transpose(2, 3, 1, 0).reshape(-1, vit.embed_dim),
                "bias": sd[bb + "patch_embed.proj.bias"],
            },
            "cls_token": sd[bb + "cls_token"].reshape(1, 1, vit.embed_dim),
            "pos_embed": interpolate_dinov2_pos_embed(
                sd[bb + "pos_embed"].astype(np.float32), g
            ),
            "norm": {"scale": sd[bb + "norm.weight"], "bias": sd[bb + "norm.bias"]},
            "blocks": {
                "block": {
                    "norm1": {"scale": stacked("norm1.weight"), "bias": stacked("norm1.bias")},
                    "attn": {
                        "qkv": {"kernel": stacked("attn.qkv.weight", True), "bias": stacked("attn.qkv.bias")},
                        "proj": {"kernel": stacked("attn.proj.weight", True), "bias": stacked("attn.proj.bias")},
                    },
                    "ls1": {"gamma": stacked("ls1.gamma")},
                    "norm2": {"scale": stacked("norm2.weight"), "bias": stacked("norm2.bias")},
                    "mlp": {
                        "fc1": {"kernel": stacked("mlp.fc1.weight", True), "bias": stacked("mlp.fc1.bias")},
                        "fc2": {"kernel": stacked("mlp.fc2.weight", True), "bias": stacked("mlp.fc2.bias")},
                    },
                    "ls2": {"gamma": stacked("ls2.gamma")},
                }
            },
        },
        "mlp_det": seq_mlp("encoder.mlp_det"),
        "mlp_fov_unique": seq_mlp("encoder.mlp_fov_unique"),
    }
    decoder = {}
    for i in range(cfg.xat_depth):
        layer = f"decoder.transformer.layers.{i}."
        for j, tag in [(0, "sa"), (1, "ca"), (2, "ff")]:
            decoder[f"{tag}_norm{i}"] = {
                "scale": sd[layer + f"{j}.norm.weight"],
                "bias": sd[layer + f"{j}.norm.bias"],
            }
        decoder[f"sa{i}"] = {
            "to_qkv": {"kernel": _t(sd[layer + "0.fn.to_qkv.weight"])},
            "to_out": {"kernel": _t(sd[layer + "0.fn.to_out.0.weight"]), "bias": sd[layer + "0.fn.to_out.0.bias"]},
        }
        decoder[f"ca{i}"] = {
            "to_kv": {"kernel": _t(sd[layer + "1.fn.to_kv.weight"])},
            "to_q": {"kernel": _t(sd[layer + "1.fn.to_q.weight"])},
            "to_out": {"kernel": _t(sd[layer + "1.fn.to_out.0.weight"]), "bias": sd[layer + "1.fn.to_out.0.bias"]},
        }
        decoder[f"ff{i}"] = {
            "fc1": {"kernel": _t(sd[layer + "2.fn.net.0.weight"]), "bias": sd[layer + "2.fn.net.0.bias"]},
            "fc2": {"kernel": _t(sd[layer + "2.fn.net.3.weight"]), "bias": sd[layer + "2.fn.net.3.bias"]},
        }
    p = {
        "encoder": encoder,
        "dec_to_token": {"kernel": _t(sd["dec_to_token.weight"]), "bias": sd["dec_to_token.bias"]},
        "decoder": decoder,
        "mlp_offset": seq_mlp("mlp_offset"),
        "mlp_pose": seq_mlp("mlp_pose"),
        "mlp_shape": seq_mlp("mlp_shape"),
        "mlp_dist": seq_mlp("mlp_dist"),
    }
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a), jnp.float32), p)
    constants = {
        "dec_pos_emb": jnp.asarray(sd["dec_pos_emb"], jnp.float32).reshape(
            g, g, -1
        ),
        "init_body_pose": jnp.asarray(sd["init_body_pose"], jnp.float32),
    }
    return {"params": params, "constants": constants}


# ---------------- native checkpoints ----------------

def apply_mean_params(params, cfg: ModelConfig, path: str = None):
    """Splice ``smpl_mean_params.npz`` into a fresh param tree's HPH init
    buffers (reference model.py:440-477). No-op (returns ``params``
    unchanged) when the asset is absent — HPH's own initializers already
    carry the neutral identity-6d fallback."""
    import jax.numpy as jnp

    from multihmr_tpu.bodymodel.assets import load_mean_params
    from multihmr_tpu.factory import SMPLX_DIR

    if path is None:
        path = os.path.join(SMPLX_DIR, "smpl_mean_params.npz")
    if not os.path.exists(path):
        return params
    mean = load_mean_params(path, nrot=cfg.nrot, num_betas=cfg.num_betas)
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow-copied pytree
    head = p["params"]["x_attention_head"]
    head["init_body_pose"] = jnp.asarray(mean["pose"], jnp.float32)
    head["init_betas"] = jnp.asarray(mean["shape"], jnp.float32)
    head["init_cam"] = jnp.asarray(mean["cam"], jnp.float32)
    head["init_expression"] = jnp.asarray(mean["expression"], jnp.float32)
    return p


def save_checkpoint(ckpt_dir: str, params, epoch: int, cfg: ModelConfig):
    """Flax-msgpack params + JSON config (analogue of reference
    train.py:195-207's ``{epoch, model_state_dict, args}``)."""
    from flax import serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{epoch:06d}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    with open(os.path.join(ckpt_dir, f"ckpt_{epoch:06d}.json"), "w") as f:
        json.dump({"epoch": epoch, "config": dataclasses.asdict(cfg)}, f)
    return path


def load_checkpoint(path: str, params_template):
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    params = serialization.from_bytes(jax.device_get(params_template), data)
    meta_path = re.sub(r"\.msgpack$", ".json", path)
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta


class OrbaxCheckpointer:
    """Production checkpoint manager backed by orbax (async-capable,
    atomic, sharding-aware — restores distributed arrays directly onto a
    Mesh). The msgpack path above stays as the zero-dependency fallback."""

    def __init__(self, ckpt_dir: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, params, opt_state=None, metadata=None):
        items = {"params": params}
        if opt_state is not None:
            items["opt_state"] = opt_state
        args = self._ocp.args.Composite(
            **{k: self._ocp.args.StandardSave(v) for k, v in items.items()}
        )
        self.manager.save(step, args=args)
        self.manager.wait_until_finished()

    def restore(self, step=None, params_template=None, opt_state_template=None):
        step = step if step is not None else self.manager.latest_step()
        kwargs = {}
        if params_template is not None:
            kwargs["params"] = self._ocp.args.StandardRestore(params_template)
        if opt_state_template is not None:
            kwargs["opt_state"] = self._ocp.args.StandardRestore(opt_state_template)
        out = self.manager.restore(step, args=self._ocp.args.Composite(**kwargs))
        return out

    def latest_step(self):
        return self.manager.latest_step()


def prune_checkpoints(ckpt_dir: str, keep: int):
    """Retain the last ``keep`` checkpoints (reference train.py:209-223)."""
    ckpts = sorted(
        f for f in os.listdir(ckpt_dir) if re.match(r"ckpt_\d+\.msgpack$", f)
    )
    for old in ckpts[:-keep] if keep > 0 else []:
        for ext in (".msgpack", ".json"):
            path = os.path.join(ckpt_dir, old.replace(".msgpack", ext))
            if os.path.exists(path):
                os.remove(path)
