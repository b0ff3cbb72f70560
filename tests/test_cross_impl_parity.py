"""Cross-implementation golden tests.

Independent torch implementations of the DINOv2 block stack and the HPH
decoder math (written from the architecture definition, not copied) are run
against the flax modules through the checkpoint converter: same reference-
named state dict → both implementations → outputs must match. This jointly
validates the converter's weight mapping AND the flax modules' numerics.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from multihmr_tpu.config import ModelConfig, ViTConfig
from multihmr_tpu.models.vit import DINOv2ViT
from multihmr_tpu.models.hph import HPH
from multihmr_tpu.io.checkpoint import convert_torch_checkpoint
from multihmr_tpu.ops.detection import Detections
from tests.test_checkpoint import make_reference_state_dict

TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2)


class TinyConfig(ModelConfig):
    @property
    def vit(self):
        return TINY


def torch_vit_forward(sd, x_nhwc, grid, cfg):
    """Independent torch DINOv2 forward: conv patch embed, cls+pos, pre-norm
    blocks with LayerScale, final norm; returns patch tokens (no cls)."""
    bb = "backbone.encoder."
    t = lambda k: torch.from_numpy(sd[bb + k])
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)  # NCHW
    tok = F.conv2d(x, t("patch_embed.proj.weight"), t("patch_embed.proj.bias"),
                   stride=cfg.vit.patch_size)
    B, D, gh, gw = tok.shape
    tok = tok.flatten(2).transpose(1, 2)  # [B, N, D]
    cls = t("cls_token").expand(B, -1, -1)
    tok = torch.cat([cls, tok], 1)
    # interpolate pos embed to the working grid exactly as dinov2 does
    pe = t("pos_embed")
    cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
    s0 = int(patch_pe.shape[1] ** 0.5)
    if s0 != grid:
        scale = (grid + 0.1) / s0
        patch_pe = F.interpolate(
            patch_pe.reshape(1, s0, s0, D).permute(0, 3, 1, 2),
            scale_factor=(scale, scale), mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).reshape(1, grid * grid, D)
    tok = tok + torch.cat([cls_pe, patch_pe], 1)

    H = cfg.vit.num_heads
    for i in range(cfg.vit.depth):
        b = f"blocks.{i}."
        y = F.layer_norm(tok, (D,), t(b + "norm1.weight"), t(b + "norm1.bias"), eps=1e-6)
        qkv = y @ t(b + "attn.qkv.weight").T + t(b + "attn.qkv.bias")
        q, k, v = qkv.chunk(3, -1)
        rs = lambda z: z.reshape(B, -1, H, D // H).transpose(1, 2)
        att = torch.softmax(rs(q) @ rs(k).transpose(-1, -2) / (D // H) ** 0.5, -1)
        o = (att @ rs(v)).transpose(1, 2).reshape(B, -1, D)
        o = o @ t(b + "attn.proj.weight").T + t(b + "attn.proj.bias")
        tok = tok + t(b + "ls1.gamma") * o
        y = F.layer_norm(tok, (D,), t(b + "norm2.weight"), t(b + "norm2.bias"), eps=1e-6)
        y = F.gelu(y @ t(b + "mlp.fc1.weight").T + t(b + "mlp.fc1.bias"))
        y = y @ t(b + "mlp.fc2.weight").T + t(b + "mlp.fc2.bias")
        tok = tok + t(b + "ls2.gamma") * y
    tok = F.layer_norm(tok, (D,), t("norm.weight"), t("norm.bias"), eps=1e-6)
    return tok[:, 1:].numpy()


def test_vit_matches_independent_torch(rng):
    cfg = TinyConfig(img_size=56, max_people=4, compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    params = convert_torch_checkpoint(sd, cfg)
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)

    vit = DINOv2ViT(cfg.vit, grid_size=cfg.grid_size, dtype=jnp.float32)
    ours = np.asarray(
        vit.apply({"params": params["params"]["backbone"]}, jnp.asarray(x))[
            "patch_tokens"
        ]
    )
    with torch.no_grad():
        ref = torch_vit_forward(sd, x, cfg.grid_size, cfg)
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def torch_hph_forward(sd, cfg, z_central, kv_grid, rows, cols, valid):
    """Independent torch HPH: learned query/value embeds at detected cells,
    init-token concat, (SA,CA,FF)x depth with the reference mask math,
    decoders + init residuals. Returns the pre-rot6d pose tensor."""
    xa = "x_attention_head."
    t = lambda k: torch.from_numpy(sd[xa + k])
    B, K, C = z_central.shape
    g = cfg.grid_size
    hph = cfg.hph
    heads, dh = hph.heads, hph.dim_head
    mask = torch.from_numpy(valid)  # [B, K]

    x_central = torch.from_numpy(z_central) + (
        t("cross_queries_x")[rows] + t("cross_queries_y")[cols]
    ) * mask[..., None]
    kv = torch.from_numpy(kv_grid).clone()  # [B, g, g, C]
    vals = (t("cross_values_x")[rows] + t("cross_values_y")[cols]) * mask[..., None]
    for b in range(B):
        for k in range(K):
            kv[b, rows[b, k], cols[b, k]] += vals[b, k]
    context = kv.reshape(B, g * g, C)

    init_pose = t("init_body_pose")
    init_betas = t("init_betas")
    init_cam = t("init_cam")
    init_expr = t("init_expression")
    token = torch.cat(
        [x_central,
         init_pose.expand(B, K, -1), init_betas.expand(B, K, -1),
         init_cam.expand(B, K, -1)], -1)
    x = token @ t("transformer.to_token_embedding.weight").T + t(
        "transformer.to_token_embedding.bias"
    )
    x = x + t("transformer.pos_embedding")[:, 0][:, None, :]

    def ln(z, w, b):
        return F.layer_norm(z, (z.shape[-1],), w, b, eps=1e-5)

    for i in range(cfg.xat_depth):
        layer = f"transformer.transformer.layers.{i}."
        x = x * mask[..., None]
        # SA with reference mask math
        y = ln(x, t(layer + "0.norm.weight"), t(layer + "0.norm.bias"))
        qkv = y @ t(layer + "0.fn.to_qkv.weight").T
        q, k, v = qkv.chunk(3, -1)
        rs = lambda z: z.reshape(B, -1, heads, dh).transpose(1, 2)
        q, k, v = rs(q), rs(k), rs(v)
        m4 = mask[:, None, :, None]
        q, k, v = q * m4, k * m4, v * m4
        dots = q @ k.transpose(-1, -2) * dh**-0.5
        dots = dots - (1 - mask)[:, None, None, :] * 1e11
        att = torch.softmax(dots, -1) * mask[:, None, None, :]
        o = (att @ v).transpose(1, 2).reshape(B, K, heads * dh)
        x = o @ t(layer + "0.fn.to_out.0.weight").T + t(layer + "0.fn.to_out.0.bias") + x
        # CA
        y = ln(x, t(layer + "1.norm.weight"), t(layer + "1.norm.bias"))
        kv2 = context @ t(layer + "1.fn.to_kv.weight").T
        k2, v2 = kv2.chunk(2, -1)
        q2 = y @ t(layer + "1.fn.to_q.weight").T
        q2 = rs(q2) * m4
        k2 = k2.reshape(B, -1, heads, dh).transpose(1, 2)
        v2 = v2.reshape(B, -1, heads, dh).transpose(1, 2)
        dots = q2 @ k2.transpose(-1, -2) * dh**-0.5
        dots = dots - (1 - mask)[:, None, :, None] * 1e6
        o = (torch.softmax(dots, -1) @ v2) * m4
        o = o.transpose(1, 2).reshape(B, K, heads * dh)
        x = o @ t(layer + "1.fn.to_out.0.weight").T + t(layer + "1.fn.to_out.0.bias") + x
        # FF
        y = ln(x, t(layer + "2.norm.weight"), t(layer + "2.norm.bias"))
        y = F.gelu(y @ t(layer + "2.fn.net.0.weight").T + t(layer + "2.fn.net.0.bias"))
        y = y @ t(layer + "2.fn.net.3.weight").T + t(layer + "2.fn.net.3.bias")
        x = y + x
    x = x * mask[..., None]

    pose = x @ t("decpose.weight").T + t("decpose.bias") + init_pose
    betas = x @ t("decshape.weight").T + t("decshape.bias") + init_betas
    cam = x @ t("deccam.weight").T + t("deccam.bias") + init_cam
    expr = x @ t("decexpression.weight").T + t("decexpression.bias") + init_expr
    return pose.numpy(), betas.numpy(), cam.numpy(), expr.numpy()


def test_hph_matches_independent_torch(rng):
    cfg = TinyConfig(img_size=56, max_people=4, compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    params = convert_torch_checkpoint(sd, cfg)
    g = cfg.grid_size
    C = cfg.vit.embed_dim + cfg.camera_embed_dim
    B, K = 2, cfg.max_people

    z_central = rng.normal(size=(B, K, C)).astype(np.float32)
    kv_grid = rng.normal(size=(B, g, g, C)).astype(np.float32)
    rows = rng.integers(0, g, size=(B, K)).astype(np.int32)
    cols = rng.integers(0, g, size=(B, K)).astype(np.int32)
    valid = np.array([[1, 1, 1, 0], [1, 0, 0, 0]], np.float32)
    rows, cols = rows * valid.astype(np.int32), cols * valid.astype(np.int32)
    # avoid duplicate cells (scatter-add order would otherwise matter)
    rows[0, :3] = [1, 2, 3]

    det = Detections(
        rows=jnp.asarray(rows), cols=jnp.asarray(cols),
        scores=jnp.asarray(valid), valid=jnp.asarray(valid),
    )
    z_c = z_central * valid[..., None]  # invalid slots zeroed like the model path

    hph = HPH(cfg)
    out = hph.apply(
        {"params": params["params"]["x_attention_head"]},
        jnp.asarray(z_c), jnp.asarray(kv_grid), det,
    )
    with torch.no_grad():
        pose_ref, betas_ref, cam_ref, expr_ref = torch_hph_forward(
            sd, cfg, z_c, kv_grid, rows, cols, valid
        )
    # random weights blow activations up to ~1e5, so fp32 accumulation-order
    # differences show as ~3e-4 relative error — compare relatively
    vm = valid.astype(bool)
    kw = dict(rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out["betas"])[vm], betas_ref[vm], **kw)
    np.testing.assert_allclose(np.asarray(out["cam"])[vm], cam_ref[vm], **kw)
    np.testing.assert_allclose(np.asarray(out["expression"])[vm], expr_ref[vm], **kw)
    # rotmat from the same 6d pose (normalized → compare absolutely)
    from multihmr_tpu.ops.rotations import rot6d_to_rotmat

    rm_ref = np.asarray(
        rot6d_to_rotmat(jnp.asarray(pose_ref.reshape(B, K, cfg.nrot, 6)))
    )
    np.testing.assert_allclose(
        np.asarray(out["rotmat"])[vm], rm_ref[vm], atol=2e-3
    )
