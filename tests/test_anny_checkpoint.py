"""Anny-variant checkpoint conversion: reference-named state dict → params
that load into MultiHMRAnnyNet and run."""

import numpy as np
import jax

from multihmr_tpu.config import ViTConfig
from multihmr_tpu.models.multihmr_anny import AnnyConfig, MultiHMRAnny
from multihmr_tpu.bodymodel.anny import synthetic_anny_model, NUM_BONES
from multihmr_tpu.io.checkpoint import convert_torch_checkpoint_anny
from multihmr_tpu.ops.posenc import get_2d_sincos_pos_embed

TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2)


def make_anny_state_dict(cfg, rng):
    D = cfg.vit.embed_dim
    X = cfg.xat_dim
    inner = cfg.xat_heads * cfg.xat_dim_head
    sd = {}
    bb = "encoder.backbone."
    sd[bb + "patch_embed.proj.weight"] = rng.normal(size=(D, 3, 14, 14)).astype(np.float32)
    sd[bb + "patch_embed.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
    sd[bb + "cls_token"] = rng.normal(size=(1, 1, D)).astype(np.float32)
    sd[bb + "pos_embed"] = rng.normal(size=(1, 1 + 37 * 37, D)).astype(np.float32)
    sd[bb + "norm.weight"] = np.ones(D, np.float32)
    sd[bb + "norm.bias"] = np.zeros(D, np.float32)
    for i in range(cfg.vit.depth):
        b = f"{bb}blocks.{i}."
        for pair in [("norm1", D), ("norm2", D)]:
            sd[b + f"{pair[0]}.weight"] = np.ones(D, np.float32)
            sd[b + f"{pair[0]}.bias"] = np.zeros(D, np.float32)
        sd[b + "attn.qkv.weight"] = rng.normal(size=(3 * D, D)).astype(np.float32)
        sd[b + "attn.qkv.bias"] = rng.normal(size=(3 * D,)).astype(np.float32)
        sd[b + "attn.proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[b + "attn.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[b + "ls1.gamma"] = np.full(D, 1e-5, np.float32)
        sd[b + "ls2.gamma"] = np.full(D, 1e-5, np.float32)
        sd[b + "mlp.fc1.weight"] = rng.normal(size=(4 * D, D)).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = rng.normal(size=(4 * D,)).astype(np.float32)
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(D, 4 * D)).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = rng.normal(size=(D,)).astype(np.float32)
    for mlp, i_dim, od in [
        ("encoder.mlp_det", D, 1), ("encoder.mlp_fov_unique", D, 1),
        ("mlp_offset", X, 2), ("mlp_shape", X, cfg.num_betas), ("mlp_dist", X, 1),
        ("mlp_pose", X + cfg.n_joints * 6, cfg.n_joints * 6),
    ]:
        hidden = D if mlp.startswith("encoder") else X
        sd[f"{mlp}.0.weight"] = rng.normal(size=(hidden, i_dim)).astype(np.float32)
        sd[f"{mlp}.0.bias"] = rng.normal(size=(hidden,)).astype(np.float32)
        sd[f"{mlp}.2.weight"] = rng.normal(size=(od, hidden)).astype(np.float32)
        sd[f"{mlp}.2.bias"] = rng.normal(size=(od,)).astype(np.float32)
    sd["dec_to_token.weight"] = rng.normal(size=(X, D)).astype(np.float32)
    sd["dec_to_token.bias"] = rng.normal(size=(X,)).astype(np.float32)
    g = cfg.grid_size
    sd["dec_pos_emb"] = get_2d_sincos_pos_embed(X, g).astype(np.float32)
    sd["init_body_pose"] = rng.normal(size=(1, cfg.n_joints * 6)).astype(np.float32)
    for i in range(cfg.xat_depth):
        layer = f"decoder.transformer.layers.{i}."
        for j in (0, 1, 2):
            sd[layer + f"{j}.norm.weight"] = np.ones(X, np.float32)
            sd[layer + f"{j}.norm.bias"] = np.zeros(X, np.float32)
        sd[layer + "0.fn.to_qkv.weight"] = rng.normal(size=(3 * inner, X)).astype(np.float32)
        sd[layer + "0.fn.to_out.0.weight"] = rng.normal(size=(X, inner)).astype(np.float32)
        sd[layer + "0.fn.to_out.0.bias"] = rng.normal(size=(X,)).astype(np.float32)
        sd[layer + "1.fn.to_kv.weight"] = rng.normal(size=(2 * inner, X)).astype(np.float32)
        sd[layer + "1.fn.to_q.weight"] = rng.normal(size=(inner, X)).astype(np.float32)
        sd[layer + "1.fn.to_out.0.weight"] = rng.normal(size=(X, inner)).astype(np.float32)
        sd[layer + "1.fn.to_out.0.bias"] = rng.normal(size=(X,)).astype(np.float32)
        sd[layer + "2.fn.net.0.weight"] = rng.normal(size=(cfg.xat_mlp_dim, X)).astype(np.float32)
        sd[layer + "2.fn.net.0.bias"] = rng.normal(size=(cfg.xat_mlp_dim,)).astype(np.float32)
        sd[layer + "2.fn.net.3.weight"] = rng.normal(size=(X, cfg.xat_mlp_dim)).astype(np.float32)
        sd[layer + "2.fn.net.3.bias"] = rng.normal(size=(X,)).astype(np.float32)
    sd["body_model.some_buffer"] = np.zeros(3, np.float32)  # must be ignored
    sd["useful_rotmat"] = np.ones((1, cfg.n_joints), np.float32)
    return sd


def test_convert_anny_and_run(rng):
    cfg = AnnyConfig(
        img_size=56, xat_dim=32, xat_depth=1, xat_heads=2, xat_dim_head=8,
        xat_mlp_dim=64, max_people=3, compute_dtype="float32",
        vit_override=TINY,
    )
    sd = make_anny_state_dict(cfg, rng)
    params = convert_torch_checkpoint_anny({"model_state_dict": sd}, cfg)
    bm = synthetic_anny_model(num_vertices=64, num_bones=NUM_BONES)
    model = MultiHMRAnny(cfg, bm, person_center_idx=5)
    ref = model.init_params(jax.random.PRNGKey(0))
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    # the converter may omit 'useful_rotmat'-style constants the net doesn't
    # declare; required: every net param is provided
    missing = ref_paths - got_paths
    assert not missing, sorted(missing)[:8]

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))
    out = model.forward(params, x, det_thresh=0.2)
    assert np.isfinite(np.asarray(out["v3d"])).all()
