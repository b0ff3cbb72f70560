"""Checkpoint conversion + native save/load/prune."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.config import ModelConfig, ViTConfig
from multihmr_tpu.bodymodel import synthetic_body_model
from multihmr_tpu.models.multihmr import MultiHMR
from multihmr_tpu.io.checkpoint import (
    convert_torch_checkpoint,
    config_from_ckpt_args,
    save_checkpoint,
    load_checkpoint,
    prune_checkpoints,
)

TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2)


class TinyConfig(ModelConfig):
    @property
    def vit(self):
        return TINY


def make_reference_state_dict(cfg, rng):
    """Synthesize a state dict with the reference's exact key naming
    (hub-DINOv2 backbone + model.py heads) and torch weight layouts."""
    D = cfg.vit.embed_dim
    sd = {}
    bb = "backbone.encoder."
    sd[bb + "patch_embed.proj.weight"] = rng.normal(size=(D, 3, 14, 14)).astype(np.float32)
    sd[bb + "patch_embed.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
    sd[bb + "cls_token"] = rng.normal(size=(1, 1, D)).astype(np.float32)
    sd[bb + "pos_embed"] = rng.normal(size=(1, 1 + 37 * 37, D)).astype(np.float32)
    sd[bb + "norm.weight"] = np.ones(D, np.float32)
    sd[bb + "norm.bias"] = np.zeros(D, np.float32)
    for i in range(cfg.vit.depth):
        b = f"{bb}blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(D, np.float32)
        sd[b + "norm1.bias"] = np.zeros(D, np.float32)
        sd[b + "attn.qkv.weight"] = rng.normal(size=(3 * D, D)).astype(np.float32)
        sd[b + "attn.qkv.bias"] = rng.normal(size=(3 * D,)).astype(np.float32)
        sd[b + "attn.proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[b + "attn.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[b + "ls1.gamma"] = np.full(D, 1e-5, np.float32)
        sd[b + "norm2.weight"] = np.ones(D, np.float32)
        sd[b + "norm2.bias"] = np.zeros(D, np.float32)
        sd[b + "mlp.fc1.weight"] = rng.normal(size=(4 * D, D)).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = rng.normal(size=(4 * D,)).astype(np.float32)
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(D, 4 * D)).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[b + "ls2.gamma"] = np.full(D, 1e-5, np.float32)
    for mlp, od in [("mlp_classif", 1), ("mlp_offset", 2)]:
        sd[f"{mlp}.0.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{mlp}.0.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[f"{mlp}.2.weight"] = rng.normal(size=(od, D)).astype(np.float32)
        sd[f"{mlp}.2.bias"] = rng.normal(size=(od,)).astype(np.float32)
    xa = "x_attention_head."
    C = D + cfg.camera_embed_dim
    res = cfg.grid_size
    hph = cfg.hph
    inner = hph.heads * hph.dim_head
    for name in ["cross_queries_x", "cross_queries_y", "cross_values_x", "cross_values_y"]:
        sd[xa + name] = rng.normal(size=(res, C)).astype(np.float32)
    sd[xa + "init_body_pose"] = rng.normal(size=(1, cfg.npose)).astype(np.float32)
    sd[xa + "init_betas"] = rng.normal(size=(1, cfg.num_betas)).astype(np.float32)
    sd[xa + "init_betas_kid"] = rng.normal(size=(1, cfg.num_betas + 1)).astype(np.float32)
    sd[xa + "init_cam"] = rng.normal(size=(1, 3)).astype(np.float32)
    sd[xa + "init_expression"] = rng.normal(size=(1, 10)).astype(np.float32)
    sd[xa + "transformer.to_token_embedding.weight"] = rng.normal(
        size=(hph.dim, cfg.token_dim)
    ).astype(np.float32)
    sd[xa + "transformer.to_token_embedding.bias"] = rng.normal(size=(hph.dim,)).astype(np.float32)
    sd[xa + "transformer.pos_embedding"] = rng.normal(size=(1, 1, hph.dim)).astype(np.float32)
    for dec, od in [("decpose", cfg.npose), ("decshape", cfg.num_betas),
                    ("deccam", 3), ("decexpression", 10)]:
        sd[xa + f"{dec}.weight"] = rng.normal(size=(od, hph.dim)).astype(np.float32)
        sd[xa + f"{dec}.bias"] = rng.normal(size=(od,)).astype(np.float32)
    for i in range(cfg.xat_depth):
        layer = f"{xa}transformer.transformer.layers.{i}."
        for j in (0, 1, 2):
            sd[layer + f"{j}.norm.weight"] = np.ones(hph.dim, np.float32)
            sd[layer + f"{j}.norm.bias"] = np.zeros(hph.dim, np.float32)
        sd[layer + "0.fn.to_qkv.weight"] = rng.normal(size=(3 * inner, hph.dim)).astype(np.float32)
        sd[layer + "0.fn.to_out.0.weight"] = rng.normal(size=(hph.dim, inner)).astype(np.float32)
        sd[layer + "0.fn.to_out.0.bias"] = rng.normal(size=(hph.dim,)).astype(np.float32)
        sd[layer + "1.fn.to_kv.weight"] = rng.normal(size=(2 * inner, C)).astype(np.float32)
        sd[layer + "1.fn.to_q.weight"] = rng.normal(size=(inner, hph.dim)).astype(np.float32)
        sd[layer + "1.fn.to_out.0.weight"] = rng.normal(size=(hph.dim, inner)).astype(np.float32)
        sd[layer + "1.fn.to_out.0.bias"] = rng.normal(size=(hph.dim,)).astype(np.float32)
        sd[layer + "2.fn.net.0.weight"] = rng.normal(size=(hph.mlp_dim, hph.dim)).astype(np.float32)
        sd[layer + "2.fn.net.0.bias"] = rng.normal(size=(hph.mlp_dim,)).astype(np.float32)
        sd[layer + "2.fn.net.3.weight"] = rng.normal(size=(hph.dim, hph.mlp_dim)).astype(np.float32)
        sd[layer + "2.fn.net.3.bias"] = rng.normal(size=(hph.dim,)).astype(np.float32)
    # smpl_layer buffers that must be ignored
    sd["smpl_layer.neutral_10.bm_x.v_template"] = np.zeros((5, 3), np.float32)
    return sd


def test_config_from_ckpt_args():
    cfg = config_from_ckpt_args(
        {"backbone": "dinov2_vitl14", "img_size": 672, "xat_depth": 2, "num_betas": 10}
    )
    assert cfg.backbone == "dinov2_vitl14" and cfg.img_size == 672
    assert cfg.grid_size == 48


def test_convert_and_run(rng):
    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5", compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    params = convert_torch_checkpoint({"model_state_dict": sd}, cfg)

    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    # the converted tree must match the model's own init structure exactly
    ref = model.init_params(jax.random.PRNGKey(0))
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:5]} extra: {sorted(got_paths - ref_paths)[:5]}"
    )
    for (p1, a), (p2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(ref), key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert a.shape == b.shape, (jax.tree_util.keystr(p1), a.shape, b.shape)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))
    K = jnp.asarray(np.array([[[100.0, 0, 28], [0, 100, 28], [0, 0, 1]]], np.float32))
    out = model.forward(params, x, K)
    assert np.isfinite(np.asarray(out["v3d"])).all()
    # pos embed got interpolated from 37x37 to 4x4 grid
    assert params["params"]["backbone"]["pos_embed"].shape == (1, 1 + 16, 32)


def test_linear_transpose_semantics(rng):
    """Converted Dense(kernel) must reproduce torch Linear: y = x @ W.T + b."""
    import torch

    cfg = TinyConfig(img_size=56, max_people=4, compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    params = convert_torch_checkpoint(sd, cfg)
    x = rng.normal(size=(3, cfg.vit.embed_dim)).astype(np.float32)
    W = sd["mlp_classif.0.weight"]
    b = sd["mlp_classif.0.bias"]
    ref = torch.from_numpy(x) @ torch.from_numpy(W).T + torch.from_numpy(b)
    ours = x @ np.asarray(params["params"]["mlp_classif"]["fc0"]["kernel"]) + np.asarray(
        params["params"]["mlp_classif"]["fc0"]["bias"]
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_save_load_prune(tmp_path, rng):
    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5", compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpts")
    for epoch in range(5):
        save_checkpoint(d, params, epoch, cfg)
    prune_checkpoints(d, keep=2)
    files = sorted(f for f in os.listdir(d) if f.endswith(".msgpack"))
    assert files == ["ckpt_000003.msgpack", "ckpt_000004.msgpack"]
    loaded, meta = load_checkpoint(os.path.join(d, files[-1]), params)
    assert meta["epoch"] == 4
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(loaded)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_config_from_ckpt_args_list_img_size():
    """Real checkpoints store img_size as a list (reference demo.py:99
    `kwargs['img_size'] = ckpt['args'].img_size[0]`)."""
    cfg = config_from_ckpt_args(
        {"backbone": "dinov2_vitl14", "img_size": [896], "num_betas": 11}
    )
    assert cfg.img_size == 896 and cfg.num_betas == 11


def test_validate_state_dict_reporting(rng):
    from multihmr_tpu.io.checkpoint import validate_reference_state_dict

    cfg = TinyConfig(img_size=56, max_people=4, compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    report = validate_reference_state_dict(sd, cfg)
    assert report["missing"] == []
    assert report["unexpected"] == []
    # init_betas_kid is a reference buffer we intentionally don't consume
    assert "x_attention_head.init_betas_kid" in report["ignored"]

    sd2 = dict(sd)
    del sd2["x_attention_head.decpose.weight"]
    sd2["totally.bogus.key"] = np.zeros(3, np.float32)
    report = validate_reference_state_dict(sd2, cfg)
    assert report["missing"] == ["x_attention_head.decpose.weight"]
    assert report["unexpected"] == ["totally.bogus.key"]


def test_convert_missing_key_lists_all(rng):
    import pytest

    cfg = TinyConfig(img_size=56, max_people=4, compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    del sd["x_attention_head.decpose.weight"]
    del sd["mlp_classif.0.bias"]
    with pytest.raises(KeyError) as exc:
        convert_torch_checkpoint({"model_state_dict": sd}, cfg)
    msg = str(exc.value)
    assert "x_attention_head.decpose.weight" in msg
    assert "mlp_classif.0.bias" in msg
    assert "config_from_ckpt_args" in msg


def test_convert_unexpected_key_warns(rng):
    import warnings

    cfg = TinyConfig(img_size=56, max_people=4, compute_dtype="float32")
    sd = make_reference_state_dict(cfg, rng)
    sd["some.new.head.weight"] = np.zeros((3, 3), np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        params = convert_torch_checkpoint({"model_state_dict": sd}, cfg)
    assert params is not None
    assert any("some.new.head.weight" in str(x.message) for x in w)


def test_convert_num_betas_11(rng):
    """The 1288/bedlam configs use num_betas=11 (reference model.py:389
    `assert num_betas in [10, 11]`)."""
    cfg = TinyConfig(
        img_size=56, max_people=4, person_center="j5",
        compute_dtype="float32", num_betas=11,
    )
    sd = make_reference_state_dict(cfg, rng)
    assert sd["x_attention_head.init_betas"].shape == (1, 11)
    params = convert_torch_checkpoint({"model_state_dict": sd}, cfg)
    bm = synthetic_body_model(num_betas=11)
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))
    K = jnp.asarray(np.array([[[100.0, 0, 28], [0, 100, 28], [0, 0, 1]]], np.float32))
    out = model.forward(params, x, K)
    assert out["shape"].shape[-1] == 11
    assert np.isfinite(np.asarray(out["v3d"])).all()


def test_apply_mean_params_splices_asset(rng, tmp_path):
    """apply_mean_params loads smpl_mean_params.npz into the HPH init
    buffers (reference model.py:440-477): first 24 joints from the file's
    mean pose, identity-6d beyond, shape/cam from the file."""
    from multihmr_tpu.io.checkpoint import apply_mean_params

    cfg = TinyConfig(
        img_size=56, max_people=4, person_center="j5", compute_dtype="float32"
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))

    mean_pose = rng.normal(size=(24 * 6,)).astype(np.float32)
    path = tmp_path / "smpl_mean_params.npz"
    np.savez(
        path, pose=mean_pose,
        shape=rng.normal(size=(10,)).astype(np.float32),
        cam=np.array([0.9, 0.1, -0.1], np.float32),
    )
    out = apply_mean_params(params, cfg, path=str(path))
    head = out["params"]["x_attention_head"]
    got = np.asarray(head["init_body_pose"]).reshape(cfg.nrot, 6)
    np.testing.assert_allclose(got[:24].reshape(-1), mean_pose, rtol=1e-6)
    # beyond the file's 24 joints: the PROPER identity-6d layout (a1=e1,
    # a2=e2) — deliberately not the reference's degenerate [1,0,0,1,0,0]
    # (see assets.load_mean_params docstring)
    eye6d = np.array([1, 0, 0, 0, 1, 0], np.float32)
    np.testing.assert_array_equal(got[24:], np.tile(eye6d, (cfg.nrot - 24, 1)))
    assert np.asarray(head["init_cam"]).reshape(-1)[0] == np.float32(0.9)
    # missing asset → unchanged tree
    same = apply_mean_params(params, cfg, path=str(tmp_path / "none.npz"))
    assert same is params


def test_fresh_init_rotations_are_proper(rng):
    """Fresh (no-checkpoint) init must start from PROPER rotations: the HPH
    init pose buffers carry the neutral identity-6d layout, so the forward's
    rotmats have det ~ +1 — a zero-initialized 6d would Gram-Schmidt to a
    rank-deficient matrix and collapse every mesh when training from
    scratch."""
    cfg = TinyConfig(
        img_size=56, max_people=4, person_center="j5", compute_dtype="float32"
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    pose0 = np.asarray(
        params["params"]["x_attention_head"]["init_body_pose"]
    ).reshape(cfg.nrot, 6)
    from multihmr_tpu.ops.rotations import rot6d_to_rotmat

    R = np.asarray(rot6d_to_rotmat(jnp.asarray(pose0)))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
