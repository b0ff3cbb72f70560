"""Model assembly smoke tests + padding-invariance of the masked head.

Padding-invariance is THE correctness property of the static-shape redesign:
outputs at valid person slots must be identical whether the batch is padded
to capacity K or truncated to the true person count (which is what the
reference's ragged pipeline computes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihmr_tpu.config import ModelConfig, ViTConfig
from multihmr_tpu.bodymodel import synthetic_body_model
from multihmr_tpu.models.multihmr import MultiHMR
from multihmr_tpu.models.hph import MaskedSelfAttention, MaskedCrossAttention
from multihmr_tpu.ops.detection import Detections


TINY_VIT = ViTConfig(embed_dim=32, depth=2, num_heads=2)


class TinyConfig(ModelConfig):
    @property
    def vit(self):
        return TINY_VIT


def make_model():
    cfg = TinyConfig(
        img_size=56, max_people=4, person_center="j5", compute_dtype="float32"
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    return MultiHMR(cfg, bm, person_center_joint_names=names)


def default_K(B, img=56):
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 100.0
    K[:, 0, 2] = K[:, 1, 2] = img / 2
    K[:, 2, 2] = 1.0
    return jnp.asarray(K)


def test_forward_shapes_inference():
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 56, 56, 3))
    out = model.forward(params, x, default_K(B), det_thresh=0.3)
    K = model.cfg.max_people
    assert out["scores"].shape == (B, 4, 4)
    assert out["rotvec"].shape == (B, K, 53, 3)
    assert out["shape"].shape == (B, K, 10)
    assert out["v3d"].shape == (B, K, model.body_model.num_vertices, 3)
    assert out["j3d"].shape == (B, K, model.body_model.num_output_joints, 3)
    assert out["loc"].shape == (B, K, 2)
    assert np.isfinite(np.asarray(out["v3d"])).all()
    persons = model.extract_persons(out)
    assert len(persons) == B
    for plist in persons:
        for p in plist:
            assert set(p) == {
                "scores", "loc", "transl", "transl_pelvis", "rotvec",
                "expression", "shape", "v3d", "j3d", "j2d",
            }


def test_forward_training_mode_uses_gt():
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    B, K = 2, model.cfg.max_people
    gt = Detections(
        rows=jnp.asarray([[1, 2, 0, 0], [3, 0, 0, 0]], jnp.int32),
        cols=jnp.asarray([[1, 3, 0, 0], [0, 0, 0, 0]], jnp.int32),
        scores=jnp.ones((B, K)),
        valid=jnp.asarray([[1.0, 1.0, 0, 0], [1.0, 0, 0, 0]]),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 56, 56, 3))
    out = model.forward(params, x, default_K(B), is_training=True, gt_det=gt)
    assert out["det"] is gt
    assert out["dist_postprocessed"].shape == (B, K, 1)
    # invalid slots produce zero rotvec deltas? (masked head output decodes
    # from init only) — just check finiteness and mask bookkeeping
    assert np.isfinite(np.asarray(out["rotmat"])).all()


@pytest.mark.parametrize("module_cls", ["sa", "ca"])
def test_masked_attention_padding_invariance(module_cls, rng):
    """Valid-slot outputs must not depend on padding (the reference computes
    them on ragged tensors with max-count padding, cross_attn_transformer.py
    :142-154,193-203)."""
    dim, heads, dim_head, Kcap, N, ctx_dim = 64, 4, 16, 6, 32, 48
    counts = [3, 1, 6]
    B = len(counts)
    x = rng.normal(size=(B, Kcap, dim)).astype(np.float32)
    context = rng.normal(size=(B, N, ctx_dim)).astype(np.float32)
    mask = np.zeros((B, Kcap), np.float32)
    for b, cnt in enumerate(counts):
        mask[b, :cnt] = 1

    if module_cls == "sa":
        mod = MaskedSelfAttention(dim, heads, dim_head)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
        full = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(mask)))
        for b, cnt in enumerate(counts):
            trunc_x = jnp.asarray(x[b : b + 1, :cnt])
            trunc = np.asarray(
                mod.apply(params, trunc_x, jnp.ones((1, cnt), jnp.float32))
            )
            np.testing.assert_allclose(full[b, :cnt], trunc[0], atol=1e-5)
    else:
        mod = MaskedCrossAttention(dim, ctx_dim, heads, dim_head)
        params = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(context), jnp.asarray(mask)
        )
        full = np.asarray(
            mod.apply(params, jnp.asarray(x), jnp.asarray(context), jnp.asarray(mask))
        )
        for b, cnt in enumerate(counts):
            trunc = np.asarray(
                mod.apply(
                    params,
                    jnp.asarray(x[b : b + 1, :cnt]),
                    jnp.asarray(context[b : b + 1]),
                    jnp.ones((1, cnt), jnp.float32),
                )
            )
            np.testing.assert_allclose(full[b, :cnt], trunc[0], atol=1e-5)


def test_full_model_padding_invariance():
    """End-to-end: run the same image at capacity 4 and capacity 8 — valid
    person outputs must match."""
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    cfg4 = TinyConfig(img_size=56, max_people=4, person_center="j5", compute_dtype="float32")
    cfg8 = TinyConfig(img_size=56, max_people=8, person_center="j5", compute_dtype="float32")
    m4 = MultiHMR(cfg4, bm, person_center_joint_names=names)
    m8 = MultiHMR(cfg8, bm, person_center_joint_names=names)
    params = m4.init_params(jax.random.PRNGKey(0))  # same net params work for both

    x = jax.random.normal(jax.random.PRNGKey(7), (1, 56, 56, 3))
    K = default_K(1)
    out4 = m4.forward(params, x, K, det_thresh=0.5)
    out8 = m8.forward(params, x, K, det_thresh=0.5)
    n4 = int(out4["det"].count[0])
    n8 = int(out8["det"].count[0])
    if n4 == 0:
        pytest.skip("random init produced no detections above 0.5")
    assert n4 == min(n8, 4)
    n = min(n4, n8)
    np.testing.assert_allclose(
        np.asarray(out4["v3d"])[0, :n], np.asarray(out8["v3d"])[0, :n], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out4["rotvec"])[0, :n], np.asarray(out8["rotvec"])[0, :n], atol=1e-4
    )


def test_bf16_param_cast_anny_layout():
    """cast_backbone_bf16 also finds the ViT under the Anny layout
    (params.encoder.backbone) and leaves the heads fp32."""
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    params = {"params": {
        "encoder": {
            "backbone": {
                "blocks": {"block": {
                    "attn": {"qkv": {"kernel": jnp.ones((4, 12))}},
                    "norm1": {"scale": jnp.ones((4,))},
                }},
            },
            "mlp_det": {"kernel": jnp.ones((4, 1))},
        },
        "mlp_pose": {"kernel": jnp.ones((8, 8))},
    }}
    cast = cast_backbone_bf16(params)
    enc = cast["params"]["encoder"]
    assert enc["backbone"]["blocks"]["block"]["attn"]["qkv"]["kernel"].dtype == jnp.bfloat16
    assert enc["backbone"]["blocks"]["block"]["norm1"]["scale"].dtype == jnp.float32
    assert enc["mlp_det"]["kernel"].dtype == jnp.float32
    assert cast["params"]["mlp_pose"]["kernel"].dtype == jnp.float32


def test_bf16_param_cast_matches_fp32():
    """cast_backbone_bf16 (inference weight storage) must not change outputs
    beyond bf16 noise — the backbone already COMPUTES in bf16 either way."""
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    cfg = TinyConfig(
        img_size=56, max_people=4, person_center="j5", compute_dtype="bfloat16"
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    S = model.cfg.img_size
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, S, S, 3)).astype(np.float32)
    )
    K = jnp.broadcast_to(
        jnp.asarray([[100.0, 0, S / 2], [0, 100.0, S / 2], [0, 0, 1.0]]), (1, 3, 3)
    )
    cast = cast_backbone_bf16(params)
    # LayerNorms stay fp32, matmul kernels become bf16
    bb = cast["params"]["backbone"]
    leaves = jax.tree_util.tree_leaves(bb["blocks"]["block"]["norm1"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    leaves = jax.tree_util.tree_leaves(bb["blocks"]["block"]["attn"])
    assert all(l.dtype == jnp.bfloat16 for l in leaves)

    out32 = model.forward(params, x, K)
    out16 = model.forward(cast, x, K)
    np.testing.assert_allclose(
        np.asarray(out16["v3d"]), np.asarray(out32["v3d"]), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out16["scores"]), np.asarray(out32["scores"]), atol=3e-2
    )


def test_bf16_sensitivity_envelope():
    """Pin the bf16-backbone sensitivity bound (VERDICT r4 #5; the on-chip
    study is tools/bf16_sensitivity.py, results in BENCH_SWEEP.json and
    BASELINE.md). Same method at tiny scale: identical params and INJECTED
    detections (both precisions regress the same query slots), true
    fp32-compute model vs the production bf16 backbone. The pelvis-centered
    v3d delta must be (a) nonzero — compute_dtype actually engages the
    backbone, so the study never silently compares identical programs —
    and (b) inside a loose envelope (measured ~0.5 mm p50 on this config;
    production ViT-L depth amplifies to ~20 mm p50 at random init). A blown
    envelope means the precision policy leaked bf16 into the fp32 geometry
    path or the fp32-compute fallback stopped being fp32."""
    import dataclasses

    from multihmr_tpu.ops.detection import Detections
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    cfg16 = TinyConfig(
        img_size=56, max_people=4, person_center="j5", compute_dtype="bfloat16"
    )
    cfg32 = dataclasses.replace(cfg16, compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    m16 = MultiHMR(cfg16, bm, person_center_joint_names=names)
    m32 = MultiHMR(cfg32, bm, person_center_joint_names=names)
    S, g, Kcap = 56, m16.cfg.grid_size, 4
    rows = np.zeros((1, Kcap), np.int32)
    cols = np.zeros((1, Kcap), np.int32)
    val = np.zeros((1, Kcap), np.float32)
    for i, c in enumerate((g * g // 4, g * g // 2, g * g // 2 + 3)):
        rows[0, i], cols[0, i], val[0, i] = c // g, c % g, 1.0
    det = Detections(
        rows=jnp.asarray(rows), cols=jnp.asarray(cols),
        scores=jnp.asarray(val), valid=jnp.asarray(val),
    )
    K = jnp.asarray([[[100.0, 0, S / 2], [0, 100.0, S / 2], [0, 0, 1.0]]])
    deltas = []
    for seed in range(2):
        p = m16.init_params(jax.random.PRNGKey(seed))
        x = jax.random.normal(jax.random.PRNGKey(100 + seed), (1, S, S, 3))
        o32 = m32.forward(p, x, K, is_training=True, gt_det=det)
        o16 = m16.forward(cast_backbone_bf16(p), x, K,
                          is_training=True, gt_det=det)
        # geometry outputs are fp32 under BOTH compute dtypes (the policy:
        # bf16 stops at the backbone; HPH/SMPL-X always run fp32)
        assert o16["v3d"].dtype == o32["v3d"].dtype == jnp.float32
        v32 = np.asarray(o32["v3d"][0, :3], np.float64)
        v16 = np.asarray(o16["v3d"][0, :3], np.float64)
        c32 = np.asarray(o32["transl_pelvis"][0, :3], np.float64)
        c16 = np.asarray(o16["transl_pelvis"][0, :3], np.float64)
        cen = 1000.0 * np.linalg.norm(
            (v32 - c32.reshape(3, 1, 3)) - (v16 - c16.reshape(3, 1, 3)),
            axis=-1).mean(-1)
        deltas.extend(cen.tolist())
    p50 = float(np.percentile(deltas, 50))
    assert 0.01 < p50 < 5.0, deltas
    assert max(deltas) < 20.0, deltas


def test_batch_map_matches_fused():
    """``batch_mode="map"`` (lax.map of the batch-1 body, the single-device
    batch>1 execution strategy) must produce the same outputs as the fused
    batched program — identical math, different scheduling."""
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    B = 3
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 56, 56, 3))
    K = default_K(B)
    fused = model.forward(params, x, K, det_thresh=0.3, batch_mode="fused")
    mapped = model.forward(params, x, K, det_thresh=0.3, batch_mode="map")
    assert mapped["v3d"].shape == fused["v3d"].shape
    np.testing.assert_array_equal(
        np.asarray(fused["det"].valid), np.asarray(mapped["det"].valid)
    )
    for key in ("scores", "loc", "dist", "rotvec", "shape", "v3d", "j2d"):
        # fp reassociation only: different XLA scheduling re-associates sums
        # (dist's exp-decode and rotmat→rotvec amplify 1-ulp differences)
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(mapped[key]),
            rtol=1e-4, atol=1e-4, err_msg=key,
        )


def test_batch_map_rejects_training_args():
    """Explicit ``batch_mode="map"`` with is_training/gt_det must raise:
    the mapped body is the inference batch-1 forward, so those arguments
    would otherwise be silently dropped (teacher-forced detections ignored,
    losses computed against the wrong slots)."""
    import pytest

    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 56, 56, 3))
    K = default_K(2)
    with pytest.raises(ValueError, match="inference-only"):
        model.forward(params, x, K, is_training=True, batch_mode="map")
    dets = model.forward(params, x, K, det_thresh=0.3)["det"]
    with pytest.raises(ValueError, match="inference-only"):
        model.forward(params, x, K, gt_det=dets, batch_mode="map")
    # auto mode with the same arguments goes down the fused path fine
    out = model.forward(params, x, K, gt_det=dets, batch_mode="auto")
    np.testing.assert_array_equal(
        np.asarray(out["det"].valid), np.asarray(dets.valid)
    )


def test_batch_map_anny_matches_fused():
    from multihmr_tpu.models.multihmr_anny import AnnyConfig, MultiHMRAnny
    from multihmr_tpu.bodymodel.anny import NUM_BONES, synthetic_anny_model

    cfg = AnnyConfig(
        img_size=56, xat_dim=32, xat_depth=1, xat_heads=2, xat_dim_head=8,
        xat_mlp_dim=64, max_people=3, compute_dtype="float32",
        vit_override=TINY_VIT,
    )
    model = MultiHMRAnny(
        cfg, synthetic_anny_model(num_vertices=64, num_bones=NUM_BONES),
        person_center_idx=5,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 56, 56, 3))
    fused = model.forward(params, x, None, det_thresh=0.3, batch_mode="fused")
    mapped = model.forward(params, x, None, det_thresh=0.3, batch_mode="map")
    for key in ("loc", "transl", "v3d", "j2d", "K"):
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(mapped[key]),
            rtol=1e-5, atol=1e-4, err_msg=key,
        )


def test_capacity_saturation_warns_and_truncates():
    """Crowded-image behavior of the static [B, K] design (the reference
    handles arbitrary P via dynamic shapes, model.py:149): when every slot
    fills, extract_persons must warn about the capacity truncation and
    return exactly K people — and the K/latency trade-off is published by
    tools/sweep_capacity.py (BENCH_SWEEP.json 'k_capacity')."""
    import warnings

    model = make_model()  # max_people=4
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 56, 56, 3)), jnp.float32)
    K = jnp.asarray(
        [[[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]]], jnp.float32)
    # det_thresh=0 on clamped sigmoid scores (all > 0) saturates every slot
    out = jax.jit(lambda p, x, K: model.forward(p, x, K, det_thresh=0.0))(
        params, x, K)
    assert float(out["det"].valid.sum()) == 4
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        persons = model.extract_persons(out)[0]
    assert len(persons) == 4
    assert any("saturated the detection capacity" in str(x.message) for x in w)
