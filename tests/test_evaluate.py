"""End-to-end eval harness: model evaluated against its own predictions must
score ~0 mm PVE with perfect PRF1 — exercises matching, metrics, and the
EHF-style vertex-GT path."""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.config import ModelConfig, ViTConfig
from multihmr_tpu.bodymodel import synthetic_body_model
from multihmr_tpu.models.multihmr import MultiHMR
from multihmr_tpu.train.evaluate import evaluate_dataset

TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2)


class TinyConfig(ModelConfig):
    @property
    def vit(self):
        return TINY


class SelfDataset:
    """Dataset whose GT is the model's own output on random images."""

    def __init__(self, model, params, n=3, thresh=0.3):
        self.items = []
        K = np.array([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32)
        i = 0
        seed = 0
        while len(self.items) < n and seed < 30:
            x = np.asarray(
                jax.random.normal(jax.random.PRNGKey(seed), (1, 56, 56, 3)),
                np.float32,
            )
            seed += 1
            out = model.forward(params, jnp.asarray(x), jnp.asarray(K[None]), det_thresh=thresh)
            persons = model.extract_persons(out)[0]
            if not persons:
                continue
            verts = np.stack([np.asarray(p["v3d"]) for p in persons])
            self.items.append(
                (x[0], {"K": K, "humans": [{"smplx_vertices": v} for v in verts]})
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_evaluate_self_consistency():
    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5", compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = SelfDataset(model, params, n=2)
    if len(ds) == 0:
        import pytest

        pytest.skip("random init produced no detections")
    res = evaluate_dataset(model, params, ds, det_thresh=0.3, log_every=0)
    # PA-PVE is translation/rotation invariant → identical meshes score ~0.
    # (Plain PVE is pelvis-centered with the GT pelvis regressed from
    # vertices; the synthetic J_regressor is only approximate, so PVE
    # carries that offset — with real SMPL-X assets both go to ~0.)
    assert res["pa_pve"] < 1.0
    assert np.isfinite(res["pve"])
    assert res["recall"] == 100.0
    assert res["precision"] == 100.0


def test_eval_visu_saving(tmp_path):
    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5", compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = SelfDataset(model, params, n=1)
    if len(ds) == 0:
        import pytest

        pytest.skip("no detections")
    import os

    evaluate_dataset(
        model, params, ds, log_every=0,
        visu_to_save=1, visu_dir=str(tmp_path / "visu"),
        faces=np.asarray(model.body_model.faces),
    )
    assert os.path.exists(tmp_path / "visu" / "eval_0000.png")


def test_smplx_gt_forward_single_trace():
    """Varying GT person counts must NOT retrace the jitted body-model
    forward: the [P, ...] signature is padded to a static capacity (and
    chunked beyond it), so eval compiles once — each distinct-count
    recompile would cost minutes over the remote TPU compile path."""
    from multihmr_tpu.train.evaluate import make_smplx_gt_forward

    bm = synthetic_body_model(num_vertices=64, num_joints=55, num_extra=21,
                              num_lmk=51)  # real SMPL-X 55-rot layout
    gt_fwd = make_smplx_gt_forward(bm, num_betas=10, capacity=4)
    rng = np.random.default_rng(0)
    K = np.array([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32)

    def annot_for(P):
        humans = []
        for _ in range(P):
            humans.append({
                "smplx_root_pose": rng.normal(scale=0.1, size=(1, 3)).astype(np.float32),
                "smplx_body_pose": rng.normal(scale=0.1, size=(21, 3)).astype(np.float32),
                "smplx_jaw_pose": np.zeros((1, 3), np.float32),
                "smplx_leye_pose": np.zeros((1, 3), np.float32),
                "smplx_reye_pose": np.zeros((1, 3), np.float32),
                "smplx_left_hand_pose": np.zeros((15, 3), np.float32),
                "smplx_right_hand_pose": np.zeros((15, 3), np.float32),
                "smplx_shape": rng.normal(size=(11,)).astype(np.float32),
                "smplx_transl": np.array([0, 0, 3.0], np.float32),
            })
        return {"humans": humans, "K": K}

    outs = {}
    for P in (1, 3, 2, 4, 7, 1):  # varying counts incl. > capacity (chunking)
        outs[P] = gt_fwd(annot_for(P))
        assert outs[P]["v3d"].shape[0] == P
        assert outs[P]["j2d"].shape[0] == P
    assert gt_fwd.trace_counter["n"] == 1, gt_fwd.trace_counter
    # padded slots must not bleed into real outputs: recompute P=2 alone
    single = make_smplx_gt_forward(bm, num_betas=10, capacity=2)(annot_for(2))
    assert single["v3d"].shape == outs[2]["v3d"].shape
    assert np.all(np.isfinite(outs[7]["v3d"]))


def test_smpl_gt_forward_gendered_order_and_chunking():
    """3DPW-style gendered GT forward (reference keeps one smpl layer per
    gender, train.py:58-96): persons are regrouped by gender for the
    fixed-capacity jit programs, and the outputs must land back in the
    ORIGINAL person order; mixed genders, counts beyond capacity, and
    single-gender images all go through the same two compiled programs."""
    from multihmr_tpu.train.evaluate import make_smpl_gt_forward

    bms = {
        "male": synthetic_body_model(
            num_vertices=48, num_joints=24, num_extra=0, num_lmk=0),
        "female": synthetic_body_model(
            num_vertices=48, num_joints=24, num_extra=0, num_lmk=0),
    }
    gt_fwd = make_smpl_gt_forward(bms, capacity=2)
    rng = np.random.default_rng(1)
    K = np.array([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32)

    def human(g):
        return {
            "smpl_root_pose": rng.normal(scale=0.1, size=(1, 3)).astype(np.float32),
            "smpl_body_pose": rng.normal(scale=0.1, size=(23, 3)).astype(np.float32),
            "smpl_shape": rng.normal(size=(10,)).astype(np.float32),
            "smpl_transl": np.array([0, 0, 3.0], np.float32),
            "smpl_gender": g,
        }

    # mixed genders, 5 persons > capacity=2 → chunking inside each gender
    genders = ["male", "female", "male", "male", "female"]
    humans = [human(g) for g in genders]
    out = gt_fwd({"humans": humans, "K": K})
    assert out["v3d"].shape == (5, 48, 3)
    assert out["j3d"].shape == (5, 24, 3)
    assert out["j2d"].shape == (5, 24, 2)
    assert np.all(np.isfinite(out["v3d"]))
    # original order preserved: evaluating person i ALONE must reproduce
    # row i of the grouped result exactly
    for i in (0, 1, 4):
        solo = gt_fwd({"humans": [humans[i]], "K": K})
        np.testing.assert_allclose(solo["v3d"][0], out["v3d"][i], atol=1e-5)
        np.testing.assert_allclose(solo["j2d"][0], out["j2d"][i], atol=1e-4)
    # single-gender image works (the other program simply isn't used)
    fem = gt_fwd({"humans": [human("female")], "K": K})
    assert fem["v3d"].shape == (1, 48, 3)


def test_adaln_and_token_dropout(rng):
    """Reference's norm='ada' and token-dropout options (unused by shipped
    configs, kept for API parity)."""
    import jax.numpy as jnp

    from multihmr_tpu.models.hph import (
        AdaptiveLayerNorm1D,
        drop_token_dropout,
        zero_token_dropout,
    )

    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    mod = AdaptiveLayerNorm1D(8, 4)
    p = mod.init(jax.random.PRNGKey(0), x, t)
    y = mod.apply(p, x, t)
    # zero-initialized conditioning → starts as plain LayerNorm
    ln = np.asarray(y)
    np.testing.assert_allclose(ln.mean(-1), 0, atol=1e-5)
    np.testing.assert_allclose(ln.std(-1), 1, atol=1e-2)

    xd, keep = drop_token_dropout(jax.random.PRNGKey(1), x, 0.5)
    assert keep.shape == (5,)
    np.testing.assert_allclose(np.asarray(xd)[:, np.asarray(keep) == 0], 0)
    xz, keepz = zero_token_dropout(jax.random.PRNGKey(2), x, 0.5)
    assert keepz.shape == (2, 5)


def test_pipelined_eval_matches_serial_and_attributes_wall():
    """The pipelined loop (dispatch image i+1 before scoring image i) must
    produce IDENTICAL metrics to the reference-shaped serial loop, and
    results['timings'] must attribute ~the whole wall clock to named phases
    (VERDICT r4 #3: 58% of the old eval wall was unattributed)."""
    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5",
                     compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = SelfDataset(model, params, n=3)
    if len(ds) < 2:
        import pytest

        pytest.skip("random init produced too few detections")

    piped = evaluate_dataset(model, params, ds, det_thresh=0.3, log_every=0,
                             pipeline=True)
    serial = evaluate_dataset(model, params, ds, det_thresh=0.3, log_every=0,
                              pipeline=False)
    for k in ("pve", "pa_pve", "precision", "recall", "f1_score", "n_images"):
        assert piped[k] == serial[k], k

    tm = piped["timings"]
    assert set(tm) == {"load", "dispatch", "wait", "readback", "gt",
                       "match_metrics", "visu", "wall"}
    attributed = sum(v for k, v in tm.items() if k != "wall")
    assert attributed <= tm["wall"] * 1.001
    # named phases cover the wall (loop overhead residue < 20%)
    assert attributed >= 0.8 * tm["wall"], tm


def test_eval_u8_wire_matches_f32():
    """uint8 images (normalized on-device inside the eval jit) must score
    identically to host-normalized fp32 images of the same pixels."""
    from multihmr_tpu.ops.image import IMG_NORM_MEAN, IMG_NORM_STD

    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5",
                     compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    K = np.array([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32)

    # build a GT'd dataset from the fp32 view of random u8 pixels
    items_u8, items_f32 = [], []
    for seed in range(8):
        u8 = rng.integers(0, 256, (56, 56, 3), dtype=np.uint8)
        f32 = ((u8.astype(np.float32) / 255.0) - IMG_NORM_MEAN) / IMG_NORM_STD
        f32 = f32.astype(np.float32)
        out = model.forward(
            params, jnp.asarray(f32[None]), jnp.asarray(K[None]), det_thresh=0.3
        )
        persons = model.extract_persons(out)[0]
        if not persons:
            continue
        humans = [{"smplx_vertices": np.asarray(p["v3d"])} for p in persons]
        items_u8.append((u8, {"K": K, "humans": humans}))
        items_f32.append((f32, {"K": K, "humans": humans}))
    if not items_u8:
        import pytest

        pytest.skip("no detections")

    res_u8 = evaluate_dataset(model, params, items_u8, det_thresh=0.3,
                              log_every=0)
    res_f32 = evaluate_dataset(model, params, items_f32, det_thresh=0.3,
                               log_every=0)
    assert res_u8["recall"] == res_f32["recall"] == 100.0
    assert abs(res_u8["pa_pve"] - res_f32["pa_pve"]) < 0.1
